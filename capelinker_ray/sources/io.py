"""Parquet sources/sinks (SURVEY §2.1).

The reference loads bundled .rda tables and CSVs eagerly
(/root/reference/DESCRIPTION:18, data_raw/traindata_graafreinet.R:20-23);
here every source is a lazy ``ray.data.read_parquet`` with column pruning,
and every intermediate sink is a partitioned Parquet directory (the
reference's manual ``saveRDS`` checkpoints, data_raw/pretrained.R:21-22,
become first-class stage checkpoints — see pipelines/checkpoint.py).
"""

from __future__ import annotations

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(paths, columns=None, **kwargs):
    """Read transcript turn table(s); prune to the needed columns at the read."""
    return rd.read_parquet(paths, columns=columns or TRANSCRIPT_COLUMNS, **kwargs)


def read_table(sf_dir: str, name: str, columns=None, **kwargs):
    """Read one driver testdata table (TESTDATA.md)."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)


def write_stage(ds, out_dir: str, **kwargs):
    """Write a stage output as a partitioned Parquet directory (never one
    giant file); returns the directory for downstream re-reads."""
    ds.write_parquet(out_dir, **kwargs)
    return out_dir
