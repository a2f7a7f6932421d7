"""Parquet/CSV sources and partitioned sinks (SURVEY §2.1).

The reference loads bundled .rda tables and CSVs eagerly
(/root/reference/DESCRIPTION:18, data_raw/traindata_graafreinet.R:20-23);
here every source is a lazy ``ray.data.read_*`` with COLUMN PRUNING pushed
into the read (a read that loads all columns for a 2-column transform is
wrong at 100 TB), and every sink is a partitioned Parquet directory — one
file per block, never one giant file, so failed runs resume per partition
(the reference's manual ``saveRDS`` checkpoints, data_raw/pretrained.R:21-22,
are first-class in pipelines/checkpoint.py).
"""

from __future__ import annotations

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

__all__ = ["TRANSCRIPT_COLUMNS", "read_transcripts", "read_table",
           "read_labeled_pairs", "read_jsonl", "write_partitioned"]


def read_jsonl(path: str, columns: list[str] | None = None, **kwargs):
    """JSONL source (one object per line — the common raw-ingest layout
    for scraped/exported transcript and document corpora). Lazy
    ``read_json`` with column pruning applied immediately after parse;
    JSON carries no column statistics, so unlike parquet the prune cannot
    skip bytes at the read — convert long-lived corpora to parquet with
    ``write_partitioned`` and read those instead."""
    ds = rd.read_json(path, **kwargs)
    return ds.select_columns(columns) if columns else ds


def read_transcripts(path: str, columns: list[str] | None = None,
                     **kwargs):
    """Transcript turn table; prune to the requested columns at the read."""
    return rd.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS,
                           **kwargs)


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Generic parquet/csv source (fread analog for raw ingestion)."""
    if path.endswith(".csv"):
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_labeled_pairs(path: str, **kwargs):
    """Labeled-pair fixture import (the reference's read_xlsx label
    round-trip, data_raw/pretrained.R:185-187, re-based on parquet)."""
    return rd.read_parquet(path, **kwargs)


def write_partitioned(ds, path: str, **kwargs) -> None:
    """Partitioned Parquet sink: one file per block (resumable layout)."""
    ds.write_parquet(path, **kwargs)
