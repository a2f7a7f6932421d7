"""Change-data-capture compaction: latest-wins snapshot merge.

The production shape behind every mutable-table ingest at scale: a log of
upserts/deletes keyed by entity, compacted to "the newest version of each
key" (SQL ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY ts DESC
...) = 1``). ONE co-partitioning shuffle by key, then a vectorized
keep-last per coarse partition — no sort of the full table, no window
materialization. Optional tombstone semantics drop keys whose LATEST
version is a delete marker (the Hudi/Delta/Iceberg merge-on-read
contract, implemented on plain Ray Data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["compact_latest"]


def compact_latest(ds, key_cols, ts_col: str, *,
                   tiebreak_cols=None, tombstone_col: str | None = None,
                   num_partitions: int | None = None):
    """Keep the newest row per key tuple: max ``ts_col``, ties broken by
    ``tiebreak_cols`` descending (pass the log sequence / event id to make
    the pick deterministic). Null timestamps sort OLDEST (SQL ``ORDER BY
    ts DESC NULLS LAST`` parity). If ``tombstone_col`` is given, keys
    whose winning row has it truthy are dropped entirely (delete markers
    compact away). One shuffle; everything else is per-batch vectorized
    pandas."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tiebreak_cols = ([] if tiebreak_cols is None else
                     [tiebreak_cols] if isinstance(tiebreak_cols, str)
                     else list(tiebreak_cols))
    order = [ts_col, *tiebreak_cols]

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        # ascending sort, nulls FIRST, keep the LAST row per key ==
        # ORDER BY ts DESC NULLS LAST ... LIMIT 1 per key
        df = df.sort_values([*key_cols, *order], kind="stable",
                            na_position="first")
        out = df[~df.duplicated(subset=key_cols, keep="last")]
        if tombstone_col is not None:
            dead = out[tombstone_col].fillna(False).astype(bool)
            out = out[~dead.to_numpy()]
        return out

    from .grouped import grouped_map
    return grouped_map(ds, key_cols, per_partition,
                       num_partitions=num_partitions)
