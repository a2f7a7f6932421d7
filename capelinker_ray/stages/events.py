"""Windowed / sessionized aggregates over event streams.

The reference has no streaming semantics (SURVEY §2.11); these are the
engine's own windowed operators for the ``events`` table shape
(event_id, ts, user_id, event_type, value, props):

  sessionize          gap-based sessions per user: one groupby(user_id)
                      shuffle, in-group sort + cumulative gap counter
                      (vectorized); emits per-event session ids
  session_stats       per-session aggregate (count, span, value sum)
  tumbling_window_agg per (user, fixed window) aggregate — computed with a
                      partial-aggregation combiner inside map_batches and
                      ONE small groupby over (user, window) partials, never
                      shuffling raw events
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data.aggregate import Count, Max, Min, Sum

__all__ = ["sessionize", "session_stats", "tumbling_window_agg"]


def sessionize(ds, *, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: float = 30.0):
    """+ ``session_idx`` (0-based per user) and ``session_id`` (user#idx)."""
    gap_us = np.int64(gap_minutes * 60e6)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable").copy()
        ts = g[ts_col].astype("int64").to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        idx = np.cumsum(new) - 1
        g["session_idx"] = idx.astype(np.int64)
        g["session_id"] = (g[user_col].astype(str) + "#" +
                           pd.Series(idx, index=g.index).astype(str))
        return g

    return ds.groupby(user_col).map_groups(per_user, batch_format="pandas")


def session_stats(ds_sessionized, *, user_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value"):
    """Per-session aggregates over a sessionized dataset."""
    return (ds_sessionized.groupby("session_id").aggregate(
        Count(alias_name="n_events"),
        Min(ts_col, alias_name="ts_start"),
        Max(ts_col, alias_name="ts_end"),
        Sum(value_col, alias_name="value_sum"),
    ))


def tumbling_window_agg(ds, *, user_col: str = "user_id",
                        ts_col: str = "ts", value_col: str = "value",
                        window_minutes: float = 60.0,
                        batch_size: int = 64 * 1024):
    """Per (user, window) count/sum with in-batch partial aggregation:
    raw events never cross the shuffle — only one partial row per
    (user, window) per batch does (SURVEY §4 'pre-aggregate before
    groupby')."""
    win_us = np.int64(window_minutes * 60e6)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = (df[ts_col].astype("int64") // win_us).astype(np.int64)
        out = (df.assign(window=w)
               .groupby([user_col, "window"], sort=False)
               .agg(n_events=(value_col, "size"),
                    value_sum=(value_col, "sum"))
               .reset_index())
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    return (partials.groupby([user_col, "window"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_sum", alias_name="value_sum"),
    ))
