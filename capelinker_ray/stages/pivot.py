"""Distributed pivot / crosstab (data.table ``dcast`` analog).

Long → wide reshape: one row per ``index`` key, one column per distinct
``pivot`` value, cells holding counts (or sums of ``sum_col``). Scale
strategy: each batch pivots LOCALLY into the fixed wide layout (a batch of
1M long rows collapses to ≤ distinct-index rows before any shuffle), then a
single small ``groupby(index).sum`` merges the partials — the same
partial-aggregation shape as pipelines/queries.q_lineitem_agg.

The pivot column must be LOW-CARDINALITY (each value becomes an output
column — the wide layout itself caps this; ~10^3 columns is the practical
ceiling). When ``values`` is not given, the distinct values are discovered
with one tiny distributed aggregation and the wide schema is fixed from
them, so every partial batch emits the identical column set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["pivot_counts"]

_MAX_PIVOT_VALUES = 10_000


def pivot_counts(ds, *, index: str, pivot: str, values: list | None = None,
                 sum_col: str | None = None,
                 num_partitions: int | None = None):
    """Wide table of per-``index`` counts (or sums of ``sum_col``) split by
    ``pivot`` value. Output columns: ``index`` + one int64/float64 column
    per pivot value (missing combinations are 0)."""
    if values is None:
        # per-batch distinct + one-task merge (stages/agg.py): the pivot
        # column is low-cardinality BY CONTRACT, so a sort-shuffle native
        # groupby for discovery is pure fixed cost
        from .agg import distinct_small
        values = distinct_small(ds, pivot)
    if len(values) > _MAX_PIVOT_VALUES:
        raise ValueError(
            f"pivot column {pivot!r} has {len(values)} distinct values; "
            f"a wide layout beyond {_MAX_PIVOT_VALUES} columns is a "
            "different query — aggregate long instead")
    vals = [str(v) for v in values]
    if len(set(vals)) != len(vals):
        # e.g. int 1 vs str "1" in a mixed-type pivot column — the wide
        # layout would carry duplicate labels and double-count on merge
        dupes = sorted({v for v in vals if vals.count(v) > 1})
        raise ValueError(
            f"pivot values stringify to duplicate column labels {dupes}; "
            "cast the pivot column to one type first")
    vset = list(values)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = {index: pd.Series(dtype=object)}
            out.update({c: pd.Series(dtype=np.float64) for c in vals})
            return pd.DataFrame(out)
        if sum_col is None:
            wide = pd.crosstab(df[index], df[pivot])
        else:
            wide = df.pivot_table(index=index, columns=pivot,
                                  values=sum_col, aggfunc="sum",
                                  fill_value=0)
        wide = wide.reindex(columns=vset, fill_value=0)
        wide.columns = vals
        return wide.astype(np.float64).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    # merge partials with ONE grouped_map shuffle + a vectorized pandas
    # groupby-sum per partition — Ray's native groupby().aggregate() runs
    # a per-row Python combine (measured 17 s for 1500 keys x 5 sums at
    # sf0.1 vs ~2 s here)
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(index, sort=False)[vals].sum().reset_index()
        if sum_col is None:
            for c in vals:
                out[c] = out[c].fillna(0).astype(np.int64)
        return out

    from .grouped import grouped_map
    return grouped_map(partials, index, merge,
                       num_partitions=num_partitions)
