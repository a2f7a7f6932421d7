"""Coarse hash-partitioned grouping — the engine's high-cardinality groupby.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per DISTINCT
KEY, paying Ray's per-group block-slice + UDF-call + block-build overhead
(~1-3 ms). At 10^5-10^6 distinct keys that overhead alone is minutes —
regardless of data size. ``grouped_map`` instead hash-buckets keys into
``num_partitions`` COARSE groups (one Ray group each) and hands ``fn`` a
frame holding MANY complete key-groups, which it processes with one
vectorized pandas groupby. Same co-partitioning guarantee (every row of a
key lands in exactly one call), ~key-count/num_partitions fewer UDF calls.

All high-cardinality engine ops route through this: hash_join's per-key
merge, rank selection, LSH bucket pairing, blocking pair generation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["grouped_map", "key_hash", "typed_or_empty"]

_PART = "__gpart"


def key_hash(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Deterministic (cross-process) uint64 hash of the key tuple."""
    h = pd.util.hash_pandas_object(df[keys[0]], index=False).to_numpy()
    for k in keys[1:]:
        h2 = pd.util.hash_pandas_object(df[k], index=False).to_numpy()
        h = (h * np.uint64(0x9E3779B97F4A7C15)) ^ h2
    return h


def default_partitions() -> int:
    """2× cluster CPUs (bounded): scales reduce width with the session."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, min(2 * cpus, 512))


def _typed_empty(df: pd.DataFrame):
    """Empty pandas frame -> typed empty Arrow table. Ray's pandas block
    size estimator np.vectorize-s object columns and logs an error line for
    every 0-row block; an Arrow empty with concrete types is silent. Object
    columns (strings-or-None throughout the engine's grouped frames) map to
    ``string`` — with zero rows the claim is vacuous for values and only
    anchors schema unification."""
    import pyarrow as pa
    fields = []
    for c, dt in df.dtypes.items():
        if dt == object:
            t = pa.string()
        elif getattr(dt, "kind", "") == "M":
            t = pa.timestamp(np.datetime_data(dt)[0])
        else:
            try:
                t = pa.from_numpy_dtype(dt)
            except (pa.ArrowNotImplementedError, TypeError):
                t = pa.string()
        fields.append(pa.field(str(c), t))
    return pa.schema(fields).empty_table()


def typed_or_empty(df: pd.DataFrame):
    """Pass nonempty frames through; convert empty ones to a typed Arrow
    table (see ``_typed_empty``). Wrap the return of filtering map_batches
    fns that can legitimately emit 0 rows."""
    if isinstance(df, pd.DataFrame) and not len(df):
        return _typed_empty(df)
    return df


# engine-wide shuffle strategy for grouped_map: "sort" (default) is the
# repartition + sort-shuffle path; "hash" routes through Ray's
# hash-shuffle groupby (ONE exchange, reduce width pinned by
# num_partitions directly) — semantically identical (206-test parity) but
# it spawns a fresh aggregator-actor pool per operator, a measured
# ~1.5 s fixed setup on this box that outweighs the saved barrier until
# shuffles carry several million rows. Flip per-call via ``shuffle=`` for
# genuinely large exchanges.
GROUPED_SHUFFLE = "sort"


def grouped_map(ds, keys: str | list[str], fn, *,
                num_partitions: int | None = None,
                batch_format: str = "pandas",
                shuffle: str | None = None):
    """Apply ``fn(frame)`` to coarse hash partitions of complete key-groups.

    ``fn`` receives a pandas DataFrame containing every row of each key in
    its partition (the ``_PART`` helper column already stripped) and must
    handle multiple keys — typically via one vectorized
    ``frame.groupby(keys)``. Returns the concatenated Dataset.
    ``num_partitions`` defaults to 2× cluster CPUs.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if num_partitions is None:
        num_partitions = default_partitions()
    if shuffle is None:
        shuffle = GROUPED_SHUFFLE

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        # assign = shallow copy (new frame, shared immutable column
        # buffers) — this map runs on EVERY batch of EVERY shuffle, and a
        # deep df.copy() here re-copied all payload columns engine-wide
        part = (key_hash(df, keys) % np.uint64(num_partitions)).astype(
            np.int64)
        return df.assign(**{_PART: part})

    def run(g: pd.DataFrame) -> object:
        out = fn(g.drop(columns=[_PART]))
        if isinstance(out, pd.DataFrame) and not len(out):
            return _typed_empty(out)
        import pyarrow as pa
        if isinstance(out, pa.Table) and out.schema.metadata:
            # fns that build their table via pa.Table.from_pandas carry the
            # pandas metadata dict -> unhashable schema in Ray's dedup
            # ('Failed to hash the schemas' worker warnings). Nonempty
            # pandas outputs stay pandas: forcing them to Arrow would pin
            # per-partition inferred types (an all-NaN left-join attr
            # partition infers double where string-bearing partitions
            # infer string) and break block unification.
            out = out.replace_schema_metadata(None)
        return out

    parted = ds.map_batches(add_part, batch_format="pandas")
    if shuffle == "hash":
        # ONE hash exchange: reduce width = num_partitions by construction,
        # no repartition round, no sort of the partition column
        return parted.groupby(_PART, num_partitions=num_partitions)\
            .map_groups(run, batch_format=batch_format)
    # legacy sort path. Reduce-task parallelism for the sort shuffle tracks
    # the INPUT block count: a single-block input (one small parquet file)
    # would funnel all num_partitions coarse groups through ONE sequential
    # reduce task. Repartitioning pins reduce width to num_partitions
    # regardless of input layout.
    parted = parted.repartition(num_partitions)
    return parted.groupby(_PART).map_groups(run, batch_format=batch_format)
