"""Hash equi-join built from union + groupby().map_groups.

The reference's only join is data.table ``merge`` with ``_from``/``_to``
suffixes (/root/reference/R/candidates.R:127-132). Ray 2.49 ships a native
``Dataset.join``, but its hash-shuffle aggregator raises ``ArrowInvalid`` as
soon as a partition receives rows on one side only (empty pyarrow tables
lose their schema before acero sees them — observed on any input with >2
partitions). This join instead reuses the one shuffle primitive that is
solid at scale — hash-partitioned ``groupby(key).map_groups`` over a tagged
union of both sides — which is also exactly how the blocking stage
co-partitions (stages/blocking.py), so the engine leans on a single
well-tested shuffle path.

Cost model: one all-to-all shuffle of (left ∪ right); per-key work is the
in-group pandas merge. Broadcast the right side instead (broadcast_join)
whenever it is small — that variant is shuffle-free.

Caveat: the tagged union null-pads each side's value columns, and pandas
represents nullable int64 as float64 — int values above 2^53 (hashes,
signatures) lose their low bits in transit. Ship such payloads as
fixed-size BINARY (see stages/dedup._pack_rows) or as strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

__all__ = ["hash_join", "broadcast_join"]

_SIDE = "__jside"


def _arrow_types(ds) -> dict[str, pa.DataType]:
    s = ds.schema()
    return {n: (t if isinstance(t, pa.DataType) else pa.string())
            for n, t in zip(s.names, s.types)}


def hash_join(left, right, *, on: str | list[str], right_on=None,
              how: str = "inner", suffixes=("", "_r"),
              num_partitions: int | None = None):
    """Equi-join two Datasets. ``how`` in inner/left.

    Right-side key columns are renamed onto the left names before the
    shuffle; non-key name collisions get ``suffixes``.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))

    ltypes = _arrow_types(left)
    rtypes = _arrow_types(right)
    lcols = list(ltypes)
    rcols = list(rtypes)
    rmap = dict(zip(right_on, on))
    rvals = [c for c in rcols if c not in right_on]
    # disambiguate collisions on non-key value columns
    out_rvals = {}
    for c in rvals:
        out_rvals[c] = c + suffixes[1] if c in lcols else c
    lvals = [c for c in lcols if c not in on]
    # one canonical arrow schema for the tagged union (uniform block type —
    # mixed pandas/arrow blocks break the sort-shuffle boundary sampler)
    out_fields = (
        [(k, ltypes[k]) for k in on]
        + [(c, ltypes[c]) for c in lvals]
        + [(out_rvals[c], rtypes[c]) for c in rvals]
        + [(_SIDE, pa.int8())]
    )
    tagged_schema = pa.schema(out_fields)

    def _valid_keys(t: pa.Table, keys: list[str]):
        """Null join keys never match (SQL semantics) AND break Ray's sort
        shuffle ('<' vs NoneType) — mask them out of the shuffle."""
        import pyarrow.compute as pc
        ok = pc.is_valid(t[keys[0]])
        for k in keys[1:]:
            ok = pc.and_(ok, pc.is_valid(t[k]))
        return ok

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.filter(_valid_keys(t, on))
        n = len(t)
        arrays = [t[k].cast(typ) if k in t.column_names else pa.nulls(n, typ)
                  for k, typ in out_fields[:-1]]
        arrays.append(pa.array(np.zeros(n, np.int8), pa.int8()))
        return pa.table(dict(zip([f[0] for f in out_fields], arrays)),
                        schema=tagged_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(_valid_keys(t, right_on))
        n = len(t)
        inv = {v: k for k, v in rmap.items()}      # out key -> right key
        inv_vals = {v: k for k, v in out_rvals.items()}  # out val -> right val
        arrays = []
        for k, typ in out_fields[:-1]:
            src = inv.get(k) or inv_vals.get(k)
            if src is not None and src in t.column_names:
                arrays.append(t[src].cast(typ))
            else:
                arrays.append(pa.nulls(n, typ))
        arrays.append(pa.array(np.ones(n, np.int8), pa.int8()))
        return pa.table(dict(zip([f[0] for f in out_fields], arrays)),
                        schema=tagged_schema)

    tagged = (left.map_batches(tag_left, batch_format="pyarrow")
              .union(right.map_batches(tag_right, batch_format="pyarrow")))

    out_cols = on + lvals + [out_rvals[c] for c in rvals]
    out_schema = pa.schema([(k, dict(out_fields)[k]) for k in out_cols])

    def join_partition(g: pd.DataFrame) -> pa.Table:
        """One COARSE hash partition (many complete key-groups): a single
        vectorized pandas merge joins every key at once — no per-key UDF
        calls (stages/grouped.py rationale)."""
        l = g[g[_SIDE] == 0][on + lvals]
        r = g[g[_SIDE] == 1][on + [out_rvals[c] for c in rvals]]
        out = l.merge(r, on=on, how=how)
        # pin the arrow schema: all-null partitions must not degrade types
        return pa.Table.from_pandas(out[out_cols], schema=out_schema,
                                    preserve_index=False)

    from .grouped import grouped_map
    joined = grouped_map(tagged, on, join_partition,
                         num_partitions=num_partitions)

    if how == "left":
        # null-keyed left rows bypassed the shuffle: re-emit them with null
        # right values (pin the same arrow schema)
        def null_left(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = t.filter(pc.invert(_valid_keys(t, on)))
            n = len(t)
            arrays = []
            for k in out_cols:
                typ = dict(out_fields)[k]
                if k in t.column_names:
                    arrays.append(t[k].cast(typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            return pa.table(dict(zip(out_cols, arrays)), schema=out_schema)
        joined = joined.union(
            left.map_batches(null_left, batch_format="pyarrow"))
    return joined


def broadcast_join(left, right_df: pd.DataFrame, *, on: str | list[str],
                   right_on=None, how: str = "left", suffixes=("", "_r")):
    """Shuffle-free join against a small in-memory right side: the frame is
    put in the object store ONCE (``ray.put``) and every map task reads the
    shared copy — the reference's model-registry/broadcast-dict pattern
    (SURVEY §2.5 uniformise_string) applied to joins."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    rmap = dict(zip(right_on, on))
    right_ref = ray.put(right_df.rename(columns=rmap))

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(right_ref)
        return df.merge(r, on=on, how=how, suffixes=suffixes)

    return left.map_batches(join_batch, batch_format="pandas")
