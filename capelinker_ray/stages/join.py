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
    """Equi-join two Datasets. ``how`` in inner/left/outer/semi/anti
    (right join = ``hash_join(right, left, how="left")``).

    Right-side key columns are renamed onto the left names before the
    shuffle; non-key name collisions get ``suffixes``.

    ``semi``/``anti`` return LEFT columns only (SQL EXISTS / NOT EXISTS
    semantics: null left keys never match, so anti retains them). The right
    side is projected to its key columns and per-batch-deduplicated BEFORE
    the shuffle — a fact-table probe side (orders per customer) ships one
    row per distinct key per batch, not one per fact row.
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(
            "how must be 'inner', 'left', 'outer', 'semi' or 'anti'")
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))

    ltypes = _arrow_types(left)
    rtypes = _arrow_types(right)
    lcols = list(ltypes)
    rcols = list(rtypes)
    rmap = dict(zip(right_on, on))
    existence_only = how in ("semi", "anti")
    if existence_only:
        rcols = list(right_on)          # keys are all that matters
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
        if existence_only and len(t):
            # only key existence matters: dedupe within the batch so a
            # high-fanout probe side doesn't ship every fact row
            t = t.select(right_on).group_by(right_on).aggregate([])
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
        if existence_only:
            probe = l.merge(r.drop_duplicates(on), on=on, how="left",
                            indicator=True)
            keep = (probe["_merge"] == "both") if how == "semi" else \
                   (probe["_merge"] == "left_only")
            out = probe.loc[keep, on + lvals]
        else:
            out = l.merge(r, on=on, how=how)
        # pin the arrow schema: all-null partitions must not degrade types.
        # strip the from_pandas dict metadata — Ray's schema-dedup hash
        # chokes on it and logs a warning per block
        return pa.Table.from_pandas(
            out[out_cols], schema=out_schema,
            preserve_index=False).replace_schema_metadata(None)

    from .grouped import grouped_map
    joined = grouped_map(tagged, on, join_partition,
                         num_partitions=num_partitions)

    # pin the output schema even when EVERY row is filtered before the
    # shuffle (e.g. all-null keys): a zero-block dataset loses its schema
    # in Ray 2.49 and downstream column access breaks
    import ray.data as _rd
    fields = dict(out_fields)
    joined = joined.union(_rd.from_arrow(pa.table(
        {k: pa.nulls(0, fields[k]) for k in out_cols}, schema=out_schema)))

    if how in ("left", "outer", "anti"):
        # null-keyed left rows bypassed the shuffle: re-emit them — with
        # null right values (left/outer), or as-is (anti: a null key can
        # never satisfy EXISTS, so NOT EXISTS retains the row)
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
    if how == "outer":
        # null-keyed RIGHT rows too (SQL FULL OUTER retains both sides)
        inv = {v: k for k, v in rmap.items()}
        inv_vals = {v: k for k, v in out_rvals.items()}

        def null_right(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = t.filter(pc.invert(_valid_keys(t, right_on)))
            n = len(t)
            arrays = []
            for k in out_cols:
                typ = dict(out_fields)[k]
                src = inv.get(k) or inv_vals.get(k)
                if src is not None and src in t.column_names:
                    arrays.append(t[src].cast(typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            return pa.table(dict(zip(out_cols, arrays)), schema=out_schema)
        joined = joined.union(
            right.map_batches(null_right, batch_format="pyarrow"))
    return joined


# per-WORKER-PROCESS cache of deserialized + key-indexed broadcast sides.
# ray.get() of a pandas/arrow object re-materializes it on EVERY call (string
# columns are pickled, not plasma-zero-copy), and pandas merge rebuilds the
# right side's hash table per batch — at a 1M-row entity map × thousands of
# turn batches that was ~70 s of pure rework in the flagship tail. Worker
# processes are reused across tasks of a stage, so the first batch a worker
# sees pays the build and every later batch does an O(batch) probe.
_BCAST_CACHE: dict[str, tuple] = {}
_BCAST_CACHE_MAX = 4


def _bcast_lookup(right_ref, on: list[str]):
    key = right_ref.hex()
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        obj = ray.get(right_ref)
        rdf = obj.to_pandas() if isinstance(obj, pa.Table) else obj
        if len(on) == 1:
            idx = pd.Index(rdf[on[0]])
        else:
            idx = pd.MultiIndex.from_frame(rdf[on])
        unique = idx.is_unique
        if unique and len(idx):
            idx.get_indexer(idx[:1])  # prime the hash engine once
        hit = (rdf, idx, unique, {})  # {} = lazily-filled numpy column cache
        if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = hit
    return hit


def broadcast_join(left, right_df, *, on: str | list[str],
                   right_on=None, how: str = "left", suffixes=("", "_r")):
    """Shuffle-free join against a small in-memory right side: the frame is
    put in the object store ONCE (``ray.put``, as an Arrow table — string
    buffers ride plasma instead of being re-pickled) and every worker
    process indexes the shared copy ONCE (module cache above) — the
    reference's model-registry/broadcast-dict pattern (SURVEY §2.5
    uniformise_string) applied to joins.

    ``right_df``: pandas DataFrame or pyarrow Table. When the right keys are
    unique (the entity-map / dimension-table case) each batch is joined with
    one vectorized ``Index.get_indexer`` probe + positional take; duplicate
    right keys fall back to a per-batch pandas merge against the cached
    frame (merge semantics preserved, deserialization still amortized)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    rmap = dict(zip(right_on, on))
    if isinstance(right_df, pa.Table):
        right_df = right_df.rename_columns(
            [rmap.get(c, c) for c in right_df.column_names])
    else:
        right_df = pa.Table.from_pandas(
            right_df.rename(columns=rmap),
            preserve_index=False).replace_schema_metadata(None)
    # resolve collision names ONCE (left schema is known up front)
    lschema = left.schema()
    if lschema is None:
        # zero-block schema-less empty input (Ray 2.49): nothing to join
        # onto — the join of an empty left with anything is empty
        return left
    lcols = [n for n in lschema.names]
    rval_out = {c: (c + suffixes[1] if c in lcols else c)
                for c in right_df.column_names if c not in on}
    right_ref = ray.put(right_df)

    def join_batch(df: pd.DataFrame):
        from .grouped import typed_or_empty
        rdf, idx, unique, cols = _bcast_lookup(right_ref, on)
        if not unique:
            return typed_or_empty(
                df.merge(rdf, on=on, how=how, suffixes=suffixes))
        if len(on) == 1:
            probe = df[on[0]].to_numpy()
        else:
            probe = pd.MultiIndex.from_frame(df[on])
        pos = idx.get_indexer(probe)
        found = pos >= 0
        if how == "inner":
            df = df[found]
            pos = pos[found]
            found = None
        out = df.reset_index(drop=True)
        if len(rdf) == 0:
            if how == "inner":
                out = out.iloc[:0]
            for c, out_name in rval_out.items():
                out[out_name] = np.full(len(out), np.nan)
            return typed_or_empty(out)
        safe = pos if found is None else np.where(found, pos, 0)
        for c, out_name in rval_out.items():
            src = cols.get(c)
            if src is None:
                src = cols[c] = rdf[c].to_numpy()
            col = src[safe]
            if found is not None and not found.all():
                if col.dtype.kind in "iub":      # int/uint/bool can't hold NA
                    col = col.astype(
                        np.float64 if col.dtype.kind != "b" else object)
                else:
                    col = col.copy()
                # pandas-merge missing markers: NaT for datetimes/timedeltas
                col[~found] = (np.datetime64("NaT")
                               if col.dtype.kind in "Mm" else np.nan)
            out[out_name] = col
        return typed_or_empty(out)

    return left.map_batches(join_batch, batch_format="pandas")
