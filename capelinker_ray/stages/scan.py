"""Distributed prefix scan: ordered running totals + budget-packed shards.

Ray Data has no scan/window primitive — ``map_batches`` sees one batch with
no global position, and ``groupby`` loses order. The classic two-pass
parallel scan fits Ray's model exactly, though it needs per-block identity,
which the Dataset API hides; this is the engine's ONE documented drop to
raw ``@ray.remote`` tasks (build brief: "(c) raw Ray tasks as a last
resort — document the partitioning assumption"):

  1. global sort on ``order_by`` (range partition — blocks come back in
     key order; at ingest-partitioned corpora the sort is near-free),
  2. one tiny task per block computes its local sum (parallel, returns a
     scalar — bytes through the driver ∝ #blocks, never rows),
  3. the driver exclusive-prefixes the #blocks scalars,
  4. one task per block adds (local cumsum + block offset) — parallel,
     zero shuffle.

``pack_by_budget`` is the training-data use: split a corpus into
contiguous ~``capacity``-unit shards in id order ("2k-document /
50M-token training shards"), deterministic and resumable. Null counts
contribute 0 (SQL ``sum() OVER`` semantics, so the DuckDB window-function
oracle is value-exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["running_total", "pack_by_budget"]


@ray.remote
def _block_sum(tbl: pa.Table, col: str) -> int:
    a = tbl[col].cast(pa.int64())
    s = pa.compute.sum(a)          # arrow sum skips nulls
    return int(s.as_py() or 0)


@ray.remote
def _add_scan(tbl: pa.Table, col: str, offset: int, out_col: str,
              shard_col: str | None, capacity: int | None) -> pa.Table:
    vals = tbl[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    vals = np.nan_to_num(vals.astype(np.float64), nan=0.0).astype(np.int64)
    inclusive = np.cumsum(vals) + offset
    out = tbl.append_column(out_col, pa.array(inclusive, pa.int64()))
    if shard_col is not None:
        exclusive = inclusive - vals
        out = out.append_column(
            shard_col, pa.array(exclusive // capacity, pa.int64()))
    return out


def _scan(ds, col: str, order_by, out_col: str,
          shard_col: str | None = None, capacity: int | None = None):
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    ds = ds.sort(order_by).materialize()
    refs = ds.to_arrow_refs()      # blocks arrive in global sort order
    if not refs:
        return ds
    sums = ray.get([_block_sum.remote(r, col) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums[:-1])]).astype(np.int64)
    new_refs = [_add_scan.remote(r, col, int(off), out_col,
                                 shard_col, capacity)
                for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(new_refs)


def running_total(ds, col: str, order_by, out_col: str = "running_total"):
    """Inclusive running sum of ``col`` under a global ``order_by`` sort.
    ≡ SQL ``sum(col) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``."""
    return _scan(ds, col, order_by, out_col)


def pack_by_budget(ds, count_col: str, capacity: int, order_by,
                   shard_col: str = "shard_id",
                   out_col: str = "running_total"):
    """Assign contiguous ~``capacity``-unit shards in ``order_by`` order:
    shard_id = exclusive-running-sum // capacity. A row straddling a
    boundary stays in the earlier shard (shards overshoot by < one row)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    return _scan(ds, count_col, order_by, out_col,
                 shard_col=shard_col, capacity=capacity)
