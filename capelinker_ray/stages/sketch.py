"""Mergeable sketches: approximate distinct counts + quantiles.

100-TB aggregates the exact operators can't afford: a ``unique()`` or
``sort()`` for one scalar answer is an all-to-all shuffle of every value.
Each sketch here follows the same shape — a VECTORIZED per-batch partial
(fixed-size state), one tiny reduce of the partials, a driver-side
finalize — so the input streams through untouched and the shuffle carries
kilobytes.

  approx_distinct   HyperLogLog (Flajolet et al. 2007, public): 2^p
                    registers; per batch one hash pass + register max;
                    merge = elementwise max (associative); ~1.04/sqrt(2^p)
                    relative error (p=14 -> ~0.8%).
  approx_quantiles  two-pass fixed-bin histogram: global min/max
                    aggregate, then per-batch bincount partials summed in
                    one reduce; quantile values interpolate within their
                    bin — absolute error bounded by (max-min)/bins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data.aggregate import Max, Min

from .textstats import fnv1a_64

__all__ = ["approx_distinct", "approx_quantiles"]


def _hash_column(vals: np.ndarray) -> np.ndarray:
    """Column values -> uint64 hashes (strings via FNV, numerics via
    splitmix)."""
    from .dedup import _splitmix64
    if vals.dtype.kind in "iu":
        return _splitmix64(vals.astype(np.uint64))
    if vals.dtype.kind == "f":
        return _splitmix64(vals.astype(np.float64).view(np.uint64))
    # post-mix: FNV's high bits avalanche poorly and HLL indexes by them
    return _splitmix64(
        fnv1a_64([v if isinstance(v, str) else repr(v) for v in vals]))


def approx_distinct(ds, col: str, *, p: int = 14) -> int:
    """HyperLogLog distinct-count estimate of ``col`` (~0.8% at p=14)."""
    m = 1 << p
    suffix_bits = np.uint64(64 - p)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(m, dtype=np.int8)
        v = df[col].dropna().to_numpy()
        if len(v):
            h = _hash_column(v)
            idx = (h >> suffix_bits).astype(np.int64)
            w = h & ((np.uint64(1) << suffix_bits) - np.uint64(1))
            # rho = leading zeros of the (64-p)-bit suffix + 1; suffix has
            # <= 50 bits so float64 frexp is exact
            _, e = np.frexp(w.astype(np.float64))
            rho = (int(suffix_bits) - e + 1).astype(np.int8)
            np.maximum.at(reg, idx, rho)
        return pd.DataFrame({"_reg": [reg.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    reg = np.zeros(m, dtype=np.int8)
    for r in parts:
        reg = np.maximum(reg, np.frombuffer(r["_reg"], dtype=np.int8))

    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)           # linear-counting correction
    return int(round(est))


def approx_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75), *,
                     bins: int = 4096) -> pd.DataFrame:
    """Histogram quantiles of ``col``: (q, value) frame; absolute error
    <= (max - min) / bins."""
    stats = ds.aggregate(Min(col, alias_name="lo"),
                         Max(col, alias_name="hi"))
    if stats is None or stats.get("lo") is None or stats.get("hi") is None:
        # empty / all-null column: no quantiles exist — NaN frame, not a
        # TypeError from float(None)
        return pd.DataFrame({"q": [float(q) for q in qs],
                             "value": [float("nan")] * len(qs)})
    lo, hi = float(stats["lo"]), float(stats["hi"])
    if hi <= lo:
        # constant column: every quantile IS the value (interpolating
        # inside a fallback-width bin would report lo + up to 1.0)
        return pd.DataFrame({"q": [float(q) for q in qs],
                             "value": [lo] * len(qs)})
    width = (hi - lo) / bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna().to_numpy(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        return pd.DataFrame({"_hist": [np.bincount(b, minlength=bins)
                                       .astype(np.int64).tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    hist = np.zeros(bins, dtype=np.int64)
    for r in parts:
        hist += np.frombuffer(r["_hist"], dtype=np.int64)
    n = int(hist.sum())
    cum = np.cumsum(hist)
    out = []
    for q in qs:
        target = q * n
        b = int(np.searchsorted(cum, target, side="left"))
        prev = cum[b - 1] if b else 0
        inbin = hist[b] if hist[b] else 1
        frac = (target - prev) / inbin
        out.append((float(q), lo + (b + frac) * width))
    return pd.DataFrame(out, columns=["q", "value"])
