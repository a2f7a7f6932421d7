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
  heavy_hitters     Misra-Gries candidates + exact recount: per-batch
                    bounded-size frequency sketch (Misra & Gries 1982;
                    merge rule per Agarwal et al., "Mergeable Summaries",
                    PODS 2012), then an exact second pass counting ONLY
                    the surviving candidates — the output is VALUE-EXACT
                    (every item with global count >= ceil(phi*total),
                    true counts) while nothing ever shuffles the full
                    distinct-token set the way vocab_counts must.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from ray.data.aggregate import Max, Min

from .textstats import fnv1a_64

__all__ = ["approx_distinct", "approx_distinct_by", "approx_quantiles",
           "heavy_hitters",
           "count_min", "count_min_estimate", "CountMinSketch", "grouped_heavy_hitters"]


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
            # rho = leading zeros of the (64-p)-bit suffix + 1; suffix has
            # <= 50 bits so float64 frexp is exact
            idx, rho = _hll_rho(_hash_column(v), suffix_bits)
            np.maximum.at(reg, idx, rho)
        return pd.DataFrame({"_reg": [reg.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    reg = np.zeros(m, dtype=np.int8)
    for r in parts:
        reg = np.maximum(reg, np.frombuffer(r["_reg"], dtype=np.int8))
    return _hll_estimate(reg)


def _hll_rho(h: np.ndarray, suffix_bits: np.uint64) -> tuple:
    """(register index, rho) pairs for uint64 hashes."""
    idx = (h >> suffix_bits).astype(np.int64)
    w = h & ((np.uint64(1) << suffix_bits) - np.uint64(1))
    _, e = np.frexp(w.astype(np.float64))
    rho = (int(suffix_bits) - e + 1).astype(np.int8)
    return idx, rho


def _hll_estimate(reg: np.ndarray) -> int:
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def approx_distinct_by(ds, key_col: str, col: str, *, p: int = 12):
    """GROUPED HyperLogLog: Dataset[(key_col, n_distinct)] with ~1.6% (p=12)
    relative error per group — "distinct users per language" at 100 TB
    without shuffling the (key, user) pair set the way the exact
    count-distinct must.

    Per batch: ONE hash pass + a single flat ``np.maximum.at`` scatter
    across all groups of the batch (key codes × 2^p registers); each batch
    ships one 2^p-byte register row per key it saw. Merge is an
    elementwise max per key inside one grouped_map partition — mergeable
    and associative, so partials combine in any order.
    """
    m = 1 << p
    suffix_bits = np.uint64(64 - p)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_col, col]].dropna()
        if not len(df):
            return pd.DataFrame({key_col: pd.Series(dtype=object),
                                 "_reg": pd.Series(dtype=object)})
        codes, uniq = pd.factorize(df[key_col], sort=False)
        h = _hash_column(df[col].to_numpy())
        idx, rho = _hll_rho(h, suffix_bits)
        regs = np.zeros(len(uniq) * m, dtype=np.int8)
        np.maximum.at(regs, codes.astype(np.int64) * m + idx, rho)
        regs = regs.reshape(len(uniq), m)
        return pd.DataFrame({key_col: np.asarray(uniq, dtype=object),
                             "_reg": [r.tobytes() for r in regs]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        keys, ests = [], []
        for k, rows in g.groupby(key_col, sort=False):
            stack = np.frombuffer(b"".join(rows["_reg"]),
                                  dtype=np.int8).reshape(len(rows), m)
            keys.append(k)
            ests.append(_hll_estimate(stack.max(axis=0)))
        return pd.DataFrame({key_col: keys,
                             "n_distinct": np.asarray(ests, np.int64)})

    from .grouped import grouped_map
    parts = ds.map_batches(partial, batch_format="pandas")
    return grouped_map(parts, key_col, merge)


def heavy_hitters(ds, col: str, *, phi: float = 0.001,
                  tokenize: bool = False, sketch_size: int | None = None):
    """EXACT frequent items: Dataset[(token, n)] of every value of ``col``
    (or every single-space token of it when ``tokenize=True``) whose global
    count reaches ``ceil(phi * total)``, with true counts.

    Two passes, both bounded-state (the 100-TB answer to "find the stop
    words / boilerplate lines / dominant values" without a full
    distinct-key shuffle):

    1. per-batch Misra-Gries sketch of ``B = max(64, ceil(4/phi))``
       counters (exact in-batch counts reduced by subtracting the
       (B+1)-th largest — each item's undercount is <= batch_total/B, so
       the summed undercount across batches is <= total/B); partials merge
       through ONE tiny (token, n) groupby, and candidates are everything
       whose merged residual could still reach the threshold. With
       B = 4/phi the candidate set is <= ~4/(3*phi) items regardless of
       corpus size — kilobytes on the driver.
    2. exact recount of the broadcast candidate set (per-batch bincount of
       candidate hits only, one tiny groupby), filtered at the true
       threshold.

    Empty strings are never counted (in both modes) — the "" key carries
    the per-batch token totals through the same shuffle.

    Reference analog: ``namefreq``-style grouped counts
    (data_raw/traindata_graafreinet.R:121-122) when the key set is too
    large to shuffle exactly.
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    B = sketch_size or max(64, int(math.ceil(4.0 / phi)))

    def extract(df: pd.DataFrame) -> np.ndarray:
        if tokenize:
            words = df[col].where(df[col].notna(), "").str.split(" ")
            if not len(words):
                return np.empty(0, dtype=object)
            flat = np.concatenate(
                [np.asarray(w, dtype=object) for w in words])
        else:
            flat = df[col].dropna().to_numpy(dtype=object)
        return flat[flat != ""] if len(flat) else flat

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat = extract(df)
        if not len(flat):
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        codes, uniq = pd.factorize(flat, sort=False)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        total = int(cnt.sum())
        uniq = np.asarray(uniq, dtype=object)
        if len(uniq) > B:
            order = np.argsort(-cnt, kind="stable")
            offset = cnt[order[B]]          # (B+1)-th largest
            keep = order[:B]
            resid = cnt[keep] - offset
            pos = resid > 0
            uniq, cnt = uniq[keep][pos], resid[pos]
        out = pd.DataFrame({"token": uniq, "n": cnt})
        # "" is excluded from tokens above, so it can carry the batch total
        return pd.concat(
            [out, pd.DataFrame({"token": [""], "n": [total]})],
            ignore_index=True)

    from .grouped import grouped_map

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("token", sort=False)["n"].sum().reset_index())

    merged = grouped_map(
        ds.map_batches(sketch_partial, batch_format="pandas"),
        "token", combine)
    # ONE bounded collect of the sketch table (<= B residuals per input
    # batch, merged) — the "" carrier row holds the global total, so no
    # extra per-row-filter dataset pass is spent on either scalar or the
    # candidate list
    mdf = merged.to_pandas()
    tot_rows = mdf[mdf["token"] == ""]
    total = int(tot_rows["n"].iloc[0]) if len(tot_rows) else 0
    if total == 0:
        import ray.data as rd
        return rd.from_pandas(mdf)  # no tokens anywhere -> already empty
    threshold = int(math.ceil(phi * total))
    # merged residual of a true heavy hitter >= threshold - total//B
    floor_n = max(1, threshold - total // B)
    cand = mdf.loc[(mdf["token"] != "") & (mdf["n"] >= floor_n),
                   "token"].tolist()

    import ray
    cand_ref = ray.put(pd.Index(np.asarray(cand, dtype=object)))

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(cand_ref)
        flat = extract(df)
        if not len(flat) or not len(idx):
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        pos = idx.get_indexer(flat)
        pos = pos[pos >= 0]
        if not len(pos):
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        cnt = np.bincount(pos, minlength=len(idx)).astype(np.int64)
        hit = cnt > 0
        return pd.DataFrame({"token": idx.to_numpy(dtype=object)[hit],
                             "n": cnt[hit]})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("token", sort=False)["n"].sum().reset_index())
        return out[out["n"] >= threshold]

    return grouped_map(
        ds.map_batches(recount, batch_format="pandas"),
        "token", finalize)


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


class CountMinSketch:
    """Fixed-size (depth x width) count-min table (Cormode & Muthukrishnan,
    J.Alg 2005). ``estimate(key)`` over-counts only: true_count <= est <=
    true_count + eps*TOTAL with prob 1-delta, eps = e/width, delta =
    e^-depth. Merge = elementwise add (associative), so per-batch partials
    reduce in one pass."""

    def __init__(self, width: int, depth: int, seed: int, table=None):
        self.width, self.depth, self.seed = width, depth, seed
        self.table = (np.zeros((depth, width), np.int64)
                      if table is None else table)

    def _cols(self, hashed: np.ndarray) -> np.ndarray:
        """(depth, n) column indices from one base hash per key."""
        from .dedup import _splitmix64
        rows = []
        for d in range(self.depth):
            c = (0x9E3779B97F4A7C15 * (d + 1) + self.seed) & ((1 << 64) - 1)
            mix = hashed ^ np.uint64(c)
            rows.append((_splitmix64(mix) % np.uint64(self.width))
                        .astype(np.int64))
        return np.stack(rows)

    def add_hashed(self, hashed: np.ndarray, counts: np.ndarray) -> None:
        cols = self._cols(hashed)
        for d in range(self.depth):           # depth is ~4: bounded loop
            np.add.at(self.table[d], cols[d], counts)

    def estimate_hashed(self, hashed: np.ndarray) -> np.ndarray:
        cols = self._cols(hashed)
        ests = np.stack([self.table[d][cols[d]]
                         for d in range(self.depth)])
        return ests.min(axis=0)


def count_min(ds, col: str, *, width: int = 2048, depth: int = 4,
              seed: int = 0) -> CountMinSketch:
    """Corpus-wide Count-Min frequency sketch of ``col`` values: each batch
    builds a (depth x width) int64 partial (fixed KBs regardless of rows),
    the partials SUM in one reduce — the point-frequency complement to
    HyperLogLog (distincts) and Misra-Gries (top items). Use when the
    distinct-key set is too big even for ``heavy_hitters``' candidate
    recount and an eps*N over-estimate is acceptable. Nulls are skipped."""
    shape = (depth, width)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = CountMinSketch(width, depth, seed)
        v = df[col].dropna().to_numpy()
        if len(v):
            h = _hash_column(v)
            # one add per DISTINCT hashed key in the batch
            uh, cnt = np.unique(h, return_counts=True)
            sk.add_hashed(uh, cnt.astype(np.int64))
        return pd.DataFrame({"cell": [sk.table.ravel()]})

    parts = ds.map_batches(partial, batch_format="pandas")
    merged = np.zeros(depth * width, np.int64)
    for row in parts.iter_rows():             # one KB-sized row per batch
        merged += np.asarray(row["cell"], np.int64)
    return CountMinSketch(width, depth, seed, merged.reshape(shape))


def count_min_estimate(sk: CountMinSketch, values) -> np.ndarray:
    """Point-frequency estimates for ``values`` (any dtype the corpus
    column had) against a built sketch."""
    v = np.asarray(values, dtype=object)
    return sk.estimate_hashed(_hash_column(v))


def grouped_heavy_hitters(ds, group_col: str, col: str, *,
                          phi: float = 0.01, sketch_size: int | None = None,
                          tokenize: bool = True):
    """PER-GROUP phi-heavy hitters with exact final counts — 'every
    token above phi of its LANGUAGE's tokens' when the per-group key set
    is too large to shuffle exactly. Same two-pass Misra-Gries shape as
    :func:`heavy_hitters`, grouped:

    1. per-batch, per-group MG sketch of ``B = max(64, ceil(4/phi))``
       counters (the "" carrier row holds each group's batch total);
       partials merge in ONE grouped_map keyed by ``group_col`` — each
       partition owns complete groups, so the candidate floor
       ``ceil(phi·total) - total/B`` is computed in-partition.
    2. exact recount of the broadcast (group, token) candidate index,
       filtered at each group's true threshold. The driver holds only
       candidates + per-group totals: <= ~4/(3·phi) tokens per group —
       bounded by #groups/phi, not by the corpus.

    Returns Dataset[(group_col, token, n)] with EXACT n."""
    import ray

    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    B = sketch_size or max(64, int(math.ceil(4.0 / phi)))
    from .grouped import grouped_map

    def explode(df: pd.DataFrame):
        """(group, token) arrays for one batch, empties dropped."""
        if tokenize:
            words = df[col].where(df[col].notna(), "").str.split(" ")
            lens = words.str.len().to_numpy(np.int64)
            if not len(words) or not lens.sum():
                e = np.empty(0, object)
                return e, e
            flat = np.concatenate(
                [np.asarray(w, dtype=object) for w in words])
            grp = np.repeat(df[group_col].to_numpy(dtype=object), lens)
        else:
            flat = df[col].to_numpy(dtype=object)
            grp = df[group_col].to_numpy(dtype=object)
            ok0 = pd.notna(flat)
            flat, grp = flat[ok0], grp[ok0]
        ok = flat != ""
        return grp[ok], flat[ok]

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        grp, flat = explode(df)
        empty = pd.DataFrame({group_col: pd.Series(dtype=object),
                              "token": pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64)})
        if not len(flat):
            return empty
        t = pd.DataFrame({group_col: grp, "token": flat})
        cnt = (t.groupby([group_col, "token"], sort=False).size()
               .rename("n").reset_index())
        frames = []
        for g, sub in cnt.groupby(group_col, sort=False):
            c = sub["n"].to_numpy(np.int64)
            uniq = sub["token"].to_numpy(object)
            total = int(c.sum())
            if len(uniq) > B:
                order = np.argsort(-c, kind="stable")
                offset = c[order[B]]
                keep = order[:B]
                resid = c[keep] - offset
                pos = resid > 0
                uniq, c = uniq[keep][pos], resid[pos]
            frames.append(pd.DataFrame({group_col: g, "token": uniq,
                                        "n": c}))
            frames.append(pd.DataFrame({group_col: [g], "token": [""],
                                        "n": [total]}))
        return pd.concat(frames, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        """Complete groups per partition: merged residuals + in-partition
        candidate floor; emits candidates AND the per-group total row."""
        tot = (df.groupby([group_col, "token"], sort=False)["n"]
               .sum().reset_index())
        totals = tot[tot["token"] == ""].set_index(group_col)["n"]
        out = []
        for g, sub in tot[tot["token"] != ""].groupby(group_col,
                                                      sort=False):
            total = int(totals.get(g, 0))
            if total == 0:
                continue
            thresh = int(math.ceil(phi * total))
            floor_n = max(1, thresh - total // B)
            cand = sub[sub["n"] >= floor_n]
            out.append(pd.DataFrame({group_col: cand[group_col],
                                     "token": cand["token"],
                                     "n": np.int64(0),
                                     "thresh": np.int64(thresh)}))
        if not out:
            return pd.DataFrame({group_col: pd.Series(dtype=object),
                                 "token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64),
                                 "thresh": pd.Series(dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    cand = grouped_map(ds.map_batches(sketch_partial,
                                      batch_format="pandas"),
                       group_col, combine).to_pandas()
    if not len(cand):
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table({
            group_col: pa.array([], pa.string()),
            "token": pa.array([], pa.string()),
            "n": pa.array([], pa.int64())}))
    idx = pd.MultiIndex.from_frame(cand[[group_col, "token"]])
    thresh_by_pair = cand["thresh"].to_numpy(np.int64)
    cand_ref = ray.put((idx, thresh_by_pair))

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        cidx, _ = ray.get(cand_ref)
        grp, flat = explode(df)
        empty = pd.DataFrame({group_col: pd.Series(dtype=object),
                              "token": pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64)})
        if not len(flat):
            return empty
        pos = cidx.get_indexer(
            pd.MultiIndex.from_arrays([grp, flat]))
        pos = pos[pos >= 0]
        if not len(pos):
            return empty
        c = np.bincount(pos, minlength=len(cidx)).astype(np.int64)
        hit = c > 0
        return pd.DataFrame({
            group_col: cidx.get_level_values(0).to_numpy(object)[hit],
            "token": cidx.get_level_values(1).to_numpy(object)[hit],
            "n": c[hit]})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cidx, th = ray.get(cand_ref)
        tot = (df.groupby([group_col, "token"], sort=False)["n"]
               .sum().reset_index())
        pos = cidx.get_indexer(
            pd.MultiIndex.from_frame(tot[[group_col, "token"]]))
        return tot[tot["n"].to_numpy(np.int64) >= th[pos]]

    return grouped_map(ds.map_batches(recount, batch_format="pandas"),
                       [group_col, "token"], finalize)
