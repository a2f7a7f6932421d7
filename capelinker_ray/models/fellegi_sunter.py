"""Fellegi-Sunter probabilistic record-linkage scoring.

The classic unsupervised complement to the reference's trained GBT/RF
scorers (pred.R): per-field agreement probabilities among true matches
(``m``) and non-matches (``u``) estimated with EM (Winkler 1988), then
each candidate pair scored with the log-likelihood-ratio match weight
``sum_k a_k*log2(m_k/u_k) + (1-a_k)*log2((1-m_k)/(1-u_k))``
(Fellegi & Sunter, JASA 1969 — both public-domain methods).

Distributed shape (the 100-TB contract):
  * EM never sees pairs — the corpus collapses to AGREEMENT-PATTERN
    counts (at most 2^K rows for K binary fields) via per-batch partial
    groupby + one merge task (``stages/agg.small_group_sum``: no sort
    shuffle). EM then iterates on the driver over that tiny table;
    iteration cost is independent of corpus size.
  * Scoring is one stateless ``map_batches`` pass with the K weights
    broadcast in the closure — zero shuffle.

Agreement columns must be binary 0/1 (booleans accepted); nulls count as
DISAGREEMENT (deterministic, SQL-expressible: ``COALESCE(a, 0)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["fs_em_weights", "fs_score"]

_EPS = 1e-6


def _pattern_counts(pairs, agree_cols: list[str]) -> pd.DataFrame:
    from ..stages.agg import small_group_sum

    def binarize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in agree_cols:
            v = df[c]
            if v.dtype == bool:
                v = v.astype(np.int64)
            out[c] = (pd.to_numeric(v, errors="coerce").fillna(0) != 0
                      ).astype(np.int64)
        out["_n"] = np.int64(1)
        return out

    counts = small_group_sum(
        pairs.map_batches(binarize, batch_format="pandas"),
        agree_cols, ["_n"])
    return counts.to_pandas()


def fs_em_weights(pairs, agree_cols: list[str], *, max_iter: int = 1000,
                  tol: float = 1e-9, init_m: float = 0.9,
                  init_u: float = 0.1, init_p: float = 0.1) -> dict:
    """Estimate per-field (m, u) and match prevalence p by EM over the
    agreement-pattern counts of ``pairs``. Returns
    ``{"m": {col: m}, "u": {col: u}, "p": p, "iterations": n,
    "converged": bool, "patterns": n_distinct}``."""
    pat = _pattern_counts(pairs, agree_cols)
    if len(pat) == 0:
        raise ValueError("fs_em_weights: no pairs")
    A = pat[agree_cols].to_numpy(np.float64)          # patterns x K
    c = pat["_n"].to_numpy(np.float64)                # pattern counts
    K = len(agree_cols)
    m = np.full(K, float(init_m))
    u = np.full(K, float(init_u))
    p = float(init_p)
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        # E step: P(match | pattern) via log-space products
        lm = (A @ np.log(m) + (1 - A) @ np.log(1 - m)) + np.log(p)
        lu = (A @ np.log(u) + (1 - A) @ np.log(1 - u)) + np.log(1 - p)
        hi = np.maximum(lm, lu)
        w = np.exp(lm - hi) / (np.exp(lm - hi) + np.exp(lu - hi))
        # M step
        cw = c * w
        cu = c * (1 - w)
        p_new = cw.sum() / c.sum()
        m_new = (A * cw[:, None]).sum(0) / max(cw.sum(), _EPS)
        u_new = (A * cu[:, None]).sum(0) / max(cu.sum(), _EPS)
        m_new = np.clip(m_new, _EPS, 1 - _EPS)
        u_new = np.clip(u_new, _EPS, 1 - _EPS)
        p_new = min(max(p_new, _EPS), 1 - _EPS)
        delta = max(np.abs(m_new - m).max(), np.abs(u_new - u).max(),
                    abs(p_new - p))
        m, u, p = m_new, u_new, p_new
        if delta < tol:
            converged = True
            break
    return {"m": dict(zip(agree_cols, m.tolist())),
            "u": dict(zip(agree_cols, u.tolist())),
            "p": p, "iterations": it, "converged": converged,
            "patterns": len(pat)}


def fs_score(pairs, weights: dict, agree_cols: list[str], *,
             out_col: str = "fs_weight"):
    """Attach the Fellegi-Sunter log2 match weight to every pair — one
    stateless vectorized pass, weights carried in the closure (K floats).
    ``weights`` is ``fs_em_weights`` output or hand-pinned
    ``{"m": {...}, "u": {...}}``."""
    m = np.array([min(max(weights["m"][c], _EPS), 1 - _EPS)
                  for c in agree_cols])
    u = np.array([min(max(weights["u"][c], _EPS), 1 - _EPS)
                  for c in agree_cols])
    w_agree = np.log2(m / u)
    w_disagree = np.log2((1 - m) / (1 - u))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        total = np.zeros(len(df), np.float64)
        for k, c in enumerate(agree_cols):
            v = df[c]
            if v.dtype == bool:
                a = v.to_numpy(np.float64)
            else:
                a = (pd.to_numeric(v, errors="coerce").fillna(0)
                     .to_numpy(np.float64) != 0).astype(np.float64)
            total += a * w_agree[k] + (1 - a) * w_disagree[k]
        df[out_col] = total
        return df

    return pairs.map_batches(score, batch_format="pandas")
