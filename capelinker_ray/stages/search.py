"""Keyword search: BM25 scoring + global top-k over a document corpus.

The similarity-search suite (stages/simsearch.py) answers "nearest by
embedding"; this module answers the lexical half — "best documents for
these query terms" — with the classical BM25 ranking function (Robertson &
Walker, SIGIR 1994; the Okapi formulation). No reference analog (the
reference links records, it doesn't search them), but any training-data
pipeline needs a corpus keyword probe for audits and targeted sampling.

Distributed shape (both passes stream; nothing materializes the corpus):

  pass 1  per-batch partial (n_docs, total_len, df per term) — a handful
          of int64s per batch regardless of corpus size; one tiny reduce.
  pass 2  broadcast (idf, avglen); per-batch vectorized tf + score, keep
          only each batch's top-k (with boundary ties); ONE single-group
          merge of <= k+ties rows per batch picks the global top-k.

Tokenization matches the rest of the text suite (single-space split, ""
dropped) so the DuckDB oracle can mirror it with string_split/unnest.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray

__all__ = ["bm25_topk"]


def _flat_tokens(df: pd.DataFrame, text_col: str):
    """-> (flat token array, row index per token, rows) for one batch."""
    words = df[text_col].where(df[text_col].notna(), "").str.split(" ")
    n = len(df)
    if not n:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64), 0)
    lens = words.str.len().to_numpy(np.int64)
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = flat != ""
    return flat[keep], rows[keep], n


def _term_tf(flat: np.ndarray, rows: np.ndarray, n: int,
             terms: list[str]) -> np.ndarray:
    """(len(terms), n) per-document term-frequency matrix (float64)."""
    tf = np.zeros((len(terms), n), dtype=np.float64)
    for i, t in enumerate(terms):
        hit = rows[flat == t]
        if len(hit):
            tf[i] = np.bincount(hit, minlength=n)
    return tf


def bm25_topk(ds, terms: list[str], *, k: int = 10, text_col: str = "text",
              id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
              round_to: int = 6, batch_size: int | None = None):
    """Dataset[(id, text)] -> Dataset[(id, score, rank)] — the global
    top-``k`` documents by BM25 over ``terms``, ties broken by id asc.

    score(d) = sum_t  ln((N - df_t + 0.5) / (df_t + 0.5) + 1.0)
                      * (tf_td * (k1 + 1.0))
                      / (tf_td + k1 * (1.0 - b + b * len_d / avglen))

    computed in exactly this operation order (and rounded to ``round_to``)
    so the DuckDB oracle reproduces it bit-for-bit.
    """
    terms = list(terms)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, rows, n = _flat_tokens(df, text_col)
        dlen = (np.bincount(rows, minlength=n) if n
                else np.empty(0, dtype=np.int64))
        tf = _term_tf(flat, rows, n, terms)
        out = {"n_docs": [np.int64(n)],
               "total_len": [np.int64(dlen.sum()) if n else np.int64(0)]}
        for i in range(len(terms)):
            out[f"df_{i}"] = [np.int64((tf[i] > 0).sum())]
        return pd.DataFrame(out)

    parts = ds.map_batches(stats_partial, batch_format="pandas",
                           batch_size=batch_size).take_all()
    n_docs = float(sum(int(r["n_docs"]) for r in parts))
    total_len = float(sum(int(r["total_len"]) for r in parts))
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avglen = total_len / n_docs
    dfs = [float(sum(int(r[f"df_{i}"]) for r in parts))
           for i in range(len(terms))]
    idf = [math.log((n_docs - dft + 0.5) / (dft + 0.5) + 1.0)
           for dft in dfs]
    bc = ray.put((terms, np.asarray(idf, np.float64), avglen))

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        tms, idfv, avg = ray.get(bc)
        flat, rows, n = _flat_tokens(df, text_col)
        if not n:
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                                 "score": pd.Series(dtype=np.float64)})
        dlen = np.bincount(rows, minlength=n).astype(np.float64)
        tf = _term_tf(flat, rows, n, tms)
        denom_norm = k1 * (1.0 - b + b * dlen / avg)      # (n,)
        score = np.zeros(n, dtype=np.float64)
        for i in range(len(tms)):                          # fixed term order
            score = score + idfv[i] * (tf[i] * (k1 + 1.0)) / (
                tf[i] + denom_norm)
        score = np.round(score, round_to)
        ids = df[id_col].to_numpy()
        kk = min(k, n)
        top = np.argpartition(-score, kk - 1)[:kk]
        thr = score[top].min()
        keep = score >= thr        # keep boundary ties for the exact merge
        return pd.DataFrame({id_col: ids[keep], "score": score[keep]})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", id_col], ascending=[False, True],
                            kind="stable").head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    cand = ds.map_batches(score_partial, batch_format="pandas",
                          batch_size=batch_size)
    # <= k+ties rows per batch -> single tiny merge task
    return cand.repartition(1).map_batches(merge, batch_format="pandas")
