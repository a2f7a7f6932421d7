"""Data Selection via Importance Resampling (DSIR; Xie et al., NeurIPS
2023) — select raw-corpus documents whose hashed-n-gram distribution looks
like a small TARGET corpus.

Public method, re-expressed Ray-Data-first:

1. hashed bag-of-words features: token -> FNV-1a-64 -> bucket ``h % B``
   (the tokenizer and hash are the engine-wide ones —
   stages/textstats.fnv1a_64, tokens = ``lower().split()``);
2. bucket unigram counts for the target and the raw corpus: per-batch
   ``np.bincount`` partials (one fixed-width int64 vector per batch),
   merged driver-side — bounded by B, never by corpus size;
3. per-doc importance weight  logw(d) = sum_tokens  log p̂[b] - log q̂[b]
   with add-one-style smoothing  p̂[b] = (target[b]+a) / (T + aB);
   one stateless scoring pass against the ray.put log-ratio vector
   (B float64s, zero shuffle);
4. Gumbel top-k resampling: key = logw + Gumbel(splitmix64(doc_id, seed))
   — sampling WITHOUT replacement proportional to softmax(logw), fully
   deterministic, selected via the bounded ``global_topk`` merge (no
   distributed sort).

100-TB shape: two streaming count passes + one streaming score pass; the
only driver state is the B-float ratio vector. Nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["bucket_counts", "dsir_weights", "dsir_sample"]


def _tok_buckets(texts: pd.Series, buckets: int) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """(doc_index, bucket) arrays for every token of the batch."""
    from .textstats import fnv1a_64

    toks = texts.fillna("").astype(str).str.lower().str.split()
    lens = toks.str.len().to_numpy(np.int64)
    flat: list[str] = [t for row in toks for t in row]
    doc = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    if not flat:
        return doc, np.zeros(0, np.int64)
    b = (fnv1a_64(flat) % np.uint64(buckets)).astype(np.int64)
    return doc, b


def bucket_counts(ds, *, text_col: str = "text",
                  buckets: int = 4096) -> np.ndarray:
    """Corpus-wide hashed-unigram histogram: one ``np.bincount`` partial
    per batch (fixed width ``buckets``), summed in one driver reduce."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        _, b = _tok_buckets(df[text_col], buckets)
        cnt = np.bincount(b, minlength=buckets).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"b": nz.astype(np.int64), "n": cnt[nz]})

    pp = ds.map_batches(part, batch_format="pandas").to_pandas()
    out = np.zeros(buckets, np.int64)
    if len(pp):
        np.add.at(out, pp["b"].to_numpy(np.int64), pp["n"].to_numpy(np.int64))
    return out


def _log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
               smoothing: float) -> np.ndarray:
    a = float(smoothing)
    B = len(target_counts)
    t_tot = float(target_counts.sum())
    r_tot = float(raw_counts.sum())
    lp = np.log((target_counts + a) / (t_tot + a * B))
    lq = np.log((raw_counts + a) / (r_tot + a * B))
    return lp - lq


def dsir_weights(raw, target, *, text_col: str = "text",
                 buckets: int = 4096, smoothing: float = 1.0,
                 out_col: str = "logw"):
    """+ ``out_col``: per-document DSIR importance log-weight of every
    ``raw`` row against the ``target`` corpus distribution."""
    import ray

    tgt = bucket_counts(target, text_col=text_col, buckets=buckets)
    rawc = bucket_counts(raw, text_col=text_col, buckets=buckets)
    lam_ref = ray.put(_log_ratio(tgt, rawc, smoothing))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lam = ray.get(lam_ref)      # zero-copy numpy from plasma
        doc, b = _tok_buckets(df[text_col], buckets)
        acc = np.zeros(len(df))
        if len(b):
            np.add.at(acc, doc, lam[b])
        out = df.copy()
        out[out_col] = acc
        return out

    return raw.map_batches(score, batch_format="pandas")


def _gumbel(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic standard-Gumbel noise keyed on splitmix64(id, seed):
    u = ((h >> 11) + 0.5) * 2^-53  (strictly inside (0,1)), g = -ln(-ln u).
    The SQL twin uses the identical expression."""
    from .sampling import sample_hash

    h = sample_hash(ids.astype(np.int64), seed)
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0 ** -53
    return -np.log(-np.log(u))


def dsir_sample(raw, target, *, k: int, id_col: str = "doc_id",
                text_col: str = "text", buckets: int = 4096,
                smoothing: float = 1.0, seed: int = 0,
                out_col: str = "logw"):
    """Top-``k`` Gumbel resample of ``raw`` by DSIR importance weight —
    a deterministic sample without replacement ∝ softmax(logw).
    Returns the selected rows with ``out_col`` (and ``_gkey`` dropped)."""
    scored = dsir_weights(raw, target, text_col=text_col, buckets=buckets,
                          smoothing=smoothing, out_col=out_col)

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_gkey"] = out[out_col].to_numpy() + _gumbel(
            out[id_col].to_numpy(np.int64), seed)
        return out

    from .reshape import global_topk
    keyed = scored.map_batches(add_key, batch_format="pandas")
    top = global_topk(keyed, ["_gkey", id_col], k, ascending=[False, True])
    return top.drop_columns(["_gkey"])
