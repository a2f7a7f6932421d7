"""Corpus character-trigram LM perplexity — the CCNet-style quality gate.

CCNet (Wenzek et al. 2020, public) filters web text by language-model
perplexity; without KenLM in the sandbox the same signal comes from a
character-trigram model TRAINED ON THE CORPUS ITSELF in one distributed
counting pass:

  P(c3 | c1 c2) = (count(c1c2c3) + 1) / (count(c1c2·) + V)      (add-one)

with V = distinct third-character vocabulary and count(c1c2·) the sum of
trigram counts sharing the context — derived FROM the trigram table, so
one count pass feeds both numerator and denominator (and the SQL oracle
mirrors it with a GROUP BY over the same table).

Scale shape: batch-vectorized positional trigram extraction (one utf-32
encode per batch — stages/bigram.py kernel style), a grouped_map merge of
(code, n) partials (the trigram key is high-cardinality — Ray's native
aggregate pays per-key Python), then the merged table is CHARSET-BOUNDED
(≤ |alphabet|³ rows regardless of corpus size, unlike a word LM), so it
broadcasts via ``ray.put`` and the scoring pass is one shuffle-free
``map_batches`` of searchsorted lookups + one bincount log-sum per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

__all__ = ["trigram_nll"]

_B = 0x110000            # codepoint base; B^3 < 2^63 so int64 holds a code
_SEP = " "


def _batch_tri_codes(texts) -> tuple:
    """(doc_idx, tri_codes) — one entry per trigram POSITION (not
    distinct), positional validity so texts containing the separator keep
    their trigrams."""
    n = len(texts)
    is_str = np.fromiter((isinstance(s, str) and len(s) >= 3 for s in texts),
                         dtype=bool, count=n)
    idxs = np.nonzero(is_str)[0]
    if len(idxs) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    parts = [texts[i] for i in idxs]
    full = _SEP.join(parts)
    cps = np.frombuffer(full.encode("utf-32-le"), dtype=np.uint32)
    if len(cps) < 3:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    c = cps.astype(np.int64)
    codes = (c[:-2] * _B + c[1:-1]) * _B + c[2:]
    lens = np.array([len(p) for p in parts], dtype=np.int64)
    starts = np.cumsum(lens + 1) - (lens + 1)
    pos = np.arange(len(codes), dtype=np.int64)
    owner = np.searchsorted(starts, pos, side="right") - 1
    valid = pos + 2 < starts[owner] + lens[owner]
    return idxs[owner[valid]], codes[valid]


def trigram_nll(ds, *, text_col: str = "text", id_col: str = "doc_id",
                out_col: str = "nll", input_partitions="auto",
                min_count: int = 1):
    """Dataset[(id_col, n_tri, out_col)] — per-document mean negative log
    probability under the corpus's own add-one-smoothed trigram LM.
    Documents with fewer than 3 characters (or null text) are omitted.
    High ``nll`` = improbable character sequences = gibberish/boilerplate
    candidates.

    Driver-memory bound: the broadcast model holds the DISTINCT OBSERVED
    trigrams (not |alphabet|³ — for CJK/multilingual corpora observed
    trigrams grow with corpus size). ``min_count > 1`` prunes rarer
    trigrams from the table before the driver collect (context sums are
    computed BEFORE pruning, so surviving probabilities are unchanged);
    pruned trigrams score through the unseen-code path — add-one
    smoothing already defines their mass — capping driver memory at the
    head of the Zipf curve."""
    from .dedup import _widen
    from .grouped import grouped_map
    ds = _widen(ds, input_partitions)
    slim = ds.select_columns([id_col, text_col])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        _, codes = _batch_tri_codes(df[text_col].to_numpy(dtype=object))
        uniq, cnt = np.unique(codes, return_counts=True)
        return pd.DataFrame({"code": uniq, "n": cnt.astype(np.int64)})

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("code", sort=False)["n"].sum().reset_index()

    tri = grouped_map(slim.map_batches(partial_counts,
                                       batch_format="pandas"),
                      "code", merge_counts).to_pandas()
    if not len(tri) or "code" not in tri.columns:
        # empty / all-too-short corpus: typed empty result
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.string()),
            "n_tri": pa.array([], pa.int64()),
            out_col: pa.array([], pa.float64())}))

    codes = tri["code"].to_numpy(np.int64)
    counts = tri["n"].to_numpy(np.int64)
    order = np.argsort(codes)
    codes, counts = codes[order], counts[order]
    ctx_codes_all = codes // _B
    ctx_uniq, ctx_inv = np.unique(ctx_codes_all, return_inverse=True)
    ctx_counts = np.bincount(ctx_inv, weights=counts).astype(np.int64)
    v = int(len(np.unique(codes % _B)))          # distinct third chars
    if min_count > 1:
        # prune AFTER context sums so surviving P(c3|c1c2) are unchanged;
        # dropped trigrams fall through the unseen-code path below.
        keep_tri = counts >= min_count
        codes, counts = codes[keep_tri], counts[keep_tri]
    model_ref = ray.put((codes, counts, ctx_uniq, ctx_counts, v))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cds, cnts, cu, cc, vv = ray.get(model_ref)
        doc_idx, tcodes = _batch_tri_codes(
            df[text_col].to_numpy(dtype=object))
        if not len(tcodes):
            return pd.DataFrame({id_col: pd.Series(dtype=object),
                                 "n_tri": pd.Series(dtype=np.int64),
                                 out_col: pd.Series(dtype=np.float64)})
        # guarded lookups: codes unseen at train time (pruned via
        # min_count, or text the model never saw) get count 0 — add-one
        # smoothing already defines their probability; unseen contexts
        # get mass 0 the same way.  An unguarded searchsorted would index
        # out of bounds or read a neighbor's count.
        ti = np.searchsorted(cds, tcodes)
        t_ok = (ti < len(cds))
        t_ok[t_ok] &= cds[ti[t_ok]] == tcodes[t_ok]
        tn = np.zeros(len(tcodes), np.int64)
        tn[t_ok] = cnts[ti[t_ok]]
        ctx = tcodes // _B
        ci = np.searchsorted(cu, ctx)
        c_ok = (ci < len(cu))
        c_ok[c_ok] &= cu[ci[c_ok]] == ctx[c_ok]
        cm = np.zeros(len(tcodes), np.int64)
        cm[c_ok] = cc[ci[c_ok]]
        logp = np.log((tn + 1.0) / (cm + float(vv)))
        n_docs = len(df)
        n_tri = np.bincount(doc_idx, minlength=n_docs)
        tot = np.bincount(doc_idx, weights=logp, minlength=n_docs)
        keep = n_tri > 0
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "n_tri": n_tri[keep].astype(np.int64),
            out_col: np.round(-tot[keep] / n_tri[keep], 6),
        })

    return slim.map_batches(score, batch_format="pandas")
