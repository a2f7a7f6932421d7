"""BM25 keyword search (stages/search.py): exact scores vs a local
reference implementation, tie determinism, edge cases."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.search import bm25_topk


def _local_bm25(texts, terms, k1=1.2, b=0.75):
    toks = [[t for t in (s or "").split(" ") if t != ""] for s in texts]
    lens = np.array([len(t) for t in toks], dtype=np.float64)
    n = float(len(texts))
    avglen = lens.sum() / n
    scores = np.zeros(len(texts))
    for term in terms:
        tf = np.array([t.count(term) for t in toks], dtype=np.float64)
        df = float((tf > 0).sum())
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        scores = scores + idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * lens / avglen))
    return np.round(scores, 6)


def test_bm25_matches_local_reference(ray_session):
    rng = np.random.default_rng(21)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(300)]
    terms = ["alpha", "delta"]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    out = (bm25_topk(rd.from_pandas(df).repartition(7), terms, k=15)
           .to_pandas().sort_values("rank"))
    ref = _local_bm25(texts, terms)
    order = np.lexsort((np.arange(300), -ref))[:15]
    assert list(out["doc_id"]) == list(order)
    np.testing.assert_array_equal(out["score"].to_numpy(), ref[order])
    assert list(out["rank"]) == list(range(1, 16))


def test_bm25_tie_break_by_id(ray_session):
    """Identical docs score identically -> rank order is id order."""
    df = pd.DataFrame({"doc_id": [5, 3, 9, 1],
                       "text": ["cat dog"] * 4})
    out = (bm25_topk(rd.from_pandas(df).repartition(2), ["cat"], k=3)
           .to_pandas().sort_values("rank"))
    assert list(out["doc_id"]) == [1, 3, 5]


def test_bm25_empty_and_null_text(ray_session):
    """Docs with no tokens score 0 for every term and still rank."""
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["needle here", None, ""]})
    out = (bm25_topk(rd.from_pandas(df), ["needle"], k=3)
           .to_pandas().sort_values("rank"))
    assert list(out["doc_id"]) == [1, 2, 3]
    assert out["score"].iloc[0] > 0
    assert (out["score"].iloc[1:] == 0).all()
