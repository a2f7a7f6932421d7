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


def _np_tfidf_cosine(texts, max_df):
    """Ground-truth tf-idf cosine for a tiny corpus."""
    import collections
    import math
    N = len(texts)
    toks = [collections.Counter(t.split(" ")) for t in texts]
    for c in toks:
        c.pop("", None)
    df = collections.Counter()
    for c in toks:
        df.update(c.keys())
    vecs = []
    for c in toks:
        vecs.append({t: n * math.log(N / df[t])
                     for t, n in c.items() if df[t] <= max_df})
    norms = [math.sqrt(sum(w * w for w in v.values())) for v in vecs]
    out = {}
    for i in range(N):
        for j in range(i + 1, N):
            shared = set(vecs[i]) & set(vecs[j])
            shared = {t for t in shared if df[t] >= 2}
            if not shared or not norms[i] or not norms[j]:
                continue
            d = sum(vecs[i][t] * vecs[j][t] for t in shared)
            out[(i, j)] = d / (norms[i] * norms[j])
    return out


def test_tfidf_cosine_pairs_matches_ground_truth(ray_session):
    from capelinker_ray.stages.search import tfidf_cosine_pairs
    texts = ["apple banana cherry date",
             "apple banana cherry elderberry",
             "fig grape melon kiwi",
             "fig grape melon lime",
             "solo unique words here only"]
    docs = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                         "text": texts})
    got = (tfidf_cosine_pairs(rd.from_pandas(docs).repartition(3),
                              threshold=0.1, max_df=100)
           .to_pandas())
    want = {k: v for k, v in _np_tfidf_cosine(texts, 100).items()
            if v >= 0.1}
    gm = {(int(r.id_from), int(r.id_to)): r.cosine
          for r in got.itertuples()}
    assert set(gm) == set(want)
    for k in want:
        assert abs(gm[k] - want[k]) < 1e-9
    # the two planted near-dup pairs dominate
    assert gm[(0, 1)] > 0.4 and gm[(2, 3)] > 0.4


def test_tfidf_cosine_pairs_stopword_prune(ray_session):
    from capelinker_ray.stages.search import tfidf_cosine_pairs
    # 'the' appears in every doc; with max_df=2 it is pruned so the
    # only similarity channel left is 'shared'
    texts = ["the shared one", "the shared two", "the other thing"]
    docs = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                         "text": texts})
    got = (tfidf_cosine_pairs(rd.from_pandas(docs), threshold=0.01,
                              max_df=2).to_pandas())
    pairs = set(zip(got["id_from"], got["id_to"]))
    assert pairs == {(0, 1)}


def test_top_terms_per_doc_scores_and_ties(ray_session):
    import math
    from capelinker_ray.stages.search import top_terms_per_doc
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["cat cat dog", "dog fish", ""]})
    out = (top_terms_per_doc(rd.from_pandas(df).repartition(2), k=2)
           .to_pandas().sort_values(["doc_id", "rank"])
           .reset_index(drop=True))
    # df: cat=1, dog=2, fish=1; n_docs=3
    idf_cat = math.log(3 / 1)
    idf_dog = math.log(3 / 2)
    d1 = out[out["doc_id"] == 1]
    assert list(d1["token"]) == ["cat", "dog"]
    assert abs(d1.iloc[0]["score"] - round(2 * idf_cat, 9)) < 1e-9
    assert abs(d1.iloc[1]["score"] - round(1 * idf_dog, 9)) < 1e-9
    d2 = out[out["doc_id"] == 2]
    assert list(d2["token"]) == ["fish", "dog"]   # idf(fish) > idf(dog)
    assert 3 not in set(out["doc_id"])            # empty doc emits nothing


def test_top_terms_min_df_excludes_rare(ray_session):
    from capelinker_ray.stages.search import top_terms_per_doc
    df = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["rare shared", "shared"]})
    out = top_terms_per_doc(rd.from_pandas(df), k=5,
                            min_df=2).to_pandas()
    assert set(out["token"]) == {"shared"}
