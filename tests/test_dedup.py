"""Dedup-suite oracles: exact, minhash+LSH, simhash, n-gram Jaccard,
embedding cosine."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.dedup import (
    embedding_dup_pairs, exact_dedup, minhash_lsh_dedup, ngram_jaccard_pairs,
    simhash_signatures,
)


def _docs():
    base = ("the quick brown fox jumps over the lazy dog and keeps running "
            "through the quiet green field toward the river")
    near = base.replace("quick", "qiuck").replace("river", "rivers")
    other = ("completely different text about distributed query engines "
             "processing large parquet datasets with streaming shuffles")
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [base, near, other, base, "short"],
    })


def test_exact_dedup(ray_session):
    out = exact_dedup(rd.from_pandas(_docs()), key_col="text",
                      id_col="doc_id").to_pandas()
    # 4 distinct texts; duplicate of doc 1/4 keeps min id 1
    assert len(out) == 4
    assert 1 in set(out["keep_doc_id"]) and 4 not in set(out["keep_doc_id"])


def test_minhash_lsh_finds_near_dups(ray_session):
    out = minhash_lsh_dedup(rd.from_pandas(_docs()),
                            jaccard_threshold=0.5).to_pandas()
    got = set(zip(out["id_from"], out["id_to"]))
    assert (1, 2) in got and (1, 4) in got and (2, 4) in got
    assert not any(3 in p or 5 in p for p in got)


def test_simhash_near_for_dups(ray_session):
    out = simhash_signatures(rd.from_pandas(_docs())).to_pandas()
    s = out.set_index("doc_id")["simhash"]
    ham = lambda a, b: bin(np.uint64(a) ^ np.uint64(b)).count("1")
    assert ham(s[1], s[4]) == 0          # identical text
    assert ham(s[1], s[2]) <= 12         # near-dup
    assert ham(s[1], s[3]) > 12          # unrelated


def test_ngram_jaccard_pairs(ray_session):
    out = ngram_jaccard_pairs(rd.from_pandas(_docs()), threshold=0.5).to_pandas()
    got = dict(((a, b), j) for a, b, j in
               zip(out["id_from"], out["id_to"], out["jaccard"]))
    assert got[(1, 4)] == 1.0
    assert 0.5 < got[(1, 2)] < 1.0
    assert (1, 3) not in got


def test_embedding_dup_pairs(ray_session):
    rng = np.random.default_rng(0)
    base = rng.normal(size=8)
    rows = [
        {"vec_id": 1, "embedding": base.tolist()},
        {"vec_id": 2, "embedding": (base + rng.normal(scale=0.01, size=8)).tolist()},
        {"vec_id": 3, "embedding": rng.normal(size=8).tolist()},
    ]
    out = embedding_dup_pairs(rd.from_items(rows), threshold=0.99,
                              exact_block=True).to_pandas()
    assert set(zip(out["id_from"], out["id_to"])) == {(1, 2)}
