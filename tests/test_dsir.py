"""DSIR importance resampling (stages/dsir.py): weights prefer
target-like documents, determinism, partition invariance, Gumbel top-k
is a real sample (not a hard argmax of logw)."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.dsir import bucket_counts, dsir_sample, dsir_weights


def _corpora():
    # target: "science" flavored; raw: mixture of science-ish and spam-ish
    tgt = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "text": ["quantum physics experiment measures entangled photon "
                 "states in the laboratory detector array"] * 100})
    sci = ["the physics experiment observed photon detector noise in the "
           "quantum laboratory"] * 30
    spam = ["buy cheap pills now click here winner free offer casino "
            "jackpot prize"] * 30
    raw = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": sci + spam})
    return rd.from_pandas(raw), rd.from_pandas(tgt)


def test_weights_prefer_target_like_docs(ray_session):
    raw, tgt = _corpora()
    w = dsir_weights(raw, tgt, buckets=256).to_pandas()
    sci = w.loc[w["doc_id"] < 30, "logw"]
    spam = w.loc[w["doc_id"] >= 30, "logw"]
    assert sci.min() > spam.max()


def test_bucket_counts_partition_invariant(ray_session):
    raw, _ = _corpora()
    a = bucket_counts(raw.repartition(1), buckets=128)
    b = bucket_counts(raw.repartition(9), buckets=128)
    assert (a == b).all()
    # total token mass conserved (30 sci docs x 11 tokens + 30 spam x 12)
    assert a.sum() == 30 * 11 + 30 * 12


def test_sample_deterministic_and_biased(ray_session):
    raw, tgt = _corpora()
    s1 = dsir_sample(raw, tgt, k=20, buckets=256, seed=5).to_pandas()
    s2 = dsir_sample(raw, tgt, k=20, buckets=256, seed=5).to_pandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])
    assert len(s1) == 20
    # overwhelming log-weight gap -> selection should be all-science
    assert (s1["doc_id"] < 30).all()


def test_gumbel_noise_breaks_pure_ranking(ray_session):
    # uniform weights -> selection is driven by the seeded Gumbel keys,
    # and different seeds pick different subsets
    docs = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                         "text": ["alpha beta gamma"] * 200})
    ds = rd.from_pandas(docs)
    a = dsir_sample(ds, ds, k=30, buckets=64, seed=1).to_pandas()
    b = dsir_sample(ds, ds, k=30, buckets=64, seed=2).to_pandas()
    assert set(a["doc_id"]) != set(b["doc_id"])
    assert len(a) == len(b) == 30
