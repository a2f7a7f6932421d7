"""Deterministic sampling: per-key caps, reproducibility, hash parity."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.sampling import (
    bernoulli_sample, bernoulli_threshold, sample_hash, stratified_sample,
)


def _docs(n=500, keys=5, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.integers(0, keys, n).astype(str),
    })


def test_stratified_caps_every_key(ray_session):
    df = _docs()
    out = stratified_sample(rd.from_pandas(df), "source", "doc_id",
                            10, seed=7).to_pandas()
    sizes = out.groupby("source").size()
    assert (sizes <= 10).all()
    # every key with >= 10 rows is fully capped, smaller keys kept whole
    orig = df.groupby("source").size()
    for k, n in orig.items():
        assert sizes.get(k, 0) == min(n, 10)


def test_stratified_deterministic_and_seed_sensitive(ray_session):
    df = _docs()
    a = stratified_sample(rd.from_pandas(df), "source", "doc_id",
                          5, seed=7).to_pandas()
    b = stratified_sample(rd.from_pandas(df), "source", "doc_id",
                          5, seed=7).to_pandas()
    c = stratified_sample(rd.from_pandas(df), "source", "doc_id",
                          5, seed=8).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])
    assert set(a["doc_id"]) != set(c["doc_id"])


def test_stratified_matches_pandas_reference(ray_session):
    df = _docs(200, keys=4)
    out = stratified_sample(rd.from_pandas(df), "source", "doc_id",
                            7, seed=1).to_pandas()
    h = sample_hash(df["doc_id"].to_numpy(np.int64), 1)
    ref = (df.assign(_h=h).sort_values(["_h", "doc_id"])
           .groupby("source").head(7))
    assert set(out["doc_id"]) == set(ref["doc_id"])


def test_stratified_pre_salt_identical_to_unsalted(ray_session):
    df = _docs(600, keys=3, seed=11)
    a = stratified_sample(rd.from_pandas(df), "source", "doc_id",
                          12, seed=5).to_pandas()
    b = stratified_sample(rd.from_pandas(df), "source", "doc_id",
                          12, seed=5, pre_salt=8).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])


def test_bernoulli_fraction_and_determinism(ray_session):
    df = _docs(4000)
    out = bernoulli_sample(rd.from_pandas(df), "doc_id", 0.25,
                           seed=11).to_pandas()
    frac = len(out) / len(df)
    assert 0.20 < frac < 0.30
    again = bernoulli_sample(rd.from_pandas(df), "doc_id", 0.25,
                             seed=11).to_pandas()
    assert set(out["doc_id"]) == set(again["doc_id"])
    # p=1 keeps everything, p=0 keeps nothing
    assert bernoulli_sample(rd.from_pandas(df), "doc_id", 1.0).count() \
        == len(df)
    assert bernoulli_sample(rd.from_pandas(df), "doc_id", 0.0).count() == 0


def test_top_k_per_group_matches_pandas(ray_session):
    from capelinker_ray.stages.sampling import top_k_per_group
    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "lang": rng.choice(["en", "nl", "af"], 300),
        "v": rng.integers(0, 50, 300).astype(np.int64),  # many ties
    })
    out = top_k_per_group(rd.from_pandas(df), "lang", "v", "doc_id",
                          7).to_pandas()
    ref = (df.sort_values(["v", "doc_id"], ascending=[False, True])
           .groupby("lang").head(7))
    assert set(map(tuple, out[["doc_id", "lang"]].to_numpy())) == \
        set(map(tuple, ref[["doc_id", "lang"]].to_numpy()))
    # ascending variant
    out2 = top_k_per_group(rd.from_pandas(df), "lang", "v", "doc_id",
                           3, ascending=True).to_pandas()
    ref2 = (df.sort_values(["v", "doc_id"]).groupby("lang").head(3))
    assert set(out2["doc_id"]) == set(ref2["doc_id"])


def test_threshold_exactness():
    assert bernoulli_threshold(0.25) == 1 << 62
    assert bernoulli_threshold(1.0) == 1 << 64
    assert bernoulli_threshold(0.0) == 0


def test_weighted_sample_matches_local_reference(ray_session):
    from capelinker_ray.stages.sampling import (sample_hash,
                                                weighted_sample_topk)
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "w": rng.integers(1, 500, 1000).astype(np.int64)})
    out = (weighted_sample_topk(rd.from_pandas(df).repartition(7),
                                "id", "w", k=50, seed=13)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # local Efraimidis-Spirakis reference
    h = sample_hash(df["id"].to_numpy(np.int64), 13)
    u = (h.astype(np.float64) + 1.0) / np.float64(2.0 ** 64)
    es = np.log(u) / df["w"].to_numpy(np.float64)
    order = np.lexsort((df["id"].to_numpy(), -es))
    exp = df.iloc[order[:50]].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["id", "w"]], exp, check_dtype=False)


def test_weighted_sample_drops_nonpositive_and_is_weight_biased(ray_session):
    from capelinker_ray.stages.sampling import weighted_sample_topk
    n = 2000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) % 2 == 0, 100.0, 1.0)})
    df.loc[:9, "w"] = 0.0            # never selectable
    out = weighted_sample_topk(rd.from_pandas(df), "id", "w",
                               k=200, seed=1).to_pandas()
    assert len(out) == 200
    assert not set(out["id"]) & set(range(0, 10, 2))  # w=0 excluded
    heavy = (out["w"] == 100.0).sum()
    assert heavy > 160                # ~99% expected; loose statistical bar


def test_grouped_split_leakage_safe_and_deterministic(ray_session):
    from capelinker_ray.stages.sampling import grouped_split
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k": rng.integers(0, 300, 3000).astype(np.int64),
                       "v": np.arange(3000)})
    out = (grouped_split(rd.from_pandas(df).repartition(6), "k", 0.25,
                         seed=5).to_pandas())
    # every key entirely in one split (no leakage)
    assert (out.groupby("k")["split"].nunique() == 1).all()
    # roughly a quarter of KEYS on the test side
    key_split = out.drop_duplicates("k")
    frac = (key_split["split"] == "test").mean()
    assert 0.15 < frac < 0.35
    # deterministic across runs / partitionings
    out2 = grouped_split(rd.from_pandas(df), "k", 0.25, seed=5).to_pandas()
    m = out.sort_values("v").reset_index(drop=True)
    m2 = out2.sort_values("v").reset_index(drop=True)
    assert (m["split"] == m2["split"]).all()


def test_mixture_sample_rates_and_determinism(ray_session):
    from capelinker_ray.stages.sampling import mixture_sample
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "src": np.repeat(["a", "b", "c", "d"], n // 4)})
    ds = rd.from_pandas(df).repartition(5)
    out = mixture_sample(ds, "id", "src",
                         rates={"a": 0.0, "b": 0.5, "c": 1.0},
                         default_rate=0.25, seed=3).to_pandas()
    by = out.groupby("src").size().to_dict()
    assert "a" not in by                      # rate 0 drops everything
    assert by["c"] == n // 4                  # rate 1 keeps everything
    assert abs(by["b"] / (n // 4) - 0.5) < 0.08
    assert abs(by.get("d", 0) / (n // 4) - 0.25) < 0.08
    # deterministic: same (corpus, seed) -> identical keep set
    out2 = mixture_sample(ds, "id", "src",
                          rates={"a": 0.0, "b": 0.5, "c": 1.0},
                          default_rate=0.25, seed=3).to_pandas()
    assert sorted(out["id"]) == sorted(out2["id"])
    # consistency with bernoulli_sample at the same seed: a doc kept at
    # rate p is kept at any higher rate (nested samples)
    out_hi = mixture_sample(ds, "id", "src", rates={"b": 0.8},
                            default_rate=1.0, seed=3).to_pandas()
    b_lo = set(out[out["src"] == "b"]["id"])
    b_hi = set(out_hi[out_hi["src"] == "b"]["id"])
    assert b_lo <= b_hi


def test_grouped_weighted_sample_caps_and_brute_force_parity(ray_session):
    from capelinker_ray.stages.sampling import (grouped_weighted_sample,
                                                sample_hash)
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.integers(0, 4, n).astype(str),
        "w": rng.integers(0, 50, n).astype(np.float64)})
    out = grouped_weighted_sample(
        rd.from_pandas(df).repartition(7), "g", "id", "w",
        k=15, seed=5).to_pandas()
    # brute-force E-S per group on the driver
    pos = df[df["w"] > 0].copy()
    h = sample_hash(pos["id"].to_numpy(np.int64), 5)
    u = (h.astype(np.float64) + 1.0) / np.float64(2.0 ** 64)
    pos["es"] = np.log(u) / pos["w"].to_numpy()
    want = (pos.sort_values(["es", "id"], ascending=[False, True])
            .groupby("g").head(15))
    assert sorted(out["id"]) == sorted(want["id"])
    assert "_es" not in out.columns
    # zero/null weights never selected
    assert not set(out["id"]) & set(df[df["w"] <= 0]["id"])


def test_grouped_weighted_sample_partition_invariant(ray_session):
    from capelinker_ray.stages.sampling import grouped_weighted_sample
    df = pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "g": (np.arange(200) % 3).astype(str),
        "w": (np.arange(200) % 9 + 1).astype(np.float64)})
    a = grouped_weighted_sample(rd.from_pandas(df), "g", "id", "w",
                                k=8, seed=2).to_pandas()
    b = grouped_weighted_sample(rd.from_pandas(df).repartition(13),
                                "g", "id", "w", k=8, seed=2).to_pandas()
    assert sorted(a["id"]) == sorted(b["id"])
