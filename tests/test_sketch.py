"""Mergeable sketches (stages/sketch.py): HLL distinct + histogram
quantiles against exact answers."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.sketch import approx_distinct, approx_quantiles


def test_hll_accuracy_ints(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 60_000, size=200_000)
    exact = len(np.unique(vals))
    df = pd.DataFrame({"v": vals})
    est = approx_distinct(rd.from_pandas(df), "v")
    assert abs(est - exact) / exact < 0.03, (est, exact)


def test_hll_strings_and_small_range(ray_session):
    df = pd.DataFrame({"s": [f"user_{i % 137}" for i in range(5000)]})
    est = approx_distinct(rd.from_pandas(df), "s")
    assert abs(est - 137) <= 3, est     # linear-counting regime ~exact


def test_histogram_quantiles(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.normal(100.0, 15.0, size=100_000)
    df = pd.DataFrame({"v": vals})
    out = approx_quantiles(rd.from_pandas(df), "v",
                           qs=(0.1, 0.5, 0.9), bins=4096)
    exact = np.quantile(vals, [0.1, 0.5, 0.9])
    width = (vals.max() - vals.min()) / 4096
    for got, ex in zip(out["value"], exact):
        assert abs(got - ex) <= max(2 * width, 1e-9), (got, ex)


def test_quantiles_constant_column(ray_session):
    df = pd.DataFrame({"v": np.full(1000, 5.0)})
    out = approx_quantiles(rd.from_pandas(df), "v", qs=(0.25, 0.5, 0.75))
    assert (out["value"] == 5.0).all()


def test_quantiles_empty_and_all_null(ray_session):
    """Empty / all-null columns return a NaN frame, not TypeError."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from capelinker_ray.stages.sketch import approx_quantiles

    allnull = rd.from_pandas(pd.DataFrame(
        {"v": pd.Series([None, None], dtype="float64")}))
    out = approx_quantiles(allnull, "v")
    assert list(out["q"]) == [0.25, 0.5, 0.75]
    assert out["value"].isna().all()


def _exact_token_hh(texts, phi):
    import math
    toks = [t for s in texts for t in (s or "").split(" ") if t != ""]
    vc = pd.Series(toks).value_counts()
    thr = math.ceil(phi * len(toks))
    return {k: int(v) for k, v in vc.items() if v >= thr}


def test_heavy_hitters_exact_vs_pandas(ray_session):
    """Output is VALUE-EXACT (recount pass) on a Zipf-ish token corpus."""
    from capelinker_ray.stages.sketch import heavy_hitters
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(400)]
    p = 1.0 / np.arange(1, 401); p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=p)) for _ in range(800)]
    phi = 0.004
    out = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"text": texts})).repartition(8),
        "text", phi=phi, tokenize=True).to_pandas()
    got = dict(zip(out["token"], out["n"].astype(int)))
    assert got == _exact_token_hh(texts, phi)


def test_heavy_hitters_tiny_sketch_still_exact(ray_session):
    """A sketch far smaller than the default must still be exact as long
    as B >= 4/phi holds — force the MG reduction path with many distinct
    rare tokens per batch."""
    import math
    from capelinker_ray.stages.sketch import heavy_hitters
    rng = np.random.default_rng(9)
    texts = []
    for i in range(600):
        rare = [f"rare_{i}_{j}" for j in range(20)]        # unique per doc
        hot = ["hot_a"] * 4 + ["hot_b"] * 2
        row = rare + hot
        rng.shuffle(row)
        texts.append(" ".join(row))
    phi = 0.004                                            # thr ~ 63
    B = int(math.ceil(4.0 / phi))                          # minimal legal B
    out = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"text": texts})).repartition(6),
        "text", phi=phi, tokenize=True, sketch_size=B).to_pandas()
    got = dict(zip(out["token"], out["n"].astype(int)))
    assert got == {"hot_a": 2400, "hot_b": 1200}


def test_heavy_hitters_column_mode_and_nulls(ray_session):
    from capelinker_ray.stages.sketch import heavy_hitters
    vals = ["x"] * 50 + ["y"] * 30 + ["z"] * 2 + [None] * 5 + [""] * 4
    out = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"v": vals})).repartition(3),
        "v", phi=0.3).to_pandas()       # thr = ceil(0.3*82) = 25
    got = dict(zip(out["token"], out["n"].astype(int)))
    assert got == {"x": 50, "y": 30}    # null/"" never counted


def test_approx_distinct_by_accuracy(ray_session):
    import ray.data as rd
    from capelinker_ray.stages.sketch import approx_distinct_by
    rng = np.random.default_rng(8)
    n = 30_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1]),
        "v": rng.integers(0, 5000, n),
    })
    out = (approx_distinct_by(rd.from_pandas(df).repartition(9), "k", "v")
           .to_pandas().set_index("k")["n_distinct"])
    exact = df.groupby("k")["v"].nunique()
    for k in ["a", "b", "c"]:
        rel = abs(out[k] - exact[k]) / exact[k]
        assert rel < 0.05, (k, out[k], exact[k])


def test_approx_distinct_by_matches_global_hll(ray_session):
    """One group must reproduce the global sketch's estimate exactly
    (same hash, same registers, same finalize)."""
    import ray.data as rd
    from capelinker_ray.stages.sketch import (approx_distinct,
                                              approx_distinct_by)
    df = pd.DataFrame({"k": ["x"] * 5000,
                       "v": np.arange(5000, dtype=np.int64) % 1234})
    ds = rd.from_pandas(df).repartition(4)
    grouped = (approx_distinct_by(ds, "k", "v", p=12)
               .to_pandas()["n_distinct"].iloc[0])
    global_est = approx_distinct(ds, "v", p=12)
    assert int(grouped) == int(global_est)


def test_count_min_overestimates_within_bound(ray_session):
    import math
    from capelinker_ray.stages.sketch import count_min, count_min_estimate
    rng = np.random.default_rng(8)
    # Zipf-ish skew: token i appears ~ 1/i
    toks = np.concatenate([np.full(2000 // (i + 1), f"t{i}")
                           for i in range(100)])
    rng.shuffle(toks)
    df = pd.DataFrame({"tok": toks})
    sk = count_min(rd.from_pandas(df).repartition(5), "tok",
                   width=1024, depth=4, seed=1)
    true = pd.Series(toks).value_counts()
    keys = list(true.index[:30])
    est = count_min_estimate(sk, keys)
    tr = true[keys].to_numpy()
    assert (est >= tr).all()                     # one-sided
    eps_bound = math.e / 1024 * len(toks)
    assert (est - tr <= eps_bound * 3).all()     # loose eps*N bound
    # total mass conserved per row
    assert (sk.table.sum(axis=1) == len(toks)).all()


def test_count_min_merge_is_addition(ray_session):
    from capelinker_ray.stages.sketch import CountMinSketch, count_min
    a = pd.DataFrame({"tok": ["x"] * 5 + ["y"] * 2})
    b = pd.DataFrame({"tok": ["x"] * 3 + ["z"] * 4})
    sa = count_min(rd.from_pandas(a), "tok", width=64, depth=3, seed=2)
    sb = count_min(rd.from_pandas(b), "tok", width=64, depth=3, seed=2)
    both = count_min(rd.from_pandas(pd.concat([a, b])), "tok",
                     width=64, depth=3, seed=2)
    assert (sa.table + sb.table == both.table).all()
