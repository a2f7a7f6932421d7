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
