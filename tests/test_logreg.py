"""Distributed logistic regression (models/logreg.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.models.logreg import (LogRegModel, fit_logreg,
                                          predict_logreg)


def _synth(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    # wildly different feature scales: standardization must handle them
    x1 = rng.normal(0, 1, n) * 1000 + 5000
    x2 = rng.normal(0, 1, n) * 0.01
    logit = 2.0 * (x1 - 5000) / 1000 - 3.0 * x2 / 0.01 * 0.01 * 100
    y = (logit + rng.normal(0, 0.5, n) > 0).astype(np.int64)
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y})


def test_fit_logreg_learns_separable_data(ray_session):
    df = _synth()
    ds = rd.from_pandas(df).repartition(5)
    model = fit_logreg(ds, ["x1", "x2"], "y", epochs=40, lr=0.8)
    scored = predict_logreg(ds, model).to_pandas()
    acc = ((scored["prob"] > 0.5).astype(int) == scored["y"]).mean()
    assert acc >= 0.9, acc
    # the dominant direction is learned with the right signs
    assert model.weights[0] > 0 and model.weights[1] < 0


def test_fit_logreg_partition_invariance(ray_session):
    df = _synth(600, seed=9)
    m1 = fit_logreg(rd.from_pandas(df).repartition(2), ["x1", "x2"], "y",
                    epochs=10)
    m2 = fit_logreg(rd.from_pandas(df).repartition(7), ["x1", "x2"], "y",
                    epochs=10)
    # partials differ only in float addition order
    assert np.allclose(m1.weights, m2.weights, atol=1e-9)
    assert abs(m1.bias - m2.bias) < 1e-9


def test_predict_logreg_null_mean_imputation(ray_session):
    model = LogRegModel(["x"], np.array([1.0]), 0.0,
                        np.array([10.0]), np.array([2.0]))
    df = pd.DataFrame({"x": [10.0, np.nan]})
    out = predict_logreg(rd.from_pandas(df), model).to_pandas()
    # null imputes at the mean -> same prob as x == mean (= 0.5)
    assert np.allclose(out["prob"], [0.5, 0.5])
