"""Reference pretrained-model import (models/import_r.py): all 6 bundled
models (4 xgboost UBJSON boosters + 2 randomForest classifiers) convert to
engine artifacts and carry real signal."""

import os

import numpy as np
import pytest

from capelinker_ray.models.trees import predict_ensemble

_RDA = "/root/reference/data/pretrained_models.rda"

pytestmark = pytest.mark.skipif(not os.path.exists(_RDA),
                                reason="reference models not available")


@pytest.fixture(scope="module")
def artifacts():
    from capelinker_ray.models.import_r import import_reference_models
    return import_reference_models(_RDA, register=False)


def test_all_six_models_import(artifacts):
    # tree counts pin the recorded nrounds (BASELINE.md: 500-1000)
    expected = {
        "m_boost_stel_rein": ("gbt", 500),
        "m_boost_stel_rein_sparse": ("gbt", 1000),
        "m_rf_baptisms_sparse": ("rf", 500),
        "m_rf_baptisms_full": ("rf", 500),
        "m_boost_saf": ("gbt", 1000),
        "m_boost_saf2opg": ("gbt", 500),
    }
    assert set(artifacts) == set(expected)
    for name, (typ, ntrees) in expected.items():
        a = artifacts[name]
        assert a["type"] == typ, name
        assert len(a["trees"]) == ntrees, name
        assert len(a["feature_names"]) > 0


def test_boost_signal(artifacts):
    """The imported booster separates a perfect-match feature row from a
    garbage row by orders of magnitude — the trees carry real weights."""
    a = artifacts["m_boost_stel_rein_sparse"]
    fn = a["feature_names"]
    good = {"(Intercept)": 1.0, "mlastdist": 0.0, "mfirstdist": 0.0,
            "minitialsdist_osa": 0.0, "wlastdist": 0.0, "wfirstdist": 0.0,
            "winitialsdist_osa": 0.0, "settlerchildrengauss": 1.0,
            "nextmfirst": 0.0, "mfirst_uniqueness_to": 0.5,
            "mfirst_uniqueness_from": 0.5, "matches": 1.0,
            "husb_wife_surnamedist": 0.5, "region1": 1.0}
    bad = dict(good, mlastdist=0.5, mfirstdist=0.6, wlastdist=0.7,
               wfirstdist=0.8, minitialsdist_osa=0.9,
               winitialsdist_osa=0.9, matches=40.0)
    X = np.array([[good[f] for f in fn], [bad[f] for f in fn]])
    p = predict_ensemble(a, X)
    assert p[0] > 0.9 and p[1] < 0.05
    # NaN features route down the learned default direction, stay in (0,1)
    Xn = X.copy()
    Xn[0, 1:4] = np.nan
    pn = predict_ensemble(a, Xn)
    assert 0.0 < pn[0] < 1.0


def test_rf_votes(artifacts):
    a = artifacts["m_rf_baptisms_sparse"]
    assert a["feature_names"] == ["mlastdist", "mfirstdist", "wfirstdist",
                                  "yeardist"]
    X = np.array([[0.0, 0.0, 0.0, 0.0], [0.6, 0.7, 0.8, 10.0]])
    p = predict_ensemble(a, X)
    assert p[0] > 0.9 and p[1] < 0.1
    assert ((p >= 0) & (p <= 1)).all()


def test_registry_fallback(artifacts):
    """resolve_artifact() auto-imports bundled reference models by name."""
    from capelinker_ray.models.registry import resolve_artifact
    a = resolve_artifact("m_rf_baptisms_full")
    assert a["type"] == "rf" and len(a["trees"]) == 500


# Golden exact-value pins: 24 deterministic feature rows per model (seeded
# uniforms, NaN injection on rows 20-23 exercising the learned default
# directions), predictions frozen at import-decoder parity. A regression in
# the UBJSON booster decoder or the randomForest converter moves these.
_GOLDEN = {
    "m_boost_saf": [
        1.93e-06, 4e-05, 1.45e-06, 0.00136144, 0.00048302, 0.00026374,
        1.87e-06, 2.64e-05, 1.9e-07, 0.00028087, 3.4e-07, 2.03e-06,
        5.041e-05, 7.7e-07, 1.608e-05, 3.82e-06, 1.48e-06, 1.07e-06,
        6e-07, 0.00033884, 9.08e-06, 1.831e-05, 1.8e-07, 1.25e-06],
    "m_boost_saf2opg": [
        0.00299478, 7e-06, 1.478e-05, 2.6e-06, 4e-06, 0.00028962,
        4.24e-06, 8.3e-07, 3.79e-06, 3e-07, 0.00010396, 6.339e-05,
        2.2e-07, 3.985e-05, 0.00034253, 1.4e-07, 1.101e-05, 0.01684905,
        1.592e-05, 1.45e-06, 0.00086247, 0.00016207, 3e-08, 1.7e-07],
    "m_boost_stel_rein": [
        0.00871723, 0.00050619, 0.03859303, 0.00029552, 0.06190299,
        4.402e-05, 0.01094576, 0.0016894, 3.685e-05, 0.00201722,
        0.00022244, 0.0049345, 0.00074579, 0.0025711, 0.01592979,
        8.355e-05, 0.00203089, 1.365e-05, 0.90471746, 4.821e-05,
        1.835e-05, 0.20565727, 2.785e-05, 0.00017852],
    "m_boost_stel_rein_sparse": [
        0.00224825, 5.784e-05, 0.00060359, 0.00025995, 0.00022094,
        2.153e-05, 8.668e-05, 5.361e-05, 0.00231306, 5.5e-06,
        0.05069887, 0.00264108, 0.00014048, 9.84e-06, 0.00247394,
        0.00010146, 2.989e-05, 0.00047013, 0.00646042, 3.525e-05,
        1.2e-06, 0.00082851, 1.49e-06, 0.00324591],
    "m_rf_baptisms_full": [
        0.01, 0.008, 0.098, 0.166, 0.152, 0.316, 0.254, 0.306, 0.16,
        0.224, 0.07, 0.258, 0.01, 0.12, 0.022, 0.2, 0.054, 0.108, 0.19,
        0.15, 0.276, 0.296, 0.132, 0.204],
    "m_rf_baptisms_sparse": [
        0.0, 0.0, 0.002, 0.008, 0.0, 0.0, 0.0, 0.002, 0.0, 0.002, 0.006,
        0.0, 0.084, 0.0, 0.0, 0.0, 0.0, 0.118, 0.084, 0.046, 0.294, 0.0,
        0.0, 0.004],
}


def _golden_X(fn, seed):
    rng = np.random.default_rng(seed)
    n = 24
    X = rng.uniform(0, 1, size=(n, len(fn)))
    for j, f in enumerate(fn):
        if f == "(Intercept)":
            X[:, j] = 1.0
        elif f == "matches":
            X[:, j] = rng.integers(1, 40, size=n).astype(float)
    X[20:, ::3] = np.nan
    if fn and fn[0] == "(Intercept)":
        X[:, 0] = 1.0
    return X


def test_golden_prediction_pins(artifacts):
    for name, exp in _GOLDEN.items():
        a = artifacts[name]
        X = _golden_X(a["feature_names"],
                      seed=sum(ord(c) for c in name))
        p = predict_ensemble(a, X)
        np.testing.assert_allclose(p, np.array(exp), rtol=0, atol=5.1e-9,
                                   err_msg=name)
