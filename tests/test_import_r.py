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
