"""Fellegi-Sunter EM recovers planted (m, u, p) from agreement patterns;
scoring is the exact log2 likelihood ratio; both are partition-invariant."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from capelinker_ray.models.fellegi_sunter import fs_em_weights, fs_score

M_TRUE = {"a1": 0.92, "a2": 0.75, "a3": 0.60}
U_TRUE = {"a1": 0.05, "a2": 0.25, "a3": 0.10}
P_TRUE = 0.2


def _planted(n=40_000, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    is_match = rng.random(n) < P_TRUE
    cols = {}
    for k in M_TRUE:
        p = np.where(is_match, M_TRUE[k], U_TRUE[k])
        cols[k] = (rng.random(n) < p).astype(np.int64)
    return pd.DataFrame(cols)


def test_em_recovers_planted_parameters():
    df = _planted()
    w = fs_em_weights(rd.from_pandas(df).repartition(9),
                      ["a1", "a2", "a3"])
    assert w["converged"]
    assert w["patterns"] <= 8
    assert abs(w["p"] - P_TRUE) < 0.05
    for k in M_TRUE:
        assert abs(w["m"][k] - M_TRUE[k]) < 0.06, (k, w["m"][k])
        assert abs(w["u"][k] - U_TRUE[k]) < 0.06, (k, w["u"][k])


def test_em_partition_invariant():
    df = _planted(n=8_000, seed=5)
    a = fs_em_weights(rd.from_pandas(df).repartition(2), ["a1", "a2", "a3"])
    b = fs_em_weights(rd.from_pandas(df).repartition(17),
                      ["a1", "a2", "a3"])
    # pattern counts are exact in both layouts -> EM trajectories identical
    assert a["m"] == pytest.approx(b["m"])
    assert a["u"] == pytest.approx(b["u"])
    assert a["p"] == pytest.approx(b["p"])


def test_score_is_log_likelihood_ratio():
    w = {"m": {"a1": 0.9, "a2": 0.6}, "u": {"a1": 0.1, "a2": 0.3}}
    df = pd.DataFrame({"a1": [1, 0, 1, 0], "a2": [1, 1, 0, 0],
                       "pid": [1, 2, 3, 4]})
    out = (fs_score(rd.from_pandas(df), w, ["a1", "a2"]).to_pandas()
           .sort_values("pid"))

    def expect(a1, a2):
        t = 0.0
        for a, (m, u) in zip((a1, a2), ((0.9, 0.1), (0.6, 0.3))):
            t += (a * np.log2(m / u)
                  + (1 - a) * np.log2((1 - m) / (1 - u)))
        return t

    want = [expect(1, 1), expect(0, 1), expect(1, 0), expect(0, 0)]
    np.testing.assert_allclose(out["fs_weight"].to_numpy(), want,
                               rtol=1e-12)
    # agreeing on everything must outscore disagreeing on everything
    assert out["fs_weight"].iloc[0] > out["fs_weight"].iloc[3]


def test_nulls_count_as_disagreement():
    w = {"m": {"a1": 0.9}, "u": {"a1": 0.1}}
    df = pd.DataFrame({"a1": pd.array([1, None], dtype="Int64")})
    out = fs_score(rd.from_pandas(df), w, ["a1"]).to_pandas()
    assert out["fs_weight"].iloc[0] > 0
    assert out["fs_weight"].iloc[1] == pytest.approx(
        np.log2(0.1 / 0.9), rel=1e-9)
