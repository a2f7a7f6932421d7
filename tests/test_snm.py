"""Sorted-neighborhood blocking: exactly-once window pairs vs brute
force, null-key exclusion, partition invariance, window edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from capelinker_ray.stages.blocking import snm_candidates


def _brute(df: pd.DataFrame, w: int) -> set:
    v = (df.dropna(subset=["key"]).sort_values(["key", "id"])
         .reset_index(drop=True))
    out = set()
    for j in range(len(v)):
        for i in range(max(0, j - w + 1), j):
            out.add((v["id"][i], v["id"][j], j - i))
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "id": [f"r{i:04d}" for i in range(n)],
        "key": ["".join(rng.choice(list("abcde"), 6)) for _ in range(n)],
    })
    df.loc[rng.choice(n, 10, replace=False), "key"] = None
    return df


@pytest.mark.parametrize("w", [2, 5, 9])
def test_snm_matches_brute_force(corpus, w):
    out = snm_candidates(rd.from_pandas(corpus).repartition(7),
                         key_col="key", id_col="id", window=w).to_pandas()
    got = set(zip(out["id_from"], out["id_to"], out["rank_dist"]))
    assert got == _brute(corpus, w)
    assert len(out) == len(out.drop_duplicates())


def test_snm_partition_invariance(corpus):
    a = snm_candidates(rd.from_pandas(corpus).repartition(2),
                       key_col="key", id_col="id", window=6).to_pandas()
    b = snm_candidates(rd.from_pandas(corpus).repartition(23),
                       key_col="key", id_col="id", window=6).to_pandas()
    key = ["id_from", "id_to", "rank_dist"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True)[key],
        b.sort_values(key, ignore_index=True)[key])


def test_snm_keys_and_window_guard(corpus):
    out = snm_candidates(rd.from_pandas(corpus), key_col="key",
                         id_col="id", window=3).to_pandas()
    # key columns ride along and pairs respect the sort order
    assert (out["key_from"] <= out["key_to"]).all()
    assert out["rank_dist"].between(1, 2).all()
    with pytest.raises(ValueError):
        snm_candidates(rd.from_pandas(corpus), key_col="key", id_col="id",
                       window=1)
