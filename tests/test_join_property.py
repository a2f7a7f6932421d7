"""Property test: broadcast_join ≡ pandas merge on randomized frames.

Exercises the per-worker indexed fast path (unique right keys), the
duplicate-key merge fallback, null keys on both sides, int/float/object
value columns, and empty right sides — the edge space of the round-3
broadcast-join rewrite (stages/join.py)."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from capelinker_ray.stages.join import broadcast_join


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        # unify missing markers / int-vs-float representation for compare
        out[c] = out[c].astype(object).where(out[c].notna(), None)
        out[c] = out[c].map(
            lambda v: float(v) if isinstance(v, (int, np.integer,
                                                 float, np.floating))
            else v)
    return (out.sort_values(list(out.columns))
            .reset_index(drop=True)[sorted(out.columns)])


@st.composite
def frames(draw):
    keys = draw(st.lists(
        st.one_of(st.sampled_from(["a", "b", "c", "d", "e"]), st.none()),
        min_size=0, max_size=25))
    left = pd.DataFrame({
        "k": pd.Series(keys, dtype=object),
        "lv": np.arange(len(keys), dtype=np.int64),
    })
    rkeys = draw(st.lists(
        st.sampled_from(["a", "b", "c", "x", "y"]),
        min_size=0, max_size=8))
    unique_right = draw(st.booleans())
    if unique_right:
        rkeys = sorted(set(rkeys))
    right = pd.DataFrame({
        "k": pd.Series(rkeys, dtype=object),
        "rv_int": np.arange(len(rkeys), dtype=np.int64),
        "rv_obj": [f"v{i}" for i in range(len(rkeys))],
    })
    how = draw(st.sampled_from(["left", "inner"]))
    return left, right, how


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(frames())
def test_broadcast_join_matches_pandas_merge(ray_session, case):
    left, right, how = case
    assume(len(left) > 0)  # Ray can't build a 0-row from_pandas dataset
    ds = broadcast_join(rd.from_pandas(left), right, on="k", how=how)
    exp = left.merge(right, on="k", how=how)
    if len(exp) == 0:
        # ray 2.49 to_pandas() drops columns on 0-row datasets; the typed
        # schema is still correct on the dataset itself
        assert ds.count() == 0
        assert set(ds.schema().names) == set(exp.columns)
        return
    pd.testing.assert_frame_equal(_norm(ds.to_pandas()), _norm(exp),
                                  check_dtype=False)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(frames())
def test_hash_join_semi_anti_matches_pandas(ray_session, case):
    from capelinker_ray.stages.join import hash_join
    left, right, _ = case
    assume(len(left) > 0 and len(right) > 0)
    rset = set(right["k"].dropna())
    for how in ("semi", "anti"):
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", how=how).to_pandas()
        if how == "semi":
            exp = left[left["k"].isin(rset)]
        else:  # NOT EXISTS keeps null-keyed left rows
            exp = left[~left["k"].isin(rset) | left["k"].isna()]
        if len(exp) == 0:
            # Ray's to_pandas drops columns on 0 rows (schema() keeps them)
            assert len(out) == 0, how
        else:
            assert sorted(out["lv"]) == sorted(exp["lv"]), how
