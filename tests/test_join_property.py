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
