"""Row-set operations vs pandas ground truth (stages/setops.py)."""

import pandas as pd
import ray.data as rd

from capelinker_ray.stages.setops import (distinct_rows, except_distinct,
                                          intersect_distinct,
                                          union_distinct)


def _a():
    return pd.DataFrame({"x": ["p", "p", "q", "q", "r"],
                         "y": [1, 1, 2, 3, 4]})


def _b():
    return pd.DataFrame({"x": ["q", "r", "s"], "y": [2, 9, 9]})


def _sorted(df):
    return (df.sort_values(list(df.columns)).reset_index(drop=True))


def test_distinct_rows(ray_session):
    out = distinct_rows(rd.from_pandas(_a()).repartition(3)).to_pandas()
    exp = _a().drop_duplicates()
    pd.testing.assert_frame_equal(_sorted(out), _sorted(exp),
                                  check_dtype=False)


def test_intersect_and_except(ray_session):
    a, b = rd.from_pandas(_a()), rd.from_pandas(_b())
    inter = intersect_distinct(a, b).to_pandas()
    assert _sorted(inter).values.tolist() == [["q", 2]]
    exc = except_distinct(a, b).to_pandas()
    assert _sorted(exc).values.tolist() == [["p", 1], ["q", 3], ["r", 4]]


def test_union_distinct(ray_session):
    out = union_distinct(rd.from_pandas(_a()),
                         rd.from_pandas(_b())).to_pandas()
    exp = pd.concat([_a(), _b()]).drop_duplicates()
    pd.testing.assert_frame_equal(_sorted(out), _sorted(exp),
                                  check_dtype=False)


def test_except_null_caveat(ray_session):
    """Documented divergence from SQL: a null-bearing row never matches,
    so EXCEPT retains it even when b holds the identical null tuple."""
    a = pd.DataFrame({"x": pd.Series([None, "p"], dtype=object),
                      "y": [1, 1]})
    b = pd.DataFrame({"x": pd.Series([None, "p"], dtype=object),
                      "y": [1, 1]})
    out = except_distinct(rd.from_pandas(a), rd.from_pandas(b)).to_pandas()
    assert out["x"].isna().all() and len(out) == 1
