"""json_scalar: vectorized fast path + json.loads fallback tail."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.jsoncol import json_scalar


def test_json_scalar_numeric_fast_path(ray_session):
    df = pd.DataFrame({"j": ['{"k": 87}', '{"k": -3.5}', '{"k": 2e3}',
                             '{"other": 1}', None, "not json"]})
    out = json_scalar(rd.from_pandas(df), "j", "k", "k").to_pandas()
    v = out["k"].tolist()
    assert v[0] == 87.0 and v[1] == -3.5 and v[2] == 2000.0
    assert all(np.isnan(x) for x in v[3:])


def test_json_scalar_string_and_fallback(ray_session):
    df = pd.DataFrame({"j": [
        '{"name": "alice"}',
        '{"name": "es\\"caped"}',       # escaped quote -> fallback path
        '{"name": {"nested": 1}}',      # non-scalar -> null
        '{"name": null}',
    ]})
    out = json_scalar(rd.from_pandas(df), "j", "name", "n",
                      kind="str").to_pandas()
    assert out["n"].tolist() == ["alice", 'es"caped', None, None]


def test_json_scalar_nested_top_level_semantics(ray_session):
    # JSON-path $.k semantics: nested payloads go through json.loads, so
    # the TOP-LEVEL field wins and a field buried in a sub-object is null
    # (matching DuckDB json_extract in the props_stats oracle).
    df = pd.DataFrame({"j": [
        '{"outer": {"k": 5}, "k": 9}',   # top-level 9, not inner 5
        '{"outer": {"k": 5}}',           # only nested -> null
        '{"k": 7}',                      # flat fast path unchanged
    ]})
    out = json_scalar(rd.from_pandas(df), "j", "k", "k").to_pandas()
    v = out["k"].tolist()
    assert v[0] == 9.0
    assert np.isnan(v[1])
    assert v[2] == 7.0
