"""Distributed prefix scan (stages/scan.py) vs pandas cumsum ground truth."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.scan import pack_by_budget, running_total


def _df(n=1000, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": rng.permutation(n).astype(np.int64),   # UNSORTED input
        "n": rng.integers(0, 500, n).astype(np.int64),
    })


def test_running_total_matches_cumsum(ray_session):
    df = _df()
    out = (running_total(rd.from_pandas(df).repartition(7), "n", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = df.sort_values("id").reset_index(drop=True)
    assert (out["running_total"].to_numpy()
            == exp["n"].cumsum().to_numpy()).all()
    assert (out["id"].to_numpy() == exp["id"].to_numpy()).all()


def test_running_total_null_counts_contribute_zero(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "n": pd.array([10, None, 5, None],
                                     dtype="Int64")})
    out = (running_total(rd.from_pandas(df), "n", "id")
           .to_pandas().sort_values("id"))
    assert out["running_total"].tolist() == [10, 10, 15, 15]


def test_exact_quantiles_match_numpy_and_nulls(ray_session):
    import math

    from capelinker_ray.stages.scan import exact_quantiles
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 10_000, 777).astype(np.int64)
    df = pd.DataFrame({"v": pd.array(list(vals) + [None, None],
                                     dtype="Int64")})
    out = exact_quantiles(rd.from_pandas(df).repartition(6), "v",
                          qs=(0.25, 0.5, 0.75))
    s = np.sort(vals)
    for q, v in zip(out["q"], out["value"]):
        assert v == float(s[max(1, math.ceil(q * len(s))) - 1])
    # empty column -> NaN frame, no crash
    empty = pd.DataFrame({"v": pd.array([None], dtype="Int64")})
    out2 = exact_quantiles(rd.from_pandas(empty), "v")
    assert out2["value"].isna().all()


def test_pack_by_budget_contiguous_shards(ray_session):
    df = _df(500, seed=9)
    out = (pack_by_budget(rd.from_pandas(df).repartition(5), "n", 1000,
                          "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = df.sort_values("id").reset_index(drop=True)
    excl = exp["n"].cumsum() - exp["n"]
    assert (out["shard_id"].to_numpy() == (excl // 1000).to_numpy()).all()
    # shards are contiguous in id order and non-decreasing
    assert (np.diff(out["shard_id"].to_numpy()) >= 0).all()
    # every shard's exclusive start is under capacity of its boundary
    sizes = out.groupby("shard_id")["n"].sum()
    # all but possibly the last shard reach at least capacity incl. overshoot
    assert (sizes.iloc[:-1] + 500 - 1 >= 1000).all()


def test_grouped_quantiles_exact_per_group(ray_session):
    """quantile_disc rank rule within each group, incl. 1-row groups and
    nulls dropped."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from capelinker_ray.stages.scan import grouped_quantiles

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], size=500),
        "v": rng.integers(0, 1000, 500).astype(float)})
    df.loc[df.index[:20], "v"] = np.nan
    df = pd.concat([df, pd.DataFrame({"g": ["solo"], "v": [42.0]})],
                   ignore_index=True)
    out = (grouped_quantiles(rd.from_pandas(df).repartition(6), "g", "v",
                             qs=(0.25, 0.5, 0.75)).to_pandas())
    import math
    for (g, q), grp in out.groupby(["g", "q"]):
        vals = np.sort(df.loc[df["g"].eq(g) & df["v"].notna(), "v"]
                       .to_numpy())
        rank = max(1, math.ceil(q * len(vals)))
        assert grp["value"].iloc[0] == vals[rank - 1], (g, q)
    assert set(out.loc[out["g"] == "solo", "value"]) == {42.0}


def test_grouped_running_total_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from capelinker_ray.stages.scan import grouped_running_total

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=300),
        "o": rng.permutation(300),
        "v": rng.normal(5.0, 2.0, 300)})
    df.loc[df.index[:10], "v"] = np.nan          # nulls contribute 0
    out = (grouped_running_total(rd.from_pandas(df).repartition(5),
                                 "k", "v", order_by="o")
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    exp["rt"] = (exp["v"].fillna(0.0).groupby(exp["k"].to_numpy())
                 .cumsum())
    np.testing.assert_allclose(out["running_total"], exp["rt"], rtol=1e-12)
