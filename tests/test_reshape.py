"""Reshape fundamentals: explode, regex rows, global top-k."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.reshape import (explode, global_topk,
                                           regex_extract_rows)


def test_explode_positions_and_empty_drop(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3],
                       "xs": [[10, 20], [], [30]]})
    out = (explode(rd.from_pandas(df), "xs", pos_col="pos")
           .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True))
    assert out["id"].tolist() == [1, 1, 3]
    assert out["xs"].tolist() == [10, 20, 30]
    assert out["pos"].tolist() == [0, 1, 0]


def test_explode_keep_empty(ray_session):
    df = pd.DataFrame({"id": [1, 2], "xs": [[7], []]})
    out = (explode(rd.from_pandas(df), "xs", keep_empty=True,
                   pos_col="pos")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert len(out) == 2
    assert out.loc[1, "pos"] == -1 and pd.isna(out.loc[1, "xs"])


def test_regex_extract_rows_match_order(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3],
                       "s": ["ab12cd345", "nope", None]})
    out = (regex_extract_rows(rd.from_pandas(df).repartition(2), "s",
                              r"\d+")
           .to_pandas().sort_values(["id", "match_idx"])
           .reset_index(drop=True))
    assert out["id"].tolist() == [1, 1]
    assert out["match"].tolist() == ["12", "345"]
    assert out["match_idx"].tolist() == [0, 1]


def test_global_topk_across_batches(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "v": rng.permutation(1000).astype(np.float64)})
    out = (global_topk(rd.from_pandas(df).repartition(8), ["v", "id"], 5,
                       ascending=[False, True]).to_pandas())
    want = df.sort_values(["v", "id"], ascending=[False, True]).head(5)
    assert out["id"].tolist() == want["id"].tolist()
    asc = global_topk(rd.from_pandas(df).repartition(8), "v", 3,
                      ascending=True).to_pandas()
    assert asc["v"].tolist() == [0.0, 1.0, 2.0]
