"""End-to-end slice: synth corpus -> normalize -> conversation records."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from capelinker_ray.stages import build_conv_records, collect_tool_vocab, normalize_turns
from capelinker_ray.synth import gen_corpus


@pytest.fixture(scope="module")
def corpus(ray_session):
    turns, truth = gen_corpus(n_entities=60, seed=42)
    return turns, truth


def test_synth_schema_and_determinism(corpus):
    turns, truth = corpus
    assert turns.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    again, _ = gen_corpus(n_entities=60, seed=42)
    assert turns.equals(again)
    # every conversation has a truth entity
    assert set(pa.compute.unique(turns["conv_id"]).to_pylist()) == set(truth["conv_id"].to_pylist())


def test_normalize_preserves_text(corpus, ray_session):
    turns, _ = corpus
    ds = normalize_turns(rd.from_arrow(turns))
    out = ds.sort(["conv_id", "turn_idx"]).to_pandas()
    src = turns.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # per-turn text equality invariant under stable (conv_id, turn_idx) sort
    assert (out["text"].fillna("<NA>") == src["text"].fillna("<NA>")).all()
    norm = out["text_norm"].dropna()
    assert norm.str.contains(r"^[A-Z0-9 ]*$").all()
    assert not norm.str.contains(r"  ").any()


def test_conv_records(corpus, ray_session):
    turns, truth = corpus
    ds = normalize_turns(rd.from_arrow(turns))
    vocab = collect_tool_vocab(ds)
    recs = build_conv_records(ds, vocab).to_pandas()

    n_convs = len(set(turns["conv_id"].to_pylist()))
    assert len(recs) == n_convs
    assert recs["conv_id"].is_unique

    # spot-check one conversation against a pandas oracle
    tdf = turns.to_pandas()
    cid = recs["conv_id"].iloc[0]
    grp = tdf[tdf["conv_id"] == cid].sort_values("turn_idx")
    row = recs[recs["conv_id"] == cid].iloc[0]
    assert row["n_turns"] == len(grp)
    assert row["ts_min"] == grp["ts"].min()
    assert row["ts_max"] == grp["ts"].max()
    assert row["role_sig"] == f"{grp['role'].iloc[0]}>{grp['role'].iloc[1]}"
    assert row["block_key"].endswith("|" + row["role_sig"])
    assert len(row["first_text_prefix"]) <= 16

    # tool masks: mask bit count equals distinct tool count
    tools_by_conv = tdf.dropna(subset=["tool"]).groupby("conv_id")["tool"].nunique()
    got = recs.set_index("conv_id")["tool_mask"]
    for c, ntools in tools_by_conv.items():
        assert bin(int(got[c])).count("1") == ntools

    # duplicates of the same entity mostly share the block key (blocker recall)
    truth_df = truth.to_pandas()
    m = recs.merge(truth_df, on="conv_id")
    fams = m.groupby("entity_id")["block_key"].nunique()
    multi = m["entity_id"].value_counts()
    fams = fams[multi[multi > 1].index]
    assert (fams == 1).mean() > 0.7
