"""Clustering oracles: connected components fixpoint, singleton attach,
expand_index single-round parity (util.R:14-44 semantics)."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.cluster import (
    attach_entity_ids, connected_components, expand_index,
)


def test_cc_chain_and_components(ray_session):
    links = rd.from_items([
        {"conv_id_from": "a", "conv_id_to": "b"},
        {"conv_id_from": "b", "conv_id_to": "c"},
        {"conv_id_from": "d", "conv_id_to": "e"},
        {"conv_id_from": "x", "conv_id_to": "y"},
        {"conv_id_from": "y", "conv_id_to": "z"},
        {"conv_id_from": "z", "conv_id_to": "a"},   # merges x,y,z into a's
    ])
    cc = {r["node"]: r["entity_id"]
          for r in connected_components(links).take_all()}
    assert cc == {"a": "a", "b": "a", "c": "a", "x": "a", "y": "a",
                  "z": "a", "d": "d", "e": "d"}


def test_cc_long_path_converges(ray_session):
    # an 8-node path: worst case for hash-min iterations; forces the
    # DISTRIBUTED strategy (pointer doubling -> O(log n) rounds)
    nodes = [f"n{i:02d}" for i in range(8)]
    links = rd.from_items([{"conv_id_from": nodes[i], "conv_id_to": nodes[i + 1]}
                           for i in range(7)])
    cc = {r["node"]: r["entity_id"]
          for r in connected_components(links,
                                        strategy="distributed").take_all()}
    assert set(cc.values()) == {"n00"}
    assert len(cc) == 8


def test_attach_entity_singletons(ray_session):
    links = rd.from_items([{"conv_id_from": "a", "conv_id_to": "b"}])
    cc = connected_components(links)
    recs = rd.from_items([{"conv_id": c, "v": 1} for c in ["a", "b", "q"]])
    out = {r["conv_id"]: r["entity_id"]
           for r in attach_entity_ids(recs, cc).take_all()}
    assert out == {"a": "a", "b": "a", "q": "q"}  # unlinked -> own id


def test_expand_index_semantics():
    df = pd.DataFrame({
        "index":           [1, None, None, 2, None, 3, 4, None],
        "index_candidate": [10, 10,  11,   12, 12,  13, 13, None],
    })
    out = expand_index(df)["index"].tolist()
    # group 10: bridge -> fill with 1;   group 11: all-NA -> adopt 11
    # group 12: bridge -> fill with 2;   group 13: conflict (3,4) -> untouched
    # NA candidate row -> untouched
    assert out[:7] == [1, 1, 11, 2, 2, 3, 4]
    assert np.isnan(out[7])


def test_expand_index_all_indexed_noop():
    df = pd.DataFrame({"index": [5, 6], "index_candidate": [9, 9]})
    assert expand_index(df)["index"].tolist() == [5, 6]
