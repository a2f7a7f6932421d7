"""Link-selection oracles: R rank average-tie parity (pred.R:47-54),
deterministic tie-break, threshold mode, confidence filter."""

import pandas as pd
import ray.data as rd

from capelinker_ray.stages.selection import select_links


def _pairs():
    return pd.DataFrame({
        "conv_id_from": ["a", "a", "b", "b", "c"],
        "conv_id_to":   ["x", "y", "x", "z", "z"],
        "pred":         [0.9, 0.8, 0.9, 0.7, 0.6],
    })


def test_many_one_rank_parity(ray_session):
    """many:one keeps rank_from==1 & pred>thr (pred.R:50-51)."""
    out = select_links(rd.from_pandas(_pairs()), linktype="many:one",
                       minimum_confidence=0.5,
                       tie_break="average").to_pandas()
    got = set(zip(out["conv_id_from"], out["conv_id_to"]))
    assert got == {("a", "x"), ("b", "x"), ("c", "z")}


def test_one_one_global_argmax(ray_session):
    """one:one additionally requires rank_to==1 (pred.R:52-54). With the R
    average-tie rank, the a-x / b-x tie at 0.9 gives BOTH rank_to 1.5 on x
    (dropped); b-z and c-z lose their rank checks too -> empty result (the
    reference's conservative tie behavior, SURVEY §2.7)."""
    out = select_links(rd.from_pandas(_pairs()), linktype="one:one",
                       minimum_confidence=0.5,
                       tie_break="average").to_pandas()
    assert len(out) == 0


def test_deterministic_tiebreak_keeps_one(ray_session):
    out = select_links(rd.from_pandas(_pairs()), linktype="one:one",
                       minimum_confidence=0.5,
                       tie_break="deterministic").to_pandas()
    got = set(zip(out["conv_id_from"], out["conv_id_to"]))
    # the x-tie is broken deterministically (other-id asc): a-x survives
    # both ranks; b-x loses rank_to, b-z/c-z lose their rank checks —
    # rank-one:one is a filter, not an augmenting matching
    assert got == {("a", "x")}


def test_threshold_mode_keeps_all_above(ray_session):
    out = select_links(rd.from_pandas(_pairs()), linktype="threshold",
                       minimum_confidence=0.75).to_pandas()
    got = set(zip(out["conv_id_from"], out["conv_id_to"]))
    assert got == {("a", "x"), ("a", "y"), ("b", "x")}


def test_na_scores_dropped(ray_session):
    df = _pairs()
    df.loc[0, "pred"] = None
    out = select_links(rd.from_pandas(df), linktype="threshold",
                       minimum_confidence=0.0).to_pandas()
    assert ("a", "x") not in set(zip(out["conv_id_from"], out["conv_id_to"]))
