"""chunk_documents / add_char_entropy / calibration_bins."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.agg import (calibration_bins,
                                       expected_calibration_error)
from capelinker_ray.stages.textstats import add_char_entropy, chunk_documents


def test_chunk_semantics(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], np.int64),
        "text": ["abcdefghij",       # 10 chars
                 "xyz",              # shorter than one chunk
                 "",                 # empty -> one empty chunk
                 None]})             # null -> one empty chunk
    out = chunk_documents(rd.from_pandas(docs), chunk_chars=4,
                          overlap=1).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # stride 3: starts 0,3,6,9 while start < 10
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_text"]) == ["abcd", "defg", "ghij", "j"]
    assert list(d1["chunk_idx"]) == [0, 1, 2, 3]
    assert list(out[out["doc_id"] == 2]["chunk_text"]) == ["xyz"]
    assert list(out[out["doc_id"] == 3]["chunk_text"]) == [""]
    assert list(out[out["doc_id"] == 4]["chunk_text"]) == [""]


def test_chunk_overlap_reconstruction(ray_session):
    text = "".join(chr(ord("a") + i % 26) for i in range(1000))
    docs = pd.DataFrame({"doc_id": [7], "text": [text]})
    out = chunk_documents(rd.from_pandas(docs), chunk_chars=128,
                          overlap=32).to_pandas()
    out = out.sort_values("chunk_idx")
    stride = 128 - 32
    rebuilt = ""
    for i, c in zip(out["chunk_idx"], out["chunk_text"]):
        rebuilt = rebuilt[: i * stride] + c
    assert rebuilt == text


def test_char_entropy(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["aaaa", "abab", "abcd", ""]})
    out = add_char_entropy(rd.from_pandas(docs)).to_pandas()
    e = out.sort_values("doc_id")["char_entropy"].to_numpy()
    assert e[0] == 0.0            # single symbol
    np.testing.assert_allclose(e[1], 1.0)   # two symbols 50/50
    np.testing.assert_allclose(e[2], 2.0)   # four symbols uniform
    assert e[3] == 0.0            # empty


def test_char_entropy_partition_invariant(ray_session):
    rng = np.random.default_rng(0)
    texts = ["".join(rng.choice(list("abcdef "), size=rng.integers(1, 80)))
             for _ in range(300)]
    docs = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                         "text": texts})
    a = add_char_entropy(rd.from_pandas(docs).repartition(1)).to_pandas()
    b = add_char_entropy(rd.from_pandas(docs).repartition(8)).to_pandas()
    a = a.sort_values("doc_id")["char_entropy"].to_numpy()
    b = b.sort_values("doc_id")["char_entropy"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_calibration_bins_and_ece(ray_session):
    n = 10_000
    rng = np.random.default_rng(42)
    score = rng.uniform(0, 1, n)
    label = (rng.uniform(0, 1, n) < score).astype(np.int64)  # calibrated
    df = pd.DataFrame({"score": score, "label": label})
    cal = calibration_bins(rd.from_pandas(df).repartition(6),
                           bins=10).to_pandas()
    assert len(cal) == 10
    assert cal["n"].sum() == n
    # a calibrated model has small per-bin gaps
    assert (cal["gap"] < 0.08).all()
    ece = expected_calibration_error(cal)
    assert 0.0 <= ece < 0.05
    # exact check vs pandas groupby
    b = np.clip(np.floor(score * 10), 0, 9).astype(int)
    want = pd.DataFrame({"bin": b, "s": score, "y": label}).groupby(
        "bin").agg(n=("s", "size"), ms=("s", "mean"), ml=("y", "mean"))
    got = cal.set_index("bin").sort_index()
    np.testing.assert_allclose(got["mean_score"], want["ms"], rtol=1e-12)
    np.testing.assert_allclose(got["mean_label"], want["ml"], rtol=1e-12)


def test_calibration_score_one_lands_in_last_bin(ray_session):
    df = pd.DataFrame({"score": [1.0, 0.0, None], "label": [1, 0, 1]})
    cal = calibration_bins(rd.from_pandas(df), bins=5).to_pandas()
    assert cal["n"].sum() == 2          # null score dropped
    assert set(cal["bin"]) == {0, 4}
