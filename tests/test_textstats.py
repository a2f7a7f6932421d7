"""Text-analysis oracles: token counts, quality score, lang-id, fingerprint."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.textstats import (
    add_fingerprint, add_lang_id, add_quality_score, add_token_counts,
    fnv1a_64,
)


def _docs():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the quick brown fox", "", None, "a b  c d."],
    })


def test_token_counts(ray_session):
    out = add_token_counts(rd.from_pandas(_docs())).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[1, "n_ws_tokens"] == 4
    assert out.loc[2, "n_ws_tokens"] == 0
    assert out.loc[3, "n_ws_tokens"] == 0
    assert out.loc[4, "n_ws_tokens"] == 4
    assert out.loc[4, "n_bpe_tokens"] == 5  # a b c d .


def test_quality_score_range(ray_session):
    out = add_quality_score(rd.from_pandas(_docs())).to_pandas()
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert out.set_index("doc_id").loc[1, "quality"] > \
           out.set_index("doc_id").loc[2, "quality"]


def test_lang_id(ray_session):
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the thing and another thing for the winner",
                 "een van der heeren heeft het paard verkocht",
                 "zzz qqq"],
    })
    out = add_lang_id(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "nl"
    assert out.loc[3, "lang_pred"] == "und"


def test_fingerprint_deterministic_and_ws_invariant(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a  b c", "a b c", "a b d"]})
    out = add_fingerprint(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "fingerprint"] == out.loc[2, "fingerprint"]
    assert out.loc[1, "fingerprint"] != out.loc[3, "fingerprint"]
    # cross-process determinism: pinned value of FNV-1a("a b c")
    assert int(np.uint64(out.loc[1, "fingerprint"])) == int(fnv1a_64(["a b c"])[0])


def test_repetition_stats_hand_example(ray_session):
    import ray.data as rd
    from capelinker_ray.stages.textstats import add_repetition_stats
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b a",         # 5 words, 2 distinct; 'a'x3; 'a b'x2 of 4 bigrams
                 "x y z",             # all distinct; each bigram once
                 "solo",              # 1 word: no bigrams
                 ""],                 # one empty word
    })
    out = (add_repetition_stats(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert np.isclose(out.loc[0, "dup_word_frac"], 3 / 5)
    assert np.isclose(out.loc[0, "top_word_frac"], 3 / 5)
    assert np.isclose(out.loc[0, "top_bigram_frac"], 2 / 4)
    assert np.isclose(out.loc[1, "dup_word_frac"], 0.0)
    assert np.isclose(out.loc[1, "top_bigram_frac"], 1 / 2)
    assert out.loc[2, "top_bigram_frac"] == 0.0
    assert np.isclose(out.loc[2, "top_word_frac"], 1.0)
    # '' -> one empty word: fully "repeated" by the n=1 degenerate case
    assert np.isclose(out.loc[3, "top_word_frac"], 1.0)
    assert np.isclose(out.loc[3, "dup_word_frac"], 0.0)


def test_pair_counts_adjacent_within_doc(ray_session):
    import ray.data as rd
    from capelinker_ray.stages.corpus_stats import pair_counts
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        # pair (a,b) x3 across docs; (b,a) x2; boundary never pairs:
        # doc0 ends 'z', doc1 starts 'a' -> (z,a) must NOT count
        "text": ["a b a b z", "a b", "b a  b a"],
    })
    out = (pair_counts(rd.from_pandas(df), min_count=2).to_pandas()
           .sort_values(["left_tok", "right_tok"]).reset_index(drop=True))
    got = {(r.left_tok, r.right_tok): r.n for r in out.itertuples()}
    assert got[("a", "b")] == 3
    assert got[("b", "a")] == 3          # doc0 has one, doc2 has two
    assert ("z", "a") not in got
    # the double space in doc2 makes ('b','') / ('','b') pairs -> excluded
    assert all(l != "" and r != "" for l, r in got)


def test_hash_embed_deterministic_and_normalized(ray_session):
    from capelinker_ray.stages.textstats import hash_embed
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["the cat sat", "the the the", ""]})
    out = (hash_embed(rd.from_pandas(df), dim=32).to_pandas()
           .sort_values("doc_id"))
    M = np.stack(out["embedding"].to_numpy())
    assert M.shape == (3, 32)
    # normalized rows (zero-token doc stays zero)
    assert np.allclose(np.linalg.norm(M[:2], axis=1), 1.0)
    assert np.allclose(M[2], 0.0)
    out2 = (hash_embed(rd.from_pandas(df).repartition(3), dim=32)
            .to_pandas().sort_values("doc_id"))
    assert np.allclose(M, np.stack(out2["embedding"].to_numpy()))


def test_hash_embed_token_counts_weighting(ray_session):
    from capelinker_ray.stages.textstats import hash_embed
    # "a a" must weight token a twice vs "a" once (pre-normalization)
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a a", "a"]})
    out = (hash_embed(rd.from_pandas(df), dim=16, normalize=False)
           .to_pandas().sort_values("doc_id"))
    M = np.stack(out["embedding"].to_numpy())
    assert np.allclose(M[0], 2 * M[1])
    assert np.abs(M[1]).sum() == 1.0


def test_blocklist_stats_counts_and_flag(ray_session):
    from capelinker_ray.stages.textstats import add_blocklist_stats
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["Spam and SPAM again", "clean text here",
                 "spamspamspam", None, "multi bad word bad"]})
    out = (add_blocklist_stats(rd.from_pandas(df), ["spam", "bad word"],
                               threshold=2)
           .to_pandas().sort_values("doc_id"))
    # case-insensitive, non-overlapping counts
    assert list(out["blocklist_hits"]) == [2, 0, 3, 0, 1]
    assert list(out["blocklist_flag"]) == [True, False, True, False, False]


def test_blocklist_stats_rejects_empty_terms(ray_session):
    from capelinker_ray.stages.textstats import add_blocklist_stats
    import pytest
    with pytest.raises(ValueError):
        add_blocklist_stats(rd.from_pandas(pd.DataFrame({"text": ["x"]})),
                            [])


def test_pmi_scores_analytic(ray_session):
    from capelinker_ray.stages.corpus_stats import pmi_scores
    # corpus: "x y" repeated 6x in one doc chain + "x z" noise docs
    df = pd.DataFrame({"text": ["x y x y x y", "x y x y x y",
                                "z q z q z q"]})
    out = (pmi_scores(rd.from_pandas(df).repartition(3), min_count=2)
           .to_pandas().set_index(["left_tok", "right_tok"]))
    # counts: tokens x=6 y=6 z=3 q=3, N=18; pairs per doc len 6 -> 5
    # adjacent, P=15. (x,y) n=6, (y,x) n=4, (z,q) n=3, (q,z) n=2
    import math
    assert out.loc[("x", "y"), "n"] == 6
    want = round(math.log2((6 * 18.0 * 18.0) / ((15.0 * 6) * 6)), 9)
    assert abs(out.loc[("x", "y"), "pmi"] - want) < 1e-9
    want_zq = round(math.log2((3 * 18.0 * 18.0) / ((15.0 * 3) * 3)), 9)
    assert abs(out.loc[("z", "q"), "pmi"] - want_zq) < 1e-9


def test_pmi_scores_partition_invariant(ray_session):
    from capelinker_ray.stages.corpus_stats import pmi_scores
    rng = np.random.default_rng(3)
    toks = np.array(["a", "b", "c", "d", "e"])
    docs = [" ".join(rng.choice(toks, rng.integers(3, 12)))
            for _ in range(60)]
    df = pd.DataFrame({"text": docs})
    a = (pmi_scores(rd.from_pandas(df), min_count=3).to_pandas()
         .sort_values(["left_tok", "right_tok"]).reset_index(drop=True))
    b = (pmi_scores(rd.from_pandas(df).repartition(11), min_count=3)
         .to_pandas().sort_values(["left_tok", "right_tok"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_pmi_vocab_collect_bounded_by_pair_tokens(ray_session):
    """100-TB guard: the driver-collected unigram table must be bounded by
    the min_count-pruned pair table's tokens, not the corpus vocabulary —
    a web corpus has unbounded distinct tokens (typos, URLs, hex ids)."""
    from capelinker_ray.stages.corpus_stats import pmi_scores
    # huge injected vocabulary: 4000 singleton junk tokens, plus one
    # genuinely collocated pair repeated past min_count
    junk = " ".join(f"junk{i:05d}" for i in range(4000))
    df = pd.DataFrame({"text": ["x y x y x y x y", junk]})
    out = (pmi_scores(rd.from_pandas(df).repartition(4), min_count=3)
           .to_pandas())
    # only (x,y) and (y,x) survive min_count=3
    assert set(map(tuple, out[["left_tok", "right_tok"]].to_numpy())) == {
        ("x", "y"), ("y", "x")}
    # collected vocab == surviving-pair tokens (2), never the 4002-token
    # corpus vocabulary
    assert pmi_scores.last_pair_tokens == 2
    assert pmi_scores.last_vocab_rows == 2
    # values still exact: N counts the FULL corpus (junk included)
    import math
    n_tok = 8 + 4000.0
    n_pair = 7 + 3999.0
    want = round(math.log2((4 * n_tok * n_tok) / ((n_pair * 4) * 4)), 9)
    got = out.set_index(["left_tok", "right_tok"]).loc[("x", "y"), "pmi"]
    assert abs(got - want) < 1e-9
