"""PII redaction, benchmark decontamination, vocab counts."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.pii import add_pii_stats, redact_pii
from capelinker_ray.stages.decontam import decontaminate, word_ngram_hashes
from capelinker_ray.stages.corpus_stats import vocab_counts


def _pii_docs():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "mail me at jo.doe+spam@sub.example.co.uk or admin@x.io now",
            "server 192.168.0.1 and 10.0.0.255 but not 1234.5.6.78",
            "call +27821234567 or 555-867-5309 thanks",
            None,
        ],
    })


def test_pii_counts(ray_session):
    out = (add_pii_stats(rd.from_pandas(_pii_docs())).to_pandas()
           .set_index("doc_id"))
    assert out.loc[1, "n_emails"] == 2
    assert out.loc[2, "n_ips"] == 2  # the 4-digit first octet breaks \b
    assert out.loc[3, "n_phones"] == 2
    assert (out.loc[4, ["n_emails", "n_ips", "n_phones"]] == 0).all()


def test_pii_redaction(ray_session):
    out = (redact_pii(rd.from_pandas(_pii_docs())).to_pandas()
           .set_index("doc_id"))
    assert out.loc[1, "text_redacted"] == \
        "mail me at <EMAIL> or <EMAIL> now"
    assert out.loc[3, "text_redacted"] == "call <PHONE> or <PHONE> thanks"
    assert "<IP>" in out.loc[2, "text_redacted"]
    assert out.loc[4, "text_redacted"] == ""


def test_word_ngram_hashes_boundaries():
    s = pd.Series(["a b c d", "c d e", "x"])
    h, d = word_ngram_hashes(s, 2)
    # doc0: (a b)(b c)(c d); doc1: (c d)(d e); doc2: none
    assert list(d) == [0, 0, 0, 1, 1]
    # same n-gram hashes identically across docs, different ones don't
    assert h[2] == h[3]
    assert len(set(h.tolist())) == 4


def test_decontaminate(ray_session):
    shared = "one two three four five six seven eight"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"intro {shared} outro words here",          # contains bench 8-gram
            "totally unrelated text with enough words to have ngrams ok",
            "short doc",                                  # < 8 words
            f"{shared} and {shared} again padding",       # same hit twice -> 1
        ],
    })
    bench = pd.DataFrame({
        "doc_id": [100],
        "text": [f"benchmark question {shared} answer choices"],
    })
    out = (decontaminate(rd.from_pandas(docs), rd.from_pandas(bench), n=8)
           .to_pandas().set_index("doc_id").sort_index())
    assert bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])
    assert not bool(out.loc[3, "contaminated"])
    # distinct-ngram counting: doc4 repeats the same shared 8-gram
    assert out.loc[4, "n_hit_ngrams"] >= 1
    assert out.loc[1, "n_hit_ngrams"] == 1


def test_vocab_counts(ray_session):
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["apple banana", "apple", "apple  banana", "apple pear",
                 None, "apple banana pear"],
    })
    out = (vocab_counts(rd.from_pandas(docs), min_count=3).to_pandas()
           .set_index("token")["n"])
    assert out.loc["apple"] == 5
    assert out.loc["banana"] == 3
    assert "pear" not in out.index      # count 2 < 3
    assert "" not in out.index          # double space -> empty token dropped
