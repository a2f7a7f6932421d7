"""Corpus trigram-LM perplexity (stages/lm.py) vs a hand reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from capelinker_ray.stages.lm import trigram_nll


def _reference(docs: dict) -> dict:
    from collections import Counter
    tri = Counter()
    for t in docs.values():
        for i in range(len(t) - 2):
            tri[t[i:i + 3]] += 1
    ctx = Counter()
    for k, n in tri.items():
        ctx[k[:2]] += n
    v = len({k[2] for k in tri})
    out = {}
    for d, t in docs.items():
        if len(t) < 3:
            continue
        lps = [np.log((tri[t[i:i + 3]] + 1.0) / (ctx[t[i:i + 2]] + v))
               for i in range(len(t) - 2)]
        out[d] = round(-float(np.mean(lps)), 6)
    return out


def test_trigram_nll_matches_hand_reference(ray_session):
    docs = {1: "abcabcabc", 2: "abcxyz", 3: "zzzzzz", 4: "ab", 5: "qqq"}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = (trigram_nll(rd.from_pandas(df).repartition(3))
           .to_pandas().set_index("doc_id"))
    exp = _reference(docs)
    assert set(out.index) == set(exp)            # doc 4 (<3 chars) omitted
    for d, nll in exp.items():
        assert abs(out.loc[d, "nll"] - nll) < 1e-6, d
        assert out.loc[d, "n_tri"] == len(docs[d]) - 2


def test_trigram_nll_flags_gibberish(ray_session):
    rng = np.random.default_rng(5)
    normal = ["the quick brown fox jumps over the lazy dog " * 3] * 30
    gibberish = ["".join(chr(int(c)) for c in
                         rng.integers(0x4E00, 0x9FFF, 60))]
    df = pd.DataFrame({"doc_id": np.arange(31),
                       "text": normal + gibberish})
    out = trigram_nll(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[30, "nll"] > out.loc[:29, "nll"].max() + 1.0


def test_trigram_nll_min_count_prunes_distributed(ray_session):
    """min_count pruning happens in the context-keyed combine: surviving
    probabilities use PRE-prune context sums, pruned trigrams score via
    the unseen path (count 0), and results are partition-invariant."""
    docs = {1: "abcabcabcabc", 2: "abcxyzw", 3: "zzzzzzz", 4: "qqqr"}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    def reference(min_count):
        from collections import Counter
        tri = Counter()
        for t in docs.values():
            for i in range(len(t) - 2):
                tri[t[i:i + 3]] += 1
        ctx = Counter()
        for k, n in tri.items():
            ctx[k[:2]] += n
        v = len({k[2] for k in tri})
        kept = {k: n for k, n in tri.items() if n >= min_count}
        out = {}
        for d, t in docs.items():
            lps = [np.log((kept.get(t[i:i + 3], 0) + 1.0)
                          / (ctx[t[i:i + 2]] + v))
                   for i in range(len(t) - 2)]
            out[d] = round(-float(np.mean(lps)), 6)
        return out

    for parts in (1, 5):
        got = (trigram_nll(rd.from_pandas(df).repartition(parts),
                           min_count=2)
               .to_pandas().set_index("doc_id"))
        exp = reference(2)
        assert set(got.index) == set(exp)
        for d in exp:
            assert abs(got.loc[d, "nll"] - exp[d]) < 1e-6, (parts, d)
