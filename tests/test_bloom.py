"""Bloom filter + bloom-prefiltered exact joins (stages/bloom.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from capelinker_ray.stages.bloom import (BloomFilter, bloom_anti_join,
                                         bloom_build, bloom_semi_join)


def test_bloom_no_false_negatives_and_low_fpp():
    keys = np.arange(1000, dtype=np.int64) * 7 + 3
    m, k = BloomFilter.size_for(1000, 0.01)
    bf = BloomFilter(m, k, seed=1)
    from capelinker_ray.stages.bloom import _key_hash as _hash_column
    bf.add_hashed(_hash_column(keys))
    assert bf.contains_hashed(_hash_column(keys)).all()   # no false negs
    absent = np.arange(1000, dtype=np.int64) * 7 + 4      # disjoint
    fp = bf.contains_hashed(_hash_column(absent)).mean()
    assert fp < 0.05                                      # ~1% target


def test_bloom_build_partials_or_merge(ray_session):
    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64)})
    whole = bloom_build(rd.from_pandas(df), "k", expected=500, seed=3)
    parts = bloom_build(rd.from_pandas(df).repartition(7), "k",
                        expected=500, seed=3)
    assert (whole.words == parts.words).all()             # OR is exact


def test_bloom_anti_join_exact_even_with_forced_fpp(ray_session):
    rng = np.random.default_rng(4)
    left = pd.DataFrame({"k": rng.integers(0, 1000, 5000).astype(np.int64),
                         "v": np.arange(5000, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 1000, 3, dtype=np.int64)})
    # num_bits=64 forces massive false positives; result must stay exact
    out = bloom_anti_join(rd.from_pandas(left).repartition(4),
                          rd.from_pandas(right), on="k",
                          num_partitions=4,
                          expected=len(right)).to_pandas()
    expect = left[~left["k"].isin(set(right["k"]))]
    assert len(out) == len(expect)
    assert set(out["v"]) == set(expect["v"])

    tiny = bloom_anti_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", num_partitions=4, expected=1,
                           fpp=0.5).to_pandas()
    assert set(tiny["v"]) == set(expect["v"])


def test_bloom_anti_join_null_keys_kept(ray_session):
    left = pd.DataFrame({"k": pd.array([1, None, 2, None], dtype="Int64"),
                         "v": [0, 1, 2, 3]})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64")})
    out = bloom_anti_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", expected=2).to_pandas()
    # SQL NOT EXISTS: null left keys never match -> retained
    assert set(out["v"]) == {1, 2, 3}


def test_bloom_semi_join_matches_exact(ray_session):
    rng = np.random.default_rng(9)
    left = pd.DataFrame({"k": rng.integers(0, 200, 2000).astype(np.int64),
                         "v": np.arange(2000, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 200, 5, dtype=np.int64)})
    out = bloom_semi_join(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right), on="k",
                          num_partitions=4).to_pandas()
    expect = left[left["k"].isin(set(right["k"]))]
    assert set(out["v"]) == set(expect["v"])


def test_bloom_size_for_sanity():
    m, k = BloomFilter.size_for(10_000, 0.01)
    assert 9 * 10_000 < m < 11 * 10_000      # ~9.6 bits/key at 1%
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        BloomFilter.size_for(10, 1.5)


def test_key_hash_dtype_canonicalization():
    # Ray's Arrow->pandas conversion may hand the same key column back as
    # int64, float64-with-NaN, or object — all must hash identically
    from capelinker_ray.stages.bloom import _key_hash
    ints = np.array([1, 2, 300], dtype=np.int64)
    floats = ints.astype(np.float64)
    objs = np.array([1, 2, 300], dtype=object)
    assert (_key_hash(ints) == _key_hash(floats)).all()
    assert (_key_hash(ints) == _key_hash(objs)).all()
    # non-integral floats keep their own identity
    a, b = _key_hash(np.array([1.5])), _key_hash(np.array([1.5]))
    assert a == b and a != _key_hash(np.array([1.0]))
