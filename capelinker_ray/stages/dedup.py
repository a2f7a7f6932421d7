"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the training-data-pipeline dedup suite (build brief),
each expressed Ray-Data-first.

Shared scale pattern: compute a BLOCKING KEY per document (hash / band /
bucket) in a stateless vectorized ``map_batches``, then ONE
``groupby(key)`` shuffle with per-group work bounded by bucket size — the
same architecture as the linkage blocker (stages/blocking.py), because
near-dup detection IS self-link record linkage (the reference's
``duplicated()`` filters and candidate machinery, SURVEY §2.9,
generalized).

All hashes are deterministic (FNV-1a + splitmix64 streams) — no Python
``hash()``, which is salted per process and would break across workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from .textstats import fnv1a_64

__all__ = [
    "exact_dedup", "minhash_signatures", "minhash_lsh_dedup",
    "simhash_signatures", "ngram_jaccard_pairs", "embedding_dup_pairs",
]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of the k-shingles (character k-grams) of one doc.

    Vectorized: codepoints via a single utf-32 decode, sliding windows via
    stride tricks, FNV-style mix over the k columns — no per-shingle loop."""
    if not isinstance(text, str) or len(text) < k:
        return np.empty(0, dtype=np.uint64)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    win = np.lib.stride_tricks.sliding_window_view(cps, k).astype(np.uint64)
    h = np.full(len(win), np.uint64(14695981039346656037))
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ win[:, j]) * np.uint64(1099511628211)
    return np.unique(h)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, *, key_col: str, id_col: str):
    """Keep the min-id representative per exact key: hash-partition by key,
    per-group first (reference ``duplicated()`` semantics,
    data_raw/pretrained.R:134-137, made deterministic by min-id)."""
    from .grouped import grouped_map

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(key_col, sort=False)[id_col].min()
                .rename(f"keep_{id_col}").reset_index())
    return grouped_map(ds, key_col, agg)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(ds, *, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 5,
                       batch_size: int | None = None):
    """+ ``minhash`` (fixed_size_list<uint64? -> int64>[num_perm]).

    Permutations are simulated with splitmix64 streams over shingle hashes
    (h_i(x) = splitmix64(x ^ seed_i) min over shingles) — the standard
    one-pass vectorized minhash."""
    seeds = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sigs = np.full((len(texts), num_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        for i, s in enumerate(texts):
            sh = _shingle_hashes(s, shingle_k)
            if len(sh):
                # (n_shingles, num_perm) stream mins, vectorized
                sigs[i] = _splitmix64(sh[:, None] ^ seeds[None, :]).min(axis=0)
        flat = pa.array(sigs.astype(np.int64).reshape(-1), pa.int64())
        col = pa.FixedSizeListArray.from_arrays(flat, num_perm)
        return t.append_column("minhash", col)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def minhash_lsh_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.7):
    """MinHash + banded LSH near-dup pairs.

    shingle -> minhash (map_batches) -> explode one row per band with a
    band-hash key -> groupby(band_key) -> in-bucket signature Jaccard
    estimate >= threshold -> distinct pairs (min-id canonical order).
    Returns Dataset[(id_from, id_to, est_jaccard)] with id_from < id_to.
    """
    rows_per_band = num_perm // bands
    sigged = minhash_signatures(ds, text_col=text_col, id_col=id_col,
                                num_perm=num_perm, shingle_k=shingle_k)

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist())
        sig = np.asarray(
            t["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(len(t), num_perm).astype(np.uint64)
        out_ids, out_keys, out_sigs = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            # band key: fold the band's rows into one 64-bit key + band tag
            key = np.full(len(t), np.uint64(b + 1))
            for j in range(rows_per_band):
                key = _splitmix64(key ^ chunk[:, j])
            out_ids.append(ids)
            out_keys.append(key)
            out_sigs.append(sig)
        flat_sig = np.concatenate(out_sigs).astype(np.int64).reshape(-1)
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids)),
            "band_key": pa.array(np.concatenate(out_keys).astype(np.int64)),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(flat_sig, pa.int64()), num_perm),
        })

    exploded = sigged.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs_partition(part: pd.DataFrame) -> pd.DataFrame:
        """Coarse partition holding many complete buckets: singleton buckets
        (the vast majority) are dropped with ONE vectorized filter; only
        multi-member buckets pay the per-bucket pair loop."""
        empty = pd.DataFrame({"id_from": pd.Series(dtype=np.int64),
                              "id_to": pd.Series(dtype=np.int64),
                              "est_jaccard": pd.Series(dtype=np.float64)})
        if not len(part):
            return empty
        sizes = part.groupby("band_key", sort=False)["band_key"].transform("size")
        part = part[sizes > 1]
        if not len(part):
            return empty
        frames = [empty]
        for _, g in part.groupby("band_key", sort=False):
            ids = g[id_col].to_numpy()
            sig = np.stack(g["minhash"].to_numpy())
            fi, ti = np.triu_indices(len(ids), k=1)
            est = (sig[fi] == sig[ti]).mean(axis=1)
            keep = est >= jaccard_threshold
            a, b = ids[fi[keep]], ids[ti[keep]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            frames.append(pd.DataFrame({"id_from": lo.astype(np.int64),
                                        "id_to": hi.astype(np.int64),
                                        "est_jaccard": est[keep]}))
        return pd.concat(frames, ignore_index=True)

    from .grouped import grouped_map
    pairs = grouped_map(exploded, "band_key", bucket_pairs_partition)

    # same pair can fire in several bands -> keep one row per pair
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["id_from", "id_to"], sort=False)["est_jaccard"]
                .min().reset_index())
    return grouped_map(pairs, ["id_from", "id_to"], dedup_pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(ds, *, text_col: str = "text",
                       batch_size: int | None = None):
    """+ ``simhash`` int64: 64-bit Charikar simhash over token hashes.

    Vectorized across the whole batch: all tokens of all docs are hashed in
    one ``fnv1a_64`` call, per-doc/per-bit ±1 sums come from 64 bincounts
    over the flattened token->doc index — no per-document Python loop."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        n = len(df)
        tok_lists = df[text_col].fillna("").str.lower().str.split()
        lens = tok_lists.str.len().to_numpy(np.int64)
        sigs = np.zeros(n, dtype=np.uint64)
        if lens.sum():
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists])
            doc_idx = np.repeat(np.arange(n), lens)
            h = fnv1a_64(flat)
            v = np.empty((n, 64), dtype=np.float64)
            for j in range(64):
                bit = ((h >> np.uint64(j)) & np.uint64(1)).astype(np.float64)
                v[:, j] = np.bincount(doc_idx, weights=2.0 * bit - 1.0,
                                      minlength=n)
            packed = np.packbits((v > 0).astype(np.uint8), axis=1,
                                 bitorder="little")
            sigs = packed.view(np.uint64).reshape(n)
            sigs[lens == 0] = np.uint64(0)
        out["simhash"] = sigs.astype(np.int64)
        return out
    return ds.map_batches(fn, batch_format="pandas", batch_size=batch_size)


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact, within blocks)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        block_col: str | None = None, n: int = 3,
                        threshold: float = 0.5):
    """Exact character-n-gram Jaccard over pairs within ``block_col`` groups
    (or one global group for small inputs — O(b²) per block, so block!)."""
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        sets = [set(map(int, _shingle_hashes(s, n)))
                for s in g[text_col].fillna("")]
        rows = {"id_from": [], "id_to": [], "jaccard": []}
        m = len(ids)
        for i in range(m):
            for j in range(i + 1, m):
                si, sj = sets[i], sets[j]
                if not si and not sj:
                    continue
                jac = len(si & sj) / len(si | sj)
                if jac >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    rows["id_from"].append(a)
                    rows["id_to"].append(b)
                    rows["jaccard"].append(jac)
        return pd.DataFrame(rows).astype({"id_from": np.int64,
                                          "id_to": np.int64,
                                          "jaccard": np.float64})

    if block_col is None:
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_blk"] = 0
            return df
        ds = ds.map_batches(tag, batch_format="pandas")
        block_col = "_blk"
    return ds.groupby(block_col).map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.95,
                        n_buckets: int = 8, n_planes: int = 4,
                        exact_block: bool = False):
    """Embedding-cosine near-dup pairs.

    Scale path: random-hyperplane LSH bucket key (sign pattern of
    ``n_planes`` fixed seeded projections; near-identical vectors collide) ->
    groupby(bucket) -> in-bucket exact cosine >= threshold. With
    ``exact_block=True`` everything lands in one block (small-data oracle
    mode: exact, no LSH misses)."""
    rng = np.random.default_rng(12345)
    planes = None  # lazily sized to the vector dim

    def key_fn(df: pd.DataFrame) -> pd.DataFrame:
        nonlocal planes
        V = np.stack(df[vec_col].to_numpy())
        if planes is None:
            planes = np.random.default_rng(12345).normal(size=(V.shape[1], n_planes))
        df = df.copy()
        if exact_block:
            df["_bucket"] = 0
        else:
            signs = (V @ planes) > 0
            key = np.zeros(len(df), dtype=np.int64)
            for j in range(n_planes):
                key = key * 2 + signs[:, j]
            df["_bucket"] = key
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        V = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        V = V / np.where(norms == 0, 1, norms)
        S = V @ V.T
        fi, ti = np.triu_indices(len(ids), k=1)
        keep = S[fi, ti] >= threshold
        a, b = ids[fi[keep]], ids[ti[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_from": lo.astype(np.int64),
                             "id_to": hi.astype(np.int64),
                             "cosine": S[fi, ti][keep]})

    keyed = ds.map_batches(key_fn, batch_format="pandas")
    return keyed.groupby("_bucket").map_groups(pairs, batch_format="pandas")
