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
    "simhash_signatures", "simhash_dup_pairs", "ngram_jaccard_pairs",
    "embedding_dup_pairs", "segment_dedup", "semantic_dedup",
    "incremental_dedup", "ngram_containment_pairs",
    "keep_best_per_family", "incremental_minhash_dedup",
]


def _widen(ds, input_partitions):
    """Repartition a narrow input up to session width before a heavy
    pre-shuffle stage. A single-block source (from_pandas, one small
    parquet file) otherwise runs the whole signature/shingle computation
    as ONE serial task — downstream grouped_map repartitions spread the
    SHUFFLE, not the map that feeds it. ``input_partitions=None`` skips
    (cluster-scale reads are already wide); ``"auto"`` = 2× session CPUs."""
    if input_partitions:
        from .grouped import default_partitions
        n = (default_partitions() if input_partitions == "auto"
             else int(input_partitions))
        try:
            if ds.num_blocks() >= n:   # already wide (materialized only)
                return ds
        except Exception:
            pass                        # lazy plan: width unknown
        ds = ds.repartition(n)
    return ds


# ---------------------------------------------------------------------------
# shared LSH plumbing: slim bucket explosion -> candidate id pairs
# ---------------------------------------------------------------------------

def _bucket_candidate_pairs(keyed, *, key_col: str, id_col: str, cap: int):
    """Dataset[(id, bucket key, ...)] -> distinct candidate (id_from <
    id_to) pairs from same-bucket collisions.

    Reuses the blocking engine's equality self-link (stages/blocking.py):
    hot buckets beyond ``cap`` pairs are salted (from-rows sharded, to-rows
    replicated), pair enumeration is the fully-vectorized cross-block
    path. Only (id, key) rows move through the shuffle — payloads
    (signatures / vectors) are re-joined per-pair afterwards, NOT
    replicated per bucket row (r1 verdict weakness #6)."""
    from .blocking import candidates as _equality_candidates
    from .grouped import grouped_map

    pairs = _equality_candidates(
        keyed, None, block_col=key_col, id_col=id_col,
        blocktype="equality", attr_cols=[], keep_unmatched=False,
        max_block_pairs=cap)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "id_from": df[f"{id_col}_from"].astype(np.int64),
            "id_to": df[f"{id_col}_to"].astype(np.int64),
        })
        return out

    pairs = pairs.map_batches(proj, batch_format="pandas")

    # the same pair can collide in several buckets/bands -> one row per
    # pair; arrow out so the downstream hash_join sees int64 keys
    pair_schema = pa.schema([("id_from", pa.int64()), ("id_to", pa.int64())])

    def dedup(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df.drop_duplicates(["id_from", "id_to"])[["id_from", "id_to"]],
            schema=pair_schema, preserve_index=False)
    return grouped_map(pairs, ["id_from", "id_to"], dedup)


def _join_payload(pairs, payload, *, id_col: str, col: str):
    """pairs(id_from,id_to,...) + payload(id, col) -> pairs + col_from/_to
    via two hash joins (shuffles candidate pairs only, never buckets).

    ``col`` must be scalar-typed (int/float/string/binary) — vector
    payloads are packed to fixed-size binary first (list-typed columns
    become Ray tensor extensions in pandas blocks and break shuffle
    concatenation when the join pads them with nulls)."""
    from .join import hash_join

    def side(name):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({name: t[id_col].cast(pa.int64()),
                             f"{col}{name[2:]}": t[col]})
        return payload.map_batches(f, batch_format="pyarrow")

    out = hash_join(pairs, side("id_from"), on="id_from")
    return hash_join(out, side("id_to"), on="id_to")


def _pack_rows(M: np.ndarray) -> pa.Array:
    """(n, d) numeric matrix -> fixed_size_binary(d*itemsize) array
    (zero-copy-ish: one contiguous buffer, no per-row Python objects)."""
    M = np.ascontiguousarray(M)
    width = M.shape[1] * M.dtype.itemsize
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), len(M), [None, pa.py_buffer(M.tobytes())])


def _unpack_rows(col, dtype) -> np.ndarray:
    """pandas/arrow column of fixed-size byte strings -> (n, d) matrix."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        vals = col.to_numpy(zero_copy_only=False)
    elif isinstance(col, pd.Series):
        vals = col.to_numpy()
    else:
        vals = np.asarray(col, dtype=object)
    if len(vals) == 0:
        return np.empty((0, 0), dtype=dtype)
    buf = b"".join(vals)
    flat = np.frombuffer(buf, dtype=dtype)
    return flat.reshape(len(vals), -1)


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
    # strided view, cast per COLUMN inside the loop: one k-wide astype of
    # the whole window matrix is a single large fresh allocation (k x the
    # column size), and fresh multi-MB pages fault ~100x slower than
    # arena-reused ones on this kernel (see kernels/strdist._chunk_pairs)
    win = np.lib.stride_tricks.sliding_window_view(cps, k)
    h = np.full(win.shape[0], np.uint64(14695981039346656037))
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ win[:, j].astype(np.uint64)) * np.uint64(1099511628211)
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

def _batch_shingle_hashes(texts: list, k: int):
    """Whole-batch shingle hashing: ONE utf-32 encode of all docs joined on
    a separator, one sliding window, FNV mix over the k columns. Returns
    (doc_starts, hashes) with hashes doc-contiguous (``doc_starts[i]`` is
    doc i's first window; empty docs have zero-width spans) — shaped for
    ``np.minimum.reduceat`` per-doc reductions with no per-doc loop."""
    n = len(texts)
    clean = [(s if isinstance(s, str) else "") for s in texts]
    full = "\x00".join(clean)
    cps = np.frombuffer(full.encode("utf-32-le"), dtype=np.uint32)
    if len(cps) < k:
        return np.zeros(n, np.int64), np.empty(0, np.uint64)
    # strided view, cast per COLUMN inside the loop: one k-wide astype of
    # the whole window matrix is a single large fresh allocation (k x the
    # column size), and fresh multi-MB pages fault ~100x slower than
    # arena-reused ones on this kernel (see kernels/strdist._chunk_pairs)
    win = np.lib.stride_tricks.sliding_window_view(cps, k)
    h = np.full(win.shape[0], np.uint64(14695981039346656037))
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ win[:, j].astype(np.uint64)) * np.uint64(1099511628211)
    # doc ownership: window at position p belongs to the doc covering p;
    # validity is POSITIONAL (all k chars inside the owner's span) so a
    # doc containing the separator codepoint keeps its shingles (parity
    # with the per-doc _shingle_hashes kernel)
    lens = np.array([len(s) for s in clean], dtype=np.int64)
    starts = np.cumsum(lens + 1) - (lens + 1)
    pos = np.arange(len(win), dtype=np.int64)
    owner = np.searchsorted(starts, pos, side="right") - 1
    valid = pos + k - 1 < starts[owner] + lens[owner]
    h = h[valid]
    owner = owner[valid]
    # windows are position-ordered => doc-contiguous; per-doc window count
    counts = np.bincount(owner, minlength=n)
    doc_starts = np.cumsum(counts) - counts
    return doc_starts, h


def minhash_signatures(ds, *, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 5,
                       batch_size: int | None = None,
                       input_partitions: int | str | None = "auto"):
    """+ ``minhash`` (fixed_size_list<uint64? -> int64>[num_perm]).

    Permutations are simulated with splitmix64 streams over shingle hashes
    (h_i(x) = splitmix64(x ^ seed_i) min over shingles). Fully batch
    vectorized: one shingle-hash pass for the whole batch, then per stream
    one ``np.minimum.reduceat`` over the doc-contiguous hash runs — no
    per-document Python loop (min over the shingle multiset equals min
    over the set, so no dedup pass is needed)."""
    ds = _widen(ds, input_partitions)
    seeds = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    maxv = np.iinfo(np.uint64).max

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n = len(texts)
        sigs = np.full((n, num_perm), maxv, dtype=np.uint64)
        doc_starts, h = _batch_shingle_hashes(texts, shingle_k)
        if len(h):
            counts = np.diff(np.append(doc_starts, len(h)))
            nonempty = counts > 0
            # reduceat needs strictly valid start offsets: run it over the
            # non-empty docs' starts only
            ne_starts = doc_starts[nonempty]
            for p in range(num_perm):
                s = _splitmix64(h ^ seeds[p])
                sigs[nonempty, p] = np.minimum.reduceat(s, ne_starts)
        flat = pa.array(sigs.astype(np.int64).reshape(-1), pa.int64())
        col = pa.FixedSizeListArray.from_arrays(flat, num_perm)
        return t.append_column("minhash", col)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _minhash_rejoin_pairs(sigged, band_keys_fn, sig_matrix_fn, *,
                          id_col: str, bands: int,
                          jaccard_threshold: float, max_bucket_pairs: int):
    """Scale layout for the LSH shuffle: only slim ``(id, band_key)`` rows
    move; signatures are re-joined per CANDIDATE pair and verified
    vectorized (the ``simhash_dup_pairs`` pattern)."""
    pair_schema = pa.schema([("id_from", pa.int64()), ("id_to", pa.int64()),
                             ("est_jaccard", pa.float64())])

    def explode_slim(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.int64, copy=False)
        keys = band_keys_fn(sig_matrix_fn(t))
        return pa.table({
            id_col: pa.array(np.tile(ids, bands)),
            "band_key": pa.array(keys.reshape(-1).astype(np.int64))})

    exploded = sigged.map_batches(explode_slim, batch_format="pyarrow")
    pairs = _bucket_candidate_pairs(exploded, key_col="band_key",
                                    id_col=id_col, cap=max_bucket_pairs)

    def pack_sig(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "sig_b": _pack_rows(
                             sig_matrix_fn(t).astype(np.int64))})

    joined = _join_payload(pairs, sigged.map_batches(
        pack_sig, batch_format="pyarrow"), id_col=id_col, col="sig_b")

    def verify(t: pa.Table) -> pa.Table:
        if not len(t):
            return pair_schema.empty_table()
        A = _unpack_rows(t["sig_b_from"].combine_chunks(), np.int64)
        B = _unpack_rows(t["sig_b_to"].combine_chunks(), np.int64)
        est = (A == B).mean(axis=1)
        keep = pa.array(est >= jaccard_threshold)
        return pa.table({
            "id_from": t["id_from"].filter(keep),
            "id_to": t["id_to"].filter(keep),
            "est_jaccard": pa.array(est[est >= jaccard_threshold],
                                    pa.float64())})

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.7,
                      payload_mode: str = "auto",
                      rejoin_threshold: int = 2_000_000,
                      max_bucket_pairs: int = 200_000):
    """MinHash + banded LSH near-dup pairs.

    shingle -> minhash (map_batches) -> explode one row per band with a
    band-hash key -> ONE groupby(band_key) shuffle -> same-bucket
    candidates -> est Jaccard = fraction of equal permutation slots,
    filtered >= threshold. Two shuffle layouts (``payload_mode``):

      * ``"inline"`` — the signature rides each band row PACKED as one
        fixed-size binary value (contiguous bytes, not a per-row Python
        list) and the estimate filter runs IN the bucket before any pair
        leaves it. A dup-heavy corpus produces ~100x more raw band
        collisions than true near-dups (measured 401k collisions -> 258
        pairs at sf0.1), so in-bucket filtering wins at moderate scale
        despite replicating the signature x bands through the shuffle.
      * ``"rejoin"`` — slim ``(id, band_key)`` rows only through the
        shuffle (8 KB/doc of signature bytes saved at num_perm=64 x 16
        bands), candidate pairs enumerated by the salted equality blocker,
        signatures re-joined per CANDIDATE PAIR and verified vectorized —
        the ``simhash_dup_pairs`` layout. Wins when corpus size x signature
        width dominates the collision count (100-TB regime).
      * ``"auto"`` (default) — materializes the signature table once and
        picks ``rejoin`` above ``rejoin_threshold`` docs, ``inline`` below.

    Both modes return identical pairs (pytest-pinned): the estimate is
    computed over the full signature either way.
    Returns Dataset[(id_from, id_to, est_jaccard)] with id_from < id_to.
    """
    if payload_mode not in ("auto", "inline", "rejoin"):
        raise ValueError(f"unknown payload_mode {payload_mode!r}")
    rows_per_band = num_perm // bands
    sigged = minhash_signatures(ds, text_col=text_col, id_col=id_col,
                                num_perm=num_perm, shingle_k=shingle_k)
    if payload_mode == "auto":
        sigged = sigged.materialize()
        payload_mode = ("rejoin" if sigged.count() > rejoin_threshold
                        else "inline")

    def _band_keys(sig: np.ndarray) -> np.ndarray:
        """(n, num_perm) uint64 signatures -> (bands, n) band-hash keys."""
        keys = np.empty((bands, sig.shape[0]), dtype=np.uint64)
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            # band key: fold the band's rows into one 64-bit key + band tag
            key = np.full(sig.shape[0], np.uint64(b + 1))
            for j in range(rows_per_band):
                key = _splitmix64(key ^ chunk[:, j])
            keys[b] = key
        return keys

    def _sig_matrix(t: pa.Table) -> np.ndarray:
        return np.asarray(
            t["minhash"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False)
        ).reshape(len(t), num_perm).astype(np.uint64)

    if payload_mode == "rejoin":
        return _minhash_rejoin_pairs(
            sigged, _band_keys, _sig_matrix, id_col=id_col, bands=bands,
            jaccard_threshold=jaccard_threshold,
            max_bucket_pairs=max_bucket_pairs)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.int64, copy=False)
        sig = _sig_matrix(t)
        keys = _band_keys(sig)
        packed = _pack_rows(sig.astype(np.int64))
        sig_rep = pa.chunked_array([packed] * bands)
        return pa.table({
            id_col: pa.array(np.tile(ids, bands)),
            "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
            "sig_b": sig_rep,
        })

    exploded = sigged.map_batches(explode, batch_format="pyarrow")

    pair_schema = pa.schema([("id_from", pa.int64()), ("id_to", pa.int64()),
                             ("est_jaccard", pa.float64())])

    def bucket_pairs_partition(part: pd.DataFrame) -> pa.Table:
        """Coarse partition of many complete buckets: singleton buckets
        (the vast majority) drop in ONE vectorized filter; pair indices for
        every surviving bucket come from group-offset arithmetic — zero
        per-bucket Python."""
        sizes = part.groupby("band_key", sort=False)["band_key"].transform(
            "size")
        part = part[sizes > 1]
        if not len(part):
            return pair_schema.empty_table()
        grp = part.groupby("band_key", sort=False).ngroup().to_numpy()
        order = np.argsort(grp, kind="stable")
        part = part.iloc[order]
        grp = grp[order]
        ids = part[id_col].to_numpy(np.int64)
        M = _unpack_rows(part["sig_b"], np.int64)
        # triu pair indices per bucket, all buckets at once; enumeration
        # runs in bounded CHUNKs so a degenerate mega-bucket (e.g. 100k
        # boilerplate docs sharing a band) cannot allocate k²/2 indices in
        # one shot. NOTE the OUTPUT of a clique of near-identical docs is
        # inherently quadratic — run exact_dedup first on dup-heavy
        # corpora (pipelines/curate.py does exactly that).
        n_per = np.bincount(grp)
        starts = np.cumsum(n_per) - n_per
        n_pairs = n_per * (n_per - 1) // 2
        tot = int(n_pairs.sum())
        cum = np.cumsum(n_pairs)
        offs = cum - n_pairs
        CHUNK = 5_000_000
        frames = []
        for s0 in range(0, tot, CHUNK):
            idx = np.arange(s0, min(s0 + CHUNK, tot), dtype=np.int64)
            pgrp = np.searchsorted(cum, idx, side="right")
            w = idx - offs[pgrp]               # within-bucket pair index
            k = n_per[pgrp]
            # map linear index w -> (i, j) of the strict upper triangle
            i_ = (k - 2 - np.floor(
                np.sqrt(-8.0 * w + 4.0 * k * (k - 1) - 7) / 2.0 - 0.5)
            ).astype(np.int64)
            j_ = (w + i_ + 1 - k * (k - 1) // 2
                  + (k - i_) * ((k - i_) - 1) // 2).astype(np.int64)
            fi = starts[pgrp] + i_
            ti = starts[pgrp] + j_
            est = (M[fi] == M[ti]).mean(axis=1)
            keep = est >= jaccard_threshold
            a, b = ids[fi[keep]], ids[ti[keep]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            frames.append(pd.DataFrame({"id_from": lo, "id_to": hi,
                                        "est_jaccard": est[keep]}))
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, schema=pair_schema,
                                    preserve_index=False)

    from .grouped import grouped_map
    pairs = grouped_map(exploded, "band_key", bucket_pairs_partition)

    # same pair can fire in several bands -> keep one row per pair
    def dedup_pairs(df: pd.DataFrame) -> pa.Table:
        out = (df.groupby(["id_from", "id_to"], sort=False)["est_jaccard"]
               .min().reset_index())
        return pa.Table.from_pandas(out, schema=pair_schema,
                                    preserve_index=False)
    return grouped_map(pairs, ["id_from", "id_to"], dedup_pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(ds, *, text_col: str = "text",
                       batch_size: int | None = None,
                       input_partitions: int | str | None = "auto"):
    """+ ``simhash`` int64: 64-bit Charikar simhash over token hashes.

    Vectorized across the whole batch: all tokens of all docs are hashed in
    one ``fnv1a_64`` call, per-doc/per-bit ±1 sums come from 64 bincounts
    over the flattened token->doc index — no per-document Python loop.

    Compatibility note: bit ORDER differs from the pre-r2 implementation
    (which packed the bit vector reversed) — Hamming distances between
    same-version signatures are unchanged, but signatures persisted by the
    old code must not be compared against new ones."""
    ds = _widen(ds, input_partitions)

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


def simhash_dup_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, bands: int | None = None,
                      batch_size: int | None = None):
    """SimHash near-dup PAIRS (r1 verdict: signatures alone dedup nothing).

    64-bit signature -> band it into ``bands`` equal bit-chunks -> explode
    slim ``(id, chunk_key)`` rows -> same-chunk candidate pairs (salted
    equality self-link) -> re-join signatures and keep Hamming distance <=
    ``max_hamming`` (vectorized XOR + popcount). With ``bands >
    max_hamming`` (default ``max_hamming + 1``) the pigeonhole principle
    guarantees EXACT recall: <= max_hamming differing bits cannot touch
    every band, so some band matches exactly.
    Returns Dataset[(id_from, id_to, hamming:int64)], id_from < id_to.
    """
    if bands is None:
        bands = max_hamming + 1
    if 64 % bands:
        raise ValueError("bands must divide 64")
    bits = 64 // bands
    chunk_mask = np.uint64((1 << bits) - 1)
    sigged = simhash_signatures(ds, text_col=text_col,
                                batch_size=batch_size).materialize()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sig = df["simhash"].to_numpy(np.int64).astype(np.uint64)
        ids = df[id_col].to_numpy(np.int64)
        out_ids, out_keys = [], []
        for b in range(bands):
            chunk = (sig >> np.uint64(b * bits)) & chunk_mask
            # tag the band index into the key so chunks of different bands
            # never collide
            out_ids.append(ids)
            out_keys.append((chunk | (np.uint64(b + 1) << np.uint64(56)))
                            .astype(np.int64))
        return pd.DataFrame({id_col: np.concatenate(out_ids),
                             "chunk_key": np.concatenate(out_keys)})

    exploded = sigged.map_batches(explode, batch_format="pandas")
    pairs = _bucket_candidate_pairs(exploded, key_col="chunk_key",
                                    id_col=id_col, cap=200_000)

    # 64-bit signatures must cross the join as BINARY: the join's tagged
    # union null-pads the payload column, and pandas represents nullable
    # int64 as float64 — silently destroying the low ~11 bits
    def slim(t: pa.Table) -> pa.Table:
        sig = t["simhash"].to_numpy().astype(np.int64, copy=False)
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "sig_b": _pack_rows(sig.reshape(-1, 1))})
    joined = _join_payload(pairs, sigged.map_batches(
        slim, batch_format="pyarrow"), id_col=id_col, col="sig_b")

    from ..kernels.strdist import _popcount64

    def verify(t: pa.Table) -> pa.Table:
        a = _unpack_rows(t["sig_b_from"].combine_chunks(),
                         np.int64).reshape(-1)
        b = _unpack_rows(t["sig_b_to"].combine_chunks(),
                         np.int64).reshape(-1)
        ham = _popcount64(a.astype(np.uint64) ^ b.astype(np.uint64))
        keep = pa.array(ham <= max_hamming)
        return pa.table({
            "id_from": t["id_from"].filter(keep),
            "id_to": t["id_to"].filter(keep),
            "hamming": pa.array(ham[ham <= max_hamming], pa.int64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact within blocks / minhash prefilter)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        block_col: str | None = None, n: int = 3,
                        threshold: float = 0.5, unblocked_cap: int = 20_000,
                        prefilter: str | None = None,
                        num_perm: int = 128, bands: int = 32,
                        input_partitions: int | str | None = "auto"):
    """Exact character-n-gram Jaccard near-dup pairs.

    Three modes (r1 verdict weakness #3 — the old default ran one global
    O(n²) Python double loop):

      * ``block_col`` given — exact within blocks; pair intersections via
        ONE vectorized self-merge of the (doc, shingle) table per block
        (no Python pair loop), blocks co-partitioned with grouped_map.
      * ``block_col=None`` and the corpus fits ``unblocked_cap`` — exact
        global (single block, same vectorized kernel).
      * ``prefilter="minhash"`` — scale path for unblocked corpora:
        MinHash-LSH candidates (recall ~1 for jaccard >= threshold with
        the default 128-perm/32-band table), then EXACT verification by
        re-joining texts per candidate pair. Approximate recall,
        exact precision.

    Unblocked inputs above the cap without a prefilter raise — a silent
    global quadratic would be a driver-killer at scale.
    """
    from .grouped import grouped_map
    ds = _widen(ds, input_partitions)

    def _pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized exact block kernel: intersections from one self-merge
        of the (doc, shingle) table, unions from set sizes."""
        ids = g[id_col].to_numpy(np.int64)
        hashes, docs, sizes = [], [], np.zeros(len(ids), np.int64)
        for i, s in enumerate(g[text_col].fillna("")):
            h = _shingle_hashes(s, n)
            sizes[i] = len(h)
            if len(h):
                hashes.append(h.astype(np.int64))
                docs.append(np.full(len(h), i, np.int64))
        empty = pd.DataFrame({"id_from": pd.Series(dtype=np.int64),
                              "id_to": pd.Series(dtype=np.int64),
                              "jaccard": pd.Series(dtype=np.float64)})
        if not hashes:
            return empty
        sh = pd.DataFrame({"h": np.concatenate(hashes),
                           "d": np.concatenate(docs)})
        m = sh.merge(sh, on="h")
        m = m[m["d_x"] < m["d_y"]]
        if not len(m):
            return empty
        inter = (m.groupby(["d_x", "d_y"], sort=False).size()
                 .rename("inter").reset_index())
        i_, j_ = inter["d_x"].to_numpy(), inter["d_y"].to_numpy()
        iv = inter["inter"].to_numpy(np.float64)
        union = sizes[i_] + sizes[j_] - iv
        jac = np.where(union > 0, iv / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        a, b = ids[i_[keep]], ids[j_[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_from": lo, "id_to": hi,
                             "jaccard": jac[keep]})

    if block_col is not None:
        def per_partition(part: pd.DataFrame) -> pd.DataFrame:
            frames = [_pairs_in_block(g)
                      for _, g in part.groupby(block_col, sort=False)]
            return (pd.concat(frames, ignore_index=True) if frames
                    else _pairs_in_block(part.head(0)))
        return grouped_map(ds, block_col, per_partition)

    if prefilter == "minhash":
        texts = ds.materialize()
        cand = minhash_lsh_dedup(texts, text_col=text_col, id_col=id_col,
                                 num_perm=num_perm, bands=bands,
                                 shingle_k=n, jaccard_threshold=0.0)
        slim_pairs = cand.select_columns(["id_from", "id_to"])
        joined = _join_payload(slim_pairs, texts.select_columns(
            [id_col, text_col]), id_col=id_col, col=text_col)

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            jac = np.empty(len(df), np.float64)
            tf = df[f"{text_col}_from"].fillna("").to_numpy(object)
            tt = df[f"{text_col}_to"].fillna("").to_numpy(object)
            for i in range(len(df)):  # candidates only — not O(n²)
                sa = set(map(int, _shingle_hashes(tf[i], n)))
                sb = set(map(int, _shingle_hashes(tt[i], n)))
                jac[i] = (len(sa & sb) / len(sa | sb)
                          if (sa or sb) else 0.0)
            out = pd.DataFrame({
                "id_from": df["id_from"].astype(np.int64),
                "id_to": df["id_to"].astype(np.int64),
                "jaccard": jac})
            return out[out["jaccard"] >= threshold]
        return joined.map_batches(verify, batch_format="pandas")

    n_rows = ds.count()
    if n_rows > unblocked_cap:
        raise ValueError(
            f"unblocked exact n-gram Jaccard over {n_rows} rows is "
            f"O(n²); pass block_col=... or prefilter='minhash' "
            f"(cap: {unblocked_cap})")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_blk"] = 0
        return df
    tagged = ds.map_batches(tag, batch_format="pandas")
    return grouped_map(tagged, "_blk", lambda part: _pairs_in_block(part))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.95,
                        n_tables: int = 8, n_planes: int | str = "auto",
                        target_bucket: int = 256, seed: int = 12345,
                        exact_block: bool = False,
                        max_block_pairs: int = 200_000,
                        input_partitions: int | str | None = "auto"):
    """Embedding-cosine near-dup pairs via banded multi-table hyperplane
    LSH (r1 verdict weakness #4 — the old single 16-bucket table was
    O((N/16)²) with no cap).

      * ``n_tables`` independent hyperplane tables; each table's bucket key
        is the sign pattern of ``n_planes`` seeded projections. A pair is a
        CANDIDATE if it collides in ANY table: recall per table is
        (1 - θ/π)^n_planes with θ = arccos(threshold), so 8 tables at the
        default 0.95 threshold give ~1 - (1 - 0.9^k)^8 recall.
      * ``n_planes="auto"`` scales the table depth to the corpus:
        ceil(log2(N / target_bucket)) clamped to [4, 20] — expected bucket
        size stays ~``target_bucket`` regardless of corpus size.
      * only slim ``(id, table|bucket)`` rows shuffle; oversized buckets
        are salted by the blocking machinery (``max_block_pairs`` cap);
        vectors are re-joined per CANDIDATE pair and verified with exact
        cosine >= threshold.

    ``exact_block=True`` skips LSH and evaluates one global block —
    small-data oracle mode (exact, no LSH misses).
    Returns Dataset[(id_from, id_to, cosine)] with id_from < id_to.
    """
    if exact_block:
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

        def one_block(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_bucket"] = 0
            return df
        keyed = ds.map_batches(one_block, batch_format="pandas")
        return keyed.groupby("_bucket").map_groups(
            pairs, batch_format="pandas")

    ds = _widen(ds, input_partitions).materialize()
    if n_planes == "auto":
        n_rows = ds.count()
        n_planes = int(np.clip(np.ceil(np.log2(max(n_rows, 2)
                                               / target_bucket)), 4, 20))

    planes_ref = {"ref": None}  # (dim-lazy) broadcast of all tables' planes

    def key_fn(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        if planes_ref["ref"] is None:
            rng = np.random.default_rng(seed)
            planes_ref["ref"] = rng.normal(
                size=(n_tables, V.shape[1], n_planes))
        planes = planes_ref["ref"]
        ids = df[id_col].to_numpy(np.int64)
        out_ids, out_keys = [], []
        pow2 = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        for ti in range(n_tables):
            signs = (V @ planes[ti]) > 0
            key = signs.astype(np.int64) @ pow2
            out_ids.append(ids)
            # tag the table index into the key: tables never cross-collide
            out_keys.append(key | (np.int64(ti + 1) << np.int64(40)))
        return pd.DataFrame({id_col: np.concatenate(out_ids),
                             "_bucket": np.concatenate(out_keys)})

    exploded = ds.map_batches(key_fn, batch_format="pandas")
    cand = _bucket_candidate_pairs(exploded, key_col="_bucket",
                                   id_col=id_col, cap=max_block_pairs)

    def pack_vec(df: pd.DataFrame) -> pa.Table:
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        return pa.table({id_col: pa.array(df[id_col].to_numpy(np.int64)),
                         "vec_b": _pack_rows(V)})

    joined = _join_payload(cand,
                           ds.map_batches(pack_vec, batch_format="pandas"),
                           id_col=id_col, col="vec_b")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_from": pd.Series(dtype=np.int64),
                                 "id_to": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        A = _unpack_rows(df["vec_b_from"], np.float64)
        B = _unpack_rows(df["vec_b_to"], np.float64)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        cos = (A * B).sum(axis=1) / np.maximum(na * nb, 1e-300)
        out = pd.DataFrame({"id_from": df["id_from"].astype(np.int64),
                            "id_to": df["id_to"].astype(np.int64),
                            "cosine": cos})
        return out[out["cosine"] >= threshold]

    return joined.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# duplicated-segment removal (CCNet-style paragraph dedup, word windows)
# ---------------------------------------------------------------------------

def _batch_segments(texts, words_per_seg: int):
    """Fixed word-window segmentation of a batch of docs, vectorized.

    Splits on SINGLE spaces (``string_split(text, ' ')`` parity — runs of
    spaces yield empty words, '' yields one empty word) and groups
    consecutive words into non-overlapping ``words_per_seg``-word windows
    (last window may be short). Returns ``(doc_idx, seg_idx, segments)``
    with one entry per segment, doc-contiguous and seg-ordered; the only
    Python-level loop is one ``' '.join`` per SEGMENT."""
    s = pd.Series(texts, dtype=object)
    words = s.where(s.notna(), "").str.split(" ")
    lens = words.str.len().to_numpy(np.int64)          # '' -> [''] -> 1
    n = len(s)
    if not n:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object))
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    starts = np.cumsum(lens) - lens
    pos = np.arange(len(flat), dtype=np.int64) - starts[doc_of]
    seg_of = pos // words_per_seg
    key = doc_of << np.int64(32) | seg_of               # < 2^32 segs/doc
    cut = np.flatnonzero(np.diff(key)) + 1
    seg_starts = np.concatenate(([0], cut))
    seg_ends = np.concatenate((cut, [len(flat)]))
    segs = np.fromiter((" ".join(flat[a:b])
                        for a, b in zip(seg_starts, seg_ends)),
                       dtype=object, count=len(seg_starts))
    return doc_of[seg_starts], seg_of[seg_starts], segs


def segment_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  words_per_seg: int = 20, max_count: int = 2,
                  broadcast_threshold: int = 5_000_000,
                  input_partitions="auto", replace_text: bool = False):
    """Remove globally-duplicated SEGMENTS (fixed word windows) from every
    document — the paragraph-dedup step of web-corpus curation pipelines
    (CCNet / Gopher boilerplate removal), segment-level where
    ``exact_dedup`` is document-level.

    A segment whose global occurrence count exceeds ``max_count`` is
    dropped from every document that contains it; documents are rebuilt
    from their surviving segments in original order (never dropped — a
    fully-boilerplate doc comes back with ``text_clean=''``).

    Scale shape: pass 1 computes per-batch PARTIAL segment counts
    (value_counts inside ``map_batches``) so the single
    ``groupby(seg)`` shuffle moves one row per distinct segment per
    batch, not one per occurrence. Hot segments are by construction few;
    below ``broadcast_threshold`` of them the hot set is ``ray.put``
    ONCE and pass 2 re-segments and rebuilds each doc in a stateless
    map — doc rows never explode through a shuffle. Above it, the
    fallback explodes slim ``(id, seg_idx, seg)`` rows, left-joins the
    hot set distributed, and reassembles per doc via ``grouped_map``.
    Counts group on the segment TEXT (exact; no hash-collision risk) —
    partial aggregation keeps the shuffle proportional to the distinct-
    segment count, which boilerplate-heavy corpora compress heavily.

    Returns Dataset[(id_col, text_clean, n_seg, n_removed)]; with
    ``replace_text=True`` it instead returns the INPUT rows with
    ``text_col`` rewritten in place (+ ``n_seg``/``n_removed``) so the
    scrub composes inside wider pipelines (pipelines/curate.py) without
    a re-join — the broadcast path rewrites in the same map; the
    distributed fallback hash-joins ``text_clean`` back by id.
    """
    import ray

    ds = _widen(ds, input_partitions)

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        _, _, segs = _batch_segments(df[text_col].tolist(), words_per_seg)
        vc = pd.Series(segs).value_counts()
        return pd.DataFrame({"seg": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    # merge partials via grouped_map (vectorized per-partition groupby-sum)
    # — the segment key is HIGH-cardinality (~one per distinct word window)
    # and Ray's native groupby().aggregate() pays per-key Python there
    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("seg", sort=False)["n"].sum().reset_index()

    from .grouped import grouped_map
    counts = grouped_map(
        ds.map_batches(partial_counts, batch_format="pandas"),
        "seg", merge_counts)
    hot_ds = counts.map_batches(
        lambda df: df[df["n"] > max_count][["seg"]],
        batch_format="pandas")

    def rebuild_arrays(doc_of, seg_of, segs, hot_mask, n_docs):
        keep = ~hot_mask
        n_seg = np.bincount(doc_of, minlength=n_docs)
        n_removed = np.bincount(doc_of[hot_mask], minlength=n_docs)
        kd, ks = doc_of[keep], segs[keep]
        bounds = np.searchsorted(kd, np.arange(n_docs + 1))
        clean = np.fromiter(
            (" ".join(ks[bounds[i]:bounds[i + 1]]) for i in range(n_docs)),
            dtype=object, count=n_docs)
        return clean, n_seg.astype(np.int64), n_removed.astype(np.int64)

    if hot_ds.count() <= broadcast_threshold:
        hot_pd = hot_ds.to_pandas()
        ref = ray.put(set(hot_pd["seg"]))

        def rewrite(df: pd.DataFrame) -> pd.DataFrame:
            from .bcast import cached_get
            doc_of, seg_of, segs = _batch_segments(
                df[text_col].tolist(), words_per_seg)
            hot = cached_get(ref)
            hot_mask = pd.Series(segs).isin(hot).to_numpy()
            clean, n_seg, n_rm = rebuild_arrays(
                doc_of, seg_of, segs, hot_mask, len(df))
            if replace_text:
                out = df.copy()
                out[text_col] = clean
                out["n_seg"] = n_seg
                out["n_removed"] = n_rm
                return out
            return pd.DataFrame({id_col: df[id_col].to_numpy(),
                                 "text_clean": clean, "n_seg": n_seg,
                                 "n_removed": n_rm})
        return ds.map_batches(rewrite, batch_format="pandas")

    # distributed fallback: slim explode + hash left-join + per-doc
    # ordered reassembly (one co-partitioning shuffle by doc id)
    from .grouped import grouped_map
    from .join import hash_join

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        doc_of, seg_of, segs = _batch_segments(
            df[text_col].tolist(), words_per_seg)
        ids = df[id_col].to_numpy()[doc_of]
        return pd.DataFrame({id_col: ids, "seg_idx": seg_of, "seg": segs})

    ex = ds.map_batches(explode, batch_format="pandas")
    marked = hot_ds.map_batches(
        lambda df: df.assign(_hot=np.ones(len(df), np.int8)),
        batch_format="pandas")
    flagged = hash_join(ex, marked, on="seg", how="left")

    def reassemble(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([id_col, "seg_idx"], kind="stable")
        hot_mask = part["_hot"].notna().to_numpy()
        codes, uniq = pd.factorize(part[id_col], sort=False)
        clean, n_seg, n_rm = rebuild_arrays(
            codes, part["seg_idx"].to_numpy(), part["seg"].to_numpy(object),
            hot_mask, len(uniq))
        return pd.DataFrame({id_col: uniq, "text_clean": clean,
                             "n_seg": n_seg, "n_removed": n_rm})

    slim = grouped_map(flagged, id_col, reassemble)
    if not replace_text:
        return slim
    joined = hash_join(ds.drop_columns([text_col]), slim, on=id_col)
    return joined.map_batches(
        lambda df: df.rename(columns={"text_clean": text_col}),
        batch_format="pandas")


def _lfmis_keep(M: np.ndarray) -> np.ndarray:
    """Kept-mask of the greedy first-fit scan over rows 0..n-1, where
    ``M[j, i]`` (strict lower triangle) marks a conflict between row j and
    earlier row i: kept[j] ⇔ no conflict with any earlier KEPT row (the
    lexicographically-first maximal independent set).

    Vectorized ROUND elimination instead of a per-row Python loop: each
    round decides every row whose earlier conflicts are all settled —
    rows with a kept conflict are removed, rows with no undecided
    conflict are kept. The lowest undecided row always decides, so the
    loop terminates in ≤ n rounds; near-dup conflict graphs are star-like
    and settle in 2-3 vectorized bool passes."""
    n = M.shape[0]
    undecided = np.ones(n, bool)
    kept = np.zeros(n, bool)
    while undecided.any():
        kept_conf = (M & kept[None, :]).any(axis=1)
        und_conf = (M & undecided[None, :]).any(axis=1)
        newly_removed = undecided & kept_conf
        newly_kept = undecided & ~kept_conf & ~und_conf
        kept |= newly_kept
        undecided &= ~(newly_removed | newly_kept)
    return kept


def _greedy_semantic_scan(ids: np.ndarray, V: np.ndarray,
                          threshold: float, chunk: int = 2048):
    """Greedy earlier-id-kept scan over one cluster's id-sorted rows —
    fully vectorized (triangular-mask rounds, no per-row Python).
    Returns (removed_ids, rep_ids, cosines): one entry per removed row,
    rep = the EARLIEST kept row with cosine >= threshold. Memory is
    O(|kept| x d + chunk²), never cluster x cluster."""
    out_ids, out_kept, out_cos = [], [], []
    kept_rows: list = []                     # global indices of kept rows
    n = len(ids)
    for lo in range(0, n, chunk):
        C = V[lo:lo + chunk]
        m = len(C)
        if kept_rows:
            P = C @ V[kept_rows].T >= threshold
            prev_any = P.any(axis=1)
        else:
            P = np.zeros((m, 0), bool)
            prev_any = np.zeros(m, bool)
        # rows hit by an earlier-chunk kept row are removed outright —
        # every earlier-chunk row precedes every row of this chunk
        if prev_any.any():
            first = np.argmax(P[prev_any], axis=1)
            for j, f in zip(np.nonzero(prev_any)[0], first):
                g = kept_rows[int(f)]
                out_ids.append(ids[lo + j])
                out_kept.append(ids[g])
                out_cos.append(round(float(V[lo + j] @ V[g]), 6))
        # survivors resolve among themselves with the triangular scan
        surv = np.nonzero(~prev_any)[0]
        if len(surv):
            S = V[lo + surv] @ V[lo + surv].T
            M = (S >= threshold) & np.tri(len(surv), k=-1, dtype=bool)
            km = _lfmis_keep(M)
            hit = M & km[None, :]
            rem = np.nonzero(~km)[0]
            first = np.argmax(hit[rem], axis=1)
            for j, f in zip(rem, first):
                out_ids.append(ids[lo + surv[j]])
                out_kept.append(ids[lo + surv[f]])
                out_cos.append(round(float(S[j, f]), 6))
            kept_rows.extend(int(lo + s) for s in surv[km])
    return out_ids, out_kept, out_cos


def semantic_dedup(ds, *, vec_col: str = "embedding",
                   id_col: str = "doc_id", threshold: float = 0.95,
                   n_clusters: int | str = "auto",
                   sample_size: int = 2048, seed: int = 7,
                   input_partitions="auto",
                   max_cluster_rows: int | None = 200_000):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means-cluster the embedding space, then WITHIN each cluster drop
    every row whose cosine to an earlier-id kept row is >= ``threshold``
    (keep = lexicographic-min id, the engine-wide convention).

    Scale shape: centroids from a seeded driver sample
    (simsearch.kmeans_centroids, broadcast once); one cluster-key
    grouped_map shuffle of slim (id, vector) rows; inside a partition the
    greedy keep scan is chunk-vectorized (_greedy_semantic_scan) — memory
    O(cluster x d), never cluster x cluster, and zero per-row Python.

    Clusters larger than ``max_cluster_rows`` (hot-key protection — a
    cluster must fit one shuffle partition) are SPLIT deterministically
    into splitmix64(id)-salted sub-blocks: pass 1 greedy-dedups every
    sub-block in parallel, pass 2 re-dedups the union of the sub-blocks'
    kept rows per cluster (the bigram.py grid-salting shape). Exact-greedy
    parity note: every removed row was >= threshold to its named rep at
    removal time, and pass-1 reps that pass 2 removes are REMAPPED to
    pass-2 survivors, so ``kept_id`` always names a surviving doc; a row
    whose pass-1 rep is later removed stays removed (the documented,
    deterministic approximation — the exact global greedy is inherently
    sequential).

    Returns Dataset[(id_col, kept_id, cosine)] — one row per REMOVED
    document with its surviving representative (cosine = similarity to
    the row that triggered removal).
    """
    from .simsearch import assign_clusters, kmeans_centroids, _norm_rows
    from .grouped import grouped_map
    ds = _widen(ds, input_partitions)
    slim = ds.select_columns([id_col, vec_col])
    C = kmeans_centroids(slim, vec_col=vec_col, k=n_clusters,
                         sample_size=sample_size, seed=seed)
    tagged = assign_clusters(slim, C, vec_col=vec_col, out_col="_sc")

    def _dedup_groups(g: pd.DataFrame, key: str,
                      packed: bool = False) -> pd.DataFrame:
        out_ids, out_kept, out_cos = [], [], []
        for _, rows in g.groupby(key, sort=False):
            if len(rows) < 2:
                continue
            order = np.argsort(rows[id_col].to_numpy(), kind="stable")
            ids = rows[id_col].to_numpy()[order]
            if packed:          # already normalized at pack time
                V = _unpack_rows(rows["_vb"], np.float64)[order]
            else:
                V = _norm_rows(np.stack(
                    rows[vec_col].to_numpy())[order].astype(np.float64))
            i, k, c = _greedy_semantic_scan(ids, V, threshold)
            out_ids.extend(i)
            out_kept.extend(k)
            out_cos.extend(c)
        dt = g[id_col].dtype        # dtype-stable even for empty frames
        return pd.DataFrame({id_col: pd.Series(out_ids, dtype=dt),
                             "kept_id": pd.Series(out_kept, dtype=dt),
                             "cosine": np.asarray(out_cos, np.float64)})

    if max_cluster_rows is None:
        return grouped_map(tagged, "_sc",
                           lambda g: _dedup_groups(g, "_sc"))

    tagged = tagged.materialize()      # sizes pass + dedup pass share it
    # cluster sizes: per-batch partial counts -> tiny driver merge (≤ k
    # rows per block) — no shuffle, no tensor-column movement
    def partial_sizes(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["_sc"].value_counts()
        return pd.DataFrame({"_sc": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})
    parts = tagged.select_columns(["_sc"]).map_batches(
        partial_sizes, batch_format="pandas").to_pandas()
    sizes = parts.groupby("_sc")["n"].sum()
    hot = sizes[sizes > max_cluster_rows]
    n_sub = {int(sc): int(np.ceil(n / max_cluster_rows))
             for sc, n in hot.items()}
    if not n_sub:
        return grouped_map(tagged, "_sc",
                           lambda g: _dedup_groups(g, "_sc"))

    import ray
    sub_ref = ray.put(n_sub)

    def salt_pack(df: pd.DataFrame) -> pa.Table:
        """Slim shuffle payload: (id, _sc, _sck, packed normalized
        vector) — fixed-size binary crosses shuffles/joins safely and
        cheaply (Ray's tensor-extension blocks break on slicing)."""
        from .bcast import cached_get
        subs = cached_get(sub_ref)
        sc = df["_sc"].to_numpy(np.int64)
        m = np.array([subs.get(int(s), 1) for s in sc], np.int64)
        if pd.api.types.is_integer_dtype(df[id_col]):
            h = _splitmix64(df[id_col].to_numpy(np.int64).view(np.uint64))
        else:
            from .textstats import fnv1a_64
            h = _splitmix64(fnv1a_64(df[id_col].astype(str).tolist()))
        sck = sc * np.int64(1 << 20) + (h % m.astype(np.uint64))\
            .astype(np.int64)
        V = _norm_rows(np.stack(
            df[vec_col].to_numpy()).astype(np.float64))
        return pa.table({id_col: pa.array(df[id_col].to_numpy()),
                         "_sc": pa.array(sc),
                         "_sck": pa.array(sck),
                         "_vb": _pack_rows(V)})

    salted = tagged.map_batches(salt_pack,
                                batch_format="pandas").materialize()
    removed1 = grouped_map(
        salted, "_sck",
        lambda g: _dedup_groups(g, "_sck", packed=True)).materialize()

    # pass 2: the hot clusters' surviving rows, re-deduped whole. Each hot
    # cluster's survivors are ~1/threshold-density of its rows; if a
    # cluster's SURVIVORS still exceed the cap the partition carries them
    # (one level of salting; document over recurse).
    from .join import hash_join

    def only_hot(t: pa.Table) -> pa.Table:
        # arrow filter: an empty result keeps the _vb binary type (a
        # pandas round-trip would retype empty object columns as string)
        import pyarrow.compute as pc
        from .bcast import cached_get
        subs = cached_get(sub_ref)
        return t.filter(pc.is_in(
            t["_sc"], value_set=pa.array(list(subs), pa.int64())))
    hot_rows = salted.map_batches(only_hot, batch_format="pyarrow")
    kept1_hot = hash_join(hot_rows, removed1, on=id_col, how="anti")
    removed2 = grouped_map(
        kept1_hot, "_sc",
        lambda g: _dedup_groups(g, "_sc", packed=True)).materialize()

    # remap pass-1 reps that pass 2 removed -> their pass-2 survivor
    # (chain depth is exactly 2: pass-2 reps are final survivors)
    remap = removed2.map_batches(
        lambda t: pa.table({"kept_id": t[id_col],
                            "_rk": t["kept_id"]}),
        batch_format="pyarrow")
    j = hash_join(removed1, remap, on="kept_id", how="left")

    def fix_rep(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["kept_id"] = out["_rk"].where(out["_rk"].notna(),
                                          out["kept_id"])
        if pd.api.types.is_integer_dtype(out[id_col]):
            # left-join nulls floated the column; restore the id dtype
            out["kept_id"] = out["kept_id"].astype(out[id_col].dtype)
        return out[[id_col, "kept_id", "cosine"]]

    fixed1 = j.map_batches(fix_rep, batch_format="pandas")
    return fixed1.union(removed2.select_columns(
        [id_col, "kept_id", "cosine"]))


# ---------------------------------------------------------------------------
# repeated-span detection (exact-substring dedup, Lee et al. ACL 2022
# "Deduplicating Training Data Makes Language Models Better") and
# within-document line dedup
# ---------------------------------------------------------------------------

def _batch_windows(texts, win: int, stride: int = 1):
    """Sliding ``win``-word windows (stride ``stride``) over a batch of
    docs, vectorized: window texts are built by ``win-1`` elementwise
    object-array concatenations over the flat word array — no per-window
    Python ``join``. Splits on SINGLE spaces (``string_split(text, ' ')``
    parity). Returns ``(doc_idx, word_start, windows)`` with one entry per
    window; ``word_start`` is the 0-based word index of the window's first
    word inside its doc. Docs shorter than ``win`` words emit nothing."""
    s = pd.Series(texts, dtype=object)
    words = s.where(s.notna(), "").str.split(" ")
    lens = words.str.len().to_numpy(np.int64)
    n = len(s)
    if not n or int(lens.sum()) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object))
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    doc_starts = np.cumsum(lens) - lens
    pos = np.arange(len(flat), dtype=np.int64) - doc_starts[doc_of]
    # a window starting at flat index p is valid iff its last word is
    # still inside the same doc and its doc-local position hits the stride
    last = pos + win - 1
    valid = (last < lens[doc_of]) & (pos % stride == 0)
    starts = np.flatnonzero(valid)
    if not len(starts):
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, object))
    out = flat[starts]
    for k in range(1, win):
        out = out + " "
        out = out + flat[starts + k]
    return doc_of[starts], pos[starts], out


def _merge_spans(doc_of, starts, win: int):
    """Merge overlapping-or-touching equal-length word intervals
    ``[start, start+win)`` into islands, vectorized. Inputs must be sorted
    by (doc, start) — ``_batch_windows`` emits them that way. Returns
    ``(island_doc, span_start, span_end, n_windows)`` with INCLUSIVE
    0-based word spans."""
    if not len(starts):
        z = np.empty(0, np.int64)
        return z, z, z, z
    new = np.ones(len(starts), bool)
    new[1:] = (doc_of[1:] != doc_of[:-1]) | (starts[1:] - starts[:-1] > win)
    gid = np.cumsum(new) - 1
    first = np.flatnonzero(new)
    n_win = np.bincount(gid).astype(np.int64)
    last = first + n_win - 1
    return (doc_of[first], starts[first],
            starts[last] + np.int64(win - 1), n_win)


def dup_spans(ds, *, text_col: str = "text", id_col: str = "doc_id",
              win: int = 8, stride: int = 1, min_docs: int = 2,
              broadcast_threshold: int = 5_000_000,
              input_partitions="auto"):
    """Cross-document repeated-SPAN detection: every sliding ``win``-word
    window whose exact text occurs in >= ``min_docs`` DISTINCT documents
    is flagged, and per document the flagged windows are merged into
    maximal word spans — the hash-based stand-in for suffix-array exact
    substring dedup (Lee et al. 2022); downstream removal is a stateless
    map over the span table. Unlike ``segment_dedup`` (tumbling windows,
    global occurrence count) this slides stride-``stride`` and counts
    DISTINCT docs, so a span repeated 100x inside one doc does not flag.

    Scale shape: pass 1 dedupes windows WITHIN each batch's docs before
    counting, so the single ``groupby(window)`` shuffle moves one row per
    (distinct window, batch) — the per-position explosion never crosses
    the wire. ``stride > 1`` subsamples positions (recall/cost dial: a
    duplicated run longer than ``win + stride - 1`` words is still hit).
    Below ``broadcast_threshold`` duplicated windows the hot set ships
    once via ``ray.put`` and pass 2 is a stateless shuffle-free map;
    above it, a slim ``(id, start, window)`` explode + hash join +
    per-doc ``grouped_map`` island merge takes over.

    Returns Dataset[(id_col, span_start, span_end, n_windows)] with
    1-based INCLUSIVE word spans (SQL list-indexing convention).
    """
    import ray

    ds = _widen(ds, input_partitions)

    def partial_docs(df: pd.DataFrame) -> pd.DataFrame:
        doc_of, _, wins = _batch_windows(df[text_col].tolist(), win, stride)
        if not len(wins):
            return pd.DataFrame({"w": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        tab = pd.DataFrame({"d": doc_of, "w": wins})
        uniq = tab.drop_duplicates()          # <=1 count per (doc, window)
        vc = uniq["w"].value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    from .grouped import grouped_map

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("w", sort=False)["n"].sum().reset_index()
        return tot[tot["n"] >= min_docs][["w"]]

    hot_ds = grouped_map(
        ds.map_batches(partial_docs, batch_format="pandas"), "w", combine)

    if hot_ds.count() <= broadcast_threshold:
        hot_pd = hot_ds.to_pandas()
        # an all-empty Dataset drops its pandas column names
        ref = ray.put(set(hot_pd["w"]) if "w" in hot_pd.columns else set())

        def detect(df: pd.DataFrame) -> pd.DataFrame:
            from .bcast import cached_get
            doc_of, pos, wins = _batch_windows(
                df[text_col].tolist(), win, stride)
            hot = cached_get(ref)
            m = pd.Series(wins).isin(hot).to_numpy() if len(wins) else \
                np.empty(0, bool)
            d, s0, s1, nw = _merge_spans(doc_of[m], pos[m], win)
            return pd.DataFrame({
                id_col: df[id_col].to_numpy()[d],
                "span_start": s0 + np.int64(1),
                "span_end": s1 + np.int64(1),
                "n_windows": nw})
        return ds.map_batches(detect, batch_format="pandas")

    # distributed fallback: slim explode + hash join + per-doc island merge
    from .join import hash_join

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        doc_of, pos, wins = _batch_windows(df[text_col].tolist(), win,
                                           stride)
        return pd.DataFrame({id_col: df[id_col].to_numpy()[doc_of],
                             "pos": pos, "w": wins})

    ex = ds.map_batches(explode, batch_format="pandas")
    marked = hot_ds.map_batches(
        lambda df: df.assign(_hot=np.ones(len(df), np.int8)),
        batch_format="pandas")
    flagged = hash_join(ex, marked, on="w", how="inner")

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([id_col, "pos"], kind="stable")
        codes, uniq = pd.factorize(part[id_col], sort=False)
        d, s0, s1, nw = _merge_spans(codes.astype(np.int64),
                                     part["pos"].to_numpy(np.int64), win)
        return pd.DataFrame({id_col: np.asarray(uniq)[d],
                             "span_start": s0 + np.int64(1),
                             "span_end": s1 + np.int64(1),
                             "n_windows": nw})

    return grouped_map(flagged, id_col, merge_part)


def dedup_lines(ds, *, text_col: str = "text", id_col: str = "doc_id",
                sep: str = "\n"):
    """WITHIN-document duplicate-line removal: split ``text_col`` on
    ``sep``, drop every line that already appeared earlier in the SAME
    document (exact match, first occurrence kept), rejoin in original
    order — the per-doc half of boilerplate scrubbing (``segment_dedup``
    handles the cross-doc half). ``sep`` is generic: newline for real web
    corpora, any token for structured text.

    Entirely shuffle-free: one stateless vectorized ``map_batches`` (the
    keep-first mask is a per-(doc, line) ``DataFrame.duplicated`` in C).

    Returns Dataset[(id_col, text_clean, n_lines, n_removed)].
    """
    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].where(df[text_col].notna(), "")
        parts = s.str.split(sep)
        lens = parts.str.len().to_numpy(np.int64)
        n = len(df)
        if not n or int(lens.sum()) == 0:
            return pd.DataFrame({id_col: df[id_col],
                                 "text_clean": pd.Series(dtype=object),
                                 "n_lines": pd.Series(dtype=np.int64),
                                 "n_removed": pd.Series(dtype=np.int64)})
        flat = np.concatenate([np.asarray(p, dtype=object) for p in parts])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        dup = pd.DataFrame({"d": doc_of, "l": flat}).duplicated(
            ["d", "l"]).to_numpy()
        keep = ~dup
        kd, kl = doc_of[keep], flat[keep]
        bounds = np.searchsorted(kd, np.arange(n + 1))
        clean = np.fromiter(
            (sep.join(kl[bounds[i]:bounds[i + 1]]) for i in range(n)),
            dtype=object, count=n)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "text_clean": clean,
            "n_lines": np.bincount(doc_of, minlength=n).astype(np.int64),
            "n_removed": np.bincount(doc_of[dup],
                                     minlength=n).astype(np.int64)})

    return ds.map_batches(scrub, batch_format="pandas")


def remove_spans(docs, spans, *, text_col: str = "text",
                 id_col: str = "doc_id", start_col: str = "span_start",
                 end_col: str = "span_end",
                 num_partitions: int | None = None):
    """Scrub word spans out of documents: given a span table (1-based
    INCLUSIVE word intervals per doc — ``dup_spans`` output, or any
    curated/edited span set), drop every covered word and rebuild each doc
    in order. ``dup_spans`` + ``remove_spans`` together are the
    detect-then-remove pair of exact-substring dedup (Lee et al. 2022).

    Distributed shape: tagged union of docs and spans, ONE co-partitioning
    shuffle on ``id_col``, then a fully vectorized per-partition scrub
    (span coverage via one diff-array cumsum over the partition's flat
    word array — overlapping spans handled for free). Docs with no spans
    pass through untouched; spans pointing past a doc's end are clipped;
    spans for unknown ids are ignored.

    Returns Dataset[(id_col, text_clean, n_words, n_removed)].
    """
    import pyarrow as pa

    from .grouped import grouped_map

    id_type = dict(zip(docs.schema().names, docs.schema().types))[id_col]
    schema = pa.schema([(id_col, id_type), (text_col, pa.string()),
                        (start_col, pa.int64()), (end_col, pa.int64()),
                        ("_side", pa.int8())])

    def tag_docs(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({id_col: t[id_col].cast(id_type),
                         text_col: t[text_col],
                         start_col: pa.nulls(n, pa.int64()),
                         end_col: pa.nulls(n, pa.int64()),
                         "_side": pa.array(np.zeros(n, np.int8))},
                        schema=schema)

    def tag_spans(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({id_col: t[id_col].cast(id_type),
                         text_col: pa.nulls(n, pa.string()),
                         start_col: t[start_col].cast(pa.int64()),
                         end_col: t[end_col].cast(pa.int64()),
                         "_side": pa.array(np.ones(n, np.int8))},
                        schema=schema)

    tagged = (docs.select_columns([id_col, text_col])
              .map_batches(tag_docs, batch_format="pyarrow")
              .union(spans.select_columns([id_col, start_col, end_col])
                     .map_batches(tag_spans, batch_format="pyarrow")))

    def scrub_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["_side"] == 0]
        sp = df[df["_side"] == 1]
        n = len(d)
        if not n:
            return pd.DataFrame({id_col: pd.Series(dtype=object),
                                 "text_clean": pd.Series(dtype=object),
                                 "n_words": pd.Series(dtype=np.int64),
                                 "n_removed": pd.Series(dtype=np.int64)})
        s = d[text_col].where(d[text_col].notna(), "")
        parts = s.str.split(" ")
        lens = parts.str.len().to_numpy(np.int64)
        flat = np.concatenate([np.asarray(p, dtype=object) for p in parts])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        doc_starts = np.cumsum(lens) - lens
        covered = np.zeros(len(flat), bool)
        if len(sp):
            di = pd.Index(d[id_col]).get_indexer(sp[id_col])
            ok = di >= 0                       # spans for unknown ids drop
            di = di[ok]
            st = np.maximum(sp[start_col].to_numpy(np.int64)[ok] - 1, 0)
            en = sp[end_col].to_numpy(np.int64)[ok]     # ->exclusive
            st = doc_starts[di] + np.minimum(st, lens[di])
            en = doc_starts[di] + np.minimum(np.maximum(en, 0), lens[di])
            diff = np.zeros(len(flat) + 1, np.int64)
            np.add.at(diff, st, 1)
            np.add.at(diff, en, -1)
            covered = np.cumsum(diff[:-1]) > 0
        keep = ~covered
        kd, kw = doc_of[keep], flat[keep]
        bounds = np.searchsorted(kd, np.arange(n + 1))
        clean = np.fromiter(
            (" ".join(kw[bounds[i]:bounds[i + 1]]) for i in range(n)),
            dtype=object, count=n)
        return pd.DataFrame({
            id_col: d[id_col].to_numpy(),
            "text_clean": clean,
            "n_words": lens,
            "n_removed": np.bincount(doc_of[covered],
                                     minlength=n).astype(np.int64)})

    return grouped_map(tagged, id_col, scrub_part,
                       num_partitions=num_partitions)


def incremental_dedup(new_ds, frozen_ds, *, key_col: str = "text",
                      id_col: str = "doc_id"):
    """Dedup a NEW ingest batch against a FROZEN corpus (the production
    shape of exact dedup: the crawled increment arrives daily, the
    already-kept corpus never re-shuffles). Drops new rows whose key
    already exists in the frozen corpus (distributed ANTI join — the
    frozen side ships one slim key row per distinct key per batch, the
    hash_join probe-side dedup), then keeps the min-``id_col`` row per
    key WITHIN the increment. Output: the surviving new rows, full
    columns.

    Shuffle currency is ``key_col`` itself — for long documents pass a
    precomputed 64-bit content-hash column as ``key_col`` (the
    ``exact_dedup`` convention) so the exchange moves 8-byte keys, not
    texts."""
    from .grouped import grouped_map
    from .join import hash_join

    fresh = hash_join(new_ds, frozen_ds.select_columns([key_col]),
                      on=key_col, how="anti")

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.groupby(key_col, sort=False)[id_col].idxmin()
        return df.loc[idx]

    return grouped_map(fresh, key_col, keep_first)


def ngram_containment_pairs(ds, *, text_col: str = "text",
                            id_col: str = "doc_id",
                            block_col: str | None = None, n: int = 5,
                            threshold: float = 0.8,
                            unblocked_cap: int = 20_000,
                            input_partitions: int | str | None = "auto"):
    """DIRECTIONAL n-gram containment pairs: ``C(A -> B) = |grams(A) ∩
    grams(B)| / |grams(A)|`` — the asymmetric near-dup signal Jaccard
    misses (a short doc quoted wholesale inside a long one has high
    containment but low Jaccard; cf. the subset/superset discussion in
    Lee et al. 2022 and Broder's resemblance-vs-containment distinction,
    both public). Emits ORDERED rows (id_from = the contained doc,
    id_to = the container, containment) for distinct-doc pairs at
    ``threshold``; both directions can fire independently.

    Same scale contract as :func:`ngram_jaccard_pairs`: exact within
    ``block_col`` blocks co-partitioned via grouped_map (ONE shuffle,
    intersections from one vectorized self-merge of the (doc, shingle)
    table per block — no Python pair loop); unblocked inputs above
    ``unblocked_cap`` raise rather than run a silent global quadratic."""
    from .grouped import grouped_map
    ds = _widen(ds, input_partitions)

    def _pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(np.int64)
        hashes, docs, sizes = [], [], np.zeros(len(ids), np.int64)
        for i, s in enumerate(g[text_col].fillna("")):
            h = _shingle_hashes(s, n)      # already DISTINCT (np.unique)
            sizes[i] = len(h)
            if len(h):
                hashes.append(h.astype(np.int64))
                docs.append(np.full(len(h), i, np.int64))
        empty = pd.DataFrame({"id_from": pd.Series(dtype=np.int64),
                              "id_to": pd.Series(dtype=np.int64),
                              "containment": pd.Series(dtype=np.float64)})
        if not hashes:
            return empty
        sh = pd.DataFrame({"h": np.concatenate(hashes),
                           "d": np.concatenate(docs)})
        m = sh.merge(sh, on="h")
        m = m[m["d_x"] != m["d_y"]]                   # ordered, no self
        if not len(m):
            return empty
        inter = (m.groupby(["d_x", "d_y"], sort=False).size()
                 .rename("inter").reset_index())
        i_, j_ = inter["d_x"].to_numpy(), inter["d_y"].to_numpy()
        iv = inter["inter"].to_numpy(np.float64)
        cont = iv / np.maximum(sizes[i_], 1)          # |from| denominator
        keep = cont >= threshold
        return pd.DataFrame({"id_from": ids[i_[keep]],
                             "id_to": ids[j_[keep]],
                             "containment": cont[keep]})

    if block_col is not None:
        def per_partition(part: pd.DataFrame) -> pd.DataFrame:
            frames = [_pairs_in_block(g)
                      for _, g in part.groupby(block_col, sort=False)]
            return (pd.concat(frames, ignore_index=True) if frames
                    else _pairs_in_block(part.head(0)))
        return grouped_map(ds, block_col, per_partition)

    n_rows = ds.count()
    if n_rows > unblocked_cap:
        raise ValueError(
            f"unblocked exact n-gram containment over {n_rows} rows is "
            f"O(n²); pass block_col=... (cap: {unblocked_cap})")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_blk"] = 0
        return df
    tagged = ds.map_batches(tag, batch_format="pandas")
    return grouped_map(tagged, "_blk", lambda part: _pairs_in_block(part))


def keep_best_per_family(docs, pairs, *, id_col: str = "doc_id",
                         quality_col: str = "n_chars",
                         num_partitions: int | None = None):
    """Quality-aware near-dup SURVIVORSHIP: given a doc table and a
    near-dup pair table (from any detector in this module), close the
    pairs into families (connected components) and keep the HIGHEST-
    ``quality_col`` doc per family (ties -> min id) — the RefinedWeb-style
    'keep the best copy' policy, vs. the min-id policy of
    ``exact_dedup``. Docs in no pair are their own singleton family and
    keep themselves.

    Returns Dataset[(id_col, keep_id_col)] — one row per input doc;
    survivors are the rows where the two columns agree.

    Scale shape: components close on the slim pair table (driver
    union-find under the 5M-edge gate, distributed hash-min above);
    family attach and the winner join are hash joins on the family key
    (never a broadcast of the family table — #families ~ #docs); the
    per-family argmax is one ``top_k_per_group(k=1)`` co-partition
    shuffle."""
    import pyarrow as pa

    from .cluster import connected_components
    from .join import hash_join
    from .sampling import top_k_per_group

    comps = connected_components(pairs, id_from="id_from", id_to="id_to",
                                 num_partitions=num_partitions)

    def to_int(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["node"].cast(pa.int64()),
                         "_fam": t["entity_id"]})

    fam = comps.map_batches(to_int, batch_format="pyarrow")
    slim = docs.select_columns([id_col, quality_col])
    joined = hash_join(slim, fam, on=id_col, how="left",
                       num_partitions=num_partitions)

    def fill_singletons(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        f = pc.coalesce(t["_fam"], pc.cast(t[id_col], pa.string()))
        return t.set_column(t.schema.get_field_index("_fam"), "_fam", f)

    joined = joined.map_batches(fill_singletons, batch_format="pyarrow")
    best = top_k_per_group(joined, "_fam", quality_col, id_col, k=1,
                           ascending=False,
                           num_partitions=num_partitions)

    def keeper(t: pa.Table) -> pa.Table:
        return pa.table({"_fam": t["_fam"],
                         f"keep_{id_col}": t[id_col]})

    winners = best.map_batches(keeper, batch_format="pyarrow")
    out = hash_join(joined.select_columns([id_col, "_fam"]), winners,
                    on="_fam", how="inner",
                    num_partitions=num_partitions)
    return out.select_columns([id_col, f"keep_{id_col}"])


def incremental_minhash_dedup(new_ds, frozen_ds, *,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              num_perm: int = 64, bands: int = 16,
                              shingle_k: int = 5,
                              jaccard_threshold: float = 0.5):
    """NEAR-dup dedup of a NEW ingest batch against a FROZEN corpus — the
    production sibling of :func:`incremental_dedup` for the MinHash-LSH
    family: a new doc is dropped when it near-dups ANY frozen doc, or a
    smaller-id doc within its own increment (the deterministic pairwise
    keep-first policy of LSH dedup). The frozen corpus is never modified
    and never re-deduped against itself. Ids must be globally unique
    across both sides. Output: the surviving new rows, full columns.

    Scale shape: one LSH pair detection over the tagged union (slim
    (id, band_key) shuffle + signature re-join above the corpus
    threshold — :func:`minhash_lsh_dedup`'s layouts apply unchanged),
    two slim hash joins attach each pair end's side bit, and the drop
    set anti-joins the increment. Nothing ever broadcasts the frozen
    corpus."""
    from .grouped import typed_or_empty
    from .join import hash_join

    slim_new = new_ds.select_columns([id_col, text_col])
    slim_frz = frozen_ds.select_columns([id_col, text_col])
    union = slim_new.union(slim_frz)
    pairs = minhash_lsh_dedup(union, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, bands=bands,
                              shingle_k=shingle_k,
                              jaccard_threshold=jaccard_threshold)

    def side_rows(is_new: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({id_col: df[id_col].astype(np.int64),
                                 "_new": np.int8(is_new)})
        return fn

    sides = (slim_new.map_batches(side_rows(1), batch_format="pandas")
             .union(slim_frz.map_batches(side_rows(0),
                                         batch_format="pandas")))

    p = hash_join(pairs.select_columns(["id_from", "id_to"]),
                  sides.map_batches(
                      lambda d: d.rename(columns={id_col: "id_to",
                                                  "_new": "_new_to"}),
                      batch_format="pandas"),
                  on="id_to", how="inner")
    p = hash_join(p,
                  sides.map_batches(
                      lambda d: d.rename(columns={id_col: "id_from",
                                                  "_new": "_new_from"}),
                      batch_format="pandas"),
                  on="id_from", how="inner")

    def dropped_ids(df: pd.DataFrame) -> pd.DataFrame:
        # id_from < id_to by construction: the larger end of a
        # new-vs-anything pair drops; the smaller end drops only when its
        # partner is frozen
        out = []
        nt = df["_new_to"].to_numpy() == 1
        nf = df["_new_from"].to_numpy() == 1
        ft = df["_new_to"].to_numpy() == 0
        out.append(df.loc[nt, "id_to"])
        out.append(df.loc[nf & ft, "id_from"])
        ids = pd.concat(out, ignore_index=True).drop_duplicates()
        return typed_or_empty(pd.DataFrame({id_col:
                                            ids.astype(np.int64)}))

    dropped = p.map_batches(dropped_ids, batch_format="pandas")
    return hash_join(new_ds, dropped, on=id_col, how="anti")
