"""String-distance kernels, vectorized in numpy over the *pair* axis.

From-scratch reimplementations (no stringdist / rapidfuzz / jellyfish in the
environment) of every kernel the reference uses:

  - Jaro / Jaro-Winkler similarity & distance
    (stringdist ``method='jw'`` with prefix weight ``p``; reference uses
    p=0.1 in ``distcalc`` [/root/reference/R/distances.R:32] and p=0 (plain
    Jaro) in the vignette feature calls)
  - OSA (restricted Damerau-Levenshtein) and plain Levenshtein
    (``minitialsdist_osa`` feature, /root/reference/data_raw/pretrained.R:213)
  - American Soundex code + 0/1 soundex distance
    (stringdist ``method='soundex'``, /root/reference/R/distances.R:35-39 and
    the ``phonetic()`` equality blocking, /root/reference/R/candidates.R:113-116)
  - character-bigram cosine similarity with '#' boundary markers
    (qlcMatrix::sim.strings, /root/reference/R/candidates.R:82-96)
  - token Jaccard (graft feature over role/tool signatures)

Vectorization strategy: strings are decoded once per batch into a dense
``(n_pairs, max_len)`` uint32 codepoint matrix (a zero-cost numpy view of the
fixed-width unicode array), and the DP / matching loops run over *character
positions* (bounded, ~tens) with every operation vectorized over the pair
axis. No Python loop over pairs in any hot kernel.

Null semantics match stringdist: a null on either side yields NaN (SURVEY
§1.2). Empty-vs-empty compares equal (distance 0 / similarity 1).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "jaro_sim",
    "jaro_winkler_sim",
    "jw_dist",
    "osa_dist",
    "osa_sim",
    "levenshtein_dist",
    "soundex",
    "soundex_dist",
    "bigram_cosine_pairs",
    "bigram_cosine_matrix",
    "token_jaccard",
    "mask_jaccard",
]


def _as_object_array(strings) -> np.ndarray:
    """Accept list / numpy array / pyarrow Array (with nulls) -> object ndarray."""
    if hasattr(strings, "to_pylist"):  # pyarrow Array / ChunkedArray
        strings = strings.to_pylist()
    arr = np.asarray(strings, dtype=object)
    if arr.ndim == 0:
        arr = arr.reshape(1)
    return arr


def _encode_arrow_ascii(arr, max_len: int | None):
    """Zero-object fast path: pyarrow string array -> (codes, lengths,
    valid) straight from the UTF-8 data buffer (bytes ARE codepoints when
    the referenced range is pure ASCII). Returns None when the input
    isn't an arrow string array or contains non-ASCII — caller falls back
    to the object-array path. Skips ~8 Python-string materializations per
    value per feature pass at 21M pairs."""
    try:
        import pyarrow as _pa
    except Exception:                                  # pragma: no cover
        return None
    if isinstance(arr, _pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, _pa.Array):
        return None
    if _pa.types.is_string(arr.type):
        off_dtype = np.int32
    elif _pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        return None
    n = len(arr)
    bufs = arr.buffers()                               # [validity, offsets, data]
    if bufs[1] is None:
        return None
    off_all = np.frombuffer(bufs[1], dtype=off_dtype)
    off = off_all[arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    valid = np.ones(n, dtype=bool)
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False).astype(bool)
    lens = off[1:] - off[:-1]
    lens = np.where(valid, lens, 0)
    lo = int(off.min()) if n else 0
    hi = int(off.max()) if n else 0
    if hi > lo and int(data[lo:hi].max()) >= 128:
        return None                                     # non-ASCII: fall back
    L = int(lens.max()) if n else 0
    if max_len is not None:
        L = min(L, max_len)
    take = np.minimum(lens, L)
    codes = np.zeros((n, L), dtype=np.uint32)
    if L and take.sum():
        rows = np.repeat(np.arange(n, dtype=np.int64), take)
        starts = np.cumsum(take) - take
        within = np.arange(int(take.sum()), dtype=np.int64) - starts[rows]
        codes[rows, within] = data[off[:-1][rows] + within]
    return codes, take.astype(np.int64), valid


def encode(strings, max_len: int | None = None):
    """Decode strings to a codepoint matrix.

    Returns ``(codes, lengths, valid)``:
      codes:   (n, L) uint32, 0-padded codepoints
      lengths: (n,) int64 string lengths (after optional truncation)
      valid:   (n,) bool, False where the input was None/NaN

    pyarrow string arrays take a buffer-level fast path when pure ASCII
    (no per-value Python strings); anything else decodes via the object
    path below.
    """
    fast = _encode_arrow_ascii(strings, max_len)
    if fast is not None:
        return fast
    arr = _as_object_array(strings)
    n = len(arr)
    valid = np.empty(n, dtype=bool)
    filled = np.empty(n, dtype=object)
    for i in range(n):  # null scan + fill only; O(n), no per-char work
        s = arr[i]
        ok = isinstance(s, str)
        valid[i] = ok
        filled[i] = s if ok else ""
    u = np.array(filled.tolist(), dtype="U")  # fixed-width unicode, one copy
    L = u.dtype.itemsize // 4
    if L == 0:
        codes = np.zeros((n, 0), dtype=np.uint32)
    else:
        codes = u.view(np.uint32).reshape(n, L)
    if max_len is not None and codes.shape[1] > max_len:
        codes = np.ascontiguousarray(codes[:, :max_len])
    lengths = (codes != 0).sum(axis=1).astype(np.int64)
    return codes, lengths, valid


# ---------------------------------------------------------------------------
# Jaro / Jaro-Winkler
# ---------------------------------------------------------------------------

def _jaro_core(A, la, B, lb, int_transpositions: bool = False):
    """Jaro similarity from codepoint matrices; vectorized over rows.

    ``int_transpositions=False`` counts half-transpositions as 0.5
    (stringdist parity); ``True`` floors them to integers (rapidfuzz /
    DuckDB ``jaro_winkler_similarity`` parity — they differ whenever the
    matched subsequences form an odd-length mismatch cycle).
    """
    n, L1 = A.shape
    L2 = B.shape[1]
    out = np.zeros(n, dtype=np.float64)
    both_empty = (la == 0) & (lb == 0)
    out[both_empty] = 1.0
    if L1 == 0 or L2 == 0:
        return out

    md = np.maximum(np.maximum(la, lb) // 2 - 1, 0)  # match window half-width
    a_matched = np.zeros((n, L1), dtype=bool)
    b_matched = np.zeros((n, L2), dtype=bool)
    for i in range(L1):
        ai = A[:, i]
        active = (i < la) & (ai != 0)
        if not active.any():
            continue
        found = np.zeros(n, dtype=bool)
        lo = i - md
        hi = i + md
        for j in range(L2):
            cand = (
                active
                & ~found
                & (j < lb)
                & (j >= lo)
                & (j <= hi)
                & ~b_matched[:, j]
                & (B[:, j] == ai)
            )
            if cand.any():
                b_matched[:, j] |= cand
                found |= cand
        a_matched[:, i] = found

    m = a_matched.sum(axis=1).astype(np.float64)
    has = m > 0
    if has.any():
        # gather matched chars in order (scatter by cumulative match rank)
        maxm = int(m.max())
        ka = np.cumsum(a_matched, axis=1) - 1
        kb = np.cumsum(b_matched, axis=1) - 1
        Sa = np.zeros((n, maxm), dtype=np.uint32)
        Sb = np.zeros((n, maxm), dtype=np.uint32)
        r, c = np.nonzero(a_matched)
        Sa[r, ka[r, c]] = A[r, c]
        r, c = np.nonzero(b_matched)
        Sb[r, kb[r, c]] = B[r, c]
        t = ((Sa != Sb) & (Sa != 0) & (Sb != 0)).sum(axis=1)
        t = np.floor(t / 2.0) if int_transpositions else t / 2.0
        la_f = np.where(la == 0, 1, la).astype(np.float64)
        lb_f = np.where(lb == 0, 1, lb).astype(np.float64)
        jaro = (m / la_f + m / lb_f + (m - t) / np.where(has, m, 1.0)) / 3.0
        out = np.where(has, jaro, out)
    return out


def _common_prefix_len(A, la, B, lb, cap=4):
    n = A.shape[0]
    L = min(A.shape[1], B.shape[1], cap)
    if L == 0:
        return np.zeros(n, dtype=np.int64)
    eq = (A[:, :L] == B[:, :L]) & (A[:, :L] != 0)
    # prefix run: cumulative AND
    run = np.cumprod(eq, axis=1).astype(bool)
    return run.sum(axis=1).astype(np.int64)


def _rows_equal(A, la, B, lb) -> np.ndarray:
    """Rowwise exact string equality from codepoint matrices — O(n·L) fast
    path so the O(n·L²) DP only runs on unequal pairs (near-dup workloads
    compare MANY identical strings)."""
    if la.shape != lb.shape:
        return np.zeros(len(la), dtype=bool)
    eq = la == lb
    L = min(A.shape[1], B.shape[1])
    if A.shape[1] != B.shape[1]:
        # lengths equal but padding differs; compare the common width
        eq &= (A[:, :L] == B[:, :L]).all(axis=1)
        return eq
    eq &= (A == B).all(axis=1) if L else eq
    return eq


# rows per core() invocation: the DP cores sweep ~10 n-length working
# arrays per (i,j) cell, so one monolithic call on an 80k-row Ray block
# spills the working set out of L2 every sweep — chunking keeps it
# cache-resident (measured ~3x on 32-char pairs). Sweet spots differ by
# core working-set width: the jaro matcher peaks near 8k rows, the
# (L2+1)-wide edit DP near 4k (swept in-repo; see BASELINE.md).
_JARO_CHUNK = 8_192
_EDIT_CHUNK = 4_096


def _core_with_eq_fastpath(core, A, la, B, lb, equal_value, *args,
                           chunk: int = _JARO_CHUNK):
    eq = _rows_equal(A, la, B, lb)
    n = len(la)
    out = np.full(n, float(equal_value))
    ne = np.flatnonzero(~eq)
    if len(ne):
        An = A[ne]
        Bn = B[ne]
        # ASCII fast path: the DP inner loops are memory-bound; uint8
        # codepoints quarter the traffic (uint32 kept for general unicode)
        if ((An.max(initial=0) < 256) and (Bn.max(initial=0) < 256)):
            An = An.astype(np.uint8)
            Bn = Bn.astype(np.uint8)
        lan, lbn = la[ne], lb[ne]
        res = np.empty(len(ne), dtype=np.float64)
        for s in range(0, len(ne), chunk):
            e = s + chunk
            res[s:e] = core(np.ascontiguousarray(An[s:e]), lan[s:e],
                            np.ascontiguousarray(Bn[s:e]), lbn[s:e], *args)
        out[ne] = res
    return out




def _needs_chunk(s1, chunk):
    return (not isinstance(s1, str) and hasattr(s1, "__len__")
            and len(s1) > chunk)


def _chunk_pairs(fn, s1, s2, chunk):
    """Apply ``fn(s1_chunk, s2_chunk) -> float64[n]`` over row chunks,
    slicing BEFORE decode. Two reasons: (a) the decoded (n, L) working
    set stays cache-resident through the DP sweeps, and (b) each chunk's
    scratch arrays reuse the same malloc arenas — this kernel's
    page-fault cost on fresh multi-MB anonymous memory is ~100x a cached
    page, so one whole-batch decode of an 80k-row block costs more in
    faults than the entire distance computation (measured: np.repeat of
    a fresh 2.8M-int64 array = ~1 s on this box)."""
    n = len(s1)
    return np.concatenate([fn(s1[s:s + chunk], s2[s:s + chunk])
                           for s in range(0, n, chunk)])

def jaro_sim(s1, s2, max_len: int | None = None,
             int_transpositions: bool = False) -> np.ndarray:
    """Pairwise Jaro similarity. Null in -> NaN out."""
    if _needs_chunk(s1, _JARO_CHUNK):
        return _chunk_pairs(
            lambda a, b: jaro_sim(a, b, max_len, int_transpositions),
            s1, s2, _JARO_CHUNK)
    A, la, v1 = encode(s1, max_len)
    B, lb, v2 = encode(s2, max_len)
    sim = _core_with_eq_fastpath(_jaro_core, A, la, B, lb, 1.0,
                                 int_transpositions)
    sim[~(v1 & v2)] = np.nan
    return sim


def jaro_winkler_sim(s1, s2, p: float = 0.1, bt: float = 0.0,
                     max_len: int | None = None,
                     int_transpositions: bool = False) -> np.ndarray:
    """Pairwise Jaro-Winkler similarity.

    ``p`` is the Winkler prefix weight (stringdist default 0.1 in the
    reference's distcalc); ``bt`` the boost threshold (stringdist default 0:
    boost always applied; set 0.7 for the classic Winkler / DuckDB variant).
    """
    if _needs_chunk(s1, _JARO_CHUNK):
        return _chunk_pairs(
            lambda a, b: jaro_winkler_sim(a, b, p=p, bt=bt, max_len=max_len,
                                          int_transpositions=int_transpositions),
            s1, s2, _JARO_CHUNK)
    A, la, v1 = encode(s1, max_len)
    B, lb, v2 = encode(s2, max_len)
    sim = _core_with_eq_fastpath(_jaro_core, A, la, B, lb, 1.0,
                                 int_transpositions)
    if p > 0:
        ell = _common_prefix_len(A, la, B, lb).astype(np.float64)
        boosted = sim + ell * p * (1.0 - sim)
        sim = np.where(sim > bt, boosted, sim)
    sim[~(v1 & v2)] = np.nan
    return sim


def jw_dist(s1, s2, p: float = 0.1, bt: float = 0.0,
            max_len: int | None = None) -> np.ndarray:
    """stringdist(method='jw', p=p) parity: distance = 1 - JW similarity."""
    return 1.0 - jaro_winkler_sim(s1, s2, p=p, bt=bt, max_len=max_len)


# ---------------------------------------------------------------------------
# OSA / Levenshtein (DP vectorized over pairs; loops over char positions)
# ---------------------------------------------------------------------------

def _edit_core(A, la, B, lb, transpositions: bool):
    n, L1 = A.shape
    L2 = B.shape[1]
    ans = np.where(la == 0, lb, -1).astype(np.int64)
    if L1 == 0:
        return np.where(la == 0, lb, la).astype(np.int64)
    INF = np.int64(1 << 30)
    # int32 DP rows: distances are bounded by max_len (<= a few hundred);
    # halving the row width halves the cache-critical traffic per cell
    prev = np.broadcast_to(np.arange(L2 + 1, dtype=np.int32), (n, L2 + 1)).copy()
    prev2 = None
    for i in range(1, L1 + 1):
        cur = np.empty((n, L2 + 1), dtype=np.int32)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, L2 + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            best = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
            if transpositions and i > 1 and j > 1:
                tr = (ai == B[:, j - 2]) & (A[:, i - 2] == B[:, j - 1])
                best = np.where(tr, np.minimum(best, prev2[:, j - 2] + 1), best)
            cur[:, j] = best
        done = la == i
        if done.any():
            ans[done] = cur[done, lb[done]]
        prev2, prev = prev, cur
    # rows longer than L1 can't occur (L1 is the max); guard anyway
    ans = np.where(ans < 0, INF, ans)
    return ans


def _edit_core_f(A, la, B, lb, transpositions):
    return _edit_core(A, la, B, lb, transpositions).astype(np.float64)


def osa_dist(s1, s2, max_len: int | None = None) -> np.ndarray:
    """Optimal-string-alignment (restricted Damerau-Levenshtein) distance.

    Parity target: stringdist(method='osa'). Null -> NaN.
    """
    if _needs_chunk(s1, _EDIT_CHUNK):
        return _chunk_pairs(lambda a, b: osa_dist(a, b, max_len),
                            s1, s2, _EDIT_CHUNK)
    A, la, v1 = encode(s1, max_len)
    B, lb, v2 = encode(s2, max_len)
    d = _core_with_eq_fastpath(_edit_core_f, A, la, B, lb, 0.0, True,
                               chunk=_EDIT_CHUNK)
    d[~(v1 & v2)] = np.nan
    return d


def levenshtein_dist(s1, s2, max_len: int | None = None) -> np.ndarray:
    if _needs_chunk(s1, _EDIT_CHUNK):
        return _chunk_pairs(lambda a, b: levenshtein_dist(a, b, max_len),
                            s1, s2, _EDIT_CHUNK)
    A, la, v1 = encode(s1, max_len)
    B, lb, v2 = encode(s2, max_len)
    d = _core_with_eq_fastpath(_edit_core_f, A, la, B, lb, 0.0, False,
                               chunk=_EDIT_CHUNK)
    d[~(v1 & v2)] = np.nan
    return d


def osa_sim(s1, s2, max_len: int | None = None) -> np.ndarray:
    """stringsim(method='osa') parity: 1 - d / max(len1, len2); 1.0 when both empty."""
    if _needs_chunk(s1, _EDIT_CHUNK):
        return _chunk_pairs(lambda a, b: osa_sim(a, b, max_len),
                            s1, s2, _EDIT_CHUNK)
    A, la, v1 = encode(s1, max_len)
    B, lb, v2 = encode(s2, max_len)
    d = _core_with_eq_fastpath(_edit_core_f, A, la, B, lb, 0.0, True,
                               chunk=_EDIT_CHUNK)
    mx = np.maximum(la, lb).astype(np.float64)
    sim = np.where(mx > 0, 1.0 - d / np.where(mx > 0, mx, 1.0), 1.0)
    sim[~(v1 & v2)] = np.nan
    return sim


# ---------------------------------------------------------------------------
# American Soundex
# ---------------------------------------------------------------------------

_SDX = np.zeros(128, dtype=np.int8)  # 0 = vowel-ish (resets prev), -1 = ignore (h/w)
for _chars, _code in (
    ("BFPV", 1), ("CGJKQSXZ", 2), ("DT", 3), ("L", 4), ("MN", 5), ("R", 6),
):
    for _c in _chars:
        _SDX[ord(_c)] = _code
for _c in "HW":
    _SDX[ord(_c)] = -1
# AEIOUY stay 0


def _soundex_code_matrix(strings):
    """(n, 4) uint32 soundex code matrix + (valid, nlet) — the numeric form
    shared by ``soundex`` (string assembly) and ``soundex_dist`` (pure
    matrix equality, no per-row string building). Chunked like the DP
    kernels: the compaction scatter + position loop sweep (n, L) arrays
    that must stay cache-resident. Slicing happens BEFORE decode so
    pyarrow inputs keep the buffer-level encode fast path."""
    n = len(strings)
    if n > _JARO_CHUNK:
        outs = [_soundex_code_matrix(strings[s:s + _JARO_CHUNK])
                for s in range(0, n, _JARO_CHUNK)]
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]),
                np.concatenate([o[2] for o in outs]))
    codes, lengths, valid = encode(strings)
    n, L = codes.shape
    # uppercase ASCII letters only
    up = np.where((codes >= 97) & (codes <= 122), codes - 32, codes)
    is_letter = (up >= 65) & (up <= 90)
    # compact letters left (drop non-letters) via cumsum scatter
    if L:
        pos = np.cumsum(is_letter, axis=1) - 1
        letters = np.zeros_like(up)
        r, c = np.nonzero(is_letter)
        letters[r, pos[r, c]] = up[r, c]
    else:
        letters = up
    nlet = is_letter.sum(axis=1)

    out_chars = np.zeros((n, 4), dtype=np.uint32)
    out_chars[:, 1:] = ord("0")
    has = nlet > 0
    if L and has.any():
        first = letters[:, 0]
        out_chars[has, 0] = first[has]
        scode = _SDX[np.clip(first, 0, 127)]
        prev = np.where(has, scode, np.int8(0))  # code of last significant letter
        slot = np.ones(n, dtype=np.int64)
        for i in range(1, L):
            c = letters[:, i]
            live = has & (c != 0)
            if not live.any():
                break
            code = _SDX[np.clip(c, 0, 127)]
            emit = live & (code > 0) & (code != prev) & (slot < 4)
            if emit.any():
                r = np.nonzero(emit)[0]
                out_chars[r, slot[r]] = code[r] + ord("0")
                slot[r] += 1
            # update prev: digits set it, vowels (0) reset it, h/w (-1) keep it
            prev = np.where(live & (code >= 0), code, prev)
    return out_chars, valid, nlet


def soundex(strings) -> np.ndarray:
    """American Soundex codes (classic rules: h/w transparent, vowels reset).

    Non-letters are stripped; empty / null input -> None. Vectorized over
    rows: the loops run over character positions only."""
    out_chars, valid, nlet = _soundex_code_matrix(strings)
    n = len(valid)
    view = out_chars.view(dtype="U4").reshape(n)
    result = np.empty(n, dtype=object)
    for i in range(n):
        result[i] = view[i] if (valid[i] and nlet[i] > 0) else ("" if valid[i] else None)
    return result


def soundex_dist(s1, s2) -> np.ndarray:
    """stringdist(method='soundex') parity: 0.0 if codes equal else 1.0; null -> NaN."""
    m1, v1, n1 = _soundex_code_matrix(s1)
    m2, v2, n2 = _soundex_code_matrix(s2)
    # '' (no letters) encodes as the all-zero-slot row, distinct from any
    # lettered code — matrix equality reproduces string-code equality,
    # but nlet must agree so '' != a one-vowel letter code... both encode
    # first letter, so (matrix, nlet>0) together are injective
    eq = (m1 == m2).all(axis=1) & ((n1 > 0) == (n2 > 0))
    out = (~eq).astype(np.float64)
    out[~(v1 & v2)] = np.nan
    return out


# ---------------------------------------------------------------------------
# Character-bigram cosine (qlcMatrix::sim.strings parity, '#' boundaries)
# ---------------------------------------------------------------------------

def _bigram_counts(strings, boundary=True):
    """Per-string dict of bigram -> count. Driver-side / per-distinct-key use;
    the dataset-scale path is the inverted-index join in stages/blocking.py."""
    arr = _as_object_array(strings)
    out = []
    for s in arr:
        if not isinstance(s, str):
            out.append(None)
            continue
        t = f"#{s}#" if boundary else s
        d: dict[str, int] = {}
        for k in range(len(t) - 1):
            bg = t[k:k + 2]
            d[bg] = d.get(bg, 0) + 1
        out.append(d)
    return out


def _cos(d1, d2) -> float:
    if d1 is None or d2 is None:
        return np.nan
    if not d1 or not d2:
        return 1.0 if d1 == d2 else 0.0
    dot = sum(v * d2.get(k, 0) for k, v in d1.items())
    n1 = np.sqrt(sum(v * v for v in d1.values()))
    n2 = np.sqrt(sum(v * v for v in d2.values()))
    return dot / (n1 * n2)


def bigram_cosine_pairs(s1, s2, boundary=True) -> np.ndarray:
    """Aligned pairwise bigram cosine similarity."""
    c1 = _bigram_counts(s1, boundary)
    c2 = _bigram_counts(s2, boundary)
    return np.array([_cos(a, b) for a, b in zip(c1, c2)], dtype=np.float64)


def bigram_cosine_matrix(from_strings, to_strings, boundary=True,
                         idf: bool = False) -> np.ndarray:
    """Dense (n_from, n_to) bigram cosine matrix.

    Parity target: qlcMatrix::sim.strings(boundary='#')
    [/root/reference/R/candidates.R:82-96] and the idf-weighted variant
    [candidates.R:97-112] (idf weight = log(N/df) over the combined string
    set, matching qlcMatrix::idf). Small-side / fixture use only — the
    distributed blocker never materializes this matrix.
    """
    cf = _bigram_counts(from_strings, boundary)
    ct = _bigram_counts(to_strings, boundary)
    vocab: dict[str, int] = {}
    for d in cf + ct:
        if d:
            for k in d:
                vocab.setdefault(k, len(vocab))
    nf, nt, V = len(cf), len(ct), max(len(vocab), 1)

    def mat(cs, n):
        M = np.zeros((n, V), dtype=np.float64)
        for i, d in enumerate(cs):
            if d:
                for k, v in d.items():
                    M[i, vocab[k]] = v
        return M

    F = mat(cf, nf)
    T = mat(ct, nt)
    if idf:
        df = (np.vstack([F, T]) > 0).sum(axis=0).astype(np.float64)
        w = np.log((nf + nt) / np.where(df > 0, df, 1.0))
        F = F * w
        T = T * w
    fn = np.linalg.norm(F, axis=1, keepdims=True)
    tn = np.linalg.norm(T, axis=1, keepdims=True)
    sim = (F @ T.T) / (np.where(fn == 0, 1, fn) * np.where(tn == 0, 1, tn).T)
    for i, d in enumerate(cf):
        if d is None:
            sim[i, :] = np.nan
    for j, d in enumerate(ct):
        if d is None:
            sim[:, j] = np.nan
    return sim


# ---------------------------------------------------------------------------
# Token Jaccard
# ---------------------------------------------------------------------------

def token_jaccard(s1, s2, sep: str | None = None) -> np.ndarray:
    """Jaccard similarity of token sets. Short-signature columns only (role /
    tool signatures); the vectorized fast path for those is mask_jaccard."""
    a1 = _as_object_array(s1)
    a2 = _as_object_array(s2)
    out = np.empty(len(a1), dtype=np.float64)
    for i in range(len(a1)):
        x, y = a1[i], a2[i]
        if not isinstance(x, str) or not isinstance(y, str):
            out[i] = np.nan
            continue
        sx = set(x.split(sep)) - {""}
        sy = set(y.split(sep)) - {""}
        if not sx and not sy:
            out[i] = 1.0
        else:
            out[i] = len(sx & sy) / len(sx | sy)
    return out


_POPCNT = np.array([bin(i).count("1") for i in range(65536)], dtype=np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in (0, 16, 32, 48):
        out += _POPCNT[((x >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


def mask_jaccard(m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """Jaccard over 64-bit set bitmasks (vocab-encoded tool/role sets).

    Fully vectorized; empty-vs-empty -> 1.0. Negative mask means null -> NaN.
    """
    m1 = np.asarray(m1, dtype=np.int64)
    m2 = np.asarray(m2, dtype=np.int64)
    null = (m1 < 0) | (m2 < 0)
    inter = _popcount64(np.where(null, 0, m1 & m2))
    union = _popcount64(np.where(null, 0, m1 | m2))
    out = np.where(union > 0, inter / np.where(union > 0, union, 1), 1.0)
    return np.where(null, np.nan, out)
