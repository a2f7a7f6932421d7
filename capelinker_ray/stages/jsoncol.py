"""Scalar-field extraction from JSON-object string columns.

Semi-structured event payloads (the ``events.props`` column pattern) are
ubiquitous in log pipelines; parsing every row with ``json.loads`` is a
Python loop over 100 TB. ``json_scalar`` uses a compiled-regex VECTORIZED
fast path (one ``Series.str.extract`` per batch) that handles flat scalar
fields — numbers, double-quoted strings without escapes, booleans, null —
and falls back to ``json.loads`` ONLY for the rows the pattern misses
(nested objects, escaped quotes), so the loop touches the exotic tail,
not the corpus.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

__all__ = ["json_scalar"]

_NUM = r"(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
_STR = r'"((?:[^"\\])*)"'


def json_scalar(ds, col: str, field: str, out_col: str,
                kind: str = "float"):
    """Add ``out_col`` = the scalar ``field`` of the JSON object in
    ``col``. ``kind``: "int" (nullable Int64 via float64+NaN), "float",
    or "str". Missing field / null / non-object rows yield null."""
    if kind not in ("int", "float", "str"):
        raise ValueError("kind must be int, float or str")
    f = re.escape(field)
    if kind in ("int", "float"):
        pat = re.compile(rf'"{f}"\s*:\s*{_NUM}')
    else:
        pat = re.compile(rf'"{f}"\s*:\s*{_STR}')

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[col].astype("string")
        got = s.str.extract(pat, expand=False)
        # fallback: rows that mention the field but did not match the
        # scalar pattern (escaped strings, spacing quirks), PLUS any row
        # holding a nested object — the regex would otherwise match the
        # field at any depth, where JSON-path $.field must see only the
        # top level ('{"outer": {"k": 5}}' -> null, not 5).
        nested = s.str.count(r"\{") > 1
        miss = s.notna() & (nested
                            | (got.isna()
                               & s.str.contains(f'"{field}"', regex=False)))
        if miss.any():
            # object dtype: slow() may return non-string scalars (ints,
            # floats) that a pandas StringArray would reject on mask
            got = got.astype(object).where(got.notna(), None)

            def slow(v):
                try:
                    x = json.loads(v)
                except (TypeError, ValueError):
                    return None
                x = x.get(field) if isinstance(x, dict) else None
                return None if isinstance(x, (dict, list)) else x
            got = got.mask(miss, s[miss].map(slow))
        if kind == "str":
            df[out_col] = got.astype(object).where(got.notna(), None)
        else:
            df[out_col] = pd.to_numeric(got, errors="coerce").astype(
                np.float64)
        return df

    return ds.map_batches(extract, batch_format="pandas")
