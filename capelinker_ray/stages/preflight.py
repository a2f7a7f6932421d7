"""Preflight data-quality profiler — ``preflight()`` parity, distributed.

The reference's advisory checker (/root/reference/R/prep.R:67-205) profiles
each variable before a linkage run: missing share, empty-string share
(distinct from NA! prep.R:127-131), length-1 share, case mix, surrounding
whitespace, non-alpha characters, character set, numeric ranges — plus a
model-variable presence check against the registry (prep.R:77-80).

Distributed shape: ONE stateless ``map_batches`` computes per-batch partial
counters (a few rows per column per batch), the driver sums partials —
no shuffle, no materialization of the profiled dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["preflight"]


def _partial_profile(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    n = len(df)
    for col in df.columns:
        s = df[col]
        rec = {"column": col, "n": n, "n_missing": int(s.isna().sum())}
        if s.dtype == object or pd.api.types.is_string_dtype(s):
            v = s.dropna().astype(str)
            rec.update(
                n_empty=int((v == "").sum()),
                n_len1=int((v.str.len() == 1).sum()),
                n_upper=int(v.str.fullmatch(r"[^a-z]*").sum()),
                n_lower=int(v.str.fullmatch(r"[^A-Z]*").sum()),
                n_ws_padded=int((v != v.str.strip()).sum()),
                n_nonalpha=int(v.str.contains(r"[^A-Za-z .]", regex=True).sum()),
                vmin=np.nan, vmax=np.nan, vsum=np.nan, kind="string",
            )
        elif pd.api.types.is_numeric_dtype(s):
            v = s.dropna()
            rec.update(n_empty=0, n_len1=0, n_upper=0, n_lower=0,
                       n_ws_padded=0, n_nonalpha=0,
                       vmin=float(v.min()) if len(v) else np.nan,
                       vmax=float(v.max()) if len(v) else np.nan,
                       vsum=float(v.sum()) if len(v) else np.nan,
                       kind="numeric")
        else:
            rec.update(n_empty=0, n_len1=0, n_upper=0, n_lower=0,
                       n_ws_padded=0, n_nonalpha=0,
                       vmin=np.nan, vmax=np.nan, vsum=np.nan, kind="other")
        rows.append(rec)
    return pd.DataFrame(rows)


def preflight(ds, variables: list[str] | None = None,
              model: str | None = None) -> pd.DataFrame:
    """Profile ``ds`` (optionally only ``variables``); returns the report
    frame with one row per column: shares of missing / empty / len-1 /
    case / whitespace / non-alpha plus numeric min/max/mean.

    ``model`` adds the prep.R:77-80 check: raises KeyError listing any
    feature the named pretrained model needs that the dataset lacks.
    """
    if variables:
        ds = ds.select_columns([c for c in variables
                                if c in ds.schema().names])
    partials = ds.map_batches(_partial_profile,
                              batch_format="pandas").to_pandas()
    agg = partials.groupby(["column", "kind"], sort=False).agg(
        n=("n", "sum"), n_missing=("n_missing", "sum"),
        n_empty=("n_empty", "sum"), n_len1=("n_len1", "sum"),
        n_upper=("n_upper", "sum"), n_lower=("n_lower", "sum"),
        n_ws_padded=("n_ws_padded", "sum"),
        n_nonalpha=("n_nonalpha", "sum"),
        vmin=("vmin", "min"), vmax=("vmax", "max"), vsum=("vsum", "sum"),
    ).reset_index()
    n = agg["n"].replace(0, 1)
    for c in ("missing", "empty", "len1", "upper", "lower", "ws_padded",
              "nonalpha"):
        agg[f"share_{c}"] = agg[f"n_{c}"] / n
    agg["vmean"] = agg["vsum"] / (agg["n"] - agg["n_missing"]).replace(0, 1)

    if model is not None:
        from ..models.registry import resolve_artifact
        feats = resolve_artifact(model)["feature_names"]
        have = set(agg["column"])
        missing = [f for f in feats if f not in have]
        if missing:
            raise KeyError(
                f"model {model!r} requires features absent from the data: "
                f"{missing}")
    return agg
