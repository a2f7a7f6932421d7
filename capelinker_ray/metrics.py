"""Evaluation metrics — the reference's validation surface, driver-side.

Parity targets: ``Metrics::precision/recall/fbeta_score`` + confusion tables
(/root/reference/data_raw/pretrained.R:88-100, 282-316, 467-487;
vignettes/example.rmd:184-197), the threshold sweep (pretrained.R:292-316),
pairwise cluster metrics for the entity output, and ``conf2tex``-style text
rendering (util.R:329-341).

These run on collected (small) eval frames — labeled pairs ≪ corpus — like
every validation step in the reference.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd

__all__ = ["confusion", "prf", "threshold_sweep", "pairwise_cluster_metrics",
           "confusion_text"]


def confusion(y_true, y_pred) -> dict:
    y_true = np.asarray(y_true).astype(int)
    y_pred = np.asarray(y_pred).astype(int)
    return {
        "tn": int(((y_pred == 0) & (y_true == 0)).sum()),
        "fp": int(((y_pred == 1) & (y_true == 0)).sum()),
        "fn": int(((y_pred == 0) & (y_true == 1)).sum()),
        "tp": int(((y_pred == 1) & (y_true == 1)).sum()),
    }


def prf(y_true, y_pred, beta: float = 1.0) -> dict:
    c = confusion(y_true, y_pred)
    tp, fp, fn = c["tp"], c["fp"], c["fn"]
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    b2 = beta * beta
    fbeta = ((1 + b2) * prec * rec / (b2 * prec + rec)
             if prec + rec else 0.0)
    return {**c, "precision": prec, "recall": rec, "fbeta": fbeta}


def threshold_sweep(y_true, scores, thresholds=None) -> pd.DataFrame:
    """P/R/F per threshold (pretrained.R:292-316 sweep)."""
    if thresholds is None:
        thresholds = np.round(np.arange(0.05, 1.0, 0.05), 2)
    rows = []
    scores = np.asarray(scores, dtype=float)
    for t in thresholds:
        m = prf(y_true, (scores > t).astype(int))
        rows.append({"threshold": float(t), **m})
    return pd.DataFrame(rows)


def pairwise_cluster_metrics(assignment: pd.DataFrame, truth: pd.DataFrame,
                             id_col: str = "conv_id",
                             pred_col: str = "entity_id",
                             true_col: str = "entity_id") -> dict:
    """Pairwise P/R/F1 of a predicted clustering vs ground truth — the
    BASELINE.json quality metric, computed over same-cluster pairs."""
    m = assignment[[id_col, pred_col]].merge(
        truth[[id_col, true_col]], on=id_col, suffixes=("_pred", "_true"))
    pcol, tcol = f"{pred_col}_pred", f"{true_col}_true"
    if pcol not in m.columns:   # distinct names, no suffixing happened
        pcol, tcol = pred_col, true_col

    def pairs_of(col):
        s = set()
        for _, g in m.groupby(col):
            s.update(combinations(sorted(g[id_col]), 2))
        return s

    pred, true = pairs_of(pcol), pairs_of(tcol)
    tp = len(pred & true)
    prec = tp / len(pred) if pred else 1.0
    rec = tp / len(true) if true else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": len(pred) - tp, "fn": len(true) - tp,
            "precision": prec, "recall": rec, "f1": f1,
            "n_records": len(m)}


def confusion_text(c: dict, caption: str = "") -> str:
    """Plain-text confusion report (conf2tex analog, util.R:329-341)."""
    lines = []
    if caption:
        lines.append(caption)
    lines += [
        "              pred=0    pred=1",
        f"  true=0  {c['tn']:>8}  {c['fp']:>8}",
        f"  true=1  {c['fn']:>8}  {c['tp']:>8}",
    ]
    return "\n".join(lines)
