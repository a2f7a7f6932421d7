"""Produce the pretrained match-classifier artifacts, deterministically.

Mirrors the reference's model-production script
(/root/reference/data_raw/pretrained.R): build labeled candidate pairs ->
grouped train/holdout split by from-record id (pretrained.R:55-59, keeps
blocks intact) -> train xgboost-style GBT (:61-86) and randomForest analog
(:168-181) -> report precision/recall/F-beta + confusion matrix (:88-100) ->
freeze the registry artifacts (:489-513).

Labels come from the seeded synthetic transcript corpus (capelinker_ray.synth)
instead of hand-labeled opgaafrollen pairs: a candidate pair is ``correct``
iff both conversations were generated from the same entity. The quality gate
is the BASELINE.json metric: pairwise F1 >= 0.99 on held-out labeled pairs at
the fixed blocking key.

Run:  python scripts/train_pretrained.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from capelinker_ray import synth
from capelinker_ray.models.registry import ARTIFACT_DIR
from capelinker_ray.models.scorer import feature_matrix
from capelinker_ray.models.trees import GBTClassifier, RandomForest, save_artifact
from capelinker_ray.pipelines.linkage import PAIR_ATTR_COLS
from capelinker_ray.stages.blocking import candidates
from capelinker_ray.stages.conv_records import build_conv_records
from capelinker_ray.stages.features import TRANSCRIPT_FEATURES, add_pair_features
from capelinker_ray.stages.normalize import normalize_turns

N_ENTITIES = 1200
SEED = 42
HOLDOUT_FRAC = 0.3


def build_labeled_pairs() -> pd.DataFrame:
    import ray.data as rd

    turns, truth = synth.gen_corpus(n_entities=N_ENTITIES, seed=SEED)
    ds = rd.from_arrow(turns)
    records = build_conv_records(normalize_turns(ds))
    pairs = candidates(records, None, block_col="block_key", id_col="conv_id",
                       blocktype="equality", attr_cols=PAIR_ATTR_COLS,
                       keep_unmatched=False)
    feats = add_pair_features(pairs)
    df = feats.select_columns(
        ["conv_id_from", "conv_id_to"] + TRANSCRIPT_FEATURES).to_pandas()
    ent = truth.to_pandas().set_index("conv_id")["entity_id"]
    df["correct"] = (df["conv_id_from"].map(ent).to_numpy()
                     == df["conv_id_to"].map(ent).to_numpy()).astype(np.float64)
    return df


def prf(y_true, y_pred):
    tp = int(((y_pred == 1) & (y_true == 1)).sum())
    fp = int(((y_pred == 1) & (y_true == 0)).sum())
    fn = int(((y_pred == 0) & (y_true == 1)).sum())
    tn = int(((y_pred == 0) & (y_true == 0)).sum())
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return dict(tp=tp, fp=fp, fn=fn, tn=tn, precision=prec, recall=rec, f1=f1)


def main() -> int:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    try:
        df = build_labeled_pairs()
    finally:
        ray.shutdown()
    print(f"labeled candidate pairs: {len(df)}  "
          f"(positives: {int(df['correct'].sum())})")

    # grouped split by from-id (pretrained.R:55-59): hash-of-key, seed-free
    key_hash = pd.util.hash_array(df["conv_id_from"].to_numpy(dtype=object))
    holdout = (key_hash % 100) < int(HOLDOUT_FRAC * 100)
    X = df[TRANSCRIPT_FEATURES].to_numpy(np.float64)
    y = df["correct"].to_numpy(np.float64)
    Xtr, ytr = X[~holdout], y[~holdout]
    Xte, yte = X[holdout], y[holdout]
    print(f"train {len(Xtr)} / holdout {len(Xte)}")

    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    ok = True
    # hyperparameters per data_raw/pretrained.R:61-73
    gbt = GBTClassifier(n_rounds=300, max_depth=6, eta=0.3,
                        min_child_weight=1.0, gamma=1.0, subsample=0.8,
                        colsample_bytree=0.5, seed=SEED)
    gbt.fit(Xtr, ytr, feature_names=TRANSCRIPT_FEATURES, eval_set=(Xte, yte))
    m = prf(yte, (gbt.predict_proba(Xte) > 0.5).astype(int))
    print(f"m_boost_transcripts: trees={len(gbt.trees)} {m}")
    save_artifact(gbt.artifact(), os.path.join(ARTIFACT_DIR, "m_boost_transcripts.json"))
    ok &= m["f1"] >= 0.99

    rf = RandomForest(n_trees=150, max_depth=12, min_child_weight=2.0, seed=SEED)
    rf.fit(Xtr, ytr, feature_names=TRANSCRIPT_FEATURES)
    mr = prf(yte, (rf.predict_proba(Xte) > 0.5).astype(int))
    print(f"m_rf_transcripts: {mr}")
    save_artifact(rf.artifact(), os.path.join(ARTIFACT_DIR, "m_rf_transcripts.json"))

    # sparse variant (reference publishes sparse models, pretrained.R:49-53)
    sparse_feats = ["first_textdist", "first_textdist_osa", "second_textdist",
                    "n_turnsdist", "ts_gapgauss", "matches"]
    idx = [TRANSCRIPT_FEATURES.index(f) for f in sparse_feats]
    gbs = GBTClassifier(n_rounds=300, max_depth=6, eta=0.3,
                        min_child_weight=1.0, gamma=1.0, subsample=0.8,
                        colsample_bytree=0.8, seed=SEED)
    gbs.fit(Xtr[:, idx], ytr, feature_names=sparse_feats,
            eval_set=(Xte[:, idx], yte))
    ms = prf(yte, (gbs.predict_proba(Xte[:, idx]) > 0.5).astype(int))
    print(f"m_boost_transcripts_sparse: trees={len(gbs.trees)} {ms}")
    save_artifact(gbs.artifact(),
                  os.path.join(ARTIFACT_DIR, "m_boost_transcripts_sparse.json"))

    if not ok:
        print("GATE FAILED: m_boost_transcripts holdout F1 < 0.99")
        return 1
    print("gate passed: holdout F1 >= 0.99")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
