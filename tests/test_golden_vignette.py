"""Golden end-to-end parity with the reference vignette's frozen numbers
(vignettes/example.rmd:74-196): the rein panel's bigram candidate set and
the 5-feature GBT quality, driven through the engine's own stages.

The ``rein`` table is read from the reference's native .rda format via
sources/rdata.py (no R). Two frozen numbers reproduce EXACTLY:

  * nrow(cnd) == 1,448,088 (example.rmd:86, pdf p.5)
  * mean candidates per (persid_from, year_to) == 30.62015 (rmd:87)

plus the prose check "persid 1 in 1826 has two candidates" (rmd:88-95).
The held-out confusion (golden P=0.8992 R=0.8406 F1=0.8689, rmd:188-196)
depends on R's RNG for the 70/30 grouped split, which is not reproducible
bit-for-bit from numpy — asserted within tolerance on our own seeded
grouped split.

Reference quirk replicated on purpose: qlcMatrix::sim.strings coerces NA
blocking strings to the literal string "NA", so the 9 NA-surname 1828
records pair with the 99 NA-surname earlier records (9*99 - 9 = 882 rows
— exactly the delta observed when NA is treated as null instead).
"""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from capelinker_ray.kernels.strdist import jaro_winkler_sim
from capelinker_ray.models.trees import GBTClassifier
from capelinker_ray.sources.rdata import read_rda
from capelinker_ray.stages.bigram import bigram_candidates

_REIN = "/root/reference/data/rein.rda"

pytestmark = pytest.mark.skipif(not os.path.exists(_REIN),
                                reason="reference rein.rda not available")


def test_vignette_golden_parity(ray_session):
    rein = read_rda(_REIN)["rein"]
    assert rein.shape == (42354, 31)
    rein["mlast"] = rein["mlast"].fillna("NA")   # sim.strings NA quirk
    cols = ["persid", "mlast", "mfirst", "wlast", "wfirst", "linkid",
            "year"]
    f = rein[rein["year"] == 1828][cols].reset_index(drop=True)
    t = rein[rein["year"] < 1828][cols].reset_index(drop=True)

    out = bigram_candidates(
        rd.from_pandas(f[["persid", "mlast"]]),
        rd.from_pandas(t[["persid", "mlast"]]),
        blockvariable="mlast", id_col="persid", maxdist=0.5).to_pandas()

    # frozen vignette numbers — exact
    assert len(out) == 1_448_088
    f2 = f.copy()
    f2["persid"] = f2["persid"].astype(str)
    t2 = t.copy()
    t2["persid"] = t2["persid"].astype(str)
    m = out.merge(f2.add_suffix("_from"), left_on="id_from",
                  right_on="persid_from")
    m = m.merge(t2.add_suffix("_to"), left_on="id_to",
                right_on="persid_to", how="left")
    grp = m.groupby(["id_from", "year_to"], dropna=False).size()
    assert round(float(grp.mean()), 5) == 30.62015
    assert len(m[(m.id_from == "1") & (m.year_to == 1826)]) == 2

    # labeled subset + features (rmd:104-123; stringdist jw default p=0)
    lbl = m[(m.year_to == 1826)
            & m.mlast_from.str.match("^[A-L]")
            & m.mlast_to.str.match("^[A-L]")].copy()
    lbl["correct"] = ((lbl.linkid_from == lbl.linkid_to)
                      & lbl.linkid_from.notna()
                      & lbl.linkid_to.notna()).astype(float)
    # canonical row order: grouped_map output arrives in partition order,
    # which would otherwise leak nondeterminism into subsampled training
    lbl = lbl.sort_values(["persid_from", "persid_to"],
                          key=lambda s: s.astype(np.int64),
                          kind="stable").reset_index(drop=True)
    for v in ["mlast", "mfirst", "wlast", "wfirst"]:
        lbl[f"{v}dist"] = 1.0 - jaro_winkler_sim(
            lbl[f"{v}_from"].to_numpy(object),
            lbl[f"{v}_to"].to_numpy(object), p=0.0)
    feats = ["mlastdist", "mfirstdist", "wlastdist", "wfirstdist",
             "matches"]

    # grouped 70/30 split (rmd:129-137; R's RNG not reproducible — own
    # seed, same protocol: split on persid_from so blocks stay together)
    rng = np.random.default_rng(123871)
    # sort: unique() order follows partition arrival order and would make
    # the split (and thus the metrics) nondeterministic across runs
    id_int = lbl["id_from"].astype(np.int64)
    ids = np.sort(id_int.unique())
    tr_ids = set(rng.choice(ids, size=int(np.ceil(len(ids) * 0.7)),
                            replace=False))
    in_train = id_int.isin(tr_ids)
    tr = lbl[in_train]
    te = lbl[~in_train]

    mdl = GBTClassifier(n_rounds=500, max_depth=6, eta=0.3,
                        min_child_weight=1, gamma=1, subsample=0.8,
                        colsample_bytree=0.5, early_stopping_rounds=None,
                        seed=7)
    mdl.fit(tr[feats].to_numpy(np.float64), tr["correct"].to_numpy())
    pred = mdl.predict_proba(te[feats].to_numpy(np.float64)) > 0.5
    y = te["correct"].to_numpy() > 0.5
    tp = int((pred & y).sum())
    fp = int((pred & ~y).sum())
    fn = int((~pred & y).sum())
    P = tp / max(tp + fp, 1)
    R = tp / max(tp + fn, 1)
    F1 = 2 * P * R / max(P + R, 1e-9)
    # golden: P 0.8992, R 0.8406, F1 0.8689 under R's split; tolerance for
    # the split difference (measured 0.890 / 0.807 / 0.846 at seed 123871)
    assert P >= 0.85, (P, R, F1)
    assert R >= 0.75, (P, R, F1)
    assert F1 >= 0.80, (P, R, F1)
