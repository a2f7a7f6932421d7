"""Import the reference's bundled pretrained models into engine artifacts.

The reference ships 6 trained models in ``data/pretrained_models.rda``
(/root/reference/data_raw/pretrained.R:489-513): 4 xgboost boosters (raw
bytes in xgboost's public UBJSON model format, xgboost >= 1.6) and 2
randomForest classifiers (plain R data structures). This module converts
both into the engine's frozen flat-array artifacts (models/trees.py), so
``score_pairs(model="m_boost_stel_rein")`` runs the reference's actual
trained weights through the vectorized numpy ensemble — the full
``pretrained_models[[modstring]]$model`` registry surface of
/root/reference/R/pred.R:27-45.

Semantics parity notes:
  * xgboost node test is ``fvalue < split_condition -> left`` with a
    learned missing direction — identical to trees._predict_tree.
  * randomForest tests ``x <= xbestsplit -> left``; thresholds are nudged
    with nextafter so the engine's strict ``<`` matches at equality.
    randomForest has no missing-value routing at predict time (the
    reference relies on na.exclude); NaN rows route left, documented.
  * RF probability = vote share of the SECOND factor level
    (``predict(type="prob")[, 2]``, pred.R:44-45).
  * binary:logistic base_score is stored in probability space; the margin
    starts at logit(base_score), matching xgboost's ProbToMargin.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..sources.rdata import r_attrs, r_list_to_dict, r_value, read_rda

__all__ = ["ubjson_loads", "xgb_raw_to_artifact", "rf_to_artifact",
           "import_reference_models"]

REFERENCE_MODELS_RDA = "/root/reference/data/pretrained_models.rda"


# ---------------------------------------------------------------------------
# minimal UBJSON decoder (spec: ubjson.org — xgboost's UBJ model format)
# ---------------------------------------------------------------------------

_FIXED = {
    b"i": (1, ">b"), b"U": (1, ">B"), b"I": (2, ">h"), b"l": (4, ">i"),
    b"L": (8, ">q"), b"d": (4, ">f"), b"D": (8, ">d"), b"C": (1, ">c"),
}
_NP_TYPE = {b"i": ">i1", b"U": ">u1", b"I": ">i2", b"l": ">i4",
            b"L": ">i8", b"d": ">f4", b"D": ">f8"}


class _UbjReader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def marker(self) -> bytes:
        m = self.d[self.p:self.p + 1]
        self.p += 1
        while m == b"N":                      # no-op
            m = self.d[self.p:self.p + 1]
            self.p += 1
        return m

    def fixed(self, m: bytes):
        size, fmt = _FIXED[m]
        v = struct.unpack(fmt, self.d[self.p:self.p + size])[0]
        self.p += size
        return v

    def length(self) -> int:
        return int(self.fixed(self.marker()))

    def string(self) -> str:
        n = self.length()
        s = self.d[self.p:self.p + n].decode("utf-8")
        self.p += n
        return s

    def value(self, m: bytes | None = None):
        m = m or self.marker()
        if m == b"Z":
            return None
        if m == b"T":
            return True
        if m == b"F":
            return False
        if m in _FIXED:
            v = self.fixed(m)
            return v.decode() if m == b"C" else v
        if m == b"S" or m == b"H":
            return self.string()
        if m == b"[":
            return self.array()
        if m == b"{":
            return self.obj()
        raise ValueError(f"UBJSON marker {m!r} at {self.p - 1}")

    def array(self):
        typ = None
        count = None
        m = self.marker()
        if m == b"$":
            typ = self.marker()
            m = self.marker()
        if m == b"#":
            count = self.length()
        elif typ is not None:
            raise ValueError("typed UBJSON array without count")
        if typ is not None:
            if typ in _NP_TYPE:               # contiguous numeric payload
                n = count
                size = _FIXED[typ][0]
                arr = np.frombuffer(
                    self.d[self.p:self.p + n * size], dtype=_NP_TYPE[typ])
                self.p += n * size
                return arr.astype(arr.dtype.newbyteorder("="))
            return [self.value(typ) for _ in range(count)]
        out = []
        if count is not None:
            return [self.value() for _ in range(count)]
        while True:
            m = self.marker()
            if m == b"]":
                return out
            out.append(self.value(m))

    def obj(self):
        typ = None
        count = None
        out = {}
        start = self.p
        m = self.marker()
        if m == b"$":
            typ = self.marker()
            m = self.marker()
        if m == b"#":
            count = self.length()
            for _ in range(count):
                out[self.string()] = self.value(typ)
            return out
        self.p = start
        while True:
            m = self.marker()
            if m == b"}":
                return out
            self.p -= 1
            key = self.string()
            out[key] = self.value(typ)


def ubjson_loads(data: bytes):
    return _UbjReader(data).value()


# ---------------------------------------------------------------------------
# xgboost UBJ -> artifact
# ---------------------------------------------------------------------------

def xgb_raw_to_artifact(raw: bytes, feature_names: list[str]) -> dict:
    doc = ubjson_loads(raw)
    learner = (doc.get("Model") or doc.get("learner") or doc)["learner"] \
        if "learner" not in doc else doc["learner"]
    lmp = learner["learner_model_param"]
    objective = learner["objective"]["name"]
    base = float(lmp["base_score"])
    if objective.startswith("binary:logistic"):
        base_margin = math.log(base / (1.0 - base))
    else:
        base_margin = base
    gb = learner["gradient_booster"]["model"]
    trees = []
    for t in gb["trees"]:
        left = np.asarray(t["left_children"], np.int32)
        right = np.asarray(t["right_children"], np.int32)
        sidx = np.asarray(t["split_indices"], np.int32)
        cond = np.asarray(t["split_conditions"], np.float64)
        dl = np.asarray(t["default_left"], bool)
        leaf = left == -1
        trees.append({
            "feature": np.where(leaf, np.int32(-1), sidx).astype(np.int32),
            "threshold": np.where(leaf, 0.0, cond),
            "default_left": dl,
            "left": left,
            "right": right,
            "value": np.where(leaf, cond, 0.0),
        })
    return {"type": "gbt", "feature_names": list(feature_names),
            "base_score": float(base_margin), "trees": trees,
            "params": {"source": "xgboost-ubj", "objective": objective,
                       "num_trees": len(trees)}}


# ---------------------------------------------------------------------------
# randomForest (classification) -> artifact
# ---------------------------------------------------------------------------

def _mat(v, shape):
    arr = np.asarray(r_value(v), np.float64)
    return arr.reshape(shape, order="F")      # R stores column-major


def rf_to_artifact(model, feature_names: list[str]) -> dict:
    md = r_list_to_dict(model)
    forest = r_list_to_dict(md["forest"])
    ntree = int(np.asarray(r_value(md["ntree"])).item())
    nrnodes = int(np.asarray(r_value(forest["nrnodes"])).item())
    ndbigtree = np.asarray(r_value(forest["ndbigtree"]), np.int64)
    classes = [str(c) for c in r_value(md["classes"])]
    ncat = np.asarray(r_value(forest["ncat"]), np.int64)
    if (ncat > 1).any():
        raise NotImplementedError(
            "categorical randomForest splits not supported")
    nodestatus = _mat(forest["nodestatus"], (nrnodes, ntree))
    bestvar = _mat(forest["bestvar"], (nrnodes, ntree))
    xbestsplit = _mat(forest["xbestsplit"], (nrnodes, ntree))
    nodepred = _mat(forest["nodepred"], (nrnodes, ntree))
    treemap = _mat(forest["treemap"], (nrnodes, 2, ntree))

    trees = []
    for t in range(ntree):
        n = int(ndbigtree[t])
        status = nodestatus[:n, t]
        leaf = status == -1                   # terminal nodes
        feat = (bestvar[:n, t] - 1).astype(np.int32)
        feat[leaf] = -1
        thr = xbestsplit[:n, t].copy()
        # randomForest routes x <= split left; engine tests x < thr
        thr = np.nextafter(thr, np.inf)
        thr[leaf] = 0.0
        left = (treemap[:n, 0, t] - 1).astype(np.int32)
        right = (treemap[:n, 1, t] - 1).astype(np.int32)
        left[leaf] = -1
        right[leaf] = -1
        # vote 1.0 when the terminal predicts the SECOND class
        # (predict(type='prob')[, 2], pred.R:44-45)
        value = np.where(leaf & (nodepred[:n, t] == 2.0), 1.0, 0.0)
        trees.append({
            "feature": feat, "threshold": thr,
            "default_left": np.ones(n, bool), "left": left, "right": right,
            "value": value,
        })
    return {"type": "rf", "feature_names": list(feature_names),
            "base_score": 0.0, "trees": trees,
            "params": {"source": "randomForest", "ntree": ntree,
                       "classes": classes}}


# ---------------------------------------------------------------------------
# registry import
# ---------------------------------------------------------------------------

def import_reference_models(rda_path: str = REFERENCE_MODELS_RDA,
                            register: bool = True) -> dict:
    """Load every bundled pretrained model into engine artifacts.

    With ``register=True`` the artifacts are installed into the model
    registry cache, so ``score_pairs(model="m_boost_stel_rein")`` etc.
    resolve immediately."""
    objs = read_rda(rda_path)
    pm = r_list_to_dict(objs["pretrained_models"])
    out = {}
    for name, entry in pm.items():
        e = r_list_to_dict(entry)
        model = e["model"]
        variables = [str(v) for v in r_value(e["variables"])]
        klass = [str(c) for c in r_value(r_attrs(model).get("class", []))]
        md = r_list_to_dict(model)
        if "xgb.Booster" in klass:
            fnames = [str(f) for f in r_value(md["feature_names"])]
            art = xgb_raw_to_artifact(bytes(r_value(md["raw"])), fnames)
        elif "randomForest" in klass:
            art = rf_to_artifact(model, variables)
        else:
            raise NotImplementedError(f"model class {klass}")
        art["params"]["variables"] = variables
        out[name] = art
    if register:
        from .registry import _cache
        _cache.update(out)
    return out
