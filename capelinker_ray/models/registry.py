"""Pretrained-model registry: name -> frozen JSON artifact.

The reference publishes ``pretrained_models`` as a named list bundled in
package data (/root/reference/data_raw/pretrained.R:489-513) and resolves
models by ``modstring`` at predict time (/root/reference/R/pred.R:27-40,
prep.R:77-80). Here the registry is a directory of JSON artifacts shipped
with the package; each artifact embeds its ``feature_names`` so pipelines
can introspect required features exactly like the reference's
``pretrained_models[[m]]$variables``.

Artifacts are produced deterministically by ``scripts/train_pretrained.py``
from the seeded synthetic labeled-pair corpus (FIXTURES.md F1).
"""

from __future__ import annotations

import os

from .trees import load_artifact

ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "artifacts")

_cache: dict[str, dict] = {}


def artifact_path(name: str) -> str:
    return os.path.join(ARTIFACT_DIR, f"{name}.json")


def pretrained_models() -> list[str]:
    if not os.path.isdir(ARTIFACT_DIR):
        return []
    return sorted(f[:-5] for f in os.listdir(ARTIFACT_DIR) if f.endswith(".json"))


def resolve_artifact(model: str | dict) -> dict:
    """Accept a registry name, a path to a JSON artifact, or a loaded dict."""
    if isinstance(model, dict):
        return model
    if os.path.sep in model or model.endswith(".json"):
        return load_artifact(model)
    if model not in _cache:
        p = artifact_path(model)
        if not os.path.exists(p):
            raise KeyError(
                f"unknown pretrained model {model!r}; available: "
                f"{pretrained_models()} (train via scripts/train_pretrained.py)")
        _cache[model] = load_artifact(p)
    return _cache[model]
