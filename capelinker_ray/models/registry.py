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
        if os.path.exists(p):
            _cache[model] = load_artifact(p)
        else:
            # fall back to the reference's bundled pretrained models
            # (imported from pretrained_models.rda on first use)
            from .import_r import REFERENCE_MODELS_RDA, \
                import_reference_models
            if os.path.exists(REFERENCE_MODELS_RDA):
                import_reference_models(register=True)
            if model not in _cache:
                raise KeyError(
                    f"unknown pretrained model {model!r}; available: "
                    f"{sorted(set(pretrained_models()) | set(_cache))} "
                    f"(train via scripts/train_pretrained.py)")
    return _cache[model]
