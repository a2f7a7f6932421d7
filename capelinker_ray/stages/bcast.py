"""Per-worker-process memoization of ``ray.get`` for broadcast objects.

``ray.get`` re-deserializes pickled payloads (python sets/dicts, pandas
objects — anything that is not a plasma-zero-copy numpy/arrow buffer) on
EVERY call, so a per-batch ``ray.get(ref)`` inside ``map_batches`` pays
O(|object|) per batch. Worker processes are reused across the tasks of a
stage (and across stages), so memoizing by ObjectRef makes the first batch
a worker sees pay the deserialization and every later batch free.

Only use for refs whose objects are treated as IMMUTABLE by the consumer
(the engine's broadcast contract everywhere ray.put is used).
"""

from __future__ import annotations

import ray

__all__ = ["cached_get"]

_CACHE: dict[str, object] = {}
_CACHE_MAX = 8


def cached_get(ref):
    key = ref.hex()
    if key not in _CACHE:
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
