"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata travelling next to
them (media_type, width/height or sample_rate, byte length). The Ray-side
plumbing — schema, actor-pool stage shape, small batches for large
payloads, output layout — is real and tested; the actual codec work is
STUBBED (no PIL/ffmpeg in this container): ``decode_fn=None`` raises
``NotImplementedError`` at actor construction unless ``fake=True`` installs
the deterministic fake decoder (byte-histogram "features"), which is what
tests and the driver exercise.

Scale notes baked in: payload stages default to SMALL batch_size (payload ×
batch × concurrency must fit worker heap), actor pools (decoder init is
expensive for real codecs), zero-copy Arrow in/out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "MediaFeaturizer", "featurize_media",
           "fake_media_table"]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
    ("meta_sample_rate", pa.int32()),
    ("n_bytes", pa.int64()),
])

N_FEATURES = 16


def _fake_decode(payloads: list[bytes | None]) -> np.ndarray:
    """Deterministic stand-in for decode+featurize: 16-bin byte histogram,
    L1-normalized. Replaced by a real codec stage outside this sandbox."""
    out = np.zeros((len(payloads), N_FEATURES), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p:
            counts = np.bincount(np.frombuffer(p, np.uint8) >> 4,
                                 minlength=N_FEATURES)
            out[i] = counts / max(counts.sum(), 1)
    return out


class MediaFeaturizer:
    """Actor-pool stage: decode/feature-extract media payloads.

    Real deployments pass ``decode_fn`` (loads its codec/model once per
    actor — that is why this is a class, not a function). ``fake=True``
    uses the deterministic byte-histogram fake."""

    def __init__(self, media_type: str = "image", decode_fn=None,
                 fake: bool = False):
        self.media_type = media_type
        if decode_fn is not None:
            self.decode = decode_fn
        elif fake:
            self.decode = _fake_decode
        else:
            raise NotImplementedError(
                "no media codecs in this environment: pass decode_fn "
                "or fake=True (deterministic byte-histogram features)")

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = self.decode(t["payload"].to_pylist())
        flat = pa.array(np.asarray(feats, np.float32).reshape(-1),
                        pa.float32())
        col = pa.FixedSizeListArray.from_arrays(flat, feats.shape[1])
        return t.append_column("media_features", col)


def featurize_media(ds, *, media_type: str = "image", decode_fn=None,
                    fake: bool = False, concurrency=(1, 4),
                    batch_size: int = 64, num_cpus: float = 1.0):
    """Dataset[MEDIA_SCHEMA] -> + media_features fixed_size_list<float32>.

    batch_size defaults SMALL: batches carry the raw payload bytes."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"media_type": media_type,
                               "decode_fn": decode_fn, "fake": fake},
        concurrency=concurrency, batch_size=batch_size, num_cpus=num_cpus,
        batch_format="pyarrow")


def fake_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic synthetic media table (tests/bench fixtures)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    types = ["image" if i % 3 else "audio" for i in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_width": pa.array([64] * n, pa.int32()),
        "meta_height": pa.array([64] * n, pa.int32()),
        "meta_sample_rate": pa.array([16000] * n, pa.int32()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MEDIA_SCHEMA)
