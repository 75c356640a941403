"""Multimodal column plumbing — decode / feature-extract stages for
opaque ``binary`` media payloads with typed metadata.

The sandbox ships no image/audio libraries, so the actual codec work is
STUBBED: ``MediaFeatureExtractor`` tries to import a real decoder (PIL)
and otherwise falls back to a deterministic fake (seeded from the
payload bytes). Everything Ray-side is real and tested: the media
schema, the actor-pool ``map_batches`` signature (decoder state loaded
once per actor), small-batch sizing for wide binary rows, and the
fixed-dim ``list<float32>`` feature output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32


def synth_media_table(texts: list[str], base_id: int = 0) -> pa.Table:
    """Deterministic fake media rows (payload = utf8 bytes standing in
    for encoded image/audio bytes) — exercises the binary-column path."""
    n = len(texts)
    types = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array(np.arange(base_id, base_id + n), pa.int64()),
            "media_type": pa.array([types[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array([(t or "").encode() for t in texts], pa.binary()),
            "meta_width": pa.array([64 + (i % 8) * 16 for i in range(n)], pa.int32()),
            "meta_height": pa.array([64 + (i % 5) * 16 for i in range(n)], pa.int32()),
            "meta_duration_ms": pa.array([0 if i % 3 == 0 else 1000 + i for i in range(n)], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decoder/model loaded ONCE per actor in
    ``__init__``; per-batch decode + featurize in ``__call__``.

    Use with small ``batch_size`` (payloads are wide):
    ``ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
    batch_size=64, concurrency=(1, N), num_cpus=1)``.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        try:  # real decoder if the environment has one
            import PIL.Image  # noqa: F401

            self._backend = "pil"
        except ImportError:
            self._backend = "stub"

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self._backend == "pil" and media_type == "image":
            raise NotImplementedError(
                "real image decode path: PIL.Image.open(io.BytesIO(payload)) "
                "-> resize -> np.asarray; not exercised in this sandbox"
            )
        # deterministic stub: features derived from the payload digest so
        # output is stable across runs/actors (md5 -> seeded uniform)
        digest = hashlib.md5(payload or b"").digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.random(self.feature_dim, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats = np.stack([self._decode(p, t) for p, t in zip(payloads, types)])
        n_bytes = np.array([len(p or b"") for p in payloads], np.int64)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "feature": pa.array(list(feats), pa.list_(pa.float32(), self.feature_dim)),
            }
        )
