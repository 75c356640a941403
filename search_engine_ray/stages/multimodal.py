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


# ---------------------------------------------------------------------------
# Dependency-free image codec: binary PPM (P6) and uncompressed 24-bit BMP
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8[h, w, 3] -> binary PPM (P6) bytes."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Binary PPM (P6, maxval 255) -> uint8[h, w, 3]; None if not P6."""
    if not payload.startswith(b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace/comment separated
    vals, pos = [], 2
    while len(vals) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        return None
    n = w * h * 3
    data = np.frombuffer(payload, np.uint8, count=n, offset=pos)
    return data.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit bottom-up BMP -> uint8[h, w, 3] RGB; None if
    not that exact (most common) BMP flavour."""
    if not payload.startswith(b"BM") or len(payload) < 54:
        return None
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = abs(h)
    data = np.frombuffer(payload, np.uint8, count=stride * rows, offset=off)
    img = data.reshape(rows, stride)[:, : w * 3].reshape(rows, w, 3)
    if h > 0:  # bottom-up storage
        img = img[::-1]
    return img[:, :, ::-1]  # BGR -> RGB


def decode_image(payload: bytes) -> np.ndarray | None:
    """Sniff + decode PPM(P6)/BMP payloads; None for anything else."""
    if not payload:
        return None
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    return None


def image_features(pixels: np.ndarray, feature_dim: int) -> np.ndarray:
    """Deterministic visual features from decoded uint8[h, w, 3] pixels:
    a ``feature_dim``-cell mean-luma grid (block-mean downsample — the
    resize step of a real feature extractor), values in [0, 1]."""
    luma = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    ).astype(np.float64)
    gh = max(1, int(np.sqrt(feature_dim)))
    gw = (feature_dim + gh - 1) // gh
    h, w = luma.shape
    ys = np.linspace(0, h, gh + 1).astype(np.int64)
    xs = np.linspace(0, w, gw + 1).astype(np.int64)
    out = np.zeros(gh * gw, np.float32)
    for i in range(gh):
        for j in range(gw):
            cell = luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i * gw + j] = cell.mean() / 255.0
    return out[:feature_dim]


def synth_media_table(texts: list[str], base_id: int = 0, ids: list[int] | None = None) -> pa.Table:
    """Deterministic media rows exercising BOTH decode paths: every third
    id is a REAL encoded PPM image (pixels seeded from the text digest),
    the rest carry opaque utf8 payloads (the stub path for audio/video).
    Every attribute derives from the media ID (not enumeration order),
    so output is invariant to batching — safe inside ``map_batches``."""
    n = len(texts)
    if ids is None:
        ids = list(range(base_id, base_id + n))
    types = ["image", "audio", "video"]
    payloads = []
    for i, t in zip(ids, texts):
        if i % 3 == 0:
            seed = int.from_bytes(hashlib.md5((t or "").encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            payloads.append(encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)))
        else:
            payloads.append((t or "").encode())
    return pa.table(
        {
            "media_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "media_type": pa.array([types[i % 3] for i in ids], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array([64 + (i % 8) * 16 for i in ids], pa.int32()),
            "meta_height": pa.array([64 + (i % 5) * 16 for i in ids], pa.int32()),
            "meta_duration_ms": pa.array([0 if i % 3 == 0 else 1000 + i for i in ids], pa.int32()),
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

    def __init__(self, feature_dim: int = FEATURE_DIM, backend: str = "auto"):
        """``backend``: 'auto' (ppm for PPM/BMP payloads, stub otherwise),
        'ppm' (pure-numpy decoder, error on non-PPM/BMP), or 'stub'.
        Real codec libraries are never auto-selected — an installed PIL
        must not change output (it would be a latent behavioural change
        when the package is deployed alongside Pillow)."""
        self.feature_dim = feature_dim
        if backend not in ("auto", "ppm", "stub"):
            raise ValueError(f"unknown media backend {backend!r}")
        self._backend = backend

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        """-> float32[feature_dim] features. Image payloads in the two
        dependency-free formats (binary PPM 'P6', uncompressed 24-bit
        BMP) are REALLY decoded (pure numpy, see ``decode_image``) and
        featurized as an 8x4 luma grid peeled from the resized pixels;
        everything else falls back to the deterministic stub (md5-seeded
        uniform — stable across runs/actors), because the sandbox ships
        no audio/video codecs."""
        if media_type == "image" and self._backend in ("auto", "ppm"):
            pixels = decode_image(payload)
            if pixels is not None:
                return image_features(pixels, self.feature_dim)
            if self._backend == "ppm":
                raise ValueError("backend 'ppm' requires a PPM(P6) or BMP payload")
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
