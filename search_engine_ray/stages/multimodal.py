"""Multimodal column plumbing — decode / feature-extract stages for
opaque ``binary`` media payloads with typed metadata.

The sandbox ships no codec libraries, so decode is implemented for the
dependency-free formats only — images as binary PPM (P6) / uncompressed
24-bit BMP, audio as RIFF/WAVE PCM-16, video as YUV4MPEG2 (y4m) with
stride frame-sampling — all pure numpy; compressed formats fall back to
a deterministic stub (seeded from the payload bytes). Everything
Ray-side is real and tested: the media schema, the actor-pool
``map_batches`` signature (decoder state loaded once per actor),
small-batch sizing for wide binary rows, and the fixed-dim
``list<float32>`` feature output layout.
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


def luma_features(luma: np.ndarray, feature_dim: int) -> np.ndarray:
    """``feature_dim``-cell mean grid over a 2-D luma plane (block-mean
    downsample — the resize step of a real feature extractor), [0, 1]."""
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


def image_features(pixels: np.ndarray, feature_dim: int) -> np.ndarray:
    """Deterministic visual features from decoded uint8[h, w, 3] pixels:
    a ``feature_dim``-cell mean-luma grid (see :func:`luma_features`)."""
    luma = (
        0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
    ).astype(np.float64)
    return luma_features(luma, feature_dim)


# ---------------------------------------------------------------------------
# Dependency-free audio codec: RIFF/WAVE PCM 16-bit
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE (PCM, 16-bit, 1 channel) bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")     # byte rate
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits/sample
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAVE PCM 16-bit -> (float64 mono waveform in [-1, 1], rate);
    None for anything else (compressed codecs need real libraries)."""
    if not payload.startswith(b"RIFF") or payload[8:12] != b"WAVE" or len(payload) < 36:
        return None
    pos, rate, channels, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if int.from_bytes(body[0:2], "little") != 1:  # PCM only
                return None
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            if int.from_bytes(body[14:16], "little") != 16:
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if rate is None or data is None or channels not in (1, 2):
        return None
    x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    if channels == 2:
        x = x[: len(x) // 2 * 2].reshape(-1, 2).mean(axis=1)
    return x, rate


def audio_features(wave: np.ndarray, feature_dim: int) -> np.ndarray:
    """Windowed RMS-energy profile: the waveform split into
    ``feature_dim`` equal windows, RMS per window, float32 in [0, 1]."""
    edges = np.linspace(0, len(wave), feature_dim + 1).astype(np.int64)
    out = np.zeros(feature_dim, np.float32)
    for i in range(feature_dim):
        seg = wave[edges[i] : max(edges[i + 1], edges[i] + 1)]
        if len(seg):
            out[i] = np.sqrt(np.mean(seg * seg))
    return out


# ---------------------------------------------------------------------------
# Dependency-free video container: YUV4MPEG2 (y4m) + frame sampling
# ---------------------------------------------------------------------------

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """uint8[n, h, w] luma frames -> YUV4MPEG2 (C420, constant chroma)."""
    n, h, w = frames.shape
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420jpeg\n" % (w, h, fps)]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def iter_y4m_frames(payload: bytes):
    """Parse YUV4MPEG2: yields the uint8[h, w] LUMA plane per frame
    (chroma skipped — features are luma-based). Supports C420*/C444/Cmono;
    returns immediately (no yields) for anything else."""
    if not payload.startswith(b"YUV4MPEG2"):
        return
    eol = payload.index(b"\n")
    w = h = 0
    chroma = "420"
    for tok in payload[9:eol].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:].decode()
    if not (w and h):
        return
    luma_n = w * h
    if chroma.startswith("420"):
        frame_n = luma_n + 2 * (h // 2) * (w // 2)
    elif chroma.startswith("444"):
        frame_n = 3 * luma_n
    elif chroma.startswith("mono"):
        frame_n = luma_n
    else:
        return
    pos = eol + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            return
        pos = payload.index(b"\n", pos) + 1  # FRAME line may carry params
        if pos + luma_n > len(payload):
            return
        yield np.frombuffer(payload, np.uint8, count=luma_n, offset=pos).reshape(h, w)
        pos += frame_n


def sample_video_features(
    payload: bytes, feature_dim: int, max_frames: int = 4
) -> np.ndarray | None:
    """Frame-sample + featurize a y4m payload: up to ``max_frames``
    frames taken evenly across the stream (every ceil(n/max)-th frame —
    the classic stride sampler that needs no second pass), each reduced
    to a :func:`luma_features` grid, averaged. None if not y4m."""
    frames = list(iter_y4m_frames(payload))
    if not frames:
        return None
    stride = max(1, -(-len(frames) // max_frames))
    picked = frames[::stride][:max_frames]
    return np.mean(
        [luma_features(f.astype(np.float64), feature_dim) for f in picked], axis=0
    ).astype(np.float32)


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
        seed = int.from_bytes(hashlib.md5((t or "").encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        kind = i % 3
        if kind == 0:
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            payloads.append(encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)))
        elif kind == 1 and i % 5 != 4:  # real WAV; every 5th stays opaque (stub path)
            samples = (rng.random(256 + (i % 7) * 64) * 2 - 1) * 20000
            payloads.append(encode_wav(samples.astype(np.int16), rate=8000))
        elif kind == 2 and i % 5 != 3:  # real y4m; every 5th stays opaque (stub path)
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            frames = rng.integers(0, 256, size=(2 + i % 3, h, w), dtype=np.uint8)
            payloads.append(encode_y4m(frames))
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
        """``backend``: 'auto' (real pure-numpy decode for PPM/BMP/WAV/
        y4m payloads, stub otherwise), 'ppm' (real decode only, error on
        undecodable), or 'stub'. Real codec libraries are never
        auto-selected — an installed PIL must not change output (it
        would be a latent behavioural change when the package is
        deployed alongside Pillow)."""
        self.feature_dim = feature_dim
        if backend not in ("auto", "ppm", "stub"):
            raise ValueError(f"unknown media backend {backend!r}")
        self._backend = backend

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        """-> float32[feature_dim] features. Payloads in the
        dependency-free formats are REALLY decoded (pure numpy): images
        as binary PPM 'P6' / uncompressed 24-bit BMP (luma-grid
        features, ``decode_image``), audio as RIFF/WAVE PCM-16
        (windowed-RMS profile, ``decode_wav``), video as YUV4MPEG2 with
        stride frame-sampling (``sample_video_features``). Anything else
        falls back to the deterministic stub (md5-seeded uniform —
        stable across runs/actors), because the sandbox ships no
        compressed-codec libraries."""
        if self._backend in ("auto", "ppm"):
            feats: np.ndarray | None = None
            if media_type == "image":
                pixels = decode_image(payload)
                if pixels is not None:
                    feats = image_features(pixels, self.feature_dim)
            elif media_type == "audio":
                wav = decode_wav(payload)
                if wav is not None:
                    feats = audio_features(wav[0], self.feature_dim)
            elif media_type == "video":
                feats = sample_video_features(payload, self.feature_dim)
            if feats is not None:
                return feats
            if self._backend == "ppm":
                raise ValueError(
                    f"backend 'ppm' could not decode a {media_type!r} payload "
                    "(needs PPM/BMP, WAV-PCM16 or YUV4MPEG2)"
                )
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
