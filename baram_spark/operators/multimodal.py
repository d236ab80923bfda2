"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs, and
implements the Spark-side pipeline — schema, partition-friendly batch shape,
Arrow UDF signatures — for decode / feature-extract / resize / frame-sample.

Decode support is two-tier:

- **Real decoders** (pure stdlib + numpy, no external codecs needed) for
  uncompressed formats: 24-bit BMP and binary PPM (P6) images, PCM WAV
  audio. These produce real pixel/sample arrays; features and resize
  operate on actual decoded data.
- **Deterministic stub** for compressed formats (JPEG/PNG/MP3/MP4) whose
  codecs (PIL/ffmpeg/torchaudio) are NOT in this container — clearly
  marked in ``_decode_stub``; swap its body for a real decoder in
  production. The ``decoded`` output column records which tier ran.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "feat array<float>, ok boolean, decoded boolean"
)

FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms int, frame_sha string"

RESIZED_SCHEMA = (
    "media_id long, width int, height int, pixels binary, decoded boolean"
)


# -- real decoders (uncompressed formats; stdlib + numpy only) --------------

def decode_image(payload: bytes) -> np.ndarray:
    """Decode 24-bit BMP or binary PPM (P6) → HxWx3 uint8 RGB.

    Raises ValueError for formats needing external codecs (JPEG/PNG...)."""
    if payload[:2] == b"BM":
        off = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        if bpp != 24:
            raise ValueError(f"only 24-bit BMP supported, got {bpp}")
        row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        arr = np.frombuffer(
            payload, np.uint8, count=row_bytes * abs(h), offset=off
        ).reshape(abs(h), row_bytes)
        px = arr[:, : w * 3].reshape(abs(h), w, 3)[..., ::-1]  # BGR→RGB
        if h > 0:  # positive height = bottom-up row order
            px = px[::-1]
        return np.ascontiguousarray(px)
    if payload[:2] == b"P6":
        pos, vals = 2, []
        while len(vals) < 3:
            while payload[pos] in b" \t\r\n":
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment line
                while payload[pos] not in b"\r\n":
                    pos += 1
                continue
            start = pos
            while payload[pos] not in b" \t\r\n":
                pos += 1
            vals.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxv = vals
        if maxv > 255:
            raise ValueError("16-bit PPM unsupported")
        return np.frombuffer(
            payload, np.uint8, count=w * h * 3, offset=pos
        ).reshape(h, w, 3)
    raise ValueError("compressed image format — needs an external codec")


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV → (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload)) as wf:
        n, ch, width = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    return samples, rate


def resize_image(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index math)."""
    sh, sw = px.shape[:2]
    ys = np.minimum((np.arange(h) * sh) // h, sh - 1)
    xs = np.minimum((np.arange(w) * sw) // w, sw - 1)
    return px[ys][:, xs]


def image_features(px: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real image features: normalized grayscale histogram."""
    gray = px.astype(np.float64).mean(axis=2)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
    total = hist.sum() or 1
    return (hist / total).astype(np.float32)


def audio_features(samples: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real audio features: per-segment RMS energy over ``dim`` windows."""
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    segs = np.array_split(samples, dim)
    rms = np.array([np.sqrt(np.mean(s * s)) if s.size else 0.0 for s in segs])
    return rms.astype(np.float32)


def try_decode_features(payload: bytes, kind: str,
                        dim: int = 32) -> np.ndarray | None:
    """Real decode + real features when the format allows; None otherwise."""
    try:
        if kind == "image":
            return image_features(decode_image(payload), dim)
        if kind == "audio":
            samples, _ = decode_audio(payload)
            return audio_features(samples, dim)
    except Exception:
        return None
    return None


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (no media libs in this container).

    Production: replace with PIL.Image.open / soundfile.read / pyav frames.
    The fake derives a fixed-length float vector from the payload bytes so
    downstream plumbing (batching, schemas, feature joins) is fully
    exercised and reproducible.
    """
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return arr / 255.0  # 32-dim pseudo-feature


def extract_features(media: DataFrame, feat_dim: int = 32) -> DataFrame:
    """binary payload → fixed-dim feature vector (Arrow-batched).

    Uncompressed formats (BMP/PPM/WAV) decode for REAL and get real
    histogram/energy features (``decoded=true``); compressed formats fall
    back to the deterministic stub (``decoded=false``)."""

    def run(iterator):
        for pdf in iterator:
            feats, shas, sizes, oks, decs = [], [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                real = try_decode_features(raw, kind, feat_dim)
                try:
                    if real is not None:
                        feats.append(real.tolist())
                        decs.append(True)
                    else:
                        feats.append(_decode_stub(raw, kind)[:feat_dim].tolist())
                        decs.append(False)
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
                    decs.append(False)
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "sha256": shas,
                    "feat": feats,
                    "ok": pd.Series(oks, dtype="bool"),
                    "decoded": pd.Series(decs, dtype="bool"),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Decode + nearest-neighbor resize → raw RGB bytes (HxWx3 row-major).

    Rows whose format can't decode without external codecs come back with
    ``pixels=null, decoded=false`` (the production swap point: put a real
    decoder in decode_image and every format flows through)."""

    def run(iterator):
        for pdf in iterator:
            out = {"media_id": [], "width": [], "height": [],
                   "pixels": [], "decoded": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                try:
                    px = resize_image(decode_image(raw), width, height)
                    out["pixels"].append(px.tobytes())
                    out["decoded"].append(True)
                except Exception:
                    out["pixels"].append(None)
                    out["decoded"].append(False)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "pixels": out["pixels"],
                    "decoded": pd.Series(out["decoded"], dtype="bool"),
                }
            )

    return media.filter("kind = 'image'").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: emits one row per sampled frame with
    a deterministic frame fingerprint (decode stubbed as above)."""

    def run(iterator):
        for pdf in iterator:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_sha": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                raw = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(int((dur or 0) // every_ms), 0))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_sha"].append(
                        hashlib.sha256(raw + i.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "ts_ms": pd.Series(out["ts_ms"], dtype="int32"),
                    "frame_sha": out["frame_sha"],
                }
            )

    return media.filter("kind = 'video'").mapInPandas(run, schema=FRAME_SCHEMA)
