"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs, and
implements the Spark-side pipeline — schema, partition-friendly batch shape,
Arrow UDF signatures — for decode / feature-extract / resize / frame-sample.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are deterministic fakes behind ``_decode_stub`` — clearly
marked; swap the stub body for a real decoder in production. Everything
around the stub (mapInPandas batching, metadata struct handling, output
schemas) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "feat array<float>, ok boolean"
)

FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms int, frame_sha string"


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
    """binary payload → fixed-dim feature vector (Arrow-batched)."""

    def run(iterator):
        for pdf in iterator:
            feats, shas, sizes, oks = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    vec = _decode_stub(raw, kind)[:feat_dim]
                    feats.append(vec.tolist())
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
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
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


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
