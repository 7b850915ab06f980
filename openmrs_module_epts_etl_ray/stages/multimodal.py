"""Multimodal column plumbing (image/audio/video as opaque binary columns).

The decode/feature kernels require codec libraries not present in this
container; they are STUBBED behind ``NotImplementedError`` with a
deterministic fake used by tests. Everything Ray-side is real: typed binary
schema, actor-pool stage shape (codec "loaded" once per actor), small batch
sizes for wide binary payloads, and typed output layout.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.large_binary()),   # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),            # nullable typed metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)


def synthesize_media(n: int, seed: int = 5) -> rd.Dataset:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(64, 4096, n)]
    t = pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["image" if i % 3 else "audio" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["image/png" if i % 3 else "audio/wav" for i in range(n)]),
            "width": pa.array([64 + (i % 8) * 32 if i % 3 else None for i in range(n)], pa.int32()),
            "height": pa.array([64 if i % 3 else None for i in range(n)], pa.int32()),
            "duration_ms": pa.array([None if i % 3 else 1000 + i for i in range(n)], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )
    return rd.from_arrow(t)


class DecodeStage:
    """Actor-pool decode stage. ``fake=True`` produces a deterministic
    feature vector from the payload bytes (sha256-seeded) so the pipeline
    shape is testable without codecs; ``fake=False`` raises until a real
    codec is wired in (PIL / libav are not available in this container).
    """

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim
        if not fake:
            raise NotImplementedError(
                "real media decoding requires codec libraries (PIL/libav) "
                "not present in this environment; use fake=True"
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for payload in batch["payload"]:
            digest = hashlib.sha256(payload).digest()
            v = np.frombuffer(digest[: self.feature_dim * 4], dtype=np.uint32)
            feats.append((v / np.float64(2**32)).astype(np.float64))
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "kind": batch["kind"].to_numpy(),
            "feature": feats,
            "payload_bytes": batch["payload"].map(len).astype("int64").to_numpy(),
        })


def decode_features(ds: rd.Dataset, *, batch_size: int = 256, concurrency=(1, 4)) -> rd.Dataset:
    """Small batches — binary payloads are wide; concurrency × batch must fit heap."""
    return ds.map_batches(DecodeStage, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
