"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubbed: ``DecodeStub`` raises
``NotImplementedError`` unless constructed with ``fake=True``, in which
case it produces a deterministic fake decode (seeded by the content
bytes) — the Ray-side plumbing (schema, small batch sizes for large
payloads, actor signature, output layout) is real and tested.

Sizing note (SURVEY/steering): binary payloads dominate block size —
use small ``batch_size`` (default 32) and let ``concurrency × num_cpus``
match the node so decode doesn't starve the read stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta", pa.string()),       # JSON sidecar (codec, dims, sr, …)
    ]
)


def synthetic_media(n: int, kind: str = "image", seed: int = 0) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(64, 4096, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(["{}"] * n, pa.string()),
        }
    )


class DecodeStub:
    """Actor-pool decode stage.  ``__init__`` is where a real codec
    would load (once per actor); ``__call__`` decodes a batch.

    fake=False → NotImplementedError (codec not present in container);
    fake=True  → deterministic pseudo-decode: 8 float features derived
    from the payload's sha256 + its length (stable across runs).
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _features(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(h[:32], np.uint8).astype(np.float64).reshape(8, 4)
        f = raw.mean(axis=1) / 255.0
        f[0] = len(payload) / 4096.0
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not installed in this container; "
                "construct DecodeStub(fake=True) for the deterministic "
                "test double"
            )
        feats = [self._features(p) for p in batch.column("payload").to_pylist()]
        mat = np.stack(feats) if feats else np.zeros((0, 8))
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float64()), 8
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": col,
                "payload_bytes": pa.array(
                    [len(p) for p in batch.column("payload").to_pylist()],
                    pa.int64(),
                ),
            }
        )


def decode_features(
    media: ray.data.Dataset,
    fake: bool = False,
    concurrency: int = 4,
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Binary payload → feature vectors via an actor pool (small batches:
    payloads are large; the pool holds codec state)."""
    return media.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class FrameSampler:
    """Deterministic frame sampling for "video" payloads: split the
    byte stream into ``num_frames`` equal chunks and emit one row per
    sampled chunk (real frame decoding would live here)."""

    def __init__(self, num_frames: int = 4):
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, chunks = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            n = max(1, min(self.num_frames, len(payload)))
            step = max(1, len(payload) // n)
            for f in range(n):
                ids.append(mid)
                frames.append(f)
                chunks.append(payload[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int64()),
                "chunk": pa.array(chunks, pa.binary()),
            }
        )


def sample_frames(
    media: ray.data.Dataset, num_frames: int = 4, concurrency: int = 4
) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"num_frames": num_frames},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, concurrency),
    )
