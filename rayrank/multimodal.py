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


#: Contract every codec adapter must satisfy: decode_features output
#: columns, in order.  The fake double and any real codec produce the
#: SAME schema by construction (DecodeStub builds the table; codecs
#: only supply the feature vector), so swapping the codec cannot break
#: downstream consumers or the driver oracles.
DECODE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("features", pa.list_(pa.float64(), 8)),
        ("payload_bytes", pa.int64()),
    ]
)

N_DECODE_FEATURES = 8


class FakeCodec:
    """Deterministic test double: 8 float features derived from the
    payload's sha256 + its length (stable across runs, no external
    libs) — the permanent stand-in while no image/audio codec ships in
    the container."""

    def decode(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(h[:32], np.uint8).astype(np.float64).reshape(8, 4)
        f = raw.mean(axis=1) / 255.0
        f[0] = len(payload) / 4096.0
        return f


class PillowCodec:
    """Real image decode behind the same interface: loads PIL ONCE per
    actor (``__init__`` — the actor-pool state rule) and emits the same
    8-float feature layout as :class:`FakeCodec` (size, mode stats,
    intensity moments).  Raises ImportError at construction when PIL is
    absent — this container has no codecs, so the adapter is exercised
    by the schema-contract test only; on a host with Pillow the SAME
    pipeline runs unchanged with ``codec=PillowCodec()``."""

    def __init__(self):
        import io

        from PIL import Image  # ImportError here ⇒ no codec in container

        self._Image = Image
        self._io = io

    def decode(self, payload: bytes) -> np.ndarray:
        img = self._Image.open(self._io.BytesIO(payload)).convert("L")
        x = np.asarray(img, np.float64) / 255.0
        f = np.zeros(N_DECODE_FEATURES)
        f[0] = len(payload) / 4096.0
        f[1] = img.width / 4096.0
        f[2] = img.height / 4096.0
        f[3] = x.mean()
        f[4] = x.std()
        f[5] = np.abs(np.diff(x, axis=0)).mean() if x.shape[0] > 1 else 0.0
        f[6] = np.abs(np.diff(x, axis=1)).mean() if x.shape[1] > 1 else 0.0
        f[7] = float(np.median(x))
        return f


class DecodeStub:
    """Actor-pool decode stage.  ``__init__`` holds the codec (loaded
    once per actor); ``__call__`` decodes a batch and ALWAYS emits
    ``DECODE_FEATURES_SCHEMA`` regardless of which codec is plugged in.

    fake=False → :class:`PillowCodec` (ImportError in codec-less
    containers); fake=True → :class:`FakeCodec`, the deterministic
    double the driver oracles pin."""

    def __init__(self, fake: bool = False):
        self.codec = FakeCodec() if fake else PillowCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self.codec.decode(p) for p in payloads]
        mat = np.stack(feats) if feats else np.zeros((0, N_DECODE_FEATURES))
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float64()), N_DECODE_FEATURES
        )
        out = pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": col,
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
            }
        )
        assert out.schema.equals(DECODE_FEATURES_SCHEMA), out.schema
        return out


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


# --------------------------------------------------------------------------
# driver-facing queries: the documents table as a stand-in media corpus
# --------------------------------------------------------------------------

MEDIA_KINDS = ("image", "audio", "video")
_HEX = "0123456789abcdef"


def media_from_documents(sf_dir: str) -> ray.data.Dataset:
    """documents → MEDIA_SCHEMA rows: payload = the utf-8 text bytes
    (the only deterministic binary source in the testdata), kind cycled
    by doc_id % 3.  This is the typed-opaque-binary ingest shape: the
    payload column is never interpreted until a decode stage."""
    import os

    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        kinds = np.asarray(MEDIA_KINDS, dtype=object)[did % 3]
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "kind": pa.array(kinds, pa.string()),
                "payload": pc.cast(t.column("text"), pa.binary()),
                "meta": pa.array(["{}"] * len(t), pa.string()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


def media_decode_features(sf_dir: str) -> ray.data.Dataset:
    """Full decode plumbing as a driver query: binary ingest →
    actor-pool :class:`DecodeStub` (fake codec: sha256-derived 8-float
    features, once-per-actor state) → vectorized unnest to
    (media_id, feat_idx, f, payload_bytes) scalar rows.

    SQL-checkable because the fake decode is pure arithmetic on the
    payload's sha256 digest: the oracle re-derives each byte from the
    hex string with an instr('0123...f') lookup and states the same
    left-associated (b0+b1+b2+b3)/4.0/255.0 expression (feature 0 is
    overwritten with octet_length/4096.0, as the stub does)."""
    feats = decode_features(media_from_documents(sf_dir), fake=True)

    def unnest(t: pa.Table):
        n = t.num_rows
        if n == 0 or "media_id" not in t.schema.names:
            return
        mat = (
            t.column("features")
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(n, 8)
        )
        mid = t.column("media_id").to_numpy(zero_copy_only=False)
        pb = t.column("payload_bytes").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "media_id": pa.array(np.repeat(mid, 8)),
                "feat_idx": pa.array(np.tile(np.arange(8, dtype=np.int64), n)),
                "f": pa.array(mat.ravel(), pa.float64()),
                "payload_bytes": pa.array(np.repeat(pb, 8)),
            }
        )

    return feats.map_batches(unnest, batch_format="pyarrow")


def _hex_byte(i: int) -> str:
    """SQL for byte i (0-based) of the sha256 hex digest column h."""
    return (
        f"(16*(instr('{_HEX}', substr(h, {2 * i + 1}, 1))-1)"
        f" + (instr('{_HEX}', substr(h, {2 * i + 2}, 1))-1))"
    )


def _feat_sql(g: int) -> str:
    if g == 0:
        return "CAST(L AS DOUBLE) / 4096.0"
    b = " + ".join(_hex_byte(4 * g + j) for j in range(4))
    return f"CAST({b} AS DOUBLE) / 4.0 / 255.0"


MEDIA_DECODE_FEATURES_SQL = (
    "WITH b AS (SELECT doc_id AS media_id, sha256(text) AS h,"
    " octet_length(encode(text)) AS L FROM documents)\n"
    + "\nUNION ALL\n".join(
        f"SELECT media_id, CAST({g} AS BIGINT) AS feat_idx,"
        f" {_feat_sql(g)} AS f, CAST(L AS BIGINT) AS payload_bytes FROM b"
        for g in range(8)
    )
)


def media_frame_sizes(sf_dir: str, num_frames: int = 4) -> ray.data.Dataset:
    """Frame-sampling plumbing as a driver query: binary ingest →
    actor-pool :class:`FrameSampler` (equal-chunk split, ≤ num_frames
    rows per payload) → (media_id, frame, chunk_bytes).  The chunk
    arithmetic (n = max(1, min(F, L)); step = max(1, L // n); slice
    lengths) is pure integer math restated verbatim in the oracle."""
    import pyarrow.compute as pc

    frames = sample_frames(media_from_documents(sf_dir), num_frames=num_frames)

    def sizes(t: pa.Table):
        if t.num_rows == 0 or "media_id" not in t.schema.names:
            return
        yield pa.table(
            {
                "media_id": t.column("media_id"),
                "frame": t.column("frame"),
                "chunk_bytes": pc.cast(
                    pc.binary_length(t.column("chunk")), pa.int64()
                ),
            }
        )

    return frames.map_batches(sizes, batch_format="pyarrow")


MEDIA_FRAME_SIZES_SQL = """
WITH b AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS L FROM documents
),
q AS (
  SELECT media_id, L, GREATEST(1, L // GREATEST(1, LEAST(4, L))) AS step,
         UNNEST(range(GREATEST(1, LEAST(4, L)))) AS f
  FROM b
)
SELECT media_id, CAST(f AS BIGINT) AS frame,
  CAST(GREATEST(0, LEAST(L, (f+1)*step) - LEAST(L, f*step)) AS BIGINT)
    AS chunk_bytes
FROM q
"""


TILE_COUNT = 4


class TileFingerprinter:
    """Actor-pool tiling stage: split each document-backed payload into
    ``tiles`` balanced codepoint ranges (start_i = ⌊i·L/n⌋ — identical
    to SQL substring arithmetic) and fingerprint each tile with
    sha256 — the patch-hash step of an image near-dup pipeline (a real
    codec would tile pixel blocks; the boundaries/plumbing/output
    layout here are the production shape).  One hasher per actor."""

    def __init__(self, tiles: int = TILE_COUNT):
        self.tiles = tiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, tile, chars, fp = [], [], [], []
        for mid, text in zip(
            batch.column("media_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            L = len(text)
            if L == 0:
                continue
            n = min(self.tiles, L)
            for i in range(n):
                a, b = i * L // n, (i + 1) * L // n
                ids.append(mid)
                tile.append(i)
                chars.append(b - a)
                fp.append(hashlib.sha256(text[a:b].encode("utf-8")).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "tile": pa.array(tile, pa.int64()),
                "tile_chars": pa.array(chars, pa.int64()),
                "fp": pa.array(fp, pa.string()),
            }
        )


def media_tile_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """(media_id, tile, tile_chars, fp) over the document-backed media
    corpus — see :class:`TileFingerprinter`.  Block-local, no shuffle;
    the fingerprint table feeds tile-level dedup downstream."""
    import os as _os

    import ray.data as _rd

    ds = _rd.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def rn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"media_id": t.column("doc_id"), "text": t.column("text")}
        )

    media = ds.map_batches(rn, batch_format="pyarrow")
    return media.map_batches(
        TileFingerprinter, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), num_cpus=1,
    )


MEDIA_TILE_FINGERPRINTS_SQL = f"""
WITH b AS (
  SELECT doc_id AS media_id, text, LENGTH(text) AS L
  FROM documents WHERE LENGTH(text) > 0
),
t AS (SELECT media_id, text, L, LEAST({TILE_COUNT}, L) AS n FROM b),
u AS (SELECT media_id, text, L, n, unnest(range(n)) AS i FROM t)
SELECT media_id, CAST(i AS BIGINT) AS tile,
  CAST((i + 1) * L // n - i * L // n AS BIGINT) AS tile_chars,
  sha256(substring(text, CAST(i * L // n + 1 AS BIGINT),
                   CAST((i + 1) * L // n - i * L // n AS BIGINT))) AS fp
FROM u
"""
