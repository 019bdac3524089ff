"""Sequence packing: the concat-and-chunk training-data layout.

The standard LLM pretraining step — concatenate every document's tokens
in a fixed global order (doc_id) and cut the stream into fixed-capacity
sequences (``SEQ_CAPACITY`` tokens) — reduces to a GLOBAL EXCLUSIVE
PREFIX SUM over per-document token counts: a doc starting at stream
offset ``st`` with ``n`` tokens lands in sequences ``st // C`` through
``(st + n − 1) // C``.  Pure integer arithmetic end to end, so the SQL
oracle (one window cumsum) matches bit-trivially.

Distributed prefix-sum shape (the new primitive here):

1. per-doc token counts are computed per row (a document is ONE parquet
   row, so no reduce is needed), vectorized from the split-list offsets;
2. docs are assigned a DETERMINISTIC bucket ``doc_id // BUCKET_SPAN`` —
   deterministic from the data, never from runtime batching, so the two
   consumers below can recompute it consistently without materializing
   anything;
3. bucket token totals (one keyed re-agg of pre-reduced partials,
   ≤ |buckets| rows) come to the driver, which exclusive-scans them in
   bucket order — the only inherently sequential step, O(|buckets|)
   with |buckets| = ceil(max_doc_id / BUCKET_SPAN) (size BUCKET_SPAN so
   this stays ~1e6 rows at trillion-doc scale; a second scan level
   would extend it);
4. one bucket-keyed repartition co-locates each bucket, an in-block
   lexsort + cumsum yields the local exclusive prefix, and
   ``start = bucket_offset + local_prefix``.

Only (doc_id, n_tokens, bucket) int64 triples ever shuffle — the text
column never leaves pass 1's streaming scan.

Tokenization contract: whitespace split of the trimmed text, empty
tokens dropped (byte-identical to the ``token_counts`` oracle); docs
with zero tokens are excluded on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import configure_data_context
from .shuffle import keyed_reagg

configure_data_context()  # entry path: hash-shuffle strategy required

P = 8
SEQ_CAPACITY = 256
BUCKET_SPAN = 32


def _doc_token_counts(
    sf_dir: str, carry: tuple[str, ...] = ()
) -> ray.data.Dataset:
    """(doc_id, n_tokens, bucket, *carry) per document with
    n_tokens > 0, from ``{sf_dir}/documents.parquet``."""
    return _doc_token_counts_ds(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", *carry],
        ),
        carry,
    )


def _doc_token_counts_ds(
    docs: ray.data.Dataset, carry: tuple[str, ...] = ()
) -> ray.data.Dataset:
    """(doc_id, n_tokens, bucket, *carry) per document with
    n_tokens > 0.  ``carry`` columns ride along unchanged."""

    def count(t: pa.Table):
        if len(t) == 0:
            return
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        # trimmed non-empty text splits into only non-empty tokens;
        # the sole empty-token case is the empty doc ([""] → 0)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        n = np.where(empty, np.int64(0), lens.astype(np.int64))
        keep = n > 0
        if not keep.any():
            return
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        cols = {
            "doc_id": pa.array(doc),
            "n_tokens": pa.array(n[keep]),
            "bucket": pa.array(doc // BUCKET_SPAN),
        }
        mask = pa.array(keep)
        for c in carry:
            cols[c] = t.column(c).combine_chunks().filter(mask)
        yield pa.table(cols)

    return docs.map_batches(count, batch_format="pyarrow")


def pack_sequences(
    sf_dir: str, capacity: int = SEQ_CAPACITY
) -> ray.data.Dataset:
    """Per doc: (doc_id, n_tokens, seq_first, seq_last) under the
    concat-and-chunk rule (module docstring)."""
    return pack_sequences_ds(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        ),
        capacity,
    )


def pack_sequences_ds(
    docs: ray.data.Dataset, capacity: int = SEQ_CAPACITY
) -> ray.data.Dataset:
    """Dataset-input core of :func:`pack_sequences` (bench feeds the
    tiled scaling corpus here)."""
    counts = _doc_token_counts_ds(docs)

    def pre(t: pa.Table):
        if len(t) == 0 or "bucket" not in t.schema.names:
            return
        g = t.group_by(["bucket"]).aggregate([("n_tokens", "sum")])
        yield g.rename_columns(["bucket", "n_tokens"])

    bucket_partials = counts.map_batches(pre, batch_format="pyarrow")
    bucket_sums = keyed_reagg(
        bucket_partials, ["bucket"], [("n_tokens", "sum")], num_partitions=P
    ).take_all()  # ≤ |buckets| rows — the one driver-side (sequential) scan

    bucket_sums.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    run = 0
    for r in bucket_sums:
        offsets[r["bucket"]] = run
        run += int(r["n_tokens"])

    co = counts.repartition(P, keys=["bucket"])

    def assign(t: pa.Table):
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, b))
        b, doc, n = b[order], doc[order], n[order]
        # exclusive cumsum, reset at bucket boundaries
        cum = np.cumsum(n)
        local = cum - n
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        base = local[starts]  # stream offset already consumed per bucket
        local = local - np.repeat(base, np.diff(np.r_[starts, len(b)]))
        off = np.fromiter((offsets[x] for x in b), np.int64, len(b))
        st = off + local
        yield pa.table(
            {
                "doc_id": pa.array(doc),
                "n_tokens": pa.array(n),
                "seq_first": pa.array(st // capacity),
                "seq_last": pa.array((st + n - 1) // capacity),
            }
        )

    return co.map_batches(assign, batch_size=None, batch_format="pyarrow")


PACK_SEQUENCES_SQL = f"""
WITH tok AS (
  SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
    array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
    AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM tok WHERE n_tokens > 0
)
SELECT doc_id, n_tokens,
  st // {SEQ_CAPACITY} AS seq_first,
  (st + n_tokens - 1) // {SEQ_CAPACITY} AS seq_last
FROM p
"""


def packed_sequence_stats(
    sf_dir: str, capacity: int = SEQ_CAPACITY
) -> ray.data.Dataset:
    """Per sequence id: how many docs START in it and how many tokens
    it holds — the packing-efficiency report (last sequence may be
    short; every other sequence holds exactly ``capacity`` tokens by
    construction, so the token count is derived, not re-summed: this
    re-aggregates only the tiny (doc → seq_first) assignment)."""
    packed = pack_sequences(sf_dir, capacity)

    def pre(t: pa.Table):
        if len(t) == 0 or "seq_first" not in t.schema.names:
            return
        g = (
            t.select(["seq_first", "n_tokens"])
            .rename_columns(["seq_id", "n_tokens"])
            .append_column("docs_started", pa.array(np.ones(len(t), np.int64)))
            .group_by(["seq_id"])
            .aggregate([("docs_started", "sum"), ("n_tokens", "sum")])
        )
        yield g.rename_columns(["seq_id", "docs_started", "n_tokens"])

    partials = packed.map_batches(pre, batch_format="pyarrow")
    return keyed_reagg(
        partials,
        ["seq_id"],
        [("docs_started", "sum"), ("n_tokens", "sum")],
        num_partitions=P,
    )


SHUFFLE_BUCKET_BITS = 8  # 256 hash-range buckets


def shuffle_order(
    sf_dir: str, bits: int = SHUFFLE_BUCKET_BITS
) -> ray.data.Dataset:
    """(doc_id, pos): the DETERMINISTIC global training-shuffle
    permutation — pos = 0-based rank of ``splitmix64(doc_id)``.

    A global sort expressed as the same two-level prefix-sum shape as
    :func:`pack_sequences`, except the bucket key is the hash's HIGH
    ``bits`` (so bucket order IS hash order and bucket sizes are
    uniform regardless of doc_id skew): per-block bucket counts →
    one keyed re-agg (≤ 2^bits rows to the driver's exclusive scan)
    → one bucket-keyed repartition → in-block sort by hash.  Only
    (doc_id, hash, bucket) int64 triples shuffle; splitmix64 is a
    bijection on uint64, so ranks are total (no tie rule needed) and
    the permutation replays bit-identically across runs and cluster
    sizes — unlike ``Dataset.random_shuffle``."""
    from .sketch import splitmix64

    shift = np.uint64(64 - bits)

    def hb(t: pa.Table):
        if len(t) == 0:
            return
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(doc.astype(np.uint64))
        yield pa.table(
            {
                "doc_id": pa.array(doc),
                "h": pa.array(h.view(np.int64)),
                "bucket": pa.array((h >> shift).astype(np.int64)),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(hb, batch_format="pyarrow")

    def pre(t: pa.Table):
        if len(t) == 0 or "bucket" not in t.schema.names:
            return
        g = (
            t.select(["bucket"])
            .append_column("cnt", pa.array(np.ones(len(t), np.int64)))
            .group_by(["bucket"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["bucket", "cnt"])

    counts = keyed_reagg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["bucket"],
        [("cnt", "sum")],
        num_partitions=P,
    ).take_all()
    counts.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    run = 0
    for r in counts:
        offsets[r["bucket"]] = run
        run += int(r["cnt"])

    co = ds.repartition(P, keys=["bucket"])

    def rank(t: pa.Table):
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((h, b))
        b, h, doc = b[order], h[order], doc[order]
        local = np.arange(len(b), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        local -= np.repeat(local[starts], np.diff(np.r_[starts, len(b)]))
        off = np.fromiter((offsets[x] for x in b), np.int64, len(b))
        yield pa.table({"doc_id": pa.array(doc), "pos": pa.array(off + local)})

    return co.map_batches(rank, batch_size=None, batch_format="pyarrow")


def mixture_sample(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, source, n_tokens): the token-budget mixture selection —
    per source, walk documents in splitmix64(doc_id) hash order and
    keep them while the running token total stays within that source's
    budget (``total_tokens(source) // 2``; inclusive rule
    ``cum ≤ budget``).  The standard "sample each corpus down to its
    mixture weight" pretraining step, deterministic end to end.

    Same grouped two-level prefix sum as :func:`shuffle_order` with a
    compound (source, hash-range) bucket: per-source budgets AND
    per-bucket token offsets both come from ONE tiny keyed re-agg
    (≤ |sources|·2^bits rows), so a giant source never concentrates in
    one partition — the in-block step only ever sees one hash-range
    slice of it.  Pure integer thresholding: replays bit-identically
    at any cluster size, and the SQL oracle's window cumsum matches
    exactly."""
    from .sketch import splitmix64

    bits = SHUFFLE_BUCKET_BITS
    shift = np.uint64(64 - bits)
    counts = _doc_token_counts(sf_dir, carry=("source",))

    def hb(t: pa.Table):
        if len(t) == 0 or "doc_id" not in t.schema.names:
            return
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(doc.astype(np.uint64))
        yield (
            t.select(["doc_id", "source", "n_tokens"])
            .append_column("h", pa.array(h.view(np.int64)))
            .append_column("hb", pa.array((h >> shift).astype(np.int64)))
        )

    ds = counts.map_batches(hb, batch_format="pyarrow")

    def pre(t: pa.Table):
        if len(t) == 0 or "hb" not in t.schema.names:
            return
        g = (
            t.select(["source", "hb", "n_tokens"])
            .group_by(["source", "hb"])
            .aggregate([("n_tokens", "sum")])
        )
        yield g.rename_columns(["source", "hb", "n_tokens"])

    partials = keyed_reagg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["source", "hb"],
        [("n_tokens", "sum")],
        num_partitions=P,
    ).take_all()  # ≤ |sources|·2^bits rows
    partials.sort(key=lambda r: (r["source"], r["hb"]))
    offsets: dict[tuple[str, int], int] = {}
    budget: dict[str, int] = {}
    for r in partials:
        s = r["source"]
        offsets[(s, r["hb"])] = budget.get(s, 0)
        budget[s] = budget.get(s, 0) + int(r["n_tokens"])
    budget = {s: tot // 2 for s, tot in budget.items()}

    co = ds.repartition(P, keys=["source", "hb"])

    def pick(t: pa.Table):
        if t.num_rows == 0 or "hb" not in t.schema.names:
            return
        src = t.column("source").to_numpy(zero_copy_only=False)
        hb_ = t.column("hb").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        scode, sidx = np.unique(src, return_inverse=True)
        order = np.lexsort((h, hb_, sidx))
        sidx, hb_, h, doc, n = (
            sidx[order], hb_[order], h[order], doc[order], n[order]
        )
        grp = sidx * (np.int64(1) << np.int64(bits)) + hb_
        cum = np.cumsum(n)
        excl = cum - n
        starts = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1]])
        excl = excl - np.repeat(excl[starts], np.diff(np.r_[starts, len(grp)]))
        off = np.fromiter(
            (offsets[(scode[s], b)] for s, b in zip(sidx, hb_)),
            np.int64,
            len(grp),
        )
        bud = np.fromiter(
            (budget[scode[s]] for s in sidx), np.int64, len(grp)
        )
        keep = off + excl + n <= bud
        if not keep.any():
            return
        yield pa.table(
            {
                "doc_id": pa.array(doc[keep]),
                "source": pa.array(scode[sidx[keep]]),
                "n_tokens": pa.array(n[keep]),
            }
        )

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


PACKED_SEQUENCE_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
    array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
    AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM tok WHERE n_tokens > 0
)
SELECT st // {SEQ_CAPACITY} AS seq_id,
  CAST(COUNT(*) AS BIGINT) AS docs_started,
  SUM(n_tokens) AS n_tokens
FROM p GROUP BY 1
"""


# fractions of 2^64 in exact integers: train 80%, val 10%, test 10%
_M64_INT = 1 << 64
SPLIT_TRAIN_T = _M64_INT * 8 // 10
SPLIT_VAL_T = _M64_INT * 9 // 10


def dataset_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic train/val/test split accounting — the
    dataset-partitioning stage: every document lands in a split by its
    hash range (``splitmix64(doc_id)`` < 80 % / 90 % of 2^64), so the
    assignment is a pure function of the id, replays bit-identically
    at any cluster size, and never needs a stored assignment table.
    Output: (source, split, n_docs, n_tokens) — the per-source audit
    that catches skewed splits before a training run.

    Exactness: the thresholds are exact integers ⌊2^64·f⌋ compared in
    uint64 (HUGEINT in SQL) — zero float anywhere (the weighted_sample
    pure-integer-threshold rule).  Scale shape: one scan, block-local
    (source, split) partials, ONE keyed re-agg over ≤ |sources|·3
    rows."""
    from .sketch import splitmix64

    tt = np.uint64(SPLIT_TRAIN_T)
    tv = np.uint64(SPLIT_VAL_T)

    def pre(t: pa.Table):
        if len(t) == 0 or "n_tokens" not in t.schema.names:
            return
        z = splitmix64(t.column("doc_id").to_numpy(zero_copy_only=False))
        split = np.where(z < tt, "train", np.where(z < tv, "val", "test"))
        g = (
            pa.table(
                {
                    "source": t.column("source"),
                    "split": pa.array(split.tolist(), pa.string()),
                    "n_docs": pa.array(np.ones(len(t), np.int64)),
                    "n_tokens": t.column("n_tokens"),
                }
            )
            .group_by(["source", "split"])
            .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
        )
        yield g.rename_columns(["source", "split", "n_docs", "n_tokens"])

    return keyed_reagg(
        _doc_token_counts(sf_dir, carry=("source",)).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["source", "split"],
        [("n_docs", "sum"), ("n_tokens", "sum")],
        4,
    )


CHUNK_LEN = 32
CHUNK_STRIDE = 24  # 8-token overlap


def doc_chunks(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, chunk_id, start_tok, chunk_tokens) sliding-window
    document chunking (the RAG / context-window prep stage): windows
    of CHUNK_LEN tokens every CHUNK_STRIDE, the final window
    truncated; a doc shorter than one window is a single chunk
    (LEN/STRIDE sized to the synthetic corpus' 20-100-token docs).
    Chunk count = 1 + max(0, ⌈(n − LEN)/STRIDE⌉) — pure integer
    arithmetic, entirely block-local (a document is one parquet row;
    windows never cross blocks), zero shuffle.  The SQL oracle builds
    the same windows with range()."""

    def chunks(t: pa.Table):
        if len(t) == 0 or "n_tokens" not in t.schema.names:
            return
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = n > 0
        n, ids = n[keep], ids[keep]
        if len(n) == 0:
            return
        # chunks per doc: 1 + ceil(max(0, n - LEN) / STRIDE)
        extra = np.maximum(n - CHUNK_LEN, 0)
        cnt = 1 + (extra + CHUNK_STRIDE - 1) // CHUNK_STRIDE
        doc = np.repeat(ids, cnt)
        ntok = np.repeat(n, cnt)
        total = int(cnt.sum())
        starts_of_doc = np.r_[0, np.cumsum(cnt)[:-1]]
        cid = np.arange(total) - np.repeat(starts_of_doc, cnt)
        start = cid * CHUNK_STRIDE
        clen = np.minimum(ntok - start, CHUNK_LEN)
        yield pa.table(
            {
                "doc_id": pa.array(doc),
                "chunk_id": pa.array(cid.astype(np.int64)),
                "start_tok": pa.array(start.astype(np.int64)),
                "chunk_tokens": pa.array(clen.astype(np.int64)),
            }
        )

    return _doc_token_counts(sf_dir).map_batches(chunks, batch_format="pyarrow")


DOC_CHUNKS_SQL = rf"""
WITH tok AS (
  SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
    array_length(string_split_regex(trim(text), '\s+')) END AS BIGINT)
    AS n FROM documents
),
c AS (
  SELECT doc_id, n,
    UNNEST(range(1 + CAST(CEIL(CAST(GREATEST(n - {CHUNK_LEN}, 0) AS DOUBLE)
                               / {CHUNK_STRIDE}) AS BIGINT))) AS chunk_id
  FROM tok WHERE n > 0
)
SELECT doc_id, chunk_id,
  chunk_id * {CHUNK_STRIDE} AS start_tok,
  LEAST(n - chunk_id * {CHUNK_STRIDE}, {CHUNK_LEN}) AS chunk_tokens
FROM c
"""


# --------------------------------------------------------------------------
# length-ordered curriculum phases (short→long training schedule)
# --------------------------------------------------------------------------

CURRICULUM_PHASES = 4


def length_curriculum(
    sf_dir: str, k: int = CURRICULUM_PHASES
) -> ray.data.Dataset:
    """(doc_id, n_tokens, start, phase) — length-ordered curriculum
    construction: documents are laid out in ascending (n_tokens,
    doc_id) order and the token stream is cut into ``k`` equal-token
    phases (short→long scheduling, the standard length-curriculum
    recipe).  ``start`` is the doc's exclusive token offset in that
    order; ``phase = start·k // total`` — pure integers end to end.

    Same distributed prefix-sum shape as :func:`pack_sequences`, but
    the bucket IS the order key's major component (``n_tokens``): the
    driver scans per-length totals ascending (≤ distinct-lengths rows
    — bounded by the max document length, not the corpus), and one
    length-keyed repartition finishes the minor (doc_id) order
    block-locally."""
    counts = _doc_token_counts(sf_dir)

    def rebucket(t: pa.Table):
        if t.num_rows == 0 or "n_tokens" not in t.schema.names:
            return
        yield pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "bucket": t.column("n_tokens"),
            }
        )

    counts = counts.map_batches(rebucket, batch_format="pyarrow")

    def pre(t: pa.Table):
        if len(t) == 0 or "bucket" not in t.schema.names:
            return
        g = t.group_by(["bucket"]).aggregate([("n_tokens", "sum")])
        yield g.rename_columns(["bucket", "n_tokens"])

    bucket_sums = keyed_reagg(
        counts.map_batches(pre, batch_format="pyarrow"),
        ["bucket"], [("n_tokens", "sum")], num_partitions=P,
    ).take_all()  # ≤ distinct-lengths rows
    bucket_sums.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    run = 0
    for r in bucket_sums:
        offsets[r["bucket"]] = run
        run += int(r["n_tokens"])
    total = run

    co = counts.repartition(P, keys=["bucket"])

    def assign(t: pa.Table):
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, b))
        b, doc, n = b[order], doc[order], n[order]
        cum = np.cumsum(n)
        local = cum - n
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        base = local[starts]
        local = local - np.repeat(base, np.diff(np.r_[starts, len(b)]))
        off = np.fromiter((offsets[x] for x in b), np.int64, len(b))
        st = off + local
        yield pa.table(
            {
                "doc_id": pa.array(doc),
                "n_tokens": pa.array(n),
                "start": pa.array(st),
                "phase": pa.array(st * k // total),
            }
        )

    return co.map_batches(assign, batch_size=None, batch_format="pyarrow")


LENGTH_CURRICULUM_SQL = f"""
WITH tok AS (
  SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
    array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
    AS n_tokens
  FROM documents
),
t2 AS (SELECT * FROM tok WHERE n_tokens > 0),
w AS (
  SELECT doc_id, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      ORDER BY n_tokens, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start,
    CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
  FROM t2
)
SELECT doc_id, n_tokens, start,
  start * {CURRICULUM_PHASES} // total AS phase
FROM w
"""


# ---------------------------------------------------------------------------
# exact holdout decontamination audit (train/test split leakage)
# ---------------------------------------------------------------------------


def holdout_contamination(sf_dir: str) -> ray.data.Dataset:
    """(source, n_test, n_contaminated) — per source, how many
    held-out (test-split) documents exactly match a training-split
    document after canonicalization: the exact-match decontamination
    audit every eval pipeline runs before trusting a benchmark number.
    Split assignment is the engine's standard pure-integer splitmix64
    hash range (``dataset_split``); the match key is the RE2 canonical
    form (lowercase, non-alnum runs → one space) shared bit-for-bit
    with DuckDB.

    Scale shape: texts never cross the wire — each reading task ships
    only (sha256(canon), source, tr, te); ONE repartition by sha makes
    every copy of a text block-local, so the train-occurrence count is
    exact in-block; per-source partials fold through a
    |sources|-bounded re-agg."""
    from .sketch import splitmix64
    from .text import canonicalize, with_text_sha256

    tt = np.uint64(SPLIT_TRAIN_T)
    tv = np.uint64(SPLIT_VAL_T)

    ds = canonicalize(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        )
    )
    ds = with_text_sha256(ds, col="canon")

    def pre(t: pa.Table):
        if len(t) == 0 or "text_sha256" not in t.schema.names:
            return
        z = splitmix64(
            t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        tr = z < tt
        te = z >= tv
        keep = tr | te
        if not keep.any():
            return
        yield pa.table(
            {
                "sha": t.column("text_sha256").filter(pa.array(keep)),
                "source": t.column("source").filter(pa.array(keep)),
                "tr": pa.array(tr[keep].astype(np.int64)),
                "te": pa.array(te[keep].astype(np.int64)),
            }
        )

    slim = ds.map_batches(pre, batch_format="pyarrow").repartition(
        P, keys=["sha"]
    )

    def kernel(t: pa.Table):
        if t.num_rows == 0 or "sha" not in t.schema.names:
            return
        g = (
            t.select(["sha", "tr"])
            .group_by(["sha"])
            .aggregate([("tr", "sum")])
            .rename_columns(["sha", "ntr"])
        )
        j = t.join(g, keys=["sha"])
        te = j.column("te").to_numpy(zero_copy_only=False)
        ntr = j.column("ntr").to_numpy(zero_copy_only=False)
        out = (
            pa.table(
                {
                    "source": j.column("source"),
                    "n_test": pa.array(te),
                    "n_contaminated": pa.array(te * (ntr > 0)),
                }
            )
            .group_by(["source"])
            .aggregate([("n_test", "sum"), ("n_contaminated", "sum")])
        )
        if out.num_rows:
            yield out.rename_columns(["source", "n_test", "n_contaminated"])

    part = slim.map_batches(kernel, batch_size=None, batch_format="pyarrow")
    out = keyed_reagg(
        part, ["source"], [("n_test", "sum"), ("n_contaminated", "sum")], 4
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "n_test" not in t.schema.names:
            return
        t = t.filter(pc.greater(t.column("n_test"), 0))
        if t.num_rows:
            yield t

    return out.map_batches(fin, batch_size=None, batch_format="pyarrow")
