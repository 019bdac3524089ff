"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
via ``ray.put`` and every batch does one numpy matmul; per-batch top-k
partials are merged with a tiny groupby (no full sort of the corpus).

Scale path: LSH-bucketed search — signed random hyperplane signatures
(seeded, deterministic) bucket the corpus; queries probe their own and
neighboring (multi-probe, 1-bit flips) buckets only.  Recall depends on
``planes``/probes; exact for identical vectors, approximate otherwise —
the classic SimHash-for-cosine construction (public knowledge).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _emb_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        return arr.values.to_numpy(zero_copy_only=False).reshape(len(arr), d)
    # variable list<float>: all rows must share one dimension
    lists = arr.to_pylist()
    return np.asarray(lists, dtype=np.float64)


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """(query_id, vec_id, cosine) — top-k corpus rows per query row.

    ``queries``: (m, d) matrix.  Broadcast once; each batch computes
    cosine against all m queries vectorized and emits only its local
    top-k per query (m·k rows per batch), so the reduce is tiny.
    """
    q = np.asarray(queries, np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(qn)

    def local_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        qm = ray.get(q_ref)
        x = _emb_matrix(t, emb_col)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = qm @ xn.T  # (m, b)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[1])
        m = qm.shape[0]
        # exact (cosine desc, id asc) per query WITHOUT a full-batch
        # sort: O(b) partition finds the kk-th cosine, every row >= that
        # value (including all exact ties at the cutoff) enters a small
        # candidate set, and only the candidates are lexsorted — same
        # total order as the merge stage / SQL oracle tie-break
        qids, vids, coss = [], [], []
        for qi in range(m):
            s = sims[qi]
            cut = np.partition(s, len(s) - kk)[len(s) - kk]
            cand = np.flatnonzero(s >= cut)
            order = cand[np.lexsort((ids[cand], -s[cand]))][:kk]
            qids.append(np.full(kk, qi, np.int64))
            vids.append(ids[order])
            coss.append(s[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids)),
                id_col: pa.array(np.concatenate(vids)),
                "cosine": pa.array(np.concatenate(coss), pa.float64()),
            }
        )

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )
    return _merge_topk(partials, k, id_col)


def _merge_topk(
    partials: ray.data.Dataset, k: int, id_col: str
) -> ray.data.Dataset:
    """Global (cosine desc, id asc) top-k per query over per-batch
    partials.  Partials are tiny (m·k rows per input block): a plain
    coalesce + one vectorized merge beats a keyed hash-shuffle whose
    aggregator actors cost more to spin up than the data they move."""

    def merge_all(t: pa.Table):
        if t.num_rows == 0:
            return
        qid = t.column("query_id").to_numpy(zero_copy_only=False)
        vid = t.column(id_col).to_numpy(zero_copy_only=False)
        cos = t.column("cosine").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -cos, qid))
        qs, vs, cs = qid[order], vid[order], cos[order]
        # rank within each query group (groups are contiguous)
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        rank = np.arange(len(qs)) - np.repeat(starts, np.diff(np.r_[starts, len(qs)]))
        keep = rank < k
        yield pa.table(
            {
                "query_id": pa.array(qs[keep]),
                id_col: pa.array(vs[keep]),
                "cosine": pa.array(cs[keep], pa.float64()),
            }
        )

    return partials.repartition(1).map_batches(
        merge_all, batch_size=None, batch_format="pyarrow"
    )


class _PlaneSigner:
    def __init__(self, dim: int, planes: int, seed: int):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, planes))

    def sign(self, x: np.ndarray) -> np.ndarray:
        bits = (x @ self.h) > 0
        out = np.zeros(len(x), np.int64)
        for j in range(bits.shape[1]):
            out |= bits[:, j].astype(np.int64) << j
        return out


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    planes: int = 12,
    probes: int = 4,
    seed: int = 11,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Approximate top-k: corpus rows whose hyperplane signature is in
    the query's probe set (own bucket + ``probes`` 1-bit flips) are
    scored exactly; everything else is skipped.  Same output schema as
    :func:`brute_force_topk`."""
    q = np.asarray(queries, np.float64)
    dim = q.shape[1]
    signer = _PlaneSigner(dim, planes, seed)
    q_sigs = signer.sign(q)
    probe: set[int] = set()
    for s in q_sigs.tolist():
        probe.add(s)
        for j in range(min(probes, planes)):
            probe.add(s ^ (1 << j))
    probe_arr = np.array(sorted(probe), np.int64)
    probe_ref = ray.put(probe_arr)
    signer_ref = ray.put(signer)

    def bucket_filter(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        sg = ray.get(signer_ref)
        pr = ray.get(probe_ref)
        x = _emb_matrix(t, emb_col)
        sig = sg.sign(x)
        idx = np.clip(np.searchsorted(pr, sig), 0, len(pr) - 1)
        return t.filter(pa.array(pr[idx] == sig))

    pruned = ds.select_columns([id_col, emb_col]).map_batches(
        bucket_filter, batch_format="pyarrow"
    )
    return brute_force_topk(pruned, q, k=k, id_col=id_col, emb_col=emb_col)


def embedding_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    planes: int = 10,
    seed: int = 23,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket: int = 2000,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the corpus by
    hyperplane signature, verify cosine exactly within each bucket
    (vectorized matmul), keep pairs with cosine ≥ threshold.

    Recall note: only pairs sharing a signature are candidates — the
    standard trade; raise ``planes`` bands or add probe rounds for
    higher recall.  Buckets above ``max_bucket`` are truncated after a
    deterministic sort (no silent caps: truncation count is exposed via
    the ``truncated`` column)."""
    from .shuffle import segment_starts, triu_pair_indices

    # probe dim from one batch
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(_emb_matrix(first, emb_col)[0])
    signer = _PlaneSigner(dim, planes, seed)
    signer_ref = ray.put(signer)

    def sign_rows(t: pa.Table):
        if len(t) == 0:
            return
        sg = ray.get(signer_ref)
        x = _emb_matrix(t, emb_col)
        sig = sg.sign(x)
        yield pa.table(
            {
                id_col: t.column(id_col),
                emb_col: t.column(emb_col),
                "bucket": pa.array(sig, pa.int64()),
            }
        )

    signed = ds.select_columns([id_col, emb_col]).map_batches(
        sign_rows, batch_format="pyarrow"
    )

    def verify_block(t: pa.Table):
        """All buckets of a co-located block in one vectorized pass:
        sort by (bucket, id), cap each bucket, expand every bucket's
        upper triangle at once, then ONE batched row-dot for every
        candidate pair (replaces the r2 per-group pandas kernel)."""
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bucket))
        x = _emb_matrix(t.take(pa.array(order)), emb_col).astype(np.float64)
        bucket, ids = bucket[order], ids[order]
        starts, sizes = segment_starts(bucket)
        dropped = np.maximum(sizes - max_bucket, 0)
        local = np.arange(len(ids), dtype=np.int64) - np.repeat(starts, sizes)
        cap = local < max_bucket
        ids, x = ids[cap], x[cap]
        a_idx, b_idx, seg = triu_pair_indices(np.minimum(sizes, max_bucket))
        if len(a_idx) == 0:
            return
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cos = np.einsum("ij,ij->i", xn[a_idx], xn[b_idx])
        keep = cos >= threshold
        if not keep.any():
            return
        yield pa.table(
            {
                "a": pa.array(ids[a_idx][keep]),
                "b": pa.array(ids[b_idx][keep]),
                "cosine": pa.array(cos[keep], pa.float64()),
                "truncated": pa.array(dropped[seg][keep]),
            }
        )

    return signed.repartition(8, keys=["bucket"]).map_batches(
        verify_block, batch_size=None, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + per-query probe lists
# --------------------------------------------------------------------------


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def _init_centroids(
    ds: ray.data.Dataset, n_centroids: int, id_col: str, emb_col: str
) -> np.ndarray:
    """Deterministic seed centroids: the corpus rows with the
    ``n_centroids`` smallest splitmix64(id) values — a uniform
    pseudo-random sample that is reproducible and id-order-independent
    (smallest-RAW-id seeding degenerates when ids correlate with
    content, e.g. cluster-ordered corpora).  Found with per-block
    partials + one tiny merge (no full sort, no materialization)."""
    from .sketch import splitmix64

    def local(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        order = np.argsort(h)[:n_centroids]
        yield t.take(pa.array(np.sort(order)))

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        local, batch_format="pyarrow"
    )

    def pick(t: pa.Table):
        if t.num_rows == 0:
            return
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        # keep HASH order (not block-position order): the merged block's
        # row order depends on task arrival, and a permuted seed order
        # would permute the trained centroids run-to-run
        order = np.argsort(h)[:n_centroids]
        yield t.take(pa.array(order))

    seeds = partials.repartition(1).map_batches(
        pick, batch_size=None, batch_format="pyarrow"
    ).take_batch(n_centroids, batch_format="pyarrow")
    return _normalize(_emb_matrix(seeds, emb_col))


def ivf_centroids(
    ds: ray.data.Dataset,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained distributively:
    each Lloyd round is ONE streaming pass — every batch assigns its
    vectors to the broadcast centroids and emits a (C, D) partial-sum
    table (C rows regardless of batch size), and the driver folds the
    partials as they stream (O(C·D) driver state, never the corpus).
    Fully deterministic: seed centroids are the smallest-id rows and
    empty clusters retain their previous position."""
    cent = _init_centroids(ds, n_centroids, id_col, emb_col)
    c_n, dim = cent.shape
    corpus = ds.select_columns([id_col, emb_col])

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table, _ref=ref, _c=c_n, _d=dim):
            if len(t) == 0:
                return
            c = ray.get(_ref)
            xn = _normalize(_emb_matrix(t, emb_col))
            a = np.argmax(xn @ c.T, axis=1)
            sums = np.zeros((_c, _d), np.float64)
            np.add.at(sums, a, xn)
            cnts = np.bincount(a, minlength=_c).astype(np.int64)
            bkey = int(t.column(id_col).to_numpy(zero_copy_only=False).min())
            yield pa.table(
                {
                    "bkey": pa.array(np.full(_c, bkey, np.int64)),
                    "cid": pa.array(np.arange(_c, dtype=np.int64)),
                    "cnt": pa.array(cnts),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.ravel(), pa.float64()), _d
                    ),
                }
            )

        # Collect partials FIRST and fold them in (bkey, cid) row order
        # with np.add.at: float sums don't commute, and streaming
        # iteration yields blocks in completion order, so an
        # arrival-order fold made the trained centroids differ run to
        # run (and a fancy-index += would silently drop duplicate cids
        # when iter_batches coalesces partials).  Driver state stays
        # O(blocks·C·D) — partials, never the corpus.
        parts = [
            b
            for b in corpus.map_batches(
                partial, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        sums = np.zeros((c_n, dim), np.float64)
        cnts = np.zeros(c_n, np.int64)
        if parts:
            allp = pa.concat_tables(parts)
            bk = allp.column("bkey").to_numpy(zero_copy_only=False)
            cid = allp.column("cid").to_numpy(zero_copy_only=False)
            cn = allp.column("cnt").to_numpy(zero_copy_only=False)
            vs = allp.column("vsum")
            if isinstance(vs, pa.ChunkedArray):
                vs = vs.combine_chunks()
            vmat = vs.values.to_numpy(zero_copy_only=False).reshape(
                len(allp), dim
            )
            o = np.lexsort((cid, bk))
            np.add.at(cnts, cid[o], cn[o])
            np.add.at(sums, cid[o], vmat[o])
        nonempty = cnts > 0
        new = cent.copy()
        new[nonempty] = sums[nonempty] / cnts[nonempty, None]
        cent = _normalize(new)
    return cent


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """IVF approximate top-k: each query scores ONLY corpus rows whose
    nearest centroid is among the query's ``nprobe`` closest centroids
    (classic inverted-file semantics — per-query probe lists, not a
    union filter).  ``nprobe == n_centroids`` degrades to exact brute
    force, which the tests exploit.  Same output schema and (cosine
    desc, id asc) tie-break as :func:`brute_force_topk`."""
    q = np.asarray(queries, np.float64)
    qn = _normalize(q)
    if centroids is None:
        centroids = ivf_centroids(
            ds, n_centroids=n_centroids, iters=iters,
            id_col=id_col, emb_col=emb_col,
        )
    c_n = centroids.shape[0]
    nprobe = min(nprobe, c_n)
    # per-query probe mask (m, C): nprobe closest centroids by cosine
    qc = qn @ centroids.T
    probe = np.zeros((len(qn), c_n), bool)
    top = np.argsort(-qc, axis=1, kind="stable")[:, :nprobe]
    probe[np.arange(len(qn))[:, None], top] = True
    q_ref = ray.put(qn)
    c_ref = ray.put(centroids)
    p_ref = ray.put(probe)

    def local_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        qm, cm, pm = ray.get(q_ref), ray.get(c_ref), ray.get(p_ref)
        xn = _normalize(_emb_matrix(t, emb_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        assign = np.argmax(xn @ cm.T, axis=1)
        sims = qm @ xn.T  # (m, b)
        allowed = pm[:, assign]  # (m, b)
        qids, vids, coss = [], [], []
        for qi in range(qm.shape[0]):
            cand0 = np.flatnonzero(allowed[qi])
            if len(cand0) == 0:
                continue
            s = sims[qi][cand0]
            kk = min(k, len(s))
            cut = np.partition(s, len(s) - kk)[len(s) - kk]
            keep = np.flatnonzero(s >= cut)
            order = keep[np.lexsort((ids[cand0][keep], -s[keep]))][:kk]
            qids.append(np.full(kk, qi, np.int64))
            vids.append(ids[cand0][order])
            coss.append(s[order])
        if not qids:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids)),
                id_col: pa.array(np.concatenate(vids)),
                "cosine": pa.array(np.concatenate(coss), pa.float64()),
            }
        )

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )
    return _merge_topk(partials, k, id_col)


# --------------------------------------------------------------------------
# PCA: top principal component via map-side Gram/moment partials
# --------------------------------------------------------------------------

def pca_moments(ds: ray.data.Dataset, col: str = "embedding"):
    """(n, Σx, Σxxᵀ) over an embedding column: each block folds to
    D + D² doubles REGARDLESS of row count (the classic data-parallel
    covariance shape — one streaming pass, no materialization of X),
    partials concat on the driver (O(blocks·D²), data-size-free)."""

    def part(t: pa.Table):
        if t.num_rows == 0:
            return
        x = _emb_matrix(t, col).astype(np.float64)
        yield pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "sx": pa.array([x.sum(axis=0)]),
                "sxx": pa.array([(x.T @ x).ravel()]),
            }
        )

    n = 0
    sx = None
    sxx = None
    for r in ds.map_batches(part, batch_format="pyarrow").take_all():
        n += int(r["n"])
        v = np.asarray(r["sx"], np.float64)
        m = np.asarray(r["sxx"], np.float64)
        sx = v if sx is None else sx + v
        sxx = m if sxx is None else sxx + m
    if n == 0:
        raise ValueError("empty embedding dataset")
    d = len(sx)
    return n, sx, sxx.reshape(d, d)


def pca_top_component(
    sf_dir: str, col: str = "embedding", iters: int = 200, tol: float = 1e-12
) -> ray.data.Dataset:
    """(dim, loading, eigval): the top principal component of the
    embedding covariance.  Distributed part = ONE pass of moment
    partials (see pca_moments); the driver then power-iterates the
    D×D covariance — O(D²) work, independent of corpus size.
    Deterministic: init = ones/√D, sign pinned so the
    largest-|loading| coordinate is positive.  Rows-only for the
    driver gate: the float partial-sum order is block-dependent
    (pytest checks allclose vs a single-process numpy mirror)."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=[col]
    )
    n, sx, sxx = pca_moments(ds, col)
    mu = sx / n
    cov = sxx / n - np.outer(mu, mu)
    d = cov.shape[0]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = cov @ v
        nw = np.linalg.norm(w)
        if nw == 0.0:
            break
        w /= nw
        if np.linalg.norm(w - v) < tol:
            v = w
            break
        v = w
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    eig = float(v @ cov @ v)
    out = pa.table(
        {
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "loading": pa.array(v),
            "eigval": pa.array(np.full(d, eig)),
        }
    )
    return ray.data.from_arrow(out)


def _emb_matrix64(t: pa.Table, col: str) -> np.ndarray:
    """Vectorized list<float> → (n, d) float64 matrix: reshape the
    child values buffer when row lengths are uniform (no per-row
    Python), falling back to _emb_matrix otherwise.  float32→float64
    widening is exact, matching SQL's CAST(e AS DOUBLE)."""
    arr = t.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        vals = arr.values.to_numpy(zero_copy_only=False)
        return vals.astype(np.float64).reshape(len(arr), d)
    offs = arr.offsets.to_numpy()
    widths = np.diff(offs)
    if len(widths) and (widths == widths[0]).all():
        vals = arr.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
        return vals.astype(np.float64).reshape(len(arr), int(widths[0]))
    return _emb_matrix(t, col)


SQ_LEVELS = 255.0


def scalar_quantize(ds: ray.data.Dataset, col: str = "embedding") -> ray.data.Dataset:
    """Per-dimension uint8 scalar quantization (the standard 4×
    index-compression step before ANN): code = ⌊(v − lo_d)·255 /
    (hi_d − lo_d)⌋ clamped to 255, lo/hi = per-dimension corpus
    min/max.  Two passes: D-scalar (dim, lo, hi) block partials fold
    on the driver and broadcast back in the closure; pass 2 is one
    vectorized matrix expression per block.  Output (vec_id, code_sum,
    code_min, code_max) — integer checksums of the code matrix, so the
    SQL oracle (same left-to-right float expression per element, then
    exact int aggregates) matches bit-for-bit.  Assumes hi_d > lo_d
    (any non-constant dimension)."""

    def mm(t: pa.Table):
        if len(t) == 0:
            return
        m = _emb_matrix64(t, col)
        yield pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "lo": pa.array(m.min(axis=0)),
                "hi": pa.array(m.max(axis=0)),
            }
        )

    lo: dict[int, float] = {}
    hi: dict[int, float] = {}
    for r in ds.map_batches(mm, batch_format="pyarrow").take_all():
        d = r["dim"]
        lo[d] = min(lo.get(d, np.inf), r["lo"])
        hi[d] = max(hi.get(d, -np.inf), r["hi"])
    dims = sorted(lo)
    lo_v = np.array([lo[d] for d in dims])
    hi_v = np.array([hi[d] for d in dims])

    def quant(t: pa.Table):
        if len(t) == 0:
            return
        m = _emb_matrix64(t, col)
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        yield pa.table(
            {
                "vec_id": t.column("vec_id"),
                "code_sum": pa.array(codes.sum(axis=1)),
                "code_min": pa.array(codes.min(axis=1)),
                "code_max": pa.array(codes.max(axis=1)),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


EMBEDDING_QUANTIZE_SQL = """
WITH u AS (
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS e,
    UNNEST(range(len(embedding))) AS i
  FROM embeddings
),
mm AS (SELECT i, MIN(e) AS lo, MAX(e) AS hi FROM u GROUP BY i),
c AS (
  SELECT u.vec_id,
    CAST(LEAST(FLOOR((u.e - mm.lo) * 255.0 / (mm.hi - mm.lo)), 255.0)
         AS BIGINT) AS code
  FROM u JOIN mm ON u.i = mm.i
)
SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
  MIN(code) AS code_min, MAX(code) AS code_max
FROM c GROUP BY vec_id
"""


def embedding_quantize(sf_dir: str) -> ray.data.Dataset:
    """queries() entry: scalar-quantization checksums over the
    embeddings table."""
    import os

    return scalar_quantize(
        ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
    )


MMR_POOL = 24
MMR_K = 6


def mmr_rerank(sf_dir: str) -> ray.data.Dataset:
    """Maximal-Marginal-Relevance diversified reranking — the
    retrieval-diversification stage (dedup of near-identical hits
    before they reach a context window), made EXACT by running MMR on
    the integer scalar-quantization codes (the embedding_quantize
    per-dimension rule), so every similarity is an integer dot product
    and the DuckDB oracle replays the greedy bit-for-bit.

    Pinned rule: query = the min vec_id row; relevance rel(d) =
    code(d)·code(q); candidate pool = top-``MMR_POOL`` non-query ids
    by (rel desc, vec_id); then ``MMR_K`` greedy steps picking argmax
    of ``2·rel(d) − max_{s∈S} code(d)·code(s)`` (score desc, vec_id —
    λ = 1/2 scaled to integers).  Output (rnk, vec_id, rel, score).

    Scale shape: per-dimension lo/hi fold is D-scalar partials; the
    relevance pass broadcasts ONE code vector and pre-truncates each
    block to the pool size before the coalesce (≤ pool rows cross);
    only the pool's (ids, codes) — pool×D ints — reach the driver,
    where the K-step greedy is O(pool²) scalar work (the ivf-centroid
    precedent: driver folds are fine when bounded by a pinned
    constant, never by corpus rows)."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def mm(t: pa.Table):
        if len(t) == 0:
            return
        m = _emb_matrix64(t, "embedding")
        yield pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "lo": pa.array(m.min(axis=0)),
                "hi": pa.array(m.max(axis=0)),
            }
        )

    lo: dict[int, float] = {}
    hi: dict[int, float] = {}
    for r in ds.map_batches(mm, batch_format="pyarrow").take_all():
        d = r["dim"]
        lo[d] = min(lo.get(d, np.inf), r["lo"])
        hi[d] = max(hi.get(d, -np.inf), r["hi"])
    dims = sorted(lo)
    lo_v = np.array([lo[d] for d in dims])
    hi_v = np.array([hi[d] for d in dims])

    def codes_of(t: pa.Table) -> np.ndarray:
        m = _emb_matrix64(t, "embedding")
        return np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)

    def qid_pre(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {"m": pa.array(
                [int(t.column("vec_id").to_numpy(
                    zero_copy_only=False).min())])}
        )

    qid = min(
        r["m"] for r in ds.map_batches(qid_pre, batch_format="pyarrow")
        .take_all()
    )

    def qcode_pre(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        hit = ids == qid
        if not hit.any():
            return
        yield pa.table({"code": pa.array(codes_of(t)[hit].tolist())})

    qcode = np.asarray(
        ds.map_batches(qcode_pre, batch_format="pyarrow")
        .take_all()[0]["code"],
        np.int64,
    )

    def rel_pre(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        codes = codes_of(t)
        keep = ids != qid
        ids, codes = ids[keep], codes[keep]
        if len(ids) == 0:
            return
        rel = codes @ qcode
        order = np.lexsort((ids, -rel))[:MMR_POOL]
        yield pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "rel": pa.array(rel[order]),
                "code": pa.array(codes[order].tolist()),
            }
        )

    pool_rows = (
        ds.map_batches(rel_pre, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: [
                t.take(
                    pa.array(
                        np.lexsort(
                            (
                                t.column("vec_id").to_numpy(
                                    zero_copy_only=False),
                                -t.column("rel").to_numpy(
                                    zero_copy_only=False),
                            )
                        )[:MMR_POOL]
                    )
                )
            ][0],
            batch_size=None,
            batch_format="pyarrow",
        )
        .take_all()
    )
    ids = np.array([r["vec_id"] for r in pool_rows], np.int64)
    rel = np.array([r["rel"] for r in pool_rows], np.int64)
    C = np.array([r["code"] for r in pool_rows], np.int64)
    sims = C @ C.T

    picked: list[int] = []
    out_scores: list[int] = []
    mask = np.ones(len(ids), bool)
    maxsim = np.zeros(len(ids), np.int64)
    for _ in range(min(MMR_K, len(ids))):
        score = 2 * rel - maxsim
        order = np.lexsort((ids, -score))
        pick = next(i for i in order if mask[i])
        picked.append(pick)
        out_scores.append(int(score[pick]))
        mask[pick] = False
        maxsim = np.maximum(maxsim, sims[:, pick])

    return ray.data.from_arrow(
        pa.table(
            {
                "rnk": pa.array(
                    np.arange(1, len(picked) + 1, dtype=np.int64)),
                "vec_id": pa.array(ids[picked]),
                "rel": pa.array(rel[picked]),
                "score": pa.array(np.asarray(out_scores, np.int64)),
            }
        )
    )


def _mmr_sql() -> str:
    steps = []
    for r in range(2, MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM p{i}" for i in range(1, r)
        )
        steps.append(f""",
s{r} AS MATERIALIZED ({prev}),
p{r} AS MATERIALIZED (
  SELECT cand.vec_id, cand.rel, 2*cand.rel - COALESCE(mx.m, 0) AS score
  FROM cand LEFT JOIN (
    SELECT s.a AS vec_id, MAX(s.sim) AS m
    FROM sims s JOIN s{r} sd ON s.b = sd.vec_id GROUP BY s.a
  ) mx ON cand.vec_id = mx.vec_id
  WHERE cand.vec_id NOT IN (SELECT vec_id FROM s{r})
  ORDER BY score DESC, cand.vec_id LIMIT 1
)""")
    tail = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rnk, vec_id, rel, "
        f"CAST(score AS BIGINT) AS score FROM p{i}"
        for i in range(1, MMR_K + 1)
    )
    return f"""
WITH u AS MATERIALIZED (
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS e,
    UNNEST(range(len(embedding))) AS i
  FROM embeddings
),
mm AS MATERIALIZED (SELECT i, MIN(e) AS lo, MAX(e) AS hi FROM u GROUP BY i),
c AS MATERIALIZED (
  SELECT u.vec_id, u.i,
    CAST(LEAST(FLOOR((u.e - mm.lo) * 255.0 / (mm.hi - mm.lo)), 255.0)
         AS BIGINT) AS code
  FROM u JOIN mm ON u.i = mm.i
),
q AS MATERIALIZED (SELECT MIN(vec_id) AS qid FROM embeddings),
qc AS MATERIALIZED (SELECT c.i, c.code FROM c, q WHERE c.vec_id = q.qid),
rel AS MATERIALIZED (
  SELECT c.vec_id, CAST(SUM(c.code * qc.code) AS BIGINT) AS rel
  FROM c JOIN qc ON c.i = qc.i, q WHERE c.vec_id <> q.qid
  GROUP BY c.vec_id
),
cand AS MATERIALIZED (
  SELECT vec_id, rel FROM rel
  QUALIFY ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) <= {MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
    CAST(SUM(ca.code * cb.code) AS BIGINT) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
  JOIN c ca ON ca.vec_id = a.vec_id
  JOIN c cb ON cb.vec_id = b.vec_id AND ca.i = cb.i
  GROUP BY 1, 2
),
p1 AS MATERIALIZED (
  SELECT vec_id, rel, 2*rel AS score FROM cand
  ORDER BY score DESC, vec_id LIMIT 1
){''.join(steps)}
{tail}"""


MMR_RERANK_SQL = _mmr_sql()


MUTUAL_K = 5


def mutual_knn_pairs(sf_dir: str, k: int = MUTUAL_K) -> ray.data.Dataset:
    """(a, b) reciprocal-nearest-neighbor pairs: a is in b's exact
    cosine top-k (self excluded) AND b is in a's — the RNN primitive
    behind embedding-dedup clustering and mutual-kNN graphs.  Exact n²
    baseline: the full (ordered-by-vec_id) query matrix broadcasts once
    through brute_force_topk's per-block matmul partials; the
    LSH-bucketed path (embedding_near_dups / lsh_topk) is the scale
    route when n² is off the table.  Top-(k+1) then self-dropped keeps
    the non-self ranking exact (removing one element preserves
    relative order); mutuality = one (min, max)-keyed count==2 over
    m·k rows."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy(zero_copy_only=False))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)[order]
    qm = _emb_matrix64(t, "embedding")[order]

    res = brute_force_topk(
        ray.data.read_parquet(path, columns=["vec_id", "embedding"]),
        qm,
        k=k + 1,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "query_id" not in t.schema.names:
            return
        q = ids[t.column("query_id").to_numpy(zero_copy_only=False)]
        v = t.column("vec_id").to_numpy(zero_copy_only=False)
        cos = t.column("cosine").to_numpy(zero_copy_only=False)
        keep = q != v
        q, v, cos = q[keep], v[keep], cos[keep]
        o = np.lexsort((v, -cos, q))
        q, v = q[o], v[o]
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
        rank = np.arange(len(q)) - np.repeat(
            starts, np.diff(np.r_[starts, len(q)])
        )
        q, v = q[rank < k], v[rank < k]
        g = (
            pa.table(
                {
                    "a": pa.array(np.minimum(q, v)),
                    "b": pa.array(np.maximum(q, v)),
                    "c": pa.array(np.ones(len(q), np.int64)),
                }
            )
            .group_by(["a", "b"])
            .aggregate([("c", "sum")])
        )
        g = g.rename_columns(["a", "b", "c"])
        both = g.filter(pc.equal(g.column("c"), 2))
        if both.num_rows:
            yield both.select(["a", "b"])

    # _merge_topk already coalesced to ONE tiny (m·(k+1)-row) block
    return res.map_batches(fin, batch_size=None, batch_format="pyarrow")


MUTUAL_KNN_SQL = f"""
WITH s AS (
  SELECT q.vec_id AS qid, e.vec_id AS vid,
    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS cos
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id <> e.vec_id
),
r AS (
  SELECT qid, vid,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
  FROM s
),
t AS (SELECT qid, vid FROM r WHERE rn <= {MUTUAL_K}),
m AS (
  SELECT LEAST(qid, vid) AS a, GREATEST(qid, vid) AS b, COUNT(*) AS c
  FROM t GROUP BY 1, 2
)
SELECT a, b FROM m WHERE c = 2
"""


# --------------------------------------------------------------------------
# SemDedup-style embedding deduplication (cluster → keeper → threshold)
# --------------------------------------------------------------------------

SEMDEDUP_CENTROIDS = 16
SEMDEDUP_TAU = 0.95


def semantic_dedup(
    sf_dir: str,
    n_centroids: int = SEMDEDUP_CENTROIDS,
    tau: float = SEMDEDUP_TAU,
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """(vec_id, cluster, keeper_id, cos_keeper, is_dup) — SemDedup-style
    semantic deduplication (Abbas et al. 2023, arXiv:2303.09540): train
    a spherical k-means coarse quantizer, pick each cluster's keeper
    deterministically (min vec_id), and flag every other member whose
    cosine to the keeper exceeds ``tau`` as a semantic duplicate.
    Unlike the published all-pairs-within-cluster variant, similarity
    is measured against the single keeper — O(cluster) per cluster, no
    quadratic blowup, and the decision is reproducible.

    Scale shape: three streaming passes over the embeddings —
    (1) Lloyd rounds via ``ivf_centroids`` (O(C·D) driver state),
    (2) per-block (cluster, min-id) partials folded to C keepers,
    (3) keeper vectors fetched by a broadcast id filter (C rows) and
    every vector scored against ITS cluster's keeper in one map.  No
    oracle: k-means is not SQL-expressible (same status as
    ivf_ann_topk); the dedup logic is numpy-mirrored in
    tests/test_ivf.py against the trained centroids."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    cent = (
        centroids
        if centroids is not None
        else ivf_centroids(ds, n_centroids=n_centroids)
    )
    c_n = cent.shape[0]
    c_ref = ray.put(cent)

    # pass 2: per-cluster keeper = min vec_id (per-block partials,
    # C-bounded driver fold)
    def kmin(t: pa.Table):
        if len(t) == 0:
            return
        c = ray.get(c_ref)
        xn = _normalize(_emb_matrix(t, "embedding"))
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        a = np.argmax(xn @ c.T, axis=1)
        mins = np.full(c.shape[0], np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, a, ids)
        hit = mins != np.iinfo(np.int64).max
        yield pa.table(
            {
                "cid": pa.array(np.flatnonzero(hit).astype(np.int64)),
                "mid": pa.array(mins[hit]),
            }
        )

    keeper = np.full(c_n, np.iinfo(np.int64).max, np.int64)
    for b in ds.map_batches(kmin, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        cid = b.column("cid").to_numpy(zero_copy_only=False)
        mid = b.column("mid").to_numpy(zero_copy_only=False)
        np.minimum.at(keeper, cid, mid)

    # pass 3a: fetch the ≤C keeper vectors via a broadcast id filter
    kid_set = set(int(x) for x in keeper[keeper != np.iinfo(np.int64).max])

    def pick_keepers(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.isin(ids, np.fromiter(kid_set, np.int64, len(kid_set)))
        if not m.any():
            return
        yield t.take(pa.array(np.flatnonzero(m)))

    kt = pa.concat_tables(
        list(
            ds.map_batches(pick_keepers, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    k_ids = kt.column("vec_id").to_numpy(zero_copy_only=False)
    k_vecs = _normalize(_emb_matrix(kt, "embedding"))
    # keeper vector per cluster, aligned to cluster index
    kv = np.zeros((c_n, k_vecs.shape[1]), np.float64)
    pos = {int(i): j for j, i in enumerate(k_ids)}
    valid = np.zeros(c_n, bool)
    for c in range(c_n):
        if keeper[c] != np.iinfo(np.int64).max:
            kv[c] = k_vecs[pos[int(keeper[c])]]
            valid[c] = True
    kv_ref = ray.put((keeper, kv, valid))

    # pass 3b: score every vector against its cluster's keeper
    def score(t: pa.Table):
        if len(t) == 0:
            return
        c = ray.get(c_ref)
        kp, kvm, _ = ray.get(kv_ref)
        xn = _normalize(_emb_matrix(t, "embedding"))
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        a = np.argmax(xn @ c.T, axis=1)
        cos = np.einsum("ij,ij->i", xn, kvm[a])
        dup = ((cos >= tau) & (ids != kp[a])).astype(np.int64)
        yield pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(a.astype(np.int64)),
                "keeper_id": pa.array(kp[a]),
                "cos_keeper": pa.array(cos, pa.float64()),
                "is_dup": pa.array(dup),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Nearest-centroid (Rocchio) classification over the labeled embeddings
# ---------------------------------------------------------------------------

# Power-of-two quantization scale: v·4096 only shifts the float64
# exponent, so floor(v·4096) is bit-identical in numpy and DuckDB; the
# +8192 shift keeps quantized values non-negative because DuckDB `//`
# TRUNCATES negatives (Python floors) — distances are shift-invariant,
# and the per-class mean of shifted values is the shifted mean exactly
# (n·shift is divisible by n).
CENT_QUANT = 4096.0
CENT_SHIFT = 8192


def _quantized_block(t: pa.Table) -> np.ndarray:
    return (
        np.floor(_emb_matrix64(t, "embedding") * CENT_QUANT).astype(np.int64)
        + CENT_SHIFT
    )


def centroid_classify(sf_dir: str) -> ray.data.Dataset:
    """Nearest-centroid (Rocchio) classification of every embedding
    against per-label centroids learned from the SAME table — the
    classifier-eval stage of an embedding pipeline, EXACT: components
    quantize to integers, per-label centroids are floored integer
    means (order-free integer sums), and the squared-Euclidean argmin
    (ties → smallest label) is pure int64 arithmetic, so the SQL
    oracle is bit-identical by construction.

    Scale shape: pass 1 reduces class-bounded (label, count, Σq)
    partials per block (#classes·dim integers each — driver fold holds
    L·D ints, never vectors); the tiny centroid matrix broadcasts via
    ray.put; pass 2 is block-local vectorized distance evaluation.
    Overflow: |q| ≤ 3·2^12 ⇒ dist² ≤ D·2^28 — int64-safe to D ~ 2^34."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(
        path, columns=["vec_id", "embedding", "label"]
    )

    def partials(t: pa.Table):
        if len(t) == 0:
            return
        q = _quantized_block(t)
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = [
            (int(L), int((lab == L).sum()), q[lab == L].sum(axis=0, dtype=np.int64))
            for L in np.unique(lab).tolist()  # class-bounded loop
        ]
        yield pa.table(
            {
                "label": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "s": pa.array(
                    [r[2].tolist() for r in rows], pa.list_(pa.int64())
                ),
            }
        )

    agg: dict[int, tuple[int, np.ndarray]] = {}
    for r in ds.map_batches(
        partials, batch_format="pyarrow"
    ).take_all():  # class-bounded: blocks × classes tiny rows
        v = np.asarray(r["s"], np.int64)
        n, s = agg.get(r["label"], (0, np.zeros_like(v)))
        agg[r["label"]] = (n + r["n"], s + v)
    labels = np.array(sorted(agg), np.int64)
    cent = np.stack([agg[L][1] // agg[L][0] for L in labels.tolist()])
    c_ref = ray.put((labels, cent))

    def classify(t: pa.Table):
        if len(t) == 0:
            return
        labs, c = ray.get(c_ref)
        q = _quantized_block(t)
        d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        j = np.argmin(d2, axis=1)  # labels ascending ⇒ tie → min label
        yield pa.table(
            {
                "vec_id": t.column("vec_id"),
                "true_label": pa.array(
                    t.column("label")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "pred_label": pa.array(labs[j], pa.int64()),
                "dist2": pa.array(
                    d2[np.arange(len(j)), j].astype(np.int64)
                ),
            }
        )

    return ds.map_batches(classify, batch_format="pyarrow")


def centroid_confusion(sf_dir: str) -> ray.data.Dataset:
    """(true_label, pred_label, cnt) confusion matrix of the
    nearest-centroid classifier — per-block pre-combine then ONE
    coalesced in-block re-agg (the tiny-partial aggregation rule:
    ≤ classes² groups, a groupby shuffle would be pure overhead)."""

    def part(t: pa.Table):
        if t.num_rows == 0:
            return
        if "cnt" not in t.schema.names:  # first pass: one per classified row
            t = t.select(["true_label", "pred_label"]).append_column(
                "cnt", pa.array(np.ones(t.num_rows, np.int64))
            )
        g = (
            t.select(["true_label", "pred_label", "cnt"])
            .group_by(["true_label", "pred_label"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["true_label", "pred_label", "cnt"])

    return (
        centroid_classify(sf_dir)
        .map_batches(part, batch_format="pyarrow")
        .repartition(1)
        .map_batches(part, batch_size=None, batch_format="pyarrow")
    )


_CENT_CTES = """
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(u[2] AS BIGINT) AS dim,
         CAST(floor(CAST(u[1] AS DOUBLE) * 4096.0) AS BIGINT) + 8192 AS qv
  FROM embeddings, UNNEST(list_zip(embedding, range(len(embedding)))) AS t(u)
),
cent AS (
  SELECT label AS clabel, dim, CAST(SUM(qv) // COUNT(*) AS BIGINT) AS c
  FROM q GROUP BY 1, 2
),
dist AS (
  SELECT q.vec_id, q.label AS true_label, cent.clabel AS pred_cand,
         CAST(SUM((q.qv - cent.c) * (q.qv - cent.c)) AS BIGINT) AS d2
  FROM q JOIN cent ON q.dim = cent.dim
  GROUP BY 1, 2, 3
),
pick AS (
  SELECT vec_id, true_label, pred_cand, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, pred_cand) AS rn
  FROM dist
)
"""

CENTROID_CLASSIFY_SQL = _CENT_CTES + """
SELECT vec_id, true_label, pred_cand AS pred_label, d2 AS dist2
FROM pick WHERE rn = 1
"""

CENTROID_CONFUSION_SQL = _CENT_CTES + """
SELECT true_label, pred_cand AS pred_label, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pick WHERE rn = 1
GROUP BY 1, 2
"""


def brute_force_topk_filtered(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_labels: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> ray.data.Dataset:
    """Filtered vector search: per-query top-k restricted to corpus
    rows whose ``label`` equals the query's — the metadata-predicate
    pushdown every production vector store supports.  Same shape as
    brute_force_topk (query matrix + labels broadcast once, per-batch
    vectorized cosine, m·k local partials, tiny merge); the filter is
    applied INSIDE the batch as a label mask before the top-k cut, so
    non-matching rows cost one compare, never a distance."""
    q = np.asarray(queries, np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put((qn, np.asarray(query_labels, np.int64)))

    def local_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        qm, qlab = ray.get(q_ref)
        x = _emb_matrix(t, emb_col)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = qm @ xn.T  # (m, b)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        labs = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        qids, vids, coss = [], [], []
        for qi in range(qm.shape[0]):
            ok = np.flatnonzero(labs == qlab[qi])
            if len(ok) == 0:
                continue
            s = sims[qi][ok]
            kk = min(k, len(ok))
            cut = np.partition(s, len(s) - kk)[len(s) - kk]
            cand = np.flatnonzero(s >= cut)
            order = cand[np.lexsort((ids[ok][cand], -s[cand]))][:kk]
            qids.append(np.full(kk, qi, np.int64))
            vids.append(ids[ok][order])
            coss.append(s[order])
        if not qids:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids)),
                id_col: pa.array(np.concatenate(vids)),
                "cosine": pa.array(np.concatenate(coss), pa.float64()),
            }
        )

    partials = ds.select_columns([id_col, emb_col, label_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )
    return _merge_topk(partials, k, id_col)


# --------------------------------------------------------------------------
# k-center coreset, binary-quantized Hamming search, hybrid RRF fusion
# --------------------------------------------------------------------------


def _sq_bounds(ds: ray.data.Dataset, col: str = "embedding"):
    """Per-dimension (lo, hi) corpus min/max — D-scalar block partials
    folded on the driver (the scalar_quantize pass-1, shared)."""

    def mm(t: pa.Table):
        if len(t) == 0:
            return
        m = _emb_matrix64(t, col)
        yield pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "lo": pa.array(m.min(axis=0)),
                "hi": pa.array(m.max(axis=0)),
            }
        )

    lo: dict[int, float] = {}
    hi: dict[int, float] = {}
    for r in ds.map_batches(mm, batch_format="pyarrow").take_all():
        d = r["dim"]
        lo[d] = min(lo.get(d, np.inf), r["lo"])
        hi[d] = max(hi.get(d, -np.inf), r["hi"])
    dims = sorted(lo)
    return (
        np.array([lo[d] for d in dims]),
        np.array([hi[d] for d in dims]),
    )


def _min_vec_id(ds: ray.data.Dataset) -> int:
    def pre(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {"m": pa.array(
                [int(t.column("vec_id").to_numpy(
                    zero_copy_only=False).min())])}
        )

    return min(
        r["m"] for r in ds.map_batches(pre, batch_format="pyarrow").take_all()
    )


def _code_of(ds: ray.data.Dataset, vid: int, lo_v, hi_v) -> np.ndarray:
    def pre(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        hit = ids == vid
        if not hit.any():
            return
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        yield pa.table({"code": pa.array(codes[hit].tolist())})

    return np.asarray(
        ds.map_batches(pre, batch_format="pyarrow").take_all()[0]["code"],
        np.int64,
    )


KC_K = 8


def kcenter_coreset(sf_dir: str) -> ray.data.Dataset:
    """(rnk, vec_id, dist) — greedy farthest-first (Gonzalez k-center)
    selection of ``KC_K`` points over the embeddings table: the
    diversity-coreset pick a training-data pipeline runs to choose
    maximally-spread exemplars (2-approximation of the k-center
    optimum).  EXACT and oracle-checkable because it runs on the
    integer scalar-quantization codes (the embedding_quantize
    per-element rule): every distance is an integer squared-L2, so the
    DuckDB oracle replays the greedy bit-for-bit.

    Pinned rule: seed = min vec_id (dist 0); round r picks the
    unselected point maximizing min-squared-distance to the selected
    set (ties: vec_id asc); ``dist`` is that max-min value when
    picked.

    Scale shape: per-dimension lo/hi is a D-scalar fold; each of the
    K−1 rounds is ONE streaming pass with the selected code matrix
    (≤ K×D ints) broadcast in the closure, per-block top-1
    pre-truncation (one (id, dist, code) row per block crosses), and a
    block-count-bounded driver argmax — the degree_discount precedent:
    driver greedy loops are fine when bounded by a pinned constant,
    never corpus rows."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    lo_v, hi_v = _sq_bounds(ds)
    out, _sel_ids, _sel_codes = _kcenter_greedy(ds, lo_v, hi_v)

    return ray.data.from_arrow(
        pa.table(
            {
                "rnk": pa.array([o[0] for o in out], pa.int64()),
                "vec_id": pa.array([o[1] for o in out], pa.int64()),
                "dist": pa.array([o[2] for o in out], pa.int64()),
            }
        )
    )


def _kcenter_greedy(ds: ray.data.Dataset, lo_v, hi_v):
    """The Gonzalez farthest-first loop shared by kcenter_coreset and
    kcenter_assign_inertia: returns ((rnk, vec_id, dist) rows, selected
    ids, selected code rows)."""
    seed = _min_vec_id(ds)
    seed_code = _code_of(ds, seed, lo_v, hi_v)

    sel_ids = [seed]
    sel_codes = [seed_code]
    out = [(1, seed, 0)]
    for rnk in range(2, KC_K + 1):
        sel_id_arr = np.asarray(sel_ids, np.int64)
        sel_mat = np.asarray(sel_codes, np.int64)  # (r-1, D)

        def cand(t: pa.Table, sel_id_arr=sel_id_arr, sel_mat=sel_mat):
            if len(t) == 0:
                return
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            m = _emb_matrix64(t, "embedding")
            codes = np.minimum(
                np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
            ).astype(np.int64)
            keep = ~np.isin(ids, sel_id_arr)
            ids, codes = ids[keep], codes[keep]
            if len(ids) == 0:
                return
            d = np.full(len(ids), np.iinfo(np.int64).max, np.int64)
            for s in sel_mat:
                diff = codes - s
                d = np.minimum(d, (diff * diff).sum(axis=1))
            top = np.lexsort((ids, -d))[0]
            yield pa.table(
                {
                    "vec_id": pa.array([ids[top]]),
                    "d": pa.array([int(d[top])], pa.int64()),
                    "code": pa.array([codes[top].tolist()]),
                }
            )

        rows = ds.map_batches(cand, batch_format="pyarrow").take_all()
        if not rows:
            break
        best = min(rows, key=lambda r: (-r["d"], r["vec_id"]))
        sel_ids.append(int(best["vec_id"]))
        sel_codes.append(np.asarray(best["code"], np.int64))
        out.append((rnk, int(best["vec_id"]), int(best["d"])))

    return out, sel_ids, sel_codes


_SQ_CODE_CTE = """u AS (
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS e,
    UNNEST(range(len(embedding))) AS i
  FROM embeddings
),
mm AS (SELECT i, MIN(e) AS lo, MAX(e) AS hi FROM u GROUP BY i),
c AS MATERIALIZED (
  SELECT u.vec_id, u.i,
    CAST(LEAST(FLOOR((u.e - mm.lo) * 255.0 / (mm.hi - mm.lo)), 255.0)
         AS BIGINT) AS code
  FROM u JOIN mm ON u.i = mm.i
)"""


def _kcenter_parts() -> list:
    """The shared AS MATERIALIZED greedy-chain CTE list (the
    degree_discount/MMR rule — default CTE inlining re-evaluates
    greedy chains exponentially).  The 1-row pick CTEs join in via
    cross join, never a scalar subquery inside a join condition
    (which forces a nested loop)."""
    parts = [
        _SQ_CODE_CTE,
        "p1 AS MATERIALIZED ("
        "SELECT MIN(vec_id) AS id, CAST(0 AS BIGINT) AS d FROM c)",
        """md1 AS MATERIALIZED (
  SELECT v.vec_id, CAST(SUM((v.code - q.code) * (v.code - q.code))
                        AS BIGINT) AS d
  FROM c v JOIN p1 pk ON true JOIN c q ON v.i = q.i AND q.vec_id = pk.id
  GROUP BY v.vec_id)""",
    ]
    for r in range(2, KC_K + 1):
        picked = " UNION ALL ".join(
            f"SELECT id FROM p{j}" for j in range(1, r)
        )
        parts.append(f"""p{r} AS MATERIALIZED (
  SELECT vec_id AS id, d FROM md{r - 1}
  WHERE vec_id NOT IN ({picked})
  ORDER BY d DESC, vec_id LIMIT 1)""")
        if r < KC_K:
            parts.append(f"""md{r} AS MATERIALIZED (
  SELECT v.vec_id,
    LEAST(m.d, CAST(SUM((v.code - q.code) * (v.code - q.code))
                    AS BIGINT)) AS d
  FROM c v JOIN p{r} pk ON true JOIN c q ON v.i = q.i AND q.vec_id = pk.id
  JOIN md{r - 1} m ON m.vec_id = v.vec_id
  GROUP BY v.vec_id, m.d)""")
    return parts


def _kcenter_sql() -> str:
    parts = _kcenter_parts()
    tail = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rnk, id AS vec_id, d AS dist "
        f"FROM p{r}"
        for r in range(1, KC_K + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT * FROM (" + tail + ") ORDER BY rnk"
    )


def _kcenter_assign_sql() -> str:
    """Assignment audit over the same greedy chain: nearest center per
    vector (ties: rank asc), per-center count + integer inertia."""
    parts = _kcenter_parts()
    ctr = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rnk, id FROM p{r}"
        for r in range(1, KC_K + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + f""",
ctr AS ({ctr}),
ccode AS (SELECT ctr.rnk, ctr.id, c.i, c.code FROM ctr
          JOIN c ON c.vec_id = ctr.id),
ad AS (
  SELECT v.vec_id, cc.rnk,
    CAST(SUM((v.code - cc.code) * (v.code - cc.code)) AS BIGINT) AS d
  FROM c v JOIN ccode cc ON cc.i = v.i
  GROUP BY v.vec_id, cc.rnk),
pick AS (
  SELECT vec_id, rnk, d,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, rnk) AS rn
  FROM ad)
SELECT ctr.rnk, ctr.id AS center_id,
  CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_assigned,
  CAST(COALESCE(cnt.iner, 0) AS BIGINT) AS inertia
FROM ctr LEFT JOIN (
  SELECT rnk, COUNT(*) AS n, SUM(d) AS iner FROM pick WHERE rn = 1
  GROUP BY rnk
) cnt ON cnt.rnk = ctr.rnk
ORDER BY ctr.rnk
"""
    )


KCENTER_ASSIGN_SQL = _kcenter_assign_sql()


KCENTER_CORESET_SQL = _kcenter_sql()


BITQ_K = 10


def bitq_hamming_topk(sf_dir: str) -> ray.data.Dataset:
    """(rn, vec_id, hamming) — binary-quantized nearest neighbors:
    each embedding collapses to a 64-bit sign code (bit_d = SQ code_d
    ≥ 128, i.e. above the per-dimension midpoint), and the top
    ``BITQ_K`` neighbors of the query (= min vec_id, excluded from
    results) are ranked by Hamming distance (ties: vec_id asc) — the
    32×-compressed first-stage retrieval filter in front of exact
    rescoring.  Exact/oracle-checkable: bits derive from the integer
    SQ codes (embedding_quantize rule), codes pack into two int64
    words, and distance is popcount(xor) on both sides.

    Scale shape: lo/hi is a D-scalar fold; ONE streaming pass packs
    bits (vectorized dot with the power basis) and XOR-popcounts
    against the broadcast 2-word query (np.unpackbits on the byte
    view); per-block top-k pre-truncates so ≤ k rows per block reach
    the single-block merge."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    lo_v, hi_v = _sq_bounds(ds)
    if len(lo_v) > 64:
        raise ValueError(
            f"bitq packs at most 64 dims into 2 words; got {len(lo_v)}"
        )
    qid = _min_vec_id(ds)
    qcode = _code_of(ds, qid, lo_v, hi_v)

    p0 = (np.int64(1) << np.arange(min(32, len(lo_v)), dtype=np.int64))
    p1 = (np.int64(1) << np.arange(max(0, len(lo_v) - 32), dtype=np.int64))

    def words(codes: np.ndarray):
        bits = (codes >= 128).astype(np.int64)
        w0 = bits[:, : len(p0)] @ p0
        w1 = (
            bits[:, 32 : 32 + len(p1)] @ p1
            if len(p1)
            else np.zeros(len(bits), np.int64)
        )
        return w0, w1

    q0, q1 = words(qcode[None, :])
    q0, q1 = int(q0[0]), int(q1[0])

    def popcnt(x: np.ndarray) -> np.ndarray:
        return np.unpackbits(
            x.astype(np.int64).view(np.uint8).reshape(len(x), 8), axis=1
        ).sum(axis=1).astype(np.int64)

    def local(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        keep = ids != qid
        ids, codes = ids[keep], codes[keep]
        if len(ids) == 0:
            return
        w0, w1 = words(codes)
        ham = popcnt(w0 ^ q0) + popcnt(w1 ^ q1)
        order = np.lexsort((ids, ham))[:BITQ_K]
        yield pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "hamming": pa.array(ham[order], pa.int64()),
            }
        )

    def merge(t: pa.Table):
        if len(t) == 0 or "hamming" not in t.schema.names:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        ham = t.column("hamming").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ham))[:BITQ_K]
        yield pa.table(
            {
                "rn": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)),
                "vec_id": pa.array(ids[order]),
                "hamming": pa.array(ham[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
    )


BITQ_HAMMING_SQL = (
    "WITH " + _SQ_CODE_CTE + f""",
w AS MATERIALIZED (
  SELECT vec_id,
    CAST(SUM(CASE WHEN i < 32 AND code >= 128
                  THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS w0,
    CAST(SUM(CASE WHEN i >= 32 AND code >= 128
                  THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS w1
  FROM c GROUP BY vec_id),
q AS (SELECT * FROM w WHERE vec_id = (SELECT MIN(vec_id) FROM w)),
h AS (
  SELECT w.vec_id,
    CAST(bit_count(xor(w.w0, q.w0))
       + bit_count(xor(w.w1, q.w1)) AS BIGINT) AS hamming
  FROM w, q WHERE w.vec_id <> q.vec_id)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY hamming, vec_id) AS BIGINT) AS rn,
  vec_id, hamming
FROM h ORDER BY hamming, vec_id LIMIT {BITQ_K}
"""
)


RRF_C = 60
RRF_SCALE = 10 ** 12
HYB_K = 10


def hybrid_rrf_topk(sf_dir: str) -> ray.data.Dataset:
    """(rn, id, rrf) — hybrid retrieval by Reciprocal Rank Fusion of
    the two ranking modalities this repo already verifies end-to-end:
    the lexical list A = bm25_topk (top-{HYB_K} doc_ids by BM25) and
    the dense list B = top-{HYB_K} vec_ids by integer SQ-code dot
    product against the query vector (= min vec_id; the mmr_rerank
    relevance, query row included), joined on the shared id space
    (vec_id ≡ doc_id in the testdata).  RRF kept EXACT in integers:
    ``rrf(id) = Σ_lists 10^12 // (60 + rank)`` (floor division on both
    sides — the Q11 rule: never a float reciprocal), final ranking
    (rrf desc, id asc), top {HYB_K}.

    Scale shape: both input lists are already k-bounded (bm25's
    pre-truncate→merge and the dense pass's per-block top-k → 1-block
    merge); the fusion itself touches 2k rows on the driver — the
    pinned-constant rule."""
    import os

    from .terms import bm25_topk

    a_rows = bm25_topk(sf_dir).take_all()  # ≤ HYB_K rows by contract

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    lo_v, hi_v = _sq_bounds(ds)
    qid = _min_vec_id(ds)
    qcode = _code_of(ds, qid, lo_v, hi_v)

    def rel_pre(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        rel = codes @ qcode
        order = np.lexsort((ids, -rel))[:HYB_K]
        yield pa.table(
            {"vec_id": pa.array(ids[order]), "rel": pa.array(rel[order])}
        )

    b_rows = (
        ds.map_batches(rel_pre, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {
                    "vec_id": t.column("vec_id").take(
                        pa.array(
                            np.lexsort(
                                (
                                    t.column("vec_id").to_numpy(
                                        zero_copy_only=False),
                                    -t.column("rel").to_numpy(
                                        zero_copy_only=False),
                                )
                            )[:HYB_K]
                        )
                    )
                }
            ),
            batch_size=None,
            batch_format="pyarrow",
        )
        .take_all()
    )

    score: dict[int, int] = {}
    for rn, r in enumerate(a_rows, 1):
        i = int(r["doc_id"])
        score[i] = score.get(i, 0) + RRF_SCALE // (RRF_C + rn)
    for rn, r in enumerate(b_rows, 1):
        i = int(r["vec_id"])
        score[i] = score.get(i, 0) + RRF_SCALE // (RRF_C + rn)
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:HYB_K]

    return ray.data.from_arrow(
        pa.table(
            {
                "rn": pa.array(
                    np.arange(1, len(ranked) + 1, dtype=np.int64)),
                "id": pa.array([k for k, _ in ranked], pa.int64()),
                "rrf": pa.array([v for _, v in ranked], pa.int64()),
            }
        )
    )


def _hybrid_rrf_sql() -> str:
    from .terms import BM25_TOPK_SQL

    return f"""
WITH a AS MATERIALIZED (SELECT doc_id AS id, rn FROM ({BM25_TOPK_SQL})),
{_SQ_CODE_CTE},
qv AS (SELECT MIN(vec_id) AS m FROM c),
rel AS (
  SELECT v.vec_id, CAST(SUM(v.code * q.code) AS BIGINT) AS rel
  FROM c v JOIN qv ON true JOIN c q ON q.i = v.i AND q.vec_id = qv.m
  GROUP BY v.vec_id),
b AS MATERIALIZED (
  SELECT vec_id AS id,
    CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS BIGINT) AS rn
  FROM rel QUALIFY rn <= {HYB_K}),
fused AS (SELECT id, rn FROM a UNION ALL SELECT id, rn FROM b),
rrf AS (
  SELECT id, CAST(SUM({RRF_SCALE} // ({RRF_C} + rn)) AS BIGINT) AS rrf
  FROM fused GROUP BY id)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS BIGINT) AS rn,
  id, rrf
FROM rrf ORDER BY rrf DESC, id LIMIT {HYB_K}
"""


# --------------------------------------------------------------------------
# product quantization: per-subspace Gonzalez codebooks + ADC top-k
# (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011 — public algorithm)
# --------------------------------------------------------------------------

PQ_M = 8       # subspaces (64-dim embeddings -> 8 dims each)
PQ_K = 8       # codewords per subspace
PQ_TOPK = 10


def pq_adc_topk(sf_dir: str) -> ray.data.Dataset:
    """(rn, vec_id, adc) — product-quantization retrieval: embeddings
    collapse to ``PQ_M`` byte codes (one codeword index per subspace)
    and the top ``PQ_TOPK`` neighbors of the query (= min vec_id,
    excluded) are ranked by the Asymmetric Distance Computation
    estimate (ties: vec_id asc) — the memory-bounded first-stage
    retriever (M·log2(K) bits per vector) in front of exact rescoring.

    EXACT and oracle-checkable end to end because every stage runs on
    the integer SQ codes (embedding_quantize rule): the per-subspace
    codebook is greedy farthest-first (the kcenter_coreset rule: seed =
    min vec_id's subvector; round r picks the point maximizing
    min-squared-distance to that subspace's selected set, ties vec_id
    asc, already-picked ids excluded); assignment is integer argmin
    with ties to the lowest codeword rank; ADC sums the query-to-
    codeword integer squared distances through a (M×K) lookup table.

    Scale shape: lo/hi is a D-scalar fold; each of the K−1 codebook
    rounds is ONE streaming pass with ≤ M·K×(D/M) ints broadcast in
    the closure and per-block top-1-per-subspace pre-truncation (the
    pinned-constant driver-greedy rule); the final pass encodes +
    scores each block against the broadcast LUT and pre-truncates to
    PQ_TOPK rows per block before the single-block merge."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    lo_v, hi_v = _sq_bounds(ds)
    d = len(lo_v)
    if d % PQ_M != 0:
        raise ValueError(f"pq_adc_topk: dim {d} not divisible by {PQ_M}")
    sub = d // PQ_M
    qid = _min_vec_id(ds)
    qcode = _code_of(ds, qid, lo_v, hi_v)  # (d,) int64

    # greedy farthest-first per subspace, all subspaces in one pass/round
    sel_ids = [[qid] for _ in range(PQ_M)]
    sel_codes = [[qcode[s * sub:(s + 1) * sub]] for s in range(PQ_M)]
    for _r in range(2, PQ_K + 1):
        mats = [np.asarray(c, np.int64) for c in sel_codes]  # (r-1, sub)
        idsets = [np.asarray(i, np.int64) for i in sel_ids]

        def cand(t: pa.Table, mats=mats, idsets=idsets):
            if len(t) == 0:
                return
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            m = _emb_matrix64(t, "embedding")
            codes = np.minimum(
                np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
            ).astype(np.int64)
            out_s, out_id, out_d, out_c = [], [], [], []
            for s in range(PQ_M):
                keep = ~np.isin(ids, idsets[s])
                sids = ids[keep]
                if len(sids) == 0:
                    continue
                sc = codes[keep][:, s * sub:(s + 1) * sub]
                dist = np.full(len(sids), np.iinfo(np.int64).max, np.int64)
                for w in mats[s]:
                    diff = sc - w
                    dist = np.minimum(dist, (diff * diff).sum(axis=1))
                top = np.lexsort((sids, -dist))[0]
                out_s.append(s)
                out_id.append(int(sids[top]))
                out_d.append(int(dist[top]))
                out_c.append(sc[top].tolist())
            if out_s:
                yield pa.table(
                    {
                        "s": pa.array(out_s, pa.int64()),
                        "vec_id": pa.array(out_id, pa.int64()),
                        "d": pa.array(out_d, pa.int64()),
                        "code": pa.array(out_c),
                    }
                )

        rows = ds.map_batches(cand, batch_format="pyarrow").take_all()
        by_s: dict[int, list] = {}
        for r in rows:
            by_s.setdefault(int(r["s"]), []).append(r)
        for s in range(PQ_M):
            cands = by_s.get(s)
            if not cands:
                continue
            best = min(cands, key=lambda r: (-r["d"], r["vec_id"]))
            sel_ids[s].append(int(best["vec_id"]))
            sel_codes[s].append(np.asarray(best["code"], np.int64))

    cw = [np.asarray(c, np.int64) for c in sel_codes]  # per s: (K, sub)
    qsub = [qcode[s * sub:(s + 1) * sub] for s in range(PQ_M)]
    # ADC lookup table: dist from the query's subvector to each codeword
    lut = [((cw[s] - qsub[s]) ** 2).sum(axis=1) for s in range(PQ_M)]

    def score(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        keep = ids != qid
        ids, codes = ids[keep], codes[keep]
        if len(ids) == 0:
            return
        adc = np.zeros(len(ids), np.int64)
        for s in range(PQ_M):
            sc = codes[:, s * sub:(s + 1) * sub]
            diff = sc[:, None, :] - cw[s][None, :, :]  # (b, K, sub)
            dj = (diff * diff).sum(axis=2)  # (b, K)
            code_s = np.argmin(dj, axis=1)  # first min == lowest rank
            adc += lut[s][code_s]
        order = np.lexsort((ids, adc))[:PQ_TOPK]
        yield pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "adc": pa.array(adc[order], pa.int64()),
            }
        )

    def merge(t: pa.Table):
        if len(t) == 0 or "adc" not in t.schema.names:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        adc = t.column("adc").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, adc))[:PQ_TOPK]
        yield pa.table(
            {
                "rn": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "vec_id": pa.array(ids[order]),
                "adc": pa.array(adc[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
    )


def _pq_sql() -> str:
    """AS MATERIALIZED greedy chain per subspace (kcenter rule), then
    integer assignment + ADC.  One chain serves all subspaces at once:
    each pick CTE takes the per-subspace argmax via QUALIFY."""
    sub = 64 // PQ_M
    sq = "(v.code - q.code) * (v.code - q.code)"
    parts = [
        _SQ_CODE_CTE.replace("c AS MATERIALIZED (", "c0 AS MATERIALIZED (", 1)
        + f""",
cs AS MATERIALIZED (SELECT vec_id, i // {sub} AS s, i, code FROM c0),
seed AS (SELECT MIN(vec_id) AS id FROM cs),
p1 AS MATERIALIZED (SELECT DISTINCT s, seed.id AS id FROM cs, seed)""",
        f"""md1 AS MATERIALIZED (
  SELECT v.s, v.vec_id, CAST(SUM({sq}) AS BIGINT) AS d
  FROM cs v JOIN p1 pk ON pk.s = v.s
  JOIN cs q ON q.s = v.s AND q.i = v.i AND q.vec_id = pk.id
  GROUP BY v.s, v.vec_id)""",
    ]
    for r in range(2, PQ_K + 1):
        picked = " UNION ALL ".join(
            f"SELECT s, id FROM p{j}" for j in range(1, r)
        )
        parts.append(f"""p{r} AS MATERIALIZED (
  SELECT s, vec_id AS id FROM md{r - 1} m
  WHERE NOT EXISTS (SELECT 1 FROM ({picked}) pp
                    WHERE pp.s = m.s AND pp.id = m.vec_id)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s ORDER BY d DESC, vec_id) = 1)""")
        if r < PQ_K:
            parts.append(f"""md{r} AS MATERIALIZED (
  SELECT v.s, v.vec_id, LEAST(m.d, CAST(SUM({sq}) AS BIGINT)) AS d
  FROM cs v JOIN p{r} pk ON pk.s = v.s
  JOIN cs q ON q.s = v.s AND q.i = v.i AND q.vec_id = pk.id
  JOIN md{r - 1} m ON m.s = v.s AND m.vec_id = v.vec_id
  GROUP BY v.s, v.vec_id, m.d)""")
    cb = " UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS j, s, id FROM p{j}"
        for j in range(1, PQ_K + 1)
    )
    parts.append(f"cb AS MATERIALIZED ({cb})")
    parts.append("""cbc AS MATERIALIZED (
  SELECT cb.s, cb.j, cs.i, cs.code
  FROM cb JOIN cs ON cs.vec_id = cb.id AND cs.s = cb.s)""")
    parts.append(f"""asg0 AS MATERIALIZED (
  SELECT v.vec_id, v.s, w.j,
    CAST(SUM((v.code - w.code) * (v.code - w.code)) AS BIGINT) AS dj
  FROM cs v JOIN cbc w ON w.s = v.s AND w.i = v.i
  GROUP BY v.vec_id, v.s, w.j)""")
    parts.append("""asg AS MATERIALIZED (
  SELECT vec_id, s, j FROM asg0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dj, j) = 1)""")
    parts.append("""lut AS MATERIALIZED (
  SELECT w.s, w.j,
    CAST(SUM((q.code - w.code) * (q.code - w.code)) AS BIGINT) AS dq
  FROM cbc w JOIN cs q ON q.s = w.s AND q.i = w.i
  JOIN seed ON q.vec_id = seed.id
  GROUP BY w.s, w.j)""")
    parts.append("""adc AS (
  SELECT a.vec_id, CAST(SUM(l.dq) AS BIGINT) AS adc
  FROM asg a JOIN lut l ON l.s = a.s AND l.j = a.j, seed
  WHERE a.vec_id <> seed.id
  GROUP BY a.vec_id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc, vec_id) AS BIGINT) AS rn,
  vec_id, adc
FROM adc ORDER BY adc, vec_id LIMIT {PQ_TOPK}"""
    )


PQ_ADC_SQL = _pq_sql()


# --------------------------------------------------------------------------
# Local Outlier Factor (Breunig, Kriegel, Ng & Sander, SIGMOD 2000 —
# public algorithm) on integer SQ codes
# --------------------------------------------------------------------------

LOF_K = 3


def lof_scores(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, lof_q) — Local Outlier Factor of every embedding row,
    the density-based anomaly score a curation pipeline uses to flag
    out-of-distribution vectors (LOF ≈ 1 inlier, ≫ 1 outlier).

    EXACT/oracle-checkable by construction: distances are integer
    squared-L2 on the SQ codes; the pinned neighbor rule is EXACTLY
    ``LOF_K`` neighbors by (dist, vec_id) — no distance-tie expansion
    (diverges from the classic all-ties definition, documented);
    k-distance and reach-distances are integers, so the per-point
    reachability sum S is an order-free integer; the only float math
    is ONE pinned chain ``lof = ((k/S_o1 + k/S_o2 + k/S_o3)·S_p)/k²``
    quantized to ``floor(1e9·lof)`` and mirrored verbatim in SQL.
    Raises if any S = 0 (three identical codes) — never divides by 0
    silently.

    Scale shape: the (ordered) code matrix broadcasts once and each
    block computes its rows' top-k in one vectorized pass (the
    brute_force_topk n² baseline; LSH/IVF bucketing is the scale
    path); everything after is k·n-row keyed joins and re-aggs —
    reach-distances join kdist BY NEIGHBOR, S re-aggs by point, the
    final pivot rides one point-keyed repartition."""
    import os

    import pyarrow.parquet as pq

    from .joins import join_auto
    from .shuffle import keyed_reagg

    P = 8  # keyed-join/re-agg partition count for the k·n-row tables

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    lo_v, hi_v = _sq_bounds(ds)

    t0 = pq.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(t0.column("vec_id").to_numpy(zero_copy_only=False))
    all_ids = t0.column("vec_id").to_numpy(zero_copy_only=False)[order]
    m0 = _emb_matrix64(t0, "embedding")[order]
    all_codes = np.minimum(
        np.floor((m0 - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
    ).astype(np.int64)
    n = len(all_ids)
    codes_ref = ray.put(all_codes)

    def knn(t: pa.Table):
        if len(t) == 0:
            return
        ac = ray.get(codes_ref) if not isinstance(codes_ref, np.ndarray) else codes_ref
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        # d(p, ·) integer squared-L2 via the dot expansion
        xx = (codes * codes).sum(axis=1)
        yy = (ac * ac).sum(axis=1)
        d = xx[:, None] + yy[None, :] - 2 * (codes @ ac.T)
        # exclude self by id; composite key d·n + id-rank gives the
        # (dist, vec_id) total order in ONE integer (d < 64·255², so
        # the product is far below 2^63)
        idrank = np.searchsorted(all_ids, ids)
        key = d * n + np.arange(n)[None, :]
        key[np.arange(len(ids)), idrank] = np.iinfo(np.int64).max
        part = np.argpartition(key, LOF_K - 1, axis=1)[:, :LOF_K]
        pk = np.take_along_axis(key, part, axis=1)
        srt = np.argsort(pk, axis=1)
        cols = np.take_along_axis(part, srt, axis=1)  # (b, k) neighbor idx
        dd = np.take_along_axis(d, cols, axis=1)
        yield pa.table(
            {
                "p": pa.array(np.repeat(ids, LOF_K)),
                "rnk": pa.array(
                    np.tile(np.arange(1, LOF_K + 1, dtype=np.int64), len(ids))
                ),
                "o": pa.array(all_ids[cols].ravel()),
                "d": pa.array(dd.ravel().astype(np.int64)),
            }
        )

    nb = ds.map_batches(knn, batch_format="pyarrow").materialize()

    def kd_pre(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        g = t.select(["p", "d"]).group_by(["p"]).aggregate([("d", "max")])
        yield g.rename_columns(["o_key", "kdist"])

    kd = keyed_reagg(
        nb.map_batches(kd_pre, batch_format="pyarrow"),
        ["o_key"], [("kdist", "max")], P,
    )
    rch = join_auto(nb, kd, on=("o",), right_on=("o_key",), num_partitions=P)

    def rd_fix(t: pa.Table):
        if t.num_rows == 0 or "kdist" not in t.schema.names:
            return
        rd = np.maximum(
            t.column("kdist").to_numpy(zero_copy_only=False),
            t.column("d").to_numpy(zero_copy_only=False),
        )
        yield pa.table(
            {
                "p": t.column("p"),
                "rnk": t.column("rnk"),
                "o": t.column("o"),
                "rd": pa.array(rd.astype(np.int64)),
            }
        )

    rch = rch.map_batches(rd_fix, batch_format="pyarrow").materialize()

    def s_pre(t: pa.Table):
        if t.num_rows == 0 or "rd" not in t.schema.names:
            return
        g = t.select(["p", "rd"]).group_by(["p"]).aggregate([("rd", "sum")])
        yield g.rename_columns(["s_key", "s"])

    sp = keyed_reagg(
        rch.map_batches(s_pre, batch_format="pyarrow"),
        ["s_key"], [("s", "sum")], P,
    )
    wso = join_auto(rch, sp, on=("o",), right_on=("s_key",), num_partitions=P)

    def pivot(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        p = t.column("p").to_numpy(zero_copy_only=False)
        rnk = t.column("rnk").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        if (s == 0).any():
            raise ZeroDivisionError(
                "lof_scores: a neighbor reachability sum is 0 "
                "(three identical codes) — widen LOF_K or dedup first"
            )
        order = np.lexsort((rnk, p))
        p, rnk, s = p[order], rnk[order], s[order]
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        if not (np.diff(np.r_[starts, len(p)]) == LOF_K).all():
            raise ValueError("lof_scores: point missing a neighbor rank")
        sm = s.reshape(-1, LOF_K).astype(np.float64)
        yield pa.table(
            {
                "p": pa.array(p[starts]),
                "s1": pa.array(sm[:, 0]),
                "s2": pa.array(sm[:, 1]),
                "s3": pa.array(sm[:, 2]),
            }
        )

    pv = (
        wso.repartition(P, keys=["p"])
        .map_batches(pivot, batch_size=None, batch_format="pyarrow")
    )
    fin = join_auto(pv, sp, on=("p",), right_on=("s_key",), num_partitions=P)

    def score(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        s3 = t.column("s3").to_numpy(zero_copy_only=False)
        spv = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        k = float(LOF_K)
        # ONE explicit float chain, mirrored verbatim in the SQL oracle
        lof = ((k / s1 + k / s2 + k / s3) * spv) / (k * k)
        yield pa.table(
            {
                "vec_id": t.column("p"),
                "lof_q": pa.array(
                    np.floor(lof * 1e9).astype(np.int64)
                ),
            }
        )

    return fin.map_batches(score, batch_format="pyarrow")


LOF_SCORES_SQL = (
    "WITH " + _SQ_CODE_CTE + f""",
dm AS MATERIALIZED (
  SELECT v.vec_id AS p, q.vec_id AS o,
    CAST(SUM((v.code - q.code) * (v.code - q.code)) AS BIGINT) AS d
  FROM c v JOIN c q ON v.i = q.i AND v.vec_id <> q.vec_id
  GROUP BY v.vec_id, q.vec_id),
nb AS MATERIALIZED (
  SELECT p, o, d,
    CAST(ROW_NUMBER() OVER (PARTITION BY p ORDER BY d, o) AS BIGINT) AS rnk
  FROM dm QUALIFY rnk <= {LOF_K}),
kd AS (SELECT p, MAX(d) AS kdist FROM nb GROUP BY p),
rch AS MATERIALIZED (
  SELECT nb.p, nb.rnk, nb.o, GREATEST(k2.kdist, nb.d) AS rd
  FROM nb JOIN kd k2 ON k2.p = nb.o),
sp AS (SELECT p, CAST(SUM(rd) AS BIGINT) AS s FROM rch GROUP BY p),
pv AS (
  SELECT r.p,
    MAX(CASE WHEN r.rnk = 1 THEN so.s END) AS s1,
    MAX(CASE WHEN r.rnk = 2 THEN so.s END) AS s2,
    MAX(CASE WHEN r.rnk = 3 THEN so.s END) AS s3
  FROM rch r JOIN sp so ON so.p = r.o GROUP BY r.p)
SELECT pv.p AS vec_id,
  CAST(FLOOR(((({LOF_K}.0 / CAST(s1 AS DOUBLE)
                + {LOF_K}.0 / CAST(s2 AS DOUBLE)
                + {LOF_K}.0 / CAST(s3 AS DOUBLE)) * CAST(sp.s AS DOUBLE))
              / {LOF_K * LOF_K}.0) * 1000000000.0) AS BIGINT) AS lof_q
FROM pv JOIN sp ON sp.p = pv.p
"""
)


def pq_recall(sf_dir: str) -> ray.data.Dataset:
    """One row (k, n_hits, recall_ppm) — the retrieval-quality audit
    every ANN deployment runs: how many of the PQ-ADC top-``PQ_TOPK``
    ids (ann.pq_adc_topk) appear in the EXACT integer squared-L2
    top-``PQ_TOPK`` of the same query (= min vec_id, self excluded,
    ties vec_id asc).  Both rankings are deterministic pure functions
    of the SQ codes, so even the recall number is oracle-checkable —
    recall_ppm = n_hits·10⁶ // k (non-negative floor division).

    Scale shape: the PQ side is the already-streaming pq_adc_topk; the
    exact side is one streaming pass against the broadcast query code
    with per-block top-k pre-truncation (bitq pattern); the intersect
    touches 2k ids on the driver (pinned-constant rule)."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    lo_v, hi_v = _sq_bounds(ds)
    qid = _min_vec_id(ds)
    qcode = _code_of(ds, qid, lo_v, hi_v)

    def local(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        keep = ids != qid
        ids, codes = ids[keep], codes[keep]
        if len(ids) == 0:
            return
        diff = codes - qcode
        d = (diff * diff).sum(axis=1)
        order = np.lexsort((ids, d))[:PQ_TOPK]
        yield pa.table(
            {"vec_id": pa.array(ids[order]), "d": pa.array(d[order])}
        )

    def merge(t: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                t.column("vec_id").to_numpy(zero_copy_only=False),
                t.column("d").to_numpy(zero_copy_only=False),
            )
        )[:PQ_TOPK]
        return t.take(pa.array(order))

    ex_rows = (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    exact_ids = {r["vec_id"] for r in ex_rows}
    pq_ids = {r["vec_id"] for r in pq_adc_topk(sf_dir).take_all()}
    k = PQ_TOPK
    hits = len(exact_ids & pq_ids)
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([k], pa.int64()),
                "n_hits": pa.array([hits], pa.int64()),
                "recall_ppm": pa.array([hits * 10**6 // k], pa.int64()),
            }
        )
    )


PQ_RECALL_SQL = f"""
WITH pqt AS ({PQ_ADC_SQL}),
{_SQ_CODE_CTE.replace("c AS MATERIALIZED", "cr AS MATERIALIZED")},
qseed AS (SELECT MIN(vec_id) AS id FROM cr),
ex AS (
  SELECT v.vec_id,
    CAST(SUM((v.code - q.code) * (v.code - q.code)) AS BIGINT) AS d
  FROM cr v JOIN qseed ON v.vec_id <> qseed.id
  JOIN cr q ON q.i = v.i AND q.vec_id = qseed.id
  GROUP BY v.vec_id
  ORDER BY d, v.vec_id LIMIT {PQ_TOPK}
),
hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS h
         FROM ex JOIN pqt ON pqt.vec_id = ex.vec_id)
SELECT CAST({PQ_TOPK} AS BIGINT) AS k, h AS n_hits,
  CAST(h * 1000000 // {PQ_TOPK} AS BIGINT) AS recall_ppm
FROM hits
"""


# --------------------------------------------------------------------------
# Range search (epsilon-ball neighbor counts) on integer SQ codes
# --------------------------------------------------------------------------

EPS_Q = 8           # query points = the EPS_Q smallest vec_ids
EPS_R = 200_000     # integer squared-L2 radius over 64x uint8 codes


def epsilon_neighbors(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, n_within) — range search: for each of the ``EPS_Q``
    smallest vec_ids, how many corpus vectors (self included) lie
    within integer squared-L2 distance ``EPS_R`` of it on the SQ
    codes.  The radius-query baseline every ANN index is measured
    against; fully integer (quantize-first rule), so the counts are
    oracle-exact.  R=200k was picked by scanning the distance
    distribution (~1st percentile; 30-90 hits/query at both SFs —
    50k..150k were degenerate all-1s).

    Scale shape: query codes are a Q x D broadcast (closure capture,
    pinned constant Q); ONE streaming pass emits Q-row count partials
    per block; the driver folds Q x nblocks ints (order-free integer
    sum)."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    lo_v, hi_v = _sq_bounds(ds)

    def qpre(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.argsort(ids)[:EPS_Q]
        m = _emb_matrix64(t, "embedding")[keep]
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        yield pa.table(
            {
                "vec_id": pa.array(ids[keep]),
                "code": pa.array(codes.tolist()),
            }
        )

    qrows = sorted(
        ds.map_batches(qpre, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"],
    )[:EPS_Q]
    qids = np.array([r["vec_id"] for r in qrows], np.int64)
    qcodes = np.array([r["code"] for r in qrows], np.int64)

    def cnt(t: pa.Table):
        if len(t) == 0:
            return
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        ns = np.empty(len(qids), np.int64)
        for qi in range(len(qids)):
            diff = codes - qcodes[qi]
            ns[qi] = int(((diff * diff).sum(axis=1) <= EPS_R).sum())
        yield pa.table({"vec_id": pa.array(qids), "n": pa.array(ns)})

    tot: dict[int, int] = {int(q): 0 for q in qids}
    for r in ds.map_batches(cnt, batch_format="pyarrow").take_all():
        tot[r["vec_id"]] += r["n"]
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(sorted(tot), pa.int64()),
                "n_within": pa.array(
                    [tot[k] for k in sorted(tot)], pa.int64()
                ),
            }
        )
    )


EPSN_SQL = f"""
WITH {_SQ_CODE_CTE},
q AS (SELECT vec_id FROM c GROUP BY vec_id ORDER BY vec_id LIMIT {EPS_Q}),
d AS (
  SELECT qc.vec_id AS qid, v.vec_id AS vid,
    SUM((v.code - qc.code) * (v.code - qc.code)) AS d
  FROM c v JOIN c qc ON v.i = qc.i JOIN q ON qc.vec_id = q.vec_id
  GROUP BY qc.vec_id, v.vec_id
)
SELECT qid AS vec_id,
  CAST(SUM(CASE WHEN d <= {EPS_R} THEN 1 ELSE 0 END) AS BIGINT) AS n_within
FROM d GROUP BY qid ORDER BY qid
"""


def kcenter_assign_inertia(sf_dir: str) -> ray.data.Dataset:
    """(rnk, center_id, n_assigned, inertia) — the clustering-quality
    audit on top of the k-center coreset: every corpus vector assigned
    to its nearest selected center (integer squared-L2 on the SQ
    codes; ties broken by center rank asc), reporting per-center
    membership count and inertia (Σ of the integer distances).  The
    number a pipeline owner reads before trusting the coreset as a
    cluster skeleton — and, per the quantize-first rule, every value
    is oracle-exact.

    Scale shape: the K selected codes broadcast in the closure
    (pinned-constant K×D ints); ONE streaming assignment pass emits
    K-row partials; the driver folds K×nblocks ints."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    lo_v, hi_v = _sq_bounds(ds)
    out, sel_ids, sel_codes = _kcenter_greedy(ds, lo_v, hi_v)
    centers = np.asarray(sel_codes, np.int64)        # (K, D)
    cid = np.asarray(sel_ids, np.int64)
    K = len(cid)

    def assign(t: pa.Table):
        if len(t) == 0:
            return
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        d = np.empty((len(codes), K), np.int64)
        for k in range(K):
            diff = codes - centers[k]
            d[:, k] = (diff * diff).sum(axis=1)
        best = d.argmin(axis=1)  # first minimum = lowest rank (tie rule)
        bd = d[np.arange(len(codes)), best]
        n = np.bincount(best, minlength=K).astype(np.int64)
        iner = np.zeros(K, np.int64)
        np.add.at(iner, best, bd)  # pure-integer fold, never float
        yield pa.table(
            {
                "k": pa.array(np.arange(K, dtype=np.int64)),
                "n": pa.array(n),
                "iner": pa.array(iner),
            }
        )

    n_tot = np.zeros(K, np.int64)
    i_tot = np.zeros(K, dtype=object)
    i_tot[:] = 0
    for r in ds.map_batches(assign, batch_format="pyarrow").take_all():
        n_tot[r["k"]] += r["n"]
        i_tot[r["k"]] += int(r["iner"])
    return ray.data.from_arrow(
        pa.table(
            {
                "rnk": pa.array(np.arange(1, K + 1, dtype=np.int64)),
                "center_id": pa.array(cid),
                "n_assigned": pa.array(n_tot),
                "inertia": pa.array([int(v) for v in i_tot], pa.int64()),
            }
        )
    )


# --------------------------------------------------------------------------
# Hard-example mining on the labeled embeddings (triplet-loss prep)
# --------------------------------------------------------------------------

HN_Q = 8   # anchors = the HN_Q smallest vec_ids


def hard_negative_mining(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, label, neg_id, neg_d, pos_id, pos_d) — the triplet
    mining step of metric-learning data prep: for each of the ``HN_Q``
    smallest vec_ids (anchors), the HARDEST NEGATIVE (nearest vector
    with a different label; ties vec_id asc) and HARDEST POSITIVE
    (farthest vector with the same label, self excluded; ties vec_id
    asc) by integer squared-L2 on the SQ codes — so every pick and
    distance is oracle-exact.

    Scale shape: anchor codes+labels broadcast (pinned constant);
    ONE streaming pass emits per-block best-candidate partials
    (≤ 2 rows per anchor per block); the driver folds with the same
    (d, id) tie rule."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    lo_v, hi_v = _sq_bounds(ds)

    def qpre(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.argsort(ids)[:HN_Q]
        m = _emb_matrix64(t, "embedding")[keep]
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        yield pa.table(
            {
                "vec_id": pa.array(ids[keep]),
                "label": pc.cast(
                    t.column("label").take(pa.array(keep)), pa.int64()
                ),
                "code": pa.array(codes.tolist()),
            }
        )

    qrows = sorted(
        ds.map_batches(qpre, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"],
    )[:HN_Q]
    qids = np.array([r["vec_id"] for r in qrows], np.int64)
    qlabs = np.array([r["label"] for r in qrows], np.int64)
    qcodes = np.array([r["code"] for r in qrows], np.int64)

    def cand(t: pa.Table):
        if len(t) == 0:
            return
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        labs = pc.cast(t.column("label"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        m = _emb_matrix64(t, "embedding")
        codes = np.minimum(
            np.floor((m - lo_v) * SQ_LEVELS / (hi_v - lo_v)), SQ_LEVELS
        ).astype(np.int64)
        qs, kinds, vids, dd = [], [], [], []
        for qi in range(len(qids)):
            diff = codes - qcodes[qi]
            d = (diff * diff).sum(axis=1)
            nm = labs != qlabs[qi]
            if nm.any():
                j = np.lexsort((ids[nm], d[nm]))[0]
                qs.append(qi)
                kinds.append(0)
                vids.append(ids[nm][j])
                dd.append(d[nm][j])
            pm = (labs == qlabs[qi]) & (ids != qids[qi])
            if pm.any():
                j = np.lexsort((ids[pm], -d[pm]))[0]
                qs.append(qi)
                kinds.append(1)
                vids.append(ids[pm][j])
                dd.append(d[pm][j])
        if not qs:
            return
        yield pa.table(
            {
                "qi": pa.array(qs, pa.int64()),
                "kind": pa.array(kinds, pa.int64()),
                "vid": pa.array(np.array(vids, np.int64)),
                "d": pa.array(np.array(dd, np.int64)),
            }
        )

    best: dict[tuple[int, int], tuple[int, int]] = {}
    for r in ds.map_batches(cand, batch_format="pyarrow").take_all():
        key = (r["qi"], r["kind"])
        cur = best.get(key)
        # neg: min (d, id); pos: max d then min id
        cand_t = (
            (r["d"], r["vid"]) if r["kind"] == 0 else (-r["d"], r["vid"])
        )
        if cur is None or cand_t < cur:
            best[key] = cand_t
    neg = {qi: best[(qi, 0)] for qi in range(len(qids)) if (qi, 0) in best}
    pos = {qi: best[(qi, 1)] for qi in range(len(qids)) if (qi, 1) in best}
    rows = [qi for qi in range(len(qids)) if qi in neg and qi in pos]
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([int(qids[q]) for q in rows], pa.int64()),
                "label": pa.array([int(qlabs[q]) for q in rows], pa.int64()),
                "neg_id": pa.array([neg[q][1] for q in rows], pa.int64()),
                "neg_d": pa.array([neg[q][0] for q in rows], pa.int64()),
                "pos_id": pa.array([pos[q][1] for q in rows], pa.int64()),
                "pos_d": pa.array([-pos[q][0] for q in rows], pa.int64()),
            }
        )
    )


HARD_NEG_SQL = f"""
WITH {_SQ_CODE_CTE},
lab AS (SELECT vec_id, label FROM embeddings),
q AS (SELECT vec_id FROM c GROUP BY vec_id ORDER BY vec_id LIMIT {HN_Q}),
d AS (
  SELECT qc.vec_id AS qid, v.vec_id AS vid,
    CAST(SUM((v.code - qc.code) * (v.code - qc.code)) AS BIGINT) AS d
  FROM c v JOIN c qc ON v.i = qc.i JOIN q ON qc.vec_id = q.vec_id
  GROUP BY qc.vec_id, v.vec_id
),
dl AS (
  SELECT d.qid, d.vid, d.d, ql.label AS qlab, vl.label AS vlab
  FROM d JOIN lab ql ON ql.vec_id = d.qid
  JOIN lab vl ON vl.vec_id = d.vid
),
neg AS (SELECT qid, vid, d,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, vid) AS rn
        FROM dl WHERE vlab <> qlab),
pos AS (SELECT qid, vid, d,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d DESC, vid) AS rn
        FROM dl WHERE vlab = qlab AND vid <> qid)
SELECT n.qid AS vec_id, CAST(ql.label AS BIGINT) AS label,
  n.vid AS neg_id, n.d AS neg_d, p.vid AS pos_id, p.d AS pos_d
FROM neg n
JOIN pos p ON p.qid = n.qid AND p.rn = 1
JOIN lab ql ON ql.vec_id = n.qid
WHERE n.rn = 1
"""
