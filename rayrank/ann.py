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
import pandas as pd
import pyarrow as pa
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
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        m = qm.shape[0]
        qid = np.repeat(np.arange(m, dtype=np.int64), kk)
        vid = ids[part.ravel()]
        cos = np.take_along_axis(sims, part, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(qid),
                id_col: pa.array(vid),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    from .shuffle import grouped_map

    return grouped_map(partials, ["query_id"], merge, num_partitions=4)


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
