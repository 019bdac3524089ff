"""Damped PageRank with dangling-mass redistribution, reference-exact
normalization (SURVEY.md §3.2; /root/reference/pagerank.py:100-139).

Semantics reproduced to allclose 1e-6 per vertex (float64 here; the
reference's float32 agrees to ≤1.3e-8 on the pinned fixture):

  1. dangling indicator a: vertices whose (post-prune) out-degree is 0;
  2. quirk 1 — v is **L2**-normalized (pagerank.py:113) even though the
     personalization builder L1-normalizes (:95) → scores are not a
     probability distribution;
  3. x0 = 1/√n per entry (L2-normalized, :116-118);
  4. per iteration: ``x ← α·Pᵀx + (α·(aᵀx) + (1−α))·v`` (:125-132);
  5. quirk 2 — ``x /= ‖x‖₁`` after every iteration (:133);
  6. stop when ``‖x − x_prev‖₂ < ε`` (:134-137), max 1000 iterations.

Two implementations behind the same math:

  * :func:`power_method` — the scale path: long-lived CSR shard actors
    (shards.py) + per-partition reduce tasks.  Per iteration the only
    data movement is the pre-aggregated contribution exchange (≤ Q²
    small objects) plus O(Q) scalars; score partitions never leave the
    object store.  Per-iteration Parquet checkpoints + manifest.
  * :func:`power_method_dataset` — pure ray.data.Dataset pipeline
    (join + groupby per iteration).  The vanilla fallback / cross-check;
    correct at any scale but re-shuffles edges every iteration, so the
    shard path is the benchmarked one (SURVEY.md §6 implication).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .checkpoint import latest_complete, load_checkpoint, read_manifest, write_checkpoint
from .graph import GraphMeta, load_vertices
from .shards import create_shards


@ray.remote
def _dangling_part(x: np.ndarray, mask: np.ndarray) -> float:
    return float(x[mask].sum())


@ray.remote(num_returns=3)
def _reduce_part(s_q: int, alpha: float, coeff: float, v_q, *parts):
    """Combine the Q shard outputs addressed to partition q:
    x_un = α·Σ contribs + coeff·v.  Returns (x_un, its L1 part, rows
    received through the exchange — the rows_shuffled metric)."""
    y = np.zeros(s_q, np.float64)
    rows = 0
    for idx, vals in parts:
        if len(idx):
            y += np.bincount(idx, weights=vals, minlength=s_q)
        rows += len(idx)
    x_un = alpha * y + coeff * v_q
    return x_un, float(np.abs(x_un).sum()), rows


@ray.remote(num_returns=3)
def _scale_part(x_un: np.ndarray, l1: float, x_prev: np.ndarray, dang_mask):
    """L1-normalize, L2-residual part vs previous iterate, and the NEW
    iterate's dangling-mass part (needed by the next iteration)."""
    x = x_un / l1
    d = x - x_prev
    return x, float(np.dot(d, d)), float(x[dang_mask].sum())


@dataclass
class PageRankResult:
    meta: GraphMeta
    part_refs: list
    iterations: int
    residual: float
    converged: bool
    history: list[dict] = field(default_factory=list)

    def to_numpy_by_vid(self) -> np.ndarray:
        """Dense score array indexed by vid-compact order — driver-side,
        test/report use only."""
        out = np.zeros(self.meta.n, np.float64)
        # vids are r*Q+q with r < part_sizes[q]; scatter into a dict-free
        # dense array sized max_vid+1
        Q = self.meta.Q
        max_vid = max(
            (s - 1) * Q + q for q, s in enumerate(self.meta.part_sizes) if s
        )
        out = np.zeros(max_vid + 1, np.float64)
        for q, ref in enumerate(self.part_refs):
            vals = ray.get(ref)
            out[np.arange(len(vals)) * Q + q] = vals
        return out

    def scores_table(self) -> pa.Table:
        Q = self.meta.Q
        vids, scores = [], []
        for q, ref in enumerate(self.part_refs):
            vals = ray.get(ref)
            vids.append(np.arange(len(vals), dtype=np.int64) * Q + q)
            scores.append(vals)
        return pa.table(
            {
                "vid": np.concatenate(vids) if vids else np.empty(0, np.int64),
                "score": np.concatenate(scores) if scores else np.empty(0),
            }
        )

    def scores_dataset(self, graph_dir: str) -> ray.data.Dataset:
        """(vid, name, score) Dataset — scores joined to vertex names."""
        from .joins import hash_join

        scores = ray.data.from_arrow(self.scores_table())
        verts = load_vertices(graph_dir).select_columns(["vid", "name"])
        return hash_join(
            scores, verts, on=("vid",), num_partitions=self.meta.Q
        )

    def scores_by_name(self, graph_dir: str) -> dict[str, float]:
        out = {}
        for b in self.scores_dataset(graph_dir).iter_batches(batch_format="pyarrow"):
            for nm, sc in zip(
                b.column("name").to_pylist(), b.column("score").to_pylist()
            ):
                out[nm] = sc
        return out


def _uniform_parts(meta: GraphMeta, value: float) -> list:
    return [ray.put(np.full(s, value, np.float64)) for s in meta.part_sizes]


def _l2_normalize_parts(parts: list) -> list:
    sq = sum(float(np.dot(ray.get(r), ray.get(r))) for r in parts)
    norm = math.sqrt(sq)
    return [ray.put(ray.get(r) / norm) for r in parts]


def power_method(
    graph_dir: str,
    alpha: float = 0.85,
    epsilon: float = 1e-6,
    max_iterations: int = 1000,
    v_parts: list | None = None,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
) -> PageRankResult:
    """Reference-exact power method over the partitioned graph at
    ``graph_dir`` (built by :func:`rayrank.graph.build_graph`).

    ``v_parts``: optional unnormalized personalization partitions
    (indicator weights); L2-normalized here exactly as the reference
    net-normalizes (L1 in the builder then L2 at :113 — scale-invariant,
    so a single L2 suffices).
    """
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    n = meta.n
    own_shards = shards is None
    if own_shards:
        shards = create_shards(graph_dir, meta)
    dang_masks = [s.dangling_mask.remote() for s in shards]

    if v_parts is None:
        v_parts = _uniform_parts(meta, 1.0 / math.sqrt(n))
    else:
        v_parts = _l2_normalize_parts(v_parts)

    start_iter = 0
    dang = None
    x = None
    if resume and ckpt_dir is not None:
        last = latest_complete(ckpt_dir)
        if last is not None:
            x = load_checkpoint(ckpt_dir, last, Q)
            man = read_manifest(ckpt_dir, last)
            dang = man["metrics"].get("dangling_mass_next")
            start_iter = last + 1
    if x is None:
        x = _uniform_parts(meta, 1.0 / math.sqrt(n))

    history: list[dict] = []
    residual = float("inf")
    converged = False
    it = start_iter - 1
    for it in range(start_iter, max_iterations):
        if dang is None:
            dang = sum(
                ray.get(
                    [_dangling_part.remote(x[q], dang_masks[q]) for q in range(Q)]
                )
            )
        coeff = alpha * dang + (1.0 - alpha)

        contribs = []
        for p in range(Q):
            out = shards[p].spmv.options(num_returns=Q).remote(x[p])
            contribs.append(out if Q > 1 else [out])
        red = [
            _reduce_part.remote(
                meta.part_sizes[q],
                alpha,
                coeff,
                v_parts[q],
                *[contribs[p][q] for p in range(Q)],
            )
            for q in range(Q)
        ]
        l1_parts = ray.get([r[1] for r in red])
        rows_shuffled = sum(ray.get([r[2] for r in red]))
        l1 = sum(l1_parts)

        sc = [
            _scale_part.remote(red[q][0], l1, x[q], dang_masks[q]) for q in range(Q)
        ]
        x_new = [s[0] for s in sc]
        res_sq = sum(ray.get([s[1] for s in sc]))
        dang_next = sum(ray.get([s[2] for s in sc]))
        residual = math.sqrt(res_sq)
        x = x_new
        dang = dang_next
        converged = residual < epsilon

        metrics = {
            "residual_l2": residual,
            "l1_before_norm": l1,
            "dangling_mass": coeff,
            "dangling_mass_next": dang_next,
            "rows_shuffled": rows_shuffled,
            "alpha": alpha,
        }
        history.append({"iteration": it, **metrics})
        if ckpt_dir is not None and (
            it % ckpt_interval == 0 or converged or it == max_iterations - 1
        ):
            write_checkpoint(ckpt_dir, it, x, Q, metrics)
        if converged:
            break

    return PageRankResult(
        meta=meta,
        part_refs=x,
        iterations=it + 1,
        residual=residual,
        converged=converged,
        history=history,
    )


# ---------------------------------------------------------------------------
# Pure-Dataset fallback (cross-check / vanilla path)
# ---------------------------------------------------------------------------


def power_method_dataset(
    graph_dir: str,
    alpha: float = 0.85,
    epsilon: float = 1e-6,
    max_iterations: int = 1000,
) -> ray.data.Dataset:
    """Uniform-v reference-exact PageRank as a per-iteration Dataset
    pipeline (edges ⋈ scores → groupby(dst).sum → normalize).  Each
    iteration materializes the new score vector (without this, lineage
    re-executes all previous iterations).  Returns (vid, score)."""
    import pyarrow.compute as pc

    from .joins import hash_join

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    n, Q = meta.n, meta.Q
    edges = ray.data.read_parquet(
        os.path.join(graph_dir, "edges"), columns=["src", "dst", "w"]
    ).materialize()
    verts = load_vertices(graph_dir).select_columns(["vid"]).materialize()

    srcs = {r["src"] for b in edges.select_columns(["src"]).iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()}
    srcs_ref = ray.put(np.array(sorted(srcs), dtype=np.int64))

    def init_x(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t.column("vid"),
                "score": pa.array(
                    np.full(len(t), 1.0 / math.sqrt(n)), pa.float64()
                ),
            }
        )

    x = verts.map_batches(init_x, batch_format="pyarrow").materialize()
    v_val = 1.0 / math.sqrt(n)

    def dangling_mass(xds: ray.data.Dataset) -> float:
        def part(t: pa.Table) -> pa.Table:
            sarr = ray.get(srcs_ref)
            vid = t.column("vid").to_numpy()
            idx = np.clip(np.searchsorted(sarr, vid), 0, max(len(sarr) - 1, 0))
            dang = (
                sarr[idx] != vid
                if len(sarr)
                else np.ones(len(vid), bool)
            )
            sc = t.column("score").to_numpy()
            return pa.table({"m": pa.array([float(sc[dang].sum())])})

        tot = 0.0
        for b in xds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            tot += float(pc.sum(b.column("m")).as_py() or 0.0)
        return tot

    for _ in range(max_iterations):
        dm = dangling_mass(x)
        coeff = alpha * dm + (1.0 - alpha)

        contrib = hash_join(
            edges, x, on=("src",), right_on=("vid",), num_partitions=Q
        ).map_batches(
            lambda t: pa.table(
                {
                    "dst": t.column("dst"),
                    "c": pc.multiply(t.column("w"), t.column("score")),
                }
            ),
            batch_format="pyarrow",
        )
        sums = contrib.groupby("dst").sum("c")
        x_new = hash_join(
            verts, sums, on=("vid",), right_on=("dst",), how="left_outer",
            num_partitions=Q,
        ).map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("vid"),
                    "score": pc.add(
                        pc.multiply(
                            pc.coalesce(t.column("sum(c)"), pa.scalar(0.0)), alpha
                        ),
                        coeff * v_val,
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        l1 = x_new.sum("score")
        x_new = x_new.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("vid"),
                    "score": pc.divide(t.column("score"), l1),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

        diff = hash_join(
            x_new,
            x.map_batches(
                lambda t: t.rename_columns(["pvid", "pscore"]),
                batch_format="pyarrow",
            ),
            on=("vid",),
            right_on=("pvid",),
            num_partitions=Q,
        ).map_batches(
            lambda t: pa.table(
                {
                    "d2": pc.power(
                        pc.subtract(t.column("score"), t.column("pscore")), 2
                    )
                }
            ),
            batch_format="pyarrow",
        )
        residual = math.sqrt(diff.sum("d2"))
        x = x_new
        if residual < epsilon:
            break
    return x
