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
    (shards.py) that also OWN their score partition.  One iteration =
    two actor-call rounds (gather → on-actor reduce); the driver moves
    only scalars; the L1 normalization is carried as a scalar folded
    into the next gather, and the L2 stop residual is computed with a
    one-step lag inside the reduce (≈1e-16 relative difference vs the
    reference's explicit divide — far inside the 1e-6 budget).
    Per-iteration Parquet checkpoints + manifest, resumable.
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

from .checkpoint import (
    latest_complete,
    load_checkpoint,
    write_manifest,
)
from .graph import GraphMeta, load_vertices
from .shards import create_shards, gather_refs


@dataclass
class PageRankResult:
    meta: GraphMeta
    part_refs: list
    iterations: int
    residual: float
    converged: bool
    history: list[dict] = field(default_factory=list)

    def scores_table(self) -> pa.Table:
        """Driver-side concatenation — TEST/small-result helper only;
        production paths use :meth:`scores_dataset` (no O(V) driver
        memory)."""
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
        """(vid, name, score) Dataset.  Each partition is zipped with
        its co-resident vertex names INSIDE a task (shards.zip_names) —
        no shuffle, no driver-side vector."""
        from .shards import zip_names

        vert_dir = os.path.join(graph_dir, "vertices")
        refs = [
            zip_names.remote(vert_dir, q, self.meta.Q, ref, "score")
            for q, ref in enumerate(self.part_refs)
        ]
        return ray.data.from_arrow_refs(refs)

    def scores_by_name(self, graph_dir: str) -> dict[str, float]:
        out = {}
        for b in self.scores_dataset(graph_dir).iter_batches(batch_format="pyarrow"):
            for nm, sc in zip(
                b.column("name").to_pylist(), b.column("score").to_pylist()
            ):
                out[nm] = sc
        return out


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
    x0_parts: list | None = None,
) -> PageRankResult:
    """Reference-exact power method over the partitioned graph at
    ``graph_dir`` (built by :func:`rayrank.graph.build_graph`).

    ``v_parts``: optional unnormalized personalization partitions
    (indicator weights); L2-normalized actor-side exactly as the
    reference net-normalizes (L1 in the builder then L2 at :113 —
    scale-invariant, so a single L2 suffices).

    ``x0_parts``: optional L1-NORMALIZED warm-start iterate partitions
    (arrays or ObjectRefs, local-index order) — the delta-refresh path:
    seed from a previous run's converged scores (see
    :func:`warm_start_parts`) so an incrementally-changed graph
    converges in far fewer iterations than a uniform cold start.  The
    fixpoint is start-independent, so the answer is unchanged.
    Ignored when a checkpoint resume supplies the iterate.
    """
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    n = meta.n
    if shards is None:
        shards = create_shards(graph_dir, meta)

    # ---- personalization -------------------------------------------------
    v_value = None
    if v_parts is not None:
        sumsq = ray.get(
            [shards[q].set_v.remote(v_parts[q]) for q in range(Q)]
        )
        norm = math.sqrt(sum(sumsq))
        if norm <= 0:
            raise ValueError("personalization vector is all-zero")
        ray.get([s.scale_v.remote(1.0 / norm) for s in shards])
    else:
        v_value = 1.0 / math.sqrt(n)  # uniform v, L2-normalized

    # ---- init / resume ---------------------------------------------------
    start_round = 0
    if resume and ckpt_dir is not None:
        last = latest_complete(ckpt_dir)
        if last is not None:
            refs = load_checkpoint(ckpt_dir, last, Q)
            if v_parts is None:
                ray.get([s.init_uniform_v.remote(v_value) for s in shards])
            parts = ray.get(
                [shards[q].set_scores.remote(refs[q]) for q in range(Q)]
            )
            start_round = last + 1
            dang = sum(p[0] for p in parts)  # checkpointed x is normalized
    if start_round == 0 and x0_parts is not None:
        if v_parts is None:
            ray.get([s.init_uniform_v.remote(v_value) for s in shards])
        parts = ray.get(
            [shards[q].set_scores.remote(x0_parts[q]) for q in range(Q)]
        )
        l1 = sum(p[1] for p in parts)
        if not (0.999 <= l1 <= 1.001):
            raise ValueError(
                f"x0_parts must be L1-normalized (got ‖x0‖₁={l1}); "
                "build them with warm_start_parts"
            )
        dang = sum(p[0] for p in parts)
        start_round = -1  # sentinel: iterate from 0 but skip cold init
    if start_round == 0:
        x0 = 1.0 / math.sqrt(n)
        parts = ray.get(
            [s.init_pr.remote(x0, v_value) for s in shards]
        )
        dang = sum(p[0] for p in parts)
    start_round = max(start_round, 0)

    # scalar state: x_t = c_t · y_t ; y lives on the actors
    c_cur = 1.0
    c_prev = 1.0
    history: list[dict] = []
    residual = float("inf")
    converged = False
    rounds_done = start_round

    for t in range(start_round, max_iterations):
        coeff = alpha * dang + (1.0 - alpha)
        msgs = gather_refs(shards, "gather_pr")
        red = [
            shards[q].reduce_pr.remote(
                alpha * c_cur,
                coeff,
                c_cur,
                c_prev,
                *[msgs[p][q] for p in range(Q)],
            )
            for q in range(Q)
        ]
        stats = ray.get(red)
        l1 = sum(s[0] for s in stats)
        dang_un = sum(s[1] for s in stats)
        res_sq_lag = sum(s[2] for s in stats)
        rows_shuffled = sum(s[3] for s in stats)

        c_next = 1.0 / l1
        dang = c_next * dang_un
        rounds_done = t + 1

        lag_residual = math.sqrt(res_sq_lag) if t > start_round else None
        avail = ray.available_resources()
        metrics = {
            "l1_before_norm": l1,
            "dangling_mass_next": dang,
            "rows_shuffled": rows_shuffled,
            "residual_l2_prev_update": lag_residual,
            "alpha": alpha,
            # object-store headroom proxy for spill pressure (north_rule
            # asks for per-iteration memory/spill telemetry)
            "object_store_memory_available": avail.get("object_store_memory"),
        }
        history.append({"iteration": t, **metrics})

        if ckpt_dir is not None and (
            t % ckpt_interval == 0 or t == max_iterations - 1
        ):
            lineage = ray.get(
                [
                    shards[q].write_scores.remote(
                        _ckpt_part_path(ckpt_dir, t, q), c_next, False
                    )
                    for q in range(Q)
                ]
            )
            write_manifest(ckpt_dir, t, metrics, lineage)

        if lag_residual is not None and lag_residual < epsilon:
            # reference broke at update t-1: result is x_t (= y_prev·c_cur)
            residual = lag_residual
            converged = True
            refs = [s.scores.remote(c_cur, True) for s in shards]
            return PageRankResult(
                meta=meta,
                part_refs=refs,
                iterations=t,
                residual=residual,
                converged=converged,
                history=history,
            )

        c_prev, c_cur = c_cur, c_next

    # loop exhausted: evaluate the final update's residual (not yet seen
    # through the lag) so the convergence report matches the reference
    res_parts = ray.get(
        [s.final_residual.remote(c_cur, c_prev) for s in shards]
    )
    residual = math.sqrt(sum(res_parts)) if rounds_done > start_round else float("inf")
    converged = residual < epsilon
    refs = [s.scores.remote(c_cur, False) for s in shards]
    return PageRankResult(
        meta=meta,
        part_refs=refs,
        iterations=rounds_done,
        residual=residual,
        converged=converged,
        history=history,
    )


def _ckpt_part_path(ckpt_dir: str, iteration: int, q: int) -> str:
    d = os.path.join(ckpt_dir, f"iter={iteration:04d}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"part-{q:05d}.parquet")


# ---------------------------------------------------------------------------
# Pure-Dataset fallback (cross-check / vanilla path)
# ---------------------------------------------------------------------------


def power_method_dataset(
    graph_dir: str,
    alpha: float = 0.85,
    epsilon: float = 1e-6,
    max_iterations: int = 1000,
    v_ds: ray.data.Dataset | None = None,
    history: list | None = None,
) -> ray.data.Dataset:
    """Reference-exact PageRank as a per-iteration Dataset pipeline
    (edges ⋈ scores → groupby(dst).sum → normalize).  Each iteration
    materializes the new score vector (without this, lineage re-executes
    all previous iterations).  Returns (vid, score).

    ``v_ds``: optional UNNORMALIZED personalization Dataset (vid, v) —
    missing vids count as 0; L2-normalized here exactly like the shard
    path (reference pagerank.py:95,113 net effect).  The dangling
    indicator and v are attached to the vertex table ONCE (left-outer
    joins) and carried through every iteration — no driver-side source
    set, no Python row loops (r1 VERDICT findings #2/#6)."""
    import pyarrow.compute as pc

    from .joins import hash_join

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    n, Q = meta.n, meta.Q
    edges = ray.data.read_parquet(
        os.path.join(graph_dir, "edges"), columns=["src", "dst", "w"]
    ).materialize()
    verts = load_vertices(graph_dir).select_columns(["vid"])

    # distinct sources, map-side combined (tiny: ≤ V rows)
    def local_src_unique(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        u = np.unique(t.column("src").to_numpy(zero_copy_only=False))
        yield pa.table({"svid": pa.array(u, pa.int64()),
                        "m": pa.array(np.ones(len(u), np.int8))})

    srcs = (
        edges.select_columns(["src"])
        .map_batches(local_src_unique, batch_format="pyarrow")
        .groupby("svid")
        .count()
        .select_columns(["svid"])
        .map_batches(
            lambda t: t.append_column("m", pa.array(np.ones(len(t), np.int8))),
            batch_format="pyarrow",
        )
    )
    aug = hash_join(
        verts, srcs, on=("vid",), right_on=("svid",), how="left_outer",
        num_partitions=Q,
    ).map_batches(
        lambda t: pa.table(
            {
                "vid": t.column("vid"),
                "dangling": pc.is_null(t.column("m")),
            }
        ),
        batch_format="pyarrow",
    )
    if v_ds is not None:
        aug = hash_join(
            aug,
            v_ds.map_batches(
                lambda t: t.rename_columns(["uvid", "uv"]),
                batch_format="pyarrow",
            ),
            on=("vid",),
            right_on=("uvid",),
            how="left_outer",
            num_partitions=Q,
        ).map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("vid"),
                    "dangling": t.column("dangling"),
                    "v": pc.coalesce(
                        pc.cast(t.column("uv"), pa.float64()), pa.scalar(0.0)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        aug = aug.materialize()
        sumsq = aug.map_batches(
            lambda t: pa.table(
                {"s2": pc.multiply(t.column("v"), t.column("v"))}
            ),
            batch_format="pyarrow",
        ).sum("s2")
        if not sumsq or sumsq <= 0:
            raise ValueError("personalization vector is all-zero")
        inv = 1.0 / math.sqrt(sumsq)
        aug = aug.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("vid"),
                    "dangling": t.column("dangling"),
                    "v": pc.multiply(t.column("v"), inv),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        v_val = 1.0 / math.sqrt(n)  # uniform v, L2-normalized
        aug = aug.map_batches(
            lambda t: t.append_column(
                "v", pa.array(np.full(len(t), v_val), pa.float64())
            ),
            batch_format="pyarrow",
        ).materialize()

    def init_x(t: pa.Table) -> pa.Table:
        return t.append_column(
            "score", pa.array(np.full(len(t), 1.0 / math.sqrt(n)), pa.float64())
        )

    # x carries (vid, dangling, v, score) — flag and v ride along so the
    # per-iteration dangling mass / personalization term are plain
    # columnar expressions, never a lookup
    x = aug.map_batches(init_x, batch_format="pyarrow").materialize()

    def dangling_mass(xds: ray.data.Dataset) -> float:
        part = xds.map_batches(
            lambda t: pa.table(
                {
                    "m": pc.multiply(
                        pc.cast(t.column("dangling"), pa.float64()),
                        t.column("score"),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        return float(part.sum("m") or 0.0)

    for _ in range(max_iterations):
        dm = dangling_mass(x)
        coeff = alpha * dm + (1.0 - alpha)

        contrib = hash_join(
            edges,
            x.select_columns(["vid", "score"]),
            on=("src",),
            right_on=("vid",),
            num_partitions=Q,
        ).map_batches(
            lambda t: pa.table(
                {
                    "dst": t.column("dst"),
                    "c": pc.multiply(t.column("w"), t.column("score")),
                }
            ),
            batch_format="pyarrow",
        )
        from .shuffle import salted_sum

        # salted two-stage reduce: hot dst keys (hubs) see at most
        # `salt` partials in any single reducer (north_star skew rule)
        sums = salted_sum(contrib, "dst", "c", num_partitions=Q)
        x_new = hash_join(
            aug, sums, on=("vid",), right_on=("dst",), how="left_outer",
            num_partitions=Q,
        ).map_batches(
            lambda t, coeff=coeff: pa.table(
                {
                    "vid": t.column("vid"),
                    "dangling": t.column("dangling"),
                    "v": t.column("v"),
                    "score": pc.add(
                        pc.multiply(
                            pc.coalesce(t.column("sum_c"), pa.scalar(0.0)), alpha
                        ),
                        pc.multiply(t.column("v"), coeff),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        l1 = x_new.sum("score")
        x_new = x_new.map_batches(
            lambda t, l1=l1: pa.table(
                {
                    "vid": t.column("vid"),
                    "dangling": t.column("dangling"),
                    "v": t.column("v"),
                    "score": pc.divide(t.column("score"), l1),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

        diff = hash_join(
            x_new.select_columns(["vid", "score"]),
            x.select_columns(["vid", "score"]).map_batches(
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
        if history is not None:
            # same north-rule telemetry the shard path records
            avail = ray.available_resources()
            history.append(
                {
                    "iteration": len(history),
                    "l1_before_norm": l1,
                    "dangling_mass": dm,
                    "rows_shuffled": meta.nnz,
                    "residual_l2": residual,
                    "alpha": alpha,
                    "object_store_memory_available": avail.get(
                        "object_store_memory"
                    ),
                }
            )
        if residual < epsilon:
            break
    return x.select_columns(["vid", "score"])


# --------------------------------------------------------------------------
# warm start (delta refresh): seed a run from a previous run's scores
# --------------------------------------------------------------------------


@ray.remote
def _warm_part(
    old_graph_dir: str,
    new_graph_dir: str,
    q: int,
    Q: int,
    new_size: int,
    old_scores,
    fill: float,
) -> np.ndarray:
    """One NEW partition's warm iterate, built entirely from partition
    q's files of BOTH graphs: ``part = stable_hash(name) % Q`` does not
    depend on the vertex rank, so a name keeps its partition across
    rebuilds and the name⋈score match is partition-local — zero
    shuffle, O(V/Q) per task.  Vertices absent from the old graph get
    ``fill`` (the uniform mass)."""
    import pyarrow.parquet as pq

    v = np.full(new_size, fill, np.float64)
    old_dir = os.path.join(old_graph_dir, "vertices", f"q={q}")
    new_dir = os.path.join(new_graph_dir, "vertices", f"q={q}")
    if not (os.path.isdir(old_dir) and os.path.isdir(new_dir)):
        return v
    ot = pq.read_table(old_dir, columns=["vid", "name"])
    nt = pq.read_table(new_dir, columns=["vid", "name"])
    if len(ot) == 0 or len(nt) == 0:
        return v
    ovals = np.asarray(old_scores, np.float64)[
        ot.column("vid").to_numpy(zero_copy_only=False) // Q
    ]
    onames = np.asarray(ot.column("name").to_pylist(), dtype=object)
    o = np.argsort(onames, kind="stable")
    onames_s, ovals_s = onames[o], ovals[o]
    nnames = np.asarray(nt.column("name").to_pylist(), dtype=object)
    pos = np.searchsorted(onames_s, nnames)
    pos_c = np.clip(pos, 0, len(onames_s) - 1)
    hit = onames_s[pos_c] == nnames
    nl = nt.column("vid").to_numpy(zero_copy_only=False) // Q
    v[nl[hit]] = ovals_s[pos_c[hit]]
    return v


def warm_start_parts(
    old_graph_dir: str,
    old_result: PageRankResult,
    new_graph_dir: str,
) -> list:
    """L1-normalized ``x0_parts`` for a :func:`power_method` run on
    ``new_graph_dir``, seeded from ``old_result``'s converged scores on
    ``old_graph_dir`` — the incremental-update path: after appending /
    removing edges and rebuilding, the warm run converges to the SAME
    fixpoint (start-independence of the power method) in far fewer
    iterations, because most of the mass distribution survives small
    graph deltas.

    Both graphs must share Q (the hash partitioning is then name-stable
    and the old→new score transfer is partition-local; see
    :func:`_warm_part`).  Normalization folds Q scalar partials on the
    driver; the arrays stay in the object store."""
    old_meta = old_result.meta
    new_meta = GraphMeta.load(os.path.join(new_graph_dir, "meta.json"))
    if old_meta.Q != new_meta.Q:
        raise ValueError(
            f"warm start needs matching partition counts "
            f"(old Q={old_meta.Q}, new Q={new_meta.Q})"
        )
    Q = new_meta.Q
    fill = 1.0 / new_meta.n
    raw = [
        _warm_part.remote(
            old_graph_dir, new_graph_dir, q, Q, new_meta.part_sizes[q],
            old_result.part_refs[q], fill,
        )
        for q in range(Q)
    ]

    @ray.remote
    def _l1(a: np.ndarray) -> float:
        return float(np.abs(a).sum())

    total = sum(ray.get([_l1.remote(r) for r in raw]))

    @ray.remote
    def _scale(a: np.ndarray, s: float) -> np.ndarray:
        return np.asarray(a, np.float64) * s

    return [_scale.remote(r, 1.0 / total) for r in raw]
