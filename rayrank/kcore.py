"""k-core decomposition (fixed k): synchronous peeling on the
actor-resident label loop — fifth instance of the gather/reduce
pattern after CC, LP, BFS and weighted SSSP.

Semantics: on the undirected collapsed layout (one CSR row per
distinct neighbor pair, self-loops dropped — simple-graph degree),
repeat ``alive ← {v : #alive-neighbors(v) ≥ k}`` until no change.
The alive set shrinks monotonically, so the un-intersected update
equals classic peeling and is expressible as a single-reference
recursive CTE (the SQL oracle in ``__ray_entry__``) — a plain
``networkx.k_core`` node set at fixpoint.

Scale shape: identical to connected components — alive flags live in
the actor-resident label partitions, one Q×Q map-side-combined count
exchange per round, scalars on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .iterate import LabelResult, iterate_labels


def kcore(
    graph_dir: str,
    k: int,
    max_iterations: int = 200,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
) -> LabelResult:
    """Labels = alive flags (1 = in the k-core) at fixpoint."""
    from .graph import GraphMeta
    from .shards import create_shards

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)

    def init(sh):
        ray.get([s.init_kcore.remote(k) for s in sh])

    return iterate_labels(
        graph_dir,
        gather_method="gather_alive_count",
        reduce_method="reduce_kcore",
        max_iterations=max_iterations,
        shards=shards,
        ckpt_dir=ckpt_dir,
        ckpt_interval=ckpt_interval,
        resume=resume,
        algo_name=f"kcore{k}",
        init_fn=init,
    )


def core_vertices(result: LabelResult, graph_dir: str) -> ray.data.Dataset:
    """(name) rows for vertices in the core — alive flag filtered
    block-wise, no driver materialization."""
    ds = result.labels_dataset(graph_dir)

    def fin(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t.column("label"), pa.scalar(1, pa.int64())))
        return pa.table({"name": keep.column("name")})

    return ds.map_batches(fin, batch_format="pyarrow")


CORE_K_MAX = 4


@ray.remote
def _sum_alive(*vals) -> np.ndarray:
    """Elementwise sum of one partition's alive vectors across the K
    peels — alive sets are NESTED (k-core ⊆ (k−1)-core), so the sum IS
    min(coreness, K).  Runs task-side; the driver never holds a
    vector."""
    return np.sum([np.asarray(v, np.int64) for v in vals], axis=0)


def core_numbers(
    graph_dir: str,
    k_max: int = CORE_K_MAX,
    shards: list | None = None,
) -> ray.data.Dataset:
    """(name, core) bounded k-core decomposition: core =
    min(coreness, k_max) = Σ_{k=1..k_max} alive_k(v), computed as
    k_max synchronous peels on SHARED resident shards (one
    create_shards; init_kcore re-initialises per run).  The per-k
    alive partitions are object-store snapshots; a per-partition task
    sums them and zips names co-resident — no shuffle, no driver
    vector.  SQL oracle: k_max single-reference recursive peel CTEs
    (the _KCORE_SQL rule per k), summed per vertex."""
    from .graph import GraphMeta
    from .shards import create_shards, zip_names

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)
    per_k = [
        kcore(graph_dir, k, shards=shards).part_refs
        for k in range(1, k_max + 1)
    ]
    vert_dir = os.path.join(graph_dir, "vertices")
    refs = [
        zip_names.remote(
            vert_dir,
            q,
            meta.Q,
            _sum_alive.remote(*[per_k[i][q] for i in range(k_max)]),
            "core",
        )
        for q in range(meta.Q)
    ]
    return ray.data.from_arrow_refs(refs).map_batches(
        lambda t: t.select(["name", "core"]), batch_format="pyarrow"
    )
