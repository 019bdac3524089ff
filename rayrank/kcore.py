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
