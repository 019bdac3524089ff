"""HITS hubs & authorities on the actor-resident shard loop — the
sixth gather/reduce instance (after PageRank, CC, LP, BFS/SSSP,
k-core).

Pinned rule (tests/test_hits.py numpy oracle mirrors it exactly):
multiplicity-weighted adjacency A (A[s,t] = collapsed edge count
s→t, self-loops kept), hub₀ = 1/√n uniform, then per iteration
    auth = Aᵀ·hub / ‖Aᵀ·hub‖₂        (authority half-step)
    hub  = A·auth / ‖A·auth‖₂        (hub half-step)
for a FIXED iteration count (no convergence test — keeps the 2-iter
variant SQL-expressible by unrolling, like pagerank_2iter).

Distribution: Aᵀ·x is the forward shard set's gather (contributions
flow src→dst); A·x is the SAME gather on a derived REVERSED layout
(graph.derive_reversed — same vids/partition sizes, edges swapped).
Each half-step is one gather/reduce round on one set; between
half-steps the normalized result partition p hands off actor-to-actor
(forward p → reversed p, partition-aligned by construction) as an
ObjectRef — the driver moves only the Q sum-of-squares scalars and
never sees a vector.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data

from .graph import GraphMeta


@dataclass
class HitsResult:
    meta: GraphMeta
    auth_refs: list          # per-partition normalized authority vectors
    hub_refs: list           # per-partition normalized hub vectors
    iterations: int
    history: list[dict] = field(default_factory=list)

    def scores_dataset(self, graph_dir: str) -> ray.data.Dataset:
        """(vid, name, auth, hub) — per-partition zip inside tasks, no
        driver-side vector (same contract as PageRankResult)."""
        from .shards import zip_names

        vert_dir = os.path.join(graph_dir, "vertices")
        refs = [
            _zip_two.remote(
                zip_names.remote(vert_dir, q, self.meta.Q, a_ref, "auth"),
                h_ref,
            )
            for q, (a_ref, h_ref) in enumerate(
                zip(self.auth_refs, self.hub_refs)
            )
        ]
        return ray.data.from_arrow_refs(refs)


@ray.remote
def _zip_two(auth_table, hub_vals):
    import pyarrow as pa

    return auth_table.append_column(
        "hub", pa.array(np.asarray(hub_vals, np.float64))
    )


def hits(
    fwd_graph_dir: str,
    rev_graph_dir: str,
    iterations: int = 20,
    shards_fwd: list | None = None,
    shards_rev: list | None = None,
) -> HitsResult:
    """Run the pinned HITS rule for exactly ``iterations`` full
    iterations.  Both graph dirs must share vertex ids and partition
    sizes (build the reversed one with graph.derive_reversed)."""
    from .shards import create_shards, gather_refs

    meta = GraphMeta.load(os.path.join(fwd_graph_dir, "meta.json"))
    rev_meta = GraphMeta.load(os.path.join(rev_graph_dir, "meta.json"))
    assert rev_meta.part_sizes == meta.part_sizes, "layouts must align"
    Q = meta.Q
    if shards_fwd is None:
        shards_fwd = create_shards(fwd_graph_dir, meta)
    if shards_rev is None:
        shards_rev = create_shards(rev_graph_dir, rev_meta)

    n = meta.n
    ray.get([s.init_hits.remote(1.0 / math.sqrt(n)) for s in shards_fwd])

    def half_step(src_set: list, dst_set: list) -> float:
        """One gather/reduce round on src_set; install the normalized
        result as dst_set's gather vector.  Returns ‖result‖₂ before
        normalization (diagnostic)."""
        msgs = gather_refs(src_set, "gather_hits")
        sq_parts = ray.get(
            [
                src_set[q].reduce_hits.remote(*[msgs[p][q] for p in range(Q)])
                for q in range(Q)
            ]
        )
        norm = math.sqrt(sum(sq_parts))
        inv = 1.0 / norm if norm > 0 else 0.0
        ray.get(
            [
                dst_set[p].set_hits_y.remote(src_set[p].hits_result.remote(inv))
                for p in range(Q)
            ]
        )
        return norm

    history: list[dict] = []
    for it in range(iterations):
        auth_norm = half_step(shards_fwd, shards_rev)   # auth = Aᵀ·hub
        hub_norm = half_step(shards_rev, shards_fwd)    # hub  = A·auth
        history.append(
            {"iteration": it, "auth_norm": auth_norm, "hub_norm": hub_norm}
        )

    return HitsResult(
        meta=meta,
        auth_refs=[s.get_hits_y.remote() for s in shards_rev],
        hub_refs=[s.get_hits_y.remote() for s in shards_fwd],
        iterations=iterations,
        history=history,
    )
