"""Strongly connected components on the actor-resident shard loop —
trim + forward-coloring + backward-mark peel (the seventh gather/reduce
family after PageRank, CC, LP, BFS/SSSP, k-core, HITS).

Algorithm (FW-BW-style coloring, cf. Hong/Rodia-class SCC detection;
simulated exact vs networkx at sf0.001 AND sf0.01 before wiring):

  repeat until no active vertices:
    1. TRIM fixpoint — an active vertex whose residual in-degree or
       residual out-degree is 0 cannot lie on a cycle: settle it as a
       singleton SCC.  (Degrees count only active↔active edges.)
    2. FORWARD COLORING — F(v) := min vid over active vertices that
       reach v through active vertices (min-label fixpoint along
       forward edges, seeded F(v)=vid).  At the fixpoint, every edge
       v→w inside the residual graph has F(w) ≤ F(v).
    3. BACKWARD MARK — region owners (F(v) == vid) seed a backward
       reach restricted to their own region: v joins when some
       out-neighbour w is marked with F(w) == F(v).  Region-internality
       makes this sound: marked ∩ region(r) = vertices that both are
       reached by r (F says so) and reach r (the mark says so) = SCC(r).
       Every region extracts ITS owner's SCC in the same sweep, so one
       round settles many components (the coloring variant — the plain
       two-sweep peel needed 1245 inner iterations at sf0.01; this one
       ~108 in 5 rounds).
    4. COMMIT — settle marked vertices with scc_id = F, deactivate.

Distribution: ALL mutable state (active, F labels, mark, scc ids)
lives on the FORWARD shard set.  The out-degree and backward-mark
gathers run on a derived REVERSED layout (graph.derive_reversed — same
vids and partition sizes), which receives read-only state snapshots
per inner iteration via actor-to-actor ObjectRef handoff (the HITS
fwd→rev pattern, rayrank/hits.py): message index spaces are identical
across layouts, so reversed-side gathers reduce directly onto the
forward shards.  The driver moves only changed/trimmed counts.

Per-vertex SCC ids are vids (polars-xxhash space, not SQL-reproducible)
— report through :func:`rayrank.components.canonical_components`-style
re-keying to the minimum member NAME.  No SQL oracle exists for the
driver (reachability closure is quadratic in DuckDB); correctness is
pinned by networkx-exact pytest oracles (tests/test_scc.py) at Q=1 and
Q=4 plus random multigraphs.
"""

from __future__ import annotations

import os

import ray

from .graph import GraphMeta
from .iterate import LabelResult
from .shards import create_shards, gather_refs


def scc(
    fwd_graph_dir: str,
    rev_graph_dir: str,
    max_rounds: int = 200,
    shards_fwd: list | None = None,
    shards_rev: list | None = None,
) -> LabelResult:
    """Exact SCC labels (label = min member vid).  Both graph dirs must
    share vertex ids and partition sizes (build the reversed one with
    graph.derive_reversed)."""
    meta = GraphMeta.load(os.path.join(fwd_graph_dir, "meta.json"))
    rev_meta = GraphMeta.load(os.path.join(rev_graph_dir, "meta.json"))
    assert rev_meta.part_sizes == meta.part_sizes, "layouts must align"
    Q = meta.Q
    if shards_fwd is None:
        shards_fwd = create_shards(fwd_graph_dir, meta)
    if shards_rev is None:
        shards_rev = create_shards(rev_graph_dir, rev_meta)

    def sync() -> None:
        """Snapshot (active, F, mark) fwd→rev, partition-aligned; the
        reversed set only reads, so object-store immutability is fine."""
        ray.get(
            [
                shards_rev[p].scc_set_state.remote(
                    shards_fwd[p].scc_get_state.remote()
                )
                for p in range(Q)
            ]
        )

    def reduce_on_fwd(msgs, method: str) -> int:
        return sum(
            ray.get(
                [
                    getattr(shards_fwd[q], method).remote(
                        *[msgs[p][q] for p in range(Q)]
                    )
                    for q in range(Q)
                ]
            )
        )

    ray.get([s.init_scc.remote() for s in shards_fwd])
    active = meta.n
    history: list[dict] = []
    rounds = 0
    while active > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"scc did not settle in {max_rounds} rounds ({active} active)"
            )
        # 1. trim fixpoint (residual in-degree on fwd, out-degree on rev)
        trimmed = 0
        while True:
            msgs = gather_refs(shards_fwd, "gather_active_count")
            ray.get(
                [
                    shards_fwd[q].scc_set_indeg.remote(
                        *[msgs[p][q] for p in range(Q)]
                    )
                    for q in range(Q)
                ]
            )
            sync()
            msgs = gather_refs(shards_rev, "gather_active_count")
            t = reduce_on_fwd(msgs, "scc_trim_outdeg")
            trimmed += t
            if t == 0:
                break
        active -= trimmed
        if active == 0:
            history.append({"round": rounds, "trimmed": trimmed, "active": 0})
            break
        # 2. forward min-label coloring to fixpoint
        ray.get([s.scc_reset_labels.remote() for s in shards_fwd])
        f_iters = 0
        while True:
            f_iters += 1
            msgs = gather_refs(shards_fwd, "gather_min_active")
            if reduce_on_fwd(msgs, "reduce_min_active") == 0:
                break
        # 3. backward mark within each region, from its owner
        ray.get([s.scc_init_mark.remote() for s in shards_fwd])
        m_iters = 0
        while True:
            m_iters += 1
            sync()
            msgs = gather_refs(shards_rev, "gather_mark_max")
            if reduce_on_fwd(msgs, "scc_reduce_mark") == 0:
                break
        # 4. commit every marked vertex as SCC(owner)
        active = sum(ray.get([s.scc_commit.remote() for s in shards_fwd]))
        history.append(
            {
                "round": rounds,
                "trimmed": trimmed,
                "f_iters": f_iters,
                "mark_iters": m_iters,
                "active": active,
            }
        )

    ray.get([s.scc_finish.remote() for s in shards_fwd])
    return LabelResult(
        meta=meta,
        part_refs=[s.get_labels.remote() for s in shards_fwd],
        iterations=rounds,
        converged=True,
        history=history,
    )
