"""Katz centrality on the actor-resident shard loop, SQL-EXACT by the
fixed-point integer trick (CLAUDE.md: never rely on a database's float
fold order — restate the computation so both sides do identical ops).

Pinned rule: α = 1/ALPHA_INV (default 1/16), β = 1, multiplicity-
weighted adjacency A (collapsed edge count, self-loops kept), x₀ = β,
then for a FIXED ``iters`` iterations

    x_{t+1} = β + α · Aᵀ x_t            (in-edge Katz, no normalization)

Scaling by 16^t turns this into the INTEGER recurrence

    z_0 = 1,   z_{t+1} = Aᵀ z_t + 16^{t+1},   x_t = z_t / 16^t

so every distributed partial sum adds exact integers carried in
float64 — order-free and bit-identical to DuckDB's fold as long as
max z < 2^53 (guarded: katz() raises if the bound is hit; at that
point the walk counts, not the engine, are the problem).  The ONE
float op — the final /16^iters division — is written identically in
the SQL oracle (unrolled ``iters``-level aggregation chain), so the
driver's value-hash match is exact, not tolerance-based.

Distribution: reuses the HITS forward gather unchanged
(shards.gather_hits = per-destination Σ mult·y, map-side combined;
reduce_hits folds the Q message columns on the destination actor) plus
one tiny resident update (shards.katz_update).  The driver moves only
per-partition max scalars; extraction is the zip_names per-partition
task path (no driver-side vector).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import ray
import ray.data

from .graph import GraphMeta

ALPHA_INV = 16
EXACT_LIMIT = float(1 << 53)


@dataclass
class KatzResult:
    meta: GraphMeta
    z_refs: list        # per-partition integer z vectors (float64 storage)
    iterations: int
    scale: float        # 16^iterations; katz score = z / scale

    def scores_dataset(self, graph_dir: str) -> ray.data.Dataset:
        from .shards import zip_names

        vert_dir = os.path.join(graph_dir, "vertices")
        inv = 1.0 / self.scale
        refs = [
            _scale.remote(
                zip_names.remote(vert_dir, q, self.meta.Q, ref, "katz"), inv
            )
            for q, ref in enumerate(self.z_refs)
        ]
        return ray.data.from_arrow_refs(refs)


@ray.remote
def _scale(table, inv: float):
    import pyarrow as pa
    import pyarrow.compute as pc

    i = table.schema.get_field_index("katz")
    return table.set_column(
        i, "katz", pc.multiply(table.column("katz"), pa.scalar(inv))
    )


def katz(
    graph_dir: str, iters: int = 3, shards: list | None = None
) -> KatzResult:
    """Run the pinned Katz rule for exactly ``iters`` iterations."""
    from .shards import create_shards, gather_refs

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    if shards is None:
        shards = create_shards(graph_dir, meta)

    ray.get([s.init_hits.remote(1.0) for s in shards])  # z0 = 1
    for t in range(1, iters + 1):
        msgs = gather_refs(shards, "gather_hits")
        ray.get(
            [
                shards[q].reduce_hits.remote(*[msgs[p][q] for p in range(Q)])
                for q in range(Q)
            ]
        )
        zmax = max(
            ray.get(
                [s.katz_update.remote(float(ALPHA_INV**t)) for s in shards]
            ),
            default=0.0,
        )
        if zmax >= EXACT_LIMIT:
            raise OverflowError(
                f"katz z exceeded 2^53 at iteration {t} ({zmax:.3g}); "
                "reduce iters or increase ALPHA_INV"
            )

    return KatzResult(
        meta=meta,
        z_refs=[s.get_hits_y.remote() for s in shards],
        iterations=iters,
        scale=float(ALPHA_INV**iters),
    )
