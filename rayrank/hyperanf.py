"""HyperANF — the neighborhood function N(t) = Σ_v |ball(v, t)| and
the effective diameter, estimated with per-vertex HyperLogLog
registers merged along edges (Boldi, Rosa & Vigna, "HyperANF:
Approximating the Neighbourhood Function of Very Large Graphs on a
Budget", WWW 2011).  THE web-scale distance-distribution algorithm:
exact N(t) needs all-pairs BFS (O(V·E)); HyperANF is one register-max
SpMV per hop — the same gather/reduce round the engine already runs
for CC/BFS, with min swapped for register-wise max.

State: 16 registers × 4 bits packed into the resident int64 label
partition (shards.init_hll / gather_bytemax / reduce_bytemax), so
checkpointing and the label plumbing reuse unchanged.  Registers are a
pure function of the vid assignment and the topology — bit-identical
replay, and the pytest mirror recomputes them exactly (the estimate's
float fold is per-partition numpy sums folded in fixed q order, so it
is run-stable too).

Accuracy: m = 16 gives the standard 1.04/√m ≈ 26 % per-vertex rse;
sums over V vertices concentrate much tighter.  Rank caps at 15 (4-bit
registers) — honest for per-register cardinalities up to ~10^6; widen
to 2 words per vertex beyond that (documented in shards.init_hll).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray

from .graph import GraphMeta
from .shards import create_shards, gather_refs


def hyperanf(
    graph_dir: str, max_t: int = 16, shards: list | None = None
) -> pa.Table:
    """(t, n_pairs_est, frac_of_final) for t = 0..convergence (register
    fixpoint) or ``max_t``.  ``n_pairs_est`` estimates Σ_v |ball(v,t)|
    (reachable pairs within t hops, self included); the effective
    diameter is the first t with frac ≥ 0.9."""
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    own = shards is None
    if shards is None:
        shards = create_shards(graph_dir, meta)
    ray.get([s.init_hll.remote() for s in shards])

    sums = [
        sum(ray.get([s.hll_ball_sum.remote() for s in shards]))
    ]  # N(0) ≈ V
    for _t in range(1, max_t + 1):
        msgs = gather_refs(shards, "gather_bytemax")
        changed = sum(
            ray.get(
                [
                    shards[q].reduce_bytemax.remote(
                        *[msgs[p][q] for p in range(Q)]
                    )
                    for q in range(Q)
                ]
            )
        )
        if changed == 0:
            # register fixpoint: this round's sum equals the previous
            # one — don't emit a duplicate confirming row
            break
        sums.append(sum(ray.get([s.hll_ball_sum.remote() for s in shards])))
    if own:
        for s in shards:
            ray.kill(s)

    final = sums[-1]
    return pa.table(
        {
            "t": pa.array(range(len(sums)), pa.int64()),
            "n_pairs_est": pa.array(sums, pa.float64()),
            "frac_of_final": pa.array(
                [x / final for x in sums], pa.float64()
            ),
        }
    )


def effective_diameter(nf: pa.Table, frac: float = 0.9) -> int:
    f = nf.column("frac_of_final").to_numpy(zero_copy_only=False)
    return int(np.argmax(f >= frac))
