"""HyperANF (rayrank/hyperanf.py): register-exact parity with a numpy
mirror (same splitmix init, same nibble-max merge, same per-partition
estimate fold) and a loose accuracy band vs exact BFS ball sizes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from oracle import random_edge_list
from rayrank.graph import build_graph, derive_undirected
from rayrank.hyperanf import effective_diameter, hyperanf
from rayrank.sketch import splitmix64


def _build_und(edges, tmp_path, Q=4):
    ddir, udir = str(tmp_path / "d"), str(tmp_path / "u")
    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([d for _, d in edges], pa.string()),
        }
    )
    build_graph(ray.data.from_arrow(t), ddir, num_partitions=Q)
    derive_undirected(ddir, udir)
    return udir


def _init_regs(vids: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 mirror of shards.init_hll."""
    z = splitmix64(vids.astype(np.uint64))
    j = (z & np.uint64(15)).astype(np.int64)
    rest = z >> np.uint64(4)
    with np.errstate(over="ignore"):
        lowbit = rest & (np.uint64(0) - rest)
    with np.errstate(divide="ignore"):
        tz = np.where(rest == 0, 60.0, np.log2(lowbit.astype(np.float64)))
    rho = np.minimum(tz.astype(np.int64) + 1, 15).astype(np.uint8)
    regs = np.zeros((len(vids), 16), np.uint8)
    regs[np.arange(len(vids)), j] = rho
    return regs


def _estimate(regs: np.ndarray) -> np.ndarray:
    denom = np.ldexp(1.0, -regs.astype(np.int64)).sum(axis=1)
    est = 0.673 * 256.0 / denom
    v0 = (regs == 0).sum(axis=1)
    small = (est <= 40.0) & (v0 > 0)
    est[small] = 16.0 * np.log(16.0 / v0[small])
    return est


def test_hyperanf_matches_mirror(tmp_path):
    import networkx as nx

    from rayrank.graph import load_vertices

    edges = random_edge_list(17, 60, 150)
    udir = _build_und(edges, tmp_path)

    nf = hyperanf(udir)
    got = nf.to_pylist()

    # mirror: vids + names from the built graph, und adjacency by name
    vids, names = [], []
    for b in load_vertices(udir).iter_batches(batch_format="pyarrow"):
        vids += b.column("vid").to_pylist()
        names += b.column("name").to_pylist()
    vids = np.asarray(vids, np.int64)
    order = np.argsort(vids)
    vids, names = vids[order], [names[i] for i in order]
    pos = {nm: i for i, nm in enumerate(names)}

    G = nx.Graph()
    G.add_nodes_from(names)
    for s, d in edges:
        if s != d:
            G.add_edge(s, d)

    regs = _init_regs(vids)
    Q = 4

    def fold(r: np.ndarray) -> float:
        est = _estimate(r)
        # per-partition numpy sums in fixed q order, like the engine
        return sum(
            float(est[vids % Q == q].sum()) for q in range(Q)
        )

    exact = []
    t = 0
    cur = regs.copy()
    while True:
        est_sum = fold(cur)
        assert got[t]["n_pairs_est"] == pytest.approx(est_sum, rel=1e-12)
        balls = [
            {pos[w] for w, dd in nx.single_source_shortest_path_length(
                G, nm, cutoff=t).items()}
            for nm in names
        ]
        exact.append(sum(len(bl) for bl in balls))
        nxt = cur.copy()
        for i, nm in enumerate(names):
            for nb in G.neighbors(nm):
                np.maximum(nxt[i], cur[pos[nb]], out=nxt[i])
        if (nxt == cur).all():
            break
        cur = nxt
        t += 1
    assert len(got) == t + 1  # engine stopped at the same fixpoint

    # accuracy where the concentration argument actually holds: at t=1
    # the balls are small and DIVERSE across vertices, so per-vertex
    # estimation errors average out in the sum (within 35%).  At the
    # fixpoint every vertex holds (nearly) the SAME register state —
    # one m=16 realization, rse 26%, NO averaging — so only a generous
    # single-realization band is honest there (measured p90 ratio ≈ 1.4
    # over 400 random draws; this fixture draws ≈ 1.65).
    assert got[1]["n_pairs_est"] == pytest.approx(exact[1], rel=0.35)
    assert got[-1]["n_pairs_est"] == pytest.approx(exact[-1], rel=0.75)
    assert effective_diameter(nf) <= len(got) - 1
