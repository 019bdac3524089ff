"""Widest (maximum-bottleneck) path kernel: exact vs a max-heap
Dijkstra oracle with multiplicity weights, on random undirected
multigraphs (the test_sssp fixture pattern)."""

import heapq

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.bfs import widest_paths
from rayrank.shards import WIDEST_SEED


def build_undirected(edges, tmp_dir, Q=4):
    from rayrank.graph import build_graph

    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([d for _, d in edges], pa.string()),
        }
    )
    return build_graph(
        ray.data.from_arrow(t), tmp_dir, num_partitions=Q, undirected=True
    )


def python_widest(edges, seed) -> dict[str, int]:
    """Max-heap Dijkstra for bottleneck widths; weight of {a,b} =
    (#a→b)+(#b→a), self-loops dropped (derive_undirected semantics)."""
    w: dict[tuple, int] = {}
    verts = set()
    for s, d in edges:
        verts.update((s, d))
        if s != d:
            w[(s, d)] = w.get((s, d), 0) + 1
            w[(d, s)] = w.get((d, s), 0) + 1
    adj: dict[str, list] = {}
    for (a, b), m in w.items():
        adj.setdefault(a, []).append((b, m))
    width = {v: 0 for v in verts}
    width[seed] = WIDEST_SEED
    heap = [(-WIDEST_SEED, seed)]
    while heap:
        nw, u = heapq.heappop(heap)
        if -nw < width[u]:
            continue
        for v, m in adj.get(u, ()):
            cand = min(width[u], m)
            if cand > width[v]:
                width[v] = cand
                heapq.heappush(heap, (-cand, v))
    return width


@pytest.mark.parametrize("seed_rng", [0, 1, 2])
def test_widest_random_multigraph(tmp_path, seed_rng):
    rng = np.random.default_rng(seed_rng)
    n = 30
    names = [f"v{i}" for i in range(n)]
    edges = []
    for _ in range(120):
        a, b = rng.integers(0, n, 2)
        edges.append((names[a], names[b]))
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir)
    res = widest_paths(gdir, [names[0]])
    assert res.converged
    got = {
        r["name"]: r["label"]
        for r in res.labels_dataset(gdir).take_all()
    }
    want = python_widest(edges, names[0])
    assert got == want
