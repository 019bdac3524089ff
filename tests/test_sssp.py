"""Weighted SSSP (Bellman-Ford on the shard label loop): exact vs a
Python Dijkstra oracle with multiplicity weights, on the small golden
graph (with repeated edges) and random undirected multigraphs."""

import heapq

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.bfs import min_vertex_name, reachable_dists, sssp


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


def python_dijkstra(edges, seeds) -> dict[str, int]:
    """Oracle with graph.derive_undirected weight semantics: weight of
    undirected pair {a,b} = (#a→b) + (#b→a), self-loops dropped."""
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
    dist = {s: 0 for s in seeds}
    heap = [(0, s) for s in seeds]
    heapq.heapify(heap)
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, 1 << 62):
            continue
        for v, m in adj.get(u, ()):
            nd = du + m
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def engine_dists(gdir, seeds) -> dict[str, int]:
    res = sssp(gdir, seeds)
    assert res.converged
    out = {}
    for b in reachable_dists(res, gdir).iter_batches(batch_format="pyarrow"):
        for nm, d in zip(b.column("name").to_pylist(), b.column("dist").to_pylist()):
            out[nm] = d
    return out


# repeated edges give multiplicity weights > 1 in both directions
SMALL_EDGES = [
    ("1", "2"), ("1", "2"), ("2", "1"),     # {1,2} weight 3
    ("1", "3"), ("3", "5"), ("3", "5"),     # {1,3}=1, {3,5}=2
    ("2", "5"),                             # {2,5}=1
    ("4", "6"), ("5", "4"), ("5", "5"),     # self-loop dropped
]


def test_small_multigraph(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    got = engine_dists(gdir, ["1"])
    want = python_dijkstra(SMALL_EDGES, ["1"])
    assert got == want
    # weighted path differs from hop path: dist(2) = 2 via 3–5 chain?
    # no — direct {1,2} costs 3, 1→3→5→2 costs 1+2+1 = 4, so 3 wins;
    # but dist(5) = 1+2 = 3 < via-2 (3+1): exercise both branches
    assert want["2"] == 3 and want["5"] == 3


def test_multi_seed(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    seeds = ["4", "2"]
    assert engine_dists(gdir, seeds) == python_dijkstra(SMALL_EDGES, seeds)


@pytest.mark.parametrize("seed,n,m", [(3, 30, 80), (9, 60, 90), (21, 40, 200)])
def test_random_multigraphs(tmp_path, seed, n, m):
    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(
            rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist()
        )
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    seeds = [min_vertex_name(gdir)]
    assert engine_dists(gdir, seeds) == python_dijkstra(edges, seeds)
