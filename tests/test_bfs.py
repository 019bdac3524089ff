"""BFS hop-distance tests: exact vs a plain-Python BFS oracle on the
small golden graph and random undirected graphs, multi-seed, and
unreached-vertex filtering."""

from collections import deque

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.bfs import bfs, min_vertex_name, reachable_depths
from rayrank.shards import INF_DIST


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


def python_bfs(edges, seeds) -> dict[str, int]:
    adj: dict[str, set] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        else:
            adj.setdefault(s, set())
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


def engine_depths(gdir, seeds) -> dict[str, int]:
    res = bfs(gdir, seeds)
    assert res.converged
    out = {}
    for b in reachable_depths(res, gdir).iter_batches(batch_format="pyarrow"):
        for nm, d in zip(b.column("name").to_pylist(), b.column("depth").to_pylist()):
            out[nm] = d
    return out


SMALL_EDGES = [
    ("1", "2"), ("1", "3"), ("3", "1"), ("3", "2"), ("3", "5"),
    ("4", "5"), ("4", "6"), ("5", "6"), ("5", "4"), ("6", "4"),
]


def test_small_graph_single_seed(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    assert engine_depths(gdir, ["1"]) == python_bfs(SMALL_EDGES, ["1"])


def test_small_graph_multi_seed(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    seeds = ["2", "6"]
    assert engine_depths(gdir, seeds) == python_bfs(SMALL_EDGES, seeds)


def test_unreached_filtered(tmp_path):
    # Two components; seeding one must not report the other.
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir)
    got = engine_depths(gdir, ["a"])
    assert got == {"a": 0, "b": 1, "c": 2}


def test_unknown_seed_raises(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    with pytest.raises(ValueError, match="not in vertex dictionary"):
        bfs(gdir, ["nope"])


def test_min_vertex_name(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    assert min_vertex_name(gdir) == "1"


@pytest.mark.parametrize("seed,n,m", [(11, 40, 70), (12, 60, 60), (13, 30, 120)])
def test_random_graphs(tmp_path, seed, n, m):
    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    seeds = [str(int(rng.integers(0, n)))]
    # seed must exist in the vertex dict (appear in some edge)
    present = {v for e in edges for v in e}
    seeds = [s for s in seeds if s in present] or [sorted(present)[0]]
    assert engine_depths(gdir, seeds) == python_bfs(edges, seeds)


def test_seed_closeness_matches_python(tmp_path):
    from rayrank.bfs import seed_closeness, smallest_vertex_names

    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    seeds = smallest_vertex_names(gdir, 3)
    got = {
        r["seed"]: (r["n_reached"], r["total_dist"], r["closeness"])
        for r in seed_closeness(gdir, seeds).to_pylist()
    }
    for s in seeds:
        dist = python_bfs(SMALL_EDGES, [s])
        n, tot = len(dist), sum(dist.values())
        assert got[s] == (n, tot, float(n - 1) / float(tot))


@pytest.mark.parametrize("seed,n,m", [(21, 40, 70), (22, 25, 90)])
def test_diameter_sweep_matches_python(tmp_path, seed, n, m):
    from rayrank.bfs import diameter_sweep

    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    row = diameter_sweep(gdir).to_pylist()[0]
    present = {v for e in edges for v in e}
    start = min(present)
    d1 = python_bfs(edges, [start])
    ecc1 = max(d1.values())
    far1 = min(v for v, d in d1.items() if d == ecc1)
    d2 = python_bfs(edges, [far1])
    ecc2 = max(d2.values())
    far2 = min(v for v, d in d2.items() if d == ecc2)
    assert row == {
        "start": start, "far1": far1, "ecc_start": ecc1,
        "far2": far2, "diameter_lb": ecc2,
    }


def test_directed_bfs(tmp_path):
    """BFS over the stored (directed) layout must not follow reverse
    edges — mirrors descendant_depths_sf semantics."""
    from rayrank.graph import build_graph

    edges = [("a", "b"), ("b", "c"), ("d", "a"), ("c", "c")]
    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([d for _, d in edges], pa.string()),
        }
    )
    gdir = str(tmp_path / "g")
    build_graph(ray.data.from_arrow(t), gdir, num_partitions=3)
    got = engine_depths(gdir, ["a"])
    assert got == {"a": 0, "b": 1, "c": 2}  # d unreachable forward


@pytest.mark.parametrize("seed,n,m", [(41, 30, 80), (43, 50, 90)])
def test_shortest_path_counts_sigma(tmp_path, seed, n, m):
    """σ vs a python Brandes forward pass on random graphs."""
    from rayrank.bfs import shortest_path_counts

    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    present = sorted({v for e in edges for v in e})
    src = present[0]
    dist = python_bfs(edges, [src])
    # python sigma: process vertices in BFS layer order
    adj: dict[str, set] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    sigma = {src: 1}
    for d in range(1, max(dist.values(), default=0) + 1):
        for v in [x for x, dd in dist.items() if dd == d]:
            sigma[v] = sum(
                sigma[u] for u in adj.get(v, ()) if dist.get(u) == d - 1
            )
    got = {
        r["name"]: (r["dist"], r["paths"])
        for b_ in shortest_path_counts(gdir, [src]).iter_batches(
            batch_format="pyarrow"
        )
        for r in b_.to_pylist()
    }
    want = {v: (dist[v], sigma[v]) for v in dist}
    assert got == want


@pytest.mark.parametrize("seed,n,m", [(47, 25, 70), (53, 40, 85)])
def test_betweenness_contrib_brandes(tmp_path, seed, n, m):
    """δ vs a python Brandes backward pass (allclose 1e-9)."""
    from rayrank.bfs import betweenness_contrib

    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    present = sorted({v for e in edges for v in e})
    src = present[0]
    dist = python_bfs(edges, [src])
    adj: dict[str, set] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    sigma = {src: 1}
    dmax = max(dist.values(), default=0)
    for d in range(1, dmax + 1):
        for v in [x for x, dd in dist.items() if dd == d]:
            sigma[v] = sum(
                sigma[u] for u in adj.get(v, ()) if dist.get(u) == d - 1
            )
    delta = {v: 0.0 for v in dist}
    for d in range(dmax, 0, -1):
        for v in [x for x, dd in dist.items() if dd == d - 1]:
            delta[v] = sigma[v] * sum(
                (1.0 + delta[w]) / sigma[w]
                for w in adj.get(v, ())
                if dist.get(w) == d
            )
    got = {
        r["name"]: r["dependency"]
        for b_ in betweenness_contrib(gdir, [src]).iter_batches(
            batch_format="pyarrow"
        )
        for r in b_.to_pylist()
    }
    assert set(got) == set(delta)
    for v in delta:
        assert got[v] == pytest.approx(delta[v], abs=1e-9)
