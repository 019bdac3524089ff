"""k-core peeling: exact node-set parity vs networkx.k_core on the
small golden graph and random undirected multigraphs (multiplicities
collapse to simple edges; self-loops dropped)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.kcore import core_vertices, kcore


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


def nx_core(edges, k) -> set:
    import networkx as nx

    g = nx.Graph()
    for s, d in edges:
        g.add_node(s)
        g.add_node(d)
        if s != d:
            g.add_edge(s, d)
    return set(nx.k_core(g, k).nodes())


def engine_core(gdir, k) -> set:
    res = kcore(gdir, k)
    assert res.converged
    out = set()
    for b in core_vertices(res, gdir).iter_batches(batch_format="pyarrow"):
        out.update(b.column("name").to_pylist())
    return out


# triangle {1,2,3} + pendant chain 3-4-5 + a duplicate edge: 2-core is
# the triangle; 1-core drops isolated-by-peel nothing
SMALL_EDGES = [
    ("1", "2"), ("2", "3"), ("3", "1"), ("3", "1"),
    ("3", "4"), ("4", "5"), ("6", "6"),
]


def test_small_graph_2core(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    assert engine_core(gdir, 2) == {"1", "2", "3"} == nx_core(SMALL_EDGES, 2)


def test_small_graph_1core_and_empty_3core(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    assert engine_core(gdir, 1) == nx_core(SMALL_EDGES, 1)
    assert engine_core(gdir, 3) == set() == nx_core(SMALL_EDGES, 3)


@pytest.mark.parametrize("seed,n,m,k", [(5, 40, 120, 3), (11, 60, 100, 2), (17, 30, 200, 4)])
def test_random_multigraphs(tmp_path, seed, n, m, k):
    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(
            rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist()
        )
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    assert engine_core(gdir, k) == nx_core(edges, k)


@pytest.mark.parametrize("seed,n,m", [(23, 40, 160), (29, 25, 60)])
def test_core_numbers_networkx(tmp_path, seed, n, m):
    """Bounded decomposition = min(networkx core_number, k_max)."""
    import networkx as nx

    from rayrank.kcore import core_numbers

    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(
            rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist()
        )
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    g = nx.Graph()
    for a, b in edges:
        if a != b:
            g.add_edge(a, b)
    for a, b in edges:
        g.add_node(a), g.add_node(b)
    want = {v: min(c, 4) for v, c in nx.core_number(g).items()}
    got = {
        r["name"]: r["core"]
        for b in core_numbers(gdir, 4).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert got == want
