"""Borůvka minimum spanning forest (rayrank/mst.py): exact edge-set
parity with networkx under the shared strict composite weight
(w, u, v) — unique weights make the forest unique, so any correct MST
algorithm must produce the identical edge set."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.mst import boruvka_forest


def _edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([u for u, _, _ in edges], pa.int64()),
                "v": pa.array([v for _, v, _ in edges], pa.int64()),
                "w": pa.array([w for _, _, w in edges], pa.int64()),
            }
        )
    )


def _nx_forest(edges):
    import networkx as nx

    G = nx.Graph()
    for u, v, w in edges:
        # strict composite weight (w, u, v) — exact in float64 (< 2^44)
        G.add_edge(u, v, weight=(w << 24) + (u << 12) + v, raww=w)
    F = nx.minimum_spanning_tree(G)
    return {(min(a, b), max(a, b), d["raww"]) for a, b, d in F.edges(data=True)}


@pytest.mark.parametrize("seed,n,m", [(2, 30, 70), (8, 80, 200), (5, 40, 40)])
def test_boruvka_matches_networkx(seed, n, m):
    rng = np.random.RandomState(seed)
    eset = {}
    while len(eset) < m:
        a, b = rng.randint(0, n, 2)
        if a != b:
            key = (min(a, b), max(a, b))
            eset.setdefault(key, int(rng.randint(1, 9)))
    edges = [(u, v, w) for (u, v), w in sorted(eset.items())]
    forest, rounds = boruvka_forest(_edges_ds(edges))
    got = {(r["u"], r["v"], r["w"]) for r in forest.take_all()}
    want = _nx_forest(edges)
    assert got == want
    assert rounds <= int(np.ceil(np.log2(n))) + 1


def test_boruvka_disconnected_forest():
    """Two components -> spanning FOREST (n1-1 + n2-1 edges)."""
    edges = [
        (0, 1, 3), (1, 2, 1), (0, 2, 2),       # triangle
        (10, 11, 5), (11, 12, 4), (10, 12, 9), # second triangle
    ]
    forest, _ = boruvka_forest(_edges_ds(edges))
    got = {(r["u"], r["v"], r["w"]) for r in forest.take_all()}
    assert got == _nx_forest(edges)
    assert len(got) == 4
