"""k-truss and edge-support exactness vs networkx on the testdata
triangle graph and on random graphs."""

import numpy as np
import pyarrow.parquet as pq
import pytest

networkx = pytest.importorskip("networkx")


def _nx_graph(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )
    a = t.column("l_suppkey").to_numpy(zero_copy_only=False)
    b = t.column("l_partkey").to_numpy(zero_copy_only=False) % 100
    G = networkx.Graph()
    G.add_edges_from(
        (int(x), int(y)) for x, y in zip(a, b) if x != y
    )
    return G


SF = "/root/testdata/sf0.001"


def test_edge_support_matches_networkx():
    from rayrank.truss import edge_support

    got = {
        (r["u"], r["v"]): r["support"]
        for r in edge_support(SF).take_all()
    }
    G = _nx_graph(SF)
    want = {}
    for x, y in G.edges():
        u, v = min(x, y), max(x, y)
        want[(u, v)] = len(list(networkx.common_neighbors(G, x, y)))
    assert got == want


@pytest.mark.parametrize("k", [3, 4, 5])
def test_k_truss_matches_networkx(k):
    from rayrank.truss import k_truss

    got = sorted(
        (r["u"], r["v"]) for r in k_truss(SF, k=k).take_all()
    )
    T = networkx.k_truss(_nx_graph(SF), k)
    want = sorted((min(x, y), max(x, y)) for x, y in T.edges())
    assert got == want


def test_rich_club_matches_networkx():
    nx = pytest.importorskip("networkx")
    from rayrank.truss import RICH_KS, rich_club

    sf = "/root/testdata/sf0.001"
    got = {r["k"]: r for r in rich_club(sf).to_pylist()}

    import pyarrow.parquet as pq

    t = pq.read_table(sf + "/lineitem.parquet", columns=["l_suppkey", "l_partkey"])
    g = nx.Graph()
    for a, b in zip(
        t.column("l_suppkey").to_pylist(), t.column("l_partkey").to_pylist()
    ):
        b %= 100
        if a != b:
            g.add_edge(a, b)
    phi = nx.rich_club_coefficient(g, normalized=False)
    for k in RICH_KS:
        n = sum(1 for _, d in g.degree() if d > k)
        if n > 1:
            assert got[k]["n_rich"] == n
            assert got[k]["phi"] == pytest.approx(phi.get(k, 0.0), abs=1e-12)
        else:
            assert k not in got


def test_maximal_matching_equals_sequential_greedy():
    """The distributed edge-Luby fixpoint must equal the sequential
    greedy matching in ascending splitmix64 priority, and be a valid
    matching (no shared endpoints) that is maximal (every alive edge
    touches a matched vertex)."""
    from rayrank.truss import (
        _canonical_edges,
        greedy_matching_oracle,
        maximal_matching,
    )

    sf = "/root/testdata/sf0.001"
    edges = [(r["u"], r["v"]) for r in _canonical_edges(sf).take_all()]
    want = greedy_matching_oracle(edges)
    got = {(r["u"], r["v"]) for r in maximal_matching(sf).take_all()}
    assert got == want
    used = [x for uv in got for x in uv]
    assert len(used) == len(set(used))  # valid matching
    matched = set(used)
    for a, b in edges:  # maximal: no free edge remains
        assert a in matched or b in matched
