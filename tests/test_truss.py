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


def _peel_mirror(edges: set[tuple[int, int]]):
    """Sequential mirror of the parallel Charikar peel (same integer
    threshold rule) — returns (rounds, best_round, V, E, 2E, V)."""
    from rayrank.truss import DSG_DEN, DSG_NUM

    cur = set(edges)
    best = (0, 1, 0, 0)
    rounds = 0
    while cur:
        deg = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        n_e, n_v = len(cur), len(deg)
        rounds += 1
        if 2 * n_e * best[1] > best[0] * n_v:
            best = (2 * n_e, n_v, rounds, n_e)
        thr = (DSG_NUM * 2 * n_e) // (DSG_DEN * n_v)
        keep = {x for x, d in deg.items() if d > thr}
        cur = {(u, v) for u, v in cur if u in keep and v in keep}
    return rounds, best


def _edges_ds(edges):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([u for u, _ in edges], pa.int64()),
                "v": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("seed,n,m", [(5, 30, 80), (9, 50, 200)])
def test_densest_subgraph_matches_mirror(seed, n, m):
    import numpy as np

    from rayrank.truss import densest_subgraph_edges

    rng = np.random.RandomState(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randint(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    got = densest_subgraph_edges(_edges_ds(sorted(edges))).to_pylist()[0]
    rounds, best = _peel_mirror(edges)
    assert got["rounds"] == rounds
    assert got["best_round"] == best[2]
    assert got["n_vertices"] == best[1]
    assert got["n_edges"] == best[3]
    assert got["density"] == best[0] / best[1]


def test_densest_subgraph_approx_guarantee():
    """2(1+eps) guarantee vs brute-force max average degree on small
    random graphs: 2E/V >= rho* / (2 * 5/4), compared exactly."""
    import itertools

    import numpy as np

    from rayrank.truss import DSG_DEN, DSG_NUM, densest_subgraph_edges

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        n = 9
        edges = set()
        while len(edges) < 16:
            a, b = rng.randint(0, n, 2)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        got = densest_subgraph_edges(_edges_ds(sorted(edges))).to_pylist()[0]
        # brute force rho* as an exact fraction (2E_S, |S|)
        best_num, best_den = 0, 1
        for k in range(1, n + 1):
            for sub in itertools.combinations(range(n), k):
                ss = set(sub)
                es = sum(1 for u, v in edges if u in ss and v in ss)
                if 2 * es * best_den > best_num * len(ss):
                    best_num, best_den = 2 * es, len(ss)
        # density >= rho*/(2(1+eps)):  got2E/V * 2*NUM/DEN >= num/den
        g2e, gv = got["n_edges"] * 2, got["n_vertices"]
        assert g2e * 2 * DSG_NUM * best_den >= best_num * gv * DSG_DEN


def test_temporal_wedges_matches_bruteforce():
    """The searchsorted window-counting kernel vs the O(n^2) pair
    enumeration on the raw sf0.001 edge stream."""
    import pyarrow.parquet as pq
    from collections import defaultdict

    from rayrank import truss

    t = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_suppkey", "l_partkey", "l_shipdate"],
    )
    u = t.column("l_suppkey").to_numpy()
    v = t.column("l_partkey").to_numpy() % 100
    tt = t.column("l_shipdate").cast("int64").to_numpy() // 86_400_000_000
    import numpy as np

    # dense O(n^2) enumeration, vectorized: row i = in-edge, col j = out
    M = (
        (v[:, None] == u[None, :])
        & (tt[None, :] > tt[:, None])
        & (tt[None, :] <= tt[:, None] + truss.TW_DELTA)
    )
    D = M & (u[:, None] == v[None, :])
    want = defaultdict(lambda: [0, 0])
    wi = M.sum(axis=1)
    di = D.sum(axis=1)
    for mid, w, d in zip(v.tolist(), wi.tolist(), di.tolist()):
        want[mid][0] += w
        want[mid][1] += d
    got = {
        r["mid"]: (r["wedges"], r["proper_wedges"])
        for r in truss.temporal_wedges("/root/testdata/sf0.001").take_all()
    }
    assert got == {
        m: (w, w - d) for m, (w, d) in want.items() if w > 0
    }


def test_graph_coarsen_invariants():
    """Coarse weights preserve the fine edge count minus contracted
    matching edges; every coarse endpoint is a matching min-endpoint
    or an unmatched vertex."""
    from rayrank import truss

    sf = "/root/testdata/sf0.001"
    fine = {
        (r["u"], r["v"])
        for r in truss._canonical_edges(sf).take_all()
    }
    m = {(r["u"], r["v"]) for r in truss.maximal_matching(sf).take_all()}
    rep = {}
    for a, b in m:
        rep[a] = a
        rep[b] = a
    coarse = truss.graph_coarsen(sf).take_all()
    # exact expected contraction
    want = {}
    for a, b in fine:
        ca, cb = rep.get(a, a), rep.get(b, b)
        if ca == cb:
            continue
        k = (min(ca, cb), max(ca, cb))
        want[k] = want.get(k, 0) + 1
    got = {(r["cu"], r["cv"]): r["w"] for r in coarse}
    assert got == want
    assert sum(got.values()) <= len(fine) - len(m)


def _planted_truss_dir(tmp_path):
    """Sparse planted-truss fixture (the r2 open item asked for one):
    two K6 cliques (4-truss cores) bridged by a path, plus a long ring
    and pendant edges — the periphery peels over MULTIPLE rounds and
    round 1 removes triangle-free edges (exercising the empty-triangle
    decrement round)."""
    import os

    import pyarrow as pa

    edges = []
    for base in (0, 10):  # two K6 cliques: vertices base..base+5
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges += [(5, 20), (20, 21), (21, 10)]          # bridge path
    edges += [(30 + i, 30 + (i + 1) % 12) for i in range(12)]  # ring
    edges += [(0, 50), (50, 51), (11, 60)]          # pendants
    # a chain of shared-edge triangles: peels in cascading rounds
    edges += [(70, 71), (71, 72), (70, 72), (72, 73), (71, 73)]
    src = [a for a, _ in edges]
    dst = [b for _, b in edges]
    t = pa.table(
        {
            # tri_edges derives (l_suppkey, l_partkey % 100); keep ids
            # < 100 so the modulo is the identity
            "l_suppkey": pa.array(src, pa.int64()),
            "l_partkey": pa.array(dst, pa.int64()),
        }
    )
    d = tmp_path / "sf_truss"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, str(d / "lineitem.parquet"))
    G = networkx.Graph()
    G.add_edges_from(edges)
    return str(d), G


@pytest.mark.parametrize("k", [3, 4])
def test_incremental_peel_planted_fixture(k, tmp_path):
    """Support-decrement peel is networkx-exact on the sparse planted
    fixture and takes the expected multiple rounds (the near-complete
    tri graph converges in 1 — this fixture is the real exercise)."""
    import rayrank.truss as tr

    d, G = _planted_truss_dir(tmp_path)
    got = sorted((r["u"], r["v"]) for r in tr.k_truss(d, k=k).take_all())
    T = networkx.k_truss(G, k)
    want = sorted((min(x, y), max(x, y)) for x, y in T.edges())
    assert got == want
    assert tr.LAST_PEEL_ROUNDS >= 1  # periphery actually peeled
