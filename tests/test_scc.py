"""Strongly connected components (rayrank/scc.py): exact partition
parity vs networkx.strongly_connected_components on hand-built directed
graphs (trim chains, nested cycles, self-loops, Q=1) and random
multigraphs — the algorithm has no SQL oracle, so these pytest oracles
ARE the correctness gate (like LP)."""

import pyarrow as pa
import pytest
import ray.data

from oracle import random_edge_list
from rayrank.components import canonical_components
from rayrank.scc import scc


def build_pair(edges, tmp_path, Q=4):
    from rayrank.graph import build_graph, derive_reversed

    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([d for _, d in edges], pa.string()),
        }
    )
    fwd = str(tmp_path / "fwd")
    rev = str(tmp_path / "rev")
    build_graph(ray.data.from_arrow(t), fwd, num_partitions=Q)
    derive_reversed(fwd, rev)
    return fwd, rev


def engine_partition(edges, tmp_path, Q=4) -> set[frozenset]:
    fwd, rev = build_pair(edges, tmp_path, Q=Q)
    res = scc(fwd, rev)
    groups: dict[str, set] = {}
    for b in canonical_components(res, fwd).iter_batches(batch_format="pyarrow"):
        for nm, comp in zip(
            b.column("name").to_pylist(), b.column("component").to_pylist()
        ):
            groups.setdefault(comp, set()).add(nm)
    # canonical component id must be the min member name
    for comp, members in groups.items():
        assert comp == min(members)
    return {frozenset(g) for g in groups.values()}


def nx_partition(edges) -> set[frozenset]:
    import networkx as nx

    G = nx.DiGraph()
    G.add_nodes_from(v for e in edges for v in e)
    G.add_edges_from(edges)
    return {frozenset(c) for c in nx.strongly_connected_components(G)}


# two 3-cycles bridged one-way, a trim chain hanging off, a self-loop,
# and a dangling sink — exercises trim, coloring, and multi-round peel
SMALL_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),          # SCC {a,b,c}
    ("c", "d"),                                   # one-way bridge
    ("d", "e"), ("e", "f"), ("f", "d"),          # SCC {d,e,f}
    ("f", "g"), ("g", "h"),                       # trim chain
    ("i", "i"),                                   # self-loop singleton
    ("h", "j"),                                   # dangling sink j
    ("a", "b"),                                   # duplicate edge
]


@pytest.mark.parametrize("Q", [1, 4])
def test_small_graph_exact(tmp_path, Q):
    assert engine_partition(SMALL_EDGES, tmp_path, Q=Q) == nx_partition(
        SMALL_EDGES
    )


def test_two_cycles_sharing_a_vertex(tmp_path):
    edges = [("x", "y"), ("y", "x"), ("y", "z"), ("z", "y"), ("z", "w")]
    assert engine_partition(edges, tmp_path) == nx_partition(edges)


def test_acyclic_graph_all_singletons(tmp_path):
    edges = [("1", "2"), ("2", "3"), ("1", "3"), ("4", "3")]
    part = engine_partition(edges, tmp_path)
    assert part == {frozenset({v}) for v in "1234"}


@pytest.mark.parametrize("seed,n,m", [(7, 40, 120), (11, 60, 90), (23, 25, 200)])
def test_random_multigraphs(tmp_path, seed, n, m):
    edges = random_edge_list(seed, n, m)
    assert engine_partition(edges, tmp_path) == nx_partition(edges)


def _nx_bowtie(edges) -> dict[str, int]:
    import networkx as nx

    G = nx.DiGraph()
    G.add_edges_from(edges)
    sccs = sorted(
        nx.strongly_connected_components(G), key=len, reverse=True
    )
    giant = max(sccs, key=len)
    assert sum(1 for c in sccs if len(c) == len(giant)) == 1, (
        "fixture must have a unique largest SCC (engine ties break by vid)"
    )
    member = next(iter(giant))
    fwd = nx.descendants(G, member) | giant
    rev = nx.ancestors(G, member) | giant
    n_scc = len(giant)
    n_out = len(fwd - giant)
    n_in = len(rev - fwd)
    n_other = G.number_of_nodes() - n_scc - n_out - n_in
    return {"scc": n_scc, "in": n_in, "out": n_out, "other": n_other}


def test_bowtie_handbuilt(tmp_path):
    """Core 3-cycle, IN chain, OUT chain, tendril off IN, and a
    disconnected 2-cycle — every bow-tie region populated."""
    from rayrank.pipelines import bowtie_regions

    edges = [
        ("c1", "c2"), ("c2", "c3"), ("c3", "c1"),      # giant SCC
        ("i1", "c1"), ("i0", "i1"),                    # IN chain
        ("c3", "o1"), ("o1", "o2"),                    # OUT chain
        ("i0", "t1"),                                  # tendril (other)
        ("d1", "d2"), ("d2", "d1"),                    # disconnected SCC
    ]
    fwd, rev = build_pair(edges, tmp_path)
    got = {
        r["region"]: r["n"]
        for r in bowtie_regions(fwd, rev).to_pylist()
    }
    assert got == _nx_bowtie(edges)


@pytest.mark.parametrize("seed,n,m", [(3, 40, 90), (12, 60, 110)])
def test_bowtie_random_matches_networkx(tmp_path, seed, n, m):
    from rayrank.pipelines import bowtie_regions

    edges = random_edge_list(seed, n, m)
    want = _nx_bowtie(edges)
    fwd, rev = build_pair(edges, tmp_path, Q=3)
    got = {
        r["region"]: r["n"]
        for r in bowtie_regions(fwd, rev).to_pylist()
    }
    assert got == want
