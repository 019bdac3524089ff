"""Connected components, label propagation, triangle counting vs
networkx / numpy oracles (SURVEY.md §5.2 item 3).  One undirected graph
build per case serves all three algorithms."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from oracle import (
    oracle_components,
    oracle_label_propagation,
    oracle_triangles,
    random_edge_list,
)
from rayrank.components import canonical_components, connected_components
from rayrank.labelprop import label_propagation
from rayrank.triangles import triangle_count, triangles_per_vertex

SMALL_EDGES = [
    ("1", "2"), ("1", "3"), ("3", "1"), ("3", "2"), ("3", "5"),
    ("4", "5"), ("4", "6"), ("5", "6"), ("5", "4"), ("6", "4"),
]


def build_undirected(edges, tmp_dir, Q=4):
    from rayrank.graph import build_graph

    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([t for _, t in edges], pa.string()),
        }
    )
    return build_graph(
        ray.data.from_arrow(t), tmp_dir, num_partitions=Q, undirected=True
    )


def partition_of(labels_by_name: dict) -> set[frozenset]:
    groups: dict[int, set] = {}
    for nm, lb in labels_by_name.items():
        groups.setdefault(lb, set()).add(nm)
    return {frozenset(g) for g in groups.values()}


def vids_by_name(graph_dir):
    from rayrank.graph import load_vertices

    out = {}
    for b in load_vertices(graph_dir).iter_batches(batch_format="pyarrow"):
        for vid, nm in zip(b.column("vid").to_pylist(), b.column("name").to_pylist()):
            out[nm] = vid
    return out


def test_small_graph_all_three(tmp_graph_dir):
    build_undirected(SMALL_EDGES, tmp_graph_dir)

    cc = connected_components(tmp_graph_dir)
    assert cc.converged
    got_parts = partition_of(cc.labels_by_name(tmp_graph_dir))
    want_parts = {frozenset(c) for c in oracle_components(SMALL_EDGES)}
    assert got_parts == want_parts  # single component of all 6 (FIXTURES §1)
    assert got_parts == {frozenset("123456")}

    # {1,2,3} and {4,5,6} — verified with networkx in-sandbox (the
    # original FIXTURES.md §1 claim of a single triangle was wrong and
    # has been corrected there)
    total = triangle_count(tmp_graph_dir)
    assert total == 2
    per_v = {
        r["name"]: r["triangles"]
        for b in triangles_per_vertex(tmp_graph_dir).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    assert per_v == {"1": 1, "2": 1, "3": 1, "4": 1, "5": 1, "6": 1}
    want_total, want_per_v = oracle_triangles(SMALL_EDGES)
    assert total == want_total and per_v == want_per_v

    lp = label_propagation(tmp_graph_dir, max_iterations=50)
    want_lp = oracle_label_propagation(
        SMALL_EDGES, vids_by_name(tmp_graph_dir), max_iterations=50
    )
    assert lp.labels_by_name(tmp_graph_dir) == want_lp


@pytest.mark.parametrize("seed,n,m", [(11, 30, 25), (12, 60, 90), (13, 40, 160)])
def test_random_graphs_all_three(tmp_graph_dir, seed, n, m):
    edges = random_edge_list(seed, n, m)
    build_undirected(edges, tmp_graph_dir, Q=3)

    cc = connected_components(tmp_graph_dir)
    assert cc.converged
    assert partition_of(cc.labels_by_name(tmp_graph_dir)) == {
        frozenset(c) for c in oracle_components(edges)
    }

    want_total, want_per_v = oracle_triangles(edges)
    # both implementations: actor-resident wedge join AND Dataset joins
    assert triangle_count(tmp_graph_dir, use_shards=True) == want_total
    assert triangle_count(tmp_graph_dir, use_shards=False) == want_total
    from rayrank.triangles import triangles_per_vertex_shards

    for impl in (triangles_per_vertex, triangles_per_vertex_shards):
        per_v = {
            r["name"]: r["triangles"]
            for b in impl(tmp_graph_dir).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        assert per_v == want_per_v, impl.__name__

    lp = label_propagation(tmp_graph_dir, max_iterations=30)
    want_lp = oracle_label_propagation(
        edges, vids_by_name(tmp_graph_dir), max_iterations=30
    )
    assert lp.labels_by_name(tmp_graph_dir) == want_lp


def test_derive_undirected_equivalent(tmp_path):
    """derive_undirected(directed build) must equal
    build_graph(undirected=True) — same ids (deterministic), same
    collapsed edges/weights, same algorithm outputs."""
    from rayrank.graph import build_graph, derive_undirected, load_edges

    edges = random_edge_list(17, 40, 120)
    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([x for _, x in edges], pa.string()),
        }
    )
    d_dir = str(tmp_path / "d")
    u_direct = str(tmp_path / "u1")
    u_derived = str(tmp_path / "u2")
    build_graph(ray.data.from_arrow(t), d_dir, num_partitions=3)
    build_graph(
        ray.data.from_arrow(t), u_direct, num_partitions=3, undirected=True
    )
    m = derive_undirected(d_dir, u_derived)

    def edge_set(gd):
        rows = set()
        for b in load_edges(gd).iter_batches(batch_format="pyarrow"):
            for r in b.to_pylist():
                rows.add((r["src"], r["dst"], r["mult"], round(r["w"], 12)))
        return rows

    assert edge_set(u_direct) == edge_set(u_derived)

    cc1 = connected_components(u_direct).labels_by_name(u_direct)
    cc2 = connected_components(u_derived).labels_by_name(u_derived)
    assert cc1 == cc2
    assert triangle_count(u_direct) == triangle_count(u_derived)
    assert m.undirected


def test_canonical_components_named(tmp_graph_dir):
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")]
    build_undirected(edges, tmp_graph_dir, Q=2)
    cc = connected_components(tmp_graph_dir)
    rows = {
        r["name"]: r["component"]
        for b in canonical_components(cc, tmp_graph_dir).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    assert rows == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_q1_single_partition_all_algorithms(tmp_path):
    """Q=1 degenerates num_returns=Q (one ref to the whole message
    tuple); the gather methods must return the bare per-partition
    message so reducers unpack correctly (ADVICE r1)."""
    from rayrank.graph import build_graph
    from rayrank.pagerank import power_method

    edges = SMALL_EDGES
    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([x for _, x in edges], pa.string()),
        }
    )
    d_dir = str(tmp_path / "d1")
    u_dir = str(tmp_path / "u1")
    build_graph(ray.data.from_arrow(t), d_dir, num_partitions=1)
    build_graph(
        ray.data.from_arrow(t), u_dir, num_partitions=1, undirected=True
    )

    res = power_method(d_dir)
    assert res.converged
    from oracle import oracle_pagerank_by_name

    want, _ = oracle_pagerank_by_name(edges)
    got = res.scores_by_name(d_dir)
    for nm, sc in want.items():
        assert abs(got[nm] - sc) < 1e-6, nm

    cc = connected_components(u_dir)
    assert partition_of(cc.labels_by_name(u_dir)) == {
        frozenset(c) for c in oracle_components(edges)
    }
    assert triangle_count(u_dir, use_shards=True) == 2
    lp = label_propagation(u_dir, max_iterations=50)
    want_lp = oracle_label_propagation(
        edges, vids_by_name(u_dir), max_iterations=50
    )
    assert lp.labels_by_name(u_dir) == want_lp


def test_partitioned_encode_equivalent(tmp_path, monkeypatch):
    """The >broadcast-limit dictionary-encode fallback must produce the
    same graph as the broadcast path (scale path exercised at test
    scale by forcing the limit to 0)."""
    import rayrank.ids as ids_mod
    from rayrank.graph import build_graph, load_edges

    edges = random_edge_list(33, 50, 200)
    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([x for _, x in edges], pa.string()),
        }
    )
    d_b = str(tmp_path / "broadcast")
    d_p = str(tmp_path / "partitioned")
    build_graph(ray.data.from_arrow(t), d_b, num_partitions=3)
    monkeypatch.setattr(ids_mod, "BROADCAST_VERTEX_LIMIT", 0)
    build_graph(ray.data.from_arrow(t), d_p, num_partitions=3)

    def edge_set(gd):
        rows = set()
        for b in load_edges(gd).iter_batches(batch_format="pyarrow"):
            for r in b.to_pylist():
                rows.add((r["src"], r["dst"], r["mult"], round(r["w"], 12)))
        return rows

    assert edge_set(d_b) == edge_set(d_p)
    assert len(edge_set(d_b)) > 0


def test_lp_modularity_matches_networkx(tmp_path):
    """Modularity of the engine's own LP partition must equal
    networkx.community.modularity on the same partition (exact
    integer restatement, allclose only for the final double)."""
    import networkx as nx
    import pyarrow as pa
    import pytest
    import ray.data

    from oracle import random_edge_list
    from rayrank.graph import build_graph, derive_undirected
    from rayrank.labelprop import label_propagation
    from rayrank.pipelines import _modularity_of

    edges = random_edge_list(14, 50, 140)
    ddir, udir = str(tmp_path / "d"), str(tmp_path / "u")
    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([d for _, d in edges], pa.string()),
        }
    )
    build_graph(ray.data.from_arrow(t), ddir, num_partitions=4)
    derive_undirected(ddir, udir)

    lp = label_propagation(udir, max_iterations=10)
    got = _modularity_of(udir, lp).to_pylist()[0]

    G = nx.Graph()
    for s, d in edges:
        if s != d:
            G.add_edge(s, d)
    by_label: dict[int, set] = {}
    for nm, lb in lp.labels_by_name(udir).items():
        by_label.setdefault(lb, set()).add(nm)
    want = nx.community.modularity(G, list(by_label.values()))
    assert got["communities"] == len(by_label)
    assert got["m_edges"] == G.number_of_edges()
    assert got["modularity"] == pytest.approx(want, abs=1e-12)
