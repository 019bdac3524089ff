"""MIS tests: the distributed Luby-by-hash fixpoint must equal the
sequential greedy in splitmix64(vid) priority order EXACTLY (set
equality, not just size), plus independence/maximality invariants."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from rayrank.mis import greedy_mis_oracle, mis, mis_members

from test_bfs import SMALL_EDGES, build_undirected


def name_to_vid(gdir):
    t = pq.read_table(os.path.join(gdir, "vertices"), columns=["vid", "name"])
    return dict(zip(t.column("name").to_pylist(), t.column("vid").to_pylist()))


def engine_mis(gdir):
    res = mis(gdir)
    assert res.converged
    out = set()
    for b in mis_members(res, gdir).iter_batches(batch_format="pyarrow"):
        out |= set(b.column("name").to_pylist())
    return out


def check_invariants(edges, chosen):
    adj = {}
    verts = set()
    for a, b in edges:
        verts |= {a, b}
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    for v in chosen:  # independence
        assert not (adj.get(v, set()) & chosen)
    for v in verts - chosen:  # maximality
        assert adj.get(v, set()) & chosen, f"{v} could be added"


def test_small_graph(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    got = engine_mis(gdir)
    assert got == greedy_mis_oracle(SMALL_EDGES, name_to_vid(gdir))
    check_invariants(SMALL_EDGES, got)


def test_isolated_vertices_always_in(tmp_path):
    edges = [("a", "b"), ("c", "c"), ("d", "d")]  # c, d isolated after loop-drop
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir)
    got = engine_mis(gdir)
    assert {"c", "d"} <= got
    assert got == greedy_mis_oracle(edges, name_to_vid(gdir))


@pytest.mark.parametrize("seed,n,m,Q", [(31, 40, 70, 3), (32, 60, 140, 4), (33, 25, 25, 1)])
def test_random_graphs(tmp_path, seed, n, m, Q):
    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=Q)
    got = engine_mis(gdir)
    assert got == greedy_mis_oracle(edges, name_to_vid(gdir))
    check_invariants(edges, got)


@pytest.mark.parametrize("Q", [2, 5])
def test_partition_count_invariance(tmp_path, Q):
    # the fixpoint must not depend on Q (deterministic by construction)
    rng = np.random.default_rng(7)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, 30, 60), rng.integers(0, 30, 60))
    ]
    gdir = str(tmp_path / f"g{Q}")
    build_undirected(edges, gdir, Q=Q)
    assert engine_mis(gdir) == greedy_mis_oracle(edges, name_to_vid(gdir))


def engine_mis_named(gdir):
    res = mis(gdir, named_priority=True)
    assert res.converged
    out = set()
    for b in mis_members(res, gdir).iter_batches(batch_format="pyarrow"):
        out |= set(b.column("name").to_pylist())
    return out


@pytest.mark.parametrize("seed,n,m,Q", [(41, 40, 70, 3), (42, 60, 140, 4)])
def test_named_priority_random_graphs(tmp_path, seed, n, m, Q):
    # name-space priorities (the SQL-checked mis_vertices rule): the
    # fixpoint equals sequential greedy in splitmix64(int(name)) order
    from rayrank.mis import greedy_mis_named_oracle

    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=Q)
    got = engine_mis_named(gdir)
    assert got == greedy_mis_named_oracle(edges)
    check_invariants(edges, got)


def test_named_priority_rejects_non_numeric(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected([("a", "b"), ("b", "c")], gdir)
    with pytest.raises(Exception):
        engine_mis_named(gdir)
