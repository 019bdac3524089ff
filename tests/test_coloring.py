"""Coloring tests: the distributed iterated-MIS coloring must equal
the sequential 'repeat greedy MIS in splitmix64(vid) order' oracle
EXACTLY (per-vertex colors), plus properness."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from rayrank.mis import coloring, greedy_coloring_oracle

from test_bfs import SMALL_EDGES, build_undirected
from test_mis import name_to_vid


def engine_coloring(gdir):
    res = coloring(gdir)
    assert res.converged
    out = {}
    for b in res.labels_dataset(gdir).iter_batches(batch_format="pyarrow"):
        out.update(zip(b.column("name").to_pylist(), b.column("label").to_pylist()))
    return out


def check_proper(edges, colors):
    for a, b in edges:
        if a != b:
            assert colors[a] != colors[b], f"edge ({a},{b}) monochromatic"


def test_small_graph(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    got = engine_coloring(gdir)
    assert got == greedy_coloring_oracle(SMALL_EDGES, name_to_vid(gdir))
    check_proper(SMALL_EDGES, got)


def test_isolated_vertices_color_zero(tmp_path):
    edges = [("a", "b"), ("c", "c"), ("d", "d")]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir)
    got = engine_coloring(gdir)
    assert got["c"] == 0 and got["d"] == 0
    assert got == greedy_coloring_oracle(edges, name_to_vid(gdir))


@pytest.mark.parametrize(
    "seed,n,m,Q", [(41, 40, 90, 3), (42, 60, 200, 4), (43, 25, 25, 1)]
)
def test_random_graphs(tmp_path, seed, n, m, Q):
    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=Q)
    got = engine_coloring(gdir)
    assert got == greedy_coloring_oracle(edges, name_to_vid(gdir))
    check_proper(edges, got)


@pytest.mark.parametrize("Q", [2, 5])
def test_partition_count_invariance(tmp_path, Q):
    rng = np.random.default_rng(9)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, 30, 80), rng.integers(0, 30, 80))
    ]
    gdir = str(tmp_path / f"g{Q}")
    build_undirected(edges, gdir, Q=Q)
    assert engine_coloring(gdir) == greedy_coloring_oracle(
        edges, name_to_vid(gdir)
    )


@pytest.mark.parametrize("seed,n,m,Q", [(51, 40, 90, 3), (52, 60, 200, 4)])
def test_named_priority_random_graphs(tmp_path, seed, n, m, Q):
    from rayrank.mis import greedy_coloring_named_oracle

    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=Q)
    res = coloring(gdir, named_priority=True)
    assert res.converged
    got = {}
    for b in res.labels_dataset(gdir).iter_batches(batch_format="pyarrow"):
        got.update(zip(b.column("name").to_pylist(), b.column("label").to_pylist()))
    assert got == greedy_coloring_named_oracle(edges)
    check_proper(edges, got)
