"""HITS hubs/authorities: exact parity (1e-9) vs a dense numpy oracle
implementing the pinned rule (rayrank/hits.py module doc) on directed
multigraphs, including Q=1 and a dangling/zero-in-degree mix."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.hits import hits


def build_pair(edges, tmp_path, Q=4):
    """Directed build + derived reversed layout; returns (fwd, rev)."""
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


def numpy_hits(edges, iterations):
    """Dense oracle of the pinned rule: multiplicity adjacency,
    hub0 = 1/sqrt(n), L2-normalized half-steps."""
    names = sorted({v for e in edges for v in e})
    ix = {v: i for i, v in enumerate(names)}
    n = len(names)
    A = np.zeros((n, n))
    for s, d in edges:
        A[ix[s], ix[d]] += 1.0
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(iterations):
        a = A.T @ h
        a = a / np.linalg.norm(a) if a.any() else a
        h = A @ a
        h = h / np.linalg.norm(h) if h.any() else h
    return {v: (a[ix[v]], h[ix[v]]) for v in names}


def engine_hits(fwd, rev, iterations):
    res = hits(fwd, rev, iterations=iterations)
    out = {}
    for b in res.scores_dataset(fwd).iter_batches(batch_format="pyarrow"):
        for nm, av, hv in zip(
            b.column("name").to_pylist(),
            b.column("auth").to_pylist(),
            b.column("hub").to_pylist(),
        ):
            out[nm] = (av, hv)
    return out


def check(edges, tmp_path, iterations, Q=4):
    fwd, rev = build_pair(edges, tmp_path, Q=Q)
    got = engine_hits(fwd, rev, iterations)
    want = numpy_hits(edges, iterations)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-9), (v, "auth")
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-9), (v, "hub")


def test_small_graph_with_multiplicity_and_dangling(tmp_path):
    # b→c twice (multiplicity), e dangling (no out), a no in-links
    edges = [("a", "b"), ("b", "c"), ("b", "c"), ("c", "a"),
             ("a", "c"), ("d", "e"), ("c", "e")]
    check(edges, tmp_path, iterations=3)


def test_random_multigraph_matches_numpy(tmp_path):
    rng = np.random.default_rng(7)
    names = [f"v{i}" for i in range(40)]
    edges = [
        (names[rng.integers(40)], names[rng.integers(40)])
        for _ in range(300)
    ]
    check(edges, tmp_path, iterations=5)


def test_q1_single_partition(tmp_path):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    check(edges, tmp_path, iterations=2, Q=1)


def test_self_loop_kept(tmp_path):
    # the pinned rule keeps self-loops in A (unlike the LP rule)
    edges = [("a", "a"), ("a", "b"), ("b", "a")]
    check(edges, tmp_path, iterations=4)
