"""Katz centrality (rayrank/katz.py): exact parity vs a dense numpy
mirror of the pinned integer z-recurrence on directed multigraphs
(duplicates, self-loops, dangling vertices), Q=1 included, plus the
2^53 exactness-guard path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from oracle import random_edge_list
from rayrank.katz import ALPHA_INV, katz


def build_directed(edges, tmp_dir, Q=4):
    from rayrank.graph import build_graph

    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([d for _, d in edges], pa.string()),
        }
    )
    return build_graph(ray.data.from_arrow(t), tmp_dir, num_partitions=Q)


def numpy_katz(edges, iters):
    names = sorted({v for e in edges for v in e})
    ix = {v: i for i, v in enumerate(names)}
    n = len(names)
    A = np.zeros((n, n))
    for s, d in edges:
        A[ix[s], ix[d]] += 1.0
    z = np.ones(n)
    for t in range(1, iters + 1):
        z = A.T @ z + float(ALPHA_INV**t)
    x = z / float(ALPHA_INV**iters)
    return {v: x[ix[v]] for v in names}


def engine_katz(gdir, iters):
    res = katz(gdir, iters=iters)
    out = {}
    for b in res.scores_dataset(gdir).iter_batches(batch_format="pyarrow"):
        for nm, v in zip(
            b.column("name").to_pylist(), b.column("katz").to_pylist()
        ):
            out[nm] = v
    return out


EDGES = [
    ("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"),  # cycle + dup
    ("c", "c"),                                       # self-loop
    ("d", "a"),                                       # d has no in-edges
]


@pytest.mark.parametrize("Q", [1, 4])
def test_small_graph_bit_exact(tmp_graph_dir, Q):
    build_directed(EDGES, tmp_graph_dir, Q=Q)
    got = engine_katz(tmp_graph_dir, iters=3)
    want = numpy_katz(EDGES, iters=3)
    assert got == want  # integer recurrence ⇒ no tolerance needed


@pytest.mark.parametrize("seed,n,m", [(3, 30, 90), (9, 50, 200)])
def test_random_multigraphs(tmp_graph_dir, seed, n, m):
    edges = random_edge_list(seed, n, m)
    build_directed(edges, tmp_graph_dir)
    assert engine_katz(tmp_graph_dir, iters=3) == numpy_katz(edges, iters=3)


def test_overflow_guard(tmp_graph_dir):
    # a 2-cycle with multiplicity 2^13 each way: z grows ~8192^t and
    # crosses 2^53 at t=5 — the guard must raise, not return
    # silently-inexact floats.
    edges = [("s", "hub")] * 8192 + [("hub", "s")] * 8192
    build_directed(edges, tmp_graph_dir)
    with pytest.raises(OverflowError):
        katz(tmp_graph_dir, iters=5)
