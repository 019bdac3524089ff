"""Nearest-landmark assignment (rayrank.bfs.landmarks): exact vs a
plain-Python multi-source BFS with the lexicographic (dist, seed-rank)
pick, on the golden small graph and random graphs; encoded-label
correctness is exactly this tie rule."""

from collections import deque

import numpy as np
import pytest

from rayrank.bfs import landmark_table, landmarks, smallest_vertex_names

from test_bfs import SMALL_EDGES, build_undirected


def python_landmarks(edges, seeds):
    """name -> (dist, landmark): per-seed BFS then lexicographic pick
    (min dist, then smallest seed RANK in sorted(seeds))."""
    adj: dict[str, set] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        else:
            adj.setdefault(s, set())
    best: dict[str, tuple[int, int]] = {}
    ordered = sorted(set(seeds))
    for rank, seed in enumerate(ordered):
        dist = {seed: 0}
        dq = deque([seed])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, d in dist.items():
            if v not in best or (d, rank) < best[v]:
                best[v] = (d, rank)
    return {v: (d, ordered[r]) for v, (d, r) in best.items()}


def engine_landmarks(gdir, seeds):
    res, ordered = landmarks(gdir, seeds)
    assert res.converged
    out = {}
    for b in landmark_table(res, gdir, ordered).iter_batches(
        batch_format="pyarrow"
    ):
        for nm, d, lm in zip(
            b.column("name").to_pylist(),
            b.column("dist").to_pylist(),
            b.column("landmark").to_pylist(),
        ):
            out[nm] = (d, lm)
    return out


def test_small_graph(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    seeds = ["2", "6"]
    assert engine_landmarks(gdir, seeds) == python_landmarks(SMALL_EDGES, seeds)


def test_tie_goes_to_smaller_seed_rank(tmp_path):
    # path a - m - b: m is equidistant from both seeds; must pick "a"
    edges = [("a", "m"), ("m", "b")]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir)
    got = engine_landmarks(gdir, ["b", "a"])  # unsorted input
    assert got["m"] == (1, "a")
    assert got == python_landmarks(edges, ["b", "a"])


def test_unreached_component_filtered(tmp_path):
    edges = [("a", "b"), ("x", "y")]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir)
    got = engine_landmarks(gdir, ["a"])
    assert got == {"a": (0, "a"), "b": (1, "a")}


def test_smallest_vertex_names(tmp_path):
    gdir = str(tmp_path / "g")
    build_undirected(SMALL_EDGES, gdir)
    assert smallest_vertex_names(gdir, 3) == ["1", "2", "3"]


@pytest.mark.parametrize("seed,n,m,k", [(21, 40, 70, 3), (22, 60, 60, 5)])
def test_random_graphs(tmp_path, seed, n, m, k):
    rng = np.random.default_rng(seed)
    edges = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    gdir = str(tmp_path / "g")
    build_undirected(edges, gdir, Q=3)
    seeds = smallest_vertex_names(gdir, k)
    assert engine_landmarks(gdir, seeds) == python_landmarks(edges, seeds)
