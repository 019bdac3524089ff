"""PageRank engine vs the FIXTURES.md golden fixture and the numpy
oracle transliteration (SURVEY.md §5.2 items 2-3)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from oracle import (
    oracle_pagerank_by_name,
    random_edge_list,
)
from rayrank.graph import build_graph
from rayrank.pagerank import power_method, power_method_dataset

SMALL_EDGES = [
    ("1", "2"), ("1", "3"), ("3", "1"), ("3", "2"), ("3", "5"),
    ("4", "5"), ("4", "6"), ("5", "6"), ("5", "4"), ("6", "4"),
]

GOLDEN = {
    "4": 0.2659857291,
    "6": 0.2152402279,
    "5": 0.1814495444,
    "2": 0.1300574892,
    "3": 0.1078722091,
    "1": 0.0993948002,
}


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src_name": pa.array([s for s, _ in edges], pa.string()),
                "dst_name": pa.array([t for _, t in edges], pa.string()),
            }
        )
    )


def build(edges, tmp_dir, Q=4, **kw):
    return build_graph(edges_ds(edges), tmp_dir, num_partitions=Q, **kw)


def test_small_graph_golden(tmp_graph_dir):
    meta = build(SMALL_EDGES, tmp_graph_dir)
    assert meta.n == 6
    res = power_method(tmp_graph_dir, alpha=0.85, epsilon=1e-6)
    scores = res.scores_by_name(tmp_graph_dir)
    assert res.converged
    assert res.iterations == 17  # pinned in BASELINE.md / FIXTURES.md
    for name, want in GOLDEN.items():
        assert scores[name] == pytest.approx(want, abs=1e-6)
    order = sorted(scores, key=scores.get, reverse=True)
    assert order == ["4", "6", "5", "2", "3", "1"]


@pytest.mark.parametrize("seed,n,mfac", [(0, 5, 1), (1, 20, 4), (2, 100, 4), (3, 100, 1)])
def test_random_graphs_match_oracle(tmp_graph_dir, seed, n, mfac):
    edges = random_edge_list(seed, n, n * mfac)
    want, want_iters = oracle_pagerank_by_name(edges)
    meta = build(edges, tmp_graph_dir, Q=4)
    res = power_method(tmp_graph_dir)
    got = res.scores_by_name(tmp_graph_dir)
    assert set(got) == set(want)
    assert res.iterations == want_iters
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_alpha_variant_matches_oracle(tmp_graph_dir):
    edges = random_edge_list(7, 50, 200)
    want, _ = oracle_pagerank_by_name(edges, alpha=0.99)
    build(edges, tmp_graph_dir, Q=3)
    res = power_method(tmp_graph_dir, alpha=0.99)
    got = res.scores_by_name(tmp_graph_dir)
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_filter_ratio_prune_matches_oracle(tmp_graph_dir):
    # hub-heavy graph so the prune actually fires
    edges = random_edge_list(5, 30, 60) + [(str(i), "0") for i in range(1, 25)]
    want, _ = oracle_pagerank_by_name(edges, filter_ratio=0.3)
    build(edges, tmp_graph_dir, Q=4, filter_ratio=0.3)
    res = power_method(tmp_graph_dir)
    got = res.scores_by_name(tmp_graph_dir)
    assert set(got) == set(want)
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_personalization_matches_oracle(tmp_graph_dir):
    edges = random_edge_list(9, 40, 160)
    chosen = {str(i) for i in range(0, 40, 3)}
    want, _ = oracle_pagerank_by_name(edges, v_indicator_names=chosen)
    meta = build(edges, tmp_graph_dir, Q=4)

    # indicator v in partition space, via the vertex table
    import ray
    from rayrank.graph import load_vertices

    parts = [np.zeros(s) for s in meta.part_sizes]
    for b in load_vertices(tmp_graph_dir).iter_batches(batch_format="pyarrow"):
        for vid, nm in zip(b.column("vid").to_pylist(), b.column("name").to_pylist()):
            if nm in chosen:
                parts[vid % meta.Q][vid // meta.Q] = 1.0
    v_parts = [ray.put(p) for p in parts]
    res = power_method(tmp_graph_dir, v_parts=v_parts)
    got = res.scores_by_name(tmp_graph_dir)
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_dataset_variant_cross_check(tmp_graph_dir):
    edges = random_edge_list(4, 20, 60)
    want, _ = oracle_pagerank_by_name(edges)
    build(edges, tmp_graph_dir, Q=2)
    xds = power_method_dataset(tmp_graph_dir, max_iterations=200)
    from rayrank.graph import load_vertices

    vid_to_name = {}
    for b in load_vertices(tmp_graph_dir).iter_batches(batch_format="pyarrow"):
        for vid, nm in zip(b.column("vid").to_pylist(), b.column("name").to_pylist()):
            vid_to_name[vid] = nm
    got = {}
    for b in xds.iter_batches(batch_format="pyarrow"):
        for vid, sc in zip(b.column("vid").to_pylist(), b.column("score").to_pylist()):
            got[vid_to_name[vid]] = sc
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_dataset_variant_personalized(tmp_graph_dir):
    """Flow C cross-check: the vanilla Dataset fallback with a
    personalization Dataset must match the numpy oracle (r1 VERDICT
    missing-item #2)."""
    import pyarrow as pa
    import ray.data

    edges = random_edge_list(21, 30, 90)
    chosen = {str(i) for i in range(0, 30, 4)}
    want, _ = oracle_pagerank_by_name(edges, v_indicator_names=chosen)
    build(edges, tmp_graph_dir, Q=3)

    from rayrank.graph import load_vertices

    vid_to_name = {}
    v_rows = []
    for b in load_vertices(tmp_graph_dir).iter_batches(batch_format="pyarrow"):
        for vid, nm in zip(b.column("vid").to_pylist(), b.column("name").to_pylist()):
            vid_to_name[vid] = nm
            if nm in chosen:
                v_rows.append(vid)
    v_ds = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(v_rows, pa.int64()),
                "v": pa.array([1.0] * len(v_rows), pa.float64()),
            }
        )
    )
    xds = power_method_dataset(tmp_graph_dir, max_iterations=300, v_ds=v_ds)
    got = {}
    for b in xds.iter_batches(batch_format="pyarrow"):
        for vid, sc in zip(b.column("vid").to_pylist(), b.column("score").to_pylist()):
            got[vid_to_name[vid]] = sc
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_warm_start_delta_refresh(tmp_path):
    """Delta refresh: after adding edges and rebuilding, a run seeded
    from the previous converged scores (warm_start_parts) must reach
    the SAME fixpoint (allclose 1e-6 vs the cold run and the numpy
    oracle) in FEWER iterations than the cold start."""
    from rayrank.pagerank import warm_start_parts

    old_dir = str(tmp_path / "g_old")
    new_dir = str(tmp_path / "g_new")
    edges = random_edge_list(seed=11, n=60, m=240)
    build(edges, old_dir)
    res_old = power_method(old_dir, epsilon=1e-10)
    assert res_old.converged

    # delta: a handful of new edges, including a brand-new vertex
    extra = [("60", "1"), ("2", "60"), ("5", "17"), ("30", "31")]
    build(edges + extra, new_dir)

    cold = power_method(new_dir, epsilon=1e-10)
    x0 = warm_start_parts(old_dir, res_old, new_dir)
    warm = power_method(new_dir, epsilon=1e-10, x0_parts=x0)

    assert warm.converged and cold.converged
    assert warm.iterations < cold.iterations
    sc_w = warm.scores_by_name(new_dir)
    sc_c = cold.scores_by_name(new_dir)
    assert set(sc_w) == set(sc_c)
    for k in sc_c:
        assert sc_w[k] == pytest.approx(sc_c[k], abs=1e-6)
    want, _ = oracle_pagerank_by_name(edges + extra, epsilon=1e-10)
    for k, v in want.items():
        assert sc_w[k] == pytest.approx(v, abs=1e-6)

    # unnormalized seeds must be rejected loudly
    import ray as _ray

    bad = [_ray.put(np.asarray(_ray.get(r)) * 3.0) for r in x0]
    with pytest.raises(ValueError, match="L1-normalized"):
        power_method(new_dir, epsilon=1e-10, x0_parts=bad)
