"""Checkpoint manifests, lineage, and kill-and-resume identity
(north_rule: resumable runs with per-partition lineage + metrics)."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from oracle import random_edge_list
from rayrank.checkpoint import latest_complete, read_manifest
from rayrank.components import connected_components
from rayrank.graph import build_graph
from rayrank.pagerank import power_method


@pytest.fixture(scope="module")
def graph_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("g") / "graph")
    edges = random_edge_list(21, 40, 160)
    t = pa.table(
        {
            "src_name": pa.array([s for s, _ in edges], pa.string()),
            "dst_name": pa.array([x for _, x in edges], pa.string()),
        }
    )
    build_graph(ray.data.from_arrow(t), d, num_partitions=3)
    return d


def test_manifest_and_lineage(graph_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    res = power_method(graph_dir, ckpt_dir=ckpt, max_iterations=4)
    last = latest_complete(ckpt)
    assert last == 3
    man = read_manifest(ckpt, last)
    assert man["iteration"] == 3
    for key in (
        "residual_l2_prev_update",
        "l1_before_norm",
        "dangling_mass_next",
        "rows_shuffled",
    ):
        assert key in man["metrics"]
    assert len(man["parts"]) == 3
    for part in man["parts"]:
        assert os.path.getsize(part["path"]) == part["bytes"]
        assert part["rows"] >= 0


def test_kill_and_resume_identical_scores(graph_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    full = power_method(graph_dir, ckpt_dir=None)
    want = full.scores_table().to_pydict()

    # "crash" after 5 iterations…
    power_method(graph_dir, ckpt_dir=ckpt, max_iterations=5)
    # …simulate a torn write of a later iteration (no manifest → ignored)
    torn = os.path.join(ckpt, "iter=0005")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "w") as f:
        f.write("garbage")

    resumed = power_method(graph_dir, ckpt_dir=ckpt, resume=True)
    got = resumed.scores_table().to_pydict()
    assert got["vid"] == want["vid"]
    # resume restarts the scalar-folded normalization from c=1 (the
    # checkpoint stores the normalized iterate), so late-iteration floats
    # differ from the uninterrupted run at ~1e-15 — far inside the 1e-6
    # semantic budget
    np.testing.assert_allclose(got["score"], want["score"], rtol=0, atol=1e-9)
    assert resumed.iterations == full.iterations
    # iterations 0..4 came from the first (killed) run's checkpoints
    assert resumed.history[0]["iteration"] == 5


def test_resume_from_empty_dir_is_fresh_run(graph_dir, tmp_path):
    ckpt = str(tmp_path / "nothing")
    res = power_method(graph_dir, ckpt_dir=ckpt, resume=True, max_iterations=3)
    assert res.history[0]["iteration"] == 0


def test_cc_resume(graph_dir, tmp_path):
    # CC on this directed-layout graph still converges (labels flow one
    # direction); resume must reproduce the uninterrupted labels exactly.
    ckpt = str(tmp_path / "ccc")
    full = connected_components(graph_dir)
    connected_components(graph_dir, ckpt_dir=ckpt, max_iterations=2)
    resumed = connected_components(graph_dir, ckpt_dir=ckpt, resume=True)
    assert ray_get_labels(full) == ray_get_labels(resumed)


def ray_get_labels(res):
    t = res.labels_table()
    return dict(zip(t.column("vid").to_pylist(), t.column("label").to_pylist()))
