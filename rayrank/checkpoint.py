"""Per-iteration Parquet checkpoints with lineage + metrics + resume
(north_rule; SURVEY.md §4.2).

Layout::

    ckpt_dir/iter=0007/part-00003.parquet   # (vid, value) float64/int64
    ckpt_dir/iter=0007/manifest.json        # written LAST → completeness marker

A manifest records the iteration number, convergence metrics (residual
L1/L2, dangling mass, rows shuffled through the contribution exchange)
and per-partition file lineage (rows, bytes, path).  ``latest_complete``
only trusts iterations whose manifest exists, so a run killed
mid-iteration resumes from the previous complete one (partial part
files are simply overwritten).  Partition files are written by parallel
Ray tasks, not the driver.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote
def _write_part(dir_: str, q: int, Q: int, values: np.ndarray) -> dict:
    vid = np.arange(len(values), dtype=np.int64) * Q + q
    path = os.path.join(dir_, f"part-{q:05d}.parquet")
    pq.write_table(pa.table({"vid": vid, "value": values}), path)
    return {"part": q, "rows": len(values), "bytes": os.path.getsize(path), "path": path}


def write_checkpoint(
    ckpt_dir: str,
    iteration: int,
    part_refs: list,
    Q: int,
    metrics: dict,
) -> None:
    it_dir = os.path.join(ckpt_dir, f"iter={iteration:04d}")
    os.makedirs(it_dir, exist_ok=True)
    lineage = ray.get(
        [_write_part.remote(it_dir, q, Q, part_refs[q]) for q in range(Q)]
    )
    manifest = {"iteration": iteration, "metrics": metrics, "parts": lineage}
    tmp = os.path.join(it_dir, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(it_dir, "manifest.json"))


def write_manifest(
    ckpt_dir: str, iteration: int, metrics: dict, lineage: list[dict]
) -> None:
    """Manifest for part files already written (e.g. by shard actors);
    written atomically LAST so it marks iteration completeness."""
    it_dir = os.path.join(ckpt_dir, f"iter={iteration:04d}")
    os.makedirs(it_dir, exist_ok=True)
    manifest = {"iteration": iteration, "metrics": metrics, "parts": lineage}
    tmp = os.path.join(it_dir, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(it_dir, "manifest.json"))


def latest_complete(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for d in os.listdir(ckpt_dir):
        if d.startswith("iter=") and os.path.exists(
            os.path.join(ckpt_dir, d, "manifest.json")
        ):
            it = int(d.split("=")[1])
            best = it if best is None else max(best, it)
    return best


def read_manifest(ckpt_dir: str, iteration: int) -> dict:
    with open(
        os.path.join(ckpt_dir, f"iter={iteration:04d}", "manifest.json")
    ) as f:
        return json.load(f)


@ray.remote
def _read_part(path: str) -> np.ndarray:
    return pq.read_table(path, columns=["value"]).column("value").to_numpy()


def load_checkpoint(ckpt_dir: str, iteration: int, Q: int) -> list:
    """Object refs of the Q partition value arrays of one iteration."""
    it_dir = os.path.join(ckpt_dir, f"iter={iteration:04d}")
    return [
        _read_part.remote(os.path.join(it_dir, f"part-{q:05d}.parquet"))
        for q in range(Q)
    ]
