"""Generic gather–apply–scatter driver loop for label-style iterative
algorithms (SURVEY.md §2.10 extension surface).

An algorithm provides:
  * ``shard_method`` — name of the CsrShard kernel that turns the
    current per-partition vertex state into per-destination-partition
    messages (pre-aggregated map-side);
  * ``reduce_remote`` — a ``@ray.remote(num_returns=2)`` task
    ``(state_q, *shard_outputs) → (new_state_q, changed_count)``.

The loop owns: partitioned state init (vid values), the Q×Q message
exchange, convergence on zero changes, per-iteration checkpoints with
metrics + lineage, and resume.  Connected components and label
propagation are both instances; PageRank keeps its own loop because of
the scalar coupling (dangling mass / norms) between iterations.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .checkpoint import latest_complete, load_checkpoint, write_checkpoint
from .graph import GraphMeta, load_vertices
from .shards import create_shards


@dataclass
class LabelResult:
    meta: GraphMeta
    part_refs: list
    iterations: int
    converged: bool
    history: list[dict] = field(default_factory=list)

    def labels_table(self) -> pa.Table:
        Q = self.meta.Q
        vids, labels = [], []
        for q, ref in enumerate(self.part_refs):
            vals = ray.get(ref)
            vids.append(np.arange(len(vals), dtype=np.int64) * Q + q)
            labels.append(vals.astype(np.int64))
        return pa.table(
            {
                "vid": np.concatenate(vids) if vids else np.empty(0, np.int64),
                "label": np.concatenate(labels) if labels else np.empty(0, np.int64),
            }
        )

    def labels_dataset(self, graph_dir: str) -> ray.data.Dataset:
        from .joins import hash_join

        labels = ray.data.from_arrow(self.labels_table())
        verts = load_vertices(graph_dir).select_columns(["vid", "name"])
        return hash_join(labels, verts, on=("vid",), num_partitions=self.meta.Q)

    def labels_by_name(self, graph_dir: str) -> dict[str, int]:
        out = {}
        for b in self.labels_dataset(graph_dir).iter_batches(batch_format="pyarrow"):
            for nm, lb in zip(
                b.column("name").to_pylist(), b.column("label").to_pylist()
            ):
                out[nm] = lb
        return out


def init_vid_labels(meta: GraphMeta) -> list:
    return [
        ray.put(np.arange(s, dtype=np.int64) * meta.Q + q)
        for q, s in enumerate(meta.part_sizes)
    ]


def iterate_labels(
    graph_dir: str,
    shard_method: str,
    reduce_remote,
    max_iterations: int,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
    algo_name: str = "labels",
) -> LabelResult:
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    if shards is None:
        shards = create_shards(graph_dir, meta)

    start_iter = 0
    labels = None
    if resume and ckpt_dir is not None:
        last = latest_complete(ckpt_dir)
        if last is not None:
            labels = [
                _as_int64.remote(r) for r in load_checkpoint(ckpt_dir, last, Q)
            ]
            start_iter = last + 1
    if labels is None:
        labels = init_vid_labels(meta)

    history: list[dict] = []
    converged = False
    it = start_iter - 1
    for it in range(start_iter, max_iterations):
        msgs = []
        for p in range(Q):
            out = getattr(shards[p], shard_method).options(num_returns=Q).remote(
                labels[p]
            )
            msgs.append(out if Q > 1 else [out])
        red = [
            reduce_remote.remote(labels[q], *[msgs[p][q] for p in range(Q)])
            for q in range(Q)
        ]
        new_labels = [r[0] for r in red]
        changed = sum(ray.get([r[1] for r in red]))
        labels = new_labels
        converged = changed == 0
        metrics = {"changed": int(changed), "algorithm": algo_name}
        history.append({"iteration": it, **metrics})
        if ckpt_dir is not None and (
            it % ckpt_interval == 0 or converged or it == max_iterations - 1
        ):
            write_checkpoint(ckpt_dir, it, labels, Q, metrics)
        if converged:
            break

    return LabelResult(
        meta=meta,
        part_refs=labels,
        iterations=it + 1,
        converged=converged,
        history=history,
    )


@ray.remote
def _as_int64(a: np.ndarray) -> np.ndarray:
    return a.astype(np.int64)
