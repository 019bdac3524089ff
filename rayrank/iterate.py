"""Generic gather–apply–scatter driver loop for label-style iterative
algorithms (SURVEY.md §2.10 extension surface).

An algorithm names a pair of CsrShard kernels:

  * ``gather_method`` — turns the actor-resident label partition into
    per-destination-partition messages (map-side combined);
  * ``reduce_method`` — runs ON the destination shard actor, folds the
    Q message columns into its resident labels, returns the changed
    count (a scalar).

The loop owns: label init (vid values), the Q×Q message exchange,
convergence on zero changes, per-iteration checkpoints with metrics +
lineage, and resume.  Connected components and label propagation are
both instances; PageRank keeps its own loop because of the scalar
coupling (dangling mass / norms) between iterations.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .checkpoint import latest_complete, load_checkpoint, write_manifest
from .graph import GraphMeta
from .shards import create_shards, gather_refs


@dataclass
class LabelResult:
    meta: GraphMeta
    part_refs: list
    iterations: int
    converged: bool
    history: list[dict] = field(default_factory=list)

    def labels_table(self) -> pa.Table:
        """Driver-side concatenation — TEST/small-result helper only;
        production paths use :meth:`labels_dataset`."""
        Q = self.meta.Q
        vids, labels = [], []
        for q, ref in enumerate(self.part_refs):
            vals = ray.get(ref)
            vids.append(np.arange(len(vals), dtype=np.int64) * Q + q)
            labels.append(np.asarray(vals, np.int64))
        return pa.table(
            {
                "vid": np.concatenate(vids) if vids else np.empty(0, np.int64),
                "label": np.concatenate(labels) if labels else np.empty(0, np.int64),
            }
        )

    def labels_dataset(self, graph_dir: str) -> ray.data.Dataset:
        """(vid, name, label) — per-partition task-side name zip, no
        shuffle, no driver-side vector (see shards.zip_names)."""
        from .shards import zip_names

        vert_dir = os.path.join(graph_dir, "vertices")
        refs = [
            zip_names.remote(vert_dir, q, self.meta.Q, ref, "label")
            for q, ref in enumerate(self.part_refs)
        ]
        return ray.data.from_arrow_refs(refs)

    def distinct_label_count(self) -> int:
        """Distributed distinct-count of labels: per-partition unique
        (map-side combine, task-side) → tiny groupby — the driver never
        holds the label vector (r1 VERDICT finding #2)."""
        from .shards import unique_labels_part

        refs = [unique_labels_part.remote(ref) for ref in self.part_refs]
        ds = ray.data.from_arrow_refs(refs)
        return ds.groupby("label").count().count()

    def labels_by_name(self, graph_dir: str) -> dict[str, int]:
        out = {}
        for b in self.labels_dataset(graph_dir).iter_batches(batch_format="pyarrow"):
            for nm, lb in zip(
                b.column("name").to_pylist(), b.column("label").to_pylist()
            ):
                out[nm] = lb
        return out


def iterate_labels(
    graph_dir: str,
    gather_method: str,
    reduce_method: str,
    max_iterations: int,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
    algo_name: str = "labels",
    init_fn=None,
) -> LabelResult:
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    if shards is None:
        shards = create_shards(graph_dir, meta)

    start_iter = 0
    if resume and ckpt_dir is not None:
        last = latest_complete(ckpt_dir)
        if last is not None:
            refs = load_checkpoint(ckpt_dir, last, Q)
            ray.get([shards[q].set_labels.remote(refs[q]) for q in range(Q)])
            start_iter = last + 1
    if start_iter == 0:
        if init_fn is not None:
            init_fn(shards)
        else:
            ray.get([s.init_labels.remote() for s in shards])

    history: list[dict] = []
    converged = False
    it = start_iter - 1
    for it in range(start_iter, max_iterations):
        msgs = gather_refs(shards, gather_method)
        changed_parts = ray.get(
            [
                getattr(shards[q], reduce_method).remote(
                    *[msgs[p][q] for p in range(Q)]
                )
                for q in range(Q)
            ]
        )
        changed = int(sum(changed_parts))
        converged = changed == 0
        metrics = {"changed": changed, "algorithm": algo_name}
        history.append({"iteration": it, **metrics})
        if ckpt_dir is not None and (
            it % ckpt_interval == 0 or converged or it == max_iterations - 1
        ):
            it_dir = os.path.join(ckpt_dir, f"iter={it:04d}")
            os.makedirs(it_dir, exist_ok=True)
            lineage = ray.get(
                [
                    shards[q].write_labels.remote(
                        os.path.join(it_dir, f"part-{q:05d}.parquet")
                    )
                    for q in range(Q)
                ]
            )
            write_manifest(ckpt_dir, it, metrics, lineage)
        if converged:
            break

    return LabelResult(
        meta=meta,
        part_refs=[s.get_labels.remote() for s in shards],
        iterations=it + 1,
        converged=converged,
        history=history,
    )
