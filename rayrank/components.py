"""Connected components via iterative min-label hash-aggregation
(north_rule; SURVEY.md §2.11).

Runs over the UNDIRECTED graph layout (``build_graph(...,
undirected=True)`` — both edge directions present, self-loops dropped),
so one direction of messages per iteration suffices.  Label init = vid;
per iteration ``label[v] ← min(label[v], min over neighbors)``; stop at
zero changes.  Component ids are therefore the minimum vid of each
component; :func:`canonical_components` re-keys them to the minimum
NAME for id-scheme-independent reporting.
"""

from __future__ import annotations

import ray.data

from .iterate import LabelResult, iterate_labels


def connected_components(
    graph_dir: str,
    max_iterations: int = 200,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
) -> LabelResult:
    return iterate_labels(
        graph_dir,
        gather_method="gather_min",
        reduce_method="reduce_min",
        max_iterations=max_iterations,
        shards=shards,
        ckpt_dir=ckpt_dir,
        ckpt_interval=ckpt_interval,
        resume=resume,
        algo_name="connected_components",
    )


def canonical_components(
    result: LabelResult, graph_dir: str
) -> ray.data.Dataset:
    """(name, component) with component = min member NAME — independent
    of the vid scheme (groupby(label).min(name) joined back)."""
    ds = result.labels_dataset(graph_dir)
    reps = ds.groupby("label").min("name")
    reps = reps.map_batches(
        lambda t: t.rename_columns(["rlabel", "component"]), batch_format="pyarrow"
    )
    from .joins import hash_join

    out = hash_join(
        ds, reps, on=("label",), right_on=("rlabel",),
        num_partitions=result.meta.Q,
    )
    return out.select_columns(["name", "component"])
