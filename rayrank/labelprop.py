"""Label propagation with deterministic min-label tie-break
(north_rule; SURVEY.md §2.11; rule pinned in FIXTURES.md §1 and
mirrored by tests/oracle.py::oracle_label_propagation).

Rule: undirected multigraph WITHOUT self-loops; synchronous rounds;
``label[v] ← argmax over neighbor labels of multiplicity-weighted
count``, smallest label on count ties; isolated vertices keep their
label; stop on zero changes or ``max_iterations`` (synchronous LP can
2-cycle on bipartite structures — the cap keeps it deterministic).

The count/argmax kernels live on the CsrShard actors
(shards.py: gather_counts / reduce_counts); this module just binds them
into the generic iterate loop.
"""

from __future__ import annotations

from .iterate import LabelResult, iterate_labels


def label_propagation(
    graph_dir: str,
    max_iterations: int = 100,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
) -> LabelResult:
    """Requires the undirected graph layout (build_graph(...,
    undirected=True)): both directions present, self-loops dropped,
    ``mult`` = per-direction multiplicity = the vote weight."""
    return iterate_labels(
        graph_dir,
        gather_method="gather_counts",
        reduce_method="reduce_counts",
        max_iterations=max_iterations,
        shards=shards,
        ckpt_dir=ckpt_dir,
        ckpt_interval=ckpt_interval,
        resume=resume,
        algo_name="label_propagation",
    )
