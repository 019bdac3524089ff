"""Label propagation with deterministic min-label tie-break
(north_rule; SURVEY.md §2.11; rule pinned in FIXTURES.md §1 and
mirrored by tests/oracle.py::oracle_label_propagation).

Rule: undirected multigraph WITHOUT self-loops; synchronous rounds;
``label[v] ← argmax over neighbor labels of multiplicity-weighted
count``, smallest label on count ties; isolated vertices keep their
label; stop on zero changes or ``max_iterations`` (synchronous LP can
2-cycle on bipartite structures — the cap keeps it deterministic).
"""

from __future__ import annotations

import numpy as np
import ray

from .iterate import LabelResult, iterate_labels


@ray.remote(num_returns=2)
def _mode_reduce(labels_q: np.ndarray, *parts):
    idxs = [p[0] for p in parts if len(p[0])]
    if not idxs:
        return labels_q.copy(), 0
    idx = np.concatenate(idxs)
    lab = np.concatenate([p[1] for p in parts if len(p[0])])
    cnt = np.concatenate([p[2] for p in parts if len(p[0])])

    # combine partial counts per (vertex, label)
    order = np.lexsort((lab, idx))
    idx, lab, cnt = idx[order], lab[order], cnt[order]
    seg_mask = np.empty(len(idx), bool)
    seg_mask[0] = True
    np.logical_or(idx[1:] != idx[:-1], lab[1:] != lab[:-1], out=seg_mask[1:])
    seg = np.flatnonzero(seg_mask)
    idx_u, lab_u = idx[seg], lab[seg]
    cnt_u = np.add.reduceat(cnt, seg)

    # per vertex: max count, min label on ties → sort by (idx, -cnt, lab)
    order2 = np.lexsort((lab_u, -cnt_u, idx_u))
    idx_s, lab_s = idx_u[order2], lab_u[order2]
    first = np.empty(len(idx_s), bool)
    first[0] = True
    np.not_equal(idx_s[1:], idx_s[:-1], out=first[1:])
    winners_idx = idx_s[first]
    winners_lab = lab_s[first]

    new = labels_q.copy()
    new[winners_idx] = winners_lab
    changed = int(np.count_nonzero(new != labels_q))
    return new, changed


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
        shard_method="label_counts",
        reduce_remote=_mode_reduce,
        max_iterations=max_iterations,
        shards=shards,
        ckpt_dir=ckpt_dir,
        ckpt_interval=ckpt_interval,
        resume=resume,
        algo_name="label_propagation",
    )
