"""Maximal independent set — deterministic Luby-by-hash-priority on the
actor-resident CSR shard loop (7th gather/reduce instance; extends the
reference's iterative-algorithm surface the same way CC/LP/k-core do —
reference pagerank.py:100 is the pattern ancestor).

Rule (pinned): priority = splitmix64(vid), a bijection → unique.  Each
synchronous round, (A) every undecided vertex whose priority is a
strict minimum over its undecided neighbourhood enters the set, then
(B) undecided neighbours of set members are excluded.  With unique
priorities this converges to EXACTLY the lexicographically-first MIS —
the one sequential greedy produces scanning vertices in increasing
priority — so the result is independent of Q, scheduling, and cluster
size, and a plain-Python greedy is an exact oracle (tests).  Expected
round count is O(log n) (Luby 1986; Blelloch-Fineman-Shun 2012 for the
greedy-equivalence argument).

Two priority spaces: the default ``splitmix64(vid)`` (vid-space, used
by coloring) and ``named_priority=True`` → ``splitmix64(int(name))``
(name-space, requires an integral vertex namespace).  The name-space
rule is what mis_vertices ships: it is independent of the polars-xxhash
vid assignment AND SQL-expressible — a recursive CTE cannot run the
two-phase round (two references to the recursive table), but the round
count is O(log n), so the driver oracle UNROLLS the rounds as plain
materialized CTEs over the HUGEINT splitmix chain (same trick as
hits_2iter/random_walks: bounded iteration ⇒ unrolled SQL).

Two gathers+reduces per round, Q×Q int64 message exchange, labels
resident — identical scale shape to CC (rayrank/components.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .graph import GraphMeta
from .iterate import LabelResult
from .shards import create_shards, gather_refs

MIS_IN = 1


def mis(
    graph_dir: str,
    max_iterations: int = 200,
    shards: list | None = None,
    named_priority: bool = False,
) -> LabelResult:
    """Run to fixpoint (no undecided vertices).  Labels: 1 = in the
    set, 2 = excluded.  ``named_priority`` switches to the SQL-checkable
    ``splitmix64(int(name))`` rule (raises on non-numeric names)."""
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    if shards is None:
        shards = create_shards(graph_dir, meta)
    if named_priority:
        vdir = os.path.join(graph_dir, "vertices")
        ray.get([s.init_mis_named.remote(vdir) for s in shards])
    else:
        ray.get([s.init_mis.remote() for s in shards])

    history: list[dict] = []
    converged = False
    it = -1
    for it in range(max_iterations):
        msgs = gather_refs(shards, "gather_min_undecided_pri")
        selected = sum(
            ray.get(
                [
                    shards[q].reduce_mis_select.remote(
                        *[msgs[p][q] for p in range(Q)]
                    )
                    for q in range(Q)
                ]
            )
        )
        msgs = gather_refs(shards, "gather_has_in")
        excluded = sum(
            ray.get(
                [
                    shards[q].reduce_mis_exclude.remote(
                        *[msgs[p][q] for p in range(Q)]
                    )
                    for q in range(Q)
                ]
            )
        )
        undecided = sum(ray.get([s.undecided_count.remote() for s in shards]))
        history.append(
            {
                "iteration": it,
                "selected": int(selected),
                "excluded": int(excluded),
                "undecided": int(undecided),
                "algorithm": "mis",
            }
        )
        if undecided == 0:
            converged = True
            break

    return LabelResult(
        meta=meta,
        part_refs=[s.get_labels.remote() for s in shards],
        iterations=it + 1,
        converged=converged,
        history=history,
    )


def mis_members(result: LabelResult, graph_dir: str) -> ray.data.Dataset:
    """(name) of set members — block-wise filter of the zero-shuffle
    labels dataset, no driver materialization."""
    ds = result.labels_dataset(graph_dir)

    def fin(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t.column("label"), MIS_IN))
        return pa.table({"name": keep.column("name")})

    return ds.map_batches(fin, batch_format="pyarrow")


def greedy_mis_oracle(
    edges: list[tuple[str, str]], name_to_vid: dict[str, int]
) -> set[str]:
    """Exact single-process oracle: sequential greedy in increasing
    splitmix64(vid) priority (drops self-loops, undirected)."""
    from .sketch import splitmix64

    names = sorted(name_to_vid)
    vids = np.fromiter((name_to_vid[n] for n in names), np.int64, len(names))
    pri = splitmix64(vids)
    adj: dict[str, set] = {n: set() for n in names}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    chosen: set[str] = set()
    blocked: set[str] = set()
    for i in np.argsort(pri):
        n = names[i]
        if n in blocked:
            continue
        chosen.add(n)
        blocked |= adj[n]
    return chosen


def greedy_mis_named_oracle(edges: list[tuple[str, str]]) -> set[str]:
    """Exact single-process oracle for ``named_priority=True``:
    sequential greedy in increasing splitmix64(int(name)) order."""
    from .sketch import splitmix64

    names = sorted({x for e in edges for x in e})
    pri = splitmix64(np.array([int(n) for n in names], np.int64))
    adj: dict[str, set] = {n: set() for n in names}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    chosen: set[str] = set()
    blocked: set[str] = set()
    for i in np.argsort(pri):
        n = names[i]
        if n in blocked:
            continue
        chosen.add(n)
        blocked |= adj[n]
    return chosen


def coloring(
    graph_dir: str,
    max_colors: int = 256,
    shards: list | None = None,
    named_priority: bool = False,
) -> LabelResult:
    """Greedy graph coloring by iterated hash-MIS (batched
    Jones–Plassmann): color class ``c`` is the deterministic greedy
    MIS of the residual graph after classes ``0..c-1`` are removed.

    Rule (pinned): the same splitmix64(vid) priority as :func:`mis`
    (or splitmix64(int(name)) with ``named_priority=True`` — the
    SQL-expressible rule, priorities persisting across classes), so
    each class — and therefore the whole coloring — equals the
    sequential algorithm "repeat greedy MIS in priority order on the
    residual graph", independent of Q, scheduling, and cluster size.
    Exact sequential oracles in tests (greedy_coloring_oracle /
    greedy_coloring_named_oracle).

    Scale shape: identical to :func:`mis` per inner round (two
    gathers, Q×Q int64 scalars, resident state); the outer loop runs
    once per color class — O(Δ) classes on bounded-degree graphs,
    O(log n) inner rounds each."""
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    Q = meta.Q
    if shards is None:
        shards = create_shards(graph_dir, meta)
    if named_priority:
        vdir = os.path.join(graph_dir, "vertices")
        ray.get([s.init_coloring_named.remote(vdir) for s in shards])
    else:
        ray.get([s.init_coloring.remote() for s in shards])

    history: list[dict] = []
    converged = False
    rounds = 0
    for c in range(max_colors):
        while True:
            rounds += 1
            msgs = gather_refs(shards, "gather_min_undecided_pri")
            ray.get(
                [
                    shards[q].reduce_mis_select.remote(
                        *[msgs[p][q] for p in range(Q)]
                    )
                    for q in range(Q)
                ]
            )
            msgs = gather_refs(shards, "gather_has_in")
            ray.get(
                [
                    shards[q].reduce_mis_exclude.remote(
                        *[msgs[p][q] for p in range(Q)]
                    )
                    for q in range(Q)
                ]
            )
            undecided = sum(
                ray.get([s.undecided_count.remote() for s in shards])
            )
            if undecided == 0:
                break
        remaining = sum(
            ray.get([s.color_commit.remote(c) for s in shards])
        )
        history.append(
            {
                "iteration": c,
                "uncolored": int(remaining),
                "algorithm": "coloring",
            }
        )
        if remaining == 0:
            converged = True
            break
    ray.get([s.finish_coloring.remote() for s in shards])

    return LabelResult(
        meta=meta,
        part_refs=[s.get_labels.remote() for s in shards],
        iterations=rounds,
        converged=converged,
        history=history,
    )


def greedy_coloring_oracle(
    edges: list[tuple[str, str]], name_to_vid: dict[str, int]
) -> dict[str, int]:
    """Exact single-process oracle: repeat sequential greedy MIS in
    increasing splitmix64(vid) priority on the residual graph; class
    ``c`` is round ``c``'s MIS."""
    from .sketch import splitmix64

    names = sorted(name_to_vid)
    vids = np.fromiter((name_to_vid[n] for n in names), np.int64, len(names))
    pri = splitmix64(vids)
    order = [names[i] for i in np.argsort(pri)]
    adj: dict[str, set] = {n: set() for n in names}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    colors: dict[str, int] = {}
    c = 0
    while len(colors) < len(names):
        blocked: set[str] = set()
        for n in order:
            if n in colors or n in blocked:
                continue
            colors[n] = c
            blocked |= adj[n]
        c += 1
    return colors


def greedy_coloring_named_oracle(
    edges: list[tuple[str, str]],
) -> dict[str, int]:
    """Exact single-process oracle for ``coloring(named_priority=True)``:
    repeat sequential greedy MIS in increasing splitmix64(int(name))
    order on the residual graph."""
    from .sketch import splitmix64

    names = sorted({x for e in edges for x in e})
    pri = splitmix64(np.array([int(n) for n in names], np.int64))
    order = [names[i] for i in np.argsort(pri)]
    adj: dict[str, set] = {n: set() for n in names}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    colors: dict[str, int] = {}
    c = 0
    while len(colors) < len(names):
        blocked: set[str] = set()
        for n in order:
            if n in colors or n in blocked:
                continue
            colors[n] = c
            blocked |= adj[n]
        c += 1
    return colors
