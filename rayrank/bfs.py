"""Breadth-first search / hop distance from a seed set (SURVEY.md
§2.10 extension surface — third instance of the gather/reduce label
loop after connected components and label propagation).

Semantics: synchronous min-plus relaxation over the stored edge
direction — ``dist[v] ← min(dist[v], min over in-neighbors
(dist[u] + 1))`` per round, distances init 0 at seeds / INF_DIST
elsewhere, stop at zero changes (≤ diameter + 1 rounds).  On an
undirected graph layout (both directions present, as built by
``graph.derive_undirected``) this is exact undirected hop distance.

Scale shape: identical to connected components — distances live in
the actor-resident label partitions, one Q×Q map-side-combined
message exchange per round, scalars only on the driver.  Seed lookup
is a broadcast semi-filter over the vertex dictionary (seed sets are
small — a handful of crawl roots), never a shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .iterate import LabelResult, iterate_labels
from .shards import INF_DIST


def seed_locals(graph_dir: str, seed_names: list[str], Q: int) -> dict[int, np.ndarray]:
    """Map seed NAMES to per-partition local indices via a pruned,
    name-filtered read of the vertex dictionary (seed set broadcast
    into the filter; result is ≤ len(seed_names) rows)."""
    names = pa.array(sorted(set(seed_names)), pa.string())
    verts = ray.data.read_parquet(
        os.path.join(graph_dir, "vertices"), columns=["vid", "name"]
    )

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("name"), value_set=names))

    blocks = list(
        verts.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    hits = pa.concat_tables(
        blocks
        or [pa.table({"vid": pa.array([], pa.int64()), "name": pa.array([], pa.string())})]
    )
    vids = hits.column("vid").to_numpy(zero_copy_only=False)
    if len(vids) != len(names):
        missing = set(seed_names) - set(hits.column("name").to_pylist())
        raise ValueError(f"seed names not in vertex dictionary: {sorted(missing)}")
    out: dict[int, np.ndarray] = {}
    for q in range(Q):
        sel = vids[vids % Q == q]
        if len(sel):
            out[q] = (sel // Q).astype(np.int64)
    return out


def min_vertex_name(graph_dir: str) -> str:
    """Lexicographic minimum vertex name — per-block partial min (one
    row per block) folded on the driver; never materializes the
    dictionary."""
    verts = ray.data.read_parquet(
        os.path.join(graph_dir, "vertices"), columns=["name"]
    )

    def block_min(t: pa.Table):
        if t.num_rows == 0:
            return
        yield pa.table({"name": [pc.min(t.column("name")).as_py()]})

    parts = [
        r["name"]
        for r in verts.map_batches(block_min, batch_format="pyarrow").take_all()
    ]
    if not parts:
        raise ValueError(f"empty vertex dictionary in {graph_dir}")
    return min(parts)


def bfs(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
) -> LabelResult:
    """Hop distances from ``seed_names`` (labels = distances,
    INF_DIST where unreached)."""
    from .graph import GraphMeta
    from .shards import create_shards

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)
    locs = seed_locals(graph_dir, seed_names, meta.Q)

    def init(sh):
        empty = np.empty(0, np.int64)
        ray.get(
            [
                s.init_dists.remote(locs.get(q, empty))
                for q, s in enumerate(sh)
            ]
        )

    return iterate_labels(
        graph_dir,
        gather_method="gather_min",
        reduce_method="reduce_min_plus1",
        max_iterations=max_iterations,
        shards=shards,
        ckpt_dir=ckpt_dir,
        ckpt_interval=ckpt_interval,
        resume=resume,
        algo_name="bfs",
        init_fn=init,
    )


def reachable_depths(result: LabelResult, graph_dir: str) -> ray.data.Dataset:
    """(name, depth) for reached vertices only — unreached rows
    (INF_DIST) filtered block-wise, no driver materialization."""
    ds = result.labels_dataset(graph_dir)

    def fin(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.less(t.column("label"), pa.scalar(INF_DIST)))
        return pa.table(
            {"name": keep.column("name"), "depth": keep.column("label")}
        )

    return ds.map_batches(fin, batch_format="pyarrow")


def sssp(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
    shards: list | None = None,
    ckpt_dir: str | None = None,
    ckpt_interval: int = 1,
    resume: bool = False,
) -> LabelResult:
    """Single-source (or multi-seed) shortest-path distances with
    integer edge weights = collapsed multiplicities — synchronous
    Bellman-Ford on the same actor-resident label loop as BFS/CC
    (fourth instance of the gather/reduce pattern).  Converges in ≤
    (max hop count of any min-cost path) rounds; stop at zero changes.
    Labels = distances, INF_DIST where unreached."""
    from .graph import GraphMeta
    from .shards import create_shards

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)
    locs = seed_locals(graph_dir, seed_names, meta.Q)

    def init(sh):
        empty = np.empty(0, np.int64)
        ray.get(
            [
                s.init_dists.remote(locs.get(q, empty))
                for q, s in enumerate(sh)
            ]
        )

    return iterate_labels(
        graph_dir,
        gather_method="gather_min_plus_w",
        reduce_method="reduce_min",
        max_iterations=max_iterations,
        shards=shards,
        ckpt_dir=ckpt_dir,
        ckpt_interval=ckpt_interval,
        resume=resume,
        algo_name="sssp",
        init_fn=init,
    )


def reachable_dists(result: LabelResult, graph_dir: str) -> ray.data.Dataset:
    """(name, dist) for reached vertices only."""
    ds = result.labels_dataset(graph_dir)

    def fin(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.less(t.column("label"), pa.scalar(INF_DIST)))
        return pa.table(
            {"name": keep.column("name"), "dist": keep.column("label")}
        )

    return ds.map_batches(fin, batch_format="pyarrow")


def smallest_vertex_names(graph_dir: str, k: int) -> list[str]:
    """The k lexicographically-smallest vertex names — per-block
    partial top-k folded on the driver (O(blocks·k) rows), never
    materializing the dictionary.  Deterministic landmark seed set,
    mirrored by the oracle's ORDER BY name LIMIT k."""
    verts = ray.data.read_parquet(
        os.path.join(graph_dir, "vertices"), columns=["name"]
    )

    def block_topk(t: pa.Table):
        if t.num_rows == 0:
            return
        names = sorted(t.column("name").to_pylist())[:k]
        yield pa.table({"name": pa.array(names, pa.string())})

    parts = [
        r["name"]
        for r in verts.map_batches(
            block_topk, batch_format="pyarrow"
        ).take_all()
    ]
    if not parts:
        raise ValueError(f"empty vertex dictionary in {graph_dir}")
    return sorted(parts)[:k]


def _seed_locals_idx(
    graph_dir: str, seed_names: list[str], Q: int
) -> tuple[dict[int, tuple[np.ndarray, np.ndarray]], list[str]]:
    """Like seed_locals but keeps WHICH seed each local index is:
    q → (locals, seed_idx), seed_idx = rank in the sorted seed set."""
    ordered = sorted(set(seed_names))
    names = pa.array(ordered, pa.string())
    verts = ray.data.read_parquet(
        os.path.join(graph_dir, "vertices"), columns=["vid", "name"]
    )

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("name"), value_set=names))

    blocks = list(
        verts.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    hits = pa.concat_tables(
        blocks
        or [pa.table({"vid": pa.array([], pa.int64()), "name": pa.array([], pa.string())})]
    )
    vids = hits.column("vid").to_numpy(zero_copy_only=False)
    hnames = hits.column("name").to_pylist()
    if len(vids) != len(ordered):
        missing = set(ordered) - set(hnames)
        raise ValueError(f"seed names not in vertex dictionary: {sorted(missing)}")
    rank = {n: i for i, n in enumerate(ordered)}
    idx = np.fromiter((rank[n] for n in hnames), np.int64, len(hnames))
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for q in range(Q):
        sel = vids % Q == q
        if sel.any():
            out[q] = ((vids[sel] // Q).astype(np.int64), idx[sel])
    return out, ordered


def landmarks(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
    shards: list | None = None,
) -> tuple[LabelResult, list[str]]:
    """Nearest-landmark assignment: for every vertex, the hop distance
    to the closest seed and WHICH seed (min-dist ties → smallest seed
    rank).  ONE encoded int64 label per vertex regardless of seed
    count: label = dist·S + seed_idx, relaxed by min(+S) — the
    lexicographic (dist, seed) minimum rides the unchanged gather_min
    kernel, so K-landmark assignment costs exactly one BFS, not K."""
    from .graph import GraphMeta
    from .shards import create_shards

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)
    locs, ordered = _seed_locals_idx(graph_dir, seed_names, meta.Q)
    step = len(ordered)

    def init(sh):
        empty = np.empty(0, np.int64)
        ray.get(
            [
                s.init_landmarks.remote(*locs.get(q, (empty, empty)), step)
                for q, s in enumerate(sh)
            ]
        )

    res = iterate_labels(
        graph_dir,
        gather_method="gather_min",
        reduce_method="reduce_min_plus_s",
        max_iterations=max_iterations,
        shards=shards,
        algo_name="landmarks",
        init_fn=init,
    )
    return res, ordered


def landmark_table(
    result: LabelResult, graph_dir: str, ordered_seeds: list[str]
) -> ray.data.Dataset:
    """(name, dist, landmark) for reached vertices — encoded labels
    decoded block-wise (dist = label // S, landmark = seeds[label % S]);
    unreached rows filtered, no driver materialization."""
    ds = result.labels_dataset(graph_dir)
    step = len(ordered_seeds)
    seeds = np.asarray(ordered_seeds, dtype=object)

    def fin(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.less(t.column("label"), pa.scalar(INF_DIST)))
        lab = keep.column("label").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "name": keep.column("name"),
                "dist": pa.array(lab // step),
                "landmark": pa.array(seeds[lab % step], pa.string()),
            }
        )

    return ds.map_batches(fin, batch_format="pyarrow")
