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


def _sigma_pass(graph_dir: str, seed_names: list[str], max_iterations: int):
    """BFS to fixpoint + layer-synchronous σ rounds (the Brandes
    forward pass) on fresh resident shards; returns (shards, Q, depth)
    with (layer, σ) state resident for a result zip or the backward
    pass."""
    from .graph import GraphMeta
    from .shards import create_shards, gather_refs, reach_stats_part

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    shards = create_shards(graph_dir, meta)
    res = bfs(graph_dir, seed_names, max_iterations=max_iterations, shards=shards)
    stats = ray.get([reach_stats_part.remote(r) for r in res.part_refs])
    depth = max(s[2] for s in stats)

    locs = seed_locals(graph_dir, seed_names, meta.Q)
    empty = np.empty(0, np.int64)
    ray.get(
        [
            s.init_path_counts.remote(locs.get(q, empty))
            for q, s in enumerate(shards)
        ]
    )
    Q = meta.Q
    for t in range(1, depth + 1):
        ray.get([s.set_path_round.remote(t) for s in shards])
        msgs = gather_refs(shards, "gather_paths")
        ray.get(
            [
                shards[p].reduce_paths.remote(*[msgs[q][p] for q in range(Q)])
                for p in range(Q)
            ]
        )
    return shards, Q, depth


def shortest_path_counts(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
) -> ray.data.Dataset:
    """(name, dist, paths) — σ(v), the number of distinct shortest
    paths from the seed set to every reached vertex (the forward pass
    of Brandes' betweenness algorithm).  BFS to fixpoint first (exact
    layers resident on the shards), then one layer-synchronous σ round
    per BFS level: gather = per-destination Σσ over sources one hop
    closer (the unchanged CSR message plumbing), reduce assigns the
    layer.  Counting WALKS of minimal length equals counting paths, so
    the SQL oracle's layered recursion (extend only dist→dist+1 edges)
    matches exactly.  Driver sees only scalars; the (dist, σ) result
    zips names co-resident per partition."""
    from .shards import zip_path_counts

    shards, Q, _ = _sigma_pass(graph_dir, seed_names, max_iterations)
    vert_dir = os.path.join(graph_dir, "vertices")
    refs = [
        zip_path_counts.remote(vert_dir, q, Q, s.get_path_state.remote())
        for q, s in enumerate(shards)
    ]
    return ray.data.from_arrow_refs(refs)


def betweenness_contrib(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
) -> ray.data.Dataset:
    """(name, dependency) — single-source Brandes dependency δ(v) =
    Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w)): the per-source summand of
    betweenness centrality (betweenness = Σ over sources of δ, seeds
    excluded by convention — δ(seed) reported as accumulated, callers
    drop it).  Backward layer-synchronous rounds over the SAME
    resident (layer, σ) state as the forward pass: gather ships
    (1 + δ(w))/σ(w) from layer-t vertices, reduce applies the
    resident σ(v) at layer t−1.  Float payloads — no SQL oracle (sum
    order); exact vs a python Brandes mirror in pytest."""
    from .shards import gather_refs, zip_delta

    shards, Q, depth = _sigma_pass(graph_dir, seed_names, max_iterations)
    ray.get([s.init_betweenness.remote() for s in shards])
    for t in range(depth, 0, -1):
        ray.get([s.set_path_round.remote(t) for s in shards])
        msgs = gather_refs(shards, "gather_delta")
        ray.get(
            [
                shards[p].reduce_delta.remote(*[msgs[q][p] for q in range(Q)])
                for p in range(Q)
            ]
        )
    vert_dir = os.path.join(graph_dir, "vertices")
    refs = [
        zip_delta.remote(vert_dir, q, s.get_betweenness_state.remote())
        for q, s in enumerate(shards)
    ]
    return ray.data.from_arrow_refs(refs)


def seed_closeness(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
    shards: list | None = None,
) -> pa.Table:
    """Closeness centrality of each seed: one BFS per seed over the
    SAME resident shard actors (created once, re-initialised per run —
    the bench shard-reuse pattern), per-seed (reached, Σdist) folded
    from per-partition scalar partials (shards.reach_stats_part), so
    the driver never holds a distance vector.  K seeds cost K·diameter
    rounds of the unchanged gather_min kernel — no new shuffle shape.

    Exactness: n_reached (incl. the seed at dist 0) and total_dist are
    exact int64; closeness = (n_reached − 1) / total_dist is ONE
    float64 division of two exact integers, so the SQL oracle computes
    the bit-identical double.  Assumes every seed has ≥ 1 finite-dist
    neighbor (true for any vertex drawn from an edge list)."""
    from .graph import GraphMeta
    from .shards import create_shards, reach_stats_part

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)
    seeds, ns, tots = sorted(set(seed_names)), [], []
    for s in seeds:
        res = bfs(graph_dir, [s], max_iterations=max_iterations, shards=shards)
        parts = ray.get(
            [reach_stats_part.remote(ref) for ref in res.part_refs]
        )
        ns.append(sum(p[0] for p in parts))
        tots.append(sum(p[1] for p in parts))
    return pa.table(
        {
            "seed": pa.array(seeds, pa.string()),
            "n_reached": pa.array(ns, pa.int64()),
            "total_dist": pa.array(tots, pa.int64()),
            "closeness": pa.array(
                [float(n - 1) / float(t) for n, t in zip(ns, tots)],
                pa.float64(),
            ),
        }
    )


# Fixed-point scale for exact harmonic sums: reciprocals are floored
# integer quanta 2^40 // d, summed in exact integer arithmetic, with a
# SINGLE float64 division at the end — the repo's standard trick for
# hash-matching a distributed sum against DuckDB (CLAUDE.md third
# sitting).  cnt·(2^40//d) ≤ V·2^40 stays well under int64 for any
# vertex count below ~8M per distance; the SQL side sums in HUGEINT
# and the final CAST to BIGINT would error (not wrap) beyond that.
HARMONIC_SCALE = 1 << 40


def _seed_distance_hists(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
    shards: list | None = None,
) -> dict[str, dict[int, int]]:
    """One BFS per seed over SHARED resident shard actors; each seed's
    finite-distance histogram folds from Q diameter-bounded
    per-partition partials (shards.dist_hist_part) — the driver holds
    O(seeds · diameter) integers, never a distance vector."""
    from .graph import GraphMeta
    from .shards import create_shards, dist_hist_part

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)
    out: dict[str, dict[int, int]] = {}
    for s in sorted(set(seed_names)):
        res = bfs(graph_dir, [s], max_iterations=max_iterations, shards=shards)
        acc: dict[int, int] = {}
        for dd, cc in ray.get(
            [dist_hist_part.remote(ref) for ref in res.part_refs]
        ):
            for d, c in zip(dd.tolist(), cc.tolist()):
                acc[d] = acc.get(d, 0) + c
        out[s] = acc
    return out


def seed_harmonic(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
    shards: list | None = None,
) -> pa.Table:
    """Harmonic centrality of each seed: Σ_{d(v)≥1} 1/d(v) over the
    reached vertices.  Reciprocals are quantized to 2^40//d (floor
    division — identical in numpy/Python and DuckDB `//`), summed as
    exact integers (`harmonic_q`), and converted to float64 with ONE
    division by 2^40, so the oracle computes the bit-identical double.
    Reuses the seed-BFS + histogram-fold machinery; no new shuffle."""
    hists = _seed_distance_hists(graph_dir, seed_names, max_iterations, shards)
    seeds = sorted(hists)
    hq = [
        sum(c * (HARMONIC_SCALE // d) for d, c in hists[s].items() if d > 0)
        for s in seeds
    ]
    return pa.table(
        {
            "seed": pa.array(seeds, pa.string()),
            "n_reached": pa.array(
                [sum(hists[s].values()) for s in seeds], pa.int64()
            ),
            "max_dist": pa.array(
                [max(hists[s]) for s in seeds], pa.int64()
            ),
            "harmonic_q": pa.array(hq, pa.int64()),
            "harmonic": pa.array(
                [float(q) / float(HARMONIC_SCALE) for q in hq], pa.float64()
            ),
        }
    )


def seed_distance_histogram(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 200,
    shards: list | None = None,
) -> pa.Table:
    """(seed, d, cnt) finite-distance distribution of each seed's BFS
    — the per-seed neighborhood-function exact counterpart of
    hyperanf_nf, and the raw input for effective-diameter estimates.
    Pure integers; folded from per-partition histogram partials."""
    hists = _seed_distance_hists(graph_dir, seed_names, max_iterations, shards)
    seeds, ds, cs = [], [], []
    for s in sorted(hists):
        for d in sorted(hists[s]):
            seeds.append(s)
            ds.append(d)
            cs.append(hists[s][d])
    return pa.table(
        {
            "seed": pa.array(seeds, pa.string()),
            "d": pa.array(ds, pa.int64()),
            "cnt": pa.array(cs, pa.int64()),
        }
    )


def _farthest(result: LabelResult, graph_dir: str) -> tuple[str, int]:
    """(name, dist) of the farthest reached vertex — max finite dist,
    lexicographically-min name on ties; Q scalar pairs folded on the
    driver (shards.far_vertex_part does the per-partition pick)."""
    from .shards import far_vertex_part

    vert_dir = os.path.join(graph_dir, "vertices")
    parts = ray.get(
        [
            far_vertex_part.remote(vert_dir, q, ref)
            for q, ref in enumerate(result.part_refs)
        ]
    )
    dmax = max(d for d, _ in parts)
    if dmax < 0:
        raise ValueError("BFS reached no vertex")
    return min(n for d, n in parts if d == dmax), dmax


def diameter_sweep(
    graph_dir: str,
    max_iterations: int = 200,
    shards: list | None = None,
) -> pa.Table:
    """Double-sweep diameter lower bound: BFS from the min-name vertex,
    hop to its farthest vertex (ties → min name), BFS again — the
    second eccentricity is the classic double-sweep bound (exact on
    trees, ≥ diameter/2 always).  Two BFS runs on shared resident
    shards; only (name, dist) scalar pairs reach the driver.  One row:
    (start, far1, ecc_start, far2, diameter_lb)."""
    from .graph import GraphMeta
    from .shards import create_shards

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if shards is None:
        shards = create_shards(graph_dir, meta)
    start = min_vertex_name(graph_dir)
    r1 = bfs(graph_dir, [start], max_iterations=max_iterations, shards=shards)
    far1, ecc1 = _farthest(r1, graph_dir)
    r2 = bfs(graph_dir, [far1], max_iterations=max_iterations, shards=shards)
    far2, ecc2 = _farthest(r2, graph_dir)
    return pa.table(
        {
            "start": pa.array([start], pa.string()),
            "far1": pa.array([far1], pa.string()),
            "ecc_start": pa.array([ecc1], pa.int64()),
            "far2": pa.array([far2], pa.string()),
            "diameter_lb": pa.array([ecc2], pa.int64()),
        }
    )


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


def dag_longest(
    graph_dir: str,
    max_iterations: int = 200,
    shards: list | None = None,
) -> LabelResult:
    """Longest-path (critical-path) length ending at each vertex of a
    DAG layout — max-plus relaxation ``L[v] ← max(L[v], max over
    in-neighbors (L[u] + 1))`` from all-zero labels, stop at zero
    changes (≤ longest-chain rounds; diverges by construction on a
    cycle, so callers must hand an acyclically-oriented graph).
    Seventh instance of the actor-resident gather/reduce label loop
    (gather_max / reduce_max_plus1)."""

    def init(sh):
        ray.get([s.init_zero_labels.remote() for s in sh])

    return iterate_labels(
        graph_dir,
        gather_method="gather_max",
        reduce_method="reduce_max_plus1",
        max_iterations=max_iterations,
        shards=shards,
        algo_name="dag_longest_path",
        init_fn=init,
    )


def widest_paths(
    graph_dir: str,
    seed_names: list[str],
    max_iterations: int = 64,
    shards: list | None = None,
) -> LabelResult:
    """Widest (maximum-bottleneck) path capacities from the seed set:
    synchronous max-min relaxation ``W[v] ← max(W[v], max_in-nbr
    min(W[u], w(u,v)))`` with integer weights = collapsed edge
    multiplicities — the max-min semiring on the same actor-resident
    label loop as BFS/SSSP (seventh gather/reduce instance).
    Monotone and bounded, so it converges; seeds hold WIDEST_SEED,
    unreached vertices 0."""
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
                s.init_widest.remote(locs.get(q, empty))
                for q, s in enumerate(sh)
            ]
        )

    return iterate_labels(
        graph_dir,
        gather_method="gather_maxmin_w",
        reduce_method="reduce_max",
        max_iterations=max_iterations,
        shards=shards,
        algo_name="widest",
        init_fn=init,
    )
