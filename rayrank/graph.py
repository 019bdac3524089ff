"""Edge-table preparation and partitioned graph build (SURVEY.md §2.2
M3, §2.5 A1-A3, §2.4 J4).

Reference semantics reproduced (without the reference's sortedness
assumption or driver-side state):

  * duplicate edges are NOT dropped — they collapse to a multiplicity
    and the transition weight is ``P[s,t] = mult / outdeg(s)`` where
    ``outdeg`` counts duplicates (pagerank.py:50-67: run-length 1/outdeg
    weights + torch COO coalescing sums duplicates);
  * ``filter_ratio`` prunes edges whose target's raw in-degree ≥
    ratio·n, with n fixed BEFORE the prune (pagerank.py:42-47; n at :66
    is len(url_dict) which never shrinks) — pruned-to-isolation
    vertices stay in the vertex space as dangling/isolated nodes;
  * dangling = vertices with out-degree 0 in the (post-prune) edge set
    (pagerank.py:105-107: zero rows of P).

Physical layout: ONE partitioning decision is made here and reused by
every iterative stage — ids from :mod:`rayrank.ids` give
``part(vid) = vid % Q``; edges are written hive-partitioned by
``src % Q`` so shard ``p`` co-resides with score partition ``p``
(gather needs no shuffle; the only per-iteration wide step is the
contribution reduce keyed by ``dst``).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import NUM_PARTITIONS_DEFAULT
from .ids import assign_ids, distinct_names, encode_edges


@dataclass
class GraphMeta:
    n: int                      # vertex count (pre-prune keyspace)
    Q: int                      # id/score/edge partition count
    part_sizes: list[int]       # vertices per partition, len Q
    nnz: int                    # collapsed (src,dst) pairs after prune
    edge_multiplicity_total: int  # raw edge count after prune
    filter_ratio: float | None = None
    undirected: bool = False
    lineage: dict = field(default_factory=dict)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=1)

    @staticmethod
    def load(path: str) -> "GraphMeta":
        with open(path) as f:
            return GraphMeta(**json.load(f))


def collapse_multiplicity(
    edges: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(src, dst) → (src, dst, mult) hash aggregate."""
    g = edges.groupby(["src", "dst"], num_partitions=num_partitions).count()
    return g.map_batches(
        lambda t: t.rename_columns(["src", "dst", "mult"]), batch_format="pyarrow"
    )


def out_degrees(
    edges_mult: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(src, outdeg) counting duplicate multiplicity (A2)."""
    g = edges_mult.groupby("src", num_partitions=num_partitions).sum("mult")
    return g.map_batches(
        lambda t: t.rename_columns(["src", "outdeg"]), batch_format="pyarrow"
    )


def in_degrees(
    edges_mult: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(dst, indeg) counting duplicate multiplicity (A1)."""
    g = edges_mult.groupby("dst", num_partitions=num_partitions).sum("mult")
    return g.map_batches(
        lambda t: t.rename_columns(["dst", "indeg"]), batch_format="pyarrow"
    )


def hot_targets(edges_mult: ray.data.Dataset, threshold: float) -> list[int]:
    """dsts with raw in-degree ≥ threshold.  Small by construction
    (≤ total_edges/threshold vertices) → safe to collect & broadcast."""
    hot = in_degrees(edges_mult).filter(
        expr=f"indeg >= {threshold}"
    )
    return [r["dst"] for r in hot.take_all()]


def prune_filter_ratio(
    edges_mult: ray.data.Dataset, n: int, filter_ratio: float
) -> ray.data.Dataset:
    """Drop edges into heavy-hitter targets (J4: broadcast anti-join —
    the hot set is tiny, so it ships via ray.put, not a shuffle)."""
    threshold = filter_ratio * n
    hot = np.array(sorted(hot_targets(edges_mult, threshold)), dtype=np.int64)
    hot_ref = ray.put(hot)

    def drop_hot(t: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        if len(hot_arr) == 0:
            return t
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(hot_arr, dst)
        idx = np.minimum(idx, len(hot_arr) - 1)
        keep = hot_arr[idx] != dst
        return t.filter(pa.array(keep))

    return edges_mult.map_batches(drop_hot, batch_format="pyarrow")


def with_weights(
    edges_mult: ray.data.Dataset, num_partitions: int = NUM_PARTITIONS_DEFAULT
) -> ray.data.Dataset:
    """(src, dst, mult, w) with w = mult/outdeg(src) via a hash join
    keyed on src (M3 without the sorted-input assumption)."""
    from .joins import hash_join

    deg = out_degrees(edges_mult, num_partitions)
    joined = hash_join(
        edges_mult, deg, on=("src",), num_partitions=num_partitions
    )

    def weight(t: pa.Table) -> pa.Table:
        w = pc.divide(
            pc.cast(t.column("mult"), pa.float64()),
            pc.cast(t.column("outdeg"), pa.float64()),
        )
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "mult": t.column("mult"),
                "w": w,
            }
        )

    return joined.map_batches(weight, batch_format="pyarrow")


@ray.remote
def _file_totals(path: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["mult"])
    s = pc.sum(t.column("mult")).as_py()
    return len(t), int(s or 0)


def _edge_totals(edges_dir: str) -> dict:
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(edges_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    parts = ray.get([_file_totals.remote(p) for p in files])
    return {
        "nnz": sum(p[0] for p in parts),
        "mult": sum(p[1] for p in parts),
    }


def _vertex_part_sizes(vert_dir: str, Q: int) -> list[int]:
    """Per-partition vertex counts from the hive layout's parquet
    footers (no extra shuffle)."""
    import pyarrow.parquet as pq

    sizes = [0] * Q
    for q in range(Q):
        d = os.path.join(vert_dir, f"q={q}")
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                sizes[q] += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
    return sizes


def _local_collapse(Q: int, with_weights_: bool):
    """Whole-block collapse (+weights): after the edge rows are
    hash-partitioned by ``part = src % Q``, EVERY edge of a given src is
    in the same block, so multiplicity, out-degree and w = mult/outdeg
    are all block-local polars aggregations — no global groupby, no
    weight join (r1 spent 56 s of the 83 s SF=0.1 pipeline on these
    wide steps; VERDICT finding #1)."""

    def fn(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t.select(["src", "dst"]))
        g = df.group_by(["src", "dst"]).agg(
            pl.len().cast(pl.Int64).alias("mult")
        )
        if with_weights_:
            g = g.with_columns(
                (
                    pl.col("mult").cast(pl.Float64)
                    / pl.col("mult").sum().over("src").cast(pl.Float64)
                ).alias("w")
            )
        g = g.with_columns((pl.col("src") % Q).alias("part"))
        yield g.to_arrow()

    return fn


def _local_weights(Q: int):
    """Weights over an already-collapsed, part-co-located block (the
    prune path: collapse first, drop hot targets, THEN weight so outdeg
    reflects the post-prune edge set — reference pagerank.py:42-67)."""

    def fn(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t.select(["src", "dst", "mult"]))
        g = df.with_columns(
            (
                pl.col("mult").cast(pl.Float64)
                / pl.col("mult").sum().over("src").cast(pl.Float64)
            ).alias("w"),
            (pl.col("src") % Q).alias("part"),
        )
        yield g.to_arrow()

    return fn


def build_graph(
    edges_named: ray.data.Dataset,
    out_dir: str,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
    filter_ratio: float | None = None,
    undirected: bool = False,
    join_partitions: int | None = None,
) -> GraphMeta:
    """Full graph build: names → ids → dictionary-lookup encode → ONE
    hash repartition by ``part = src % Q`` → block-local multiplicity /
    (optional prune) / weights → hive-partitioned Parquet layout:

        out_dir/meta.json
        out_dir/vertices/q={q}/*.parquet      (vid, name)
        out_dir/edges/part={src % Q}/*.parquet (src, dst, mult, w)

    ``edges_named`` needs columns ``src_name, dst_name``.  When
    ``undirected=True`` the reverse edges are added (in cheap int space,
    post-encode) before the collapse; self-loops are dropped there
    (FIXTURES.md §1 LP rule) while their endpoints stay in the vertex
    set.

    ``join_partitions`` (default Q) sets the task parallelism of the
    build-time shuffles independently of the id partition count Q —
    explicit and input-derived so the job shape is identical at every
    cluster size (scaling-evidence requirement).
    """
    Q = num_partitions
    JP = join_partitions or Q
    os.makedirs(out_dir, exist_ok=True)

    edges_named = edges_named.select_columns(["src_name", "dst_name"])
    # materialize once: the edge stream is consumed by BOTH the vertex
    # derivation and the id encode; without this the whole upstream
    # (corpus parse, import-resolution join, …) re-executes per
    # consumer.  The object store spills to disk under memory pressure,
    # which is exactly the behavior wanted at scale.
    edges_named = edges_named.materialize()

    # both endpoint columns as one (non-distinct) name stream;
    # assign_ids dedups inside each id partition (no global distinct).
    # For undirected builds the endpoint SET is direction-invariant, so
    # no name-level reversal is needed before id assignment.
    def endpoints(t: pa.Table):
        if t.num_rows == 0:
            return
        c1 = t.column("src_name").cast(pa.string())
        c2 = t.column("dst_name").cast(pa.string())
        yield pa.table(
            {"name": pa.chunked_array(list(c1.chunks) + list(c2.chunks))}
        )

    names = edges_named.map_batches(endpoints, batch_format="pyarrow")
    vertices = assign_ids(names, Q)
    vertices = vertices.materialize()  # small (V rows), reused
    vert_dir = os.path.join(out_dir, "vertices")
    vertices.write_parquet(vert_dir, partition_cols=["q"])
    part_sizes = _vertex_part_sizes(vert_dir, Q)
    n = sum(part_sizes)

    edges = encode_edges(
        edges_named, vertices, JP, n_vertices=n, vert_dir=vert_dir
    )
    if undirected:
        # reverse + drop self-loops in int space (encode is injective,
        # so src != dst ⟺ src_name != dst_name); self-loop endpoints
        # stay in the vertex set (ids came from unfiltered endpoints)
        def both_dirs(t: pa.Table):
            if t.num_rows == 0 or "src" not in t.schema.names:
                return
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            keep = s != d
            s, d = s[keep], d[keep]
            yield pa.table(
                {
                    "src": pa.array(np.concatenate([s, d]), pa.int64()),
                    "dst": pa.array(np.concatenate([d, s]), pa.int64()),
                }
            )

        edges = edges.map_batches(both_dirs, batch_format="pyarrow")

    def add_part(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        src = t.column("src").to_numpy(zero_copy_only=False)
        yield t.append_column("part", pa.array(src % Q, type=pa.int64()))

    parted = edges.map_batches(add_part, batch_format="pyarrow").repartition(
        Q, keys=["part"]
    )
    edges_dir = os.path.join(out_dir, "edges")
    if filter_ratio is None:
        edges_w = parted.map_batches(
            _local_collapse(Q, with_weights_=True),
            batch_size=None, batch_format="pyarrow",
        )
    else:
        collapsed = parted.map_batches(
            _local_collapse(Q, with_weights_=False),
            batch_size=None, batch_format="pyarrow",
        ).materialize()
        pruned = prune_filter_ratio(collapsed, n, filter_ratio)
        edges_w = pruned.map_batches(
            _local_weights(Q), batch_size=None, batch_format="pyarrow"
        )
    edges_w.write_parquet(edges_dir, partition_cols=["part"])

    # edge totals from the files just written (parquet footers + one
    # column scan in parallel tasks) — re-running the lazy edges_mult
    # pipeline here would re-execute every upstream join/groupby
    totals = _edge_totals(edges_dir)

    meta = GraphMeta(
        n=n,
        Q=Q,
        part_sizes=part_sizes,
        nnz=totals["nnz"],
        edge_multiplicity_total=totals["mult"],
        filter_ratio=filter_ratio,
        undirected=undirected,
        lineage={
            "edges_dir": edges_dir,
            "vertices_dir": vert_dir,
            "edge_files": sorted(
                os.path.relpath(os.path.join(dp, f), out_dir)
                for dp, _, fs in os.walk(edges_dir)
                for f in fs
            ),
        },
    )
    meta.save(os.path.join(out_dir, "meta.json"))
    return meta


def derive_undirected(
    src_graph_dir: str, out_dir: str, join_partitions: int | None = None
) -> GraphMeta:
    """Undirected layout derived from an existing (unpruned) directed
    build: same vertices/ids (hard-linked/copied), edges = directed ∪
    reversed, self-loops dropped, multiplicities summed, weights
    recomputed.  Skips id assignment and both encode joins — the
    undirected view costs one collapse + one weight join."""
    import shutil

    src_meta = GraphMeta.load(os.path.join(src_graph_dir, "meta.json"))
    assert src_meta.filter_ratio is None, "derive from an unpruned build"
    Q = src_meta.Q
    JP = join_partitions or Q
    os.makedirs(out_dir, exist_ok=True)
    vert_src = os.path.join(src_graph_dir, "vertices")
    vert_dst = os.path.join(out_dir, "vertices")
    if not os.path.isdir(vert_dst):
        shutil.copytree(vert_src, vert_dst)

    e = load_edges(src_graph_dir).select_columns(["src", "dst", "mult"])

    def both_dirs(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = t.column("mult").to_numpy(zero_copy_only=False)
        keep = s != d  # self-loops dropped (FIXTURES §1 LP rule)
        s, d, m = s[keep], d[keep], m[keep]
        src2 = np.concatenate([s, d])
        yield pa.table(
            {
                "src": pa.array(src2, pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
                "mult": pa.array(np.concatenate([m, m]), pa.int64()),
                "part": pa.array(src2 % Q, pa.int64()),
            }
        )

    # ONE repartition by part = src % Q, then block-local collapse +
    # weights (same shape as build_graph — see _local_collapse)
    def local_sum_weights(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t.select(["src", "dst", "mult"]))
        g = df.group_by(["src", "dst"]).agg(pl.col("mult").sum())
        g = g.with_columns(
            (
                pl.col("mult").cast(pl.Float64)
                / pl.col("mult").sum().over("src").cast(pl.Float64)
            ).alias("w"),
            (pl.col("src") % Q).alias("part"),
        )
        yield g.to_arrow()

    und = e.map_batches(both_dirs, batch_format="pyarrow").repartition(
        Q, keys=["part"]
    )
    edges_w = und.map_batches(
        local_sum_weights, batch_size=None, batch_format="pyarrow"
    )
    edges_dir = os.path.join(out_dir, "edges")
    edges_w.write_parquet(edges_dir, partition_cols=["part"])
    totals = _edge_totals(edges_dir)
    meta = GraphMeta(
        n=src_meta.n,
        Q=Q,
        part_sizes=src_meta.part_sizes,
        nnz=totals["nnz"],
        edge_multiplicity_total=totals["mult"],
        filter_ratio=None,
        undirected=True,
        lineage={
            "edges_dir": edges_dir,
            "vertices_dir": vert_dst,
            "derived_from": src_graph_dir,
        },
    )
    meta.save(os.path.join(out_dir, "meta.json"))
    return meta


def derive_reversed(
    src_graph_dir: str, out_dir: str
) -> GraphMeta:
    """Reversed layout derived from an existing directed build: same
    vertices/ids (copied), every edge src→dst becomes dst→src with its
    multiplicity kept (pairs stay unique, so no re-collapse), weights
    recomputed for the new source.  Used by HITS, whose hub update
    h = A·a gathers along reversed edges (rayrank.hits)."""
    import shutil

    src_meta = GraphMeta.load(os.path.join(src_graph_dir, "meta.json"))
    assert src_meta.filter_ratio is None, "derive from an unpruned build"
    Q = src_meta.Q
    os.makedirs(out_dir, exist_ok=True)
    vert_src = os.path.join(src_graph_dir, "vertices")
    vert_dst = os.path.join(out_dir, "vertices")
    if not os.path.isdir(vert_dst):
        shutil.copytree(vert_src, vert_dst)

    e = load_edges(src_graph_dir).select_columns(["src", "dst", "mult"])

    def swap(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        d = t.column("dst").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "src": t.column("dst"),
                "dst": t.column("src"),
                "mult": t.column("mult"),
                "part": pa.array(d % Q, pa.int64()),
            }
        )

    def local_weights(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t.select(["src", "dst", "mult"]))
        # all edges of one src co-reside after the keyed repartition,
        # so the per-src outdeg normalizer is block-local
        g = df.with_columns(
            (
                pl.col("mult").cast(pl.Float64)
                / pl.col("mult").sum().over("src").cast(pl.Float64)
            ).alias("w"),
            (pl.col("src") % Q).alias("part"),
        )
        yield g.to_arrow()

    rev = e.map_batches(swap, batch_format="pyarrow").repartition(
        Q, keys=["part"]
    )
    edges_w = rev.map_batches(
        local_weights, batch_size=None, batch_format="pyarrow"
    )
    edges_dir = os.path.join(out_dir, "edges")
    edges_w.write_parquet(edges_dir, partition_cols=["part"])
    totals = _edge_totals(edges_dir)
    meta = GraphMeta(
        n=src_meta.n,
        Q=Q,
        part_sizes=src_meta.part_sizes,
        nnz=totals["nnz"],
        edge_multiplicity_total=totals["mult"],
        filter_ratio=None,
        undirected=False,
        lineage={
            "edges_dir": edges_dir,
            "vertices_dir": vert_dst,
            "derived_from": src_graph_dir,
            "reversed": True,
        },
    )
    meta.save(os.path.join(out_dir, "meta.json"))
    return meta


def load_vertices(graph_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(graph_dir, "vertices"))


def load_edges(graph_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(graph_dir, "edges"))
