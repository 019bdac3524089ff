"""Deterministic distributed vertex-id assignment (SURVEY.md §2.2 M2).

The reference assigns dense ids in first-seen scan order via a
driver-side dict (/root/reference/pagerank.py:20,36-37,71-74) — an
artifact of the sequential scan, not load-bearing (only score-per-NAME
is checked).  Here ids are deterministic and shuffle-friendly:

    q   = stable_hash(name) % Q          (Q = number of id partitions)
    r   = rank of name within partition q, names sorted ascending
    vid = r * Q + q

Properties: collision-free, reproducible across runs/processes (polars
xxhash with a fixed seed — deterministic within the pinned polars
version; a version bump invalidates stored layouts, which is the same
contract any persisted hash-partitioned layout carries), and
``vid % Q == q`` / ``vid // Q == r`` — so hash-partitioning scores by
``vid % Q`` lands a vertex in the partition that assigned its id, with
a DENSE local index ``r``.  Every downstream stage (CSR shards, score
vectors, checkpoints) reuses this single partitioning; no global dense
id space is needed.

Sort-order note: ranks come from a polars (UTF-8 byte order) sort;
UTF-8 byte order equals code-point order, so it matches Python string
comparison — the rank is well-defined no matter which path sorts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import NUM_PARTITIONS_DEFAULT


def stable_hash(names) -> np.ndarray:
    """Deterministic uint64 hash of a string array (vectorized polars
    xxhash over the Arrow buffers; stable across processes within the
    pinned polars version — verified in-sandbox)."""
    from . import polars_mod

    pl = polars_mod()
    if isinstance(names, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(names)
    else:
        s = pl.Series(np.asarray(names, dtype=object))
    return s.hash(seed=0).to_numpy()


def distinct_names(edges: ray.data.Dataset) -> ray.data.Dataset:
    """src ∪ dst distinct (the reference's shared url_dict keyspace,
    pagerank.py:36-37, as a hash aggregate)."""
    src = edges.select_columns(["src_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )
    dst = edges.select_columns(["dst_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )

    # pre-dedup inside each batch before the wide distinct (combiner
    # pattern: shrinks the shuffle input)
    def local_dedup(t: pa.Table) -> pa.Table:
        return t.group_by("name").aggregate([])

    return (
        src.union(dst)
        .map_batches(local_dedup, batch_format="pyarrow")
        .groupby("name")
        .count()
        .select_columns(["name"])
    )


def assign_ids(
    names: ray.data.Dataset, num_partitions: int = NUM_PARTITIONS_DEFAULT
) -> ray.data.Dataset:
    """(vid, name, q) — deterministic ids per the module docstring.

    Input need NOT be distinct: all copies of a name hash to the same
    id partition, so the per-partition ranking deduplicates with a local
    ``unique`` — this removes the global distinct shuffle entirely (the
    widest step of the old build: 2·E name strings through a groupby).
    The per-partition rank group ≈ n/Q names — the same working-set
    bound every score partition obeys later, so if this fits,
    iterations fit.  All hashing/sorting is Arrow/polars-vectorized —
    no Python-object string paths (r1 VERDICT finding #1).
    """
    Q = num_partitions

    def add_q(t: pa.Table):
        if t.num_rows == 0 or "name" not in t.schema.names:
            return
        # map-side combine: local dedup shrinks the shuffle input
        uniq = pc.unique(t.column("name").combine_chunks())
        q = stable_hash(uniq) % np.uint64(Q)
        yield pa.table(
            {
                "name": uniq.cast(pa.string()),
                "q": pa.array(q.astype(np.int64)),
            }
        )

    with_q = names.map_batches(add_q, batch_format="pyarrow")

    # hash co-location by q (sort-free; see rayrank/shuffle.py), then a
    # polars per-q unique+sort inside each block — whole-block map, all
    # groups of one q are guaranteed complete within the block
    ds2 = with_q.repartition(Q, keys=["q"])

    def rank_block(t: pa.Table):
        if t.num_rows == 0 or "q" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t)
        for (qv,), g in df.group_by("q"):
            qv = int(qv)
            uniq = g["name"].unique().sort()
            n = len(uniq)
            yield pa.table(
                {
                    "vid": pa.array(np.arange(n, dtype=np.int64) * Q + qv),
                    "name": uniq.to_arrow().cast(pa.string()),
                    "q": pa.array(np.full(n, qv, np.int64)),
                }
            )

    return ds2.map_batches(rank_block, batch_size=None, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# edge encoding: names → vids
# ---------------------------------------------------------------------------

# broadcast the whole (name → vid) dictionary when the vertex count is
# at or below this; above it, fall back to the partitioned two-pass
# encode.  ~1e7 names ≈ 600 MB as a polars frame — comfortably inside a
# worker heap at the 128 GiB/node target, revisit for skinnier nodes.
BROADCAST_VERTEX_LIMIT = 10_000_000


def encode_edges(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
    n_vertices: int | None = None,
    vert_dir: str | None = None,
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Replace (src_name, dst_name) with (src, dst) int64 vids.
    ``keep_cols`` names extra edge columns carried through unchanged
    (per-edge attributes — e.g. the percolation tag overlay); both the
    broadcast and the partitioned path preserve them.

    The r1 implementation ran two string-keyed partitioned hash joins
    (56 s of the 83 s SF=0.1 pipeline — VERDICT finding #1).  The id
    scheme makes a join unnecessary: ``vid`` is a pure function of the
    vertex dictionary, so encoding is a dictionary LOOKUP:

      * broadcast path (default when the dictionary fits,
        ``n ≤ BROADCAST_VERTEX_LIMIT``): ship the (name, vid) table
        once via ``ray.put``; every batch does two vectorized polars
        joins against it.  Zero shuffles.
      * partitioned path (scale fallback): repartition the edge rows by
        ``q(src_name)``, join locally against that partition's slice of
        the dictionary, repeat for dst — two int-cheap shuffles, never
        more than n/Q dictionary rows per task.
    """
    import ray as _ray

    if (
        n_vertices is not None
        and n_vertices > BROADCAST_VERTEX_LIMIT
        and vert_dir is not None
    ):
        return _encode_edges_partitioned(
            edges, vert_dir, num_partitions, keep_cols
        )

    from . import polars_mod

    pl = polars_mod()

    # one driver-side pull of the dictionary (V rows — bounded by the
    # broadcast limit), shipped to the object store ONCE via ray.put.
    # Zero-row blocks out of a hash repartition are schema-less
    # (ray 2.49, see rayrank/shuffle.py) — skip them before concat.
    blocks = [
        b
        for b in _ray.get(vertices.to_arrow_refs())
        if b.num_rows and {"name", "vid"} <= set(b.schema.names)
    ]
    if blocks:
        vt = pa.concat_tables([b.select(["name", "vid"]) for b in blocks])
    else:
        vt = pa.table(
            {"name": pa.array([], pa.string()), "vid": pa.array([], pa.int64())}
        )
    dict_ref = _ray.put(pl.from_arrow(vt).rechunk())

    in_cols = ["src_name", "dst_name", *keep_cols]
    out_cols = ["src", "dst", *keep_cols]

    def lookup(t: pa.Table):
        if t.num_rows == 0:
            return
        from . import polars_mod

        pl = polars_mod()
        d = _ray.get(dict_ref)
        df = pl.from_arrow(t.select(in_cols))
        df = df.join(
            d.rename({"name": "src_name", "vid": "src"}),
            on="src_name", how="inner",
        ).join(
            d.rename({"name": "dst_name", "vid": "dst"}),
            on="dst_name", how="inner",
        )
        yield df.select(out_cols).to_arrow()

    return edges.map_batches(lookup, batch_format="pyarrow")


def _dict_slice(vert_dir: str, q: int):
    """Per-worker-process cached (name, vid) polars slice for id
    partition ``q`` (read from the hive-partitioned vertices layout)."""
    from . import polars_mod

    pl = polars_mod()

    cache = _dict_slice.__dict__.setdefault("cache", {})
    key = (vert_dir, q)
    if key not in cache:
        import os

        import pyarrow.parquet as pq

        d = os.path.join(vert_dir, f"q={q}")
        if os.path.isdir(d):
            t = pq.read_table(d, columns=["name", "vid"])
        else:
            t = pa.table({"name": pa.array([], pa.string()),
                          "vid": pa.array([], pa.int64())})
        if len(cache) >= 64:
            cache.clear()
        cache[key] = pl.from_arrow(t).rechunk()
    return cache[key]


def _encode_edges_partitioned(
    edges: ray.data.Dataset,
    vert_dir: str,
    num_partitions: int,
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Scale path: two hash-partitioned local-lookup passes (src then
    dst).  Each pass repartitions the edge rows by ``q(name)`` — the
    SAME hash that placed the name in its dictionary partition — so
    every block joins only against its own n/Q-row dictionary slice,
    read from the vertices parquet and cached per worker process.  No
    full-dictionary broadcast anywhere; shuffle payload is the edge
    rows themselves."""
    Q = num_partitions

    def one_pass(rows: ray.data.Dataset, col: str, out: str) -> ray.data.Dataset:
        def tag(t: pa.Table):
            if t.num_rows == 0 or col not in t.schema.names:
                return
            q = stable_hash(t.column(col).combine_chunks()) % np.uint64(Q)
            yield t.append_column("__q", pa.array(q.astype(np.int64)))

        tagged = rows.map_batches(tag, batch_format="pyarrow")

        def local_join(t: pa.Table):
            if t.num_rows == 0 or "__q" not in t.schema.names:
                return
            from . import polars_mod

            pl = polars_mod()
            df = pl.from_arrow(t)
            for (qv,), g in df.group_by("__q"):
                d = _dict_slice(vert_dir, int(qv)).rename(
                    {"name": col, "vid": out}
                )
                j = g.drop("__q").join(d, on=col, how="inner").drop(col)
                if len(j):
                    yield j.to_arrow()

        return tagged.repartition(Q, keys=["__q"]).map_batches(
            local_join, batch_size=None, batch_format="pyarrow"
        )

    e = one_pass(
        edges.select_columns(["src_name", "dst_name", *keep_cols]),
        "src_name", "src",
    )
    e = one_pass(e, "dst_name", "dst")
    return e.select_columns(["src", "dst", *keep_cols])
