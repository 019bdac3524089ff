"""Deterministic distributed vertex-id assignment (SURVEY.md §2.2 M2).

The reference assigns dense ids in first-seen scan order via a
driver-side dict (/root/reference/pagerank.py:20,36-37,71-74) — an
artifact of the sequential scan, not load-bearing (only score-per-NAME
is checked).  Here ids are deterministic and shuffle-friendly:

    q   = stable_hash(name) % Q          (Q = number of id partitions)
    r   = rank of name within partition q, names sorted ascending
    vid = r * Q + q

Properties: collision-free, reproducible across runs/processes
(pandas siphash with its fixed default key), and ``vid % Q == q`` /
``vid // Q == r`` — so hash-partitioning scores by ``vid % Q`` lands a
vertex in the partition that assigned its id, with a DENSE local index
``r``.  Every downstream stage (CSR shards, score vectors, checkpoints)
reuses this single partitioning; no global dense id space is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from . import NUM_PARTITIONS_DEFAULT


def stable_hash(names) -> np.ndarray:
    """Deterministic uint64 hash of a string array (vectorized siphash;
    stable across processes — verified in-sandbox)."""
    arr = np.asarray(names, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


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
    iterations fit.
    """
    Q = num_partitions

    def add_q(t: pa.Table):
        if t.num_rows == 0 or "name" not in t.schema.names:
            return
        # map-side combine: local dedup shrinks the shuffle input
        uniq = np.unique(np.asarray(t.column("name").to_pylist(), dtype=object))
        q = stable_hash(uniq) % Q
        yield pa.table(
            {
                "name": pa.array(uniq, pa.string()),
                "q": pa.array(q.astype(np.int64)),
            }
        )

    with_q = names.map_batches(add_q, batch_format="pyarrow")

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        q = int(g["q"].iloc[0])
        uniq = np.unique(g["name"].to_numpy())
        return pd.DataFrame(
            {
                "vid": np.arange(len(uniq), dtype=np.int64) * Q + q,
                "name": uniq,
                "q": np.full(len(uniq), q, np.int64),
            }
        )

    from .shuffle import grouped_map

    return grouped_map(with_q, ["q"], rank_group, num_partitions=Q)


def encode_edges(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """Replace (src_name, dst_name) with (src, dst) int64 vids via two
    partitioned hash joins (the scale path — no driver-side dict)."""
    from .joins import hash_join

    vsrc = vertices.select_columns(["vid", "name"]).map_batches(
        lambda t: t.rename_columns(["src", "sname"]), batch_format="pyarrow"
    )
    vdst = vertices.select_columns(["vid", "name"]).map_batches(
        lambda t: t.rename_columns(["dst", "dname"]), batch_format="pyarrow"
    )
    e = hash_join(
        edges, vsrc, on=("src_name",), right_on=("sname",),
        num_partitions=num_partitions,
    )
    e = hash_join(
        e, vdst, on=("dst_name",), right_on=("dname",),
        num_partitions=num_partitions,
    )
    return e.select_columns(["src", "dst"])
