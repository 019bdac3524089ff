"""Canonical undirected-edge block kernels (the r3 consolidation of
~22 per-query ``und_pre`` copies; r2 VERDICT next-round item #6).

Every graph query derives its undirected edge set from the raw
``(src, dst)`` stream the same way: drop self-loops, then block-local
distinct in one of two shapes —

* BOTH-DIRECTION rows ``(a, b)`` + ``(b, a)`` — for gather-style
  consumers that want each vertex to see its full neighborhood after
  one repartition by either endpoint;
* CANONICAL rows ``(u, v) = (min, max)`` — for pair-level consumers
  (edge censuses, supports, percolation) that want ONE row per
  undirected edge.

Block-local distinct is the map-side combine: the GLOBAL distinct (or
sum) happens at whatever keyed exchange the consumer already performs,
so these kernels never add a shuffle of their own.

String variants exist because several SQL oracles canonicalize on
VARCHAR names — lexicographic LEAST/GREATEST diverges from the integer
min/max (the ego_network_edges lesson: canonicalize AFTER casting to
string when the oracle compares names).

All kernels are generator UDFs for ``map_batches(batch_format=
"pyarrow")``: they yield nothing for empty/schema-less blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _src_dst(t: pa.Table):
    """(src, dst) numpy views with self-loops dropped, or (None, None)
    for empty/schema-less/self-loop-only blocks."""
    if len(t) == 0 or "src" not in t.schema.names:
        return None, None
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    if len(s) == 0:
        return None, None
    return s, d


def und_both(t: pa.Table):
    """Block-distinct both-direction rows (a, b) int64."""
    s, d = _src_dst(t)
    if s is None:
        return
    g = pa.table(
        {"a": pa.array(np.r_[s, d]), "b": pa.array(np.r_[d, s])}
    ).group_by(["a", "b"]).aggregate([])
    yield g.rename_columns(["a", "b"])


def und_both_one(t: pa.Table):
    """Both-direction rows (a, b, one=1) — for consumers whose global
    distinct happens via a (a, b)-keyed max over the constant."""
    s, d = _src_dst(t)
    if s is None:
        return
    g = (
        pa.table({"a": pa.array(np.r_[s, d]), "b": pa.array(np.r_[d, s])})
        .append_column("one", pa.array(np.ones(2 * len(s), np.int64)))
        .group_by(["a", "b"])
        .aggregate([("one", "max")])
    )
    yield g.rename_columns(["a", "b", "one"])


def und_both_names(t: pa.Table):
    """Both-direction rows with endpoints cast to STRING names (the
    graph-build ingestion shape: build_graph consumes name columns)."""
    s, d = _src_dst(t)
    if s is None:
        return
    sn = pc.cast(pa.array(s), pa.string())
    dn = pc.cast(pa.array(d), pa.string())
    g = (
        pa.table(
            {
                "a": pa.concat_arrays([sn, dn]),
                "b": pa.concat_arrays([dn, sn]),
            }
        )
        .group_by(["a", "b"])
        .aggregate([])
    )
    yield g.rename_columns(["a", "b"])


def und_both_names_mult(t: pa.Table):
    """Both-direction STRING-name rows with per-block multiplicity
    partial ``mult`` (the collapsed symmetric multigraph shape)."""
    s, d = _src_dst(t)
    if s is None:
        return
    sa = np.r_[s, d].astype("U")
    sb = np.r_[d, s].astype("U")
    g = (
        pa.table(
            {
                "a": pa.array(sa, pa.string()),
                "b": pa.array(sb, pa.string()),
                "mult": pa.array(np.ones(len(sa), np.int64)),
            }
        )
        .group_by(["a", "b"])
        .aggregate([("mult", "sum")])
    )
    yield g.rename_columns(["a", "b", "mult"])


def und_canon(t: pa.Table):
    """Block-distinct canonical rows (u, v) = (min, max) int64."""
    s, d = _src_dst(t)
    if s is None:
        return
    g = (
        pa.table(
            {"u": pa.array(np.minimum(s, d)), "v": pa.array(np.maximum(s, d))}
        )
        .group_by(["u", "v"])
        .aggregate([])
    )
    yield g.rename_columns(["u", "v"])


def und_canon_guard31(t: pa.Table):
    """Canonical rows with the percolation pair-key width guard: ids
    must fit 31 bits so u·2³¹+v packs into one int64 (raises — the
    no-silent-caps rule)."""
    s, d = _src_dst(t)
    if s is None:
        return
    u, v = np.minimum(s, d), np.maximum(s, d)
    if max(int(u.max()), int(v.max())) >= (1 << 31):
        raise ValueError("percolation pair key needs ids < 2^31")
    g = (
        pa.table({"u": pa.array(u), "v": pa.array(v)})
        .group_by(["u", "v"])
        .aggregate([])
    )
    yield g.rename_columns(["u", "v"])


def _und_canon_mult(t: pa.Table, name: str):
    s, d = _src_dst(t)
    if s is None:
        return
    g = (
        pa.table(
            {
                "u": pa.array(np.minimum(s, d)),
                "v": pa.array(np.maximum(s, d)),
                name: pa.array(np.ones(len(s), np.int64)),
            }
        )
        .group_by(["u", "v"])
        .aggregate([(name, "sum")])
    )
    yield g.rename_columns(["u", "v", name])


def und_canon_count(t: pa.Table):
    """Canonical rows with per-block multiplicity partial ``n`` (global
    multiplicity = keyed sum downstream)."""
    yield from _und_canon_mult(t, "n")


def und_canon_weight(t: pa.Table):
    """Same as :func:`und_canon_count` with the column named ``w``."""
    yield from _und_canon_mult(t, "w")


def und_canon_names(t: pa.Table):
    """Canonical rows on STRING names — lexicographic LEAST/GREATEST,
    matching SQL oracles that canonicalize VARCHAR (string order
    diverges from integer order; canonicalize AFTER the cast)."""
    s, d = _src_dst(t)
    if s is None:
        return
    sn = pc.cast(pa.array(s), pa.string())
    dn = pc.cast(pa.array(d), pa.string())
    g = (
        pa.table(
            {
                "a": pc.min_element_wise(sn, dn),
                "b": pc.max_element_wise(sn, dn),
            }
        )
        .group_by(["a", "b"])
        .aggregate([])
    )
    yield g.rename_columns(["a", "b"])
