"""Weisfeiler–Leman color refinement — canonical vertex signatures.

WL refinement is the standard graph-canonicalization / GNN-expressivity
primitive: every vertex starts with a constant color and each round
re-colors it by (own color, multiset of neighbor colors).  Two vertices
with different WL colors after r rounds are provably non-isomorphic in
their r-hop neighborhoods — the signature a 100-TB entity-resolution or
graph-dedup pass keys on.

Hash rule (pinned, shared with the SQL oracle):

    g(l)  = splitmix64(l) mod 2^40
    msg(v)= Σ_{u ∈ N(v)} g(l(u))          (simple undirected graph)
    l'(v) = splitmix64( g(l(v)) + msg(v) ) mod 2^40

The neighbor fold is a SUM of 40-bit hashes — commutative and
order-free, so a distributed keyed sum reproduces the multiset hash
exactly (no sorted-multiset materialization).  Messages stay exact in
int64 while max-degree < 2^23 (the sum never wraps); the 2^40 color
space makes cross-round collisions ~2^-40 per pair.  ``WL_ROUNDS`` is
pinned so the unrolled DuckDB oracle and the Ray loop run the identical
recurrence.

Scale shape: each round is ONE hash join (colors → edge sources) + ONE
keyed sum (messages by destination) + ONE left join (fold own color) —
the Katz dataset-iteration shape; rounds are lineage-cut
(shuffle.materialize_cut) because the round body references the
previous colors twice (message join + own-color fold), the Ray 2.49
2^rounds-plan pathology.

Reference parity: the reference engine has no WL op; this extends the
SURVEY §2.11 iterative-graph family (reference pagerank.py:60-116 is
the per-round gather/fold template this mirrors).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

WL_ROUNDS = 3
WL_MOD = np.uint64(1 << 40)
P = 8  # hash-partition count at testdata scale (pipelines.P)


def _und_edges(t: pa.Table):
    """Both-direction (a, b) string pairs, self-loops dropped,
    block-local dedup (global dedup happens in the keyed_reagg)."""
    if len(t) == 0:
        return
    s = pc.cast(t.column("l_orderkey"), pa.string()).combine_chunks()
    d = pc.cast(t.column("l_partkey"), pa.string()).combine_chunks()
    tt = pa.table(
        {
            "a": pa.concat_arrays([s, d]),
            "b": pa.concat_arrays([d, s]),
        }
    )
    tt = tt.filter(pc.invert(pc.equal(tt.column("a"), tt.column("b"))))
    if tt.num_rows == 0:
        return
    g = tt.group_by(["a", "b"]).aggregate([])
    yield g.rename_columns(["a", "b"])


def _vset(t: pa.Table):
    """Distinct endpoint names (BEFORE the self-loop filter, so a
    self-loop-only vertex still exists and keeps msg = 0)."""
    if len(t) == 0:
        return
    s = pc.cast(t.column("l_orderkey"), pa.string()).combine_chunks()
    d = pc.cast(t.column("l_partkey"), pa.string()).combine_chunks()
    g = (
        pa.table({"v": pa.concat_arrays([s, d])})
        .group_by(["v"])
        .aggregate([])
    )
    yield g.rename_columns(["v"])


def wl_refinement(sf_dir: str) -> ray.data.Dataset:
    """(name, wl_color) — ``WL_ROUNDS`` rounds of WL color refinement
    on the undirected simple order↔part lineitem graph (shared string
    namespace, the connected_components convention)."""
    from .joins import join_auto
    from .shuffle import keyed_reagg, materialize_cut
    from .sketch import splitmix64

    src = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    edges = materialize_cut(
        keyed_reagg(
            src.map_batches(_und_edges, batch_format="pyarrow"),
            ["a", "b"], [], P,
        )
    )
    verts = keyed_reagg(
        src.map_batches(_vset, batch_format="pyarrow"), ["v"], [], P
    )

    def init(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        yield pa.table(
            {"v": t.column("v"), "l": pa.array(np.ones(len(t), np.int64))}
        )

    labels = materialize_cut(verts.map_batches(init, batch_format="pyarrow"))

    def ghash(t: pa.Table):
        if t.num_rows == 0 or "l" not in t.schema.names:
            return
        lv = t.column("l").to_numpy(zero_copy_only=False)
        g = (splitmix64(lv) % WL_MOD).astype(np.int64)
        yield pa.table({"v": t.column("v"), "g": pa.array(g)})

    def pmsg(t: pa.Table):
        if t.num_rows == 0 or "b" not in t.schema.names:
            return
        g = t.select(["b", "g"]).group_by(["b"]).aggregate([("g", "sum")])
        yield g.rename_columns(["mv", "m"])

    def comb(t: pa.Table):
        if t.num_rows == 0 or "l" not in t.schema.names:
            return
        lv = t.column("l").to_numpy(zero_copy_only=False)
        if "m" in t.schema.names:
            m = pc.coalesce(
                t.column("m"), pa.scalar(0, pa.int64())
            ).to_numpy(zero_copy_only=False)
        else:  # broadcast-join empty-right path: no matches at all
            m = np.zeros(len(t), np.int64)
        x = (splitmix64(lv) % WL_MOD) + m.view(np.uint64)
        l2 = (splitmix64(x) % WL_MOD).astype(np.int64)
        yield pa.table({"v": t.column("v"), "l": pa.array(l2)})

    for _ in range(WL_ROUNDS):
        gtab = labels.map_batches(ghash, batch_format="pyarrow")
        j = join_auto(edges, gtab, on=("a",), right_on=("v",),
                      num_partitions=P)
        msg = keyed_reagg(
            j.map_batches(pmsg, batch_format="pyarrow"),
            ["mv"], [("m", "sum")], P,
        )
        u = join_auto(labels, msg, on=("v",), right_on=("mv",),
                      how="left_outer", num_partitions=P)
        labels = materialize_cut(u.map_batches(comb, batch_format="pyarrow"))

    def fin(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        yield pa.table({"name": t.column("v"), "wl_color": t.column("l")})

    return labels.map_batches(fin, batch_format="pyarrow")
