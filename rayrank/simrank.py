"""SimRank (2 iterations, C = 4/5) — recursive structural similarity
("two nodes are similar when their neighbors are similar"), the
graph-similarity class the neighbor-overlap family (common_neighbors /
adamic_adar / edge_jaccard) cannot express: s2 is nonzero for pairs
with ZERO shared neighbors whose neighborHOODS are similar.

Pinned rule, kept EXACT in integers (scale Z = 10⁹) so the DuckDB
oracle replays it bit-for-bit:

* graph: the degree-capped (deg ≤ SR_DEG_CAP) subgraph of the distinct
  undirected lineitem graph — the hub rule shared with
  common_neighbors; degrees are RECOUNTED inside the subgraph.
* s0(i, j) = Z·[i = j]
* s1q(x, y) = (4·Z·|N(x) ∩ N(y)|) // (5·dx·dy)          for x ≠ y
* s2q(x, y) = (4·(Σ_{i∈N(x), j∈N(y), i≠j} s1q(i, j)
               + Z·|N(x) ∩ N(y)|)) // (5·dx·dy)         for x ≠ y

(nested floor-div is the defined quantization, mirrored verbatim in
SQL — the interp_quantiles principle: restate the arithmetic, never
trust the engine's internal fold).  Output: top-SR_TOP_K pairs x < y
by (s2q desc, x, y).

Overflow budget (int64): 4Z·n ≤ 4e9·cap ≈ 1e11; the s2 numerator is
≤ cap²·0.8Z + Z·cap ≈ 5e11, ×4 ≈ 2e12 — all < 2⁶³.

Scale shape: wedge-pair emission is the common_neighbors routing
(ONE repartition by center, vectorized segmented pairs, bounded by
cap·|E|); the s2 cross-sum is two cap-bounded fan-out joins
(esub ⋈ s1 ⋈ esub) each followed by a keyed re-agg — never an
unbounded pair product; the final top-k is pre-truncate → 1-block
merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from .undirected import und_both

SR_DEG_CAP = 24
SR_Z = 1_000_000_000
SR_TOP_K = 20


def simrank2_topk(sf_dir: str) -> ray.data.Dataset:
    """(x, y, s) — module docstring has the pinned rule."""
    from .joins import hash_join, join_auto
    from .pipelines import P, _seg_arange, sf_edges
    from .shuffle import keyed_reagg, materialize_cut

    und_pre = und_both
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [], P,
    )

    def deg_pre(t: pa.Table):
        if len(t) == 0 or "a" not in t.schema.names:
            return
        g = (
            t.select(["a"])
            .append_column("d", pa.array(np.ones(len(t), np.int64)))
            .group_by(["a"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["v", "d"])

    deg = keyed_reagg(
        und.map_batches(deg_pre, batch_format="pyarrow"),
        ["v"], [("d", "sum")], P,
    )
    keep = deg.map_batches(
        lambda t: t.filter(
            pc.less_equal(t.column("d"), SR_DEG_CAP)
        ).select(["v"]),
        batch_format="pyarrow",
    )

    esub = materialize_cut(
        join_auto(
            join_auto(und, keep, on=("a",), right_on=("v",), how="semi",
                      num_partitions=P),
            keep, on=("b",), right_on=("v",), how="semi", num_partitions=P,
        )
    )
    dsub = materialize_cut(
        keyed_reagg(
            esub.map_batches(deg_pre, batch_format="pyarrow"),
            ["v"], [("d", "sum")], P,
        )
    )

    # ordered wedge pairs (x ≠ y, both orders) with shared-neighbor
    # counts — the common_neighbors emission, uncapped centers (the
    # cap already bounds every subgraph degree)
    mid = esub.repartition(P, keys=["b"])

    def emit_pairs(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((a, b))
        a_s, b_s = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        dg = np.diff(np.r_[starts, len(b_s)])
        ok = dg >= 2
        if not ok.any():
            return
        starts, dg = starts[ok], dg[ok]
        take = np.repeat(starts, dg) + _seg_arange(dg)
        vals = a_s[take]
        seg_starts = np.r_[0, np.cumsum(dg)[:-1]]
        tail = np.repeat(seg_starts + dg, dg) - np.arange(len(vals)) - 1
        first = np.repeat(np.arange(len(vals)), tail)
        second = first + _seg_arange(tail) + 1
        if len(first) == 0:
            return
        x = np.r_[vals[first], vals[second]]  # both orders
        y = np.r_[vals[second], vals[first]]
        g = (
            pa.table(
                {
                    "x": pa.array(x),
                    "y": pa.array(y),
                    "n": pa.array(np.ones(len(x), np.int64)),
                }
            )
            .group_by(["x", "y"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["x", "y", "n"])

    inter = materialize_cut(
        keyed_reagg(
            mid.map_batches(
                emit_pairs, batch_size=None, batch_format="pyarrow"),
            ["x", "y"], [("n", "sum")], P,
        )
    )

    def _with_degrees(ds: ray.data.Dataset) -> ray.data.Dataset:
        j = join_auto(ds, dsub, on=("x",), right_on=("v",),
                      num_partitions=P)
        j = j.map_batches(
            lambda t: t.rename_columns(
                ["dx" if c == "d" else c for c in t.schema.names]),
            batch_format="pyarrow",
        )
        j = join_auto(j, dsub, on=("y",), right_on=("v",),
                      num_partitions=P)
        return j.map_batches(
            lambda t: t.rename_columns(
                ["dy" if c == "d" else c for c in t.schema.names]),
            batch_format="pyarrow",
        )

    def s1_fin(t: pa.Table):
        if t.num_rows == 0 or "dx" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        dx = t.column("dx").to_numpy(zero_copy_only=False)
        dy = t.column("dy").to_numpy(zero_copy_only=False)
        s = (4 * SR_Z * n) // (5 * dx * dy)
        yield pa.table(
            {"x": t.column("x"), "y": t.column("y"), "s": pa.array(s)}
        )

    s1 = materialize_cut(
        _with_degrees(inter).map_batches(s1_fin, batch_format="pyarrow")
    )

    # cross-sum: Σ_{i∈N(x), j∈N(y), i≠j} s1q(i, j)
    c1 = join_auto(esub, s1, on=("b",), right_on=("x",), num_partitions=P)

    def c1_pre(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "x": t.column("a"),
                    "j": t.column("y"),
                    "part": t.column("s"),
                }
            )
            .group_by(["x", "j"])
            .aggregate([("part", "sum")])
        )
        yield g.rename_columns(["x", "j", "part"])

    cross1 = keyed_reagg(
        c1.map_batches(c1_pre, batch_format="pyarrow"),
        ["x", "j"], [("part", "sum")], P,
    )

    c2 = join_auto(
        cross1, esub.map_batches(
            lambda t: t.rename_columns(["yv", "j"]),
            batch_format="pyarrow",
        ),
        on=("j",), right_on=("j",), num_partitions=P,
    )

    def c2_pre(t: pa.Table):
        if t.num_rows == 0 or "yv" not in t.schema.names:
            return
        f = t.filter(pc.not_equal(t.column("x"), t.column("yv")))
        if f.num_rows == 0:
            return
        g = (
            pa.table(
                {
                    "x": f.column("x"),
                    "y": f.column("yv"),
                    "off_sum": f.column("part"),
                }
            )
            .group_by(["x", "y"])
            .aggregate([("off_sum", "sum")])
        )
        yield g.rename_columns(["x", "y", "off_sum"])

    num2 = keyed_reagg(
        c2.map_batches(c2_pre, batch_format="pyarrow"),
        ["x", "y"], [("off_sum", "sum")], P,
    )

    # s2 over num2 ∪ inter (full outer: a pair may have only one part)
    merged = hash_join(
        num2, inter, on=("x", "y"), how="full_outer", num_partitions=P
    )

    def coalesced(t: pa.Table):
        if t.num_rows == 0 or "x" not in t.schema.names:
            return
        zero = pa.scalar(0, pa.int64())
        cols = {"x": t.column("x"), "y": t.column("y")}
        for c in ("off_sum", "n"):
            cols[c] = (
                pc.coalesce(t.column(c), zero)
                if c in t.schema.names
                else pa.array(np.zeros(t.num_rows, np.int64))
            )
        yield pa.table(cols)

    def s2_fin(t: pa.Table):
        if t.num_rows == 0 or "dx" not in t.schema.names:
            return
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        off = t.column("off_sum").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        dx = t.column("dx").to_numpy(zero_copy_only=False)
        dy = t.column("dy").to_numpy(zero_copy_only=False)
        keep = x < y
        if not keep.any():
            return
        s = (4 * (off[keep] + SR_Z * n[keep])) // (5 * dx[keep] * dy[keep])
        out = pa.table(
            {
                "x": pa.array(x[keep]),
                "y": pa.array(y[keep]),
                "s": pa.array(s),
            }
        )
        order = np.lexsort((out.column("y").to_numpy(zero_copy_only=False),
                            out.column("x").to_numpy(zero_copy_only=False),
                            -s))[:SR_TOP_K]
        yield out.take(pa.array(order))

    ranked = _with_degrees(
        merged.map_batches(coalesced, batch_format="pyarrow")
    ).map_batches(s2_fin, batch_size=None, batch_format="pyarrow")

    def merge_topk(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        s = t.column("s").to_numpy(zero_copy_only=False)
        order = np.lexsort((t.column("y").to_numpy(zero_copy_only=False),
                            t.column("x").to_numpy(zero_copy_only=False),
                            -s))[:SR_TOP_K]
        yield t.take(pa.array(order))

    return ranked.repartition(1).map_batches(
        merge_topk, batch_size=None, batch_format="pyarrow"
    )


SIMRANK2_TOPK_SQL = f"""
WITH raw AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t)),
deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY a),
keep AS (SELECT v FROM deg WHERE d <= {SR_DEG_CAP}),
esub AS MATERIALIZED (
  SELECT e.a, e.b FROM und e
  JOIN keep ka ON ka.v = e.a JOIN keep kb ON kb.v = e.b),
dsub AS MATERIALIZED (
  SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d FROM esub GROUP BY a),
inter AS MATERIALIZED (
  SELECT e1.a AS x, e2.a AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM esub e1 JOIN esub e2 ON e1.b = e2.b AND e1.a <> e2.a
  GROUP BY e1.a, e2.a),
s1 AS MATERIALIZED (
  SELECT i.x, i.y,
    (4::BIGINT * {SR_Z} * i.n) // (5::BIGINT * dx.d * dy.d) AS s
  FROM inter i JOIN dsub dx ON dx.v = i.x JOIN dsub dy ON dy.v = i.y),
cross1 AS (
  SELECT e1.a AS x, s1.y AS j, CAST(SUM(s1.s) AS BIGINT) AS part
  FROM esub e1 JOIN s1 ON s1.x = e1.b
  GROUP BY e1.a, s1.y),
num2 AS MATERIALIZED (
  SELECT c.x, e2.a AS y, CAST(SUM(c.part) AS BIGINT) AS off_sum
  FROM cross1 c JOIN esub e2 ON e2.b = c.j AND c.x <> e2.a
  GROUP BY c.x, e2.a),
s2 AS MATERIALIZED (
  SELECT COALESCE(n2.x, i.x) AS x, COALESCE(n2.y, i.y) AS y,
    (4::BIGINT * (COALESCE(n2.off_sum, 0)
                  + {SR_Z}::BIGINT * COALESCE(i.n, 0)))
      // (5::BIGINT * dx.d * dy.d) AS s
  FROM num2 n2 FULL OUTER JOIN inter i ON i.x = n2.x AND i.y = n2.y
  JOIN dsub dx ON dx.v = COALESCE(n2.x, i.x)
  JOIN dsub dy ON dy.v = COALESCE(n2.y, i.y))
SELECT x, y, s FROM s2 WHERE x < y
QUALIFY ROW_NUMBER() OVER (ORDER BY s DESC, x, y) <= {SR_TOP_K}
"""
