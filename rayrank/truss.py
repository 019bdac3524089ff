"""Edge triangle support and k-truss decomposition on the
triangle-bearing testdata graph — the edge-level strengthening of the
vertex-level triangle count (SURVEY.md §2.11; the reference has no
truss notion, this generalizes its graph surface).

`edge_support` is one-shot and SQL-checkable: canonical triangles are
listed with the same oriented double-join as the `triangle_count`
oracle, each triangle fans out to its three edges, and a base-0 union
(every edge contributes a zero row) makes the keyed count total —
no left join needed, one extra union row per edge.

`k_truss` peels to a fixpoint: drop every edge with support < k−2,
recount on the survivors, repeat.  Each round is the same support
kernel over a SHRINKING materialized edge set (bounded by the initial
edge count; rounds ≤ peel depth).  A fixpoint loop cannot be a single
SQL query (the recount needs three self-joins of the working set per
round), so the driver check is rows-only and exactness is pinned to
networkx.k_truss in the test suite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from . import configure_data_context
from .joins import join_auto
from .shuffle import keyed_reagg

configure_data_context()

P = 8


def _canonical_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct (u < v) edges of the triangle-bearing graph
    (l_suppkey, l_partkey % 100), self-loops dropped."""
    from .pipelines import tri_edges

    def pre(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        a = t.column("src").to_numpy(zero_copy_only=False)
        b = t.column("dst").to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        if len(a) == 0:
            return
        g = pa.table(
            {"u": pa.array(np.minimum(a, b)), "v": pa.array(np.maximum(a, b))}
        ).group_by(["u", "v"]).aggregate([])
        yield g.rename_columns(["u", "v"])

    return keyed_reagg(
        tri_edges(sf_dir).map_batches(pre, batch_format="pyarrow"),
        ["u", "v"], [], P,
    )


def _support(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(u, v, support) for every canonical edge: triangles via the
    oriented wedge double-join (u<v<w), three role rows per triangle,
    base-0 rows keep zero-support edges in the output."""

    def as_mid(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        yield pa.table({"m": t.column("u"), "w": t.column("v")})

    wedges = join_auto(
        edges, edges.map_batches(as_mid, batch_format="pyarrow"),
        on=("v",), right_on=("m",), num_partitions=P,
    )

    def close_key(t: pa.Table):
        if t.num_rows == 0 or "w" not in t.schema.names:
            return
        yield pa.table({"cu": t.column("u"), "cv": t.column("w")})

    closing = edges.map_batches(
        lambda t: pa.table({"cu": t.column("u"), "cv": t.column("v")})
        if t.num_rows and "u" in t.schema.names
        else pa.table({"cu": pa.array([], pa.int64()), "cv": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    tri = join_auto(
        wedges, closing, on=("u", "w"), right_on=("cu", "cv"),
        how="semi", num_partitions=P,
    )

    def roles(t: pa.Table):
        if t.num_rows == 0 or "w" not in t.schema.names:
            return
        x = t.column("u").to_numpy(zero_copy_only=False)
        y = t.column("v").to_numpy(zero_copy_only=False)
        z = t.column("w").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "u": pa.array(np.r_[x, x, y]),
                "v": pa.array(np.r_[y, z, z]),
                "s": pa.array(np.ones(3 * len(x), np.int64)),
            }
        ).group_by(["u", "v"]).aggregate([("s", "sum")]).rename_columns(
            ["u", "v", "s"]
        )

    def base(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        yield pa.table(
            {
                "u": t.column("u"),
                "v": t.column("v"),
                "s": pa.array(np.zeros(len(t), np.int64)),
            }
        )

    return keyed_reagg(
        tri.map_batches(roles, batch_format="pyarrow").union(
            edges.map_batches(base, batch_format="pyarrow")
        ),
        ["u", "v"], [("s", "sum")], P,
    )


def edge_support(sf_dir: str) -> ray.data.Dataset:
    """(u, v, support) on the full triangle-bearing edge set."""

    def rename(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        yield pa.table(
            {"u": t.column("u"), "v": t.column("v"), "support": t.column("s")}
        )

    return _support(_canonical_edges(sf_dir)).map_batches(
        rename, batch_format="pyarrow"
    )


EDGE_SUPPORT_SQL = """
WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM und e1 JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
roles AS (
  SELECT x AS u, y AS v FROM tri
  UNION ALL SELECT x, z FROM tri
  UNION ALL SELECT y, z FROM tri
),
cnt AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM roles GROUP BY 1, 2)
SELECT e.u, e.v, COALESCE(c.s, CAST(0 AS BIGINT)) AS support
FROM und e LEFT JOIN cnt c ON e.u = c.u AND e.v = c.v
"""

MAX_PEEL_ROUNDS = 64


def k_truss(sf_dir: str, k: int = 4) -> ray.data.Dataset:
    """Edges of the k-truss: the maximal subgraph where every edge has
    ≥ k−2 triangles among SURVIVING edges.  Synchronous peel: drop all
    under-supported edges each round, recount, repeat to fixpoint.
    The working set is materialized per round (bounded by the initial
    canonical edge count and strictly shrinking); per-round cost is
    the support kernel.  Exactness: networkx.k_truss parity in
    tests/test_truss.py."""
    thresh = k - 2
    edges = _canonical_edges(sf_dir).materialize()
    n = edges.count()
    for _ in range(MAX_PEEL_ROUNDS):
        if n == 0:
            break
        sup = _support(edges)

        def keep(t: pa.Table):
            if t.num_rows == 0 or "s" not in t.schema.names:
                return
            import pyarrow.compute as pc

            t = t.filter(pc.greater_equal(t.column("s"), thresh))
            if len(t):
                yield t.select(["u", "v"])

        edges = sup.map_batches(keep, batch_format="pyarrow").materialize()
        n2 = edges.count()
        if n2 == n:
            break
        n = n2
    return edges
