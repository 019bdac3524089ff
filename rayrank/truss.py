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
import pyarrow.compute as pc

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

def edge_jaccard(sf_dir: str) -> ray.data.Dataset:
    """(u, v, support, jacc_den, jaccard) — neighborhood Jaccard
    similarity of every edge's endpoints (link-prediction / tie-strength
    metric): |N(u)∩N(v)| / |N(u)\\{v} ∪ N(v)\\{u}|.  The intersection IS
    the edge's triangle support; the denominator restates as integers
    (deg(u)−1)+(deg(v)−1)−support, so the only float op is ONE double
    division restated identically in the SQL oracle.  Degree-1-both
    edges (den = 0, similarity undefined) are omitted.  Scale shape:
    the support kernel's wedge join + two dimension-bounded degree
    joins (join_auto broadcasts the degree table under the small-side
    limit, partitions above it) — no new shuffle pattern."""
    edges = _canonical_edges(sf_dir)
    sup = _support(edges)

    def both(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        v = pa.array(
            np.concatenate(
                [
                    t.column("u").to_numpy(zero_copy_only=False),
                    t.column("v").to_numpy(zero_copy_only=False),
                ]
            )
        )
        g = (
            pa.table({"n": v, "d": pa.array(np.ones(len(v), np.int64))})
            .group_by(["n"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["n", "d"])

    deg = keyed_reagg(
        edges.map_batches(both, batch_format="pyarrow"), ["n"], [("d", "sum")], P
    )

    ju = join_auto(sup, deg, on=("u",), right_on=("n",), num_partitions=P)

    def tag_du(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        yield t.rename_columns(["du" if c == "d" else c for c in t.schema.names])

    jv = join_auto(
        ju.map_batches(tag_du, batch_format="pyarrow"),
        deg, on=("v",), right_on=("n",), num_partitions=P,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "du" not in t.schema.names:
            return
        s = t.column("s").to_numpy(zero_copy_only=False)
        du = t.column("du").to_numpy(zero_copy_only=False)
        dv = t.column("d").to_numpy(zero_copy_only=False)
        den = du + dv - 2 - s
        keep = den > 0
        if not keep.any():
            return
        yield pa.table(
            {
                "u": pa.array(t.column("u").to_numpy(zero_copy_only=False)[keep]),
                "v": pa.array(t.column("v").to_numpy(zero_copy_only=False)[keep]),
                "support": pa.array(s[keep]),
                "jacc_den": pa.array(den[keep]),
                "jaccard": pa.array(
                    s[keep].astype(np.float64) / den[keep].astype(np.float64)
                ),
            }
        )

    return jv.map_batches(fin, batch_format="pyarrow")


EDGE_JACCARD_SQL = """
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
cnt AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM roles GROUP BY 1, 2),
adj AS (SELECT u AS x FROM und UNION ALL SELECT v FROM und),
deg AS (SELECT x AS n, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY x),
sup AS (
  SELECT e.u, e.v, COALESCE(c.s, CAST(0 AS BIGINT)) AS support
  FROM und e LEFT JOIN cnt c ON e.u = c.u AND e.v = c.v
)
SELECT s.u, s.v, s.support,
  du.d + dv.d - 2 - s.support AS jacc_den,
  CAST(s.support AS DOUBLE)
    / CAST(du.d + dv.d - 2 - s.support AS DOUBLE) AS jaccard
FROM sup s
JOIN deg du ON du.n = s.u
JOIN deg dv ON dv.n = s.v
WHERE du.d + dv.d - 2 - s.support > 0
"""


MAX_PEEL_ROUNDS = 64
# round count of the most recent _truss_peel run (decrement rounds that
# actually removed edges) — read by tests/bench for the record
LAST_PEEL_ROUNDS = 0


def k_truss(sf_dir: str, k: int = 4) -> ray.data.Dataset:
    """Edges of the k-truss: the maximal subgraph where every edge has
    ≥ k−2 triangles among SURVIVING edges.  Synchronous peel: drop all
    under-supported edges each round, recount, repeat to fixpoint.
    The working set is materialized per round (bounded by the initial
    canonical edge count and strictly shrinking); per-round cost is
    the support kernel.  Exactness: networkx.k_truss parity in
    tests/test_truss.py."""
    return _truss_peel(_canonical_edges(sf_dir).materialize(), k - 2)


def _truss_peel(edges: ray.data.Dataset, thresh: int) -> ray.data.Dataset:
    """Shared synchronous peel core (support-DECREMENT, r3): identical
    fixpoint to the per-round recount it replaces, but each round
    enumerates only the triangles that CONTAIN a removed edge and
    decrements their surviving edges — per-round cost ∝ triangles
    touching the removals, not a full support recount (the r2 open
    item; on the near-complete tri fixture both converge in 1 round,
    on a sparse planted-truss graph the decrement rounds are strictly
    cheaper — measured in tests/test_truss.py::test_incremental_vs_
    recount_planted).

    Double-count safety: a triangle losing 2+ edges in one round dies
    ONCE — affected triangles are canonicalized (a < b < c) and
    global-deduped before their surviving edges are decremented.
    Rounds use ``materialize_cut`` (self-join lineage rule)."""
    from .joins import join_auto
    from .shuffle import keyed_reagg, materialize_cut

    global LAST_PEEL_ROUNDS
    LAST_PEEL_ROUNDS = 0
    if edges.count() == 0:
        return edges
    sup = materialize_cut(_support(edges))
    for _ in range(MAX_PEEL_ROUNDS):
        rem = materialize_cut(sup.filter(expr=f"s < {thresh}"))
        if rem.count() == 0:
            break
        LAST_PEEL_ROUNDS += 1
        alive = materialize_cut(sup.filter(expr=f"s >= {thresh}"))

        # both-direction adjacency of the PRE-removal edge set (the
        # support values are counts over exactly this graph)
        def adj_pre(t: pa.Table):
            if t.num_rows == 0 or "u" not in t.schema.names:
                return
            x = t.column("u").to_numpy(zero_copy_only=False)
            y = t.column("v").to_numpy(zero_copy_only=False)
            yield pa.table(
                {"x": pa.array(np.r_[x, y]), "w": pa.array(np.r_[y, x])}
            )

        adj = sup.map_batches(adj_pre, batch_format="pyarrow")
        cand = join_auto(
            rem.select_columns(["u", "v"]), adj, on=("u",), right_on=("x",),
            num_partitions=P,
        )

        def close_key(t: pa.Table):
            if t.num_rows == 0 or "w" not in t.schema.names:
                return
            v = t.column("v").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            keep = v != w
            if not keep.any():
                return
            u = t.column("u").to_numpy(zero_copy_only=False)[keep]
            v, w = v[keep], w[keep]
            yield pa.table(
                {
                    "u": pa.array(u),
                    "v": pa.array(v),
                    "cu": pa.array(np.minimum(v, w)),
                    "cv": pa.array(np.maximum(v, w)),
                }
            )

        def sup_uv(t: pa.Table):
            if t.num_rows == 0 or "u" not in t.schema.names:
                return
            yield pa.table({"eu": t.column("u"), "ev": t.column("v")})

        tri_rows = join_auto(
            cand.map_batches(close_key, batch_format="pyarrow"),
            sup.map_batches(sup_uv, batch_format="pyarrow"),
            on=("cu", "cv"), right_on=("eu", "ev"), how="semi",
            num_partitions=P,
        )

        # canonical triangle (a < b < c); global dedup kills the
        # multi-removed-edge double count
        def canon_tri(t: pa.Table):
            if t.num_rows == 0 or "u" not in t.schema.names:
                return
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            w = t.column("cv").to_numpy(zero_copy_only=False)
            lo = t.column("cu").to_numpy(zero_copy_only=False)
            a = np.minimum(u, lo)
            c = np.maximum(u, w)
            b = u + lo + w - a - c
            g = (
                pa.table(
                    {"a": pa.array(a), "b": pa.array(b), "c": pa.array(c)}
                )
                .group_by(["a", "b", "c"])
                .aggregate([])
            )
            yield g.rename_columns(["a", "b", "c"])

        tri = keyed_reagg(
            tri_rows.map_batches(canon_tri, batch_format="pyarrow"),
            ["a", "b", "c"], [], P,
        )

        def explode3(t: pa.Table):
            if t.num_rows == 0 or "a" not in t.schema.names:
                return
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            g = (
                pa.table(
                    {
                        "u": pa.array(np.r_[a, a, b]),
                        "v": pa.array(np.r_[b, c, c]),
                        "d": pa.array(np.ones(3 * len(a), np.int64)),
                    }
                )
                .group_by(["u", "v"])
                .aggregate([("d", "sum")])
            )
            yield g.rename_columns(["u", "v", "d"])

        dec = materialize_cut(keyed_reagg(
            tri.map_batches(explode3, batch_format="pyarrow"),
            ["u", "v"], [("d", "sum")], P,
        ))
        if dec.count() == 0:
            # removals touched no triangles (triangle-free periphery):
            # supports unchanged, survivors are final next round
            sup = alive
            continue
        joined = join_auto(
            alive, dec, on=("u", "v"), how="left_outer", num_partitions=P
        )

        def apply_dec(t: pa.Table):
            if t.num_rows == 0 or "s" not in t.schema.names:
                return
            import pyarrow.compute as pc

            s = t.column("s").to_numpy(zero_copy_only=False)
            d = pc.fill_null(t.column("d"), 0).to_numpy(zero_copy_only=False)
            yield pa.table(
                {
                    "u": t.column("u"),
                    "v": t.column("v"),
                    "s": pa.array((s - d).astype(np.int64)),
                }
            )

        sup = materialize_cut(joined.map_batches(apply_dec, batch_format="pyarrow"))
    return sup.select_columns(["u", "v"])


RICH_KS = (4, 8, 16)


def rich_club(sf_dir: str) -> pa.Table:
    """(k, n_rich, rich_edges, phi) rich-club coefficient of the
    triangle-bearing graph at degree thresholds RICH_KS: φ(k) =
    2·E_k / (n_k·(n_k−1)) over vertices with degree > k.  Fully
    distributed: distinct-neighbor degrees via one keyed re-agg, then
    the edge table joins the degree table on EACH endpoint (join_auto:
    broadcast under the small-side limit, partitioned hash above — no
    driver-side degree vector), and per-block counts per k fold to
    3·|ks| scalars.  φ is ONE double division of two exact int64
    products, so the SQL oracle is bit-identical; thresholds with
    n_rich < 2 are omitted (φ undefined)."""
    edges = _canonical_edges(sf_dir)

    def both(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        v = pa.array(
            np.concatenate(
                [
                    t.column("u").to_numpy(zero_copy_only=False),
                    t.column("v").to_numpy(zero_copy_only=False),
                ]
            )
        )
        g = (
            pa.table({"v": v, "d": pa.array(np.ones(len(v), np.int64))})
            .group_by(["v"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["v", "d"])

    deg = keyed_reagg(
        edges.map_batches(both, batch_format="pyarrow"), ["v"], [("d", "sum")], P
    )

    # n_k: per-block count of deg > k, folded to |ks| scalars
    def nk(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        d = t.column("d").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "k": pa.array(list(RICH_KS), pa.int64()),
                "n": pa.array([int((d > k).sum()) for k in RICH_KS], pa.int64()),
            }
        )

    n_rich = {k: 0 for k in RICH_KS}
    for r in deg.map_batches(nk, batch_format="pyarrow").take_all():
        n_rich[r["k"]] += r["n"]

    du = join_auto(edges, deg, on=("u",), right_on=("v",)).map_batches(
        lambda t: t.rename_columns(
            ["du" if c == "d" else c for c in t.schema.names]
        ),
        batch_format="pyarrow",
    )
    dv = join_auto(du, deg, on=("v",), right_on=("v",))

    def ek(t: pa.Table):
        if t.num_rows == 0 or "du" not in t.schema.names:
            return
        a = t.column("du").to_numpy(zero_copy_only=False)
        b = t.column("d").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "k": pa.array(list(RICH_KS), pa.int64()),
                "e": pa.array(
                    [int(((a > k) & (b > k)).sum()) for k in RICH_KS], pa.int64()
                ),
            }
        )

    rich_edges = {k: 0 for k in RICH_KS}
    for r in dv.map_batches(ek, batch_format="pyarrow").take_all():
        rich_edges[r["k"]] += r["e"]

    ks = [k for k in RICH_KS if n_rich[k] > 1]
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_rich": pa.array([n_rich[k] for k in ks], pa.int64()),
            "rich_edges": pa.array([rich_edges[k] for k in ks], pa.int64()),
            "phi": pa.array(
                [
                    float(2 * rich_edges[k]) / float(n_rich[k] * (n_rich[k] - 1))
                    for k in ks
                ],
                pa.float64(),
            ),
        }
    )


RICH_CLUB_SQL = """
WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS x FROM und UNION ALL SELECT v FROM und),
deg AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY x),
ks(k) AS (VALUES (CAST(4 AS BIGINT)), (CAST(8 AS BIGINT)), (CAST(16 AS BIGINT))),
nr AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rich
  FROM ks JOIN deg ON deg.d > ks.k GROUP BY k
),
er AS (
  SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS rich_edges
  FROM und e
  JOIN deg du ON du.v = e.u
  JOIN deg dv ON dv.v = e.v
  JOIN ks ON du.d > ks.k AND dv.d > ks.k
  GROUP BY ks.k
)
SELECT nr.k, nr.n_rich,
  COALESCE(er.rich_edges, CAST(0 AS BIGINT)) AS rich_edges,
  CAST(2 * COALESCE(er.rich_edges, 0) AS DOUBLE)
    / CAST(nr.n_rich * (nr.n_rich - 1) AS DOUBLE) AS phi
FROM nr LEFT JOIN er ON nr.k = er.k
WHERE nr.n_rich > 1
"""


def knn_degree_curve(sf_dir: str) -> ray.data.Dataset:
    """(degree, n_vertices, total_nbr_deg, knn) — the average-
    neighbor-degree curve k_nn(d) (the degree-correlation profile
    behind the scalar assortativity): for each simple degree d, the
    mean over degree-d vertices of their neighbors' mean degree...
    restated EXACTLY in integers as total_nbr_deg / (d · n_vertices)
    — Σ over degree-d vertices of Σ neighbor degrees, ONE double
    division at the end.  Scale shape: degree table via keyed re-agg,
    edge table joins deg on the NEIGHBOR endpoint (join_auto), per-
    vertex neighbor-degree sums re-agg by vertex, then a ≤|degrees|
    fold."""
    from .shuffle import keyed_reagg

    edges = _canonical_edges(sf_dir)

    def both_dirs(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "a": pa.array(np.concatenate([u, v])),
                "b": pa.array(np.concatenate([v, u])),
            }
        )

    adj = edges.map_batches(both_dirs, batch_format="pyarrow")

    def deg_pre(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        g = (
            pa.table(
                {"v": t.column("a"), "d": pa.array(np.ones(len(t), np.int64))}
            )
            .group_by(["v"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["v", "d"])

    deg = keyed_reagg(
        adj.map_batches(deg_pre, batch_format="pyarrow"), ["v"], [("d", "sum")], P
    )

    # neighbor-degree sums: (a, b) ⋈ deg(b) → Σ per a
    j = join_auto(adj, deg, on=("b",), right_on=("v",), num_partitions=P)

    def nd_pre(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        g = (
            pa.table({"v": t.column("a"), "nd": t.column("d")})
            .group_by(["v"])
            .aggregate([("nd", "sum")])
        )
        yield g.rename_columns(["v", "nd"])

    nbr = keyed_reagg(
        j.map_batches(nd_pre, batch_format="pyarrow"), ["v"], [("nd", "sum")], P
    )
    full = join_auto(nbr, deg, on=("v",), num_partitions=P)

    def curve(t: pa.Table):
        if t.num_rows == 0 or "nd" not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "degree": t.column("d"),
                    "n_vertices": pa.array(np.ones(len(t), np.int64)),
                    "total_nbr_deg": t.column("nd"),
                }
            )
            .group_by(["degree"])
            .aggregate([("n_vertices", "sum"), ("total_nbr_deg", "sum")])
        )
        yield g.rename_columns(["degree", "n_vertices", "total_nbr_deg"])

    folded = keyed_reagg(
        full.map_batches(curve, batch_format="pyarrow"),
        ["degree"], [("n_vertices", "sum"), ("total_nbr_deg", "sum")], 4,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "degree" not in t.schema.names:
            return
        d = t.column("degree").to_numpy(zero_copy_only=False)
        n = t.column("n_vertices").to_numpy(zero_copy_only=False)
        s = t.column("total_nbr_deg").to_numpy(zero_copy_only=False)
        yield t.append_column(
            "knn",
            pa.array(s.astype(np.float64) / (d * n).astype(np.float64)),
        )

    return folded.map_batches(fin, batch_format="pyarrow")


KNN_DEGREE_CURVE_SQL = """
WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und),
deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY a),
nbr AS (
  SELECT adj.a AS v, CAST(SUM(dn.d) AS BIGINT) AS nd
  FROM adj JOIN deg dn ON dn.v = adj.b GROUP BY adj.a
)
SELECT dv.d AS degree,
  CAST(COUNT(*) AS BIGINT) AS n_vertices,
  CAST(SUM(nbr.nd) AS BIGINT) AS total_nbr_deg,
  CAST(SUM(nbr.nd) AS DOUBLE) / CAST(dv.d * COUNT(*) AS DOUBLE) AS knn
FROM nbr JOIN deg dv ON dv.v = nbr.v
GROUP BY dv.d
"""


# --------------------------------------------------------------------------
# deterministic greedy maximal matching (edge-Luby by hash priority)
# --------------------------------------------------------------------------


COPURCHASE_TRUSS_K = 5
TRUSS_SQL_ROUNDS = 6  # peel fixpoint: 1 round at sf0.001, 4 at sf0.01


def copurchase_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct canonical (u < v) edges of the part CO-PURCHASE graph
    (two parts linked iff some order contains both) — a sparser,
    support-varied triangle fixture than the near-complete tri graph
    (where every k-truss is all-or-nothing).  One orderkey
    repartition co-locates each basket; pair emission is the
    part_pairs_topk index-arithmetic kernel (per-order fan-out bounded
    by basket², never corpus-quadratic); global dedup is one keyed
    re-agg of already-distinct block partials."""
    from .pipelines import _read

    def dedup_pre(t: pa.Table):
        if len(t) == 0:
            return
        yield t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    co = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(dedup_pre, batch_format="pyarrow")
        .repartition(P, keys=["l_orderkey"])
    )

    def pairs(t: pa.Table):
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return
        t = t.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        sizes = np.diff(np.r_[starts, len(ok)])
        local = np.arange(len(ok)) - np.repeat(starts, sizes)
        cnt = np.repeat(sizes, sizes) - 1 - local
        first = np.repeat(np.arange(len(ok)), cnt)
        cum = np.cumsum(cnt)
        off = np.arange(int(cnt.sum())) - np.repeat(cum - cnt, cnt)
        second = first + 1 + off
        if len(first) == 0:
            return
        # per-order pk is sorted ascending, so u < v is canonical
        g = (
            pa.table({"u": pa.array(pk[first]), "v": pa.array(pk[second])})
            .group_by(["u", "v"])
            .aggregate([])
        )
        yield g.rename_columns(["u", "v"])

    return keyed_reagg(
        co.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        ["u", "v"], [], P,
    )


def copurchase_truss(sf_dir: str) -> ray.data.Dataset:
    """(u, v) — the ``COPURCHASE_TRUSS_K``-truss of the co-purchase
    graph.  Same peel core as :func:`k_truss`, but on a fixture whose
    support actually varies, so the peel is non-degenerate at sf0.01
    (4 rounds, 382 edges drop).  SQL oracle: the rounds unrolled as
    materialized CTEs — each round re-lists triangles with the
    oriented double-join over the surviving edge set and keeps
    support ≥ k−2 (``TRUSS_SQL_ROUNDS`` ≥ the measured fixpoint;
    extra rounds are no-ops)."""
    return _truss_peel(
        copurchase_edges(sf_dir).materialize(), COPURCHASE_TRUSS_K - 2
    )


def copurchase_truss_sql() -> str:
    head = """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""
    parts = []
    for r in range(TRUSS_SQL_ROUNDS):
        parts.append(f"""tri{r} AS MATERIALIZED (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e{r} e1 JOIN e{r} e2 ON e2.u = e1.v
  JOIN e{r} e3 ON e3.u = e1.u AND e3.v = e2.v
),
cnt{r} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM (
    SELECT x AS u, y AS v FROM tri{r}
    UNION ALL SELECT x, z FROM tri{r}
    UNION ALL SELECT y, z FROM tri{r}
  ) GROUP BY u, v
),
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e LEFT JOIN cnt{r} c ON c.u = e.u AND c.v = e.v
  WHERE COALESCE(c.s, 0) >= {COPURCHASE_TRUSS_K - 2}
)""")
    return (
        head + ",\n" + ",\n".join(parts)
        + f"\nSELECT u, v FROM e{TRUSS_SQL_ROUNDS}"
    )


TRUSS_NUM_KMAX = 6
# chained peel fixpoints at sf0.01: k=3→2, 4→3, 5→4, 6→6 rounds (all 1
# at sf0.001); +2 rounds headroom each — extra rounds are no-ops
TRUSS_NUM_SQL_ROUNDS = {3: 4, 4: 5, 5: 6, 6: 8}


def truss_numbers(sf_dir: str) -> ray.data.Dataset:
    """(u, v, trussness) — per-edge truss decomposition of the
    co-purchase graph, trussness capped at ``TRUSS_NUM_KMAX`` (the edge
    sibling of core_numbers' bounded coreness): trussness(e) = max k
    with e in the k-truss; every edge is trivially in the 2-truss.

    k-trusses NEST, so each peel starts from the previous k's
    survivors (never re-peels the full graph) and
    trussness = 2 + Σ_{k=3..K} [e survives the k-peel] — the
    core_numbers alive-flag-sum trick on edges.  The flag sum is one
    union of the K−2 survivor sets (+ the base at weight 2) and one
    keyed re-agg.  SQL oracle: the chained peels unrolled
    (``TRUSS_NUM_SQL_ROUNDS``) with the same union-sum fold."""
    base = copurchase_edges(sf_dir).materialize()
    parts = [(base, 2)]
    cur = base
    for k in range(3, TRUSS_NUM_KMAX + 1):
        cur = _truss_peel(cur, k - 2)
        parts.append((cur, 1))

    def flag(c: int):
        def fn(t: pa.Table):
            if t.num_rows == 0 or "u" not in t.schema.names:
                return
            yield t.select(["u", "v"]).append_column(
                "trussness", pa.array(np.full(t.num_rows, c, np.int64))
            )

        return fn

    flagged = parts[0][0].map_batches(flag(2), batch_format="pyarrow")
    for ds, c in parts[1:]:
        flagged = flagged.union(ds.map_batches(flag(c), batch_format="pyarrow"))
    return keyed_reagg(flagged, ["u", "v"], [("trussness", "sum")], P)


def truss_numbers_sql() -> str:
    head = """
WITH b0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""
    parts = []
    prev = "b0"
    fixpoints = []
    for k in range(3, TRUSS_NUM_KMAX + 1):
        for r in range(TRUSS_NUM_SQL_ROUNDS[k]):
            cur = f"k{k}r{r + 1}"
            parts.append(f"""t_{cur} AS MATERIALIZED (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM {prev} e1 JOIN {prev} e2 ON e2.u = e1.v
  JOIN {prev} e3 ON e3.u = e1.u AND e3.v = e2.v
),
c_{cur} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM (
    SELECT x AS u, y AS v FROM t_{cur}
    UNION ALL SELECT x, z FROM t_{cur}
    UNION ALL SELECT y, z FROM t_{cur}
  ) GROUP BY u, v
),
{cur} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e LEFT JOIN c_{cur} c ON c.u = e.u AND c.v = e.v
  WHERE COALESCE(c.s, 0) >= {k - 2}
)""")
            prev = cur
        fixpoints.append(prev)
    unions = ["SELECT u, v, 2 AS c FROM b0"] + [
        f"SELECT u, v, 1 FROM {f}" for f in fixpoints
    ]
    return (
        head + ",\n" + ",\n".join(parts)
        + f"""
SELECT u, v, CAST(SUM(c) AS BIGINT) AS trussness
FROM ({' UNION ALL '.join(unions)}) GROUP BY u, v"""
    )


MM_SQL_ROUNDS = 16  # fixpoint: 1 round at sf0.001, 6 at sf0.01; 2.6× headroom


def maximal_matching(sf_dir: str, max_rounds: int = 64) -> ray.data.Dataset:
    """(u, v) — edges of the lexicographically-first maximal matching
    by splitmix64 edge priority (the edge sibling of rayrank.mis:
    deterministic Luby on the LINE graph).  Each synchronous round
    selects every alive edge whose priority is the strict minimum over
    BOTH endpoints' alive incident edges (priorities are unique by
    construction: splitmix64 of the injective u·2³² + v key, so no
    tie rule is needed), then removes all edges touching a newly
    matched vertex.  The fixpoint equals the sequential greedy
    matching scanning edges in ascending priority — independent of
    partitioning and scheduling — which the pytest oracle replays
    exactly.  SQL oracle: a recursive CTE cannot reference the
    recursive table twice per round, but the round count is O(log E)
    and bounded at the test SFs, so the driver oracle UNROLLS
    ``MM_SQL_ROUNDS`` rounds as materialized CTEs over the HUGEINT
    splitmix chain (__ray_entry__._maximal_matching_sql).

    Scale shape per round: one endpoint-keyed min re-agg (2 rows per
    alive edge), two broadcast/hash joins against the per-vertex min
    table, two anti joins against the newly-matched vertex set; the
    alive set shrinks monotonically and is re-materialized per round
    (k_truss pattern).  Expected O(log E) rounds (Luby 1986;
    Blelloch–Fineman–Shun 2012 for greedy equivalence)."""
    from .sketch import splitmix64

    def pri(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        if (u >= 2**32).any() or (v >= 2**32).any():
            raise ValueError(
                "maximal_matching: vertex id >= 2^32 breaks the "
                "injective priority key; widen the key combiner"
            )
        h = splitmix64((u.astype(np.uint64) << np.uint64(32))
                       | v.astype(np.uint64))
        # order-preserving uint64→int64 map (h ^ 2^63): a raw .view
        # would invert the order of priorities ≥ 2^63 under int64 MIN
        hs = (h ^ np.uint64(1 << 63)).view(np.int64)
        yield pa.table(
            {"u": pa.array(u), "v": pa.array(v), "h": pa.array(hs)}
        )

    alive = (
        _canonical_edges(sf_dir)
        .map_batches(pri, batch_format="pyarrow")
        .materialize()
    )
    matched_parts: list[pa.Table] = []
    n = alive.count()
    for _ in range(max_rounds):
        if n == 0:
            break

        def both_ends(t: pa.Table):
            if t.num_rows == 0 or "h" not in t.schema.names:
                return
            g = pa.table(
                {
                    "x": pa.array(
                        np.concatenate(
                            [
                                t.column("u").to_numpy(zero_copy_only=False),
                                t.column("v").to_numpy(zero_copy_only=False),
                            ]
                        )
                    ),
                    "mh": pa.array(
                        np.concatenate(
                            [
                                t.column("h").to_numpy(zero_copy_only=False),
                                t.column("h").to_numpy(zero_copy_only=False),
                            ]
                        )
                    ),
                }
            ).group_by(["x"]).aggregate([("mh", "min")])
            yield g.rename_columns(["x", "mh"])

        minh = keyed_reagg(
            alive.map_batches(both_ends, batch_format="pyarrow"),
            ["x"], [("mh", "min")], P,
        )

        ju = join_auto(alive, minh, on=("u",), right_on=("x",), num_partitions=P)

        def tag_mu(t: pa.Table):
            if t.num_rows == 0 or "mh" not in t.schema.names:
                return
            yield t.rename_columns(
                ["mu" if c == "mh" else c for c in t.schema.names]
            )

        jv = join_auto(
            ju.map_batches(tag_mu, batch_format="pyarrow"), minh,
            on=("v",), right_on=("x",), num_partitions=P,
        )

        def select(t: pa.Table):
            if t.num_rows == 0 or "mu" not in t.schema.names:
                return
            h = t.column("h").to_numpy(zero_copy_only=False)
            keep = (h == t.column("mu").to_numpy(zero_copy_only=False)) & (
                h == t.column("mh").to_numpy(zero_copy_only=False)
            )
            if not keep.any():
                return
            yield t.filter(pa.array(keep)).select(["u", "v"])

        sel = jv.map_batches(select, batch_format="pyarrow").materialize()
        sel_tabs = [
            b for b in sel.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        if not sel_tabs:
            break
        sel_t = pa.concat_tables(sel_tabs)
        matched_parts.append(sel_t)
        # newly matched vertices (tiny per round: ≤ 2·selected)
        mv = pa.table(
            {
                "x": pa.concat_arrays(
                    [
                        sel_t.column("u").combine_chunks(),
                        sel_t.column("v").combine_chunks(),
                    ]
                )
            }
        )
        mverts = ray.data.from_arrow(mv)
        a1 = join_auto(
            alive, mverts, on=("u",), right_on=("x",), how="anti",
            num_partitions=P,
        )
        from .shuffle import materialize_cut

        alive = materialize_cut(
            join_auto(
                a1, mverts, on=("v",), right_on=("x",), how="anti",
                num_partitions=P,
            )
        )
        n = alive.count()
    if not matched_parts:
        return ray.data.from_arrow(
            pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        )
    return ray.data.from_arrow(pa.concat_tables(matched_parts))


def greedy_matching_oracle(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """Sequential greedy matching in ascending splitmix64 priority —
    the exact fixpoint maximal_matching must reproduce (tests)."""
    from .sketch import splitmix64

    uu = np.array([min(a, b) for a, b in edges], np.uint64)
    vv = np.array([max(a, b) for a, b in edges], np.uint64)
    h = splitmix64((uu << np.uint64(32)) | vv)
    order = np.argsort(h)
    used: set[int] = set()
    out: set[tuple[int, int]] = set()
    for i in order:
        a, b = int(uu[i]), int(vv[i])
        if a not in used and b not in used and a != b:
            used.add(a)
            used.add(b)
            out.add((a, b))
    return out


# --------------------------------------------------------------------------
# Freeman degree centralization (hub-dominance scalar)
# --------------------------------------------------------------------------


def degree_centralization(sf_dir: str) -> pa.Table:
    """(n, max_deg, deg_sum, centralization) — Freeman degree
    centralization of the triangle-bearing graph: Σ(d_max − d_i) over
    the theoretical star-graph maximum (n−1)(n−2).  The numerator
    restates as n·d_max − Σd_i, so the whole statistic folds from the
    degree table's three scalars (count, max, sum) — per-block partials,
    O(blocks) driver state, ONE double division restated identically
    in SQL."""
    edges = _canonical_edges(sf_dir)

    def both(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        v = pa.array(
            np.concatenate(
                [
                    t.column("u").to_numpy(zero_copy_only=False),
                    t.column("v").to_numpy(zero_copy_only=False),
                ]
            )
        )
        g = (
            pa.table({"n": v, "d": pa.array(np.ones(len(v), np.int64))})
            .group_by(["n"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["n", "d"])

    deg = keyed_reagg(
        edges.map_batches(both, batch_format="pyarrow"), ["n"], [("d", "sum")], P
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        d = t.column("d").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "cnt": pa.array([len(d)], pa.int64()),
                "mx": pa.array([int(d.max())], pa.int64()),
                "sm": pa.array([int(d.sum())], pa.int64()),
            }
        )

    n = mx = sm = 0
    for r in deg.map_batches(fold, batch_format="pyarrow").take_all():
        n += r["cnt"]
        mx = max(mx, r["mx"])
        sm += r["sm"]
    cent = float(n * mx - sm) / float((n - 1) * (n - 2)) if n > 2 else 0.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "max_deg": pa.array([mx], pa.int64()),
            "deg_sum": pa.array([sm], pa.int64()),
            "centralization": pa.array([cent], pa.float64()),
        }
    )


DEGREE_CENTRALIZATION_SQL = """
WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS x FROM und UNION ALL SELECT v FROM und),
deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY x),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(d) AS BIGINT) AS max_deg,
    CAST(SUM(d) AS BIGINT) AS deg_sum
  FROM deg
)
SELECT n, max_deg, deg_sum,
  CAST(n * max_deg - deg_sum AS DOUBLE)
    / CAST((n - 1) * (n - 2) AS DOUBLE) AS centralization
FROM agg
"""


# --------------------------------------------------------------------------
# directed triad census (feed-forward loops vs 3-cycles)
# --------------------------------------------------------------------------


def directed_triads(sf_dir: str) -> pa.Table:
    """(ffl, cycles) — directed triangle census of the distinct
    directed edge set: feed-forward loops (a→b, b→c, a→c — counted
    once, the pattern is role-asymmetric) and directed 3-cycles
    (a→b→c→a, canonicalized by the cycle's unique minimum vertex so
    each is counted once).  The network-motif pair whose ratio
    signals hierarchy vs feedback.  Same wedge-join + closing-semi-
    join shape as the undirected triangle kernel, run per pattern;
    both counts fold from per-block partials."""

    def dedup(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        a = t.column("src").to_numpy(zero_copy_only=False)
        b = t.column("dst").to_numpy(zero_copy_only=False)
        keep = a != b
        if not keep.any():
            return
        g = pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep])}
        ).group_by(["a", "b"]).aggregate([])
        yield g.rename_columns(["a", "b"])

    from .pipelines import tri_edges

    d = keyed_reagg(
        tri_edges(sf_dir).map_batches(dedup, batch_format="pyarrow"),
        ["a", "b"], [], P,
    ).materialize()

    def as_mid(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        yield pa.table({"m": t.column("a"), "c": t.column("b")})

    wedges = join_auto(
        d, d.map_batches(as_mid, batch_format="pyarrow"),
        on=("b",), right_on=("m",), num_partitions=P,
    )  # (a, b, c): a→b, b→c

    def ffl_key(t: pa.Table):
        if t.num_rows == 0 or "c" not in t.schema.names:
            return
        keep = pa.array(
            t.column("a").to_numpy(zero_copy_only=False)
            != t.column("c").to_numpy(zero_copy_only=False)
        )
        t2 = t.filter(keep)
        if len(t2):
            yield t2

    ffl_rows = join_auto(
        wedges.map_batches(ffl_key, batch_format="pyarrow"),
        d.map_batches(
            lambda t: pa.table({"ka": t.column("a"), "kb": t.column("b")})
            if t.num_rows and "a" in t.schema.names
            else pa.table(
                {"ka": pa.array([], pa.int64()), "kb": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        on=("a", "c"), right_on=("ka", "kb"), how="semi", num_partitions=P,
    )

    def cyc_key(t: pa.Table):
        if t.num_rows == 0 or "c" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        keep = pa.array((a < b) & (a < c))
        t2 = t.filter(keep)
        if len(t2):
            yield t2

    cyc_rows = join_auto(
        wedges.map_batches(cyc_key, batch_format="pyarrow"),
        d.map_batches(
            lambda t: pa.table({"ka": t.column("a"), "kb": t.column("b")})
            if t.num_rows and "a" in t.schema.names
            else pa.table(
                {"ka": pa.array([], pa.int64()), "kb": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        on=("c", "a"), right_on=("ka", "kb"), how="semi", num_partitions=P,
    )

    def cnt(t: pa.Table):
        if t.num_rows == 0:
            return
        yield pa.table({"n": pa.array([len(t)], pa.int64())})

    ffl = sum(
        r["n"] for r in ffl_rows.map_batches(cnt, batch_format="pyarrow").take_all()
    )
    cyc = sum(
        r["n"] for r in cyc_rows.map_batches(cnt, batch_format="pyarrow").take_all()
    )
    return pa.table(
        {
            "ffl": pa.array([ffl], pa.int64()),
            "cycles": pa.array([cyc], pa.int64()),
        }
    )


DIRECTED_TRIADS_SQL = """
WITH d AS (
  SELECT DISTINCT l_suppkey AS a, l_partkey % 100 AS b
  FROM lineitem WHERE l_suppkey <> l_partkey % 100
),
ffl AS (
  SELECT COUNT(*) AS n
  FROM d e1 JOIN d e2 ON e2.a = e1.b
  JOIN d e3 ON e3.a = e1.a AND e3.b = e2.b
  WHERE e1.a <> e2.b
),
cyc AS (
  SELECT COUNT(*) AS n
  FROM d e1 JOIN d e2 ON e2.a = e1.b
  JOIN d e3 ON e3.a = e2.b AND e3.b = e1.a
  WHERE e1.a < e1.b AND e1.a < e2.b
)
SELECT CAST(ffl.n AS BIGINT) AS ffl, CAST(cyc.n AS BIGINT) AS cycles
FROM ffl, cyc
"""


# --------------------------------------------------------------------------
# bipartite butterfly census (4-cycles in the supplier-part graph)
# --------------------------------------------------------------------------

BF_DEG_CAP = 256  # centers above this degree are out of contract (mirrored
# in the SQL oracle's HAVING; at every test SF the max part degree is far
# below it — suppliers-per-part is bounded by row density — so the census
# is exact there; at web scale the cap is the standard hub guard for the
# wedge family, same contract as pipelines.CN_DEG_CAP)


def butterfly_count(sf_dir: str) -> pa.Table:
    """(wedges, pairs, butterflies) — bipartite 4-cycle census of the
    supplier–part incidence graph (distinct (l_suppkey, l_partkey)
    pairs).  Butterflies ((2,2)-bicliques) are THE clustering motif of
    bipartite graphs (user–item, doc–shard, host–url): for supplier
    pairs (u, v) sharing m parts, butterflies = Σ C(m, 2), wedges =
    Σ m, pairs = #{(u,v): m ≥ 1} — counted over part centers with
    deg ≤ ``BF_DEG_CAP``.

    Scale shape (the two_hop/common_neighbors routing): one
    repartition by the part key makes every copy of an (s, p) edge
    block-local, so global dedup + per-center pair emission is a
    vectorized segmented arange inside the block; per-block group_by
    pre-combines (u, v) partials before the ONE keyed re-agg; the
    three scalars fold from per-block Python-int partials (order-
    independent integer sums — no float arrival-order hazard)."""
    from .pipelines import _seg_arange
    from .relational import _read

    def pre(t: pa.Table):
        if len(t) == 0 or "l_suppkey" not in t.schema.names:
            return
        g = (
            pa.table(
                {"s": t.column("l_suppkey"), "p": t.column("l_partkey")}
            )
            .group_by(["s", "p"])
            .aggregate([])
        )
        yield g.rename_columns(["s", "p"])

    mid = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
        .map_batches(pre, batch_format="pyarrow")
        .repartition(P, keys=["p"])
    )

    def emit(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        s = t.column("s").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, p))
        s, p = s[order], p[order]
        uniq = np.r_[True, (p[1:] != p[:-1]) | (s[1:] != s[:-1])]
        s, p = s[uniq], p[uniq]  # all copies of (s,p) share this block
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        deg = np.diff(np.r_[starts, len(p)])
        ok = (deg >= 2) & (deg <= BF_DEG_CAP)
        if not ok.any():
            return
        starts, deg = starts[ok], deg[ok]
        vals = s[np.repeat(starts, deg) + _seg_arange(deg)]
        seg_starts = np.r_[0, np.cumsum(deg)[:-1]]
        tail = np.repeat(seg_starts + deg, deg) - np.arange(len(vals)) - 1
        first = np.repeat(np.arange(len(vals)), tail)
        if len(first) == 0:
            return
        second = first + _seg_arange(tail) + 1
        g = (
            pa.table(
                {
                    "u": pa.array(vals[first]),
                    "v": pa.array(vals[second]),
                    "m": pa.array(np.ones(len(first), np.int64)),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("m", "sum")])
        )
        yield g.rename_columns(["u", "v", "m"])

    pairs = keyed_reagg(
        mid.map_batches(emit, batch_size=None, batch_format="pyarrow"),
        ["u", "v"], [("m", "sum")], P,
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "m" not in t.schema.names:
            return
        m = t.column("m").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "wedges": pa.array([int(m.sum())], pa.int64()),
                "pairs": pa.array([len(m)], pa.int64()),
                "butterflies": pa.array(
                    [sum(int(x) * (int(x) - 1) // 2 for x in m)], pa.int64()
                ),
            }
        )

    w = pr = bf = 0
    for row in pairs.map_batches(
        fold, batch_size=None, batch_format="pyarrow"
    ).take_all():
        w += row["wedges"]
        pr += row["pairs"]
        bf += row["butterflies"]
    return pa.table(
        {
            "wedges": pa.array([w], pa.int64()),
            "pairs": pa.array([pr], pa.int64()),
            "butterflies": pa.array([bf], pa.int64()),
        }
    )


BUTTERFLY_COUNT_SQL = f"""
WITH e AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
d AS (
  SELECT p FROM e GROUP BY p HAVING COUNT(*) BETWEEN 2 AND {BF_DEG_CAP}
),
w AS (
  SELECT e1.s AS u, e2.s AS v, CAST(COUNT(*) AS BIGINT) AS m
  FROM e e1 JOIN e e2 ON e1.p = e2.p AND e1.s < e2.s
  JOIN d ON d.p = e1.p
  GROUP BY 1, 2
)
SELECT CAST(SUM(m) AS BIGINT) AS wedges,
       CAST(COUNT(*) AS BIGINT) AS pairs,
       CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS butterflies
FROM w
"""


# --------------------------------------------------------------------------
# densest subgraph (Charikar peel, parallel 2(1+eps)-approximation)
# --------------------------------------------------------------------------

DSG_NUM, DSG_DEN = 5, 4  # (1 + eps) = 5/4  ->  eps = 1/4


def densest_subgraph_edges(edges: ray.data.Dataset) -> pa.Table:
    """(rounds, best_round, n_vertices, n_edges, density) — the
    parallel Charikar peel on a distinct undirected edge Dataset:
    each round removes EVERY vertex whose degree ≤ (1+ε)·avg-degree,
    the classic 2(1+ε)-approximation of the densest subgraph (max
    average degree) in O(log n / ε) rounds — the dense-community
    extractor that, unlike a sequential min-degree peel, parallelizes.

    The threshold test is exact integer cross-multiplication
    (DSG_DEN·d·V > DSG_NUM·2E), so the peel is deterministic; density
    comparisons across rounds cross-multiply too (no float until the
    one reported double).  Each round is a degree re-agg + a two-sided
    semi-join against the shrinking keep set, materialized per round
    (the k_truss peel precedent — round count is log-bounded)."""
    best = (0, 1, 0, 0)  # (2E, V, round, E) with 2E/V compared exactly
    cur = edges.materialize()
    rounds = 0
    while True:
        n_e = cur.count()
        if n_e == 0:
            break

        def both(t: pa.Table):
            if t.num_rows == 0 or "u" not in t.schema.names:
                return
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            g = (
                pa.table(
                    {
                        "x": pa.array(np.r_[u, v]),
                        "d": pa.array(np.ones(2 * len(u), np.int64)),
                    }
                )
                .group_by(["x"])
                .aggregate([("d", "sum")])
            )
            yield g.rename_columns(["x", "d"])

        deg = keyed_reagg(
            cur.map_batches(both, batch_format="pyarrow"),
            ["x"], [("d", "sum")], P,
        ).materialize()
        n_v = deg.count()
        rounds += 1
        # exact density compare: 2E/V vs best  <=>  2E·V_b > 2E_b·V
        if 2 * n_e * best[1] > best[0] * n_v:
            best = (2 * n_e, n_v, rounds, n_e)

        # keep iff DEN·d·V > NUM·2E  <=>  d > (NUM·2E)//(DEN·V): the
        # floor-div restatement keeps the wide product in Python ints
        # (the Q11 overflow rule — d·V would exceed int64 at web scale)
        thr = (DSG_NUM * 2 * n_e) // (DSG_DEN * n_v)

        def keepers(t: pa.Table):
            if t.num_rows == 0 or "d" not in t.schema.names:
                # typed zero-row table: an all-filtered round must not
                # lose the schema (breaks the downstream semi-join)
                yield pa.table({"x": pa.array([], pa.int64())})
                return
            d = t.column("d").to_numpy(zero_copy_only=False)
            m = d > thr
            yield pa.table({"x": t.column("x").filter(pa.array(m))})

        keep = deg.map_batches(keepers, batch_size=None, batch_format="pyarrow")
        j1 = join_auto(cur, keep, on=("u",), right_on=("x",), how="semi",
                       num_partitions=P)
        from .shuffle import materialize_cut

        cur = materialize_cut(
            join_auto(j1, keep, on=("v",), right_on=("x",), how="semi",
                      num_partitions=P)
        )

    if best[2] == 0:
        return pa.table(
            {
                "rounds": pa.array([rounds], pa.int64()),
                "best_round": pa.array([0], pa.int64()),
                "n_vertices": pa.array([0], pa.int64()),
                "n_edges": pa.array([0], pa.int64()),
                "density": pa.array([0.0], pa.float64()),
            }
        )
    return pa.table(
        {
            "rounds": pa.array([rounds], pa.int64()),
            "best_round": pa.array([best[2]], pa.int64()),
            "n_vertices": pa.array([best[1]], pa.int64()),
            "n_edges": pa.array([best[3]], pa.int64()),
            "density": pa.array([float(best[0]) / float(best[1])], pa.float64()),
        }
    )


def densest_subgraph(sf_dir: str) -> pa.Table:
    """Charikar peel over the triangle-bearing graph — see
    :func:`densest_subgraph_edges`.  SQL oracle: the peel unrolls
    (``DSG_SQL_ROUNDS`` ≥ the measured 2-round fixpoint; extra rounds
    peel an empty set), the integer floor-div threshold restates
    per-round, and the best-round pick orders by the exact-fraction
    key ⌊2E·2⁷⁰/V⌋ (strict rational inequalities differ by ≥ 1/V²
    > 2⁻⁷⁰, equal rationals floor equal, so the order — and the
    round-asc tie-break — matches the engine's exact
    cross-multiplication).  pytest additionally pins the peel trace
    vs a numpy mirror AND the 2(1+ε) guarantee vs brute force."""
    return densest_subgraph_edges(_canonical_edges(sf_dir))


DSG_SQL_ROUNDS = 4  # peel empties in 2 rounds at sf0.001, 1 at sf0.01


def densest_subgraph_sql() -> str:
    head = """
WITH e1 AS MATERIALIZED (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem)
  WHERE a <> b
)"""
    parts, rows = [], []
    for r in range(1, DSG_SQL_ROUNDS + 1):
        parts.append(f"""deg{r} AS MATERIALIZED (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM e{r} UNION ALL SELECT v FROM e{r}
  ) GROUP BY x
),
st{r} AS MATERIALIZED (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS e,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM deg{r}) AS v
),
keep{r} AS MATERIALIZED (
  SELECT x FROM deg{r}, st{r}
  WHERE CAST(d AS HUGEINT) > (CAST({DSG_NUM} AS HUGEINT) * 2 * e)
                             // (CAST({DSG_DEN} AS HUGEINT) * v)
),
e{r + 1} AS MATERIALIZED (
  SELECT u, v FROM e{r}
  WHERE u IN (SELECT x FROM keep{r}) AND v IN (SELECT x FROM keep{r})
)""")
        rows.append(
            f"SELECT {r} AS round, e, v FROM st{r} WHERE e > 0"
        )
    return (
        head + ",\n" + ",\n".join(parts) + f""",
allr AS ({' UNION ALL '.join(rows)}),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS rounds FROM allr),
best AS (
  SELECT round, e, v FROM allr
  ORDER BY (CAST(2 * e AS HUGEINT) * 1180591620717411303424) // v DESC,
           round ASC
  LIMIT 1
)
SELECT tot.rounds, CAST(best.round AS BIGINT) AS best_round,
  CAST(best.v AS BIGINT) AS n_vertices, CAST(best.e AS BIGINT) AS n_edges,
  CAST(2 * best.e AS DOUBLE) / CAST(best.v AS DOUBLE) AS density
FROM tot, best"""
    )


# --------------------------------------------------------------------------
# edge churn between two graph snapshots (CDC on the edge set)
# --------------------------------------------------------------------------

CHURN_Y_OLD, CHURN_Y_NEW = 1996, 1997


def edge_churn(sf_dir: str) -> ray.data.Dataset:
    """(status, n_edges) — added / removed / kept distinct
    supplier→part edges between the ``CHURN_Y_OLD`` and
    ``CHURN_Y_NEW`` ship-year snapshots of the lineitem graph: the
    graph-CDC audit a daily crawl pipeline runs before deciding
    whether a delta refresh (pagerank.warm_start_parts) or a full
    rebuild is warranted.  ZERO joins (the part_qty_snapshot_diff
    pattern): one scan with year masks, per-block (s, p) partials
    carrying max(in_old), max(in_new), ONE keyed re-agg, then a
    3-row status fold."""
    from .relational import _read

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_shipdate"])

    def pre(t: pa.Table):
        if len(t) == 0 or "l_suppkey" not in t.schema.names:
            return
        y = pc.year(t.column("l_shipdate")).to_numpy(zero_copy_only=False)
        old = y == CHURN_Y_OLD
        new = y == CHURN_Y_NEW
        keep = old | new
        if not keep.any():
            return
        g = (
            pa.table(
                {
                    "s": t.column("l_suppkey").filter(pa.array(keep)),
                    "p": t.column("l_partkey").filter(pa.array(keep)),
                    "in_old": pa.array(old[keep].astype(np.int64)),
                    "in_new": pa.array(new[keep].astype(np.int64)),
                }
            )
            .group_by(["s", "p"])
            .aggregate([("in_old", "max"), ("in_new", "max")])
        )
        yield g.rename_columns(["s", "p", "in_old", "in_new"])

    pairs = keyed_reagg(
        li.map_batches(pre, batch_format="pyarrow"),
        ["s", "p"], [("in_old", "max"), ("in_new", "max")], P,
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "in_old" not in t.schema.names:
            return
        o = t.column("in_old").to_numpy(zero_copy_only=False) > 0
        n = t.column("in_new").to_numpy(zero_copy_only=False) > 0
        yield pa.table(
            {
                "status": pa.array(["kept", "removed", "added"], pa.string()),
                "n_edges": pa.array(
                    [int((o & n).sum()), int((o & ~n).sum()),
                     int((~o & n).sum())], pa.int64(),
                ),
            }
        )

    out = pairs.map_batches(fold, batch_size=None, batch_format="pyarrow")
    return keyed_reagg(out, ["status"], [("n_edges", "sum")], 1)


EDGE_CHURN_SQL = f"""
WITH e AS (
  SELECT l_suppkey AS s, l_partkey AS p,
    MAX(CASE WHEN year(l_shipdate) = {CHURN_Y_OLD} THEN 1 ELSE 0 END) AS in_old,
    MAX(CASE WHEN year(l_shipdate) = {CHURN_Y_NEW} THEN 1 ELSE 0 END) AS in_new
  FROM lineitem
  WHERE year(l_shipdate) IN ({CHURN_Y_OLD}, {CHURN_Y_NEW})
  GROUP BY 1, 2
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_edges FROM (
  SELECT CASE WHEN in_old = 1 AND in_new = 1 THEN 'kept'
              WHEN in_old = 1 THEN 'removed' ELSE 'added' END AS status
  FROM e
) GROUP BY status
"""


# --------------------------------------------------------------------------
# wedge-sampling transitivity estimate (deterministic hash sample)
# --------------------------------------------------------------------------

WEDGE_SAMPLE_MOD = 16  # keep wedges with splitmix64(key) % MOD == 0


def transitivity_estimate(sf_dir: str) -> pa.Table:
    """(sampled, closed, est) — global transitivity estimated from a
    deterministic 1/``WEDGE_SAMPLE_MOD`` hash sample of wedges instead
    of the full Σ C(d,2) enumeration: the estimator a 100-TB graph
    uses when exact wedge counting is the bottleneck (closed-wedge
    fraction == 3T/W exactly in expectation).  The sample rule is a
    pure function of the wedge (splitmix64 of the packed
    (center, n1, n2) key, 21-bit fields with a loud guard), so the
    run replays bit-identically at any cluster size AND in the SQL
    oracle — sampling here is deterministic engineering, not RNG.
    Only sampled wedges leave the block (the shuffle saving IS the
    point); closure = one semi-join against the canonical edge set;
    the estimate is ONE double division."""
    from .sketch import splitmix64

    edges = _canonical_edges(sf_dir).materialize()
    mid = edges.map_batches(
        lambda t: pa.table({"m": t.column("u"), "w2": t.column("v")})
        if t.num_rows and "u" in t.schema.names
        else pa.table({"m": pa.array([], pa.int64()), "w2": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )

    def both_dirs(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        yield pa.table(
            {"c": pa.array(np.r_[u, v]), "n": pa.array(np.r_[v, u])}
        )

    adj = edges.map_batches(both_dirs, batch_format="pyarrow").repartition(
        P, keys=["c"]
    )

    def wedges(t: pa.Table):
        if t.num_rows == 0 or "c" not in t.schema.names:
            return
        from .pipelines import _seg_arange

        c = t.column("c").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, c))
        c, n = c[order], n[order]
        uniq = np.r_[True, (c[1:] != c[:-1]) | (n[1:] != n[:-1])]
        c, n = c[uniq], n[uniq]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        deg = np.diff(np.r_[starts, len(c)])
        ok = deg >= 2
        if not ok.any():
            return
        starts, deg = starts[ok], deg[ok]
        vals = n[np.repeat(starts, deg) + _seg_arange(deg)]
        cents = np.repeat(c[starts], deg)
        seg_starts = np.r_[0, np.cumsum(deg)[:-1]]
        tail = np.repeat(seg_starts + deg, deg) - np.arange(len(vals)) - 1
        first = np.repeat(np.arange(len(vals)), tail)
        if len(first) == 0:
            return
        second = first + _seg_arange(tail) + 1
        cc = np.repeat(cents, tail)  # center per pair row
        n1, n2 = vals[first], vals[second]
        if max(int(cc.max()), int(n1.max()), int(n2.max())) >= (1 << 21):
            raise ValueError(
                "wedge sample key needs ids < 2^21; widen the packing"
            )
        key = (cc.astype(np.uint64) << np.uint64(42)) | (
            n1.astype(np.uint64) << np.uint64(21)
        ) | n2.astype(np.uint64)
        pick = splitmix64(key) % np.uint64(WEDGE_SAMPLE_MOD) == 0
        if not pick.any():
            return
        yield pa.table(
            {"a": pa.array(n1[pick]), "b": pa.array(n2[pick])}
        )

    sampled_w = adj.map_batches(
        wedges, batch_size=None, batch_format="pyarrow"
    ).materialize()
    n_sampled = sampled_w.count()
    closed = join_auto(
        sampled_w, mid, on=("a", "b"), right_on=("m", "w2"),
        how="semi", num_partitions=P,
    )
    n_closed = closed.count()
    est = float(n_closed) / float(n_sampled) if n_sampled else 0.0
    return pa.table(
        {
            "sampled": pa.array([n_sampled], pa.int64()),
            "closed": pa.array([n_closed], pa.int64()),
            "est": pa.array([est], pa.float64()),
        }
    )


def clique_census(sf_dir: str) -> pa.Table:
    """(n_edges, n_triangles, n_k4) — the clique census of the
    co-purchase graph: distinct canonical edges, triangles, and
    4-cliques.  Completes the motif family (wedges, triangles, triads,
    butterflies, trusses) with the first k>3 clique count.

    Counting rule: every motif is enumerated ONCE from its sorted
    vertex tuple (a<b<c<d) — triangles by the oriented double join,
    K4s by extending each triangle with a common out-neighbor d > c of
    all three vertices (two keyed semi-joins check (a,d), (b,d); the
    extension join supplies (c,d)).  Candidate fan-out is bounded by
    the max-id vertex's degree; a degeneracy orientation replaces the
    id orientation at hub-skewed scale (documented trade, same as
    edge_support).

    SQL oracle: the same census as three scalar subqueries over the
    identical 6-join K4 enumeration — fully value-checked."""
    edges = copurchase_edges(sf_dir).materialize()
    n_edges = edges.count()

    def as_bc(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        yield pa.table({"b2": t.column("u"), "c": t.column("v")})

    ebc = edges.map_batches(as_bc, batch_format="pyarrow")
    j1 = join_auto(edges, ebc, on=("v",), right_on=("b2",), num_partitions=P)

    def as_abc(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        yield pa.table(
            {"a": t.column("u"), "b": t.column("v"), "c": t.column("c")}
        )

    tri = join_auto(
        j1.map_batches(as_abc, batch_format="pyarrow"),
        edges, on=("a", "c"), right_on=("u", "v"), how="semi",
        num_partitions=P,
    ).materialize()
    n_tri = tri.count()

    def as_cd(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        yield pa.table({"c2": t.column("u"), "d": t.column("v")})

    ecd = edges.map_batches(as_cd, batch_format="pyarrow")
    cand = join_auto(tri, ecd, on=("c",), right_on=("c2",), num_partitions=P)
    k4 = join_auto(
        cand, edges, on=("a", "d"), right_on=("u", "v"), how="semi",
        num_partitions=P,
    )
    k4 = join_auto(
        k4, edges, on=("b", "d"), right_on=("u", "v"), how="semi",
        num_partitions=P,
    )
    n_k4 = k4.count()
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
            "n_k4": pa.array([n_k4], pa.int64()),
        }
    )


CLIQUE_CENSUS_SQL = """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
  JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
),
k4 AS (
  SELECT COUNT(*) AS n FROM tri t
  JOIN e0 cd ON cd.u = t.c
  JOIN e0 ad ON ad.u = t.a AND ad.v = cd.v
  JOIN e0 bd ON bd.u = t.b AND bd.v = cd.v
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles,
       (SELECT CAST(n AS BIGINT) FROM k4) AS n_k4
"""


K_TRUSS_SQL_ROUNDS = 3  # tri-graph peel converges in 1 round at both SFs


def k_truss_sql(k: int = 4) -> str:
    """Unrolled peel oracle for :func:`k_truss` on the tri graph —
    the copurchase_truss_sql round pattern over the
    (l_suppkey, l_partkey % 100) canonical edge set (LEAST/GREATEST on
    INTs == np.minimum/maximum; the VARCHAR canonicalization trap does
    not apply)."""
    head = """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_suppkey, l_partkey % 100) AS u,
                  GREATEST(l_suppkey, l_partkey % 100) AS v
  FROM lineitem WHERE l_suppkey <> l_partkey % 100
)"""
    parts = []
    for r in range(K_TRUSS_SQL_ROUNDS):
        parts.append(f"""tri{r} AS MATERIALIZED (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e{r} e1 JOIN e{r} e2 ON e2.u = e1.v
  JOIN e{r} e3 ON e3.u = e1.u AND e3.v = e2.v
),
cnt{r} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM (
    SELECT x AS u, y AS v FROM tri{r}
    UNION ALL SELECT x, z FROM tri{r}
    UNION ALL SELECT y, z FROM tri{r}
  ) GROUP BY u, v
),
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e LEFT JOIN cnt{r} c ON c.u = e.u AND c.v = e.v
  WHERE COALESCE(c.s, 0) >= {k - 2}
)""")
    return (
        head + ",\n" + ",\n".join(parts)
        + f"\nSELECT u, v FROM e{K_TRUSS_SQL_ROUNDS}"
    )


# --------------------------------------------------------------------------
# δ-temporal wedge census (temporal motifs, Paranjape-Benson-Leskovec
# WSDM 2017 — public algorithm)
# --------------------------------------------------------------------------

TW_DELTA = 7          # days: wedge closes iff t1 < t2 <= t1 + δ
TW_TBIG = 1 << 21     # > max day value: group-offset encoding never crosses
TW_XBIG = 1 << 19     # > max endpoint id at test scale (guarded)
_TW_DAY_US = 86_400_000_000


def temporal_wedges(sf_dir: str) -> ray.data.Dataset:
    """(mid, wedges, proper_wedges) — δ-temporal wedge census of the
    timestamped supplier→part edge stream (u = l_suppkey,
    v = l_partkey % 100, t = ship day): how many ordered edge-instance
    pairs (u→mid, t1), (mid→w, t2) satisfy t1 < t2 ≤ t1 + {δ} per
    middle vertex, and how many with u ≠ w (proper) — the temporal
    2-path count at the root of temporal-motif analysis.

    Scale shape: pairs are COUNTED, never materialized — each edge
    instance ships twice (as in-role keyed by its head, out-role keyed
    by its tail), ONE mid-keyed repartition co-locates a middle
    vertex's instances, and the block kernel counts window pairs with
    two np.searchsorted calls over group-offset-encoded keys
    (mid·2²¹ + t — a window of δ < 2²¹ can never cross a group
    boundary), so a mid with n instances costs O(n log n), not the
    O(n²) join fan-out.  The degenerate (u = w) correction uses the
    same encoding one level deeper ((mid·2¹⁹ + x)·2²¹ + t).  Encoding
    ranges are GUARDED (raises, never wraps — the close_wedges rule).
    The SQL oracle is the plain windowed self-join, feasible at oracle
    scale only."""
    from .pipelines import _read

    def roles(t: pa.Table):
        if len(t) == 0 or "l_suppkey" not in t.schema.names:
            return
        u = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        v = (
            t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            % 100
        )
        tt = (
            t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // _TW_DAY_US
        )
        if len(tt) and (
            int(tt.max()) + TW_DELTA >= TW_TBIG
            or int(max(u.max(), v.max())) >= TW_XBIG
        ):
            raise OverflowError(
                "temporal_wedges: day or id exceeds the encoding guard"
            )
        # in-role: edge arrives at mid=v, partner x=u
        # out-role: edge leaves mid=u, partner x=v
        yield pa.table(
            {
                "mid": pa.array(np.r_[v, u]),
                "role": pa.array(
                    np.r_[np.zeros(len(u), np.int64), np.ones(len(u), np.int64)]
                ),
                "x": pa.array(np.r_[u, v]),
                "t": pa.array(np.r_[tt, tt]),
            }
        )

    co = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_shipdate"])
        .map_batches(roles, batch_format="pyarrow")
        .repartition(P, keys=["mid"])
    )

    def count(t: pa.Table):
        if t.num_rows == 0 or "mid" not in t.schema.names:
            return
        mid = t.column("mid").to_numpy(zero_copy_only=False)
        role = t.column("role").to_numpy(zero_copy_only=False)
        x = t.column("x").to_numpy(zero_copy_only=False)
        tt = t.column("t").to_numpy(zero_copy_only=False)
        i, o = role == 0, role == 1
        # total window pairs per mid: group-offset keys (one searchsorted
        # pair per in-instance; the δ window cannot cross mid groups)
        k_out = np.sort(mid[o] * TW_TBIG + tt[o])
        k_in = mid[i] * TW_TBIG + tt[i]
        tot = np.searchsorted(k_out, k_in + TW_DELTA, "right") - np.searchsorted(
            k_out, k_in, "right"
        )
        # degenerate (u == w) pairs: same kernel keyed one level deeper
        kx_out = np.sort((mid[o] * TW_XBIG + x[o]) * TW_TBIG + tt[o])
        kx_in = (mid[i] * TW_XBIG + x[i]) * TW_TBIG + tt[i]
        deg = np.searchsorted(
            kx_out, kx_in + TW_DELTA, "right"
        ) - np.searchsorted(kx_out, kx_in, "right")
        mids = mid[i]
        order = np.argsort(mids, kind="stable")
        ms, ts, ds = mids[order], tot[order], deg[order]
        starts = np.flatnonzero(np.r_[True, ms[1:] != ms[:-1]])
        wsum = np.add.reduceat(ts, starts) if len(ms) else np.array([], np.int64)
        dsum = np.add.reduceat(ds, starts) if len(ms) else np.array([], np.int64)
        keep = wsum > 0
        if not keep.any():
            return
        yield pa.table(
            {
                "mid": pa.array(ms[starts][keep]),
                "wedges": pa.array(wsum[keep].astype(np.int64)),
                "proper_wedges": pa.array(
                    (wsum[keep] - dsum[keep]).astype(np.int64)
                ),
            }
        )

    return co.map_batches(count, batch_size=None, batch_format="pyarrow")


TEMPORAL_WEDGES_SQL = f"""
WITH e AS (
  SELECT l_suppkey AS u, l_partkey % 100 AS v,
    CAST(epoch_us(l_shipdate) // {_TW_DAY_US} AS BIGINT) AS t
  FROM lineitem
),
w AS (
  SELECT a.v AS mid, CAST(COUNT(*) AS BIGINT) AS wedges,
    CAST(SUM(CASE WHEN a.u = b.v THEN 1 ELSE 0 END) AS BIGINT) AS degen
  FROM e a JOIN e b
    ON a.v = b.u AND b.t > a.t AND b.t <= a.t + {TW_DELTA}
  GROUP BY a.v
)
SELECT mid, wedges, CAST(wedges - degen AS BIGINT) AS proper_wedges
FROM w WHERE wedges > 0
"""


# --------------------------------------------------------------------------
# one-level graph coarsening by matching contraction (the multilevel-
# partitioning / METIS-style coarsen phase, Karypis & Kumar 1998 —
# public algorithm; built on this repo's deterministic matching)
# --------------------------------------------------------------------------


def graph_coarsen(sf_dir: str) -> ray.data.Dataset:
    """(cu, cv, w) — the triangle-bearing graph contracted along the
    deterministic maximal matching: every matched pair collapses to
    its min endpoint, unmatched vertices map to themselves, parallel
    coarse edges merge with weight = number of distinct fine edges
    folded in, self-loops (the matched edges themselves) drop.  One
    coarsening level of the multilevel partitioning stack; w preserves
    the fine cut weights exactly.

    Scale shape: the matching is the already-verified synchronous
    edge-Luby fixpoint; contraction is TWO endpoint-keyed left joins
    of the edge set against the 2·|M|-row representative table and ONE
    coarse-key re-agg — no driver-side graph state.  SQL oracle:
    the unrolled matching CTE chain composes as a parenthesized
    subquery (the hybrid_rrf rule) feeding the same relabel joins."""
    from .joins import join_auto

    def rep_rows(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        yield pa.table(
            {"x": pa.array(np.r_[u, v]), "r": pa.array(np.r_[u, u])}
        )

    rep = maximal_matching(sf_dir).map_batches(
        rep_rows, batch_format="pyarrow"
    ).materialize()

    e = _canonical_edges(sf_dir)
    j1 = join_auto(
        e, rep, on=("u",), right_on=("x",), how="left_outer",
        num_partitions=P,
    )

    def fix1(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "ru": pa.array(
                    np.where(
                        t.column("r").is_null().to_numpy(
                            zero_copy_only=False
                        ),
                        u,
                        t.column("r").to_numpy(zero_copy_only=False),
                    ).astype(np.int64)
                ),
                "v": t.column("v"),
            }
        )

    def fix2(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        v = t.column("v").to_numpy(zero_copy_only=False)
        rv = np.where(
            t.column("r").is_null().to_numpy(zero_copy_only=False),
            v,
            t.column("r").to_numpy(zero_copy_only=False),
        ).astype(np.int64)
        ru = t.column("ru").to_numpy(zero_copy_only=False)
        keep = ru != rv
        if not keep.any():
            return
        cu = np.minimum(ru[keep], rv[keep])
        cv = np.maximum(ru[keep], rv[keep])
        g = (
            pa.table(
                {
                    "cu": pa.array(cu),
                    "cv": pa.array(cv),
                    "w": pa.array(np.ones(len(cu), np.int64)),
                }
            ).group_by(["cu", "cv"]).aggregate([("w", "sum")])
        )
        yield g.rename_columns(["cu", "cv", "w"])

    mid = j1.map_batches(fix1, batch_format="pyarrow")
    j2 = join_auto(
        mid, rep, on=("v",), right_on=("x",), how="left_outer",
        num_partitions=P,
    )
    return keyed_reagg(
        j2.map_batches(fix2, batch_format="pyarrow"),
        ["cu", "cv"], [("w", "sum")], P,
    )
