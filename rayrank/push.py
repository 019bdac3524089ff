"""Personalized-PageRank forward push (Andersen–Chung–Lang), the
local-graph-clustering / seed-expansion primitive — run in EXACT
integer arithmetic so the unrolled SQL oracle replays it bit-for-bit.

Pinned rule (α = 1/5, lazy split 1/2, mass scale S = 10¹²), applied
SYNCHRONOUSLY to every vertex for exactly ``PUSH_ROUNDS`` rounds on
the collapsed undirected multigraph (both directions, self-loops
dropped, integer multiplicities; wdeg = Σ mult):

    a    = r // 5                      (absorbed into p)
    rem  = r - a
    q    = (rem // 2) // wdeg          (per-unit-multiplicity share)
    r'   = rem - q·wdeg + Σ_in mult·q  (self keeps ALL rounding dust)

Mass is conserved EXACTLY: what leaves a vertex (q·wdeg) is exactly
what its neighbors receive (Σ_u q·mult(v,u) over the symmetric edge
table), so Σp + Σr = S is an invariant the tests assert.  Every
quantity is a non-negative int64 < 2⁵³ (bounded by S), and every op is
a floor-div DuckDB's ``//`` computes identically (the Q11 rule), so
the driver's value-hash match is exact, not tolerance-based.

Scale shape: this is deliberately the FRONTIER-JOIN route, not the
resident-shard route — local push touches only the ball around the
seed, so each round semi-joins the (q > 0) frontier against the edge
table (join_auto broadcasts the frontier while it is small — the
whole point of push at 100 TB: work ∝ pushed mass, never ∝ |E|), one
dst-keyed re-agg routes the increments, and the state union re-ags by
name.  Rounds are lineage-cut (shuffle.materialize_cut — the Ray 2.49
self-chaining-plan pathology).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from .undirected import und_both_names_mult

PUSH_ROUNDS = 6
PUSH_SCALE = 10 ** 12
PUSH_ALPHA_INV = 5  # α = 1/5


def ppr_push(sf_dir: str) -> ray.data.Dataset:
    """(name, p_mass, r_mass) after PUSH_ROUNDS synchronous integer
    push rounds from the min-name seed of the undirected lineitem
    graph (module docstring has the pinned rule)."""
    from .pipelines import P, sf_edges
    from .joins import join_auto
    from .shuffle import keyed_reagg, materialize_cut

    # collapsed symmetric multigraph (a, b, mult) + weighted degrees
    und_pre = und_both_names_mult
    edges = materialize_cut(
        keyed_reagg(
            sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
            ["a", "b"], [("mult", "sum")], P,
        )
    )

    def deg_pre(t: pa.Table):
        if len(t) == 0 or "a" not in t.schema.names:
            return
        g = t.select(["a", "mult"]).group_by(["a"]).aggregate(
            [("mult", "sum")]
        )
        yield g.rename_columns(["name", "wdeg"])

    wdeg = materialize_cut(
        keyed_reagg(
            edges.map_batches(deg_pre, batch_format="pyarrow"),
            ["name"], [("wdeg", "sum")], P,
        )
    )

    def name_min(t: pa.Table):
        if len(t) == 0 or "name" not in t.schema.names:
            return
        yield pa.table(
            {"m": pa.array([min(t.column("name").to_pylist())])}
        )

    seed = min(
        r["m"]
        for r in wdeg.map_batches(name_min, batch_format="pyarrow").take_all()
    )

    state = ray.data.from_arrow(
        pa.table(
            {
                "name": pa.array([seed], pa.string()),
                "p": pa.array([0], pa.int64()),
                "r": pa.array([PUSH_SCALE], pa.int64()),
            }
        )
    )

    for _ in range(PUSH_ROUNDS):
        st = join_auto(
            state, wdeg, on=("name",), right_on=("name",), num_partitions=P
        )

        def step(t: pa.Table):
            if t.num_rows == 0 or "wdeg" not in t.schema.names:
                return
            r = t.column("r").to_numpy(zero_copy_only=False)
            p = t.column("p").to_numpy(zero_copy_only=False)
            w = t.column("wdeg").to_numpy(zero_copy_only=False)
            a = r // PUSH_ALPHA_INV
            rem = r - a
            q = (rem // 2) // w
            yield pa.table(
                {
                    "name": t.column("name"),
                    "p": pa.array(p + a),
                    "r": pa.array(rem - q * w),
                    "q": pa.array(q),
                }
            )

        stepped = materialize_cut(
            st.map_batches(step, batch_format="pyarrow")
        )

        frontier = stepped.map_batches(
            lambda t: t.filter(pc.greater(t.column("q"), 0)).select(
                ["name", "q"]
            ),
            batch_format="pyarrow",
        )
        scat = join_auto(
            edges, frontier, on=("a",), right_on=("name",), num_partitions=P
        )

        def inc_pre(t: pa.Table):
            if t.num_rows == 0 or "q" not in t.schema.names:
                return
            inc = (
                t.column("mult").to_numpy(zero_copy_only=False)
                * t.column("q").to_numpy(zero_copy_only=False)
            )
            g = (
                pa.table({"name": t.column("b"), "r": pa.array(inc)})
                .group_by(["name"])
                .aggregate([("r", "sum")])
            )
            yield g.rename_columns(["name", "r"])

        incs = scat.map_batches(inc_pre, batch_format="pyarrow").map_batches(
            lambda t: t.append_column(
                "p", pa.array(np.zeros(len(t), np.int64))
            ).select(["name", "p", "r"]),
            batch_format="pyarrow",
        )

        kept = stepped.map_batches(
            lambda t: t.select(["name", "p", "r"]), batch_format="pyarrow"
        )
        state = materialize_cut(
            keyed_reagg(
                kept.union(incs), ["name"],
                [("p", "sum"), ("r", "sum")], P,
            )
        )

    return state.map_batches(
        lambda t: t.rename_columns(["name", "p_mass", "r_mass"]),
        batch_format="pyarrow",
    )


def ppr_push_sql() -> str:
    """Unrolled PUSH_ROUNDS-round integer push as AS MATERIALIZED CTEs
    (the greedy-chain rule: default inlining re-evaluates chained
    round CTEs exponentially)."""
    parts = [
        """raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
edges AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS mult FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  ) GROUP BY a, b
),
wdeg AS MATERIALIZED (
  SELECT a AS name, CAST(SUM(mult) AS BIGINT) AS wdeg
  FROM edges GROUP BY a
),
seed AS (SELECT MIN(name) AS name FROM wdeg),
s0 AS MATERIALIZED (
  SELECT name, CAST(0 AS BIGINT) AS p, CAST({S} AS BIGINT) AS r
  FROM seed
)""".format(S=PUSH_SCALE)
    ]
    for i in range(PUSH_ROUNDS):
        parts.append(f"""q{i} AS MATERIALIZED (
  SELECT s.name, s.p + s.r // {PUSH_ALPHA_INV} AS p,
    (s.r - s.r // {PUSH_ALPHA_INV})
      - (((s.r - s.r // {PUSH_ALPHA_INV}) // 2) // w.wdeg) * w.wdeg AS r,
    ((s.r - s.r // {PUSH_ALPHA_INV}) // 2) // w.wdeg AS q
  FROM s{i} s JOIN wdeg w ON w.name = s.name)""")
        parts.append(f"""i{i} AS MATERIALIZED (
  SELECT e.b AS name, CAST(SUM(e.mult * f.q) AS BIGINT) AS r
  FROM edges e JOIN q{i} f ON f.name = e.a AND f.q > 0
  GROUP BY e.b)""")
        parts.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT name, CAST(SUM(p) AS BIGINT) AS p, CAST(SUM(r) AS BIGINT) AS r
  FROM (
    SELECT name, p, r FROM q{i}
    UNION ALL SELECT name, CAST(0 AS BIGINT), r FROM i{i}
  ) GROUP BY name)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT name, p AS p_mass, r AS r_mass FROM s{PUSH_ROUNDS}"
    )


PPR_PUSH_SQL = ppr_push_sql()
