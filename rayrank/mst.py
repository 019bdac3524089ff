"""Distributed minimum spanning forest via Borůvka rounds — THE
textbook distributed MST algorithm (each component picks its minimum
outgoing edge, all picks join the forest, components contract;
O(log V) rounds).  Every primitive is one the engine already ships:
keyed relabel joins, a repartition + block-local first-per-key pick,
the distributed CC kernel for contraction, and bounded map joins.

Determinism: edges are ordered by the STRICT total order (w, u, v), so
the forest is unique (cut property with distinct composite weights) and
pytest can compare the edge SET exactly against networkx run on the
same composite weights.  No SQL oracle (an iterative contraction
fixpoint is not single-query SQL) — rows-only for the driver, exact
under pytest.

Scale notes: the per-round edge relabel is two hash joins over the
surviving cross-component edges (halving-ish per round); the pick
shuffles one candidate row per edge-side; contraction runs CC on the
CHOSEN edge set (≤ #components rows, ≥2× shrink per round).  The
vertex→component table is V rows and only ever joins against the
bounded component→supercomponent map.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from . import configure_data_context
from .graph import build_graph
from .joins import join_auto
from .shuffle import keyed_reagg

configure_data_context()

P = 8


def _first_per_comp(t: pa.Table):
    """Block-local minimum outgoing edge per component by the strict
    (w, u, v) order — blocks are comp-complete after the keyed
    repartition, so the block winner IS the global winner."""
    if t.num_rows == 0 or "comp" not in t.schema.names:
        return
    comp = t.column("comp").to_numpy(zero_copy_only=False)
    w = t.column("w").to_numpy(zero_copy_only=False)
    u = t.column("u").to_numpy(zero_copy_only=False)
    v = t.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u, w, comp))
    comp_s = comp[order]
    firsts = order[np.flatnonzero(np.r_[True, comp_s[1:] != comp_s[:-1]])]
    yield t.take(pa.array(firsts))


def boruvka_forest(edges: ray.data.Dataset, max_rounds: int = 64):
    """Minimum spanning forest of a distinct undirected edge Dataset
    (u, v, w) with u < v.  Returns (forest_dataset, rounds): the
    forest rows are (u, v, w)."""
    def verts(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        both = pa.concat_arrays(
            [
                t.column("u").combine_chunks(),
                t.column("v").combine_chunks(),
            ]
        )
        g = pa.table({"vertex": both}).group_by(["vertex"]).aggregate([])
        yield g.rename_columns(["vertex"])

    comp = keyed_reagg(
        edges.map_batches(verts, batch_format="pyarrow"),
        ["vertex"], [], P,
    ).map_batches(
        lambda t: pa.table(
            {"vertex": t.column("vertex"), "comp": t.column("vertex")}
        ),
        batch_format="pyarrow",
    ).materialize()

    cur = edges.materialize()
    forest = None
    rounds = 0
    for _ in range(max_rounds):
        j1 = join_auto(cur, comp, on=("u",), right_on=("vertex",),
                       num_partitions=P)

        def r1(t: pa.Table):
            if t.num_rows == 0 or "comp" not in t.schema.names:
                return
            yield pa.table(
                {
                    "u": t.column("u"), "v": t.column("v"),
                    "w": t.column("w"), "cu": t.column("comp"),
                }
            )

        j2 = join_auto(
            j1.map_batches(r1, batch_format="pyarrow"), comp,
            on=("v",), right_on=("vertex",), num_partitions=P,
        )

        def cross_only(t: pa.Table):
            if t.num_rows == 0 or "comp" not in t.schema.names:
                return
            keep = pc.invert(pc.equal(t.column("cu"), t.column("comp")))
            t2 = t.filter(keep)
            if t2.num_rows:
                yield pa.table(
                    {
                        "u": t2.column("u"), "v": t2.column("v"),
                        "w": t2.column("w"), "cu": t2.column("cu"),
                        "cv": t2.column("comp"),
                    }
                )

        cross = j2.map_batches(
            cross_only, batch_format="pyarrow"
        ).materialize()
        if cross.count() == 0:
            break
        rounds += 1

        def both_sides(t: pa.Table):
            if t.num_rows == 0 or "cu" not in t.schema.names:
                return
            yield pa.table(
                {
                    "comp": pa.concat_arrays(
                        [
                            t.column("cu").combine_chunks(),
                            t.column("cv").combine_chunks(),
                        ]
                    ),
                    "w": pa.concat_arrays(
                        [t.column("w").combine_chunks()] * 2
                    ),
                    "u": pa.concat_arrays(
                        [t.column("u").combine_chunks()] * 2
                    ),
                    "v": pa.concat_arrays(
                        [t.column("v").combine_chunks()] * 2
                    ),
                    "ocu": pa.concat_arrays(
                        [t.column("cu").combine_chunks()] * 2
                    ),
                    "ocv": pa.concat_arrays(
                        [t.column("cv").combine_chunks()] * 2
                    ),
                }
            )

        cands = cross.map_batches(both_sides, batch_format="pyarrow")
        picked = (
            cands.repartition(P, keys=["comp"])
            .map_batches(
                _first_per_comp, batch_size=None, batch_format="pyarrow"
            )
            .map_batches(  # block-local pre-dedup before the pair re-agg
                lambda t: t.select(["u", "v", "w", "ocu", "ocv"])
                .group_by(["u", "v", "w", "ocu", "ocv"])
                .aggregate([])
                .rename_columns(["u", "v", "w", "ocu", "ocv"]),
                batch_format="pyarrow",
            )
        )
        chosen = keyed_reagg(
            picked, ["u", "v", "w", "ocu", "ocv"], [], P
        ).materialize()  # a pair picked by both sides dedups here

        new_forest = chosen.map_batches(
            lambda t: t.select(["u", "v", "w"]), batch_format="pyarrow"
        )
        forest = new_forest if forest is None else forest.union(new_forest)

        # contract: CC over the chosen (ocu, ocv) component graph
        def cnames(t: pa.Table):
            if t.num_rows == 0 or "ocu" not in t.schema.names:
                return
            yield pa.table(
                {
                    "src_name": pc.cast(t.column("ocu"), pa.string()),
                    "dst_name": pc.cast(t.column("ocv"), pa.string()),
                }
            )

        from .components import canonical_components, connected_components

        gdir = tempfile.mkdtemp(prefix="rayrank_mst_round_")
        build_graph(
            chosen.map_batches(cnames, batch_format="pyarrow"),
            gdir, num_partitions=P, undirected=True,
        )
        labels = canonical_components(connected_components(gdir), gdir)

        def as_map(t: pa.Table):
            if t.num_rows == 0 or "component" not in t.schema.names:
                return
            yield pa.table(
                {
                    "old": pc.cast(t.column("name"), pa.int64()),
                    "super": pc.cast(t.column("component"), pa.int64()),
                }
            )

        cmap = labels.map_batches(as_map, batch_format="pyarrow")
        j = join_auto(
            comp, cmap, on=("comp",), right_on=("old",),
            how="left_outer", num_partitions=P,
        )

        def upd(t: pa.Table):
            if t.num_rows == 0 or "vertex" not in t.schema.names:
                return
            yield pa.table(
                {
                    "vertex": t.column("vertex"),
                    "comp": pc.coalesce(t.column("super"), t.column("comp")),
                }
            )

        # materialize_cut: comp and cur self-chain across rounds and are
        # each referenced twice per round (both-endpoint joins) — uncut
        # lineage doubles the plan per round (shuffle.materialize_cut)
        from .shuffle import materialize_cut

        comp = materialize_cut(j.map_batches(upd, batch_format="pyarrow"))
        cur = materialize_cut(
            cross.map_batches(
                lambda t: t.select(["u", "v", "w"]), batch_format="pyarrow"
            )
        )

    if forest is None:
        forest = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        )
    return forest, rounds


# --------------------------------------------------------------------------
# unrolled SQL oracle (driver check for pipelines.mst_edges)
# --------------------------------------------------------------------------

MST_SQL_ROUNDS = 5   # Borůvka fixpoint: 2 rounds at sf0.001, 3 at sf0.01
MST_CC_ITERS = 32    # contraction min-label depth: ≤ 10 measured per round


def boruvka_sql() -> str:
    """Borůvka rounds UNROLLED (the truss/Luby bounded-round trick):
    per round, cross-component edges relabel through the previous
    vertex→component map, each component picks its minimum (w, u, v)
    candidate via ROW_NUMBER, and contraction is a per-round recursive
    min-label CC CTE over the picked component pairs (multiple
    recursive CTEs coexist in one WITH RECURSIVE — the
    attack_robustness precedent).  Component labels here are numeric
    mins while the engine uses min-NAME string reps, but the PARTITION
    is representative-independent, so the per-component pick — and
    therefore the forest — is identical.  Extra rounds past the
    fixpoint see no cross edges and are no-ops."""
    head = """
WITH RECURSIVE
eds AS MATERIALIZED (
  SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v,
    CAST(COUNT(*) AS BIGINT) AS w
  FROM (SELECT l_orderkey AS a, l_partkey AS b FROM lineitem)
  WHERE a <> b GROUP BY 1, 2
),
vt AS (SELECT DISTINCT x AS v FROM (SELECT u AS x FROM eds UNION ALL SELECT v FROM eds)),
c0 AS MATERIALIZED (SELECT v, v AS c FROM vt)"""
    parts, picks = [], []
    for r in range(1, MST_SQL_ROUNDS + 1):
        p = r - 1
        parts.append(f"""x{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.w, a.c AS cu, b.c AS cv
  FROM eds e JOIN c{p} a ON a.v = e.u JOIN c{p} b ON b.v = e.v
  WHERE a.c <> b.c
),
cand{r} AS (
  SELECT cu AS comp, w, u, v, cu, cv FROM x{r}
  UNION ALL SELECT cv, w, u, v, cu, cv FROM x{r}
),
pick{r} AS MATERIALIZED (
  SELECT DISTINCT u, v, w, cu, cv FROM (
    SELECT u, v, w, cu, cv,
      ROW_NUMBER() OVER (PARTITION BY comp ORDER BY w, u, v) AS rn
    FROM cand{r}
  ) WHERE rn = 1
),
pv{r} AS (SELECT DISTINCT x FROM (SELECT cu AS x FROM pick{r} UNION ALL SELECT cv FROM pick{r})),
padj{r} AS (
  SELECT cu AS a, cv AS b FROM pick{r}
  UNION ALL SELECT cv, cu FROM pick{r}
  UNION ALL SELECT x, x FROM pv{r}
),
lab{r}(it, n, l) AS (
  SELECT 0, x, x FROM pv{r}
  UNION ALL
  SELECT lab{r}.it + 1, e.b, MIN(lab{r}.l)
  FROM lab{r} JOIN padj{r} e ON lab{r}.n = e.a
  WHERE lab{r}.it < {MST_CC_ITERS}
  GROUP BY lab{r}.it + 1, e.b
),
sup{r} AS MATERIALIZED (SELECT n, l FROM lab{r} WHERE it = {MST_CC_ITERS}),
c{r} AS MATERIALIZED (
  SELECT cp.v, COALESCE(s.l, cp.c) AS c
  FROM c{p} cp LEFT JOIN sup{r} s ON s.n = cp.c
)""")
        picks.append(f"SELECT u, v, w FROM pick{r}")
    return (
        head + ",\n" + ",\n".join(parts)
        + "\nSELECT DISTINCT u, v, w FROM ("
        + " UNION ALL ".join(picks) + ")"
    )
