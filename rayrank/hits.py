"""HITS hubs & authorities on the actor-resident shard loop — the
sixth gather/reduce instance (after PageRank, CC, LP, BFS/SSSP,
k-core).

Pinned rule (tests/test_hits.py numpy oracle mirrors it exactly):
multiplicity-weighted adjacency A (A[s,t] = collapsed edge count
s→t, self-loops kept), hub₀ = 1/√n uniform, then per iteration
    auth = Aᵀ·hub / ‖Aᵀ·hub‖₂        (authority half-step)
    hub  = A·auth / ‖A·auth‖₂        (hub half-step)
for a FIXED iteration count (no convergence test — keeps the 2-iter
variant SQL-expressible by unrolling, like pagerank_2iter).

Distribution: Aᵀ·x is the forward shard set's gather (contributions
flow src→dst); A·x is the SAME gather on a derived REVERSED layout
(graph.derive_reversed — same vids/partition sizes, edges swapped).
Each half-step is one gather/reduce round on one set; between
half-steps the normalized result partition p hands off actor-to-actor
(forward p → reversed p, partition-aligned by construction) as an
ObjectRef — the driver moves only the Q sum-of-squares scalars and
never sees a vector.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data

from .graph import GraphMeta


@dataclass
class HitsResult:
    meta: GraphMeta
    auth_refs: list          # per-partition normalized authority vectors
    hub_refs: list           # per-partition normalized hub vectors
    iterations: int
    history: list[dict] = field(default_factory=list)

    def scores_dataset(self, graph_dir: str) -> ray.data.Dataset:
        """(vid, name, auth, hub) — per-partition zip inside tasks, no
        driver-side vector (same contract as PageRankResult)."""
        from .shards import zip_names

        vert_dir = os.path.join(graph_dir, "vertices")
        refs = [
            _zip_two.remote(
                zip_names.remote(vert_dir, q, self.meta.Q, a_ref, "auth"),
                h_ref,
            )
            for q, (a_ref, h_ref) in enumerate(
                zip(self.auth_refs, self.hub_refs)
            )
        ]
        return ray.data.from_arrow_refs(refs)


@ray.remote
def _zip_two(auth_table, hub_vals):
    import pyarrow as pa

    return auth_table.append_column(
        "hub", pa.array(np.asarray(hub_vals, np.float64))
    )


def hits(
    fwd_graph_dir: str,
    rev_graph_dir: str,
    iterations: int = 20,
    shards_fwd: list | None = None,
    shards_rev: list | None = None,
) -> HitsResult:
    """Run the pinned HITS rule for exactly ``iterations`` full
    iterations.  Both graph dirs must share vertex ids and partition
    sizes (build the reversed one with graph.derive_reversed)."""
    from .shards import create_shards, gather_refs

    meta = GraphMeta.load(os.path.join(fwd_graph_dir, "meta.json"))
    rev_meta = GraphMeta.load(os.path.join(rev_graph_dir, "meta.json"))
    assert rev_meta.part_sizes == meta.part_sizes, "layouts must align"
    Q = meta.Q
    if shards_fwd is None:
        shards_fwd = create_shards(fwd_graph_dir, meta)
    if shards_rev is None:
        shards_rev = create_shards(rev_graph_dir, rev_meta)

    n = meta.n
    ray.get([s.init_hits.remote(1.0 / math.sqrt(n)) for s in shards_fwd])

    def half_step(src_set: list, dst_set: list) -> float:
        """One gather/reduce round on src_set; install the normalized
        result as dst_set's gather vector.  Returns ‖result‖₂ before
        normalization (diagnostic)."""
        msgs = gather_refs(src_set, "gather_hits")
        sq_parts = ray.get(
            [
                src_set[q].reduce_hits.remote(*[msgs[p][q] for p in range(Q)])
                for q in range(Q)
            ]
        )
        norm = math.sqrt(sum(sq_parts))
        inv = 1.0 / norm if norm > 0 else 0.0
        ray.get(
            [
                dst_set[p].set_hits_y.remote(src_set[p].hits_result.remote(inv))
                for p in range(Q)
            ]
        )
        return norm

    history: list[dict] = []
    for it in range(iterations):
        auth_norm = half_step(shards_fwd, shards_rev)   # auth = Aᵀ·hub
        hub_norm = half_step(shards_rev, shards_fwd)    # hub  = A·auth
        history.append(
            {"iteration": it, "auth_norm": auth_norm, "hub_norm": hub_norm}
        )

    return HitsResult(
        meta=meta,
        auth_refs=[s.get_hits_y.remote() for s in shards_rev],
        hub_refs=[s.get_hits_y.remote() for s in shards_fwd],
        iterations=iterations,
        history=history,
    )


# --------------------------------------------------------------------------
# SALSA authority scores (exact stationary distribution, no iteration)
# --------------------------------------------------------------------------

SALSA_CC_ITERS = 64  # ≥ bipartite support-graph diameter at oracle scale


def salsa_authority(sf_dir: str) -> ray.data.Dataset:
    """(authority, indeg, comp_size, comp_indeg, salsa) — SALSA
    authority scores of the lineitem link graph, by the Lempel–Moran
    closed form: within a connected component C of the bipartite
    hub–authority SUPPORT graph, the authority Markov chain's
    stationary weight of node i is indeg(i)/indeg(C), and components
    combine weighted by authority count, so

        salsa(i) = (|C ∩ A| / |A|) · indeg(i) / indeg(C).

    Pinned rule: support = DISTINCT directed edges (multiplicity
    ignored — the classic unweighted SALSA); hub side encodes as
    2·src, authority side as 2·dst+1 (disjoint namespaces even when
    one id plays both roles); indeg counts distinct hubs.

    Scale shape: NO power iteration — the exact stationary vector
    costs one distinct-edge reduce, one CC run on the resident shard
    loop over the bipartite layout, one component-keyed reduce
    (components ≤ authority rows), and a label join-back.  The float
    chain is two divides and one multiply, restated identically in
    the SQL oracle (SALSA_AUTH_SQL), so the match is bit-exact."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from .components import canonical_components, connected_components
    from .graph import build_graph, derive_undirected
    from .joins import join_auto
    from .pipelines import P, sf_edges
    from .shuffle import keyed_reagg

    def ded_pre(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        g = (
            pa.table({"s": t.column("src"), "t": t.column("dst")})
            .group_by(["s", "t"])
            .aggregate([])
        )
        yield g.rename_columns(["s", "t"])

    ded = keyed_reagg(
        sf_edges(sf_dir).map_batches(ded_pre, batch_format="pyarrow"),
        ["s", "t"], [], P,
    ).materialize()

    def bip_names(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("t").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "src_name": pc.cast(pa.array(2 * s), pa.string()),
                "dst_name": pc.cast(pa.array(2 * d + 1), pa.string()),
            }
        )

    gdir = tempfile.mkdtemp(prefix="rayrank_salsa_")
    build_graph(
        ded.map_batches(bip_names, batch_format="pyarrow"),
        gdir, num_partitions=P,
    )
    udir = tempfile.mkdtemp(prefix="rayrank_salsa_und_")
    derive_undirected(gdir, udir)
    cc = connected_components(udir, max_iterations=SALSA_CC_ITERS)
    labels = canonical_components(cc, udir)

    def auth_rows(t: pa.Table):
        if t.num_rows == 0 or "name" not in t.schema.names:
            return
        enc = pc.cast(t.column("name"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        odd = enc % 2 == 1
        if not odd.any():
            return
        yield pa.table(
            {
                "authority": pa.array((enc[odd] - 1) // 2),
                "component": t.column("component").filter(pa.array(odd)),
            }
        )

    auths = labels.map_batches(auth_rows, batch_format="pyarrow")

    def ind_pre(t: pa.Table):
        if t.num_rows == 0 or "t" not in t.schema.names:
            return
        g = (
            t.select(["t"])
            .append_column("c", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by(["t"])
            .aggregate([("c", "sum")])
        )
        yield g.rename_columns(["authority", "indeg"])

    ind = keyed_reagg(
        ded.map_batches(ind_pre, batch_format="pyarrow"),
        ["authority"], [("indeg", "sum")], P,
    )
    aj = join_auto(auths, ind, on=("authority",), num_partitions=P)

    def comp_pre(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        g = (
            t.select(["component", "indeg"])
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by(["component"])
            .aggregate([("n", "sum"), ("indeg", "sum")])
        )
        yield g.rename_columns(["component", "comp_size", "comp_indeg"])

    comp = keyed_reagg(
        aj.map_batches(comp_pre, batch_format="pyarrow"),
        ["component"], [("comp_size", "sum"), ("comp_indeg", "sum")], P,
    ).materialize()
    n_auth = int(comp.sum("comp_size"))

    out = join_auto(aj, comp, on=("component",), num_partitions=P)

    def score(t: pa.Table):
        if t.num_rows == 0 or "comp_indeg" not in t.schema.names:
            return
        cs = t.column("comp_size").to_numpy(zero_copy_only=False)
        ci = t.column("comp_indeg").to_numpy(zero_copy_only=False)
        d = t.column("indeg").to_numpy(zero_copy_only=False)
        salsa = (cs.astype(np.float64) / np.float64(n_auth)) * (
            d.astype(np.float64) / ci.astype(np.float64)
        )
        yield pa.table(
            {
                "authority": t.column("authority"),
                "indeg": t.column("indeg"),
                "comp_size": t.column("comp_size"),
                "comp_indeg": t.column("comp_indeg"),
                "salsa": pa.array(salsa),
            }
        )

    return out.map_batches(score, batch_format="pyarrow")


SALSA_AUTH_SQL = f"""
WITH RECURSIVE
rawd AS (
  SELECT DISTINCT l_orderkey * 2 AS s, l_partkey * 2 + 1 AS t FROM lineitem
),
sverts AS (SELECT DISTINCT v FROM (
  SELECT CAST(s AS VARCHAR) AS v FROM rawd
  UNION ALL SELECT CAST(t AS VARCHAR) FROM rawd
)),
sund AS (SELECT DISTINCT a, b FROM (
  SELECT CAST(s AS VARCHAR) AS a, CAST(t AS VARCHAR) AS b FROM rawd
  UNION ALL SELECT CAST(t AS VARCHAR), CAST(s AS VARCHAR) FROM rawd
  UNION ALL SELECT v, v FROM sverts
)),
slab(it, v, l) AS (
  SELECT 0, v, v FROM sverts
  UNION ALL
  SELECT slab.it + 1, e.b, MIN(slab.l)
  FROM slab JOIN sund e ON slab.v = e.a
  WHERE slab.it < {SALSA_CC_ITERS}
  GROUP BY slab.it + 1, e.b
),
comp AS (SELECT v, l FROM slab WHERE it = {SALSA_CC_ITERS}),
ind AS (SELECT t AS enc, CAST(COUNT(*) AS BIGINT) AS indeg FROM rawd GROUP BY t),
aj AS (
  SELECT CAST(c.v AS BIGINT) AS enc, c.l, i.indeg
  FROM comp c JOIN ind i ON CAST(c.v AS BIGINT) = i.enc
),
g AS (
  SELECT l, CAST(COUNT(*) AS BIGINT) AS comp_size,
    CAST(SUM(indeg) AS BIGINT) AS comp_indeg
  FROM aj GROUP BY l
),
na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM aj)
SELECT (aj.enc - 1) // 2 AS authority, aj.indeg, g.comp_size, g.comp_indeg,
  (CAST(g.comp_size AS DOUBLE) / CAST((SELECT n FROM na) AS DOUBLE))
  * (CAST(aj.indeg AS DOUBLE) / CAST(g.comp_indeg AS DOUBLE)) AS salsa
FROM aj JOIN g ON g.l = aj.l
"""
