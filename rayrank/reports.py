"""Decision-support shapes, third batch: the TPC-H Q2/Q11/Q15/Q19/Q20
analogues that were still missing from the relational surface —
global-fraction HAVING against a broadcast scalar, max-of-aggregate
with ties kept, argmin-by with dimension enrichment, disjunctive
predicate pushdown, and a two-level dominance aggregate that reuses
one keyed shuffle for both levels.

Exactness strategy is the one pinned in :mod:`rayrank.relational`:
snap 2-decimal monetary factors to int64, aggregate in integers,
convert to double ONCE with an expression restated identically in the
SQL oracle.  The Q11 HAVING avoids the int64 overflow in
``rev·n > 2·tot`` by rewriting it as ``rev > (3·tot)//(2·n)`` — for
positive integers ``rev·2n > 3·tot ⇔ rev > floor(3·tot/2n)`` — so the
only wide product lives in driver-side Python ints (and HUGEINT in
SQL), never in a numpy column.

Scale notes: fact scans pre-aggregate per block before any shuffle;
dimension sides (part, supplier, nation) ride ``join_auto``'s
broadcast guard; supplier-cardinality finals use the coalesce +
in-block re-agg pattern (pricing_summary); the Q20 dominance filter
computes both aggregation levels inside the blocks of ONE partkey-
keyed repartition (per-(part,supp) sums and per-part totals are
co-located by construction).

Reference parity: the reference repo (/root/reference/pagerank.py) has
no decision-support surface; these generalize its "rank and report"
flow (pagerank.py:241-258) to relational analytics per SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from . import configure_data_context
from .joins import join_auto
from .relational import P, _i64, _read, _ts
from .shuffle import keyed_reagg

configure_data_context()  # entry path: hash-shuffle strategy required



def _read_lineitem_window(
    sf_dir: str, cols: list[str], lo: tuple, hi: tuple
) -> ray.data.Dataset:
    """Column-pruned lineitem scan with the ship-date window pushed to
    the parquet reader (row-group/predicate pushdown — rows outside the
    window never leave storage).  The in-block re-filter in each
    consumer stays: pushdown granularity is the row group, so residual
    rows can appear, and exactness must not depend on reader behavior."""
    import datetime as _dt
    import os as _os

    import pyarrow.dataset as _pds

    f = (_pds.field("l_shipdate") >= _dt.datetime(*lo)) & (
        _pds.field("l_shipdate") < _dt.datetime(*hi)
    )
    return ray.data.read_parquet(
        _os.path.join(sf_dir, "lineitem.parquet"), columns=cols, filter=f
    )


def _ones(n: int) -> pa.Array:
    return pa.array(np.ones(n, np.int64))


def _rev_i(t: pa.Table) -> np.ndarray:
    """Exact discounted revenue in cents·hundredths (int64)."""
    price_c = _i64(t.column("l_extendedprice"), 100)
    disc_b = _i64(t.column("l_discount"), 100)
    return price_c * (100 - disc_b)


# --------------------------------------------------------------------------
# important parts (TPC-H Q11 shape): HAVING vs a global-fraction scalar
# --------------------------------------------------------------------------


def important_parts(sf_dir: str) -> ray.data.Dataset:
    """Parts whose discounted revenue exceeds 1.5× the mean per-part
    revenue — the group-sum-vs-global-scalar HAVING shape.  One keyed
    shuffle reduces (partkey, rev_i); the global (count, total) folds
    from O(blocks) two-int partials on the driver; the filter then
    streams the reduced table against the broadcast threshold.  The
    reduced table is materialized once (bounded by |parts| rows) so
    the scalar pass and the filter pass share one execution."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = pa.table(
            {"l_partkey": t.column("l_partkey"), "rev_i": pa.array(_rev_i(t))}
        ).group_by(["l_partkey"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["l_partkey", "rev_i"])

    cols = ["l_partkey", "l_extendedprice", "l_discount"]
    per_part = keyed_reagg(
        _read(sf_dir, "lineitem", cols).map_batches(pre, batch_format="pyarrow"),
        ["l_partkey"], [("rev_i", "sum")], P,
    ).materialize()

    def stats(t: pa.Table):
        if t.num_rows == 0 or "rev_i" not in t.schema.names:
            return
        r = t.column("rev_i").to_numpy(zero_copy_only=False)
        yield pa.table(
            {"n": pa.array([len(r)]), "tot": pa.array([int(r.sum())])}
        )

    parts = per_part.map_batches(stats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    tot = sum(r["tot"] for r in parts)
    # rev·2n > 3·tot  ⇔  rev > floor(3·tot / 2n)   (positive ints)
    thresh = (3 * tot) // (2 * n) if n else 0

    def having(t: pa.Table):
        if t.num_rows == 0 or "rev_i" not in t.schema.names:
            return
        t = t.filter(pc.greater(t.column("rev_i"), thresh))
        if len(t) == 0:
            return
        rev = t.column("rev_i").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "revenue": pa.array(rev.astype(np.float64) / 10000.0),
            }
        )

    return per_part.map_batches(having, batch_format="pyarrow")


IMPORTANT_PARTS_SQL = """
WITH p AS (
  SELECT l_partkey,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_i
  FROM lineitem GROUP BY 1
), s AS (SELECT COUNT(*) AS n, SUM(rev_i) AS tot FROM p)
SELECT p.l_partkey, CAST(p.rev_i AS DOUBLE) / 10000.0 AS revenue
FROM p, s WHERE p.rev_i > (3 * s.tot) // (2 * s.n)
"""


# --------------------------------------------------------------------------
# top suppliers (TPC-H Q15 shape): max-of-aggregate, ties kept
# --------------------------------------------------------------------------

Q15_WINDOW = ((1997, 10, 1), (1998, 1, 1))


def top_suppliers(sf_dir: str) -> ray.data.Dataset:
    """Supplier(s) with the maximum discounted revenue in one quarter
    — the aggregate-then-argmax-with-ties shape.  Per-supplier partials
    coalesce to one block (≤ |suppliers| rows), the max and the tie
    filter fold in that block (no second pass / no window function),
    and the supplier dimension joins broadcast."""
    cols = ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(*Q15_WINDOW[0])),
            pc.less(t.column("l_shipdate"), _ts(*Q15_WINDOW[1])),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        g = pa.table(
            {"l_suppkey": t.column("l_suppkey"), "rev_i": pa.array(_rev_i(t))}
        ).group_by(["l_suppkey"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["l_suppkey", "rev_i"])

    g = (
        _read_lineitem_window(sf_dir, cols, Q15_WINDOW[0], Q15_WINDOW[1])
        .map_batches(pre, batch_format="pyarrow")
        .repartition(1)
    )

    def pick_max(t: pa.Table):
        if t.num_rows == 0 or "l_suppkey" not in t.schema.names:
            return
        g2 = t.group_by(["l_suppkey"]).aggregate([("rev_i", "sum")])
        g2 = g2.rename_columns(["l_suppkey", "rev_i"])
        rev = g2.column("rev_i").to_numpy(zero_copy_only=False)
        yield g2.filter(pc.equal(g2.column("rev_i"), int(rev.max())))

    best = g.map_batches(pick_max, batch_size=None, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    j = join_auto(
        best, supp, on=("l_suppkey",), right_on=("s_suppkey",),
        num_partitions=P,
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "s_name" not in t.schema.names:
            return
        rev = t.column("rev_i").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "s_name": t.column("s_name"),
                "total_revenue": pa.array(rev.astype(np.float64) / 10000.0),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


TOP_SUPPLIERS_SQL = """
WITH r AS (
  SELECT l_suppkey,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_i
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-10-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev_i AS DOUBLE) / 10000.0 AS total_revenue
FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev_i = (SELECT MAX(rev_i) FROM r)
"""


# --------------------------------------------------------------------------
# disjunctive revenue (TPC-H Q19 shape): OR'd conjunct groups, pushdown
# --------------------------------------------------------------------------

# (p_type, qty_lo, qty_hi, size_hi) conjunct groups; the scan prefilter
# is their union hull (qty 1..30), the part prefilter their type set.
Q19_GROUPS = (
    ("SMALL", 1, 11, 15),
    ("MEDIUM", 10, 20, 25),
    ("LARGE", 20, 30, 35),
)


def disjunctive_revenue(sf_dir: str) -> ray.data.Dataset:
    """Total discounted revenue over three OR'd (type, quantity-range,
    size-range) conjunct groups — the disjunctive-predicate join shape.
    The union hull of the quantity ranges prefilters the fact scan and
    the type set prefilters the part dimension BEFORE the join (the
    pushdown the disjunction allows); the residual OR evaluates as one
    vectorized mask after the broadcast-guarded join.  Single-row
    output; partials coalesce as one int per block."""
    qty_lo = min(g[1] for g in Q19_GROUPS)
    qty_hi = max(g[2] for g in Q19_GROUPS)
    size_hi = max(g[3] for g in Q19_GROUPS)
    types = [g[0] for g in Q19_GROUPS]

    cols = ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        q = _i64(t.column("l_quantity"))
        t = t.filter(pa.array((q >= qty_lo) & (q <= qty_hi)))
        if len(t) == 0:
            return
        yield pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty": pa.array(_i64(t.column("l_quantity"))),
                "rev_i": pa.array(_rev_i(t)),
            }
        )

    li = _read(sf_dir, "lineitem", cols).map_batches(pre, batch_format="pyarrow")

    part = _read(sf_dir, "part", ["p_partkey", "p_type", "p_size"])

    def part_pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.is_in(t.column("p_type"), value_set=pa.array(types)),
            pc.less_equal(t.column("p_size"), size_hi),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        yield t

    j = join_auto(
        li, part.map_batches(part_pre, batch_format="pyarrow"),
        on=("l_partkey",), right_on=("p_partkey",), num_partitions=P,
    )

    def mask_sum(t: pa.Table):
        if len(t) == 0 or "p_type" not in t.schema.names:
            return
        q = t.column("qty").to_numpy(zero_copy_only=False)
        sz = t.column("p_size").to_numpy(zero_copy_only=False)
        ty = t.column("p_type")
        keep = np.zeros(len(t), bool)
        for typ, lo, hi, smax in Q19_GROUPS:
            tm = pc.equal(ty, typ).to_numpy(zero_copy_only=False)
            keep |= tm & (q >= lo) & (q <= hi) & (sz >= 1) & (sz <= smax)
        rev = t.column("rev_i").to_numpy(zero_copy_only=False)
        yield pa.table({"rev_part": pa.array([int(rev[keep].sum())])})

    g = j.map_batches(mask_sum, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        tot = (
            sum(t.column("rev_part").to_pylist())
            if t.num_rows and "rev_part" in t.schema.names
            else 0
        )
        yield pa.table({"revenue": pa.array([float(tot) / 10000.0])})

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


DISJUNCTIVE_REVENUE_SQL = """
SELECT COALESCE(SUM(
    CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
    * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))), 0) / 10000.0
  AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE
  (p.p_type = 'SMALL' AND l.l_quantity BETWEEN 1 AND 11
    AND p.p_size BETWEEN 1 AND 15)
  OR (p.p_type = 'MEDIUM' AND l.l_quantity BETWEEN 10 AND 20
    AND p.p_size BETWEEN 1 AND 25)
  OR (p.p_type = 'LARGE' AND l.l_quantity BETWEEN 20 AND 30
    AND p.p_size BETWEEN 1 AND 35)
"""


# --------------------------------------------------------------------------
# cheapest supplier per part (TPC-H Q2 shape): argmin-by + enrich
# --------------------------------------------------------------------------


def cheapest_supplier_per_part(sf_dir: str) -> ray.data.Dataset:
    """For every part, the supplier offering its minimum line price
    (ties broken by suppkey asc — deterministic) with supplier and
    nation names — the correlated-min subquery shape, decorrelated to
    a two-phase argmin-by (each block keeps one candidate per part,
    ONE keyed repartition co-locates candidates, the same kernel picks
    the final row) followed by two broadcast dimension joins."""
    cols = ["l_partkey", "l_suppkey", "l_extendedprice"]

    def best_per_part(t: pa.Table):
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return
        part = t.column("l_partkey").to_numpy(zero_copy_only=False)
        price = t.column("price_c").to_numpy(zero_copy_only=False)
        supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((supp, price, part))
        p_s = part[order]
        starts = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
        yield t.take(pa.array(order[starts]))

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        t2 = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "price_c": pa.array(_i64(t.column("l_extendedprice"), 100)),
            }
        )
        yield from best_per_part(t2)

    cand = _read(sf_dir, "lineitem", cols).map_batches(
        prep, batch_format="pyarrow"
    )
    co = cand.repartition(P, keys=["l_partkey"])
    best = co.map_batches(best_per_part, batch_size=None, batch_format="pyarrow")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    j = join_auto(
        best, supp, on=("l_suppkey",), right_on=("s_suppkey",),
        num_partitions=P,
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    j2 = join_auto(
        j, nat, on=("s_nationkey",), right_on=("n_nationkey",),
        num_partitions=P,
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "n_name" not in t.schema.names:
            return
        price = t.column("price_c").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "s_name": t.column("s_name"),
                "n_name": t.column("n_name"),
                "best_price": pa.array(price.astype(np.float64) / 100.0),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


CHEAPEST_SUPPLIER_PER_PART_SQL = """
WITH b AS (
  SELECT l_partkey, l_suppkey,
    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c
  FROM lineitem
), c AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY l_partkey ORDER BY price_c, l_suppkey) AS rn
  FROM b
)
SELECT c.l_partkey, s.s_name, n.n_name,
  CAST(c.price_c AS DOUBLE) / 100.0 AS best_price
FROM c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE c.rn = 1
"""


# --------------------------------------------------------------------------
# dominant suppliers (TPC-H Q20 shape): two-level dominance, one shuffle
# --------------------------------------------------------------------------

Q20_YEAR = 1997


def dominant_suppliers(sf_dir: str) -> ray.data.Dataset:
    """Suppliers that shipped MORE THAN HALF of some part's total 1997
    quantity, with how many parts they dominate — the nested half-of-
    total EXISTS shape.  Both aggregation levels ((part,supp) sums and
    per-part totals) and the integer dominance filter ``2·q > tot``
    evaluate inside the blocks of ONE partkey-keyed repartition (the
    shuffle co-locates every (part,·) partial by construction); the
    per-supplier count then coalesces (≤ |suppliers| rows) and the
    supplier dimension joins broadcast."""
    cols = ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(Q20_YEAR, 1, 1)),
            pc.less(t.column("l_shipdate"), _ts(Q20_YEAR + 1, 1, 1)),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        g = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "q": pa.array(_i64(t.column("l_quantity"))),
            }
        ).group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        yield g.rename_columns(["l_partkey", "l_suppkey", "q"])

    co = (
        _read_lineitem_window(
            sf_dir, cols, (Q20_YEAR, 1, 1), (Q20_YEAR + 1, 1, 1)
        )
        .map_batches(pre, batch_format="pyarrow")
        .repartition(P, keys=["l_partkey"])
    )

    def dominate(t: pa.Table):
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        g = g.rename_columns(["l_partkey", "l_suppkey", "q"])
        part = g.column("l_partkey").to_numpy(zero_copy_only=False)
        q = g.column("q").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(part, return_inverse=True)
        tots = np.zeros(len(uniq), np.int64)
        np.add.at(tots, inv, q)
        mask = 2 * q > tots[inv]
        if not mask.any():
            return
        kept = g.filter(pa.array(mask))
        yield pa.table(
            {
                "l_suppkey": kept.column("l_suppkey"),
                "n": _ones(len(kept)),
            }
        )

    g = (
        co.map_batches(dominate, batch_size=None, batch_format="pyarrow")
        .repartition(1)
    )

    def per_supp(t: pa.Table):
        if t.num_rows == 0 or "l_suppkey" not in t.schema.names:
            return
        g2 = t.group_by(["l_suppkey"]).aggregate([("n", "sum")])
        yield g2.rename_columns(["l_suppkey", "dominated_parts"])

    counts = g.map_batches(per_supp, batch_size=None, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    j = join_auto(
        counts, supp, on=("l_suppkey",), right_on=("s_suppkey",),
        num_partitions=P,
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "s_name" not in t.schema.names:
            return
        yield pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "s_name": t.column("s_name"),
                "dominated_parts": t.column("dominated_parts"),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


DOMINANT_SUPPLIERS_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01'
    AND l_shipdate < TIMESTAMP '{Q20_YEAR + 1}-01-01'
  GROUP BY 1, 2
), t AS (SELECT l_partkey, SUM(q) AS tot FROM ps GROUP BY 1),
d AS (
  SELECT ps.l_suppkey, CAST(COUNT(*) AS BIGINT) AS dominated_parts
  FROM ps JOIN t USING (l_partkey)
  WHERE 2 * ps.q > t.tot GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, d.dominated_parts
FROM d JOIN supplier s ON d.l_suppkey = s.s_suppkey
"""

# --------------------------------------------------------------------------
# market share (TPC-H Q8 shape): conditional share per group
# --------------------------------------------------------------------------

Q8_SUPP_NATION = "NATION_0"
Q8_REGION = "AMERICA"
P_WIDE = 32  # the order-grain reduce/join stages of the Q8 funnel


def market_share(sf_dir: str) -> ray.data.Dataset:
    """Per order year, the revenue share supplied by one nation's
    suppliers within one customer region — the CASE-numerator /
    total-denominator ratio shape over a 5-table funnel.  The supplier
    flag folds into a per-(orderkey, flag) partial BEFORE the
    order join (≤ 2 rows per order cross the big-big shuffle), the
    customer side joins hash-partitioned, nation/region filters
    broadcast, and the per-year num/den pairs coalesce as int partials.
    The final division is one double op restated identically in SQL."""
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    j_supp = join_auto(
        li, supp, on=("l_suppkey",), right_on=("s_suppkey",),
        num_partitions=P,
    )
    j_sn = join_auto(
        j_supp, nat.map_batches(
            lambda t: t.rename_columns(["sn_key", "sn_name", "sn_reg"]),
            batch_format="pyarrow",
        ),
        on=("s_nationkey",), right_on=("sn_key",), num_partitions=P,
    )

    def pre(t: pa.Table):
        if len(t) == 0 or "sn_name" not in t.schema.names:
            return
        rev = _rev_i(t)
        flag = pc.equal(t.column("sn_name"), Q8_SUPP_NATION).to_numpy(
            zero_copy_only=False
        )
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "num_i": pa.array(np.where(flag, rev, 0)),
                "den_i": pa.array(rev),
            }
        ).group_by(["l_orderkey"]).aggregate([("num_i", "sum"), ("den_i", "sum")])
        yield g.rename_columns(["l_orderkey", "num_i", "den_i"])

    li_agg = keyed_reagg(
        j_sn.map_batches(pre, batch_format="pyarrow"),
        ["l_orderkey"], [("num_i", "sum"), ("den_i", "sum")], P_WIDE,
    )

    # region filter pushes to the CUSTOMER side before any big join:
    # only the target region's customers (≈1/|regions| of them) reach
    # the orders semi-join, and the 5-table funnel needs no post-join
    # region filter at all
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j_cn = join_auto(
        cust, nat.map_batches(
            lambda t: t.rename_columns(["cn_key", "cn_name", "cn_reg"]),
            batch_format="pyarrow",
        ),
        on=("c_nationkey",), right_on=("cn_key",), num_partitions=P,
    )
    j_cr = join_auto(
        j_cn, reg, on=("cn_reg",), right_on=("r_regionkey",),
        num_partitions=P,
    )

    def am_keys(t: pa.Table):
        if len(t) == 0 or "r_name" not in t.schema.names:
            return
        t = t.filter(pc.equal(t.column("r_name"), Q8_REGION))
        if len(t):
            yield t.select(["c_custkey"])

    cust_am = j_cr.map_batches(am_keys, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_year": pc.year(t.column("o_orderdate")),
            }
        )

    orders_f = join_auto(
        orders.map_batches(o_prep, batch_format="pyarrow"), cust_am,
        on=("o_custkey",), right_on=("c_custkey",), how="semi",
        num_partitions=P_WIDE,
    )
    j_o = join_auto(
        li_agg, orders_f,
        on=("l_orderkey",), right_on=("o_orderkey",), num_partitions=P_WIDE,
    )

    def per_year(t: pa.Table):
        if len(t) == 0 or "o_year" not in t.schema.names:
            return
        g = pa.table(
            {
                "o_year": t.column("o_year"),
                "num_i": t.column("num_i"),
                "den_i": t.column("den_i"),
            }
        ).group_by(["o_year"]).aggregate([("num_i", "sum"), ("den_i", "sum")])
        yield g.rename_columns(["o_year", "num_i", "den_i"])

    g = j_o.map_batches(per_year, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "o_year" not in t.schema.names:
            return
        g2 = t.group_by(["o_year"]).aggregate([("num_i", "sum"), ("den_i", "sum")])
        g2 = g2.rename_columns(["o_year", "num_i", "den_i"])
        num = g2.column("num_i").to_numpy(zero_copy_only=False)
        den = g2.column("den_i").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "o_year": pc.cast(g2.column("o_year"), pa.int64()),
                "mkt_share": pa.array(
                    num.astype(np.float64) / den.astype(np.float64)
                ),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


MARKET_SHARE_SQL = f"""
WITH f AS (
  SELECT l.l_orderkey,
    CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT)) AS rev_i,
    (sn.n_name = '{Q8_SUPP_NATION}') AS is_supp
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
)
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CASE WHEN f.is_supp THEN f.rev_i ELSE 0 END) AS DOUBLE)
    / CAST(SUM(f.rev_i) AS DOUBLE) AS mkt_share
FROM f
JOIN orders o ON f.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q8_REGION}'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# top brand per nation: argmax-of-aggregate per group
# --------------------------------------------------------------------------


def top_brand_by_nation(sf_dir: str) -> ray.data.Dataset:
    """For each supplier nation, the part brand with the highest
    discounted revenue (ties broken by brand asc) — argmax over a
    two-key aggregate.  The (nation, brand) reduced table is tiny
    (nations·brands rows), so it coalesces to one block where the
    re-agg and the per-nation argmax run together; the fact scan
    pre-aggregates per (suppkey, brand) after a broadcast-guarded
    part join."""
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    j_p = join_auto(
        li, part, on=("l_partkey",), right_on=("p_partkey",),
        num_partitions=P,
    )

    def pre(t: pa.Table):
        if len(t) == 0 or "p_brand" not in t.schema.names:
            return
        g = pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "p_brand": t.column("p_brand"),
                "rev_i": pa.array(_rev_i(t)),
            }
        ).group_by(["l_suppkey", "p_brand"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["l_suppkey", "p_brand", "rev_i"])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    j_s = join_auto(
        j_p.map_batches(pre, batch_format="pyarrow"), supp,
        on=("l_suppkey",), right_on=("s_suppkey",), num_partitions=P,
    )
    j_n = join_auto(
        j_s, nat, on=("s_nationkey",), right_on=("n_nationkey",),
        num_partitions=P,
    )

    def nb_pre(t: pa.Table):
        if len(t) == 0 or "n_name" not in t.schema.names:
            return
        g = t.select(["n_name", "p_brand", "rev_i"]).group_by(
            ["n_name", "p_brand"]
        ).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["n_name", "p_brand", "rev_i"])

    g = j_n.map_batches(nb_pre, batch_format="pyarrow").repartition(1)

    def argmax(t: pa.Table):
        if t.num_rows == 0 or "n_name" not in t.schema.names:
            return
        g2 = t.group_by(["n_name", "p_brand"]).aggregate([("rev_i", "sum")])
        g2 = g2.rename_columns(["n_name", "p_brand", "rev_i"])
        nat_np = np.asarray(g2.column("n_name").to_pylist(), dtype=object)
        brand_np = np.asarray(g2.column("p_brand").to_pylist(), dtype=object)
        rev = g2.column("rev_i").to_numpy(zero_copy_only=False)
        order = np.lexsort((brand_np, -rev, nat_np))
        n_s = nat_np[order]
        starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
        best = g2.take(pa.array(order[starts]))
        rev_b = best.column("rev_i").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "n_name": best.column("n_name"),
                "p_brand": best.column("p_brand"),
                "revenue": pa.array(rev_b.astype(np.float64) / 10000.0),
            }
        )

    return g.map_batches(argmax, batch_size=None, batch_format="pyarrow")


TOP_BRAND_BY_NATION_SQL = """
WITH r AS (
  SELECT n.n_name, p.p_brand,
    SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS rev_i
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
), c AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY n_name ORDER BY rev_i DESC, p_brand) AS rn
  FROM r
)
SELECT n_name, p_brand, CAST(rev_i AS DOUBLE) / 10000.0 AS revenue
FROM c WHERE rn = 1
"""


# --------------------------------------------------------------------------
# supplier revenue concentration (Herfindahl index) per nation
# --------------------------------------------------------------------------


def nation_supplier_hhi(sf_dir: str) -> ray.data.Dataset:
    """(n_name, n_suppliers, hhi) — Herfindahl–Hirschman concentration
    of discounted revenue across each nation's suppliers:
    HHI = Σ rev_i² / (Σ rev_i)² over the nation's per-supplier exact
    integer revenues.  The squares exceed int64 at scale (Q11 lesson:
    never put a wide product in an int64 column), so the fold runs in
    Python ints over the supplier-DIMENSION-bounded reduced table; the
    only float op is one double division of two exact integers,
    restated identically in the SQL oracle (HUGEINT sums there).
    Scale shape: per-block pre-agg by suppkey → ONE keyed shuffle of
    (suppkey, rev_i) → broadcast dim joins → |suppliers|-row fold."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = pa.table(
            {"l_suppkey": t.column("l_suppkey"), "rev_i": pa.array(_rev_i(t))}
        ).group_by(["l_suppkey"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["l_suppkey", "rev_i"])

    per_supp = keyed_reagg(
        _read(
            sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"]
        ).map_batches(pre, batch_format="pyarrow"),
        ["l_suppkey"], [("rev_i", "sum")], P,
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    j = join_auto(
        per_supp, supp, on=("l_suppkey",), right_on=("s_suppkey",),
        num_partitions=P,
    )
    j2 = join_auto(
        j, nat, on=("s_nationkey",), right_on=("n_nationkey",),
        num_partitions=P,
    ).repartition(1)

    def hhi(t: pa.Table):
        if t.num_rows == 0 or "n_name" not in t.schema.names:
            return
        names = np.asarray(t.column("n_name").to_pylist(), dtype=object)
        rev = t.column("rev_i").to_numpy(zero_copy_only=False)
        order = np.argsort(names, kind="stable")
        names, rev = names[order], rev[order]
        starts = np.flatnonzero(np.r_[True, names[1:] != names[:-1]])
        ends = np.r_[starts[1:], len(names)]
        out_n, out_c, out_h = [], [], []
        for s, e in zip(starts, ends):
            vals = [int(x) for x in rev[s:e]]
            num = sum(v * v for v in vals)
            den = sum(vals) ** 2
            out_n.append(names[s])
            out_c.append(e - s)
            out_h.append(float(num) / float(den))
        yield pa.table(
            {
                "n_name": pa.array(out_n, pa.string()),
                "n_suppliers": pa.array(out_c, pa.int64()),
                "hhi": pa.array(out_h, pa.float64()),
            }
        )

    return j2.map_batches(hhi, batch_size=None, batch_format="pyarrow")


NATION_SUPPLIER_HHI_SQL = """
WITH per_supp AS (
  SELECT n.n_name, l.l_suppkey,
    SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS rev_i
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  CAST(SUM(rev_i * rev_i) AS DOUBLE)
    / CAST(SUM(rev_i) * SUM(rev_i) AS DOUBLE) AS hhi
FROM per_supp GROUP BY n_name
"""


# --------------------------------------------------------------------------
# median order gap: per-key windowed diff + grouped exact quantile
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def median_order_gap(sf_dir: str) -> ray.data.Dataset:
    """Per customer (with ≥ 2 orders), the exact median of the
    day-gaps between consecutive orders — the LAG-diff → grouped
    quantile_disc composition.  ONE custkey-keyed repartition
    co-locates each customer's orders; the sort, the consecutive
    diffs, and the median rank-pick (max(1, ceil(q·N)) — the verified
    quantile_disc rule) all run vectorized inside that block.  Gaps of
    a sorted multiset are permutation-invariant, so date ties cannot
    make the result nondeterministic."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "day": pa.array(
                    pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
                        zero_copy_only=False
                    )
                    // _DAY_US
                ),
            }
        )

    co = orders.map_batches(prep, batch_format="pyarrow").repartition(
        P, keys=["o_custkey"]
    )

    def medians(t: pa.Table):
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, cust))
        c_s, d_s = cust[order], day[order]
        same = np.r_[False, c_s[1:] == c_s[:-1]]
        gaps = np.diff(d_s, prepend=0)[same]
        gc = c_s[same]
        if len(gc) == 0:
            return
        # gaps are already grouped by customer and sorted within (day
        # asc within customer => diffs grouped); still re-sort to pick
        # the median rank: lexsort((gap, cust))
        o2 = np.lexsort((gaps, gc))
        gc_s, gap_s = gc[o2], gaps[o2]
        starts = np.flatnonzero(np.r_[True, gc_s[1:] != gc_s[:-1]])
        ends = np.r_[starts[1:], len(gc_s)]
        n = ends - starts
        # rank pick: max(1, ceil(0.5·n)) 1-based
        pick = starts + np.maximum(1, -(-n // 2)) - 1
        yield pa.table(
            {
                "o_custkey": pa.array(gc_s[starts]),
                "median_gap_days": pa.array(gap_s[pick]),
            }
        )

    return co.map_batches(medians, batch_size=None, batch_format="pyarrow")


MEDIAN_ORDER_GAP_SQL = """
WITH d AS (
  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day FROM orders
), g AS (
  SELECT o_custkey,
    day - LAG(day) OVER (PARTITION BY o_custkey ORDER BY day) AS gap
  FROM d
)
SELECT o_custkey, quantile_disc(gap, 0.5) AS median_gap_days
FROM g WHERE gap IS NOT NULL GROUP BY 1
"""


# --------------------------------------------------------------------------
# forecast revenue (TPC-H Q6 shape): pure filter-scan aggregate
# --------------------------------------------------------------------------

Q6_YEAR = 1997
Q6_DISC = (5, 7)  # discount in hundredths, inclusive band
Q6_MAX_QTY = 24


def forecast_revenue(sf_dir: str) -> ray.data.Dataset:
    """``SUM(extendedprice · discount)`` over a date/discount/quantity
    band — the canonical predicate-pushdown scan: no join, no keyed
    shuffle, one int64 partial per block coalescing to a single row.
    The revenue unit is cents·hundredths (price_c · disc_b), converted
    once with the identical expression in SQL."""
    cols = ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(Q6_YEAR, 1, 1)),
            pc.less(t.column("l_shipdate"), _ts(Q6_YEAR + 1, 1, 1)),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        disc = _i64(t.column("l_discount"), 100)
        qty = _i64(t.column("l_quantity"))
        keep = (disc >= Q6_DISC[0]) & (disc <= Q6_DISC[1]) & (qty < Q6_MAX_QTY)
        if not keep.any():
            return
        price = _i64(t.column("l_extendedprice"), 100)[keep]
        yield pa.table({"rev_part": pa.array([int((price * disc[keep]).sum())])})

    g = (
        _read_lineitem_window(
            sf_dir, cols, (Q6_YEAR, 1, 1), (Q6_YEAR + 1, 1, 1)
        )
        .map_batches(pre, batch_format="pyarrow")
        .repartition(1)
    )

    def finish(t: pa.Table):
        tot = (
            sum(t.column("rev_part").to_pylist())
            if t.num_rows and "rev_part" in t.schema.names
            else 0
        )
        yield pa.table({"revenue": pa.array([float(tot) / 10000.0])})

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


FORECAST_REVENUE_SQL = f"""
SELECT COALESCE(SUM(
    CAST(ROUND(l_extendedprice*100) AS BIGINT)
    * CAST(ROUND(l_discount*100) AS BIGINT)), 0) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR + 1}-01-01'
  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN {Q6_DISC[0]} AND {Q6_DISC[1]}
  AND CAST(ROUND(l_quantity) AS BIGINT) < {Q6_MAX_QTY}
"""


# --------------------------------------------------------------------------
# sole-supplier orders (TPC-H Q21 family): per-group all-same predicate
# --------------------------------------------------------------------------


def sole_supplier_orders(sf_dir: str) -> ray.data.Dataset:
    """Per supplier, how many multi-line orders they handled ALONE —
    the per-group "all rows agree" EXISTS/NOT-EXISTS shape (Q21's
    only-supplier-who-failed test, minus the date columns this
    lineitem lacks).  The predicate `COUNT(*)≥2 AND COUNT(DISTINCT
    suppkey)=1` decomposes into combiner-friendly partials
    (min_sk, max_sk, cnt) — per-block reduce first, ONE orderkey-keyed
    re-agg completes them, and `min==max ∧ cnt≥2` evaluates vectorized;
    the per-supplier count coalesces (≤ |suppliers| rows) and the name
    joins broadcast."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "mn": t.column("l_suppkey"),
                "mx": t.column("l_suppkey"),
                "cnt": _ones(len(t)),
            }
        ).group_by(["l_orderkey"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("cnt", "sum")]
        )
        yield g.rename_columns(["l_orderkey", "mn", "mx", "cnt"])

    per_order = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["l_orderkey"],
        [("mn", "min"), ("mx", "max"), ("cnt", "sum")],
        P,
    )

    def sole(t: pa.Table):
        if t.num_rows == 0 or "mn" not in t.schema.names:
            return
        mn = t.column("mn").to_numpy(zero_copy_only=False)
        mx = t.column("mx").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        keep = (mn == mx) & (cnt >= 2)
        if not keep.any():
            return
        g = pa.table(
            {
                "sk": pa.array(mn[keep]),
                "n": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        ).group_by(["sk"]).aggregate([("n", "sum")])
        yield g.rename_columns(["sk", "sole_orders"])

    g = per_order.map_batches(
        sole, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def per_supp(t: pa.Table):
        if t.num_rows == 0 or "sk" not in t.schema.names:
            return
        g2 = t.group_by(["sk"]).aggregate([("sole_orders", "sum")])
        yield g2.rename_columns(["sk", "sole_orders"])

    counts = g.map_batches(per_supp, batch_size=None, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    j = join_auto(
        counts, supp, on=("sk",), right_on=("s_suppkey",), num_partitions=P
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "s_name" not in t.schema.names:
            return
        yield pa.table(
            {
                "s_suppkey": t.column("sk"),
                "s_name": t.column("s_name"),
                "sole_orders": t.column("sole_orders"),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


SOLE_SUPPLIER_ORDERS_SQL = """
WITH s AS (
  SELECT l_orderkey, MIN(l_suppkey) AS sk
  FROM lineitem
  GROUP BY 1 HAVING COUNT(*) >= 2 AND COUNT(DISTINCT l_suppkey) = 1
)
SELECT sp.s_suppkey, sp.s_name, CAST(COUNT(*) AS BIGINT) AS sole_orders
FROM s JOIN supplier sp ON s.sk = sp.s_suppkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# weighted median: integer cumulative-weight rank rule
# --------------------------------------------------------------------------


def weighted_median_price(sf_dir: str) -> ray.data.Dataset:
    """Per return flag, the quantity-weighted median line price — the
    weighted-quantile shape.  The pick rule is restated EXPLICITLY on
    both sides (smallest price whose cumulative quantity satisfies
    ``2·cw ≥ total``) so it is a pure INTEGER comparison — no float
    exists anywhere before the final /100 display conversion.
    (price, weight) partials pre-combine per block; ONE flag-keyed
    repartition co-locates each flag's price histogram; sort + cumsum
    + pick run vectorized in-block."""
    cols = ["l_returnflag", "l_extendedprice", "l_quantity"]

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = pa.table(
            {
                "f": t.column("l_returnflag"),
                "p": pa.array(_i64(t.column("l_extendedprice"), 100)),
                "w": pa.array(_i64(t.column("l_quantity"))),
            }
        ).group_by(["f", "p"]).aggregate([("w", "sum")])
        yield g.rename_columns(["f", "p", "w"])

    co = _read(sf_dir, "lineitem", cols).map_batches(
        pre, batch_format="pyarrow"
    ).repartition(P, keys=["f"])

    def pick(t: pa.Table):
        if t.num_rows == 0 or "f" not in t.schema.names:
            return
        t = t.group_by(["f", "p"]).aggregate([("w", "sum")])
        t = t.rename_columns(["f", "p", "w"])
        f = np.asarray(t.column("f").to_pylist(), dtype=object)
        p = t.column("p").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, f))
        f, p, w = f[order], p[order], w[order]
        starts = np.flatnonzero(np.r_[True, f[1:] != f[:-1]])
        ends = np.r_[starts[1:], len(f)]
        cum = np.cumsum(w)
        base = np.r_[np.int64(0), cum[starts[1:] - 1]]
        tot = cum[ends - 1] - base
        # smallest p with 2·cw ≥ tot: cw ≥ ceil(tot/2) — integer rank
        ranks = -(-tot // 2)
        idx = np.searchsorted(cum, base + ranks, side="left")
        yield pa.table(
            {
                "l_returnflag": pa.array(f[starts].tolist(), pa.string()),
                "wmedian_price": pa.array(
                    p[idx].astype(np.float64) / 100.0, pa.float64()
                ),
            }
        )

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


WEIGHTED_MEDIAN_PRICE_SQL = """
WITH g AS (
  SELECT l_returnflag AS f,
    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p,
    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT f, p,
    SUM(w) OVER (PARTITION BY f ORDER BY p) AS cw,
    SUM(w) OVER (PARTITION BY f) AS tot
  FROM g
)
SELECT f AS l_returnflag,
  CAST(MIN(p) AS DOUBLE) / 100.0 AS wmedian_price
FROM c WHERE 2*cw >= tot GROUP BY 1
"""
