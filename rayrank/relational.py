"""TPC-H-shaped relational pipelines over the testdata tables —
multi-aggregate scans, multi-way join funnels, sessionization, and
per-group distinct counts, each with an exact DuckDB oracle.

Exactness strategy (why these hash-match the SQL oracle bit-for-bit):
floating-point SUMs depend on reduction order, so a distributed sum can
never hash-match a single-core DuckDB sum on doubles.  The monetary
columns in the testdata are 2-decimal values stored as doubles (max
observed distance from an integer after *100 is 1e-9 ≪ 0.5), so both
sides first snap each FACTOR to an exact integer (cents / basis points)
— ``rint(x*100)`` here, ``ROUND(x*100)`` in SQL; the rounding-mode
difference (half-even vs half-away) is unreachable — then aggregate in
int64, which is associative/commutative, and convert to double once at
the end with an identical expression.  Integer-overflow headroom:
``charge_i`` ≤ 1.2e11 per row → safe to ~7.6e7 rows per group sum in
int64; the per-block partial pre-aggregation keeps every shuffled row a
6-group partial, so the wide groupby moves O(blocks·groups) rows, not
O(rows).

Scale notes: every pipeline pre-aggregates inside ``map_batches``
(arrow ``Table.group_by``) before its keyed shuffle; join funnels
aggregate BETWEEN joins so each hash join moves the smaller already-
reduced side; the only driver-side lookups are bounded dimension tables
(nation: 25 rows).
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from . import configure_data_context
from .joins import hash_join, join_auto

configure_data_context()  # entry path: hash-shuffle strategy required

P = 8  # hash-partition count at testdata scale


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _i64(col: pa.ChunkedArray | pa.Array, scale: int = 1) -> np.ndarray:
    """Snap a k-decimal double column to exact int64 (see module doc)."""
    x = col.to_numpy(zero_copy_only=False)
    return np.rint(x * scale).astype(np.int64)


def _ts(y: int, m: int, d: int) -> pa.Scalar:
    return pa.scalar(datetime.datetime(y, m, d), pa.timestamp("us"))


# --------------------------------------------------------------------------
# pricing summary (TPC-H Q1 shape): filtered scan → 8-aggregate groupby
# --------------------------------------------------------------------------

PRICING_CUTOFF = (2000, 12, 1)


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """Return-flag/line-status pricing summary with exact fixed-point
    sums — the canonical many-aggregates-one-scan pattern.  Per block:
    filter + factor snap + arrow group_by partial (≤6 rows leave each
    block); the global groupby then reduces O(blocks·6) partials."""
    cols = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    ]

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.less_equal(t.column("l_shipdate"), _ts(*PRICING_CUTOFF)))
        if len(t) == 0:
            return
        qty = _i64(t.column("l_quantity"))
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        tax_b = _i64(t.column("l_tax"), 100)
        disc_price_i = price_c * (100 - disc_b)
        charge_i = disc_price_i * (100 + tax_b)
        block = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_i": pa.array(qty),
                "price_c": pa.array(price_c),
                "disc_b": pa.array(disc_b),
                "disc_price_i": pa.array(disc_price_i),
                "charge_i": pa.array(charge_i),
                "n": pa.array(np.ones(len(t), np.int64)),
            }
        )
        agg = block.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [(c, "sum") for c in
             ("qty_i", "price_c", "disc_b", "disc_price_i", "charge_i", "n")]
        )
        yield agg.rename_columns(
            ["l_returnflag", "l_linestatus",
             "qty_i", "price_c", "disc_b", "disc_price_i", "charge_i", "n"]
        )

    partials = _read(sf_dir, "lineitem", cols).map_batches(
        partial, batch_format="pyarrow"
    )
    # partials are ≤ 6 rows per block — a coalesce + one in-block arrow
    # re-aggregation beats a keyed hash shuffle whose aggregator actors
    # cost more to spin up than the data they move (same shape as the
    # ANN top-k merge); still O(blocks·6) rows through the coalesce
    g = partials.repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        t = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [(c, "sum") for c in
             ("qty_i", "price_c", "disc_b", "disc_price_i", "charge_i", "n")]
        )
        qty = t.column("qty_i_sum").to_numpy(zero_copy_only=False)
        price = t.column("price_c_sum").to_numpy(zero_copy_only=False)
        disc = t.column("disc_b_sum").to_numpy(zero_copy_only=False)
        dp = t.column("disc_price_i_sum").to_numpy(zero_copy_only=False)
        ch = t.column("charge_i_sum").to_numpy(zero_copy_only=False)
        n = t.column("n_sum").to_numpy(zero_copy_only=False)
        nf = n.astype(np.float64)
        yield pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pa.array(qty.astype(np.float64)),
                "sum_base_price": pa.array(price.astype(np.float64) / 100.0),
                "sum_disc_price": pa.array(dp.astype(np.float64) / 10000.0),
                "sum_charge": pa.array(ch.astype(np.float64) / 1000000.0),
                "avg_qty": pa.array(qty.astype(np.float64) / nf),
                "avg_price": pa.array(price.astype(np.float64) / 100.0 / nf),
                "avg_disc": pa.array(disc.astype(np.float64) / 100.0 / nf),
                "count_order": pa.array(n),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
WITH f AS (
  SELECT l_returnflag, l_linestatus,
    CAST(ROUND(l_quantity) AS BIGINT) AS qty_i,
    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c,
    CAST(ROUND(l_discount*100) AS BIGINT) AS disc_b,
    CAST(ROUND(l_tax*100) AS BIGINT) AS tax_b
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
)
SELECT l_returnflag, l_linestatus,
  CAST(SUM(qty_i) AS DOUBLE) AS sum_qty,
  CAST(SUM(price_c) AS DOUBLE)/100.0 AS sum_base_price,
  CAST(SUM(price_c*(100-disc_b)) AS DOUBLE)/10000.0 AS sum_disc_price,
  CAST(SUM(price_c*(100-disc_b)*(100+tax_b)) AS DOUBLE)/1000000.0 AS sum_charge,
  CAST(SUM(qty_i) AS DOUBLE)/COUNT(*) AS avg_qty,
  CAST(SUM(price_c) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
  CAST(SUM(disc_b) AS DOUBLE)/100.0/COUNT(*) AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM f GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# top revenue orders (TPC-H Q3 shape): 3-way join funnel → top-k
# --------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = (1997, 1, 1)


def _li_revenue_agg(
    sf_dir: str, ship_after: tuple[int, int, int] | None
) -> ray.data.Dataset:
    """(l_orderkey, rev_i) — per-order revenue in 1e-4 dollars, exactly
    pre-aggregated inside each block before the keyed shuffle."""
    cols = ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        if ship_after is not None:
            t = t.filter(pc.greater(t.column("l_shipdate"), _ts(*ship_after)))
        if len(t) == 0:
            return
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        block = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_i": pa.array(price_c * (100 - disc_b)),
            }
        )
        agg = block.group_by(["l_orderkey"]).aggregate([("rev_i", "sum")])
        yield agg.rename_columns(["l_orderkey", "rev_i"])

    from .shuffle import keyed_reagg

    return keyed_reagg(
        _read(sf_dir, "lineitem", cols).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["l_orderkey"], [("rev_i", "sum")], P,
    )


def top_revenue_orders(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Top-k open orders by post-filter revenue for one market segment:
    customer ⋈ orders ⋈ lineitem with the fact side aggregated BEFORE
    the join (each join moves per-order partials, never raw lineitem),
    deterministic (revenue desc, o_orderkey) tie-break."""
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def o_prep(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.less(t.column("o_orderdate"), _ts(*Q3_DATE)))
        if len(t) == 0:
            return
        us = pc.cast(t.column("o_orderdate"), pa.int64())
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_orderdate_us": us,
            }
        )

    orders = orders.map_batches(o_prep, batch_format="pyarrow")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def c_prep(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("c_mktsegment"), Q3_SEGMENT))
        if len(t) == 0:
            return
        yield t.select(["c_custkey"])

    cust = cust.map_batches(c_prep, batch_format="pyarrow")

    # semi-join via inner join (c_custkey unique ⇒ no fan-out);
    # join_auto broadcasts the filtered key side when it fits, else
    # falls back to the partitioned hash join
    orders = join_auto(
        orders, cust, on=("o_custkey",), right_on=("c_custkey",),
        num_partitions=P,
    )
    li = _li_revenue_agg(sf_dir, ship_after=Q3_DATE)
    j = join_auto(
        orders, li, on=("o_orderkey",), right_on=("l_orderkey",),
        num_partitions=P,
    )

    def finish(t: pa.Table):
        if len(t) == 0 or "rev_i" not in t.schema.names:
            return
        rev = t.column("rev_i").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "revenue": pa.array(rev.astype(np.float64) / 10000.0),
                "o_orderdate_us": t.column("o_orderdate_us"),
            }
        )

    return (
        j.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


TOP_REVENUE_ORDERS_SQL = """
WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
o AS (
  SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS o_orderdate_us
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
l AS (
  SELECT l_orderkey,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_i
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-01-01'
  GROUP BY l_orderkey
)
SELECT o.o_orderkey, CAST(l.rev_i AS DOUBLE)/10000.0 AS revenue,
       o.o_orderdate_us
FROM o JOIN c ON o.o_custkey = c.c_custkey
JOIN l ON l.l_orderkey = o.o_orderkey
ORDER BY revenue DESC, o.o_orderkey LIMIT 10
"""


# --------------------------------------------------------------------------
# nation revenue (TPC-H Q5 shape): join funnel with between-join reduce
# --------------------------------------------------------------------------

Q5_YEAR = 1997


def nation_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue by customer nation for one order-year.  The funnel
    aggregates BETWEEN joins (orderkey→rev, custkey→rev, nationkey→rev)
    so each shuffle moves an already-reduced table; the nation name
    lookup is a driver-side 25-row dictionary (bounded dimension)."""
    li = _li_revenue_agg(sf_dir, ship_after=None)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), _ts(Q5_YEAR, 1, 1)),
            pc.less(t.column("o_orderdate"), _ts(Q5_YEAR + 1, 1, 1)),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        yield t.select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(o_prep, batch_format="pyarrow")

    from .shuffle import keyed_reagg

    j1 = join_auto(
        orders, li, on=("o_orderkey",), right_on=("l_orderkey",),
        num_partitions=P,
    ).select_columns(["o_custkey", "rev_i"])

    def cust_pre(t: pa.Table):
        if len(t) == 0 or "rev_i" not in t.schema.names:
            return
        g = t.group_by(["o_custkey"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["o_custkey", "rev_i"])

    by_cust = keyed_reagg(
        j1.map_batches(cust_pre, batch_format="pyarrow"),
        ["o_custkey"], [("rev_i", "sum")], P,
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = join_auto(
        by_cust, cust, on=("o_custkey",), right_on=("c_custkey",),
        num_partitions=P,
    ).select_columns(["c_nationkey", "rev_i"])

    # ≤ 25 nation partials per block: coalesce + in-block re-agg
    def nation_pre(t: pa.Table):
        if len(t) == 0 or "rev_i" not in t.schema.names:
            return
        g = t.group_by(["c_nationkey"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["c_nationkey", "rev_i"])

    by_nation = j2.map_batches(nation_pre, batch_format="pyarrow").repartition(1)

    # bounded dimension broadcast: nation is ≤ 25 rows by construction
    nt = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(nt.column("n_nationkey").to_pylist(), nt.column("n_name").to_pylist())
    )

    def finish(t: pa.Table):
        if len(t) == 0 or "rev_i" not in t.schema.names:
            return
        t = t.group_by(["c_nationkey"]).aggregate([("rev_i", "sum")])
        keys = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        rev = t.column("rev_i_sum").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "n_name": pa.array([names[int(k)] for k in keys], pa.string()),
                "revenue": pa.array(rev.astype(np.float64) / 10000.0),
            }
        )

    return by_nation.map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )


NATION_REVENUE_SQL = """
WITH l AS (
  SELECT l_orderkey,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_i
  FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT n.n_name, CAST(SUM(l.rev_i) AS DOUBLE)/10000.0 AS revenue
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# --------------------------------------------------------------------------
# sessionization: gap-based session ids + per-session aggregates
# --------------------------------------------------------------------------

SESSION_GAP_US = 3_600_000_000  # 1 hour


def user_sessions(sf_dir: str) -> ray.data.Dataset:
    """(user_id, session_id, n_events, start_us, end_us) — events split
    into sessions wherever the per-user gap exceeds one hour.  One keyed
    repartition co-locates each user's events; the per-block kernel is
    fully vectorized (lexsort + break cumsum + reduceat, no per-row or
    per-group Python loop)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    ev = ev.map_batches(prep, batch_format="pyarrow")
    ev = ev.repartition(P, keys=["user_id"])

    def sessions(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, us, u))
        u, us = u[order], us[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap_brk = np.r_[False, (us[1:] - us[:-1]) > SESSION_GAP_US]
        brk = new_user | gap_brk
        sid_g = np.cumsum(brk)  # global session ordinal (1-based)
        # per-user 1-based session id: subtract the user's first ordinal
        base = np.where(new_user, sid_g, 0)
        base = np.maximum.accumulate(base)
        sid = sid_g - base + 1
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(u)]
        yield pa.table(
            {
                "user_id": pa.array(u[starts]),
                "session_id": pa.array(sid[starts]),
                "n_events": pa.array(ends - starts),
                "start_us": pa.array(us[starts]),
                "end_us": pa.array(us[ends - 1]),
            }
        )

    return ev.map_batches(sessions, batch_size=None, batch_format="pyarrow")


USER_SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 3600000000
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
s AS (
  SELECT user_id, us,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  MIN(us) AS start_us, MAX(us) AS end_us
FROM s GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# per-group distinct count (two-level aggregation)
# --------------------------------------------------------------------------


def user_distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """COUNT(DISTINCT event_type) per user as two stacked groupbys —
    the dedup level shuffles (user, type) pairs (already unique-per-
    block after the arrow pre-aggregation below), the count level is
    tiny."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        # block-local dedup so the shuffle moves unique pairs only
        yield t.group_by(["user_id", "event_type"]).aggregate([])

    pairs = ev.map_batches(pre, batch_format="pyarrow")
    # ONE repartition by user co-locates a user's (user, type) partial
    # pairs; the block kernel dedups across partials and counts per
    # user — replaces two stacked Dataset.groupby shuffles
    co = pairs.repartition(P, keys=["user_id"])

    def count_block(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.group_by(["user_id", "event_type"]).aggregate([])
        g = u.select(["user_id"]).group_by(["user_id"]).aggregate(
            [([], "count_all")]
        )
        yield g.rename_columns(["user_id", "distinct_types"])

    return co.map_batches(count_block, batch_size=None, batch_format="pyarrow")


USER_DISTINCT_EVENT_TYPES_SQL = (
    "SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) "
    "AS distinct_types FROM events GROUP BY user_id"
)


# --------------------------------------------------------------------------
# grouped top-k (per-key window rank)
# --------------------------------------------------------------------------

TOP_PER_CUSTOMER = 3


def top_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Top-``TOP_PER_CUSTOMER`` orders per customer by
    (o_totalprice desc, o_orderkey asc) with their 1-based rank — the
    ROW_NUMBER-window operator shape.  Per-block pre-truncation (each
    block keeps ≤ k rows per key, same trick as the ANN top-k
    partials) bounds the keyed shuffle to O(keys·k) rows; the
    post-shuffle kernel re-ranks whole groups vectorized (lexsort +
    group-start subtraction, no per-group Python loop)."""
    k = TOP_PER_CUSTOMER
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def local_rank(t: pa.Table, emit_rank: bool):
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        o = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, -p, c))
        cs, os_, ps = c[order], o[order], p[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        rank = np.arange(len(cs)) - np.repeat(
            starts, np.diff(np.r_[starts, len(cs)])
        )
        keep = rank < k
        cols = {
            "o_custkey": pa.array(cs[keep]),
            "o_orderkey": pa.array(os_[keep]),
            "o_totalprice": pa.array(ps[keep]),
        }
        if emit_rank:
            cols["rn"] = pa.array(rank[keep] + 1)
        yield pa.table(cols)

    pre = ds.map_batches(
        lambda t: local_rank(t, emit_rank=False), batch_format="pyarrow"
    )
    co = pre.repartition(P, keys=["o_custkey"])
    return co.map_batches(
        lambda t: local_rank(t, emit_rank=True),
        batch_size=None,
        batch_format="pyarrow",
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# pivot (wide aggregation) and funnel conversion over events
# --------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str) -> ray.data.Dataset:
    """One row per user with a count column per event type (fixed,
    known vocabulary — the pivot/wide-aggregation shape).  Per block:
    arrow group_by partial over (user, type); the keyed groupby then
    reduces partials and each output block pivots vectorized (searchsorted
    into the fixed column order, 2-D scatter-add)."""
    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = t.append_column(
            "n", pa.array(np.ones(len(t), np.int64))
        ).group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        yield g.rename_columns(["user_id", "event_type", "n"])

    pairs = _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
        pre, batch_format="pyarrow"
    )
    # all rows of one user land in one block; the pivot's scatter-ADD
    # (np.add.at) folds duplicate (user, type) partials itself, so no
    # Dataset.groupby aggregator is needed before the repartition
    co = pairs.repartition(P, keys=["user_id"])
    types = np.asarray(EVENT_TYPES)

    def pivot(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        n = t.column("n").to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        col = np.searchsorted(types, ty)
        ok = (col < len(types)) & (types[np.clip(col, 0, len(types) - 1)] == ty)
        mat = np.zeros((len(uu), len(types)), np.int64)
        np.add.at(mat, (inv[ok], col[ok]), n[ok])
        cols = {"user_id": pa.array(uu)}
        for j, name in enumerate(EVENT_TYPES):
            cols[f"n_{name}"] = pa.array(mat[:, j])
        yield pa.table(cols)

    return co.map_batches(pivot, batch_size=None, batch_format="pyarrow")


USER_EVENT_PIVOT_SQL = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


FUNNEL_WINDOW_US = 7 * 86_400_000_000  # 7 days


def funnel_conversions(sf_dir: str) -> ray.data.Dataset:
    """Signup → purchase conversion: per user, first signup time and
    first purchase AT OR AFTER it within a 7-day window; one output
    row per converting user.  Fully aggregable shape: per-user min
    signup (block pre-agg + groupby), purchases joined against it
    (broadcast when the converting-user table fits), window filter,
    then a min-aggregate — no per-row Python anywhere."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pre_signup(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("event_type"), "signup"))
        if len(t) == 0:
            return
        g = pa.table(
            {
                "user_id": t.column("user_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
            }
        ).group_by(["user_id"]).aggregate([("us", "min")])
        yield g.rename_columns(["user_id", "us"])

    from .shuffle import keyed_reagg

    def rn_us(t: pa.Table):
        if len(t) == 0 or "us" not in t.schema.names:
            return
        yield t.rename_columns(["user_id", "signup_us"])

    s_min = keyed_reagg(
        ev.map_batches(pre_signup, batch_format="pyarrow"),
        ["user_id"], [("us", "min")], P,
    ).map_batches(rn_us, batch_format="pyarrow")

    def purchases(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        if len(t) == 0:
            return
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "pus": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    p = ev.map_batches(purchases, batch_format="pyarrow")
    j = join_auto(p, s_min, on=("user_id",), num_partitions=P)

    def window(t: pa.Table):
        if len(t) == 0 or "signup_us" not in t.schema.names:
            return
        pus = t.column("pus").to_numpy(zero_copy_only=False)
        sus = t.column("signup_us").to_numpy(zero_copy_only=False)
        keep = (pus >= sus) & (pus <= sus + FUNNEL_WINDOW_US)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return
        # block-local pre-agg before the final keyed min
        g = t.group_by(["user_id", "signup_us"]).aggregate([("pus", "min")])
        yield g.rename_columns(["user_id", "signup_us", "pus"])

    w = j.map_batches(window, batch_format="pyarrow")
    out = keyed_reagg(w, ["user_id", "signup_us"], [("pus", "min")], P)

    def fin(t: pa.Table):
        if len(t) == 0 or "pus" not in t.schema.names:
            return
        yield t.rename_columns(["user_id", "signup_us", "purchase_us"])

    return out.map_batches(fin, batch_format="pyarrow")


FUNNEL_CONVERSIONS_SQL = f"""
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) >= s.signup_us
    AND epoch_us(e.ts) <= s.signup_us + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT s.user_id, s.signup_us, p.purchase_us
FROM s JOIN p ON s.user_id = p.user_id
"""


def user_streaks(sf_dir: str) -> ray.data.Dataset:
    """(user_id, max_streak) — longest run of CONSECUTIVE active days
    per user (the gaps-and-islands shape).  Block-local (user, day)
    distinct shrinks the shuffle to active-days rows, ONE keyed
    repartition makes users block-complete, then a fully vectorized
    run detector (lexsort + cross-block dedup + break cumsum) emits
    per-user maxima — no per-row or per-group Python loop.  SQL oracle
    is the classic ``day − ROW_NUMBER()`` island grouping."""
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def days(t: pa.Table):
        if len(t) == 0:
            return
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.divide(us, 86_400_000_000)  # int64 floor: ts ≥ epoch
        g = (
            pa.table({"user_id": t.column("user_id"), "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        yield g

    ev = ev.map_batches(days, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def streaks(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        # a (user, day) pair can arrive from several source blocks
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        brk = np.r_[True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)]
        starts = np.flatnonzero(brk)
        lengths = np.diff(np.r_[starts, len(u)]).astype(np.int64)
        g = (
            pa.table({"user_id": pa.array(u[starts]), "s": pa.array(lengths)})
            .group_by(["user_id"])
            .aggregate([("s", "max")])
        )
        yield g.rename_columns(["user_id", "max_streak"])

    return ev.map_batches(streaks, batch_size=None, batch_format="pyarrow")


USER_STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
r AS (
  SELECT user_id, day,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak
  FROM r GROUP BY user_id, day - rn
)
SELECT user_id, MAX(streak) AS max_streak FROM s GROUP BY user_id
"""


def _min_ts_by_user(
    ev: ray.data.Dataset, etype: str, out: str
) -> ray.data.Dataset:
    """(user_id, out=min epoch-us) for one event type — block-local
    partial min + one keyed re-agg."""
    from .shuffle import keyed_reagg

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        keep = t.filter(pc.equal(t.column("event_type"), etype))
        if keep.num_rows == 0:
            return
        g = (
            pa.table(
                {
                    "user_id": keep.column("user_id"),
                    out: pc.cast(keep.column("ts"), pa.int64()),
                }
            )
            .group_by(["user_id"])
            .aggregate([(out, "min")])
        )
        yield g.rename_columns(["user_id", out])

    return keyed_reagg(
        ev.map_batches(pre, batch_format="pyarrow"), ["user_id"], [(out, "min")], P
    )


def three_step_funnel(sf_dir: str) -> ray.data.Dataset:
    """(user_id, signup_us, click_us, purchase_us) — users completing
    the STRICTLY-ORDERED chain earliest signup < earliest click after
    it < earliest purchase after that (sequence-match funnel; the
    2-step funnel_conversions generalized to a dependent chain).
    Each step is one distributed join (join_auto: broadcast small
    side) + filtered per-user min re-agg — the per-step reduced table
    is ≤ |users| rows, so later steps shrink monotonically.  All
    values are exact int64 epoch-us."""
    from .shuffle import keyed_reagg

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    s = _min_ts_by_user(ev, "signup", "signup_us")

    def step(prev: ray.data.Dataset, etype: str, after: str, out: str):
        def pre(t: pa.Table):
            if len(t) == 0 or after not in t.schema.names:
                return
            keep = t.filter(
                pc.and_(
                    pc.equal(t.column("event_type"), etype),
                    pc.greater(
                        pc.cast(t.column("ts"), pa.int64()), t.column(after)
                    ),
                )
            )
            if keep.num_rows == 0:
                return
            g = (
                pa.table(
                    {
                        "user_id": keep.column("user_id"),
                        after: keep.column(after),
                        out: pc.cast(keep.column("ts"), pa.int64()),
                    }
                )
                .group_by(["user_id", after])
                .aggregate([(out, "min")])
            )
            yield g.rename_columns(["user_id", after, out])

        j = join_auto(ev, prev, on=("user_id",))
        return keyed_reagg(
            j.map_batches(pre, batch_format="pyarrow"),
            ["user_id", after],
            [(out, "min")],
            P,
        )

    c = step(s, "click", "signup_us", "click_us")
    p = step(c, "purchase", "click_us", "purchase_us")
    out = join_auto(p, s, on=("user_id",))

    def order_cols(t: pa.Table):
        if t.num_rows == 0 or "purchase_us" not in t.schema.names:
            return
        yield t.select(["user_id", "signup_us", "click_us", "purchase_us"])

    return out.map_batches(order_cols, batch_format="pyarrow")


THREE_STEP_FUNNEL_SQL = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_us
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.signup_us
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
  GROUP BY e.user_id
)
SELECT p.user_id, s.signup_us, c.click_us, p.purchase_us
FROM p JOIN c ON p.user_id = c.user_id JOIN s ON p.user_id = s.user_id
"""


def conversion_lag_histogram(sf_dir: str) -> ray.data.Dataset:
    """(lag_days, n_users) — the time-to-convert survival histogram:
    whole days between a user's first signup and their first
    in-window purchase (funnel_conversions' output re-binned; pure
    integer ⌊Δus/day⌋).  Block partials + one tiny keyed re-agg over
    ≤ 8 distinct lags."""
    from .shuffle import keyed_reagg

    conv = funnel_conversions(sf_dir)

    def lag(t: pa.Table):
        if t.num_rows == 0 or "purchase_us" not in t.schema.names:
            return
        d = (
            t.column("purchase_us").to_numpy(zero_copy_only=False)
            - t.column("signup_us").to_numpy(zero_copy_only=False)
        ) // 86_400_000_000
        g = (
            pa.table(
                {
                    "lag_days": pa.array(d.astype(np.int64)),
                    "n_users": pa.array(np.ones(len(d), np.int64)),
                }
            )
            .group_by(["lag_days"])
            .aggregate([("n_users", "sum")])
        )
        yield g.rename_columns(["lag_days", "n_users"])

    return keyed_reagg(
        conv.map_batches(lag, batch_format="pyarrow"),
        ["lag_days"], [("n_users", "sum")], 4,
    )


CONVERSION_LAG_SQL = f"""
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) >= s.signup_us
    AND epoch_us(e.ts) <= s.signup_us + {FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT (p.purchase_us - s.signup_us) // 86400000000 AS lag_days,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM s JOIN p ON s.user_id = p.user_id
GROUP BY 1
"""


def user_event_unpivot(sf_dir: str) -> ray.data.Dataset:
    """Melt (wide→long, the inverse of :func:`user_event_pivot`): the
    pivot's per-user count columns stream back out as (user_id,
    event_type, n) rows with zero cells dropped — so the round trip
    pivot∘unpivot reproduces the plain long groupby exactly, which is
    what the SQL oracle states.  Per block: one vectorized
    repeat/concat per type column — no shuffle beyond the pivot's
    own."""
    wide = user_event_pivot(sf_dir)

    def melt(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id")
        parts = []
        for name in EVENT_TYPES:
            n = t.column(f"n_{name}").to_numpy(zero_copy_only=False)
            keep = n > 0
            if not keep.any():
                continue
            parts.append(
                pa.table(
                    {
                        "user_id": u.filter(pa.array(keep)),
                        "event_type": pa.array(
                            np.full(int(keep.sum()), name, object), pa.string()
                        ),
                        "n": pa.array(n[keep]),
                    }
                )
            )
        if parts:
            yield pa.concat_tables(parts)

    return wide.map_batches(melt, batch_size=None, batch_format="pyarrow")


USER_EVENT_UNPIVOT_SQL = """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type
"""


PROFILE_COLUMNS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def table_profile(sf_dir: str) -> pa.Table:
    """Data-quality profile of lineitem's numeric columns — one row per
    column with (n_rows, n_null, min_v, max_v).  ONE pruned scan; each
    block folds all columns to a 4-row partial inside ``map_batches``
    (counts are exact integers; min/max of doubles are value PICKS, not
    folds — order-free by construction); a coalesce of O(blocks·4)
    partial rows finishes.  The SQL oracle is the per-column UNION ALL
    of the same aggregates."""
    cols = list(PROFILE_COLUMNS)

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        names, nr, nn, mn, mx = [], [], [], [], []
        for c in cols:
            col = t.column(c)
            names.append(c)
            nr.append(len(col))
            nn.append(col.null_count)
            v = col.drop_null()
            mn.append(pc.min(v).as_py() if len(v) else None)
            mx.append(pc.max(v).as_py() if len(v) else None)
        yield pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(nr, pa.int64()),
                "n_null": pa.array(nn, pa.int64()),
                "min_v": pa.array(mn, pa.float64()),
                "max_v": pa.array(mx, pa.float64()),
            }
        )

    merged = (
        _read(sf_dir, "lineitem", cols)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "column" not in t.schema.names:
            return
        g = t.group_by(["column"]).aggregate(
            [("n_rows", "sum"), ("n_null", "sum"), ("min_v", "min"), ("max_v", "max")]
        ).rename_columns(["column", "n_rows", "n_null", "min_v", "max_v"])
        yield g

    out = merged.map_batches(finish, batch_size=None, batch_format="pyarrow")
    return out


TABLE_PROFILE_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
  CAST(MIN({c}) AS DOUBLE) AS min_v, CAST(MAX({c}) AS DOUBLE) AS max_v
FROM lineitem"""
    for c in PROFILE_COLUMNS
)


def benford_order_totals(sf_dir: str) -> pa.Table:
    """Benford's-law first-digit distribution of order totals (a
    data-quality / fraud-screen shape): leading digit of the exact
    integer cents value → (digit, n, share).  The digit is pure
    integer arithmetic (repeated //10 — ≤ 19 vectorized passes, no
    float log near power-of-ten boundaries); per-block 9-bin bincount
    partials coalesce into one 9-row result.  share = n/total is the
    single division mirrored in SQL."""
    o = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        d = _i64(t.column("o_totalprice"), 100)
        m = d >= 10
        while m.any():
            d[m] //= 10
            m = d >= 10
        cnt = np.bincount(d, minlength=10)[1:10]
        yield pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    merged = o.map_batches(partial, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "digit" not in t.schema.names:
            return
        g = (
            t.group_by(["digit"])
            .aggregate([("n", "sum")])
            .rename_columns(["digit", "n"])
        )
        g = g.filter(pc.greater(g.column("n"), 0))
        n = g.column("n").to_numpy(zero_copy_only=False)
        tot = int(n.sum())
        yield g.append_column(
            "share", pa.array(n.astype(np.float64) / float(tot))
        )

    return merged.map_batches(finish, batch_size=None, batch_format="pyarrow")


BENFORD_ORDER_TOTALS_SQL = """
WITH v AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS c FROM orders),
g AS (
  SELECT CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1
),
t AS (SELECT SUM(n) AS tot FROM g)
SELECT digit, n, CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share FROM g, t
"""


def user_event_entropy(sf_dir: str) -> ray.data.Dataset:
    """Shannon entropy (nats) of each user's event-type distribution —
    the diversity/segmentation shape.  Reuses the
    :func:`user_event_pivot` wide front end (fixed 5-type vocabulary),
    then evaluates H = ln(t) − (Σ_j n_j·ln(n_j))/t per row with the
    SAME explicit left-associated expression tree the SQL oracle
    states: 5 CASE terms added in EVENT_TYPES order.

    Float exactness: every ln argument is an INTEGER count, and libm's
    ``math.log`` is bit-identical to DuckDB's ``ln`` on integer-valued
    doubles (verified exhaustively to 2M; ``np.log``'s SIMD path is
    NOT — it differs in the last ulp on ~25% of ints, so the kernel
    maps distinct counts through a ``math.log`` lookup instead)."""
    import math

    wide = user_event_pivot(sf_dir)

    def ent(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        mat = np.stack(
            [
                t.column(f"n_{name}").to_numpy(zero_copy_only=False)
                for name in EVENT_TYPES
            ],
            axis=1,
        )
        tot = mat.sum(axis=1)
        vals = np.unique(np.concatenate([mat.ravel(), tot]))
        vals = vals[vals > 0]
        lut = np.array([math.log(int(v)) for v in vals], np.float64)

        def ln_of(x: np.ndarray) -> np.ndarray:
            out = np.zeros(x.shape, np.float64)
            pos = x > 0
            out[pos] = lut[np.searchsorted(vals, x[pos])]
            return out

        s = mat[:, 0].astype(np.float64) * ln_of(mat[:, 0])
        for j in range(1, len(EVENT_TYPES)):
            s = s + mat[:, j].astype(np.float64) * ln_of(mat[:, j])
        h = ln_of(tot) - s / tot.astype(np.float64)
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": pa.array(tot),
                "entropy": pa.array(h),
            }
        )

    return wide.map_batches(ent, batch_size=None, batch_format="pyarrow")


_ENT_TOT = " + ".join(f"n_{name}" for name in EVENT_TYPES)
_ENT_TERMS = " + ".join(
    f"CASE WHEN n_{name} > 0 THEN CAST(n_{name} AS DOUBLE) * "
    f"ln(CAST(n_{name} AS DOUBLE)) ELSE 0.0 END"
    for name in EVENT_TYPES
)
USER_EVENT_ENTROPY_SQL = f"""
WITH w AS (
  SELECT user_id,
    {', '.join(f"SUM(CASE WHEN event_type = '{name}' THEN 1 ELSE 0 END) AS n_{name}" for name in EVENT_TYPES)}
  FROM events GROUP BY user_id
)
SELECT user_id, CAST({_ENT_TOT} AS BIGINT) AS n_events,
  ln(CAST({_ENT_TOT} AS DOUBLE))
    - ({_ENT_TERMS}) / CAST({_ENT_TOT} AS DOUBLE) AS entropy
FROM w
"""


# ---------------------------------------------------------------------------
# Band self-join: order pairs with near-equal total price
# ---------------------------------------------------------------------------

PRICE_BAND_EPS = 500  # cents


def price_band_pairs(sf_dir: str, eps: int = PRICE_BAND_EPS) -> ray.data.Dataset:
    """All order pairs whose total prices differ by ≤ ``eps`` cents —
    the bucketed BAND JOIN pattern: each row replicates to its home
    price bucket ``c // W`` and the next one (W = eps+1, so a valid
    pair spans at most adjacent buckets), ONE bucket-keyed shuffle
    co-locates candidates, and in-block pairing is a vectorized
    sorted-searchsorted range expansion.  A pair is emitted exactly
    once, in the bucket equal to max(home_a, home_b) — never an
    all-pairs comparison, and output volume equals the true result
    size (dense buckets cost what the answer costs, no silent cap).
    Prices snap to exact integer cents on both sides, so the match is
    float-free."""
    W = eps + 1

    def explode(t: pa.Table):
        if t.num_rows == 0:
            return
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        c = _i64(t.column("o_totalprice"), 100)
        home = c // W
        yield pa.table(
            {
                "bkt": pa.array(np.concatenate([home, home + 1])),
                "k": pa.array(np.concatenate([k, k])),
                "c": pa.array(np.concatenate([c, c])),
                "home": pa.array(np.concatenate([home, home])),
            }
        )

    ds = (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .map_batches(explode, batch_format="pyarrow")
        .repartition(P, keys=["bkt"])
    )

    def pair_block(t: pa.Table):
        if t.num_rows == 0 or "bkt" not in t.schema.names:
            return
        bkt = t.column("bkt").to_numpy(zero_copy_only=False)
        k = t.column("k").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        home = t.column("home").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, c, bkt))
        bkt, k, c, home = bkt[order], k[order], c[order], home[order]
        n = len(k)
        # per-row end of its bucket run, and end of its eps-band
        bkt_end = np.searchsorted(bkt, bkt, side="right")
        band_end = np.zeros(n, np.int64)
        starts = np.r_[0, np.flatnonzero(bkt[1:] != bkt[:-1]) + 1]
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts.tolist(), ends.tolist()):  # per-bucket, not per-row
            band_end[s:e] = s + np.searchsorted(c[s:e], c[s:e] + eps, side="right")
        hi = np.minimum(band_end, bkt_end)
        lo = np.arange(n) + 1
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        if total == 0:
            return
        i = np.repeat(np.arange(n), cnt)
        j = np.arange(total) - np.repeat(cnt.cumsum() - cnt, cnt) + lo[i]
        keep = np.maximum(home[i], home[j]) == bkt[i]
        keep &= k[i] != k[j]
        i, j = i[keep], j[keep]
        if len(i) == 0:
            return
        a, b = np.minimum(k[i], k[j]), np.maximum(k[i], k[j])
        yield pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "diff_cents": pa.array(c[j] - c[i]),
            }
        )

    return ds.map_batches(pair_block, batch_size=None, batch_format="pyarrow")


PRICE_BAND_PAIRS_SQL = f"""
WITH o AS (
  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
)
SELECT a.k AS a, b.k AS b, CAST(abs(a.c - b.c) AS BIGINT) AS diff_cents
FROM o a JOIN o b ON a.k < b.k AND abs(a.c - b.c) <= {PRICE_BAND_EPS}
"""


LAG_BIN_DAYS = 30
# Offset for the non-negative floor-div identity used on BOTH the
# engine and SQL sides: (lag + LAG_OFF·BIN)//BIN − LAG_OFF.  Derived
# from the constant so changing LAG_BIN_DAYS cannot desynchronize them.
LAG_OFF = 1000


def ship_lag_histogram(sf_dir: str) -> ray.data.Dataset:
    """(bin, n) — histogram of order→ship lag (l_shipdate −
    o_orderdate in whole days, binned by ``LAG_BIN_DAYS``): the
    fulfillment-latency profile, computed with PURE-INTEGER day
    arithmetic (epoch_us // day, difference, floor-div binning).
    Lags GO NEGATIVE in this data (ship/order dates are independent),
    so binning uses the offset floor-div identity
    (lag + 30000)//30 − 1000 — non-negative operand, where numpy
    floor and DuckDB truncating ``//`` agree.

    Scale shape: orders reduce to (orderkey, day) before ONE
    orderkey-keyed join; the histogram is a |bins|-bounded re-agg."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    DAY = 86_400_000_000

    def o_pre(t: pa.Table):
        if len(t) == 0 or "o_orderkey" not in t.schema.names:
            return
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "od": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), DAY
                ),
            }
        )

    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        o_pre, batch_format="pyarrow"
    )

    def l_pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        yield pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "sd": pc.divide(
                    pc.cast(t.column("l_shipdate"), pa.int64()), DAY
                ),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        l_pre, batch_format="pyarrow"
    )
    j = join_auto(li, o, on=("l_orderkey",), right_on=("o_orderkey",),
                  num_partitions=P)

    def binned(t: pa.Table):
        if t.num_rows == 0 or "sd" not in t.schema.names:
            return
        lag = (
            t.column("sd").to_numpy(zero_copy_only=False)
            - t.column("od").to_numpy(zero_copy_only=False)
        )
        g = (
            pa.table(
                {
                    "bin": pa.array(
                        (lag + LAG_OFF * LAG_BIN_DAYS) // LAG_BIN_DAYS
                        - LAG_OFF
                    )
                }
            )
            .append_column("n", pa.array(np.ones(len(lag), np.int64)))
            .group_by(["bin"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["bin", "n"])

    return keyed_reagg(
        j.map_batches(binned, batch_format="pyarrow"),
        ["bin"], [("n", "sum")], 4,
    )


SHIP_LAG_HISTOGRAM_SQL = f"""
WITH o AS (SELECT o_orderkey,
           CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS od
           FROM orders),
l AS (SELECT l_orderkey,
      CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS sd
      FROM lineitem)
SELECT (l.sd - o.od + {LAG_OFF * LAG_BIN_DAYS}) // {LAG_BIN_DAYS}
    - {LAG_OFF} AS bin,
  CAST(COUNT(*) AS BIGINT) AS n
FROM l JOIN o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


def nation_trade_matrix(sf_dir: str) -> ray.data.Dataset:
    """(supp_nation, cust_nation, n_items, revenue_i) — the FULL
    supplier-nation × customer-nation trade matrix (the Q7 shape
    generalized from one nation pair to all pairs): lineitem revenue
    routed through supplier → nation and order → customer → nation.
    Fixed-point exact (integer rev_i = price_cents·(100−disc_bp)).

    Scale shape: both dimension paths reduce to key→nation lookup
    tables (nation-bounded after their joins) BEFORE touching
    lineitem; the fact table joins once per side and the final re-agg
    is |nations|²-bounded."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    sn = join_auto(supp, nation, on=("s_nationkey",),
                   right_on=("n_nationkey",), num_partitions=P)

    def s_fin(t: pa.Table):
        if t.num_rows == 0 or "s_suppkey" not in t.schema.names:
            return
        yield pa.table(
            {
                "s_suppkey": t.column("s_suppkey"),
                "supp_nation": t.column("n_name"),
            }
        )

    sn = sn.map_batches(s_fin, batch_format="pyarrow")

    cn = join_auto(cust, nation, on=("c_nationkey",),
                   right_on=("n_nationkey",), num_partitions=P)

    def c_fin(t: pa.Table):
        if t.num_rows == 0 or "c_custkey" not in t.schema.names:
            return
        yield pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "cust_nation": t.column("n_name"),
            }
        )

    on = join_auto(orders, cn.map_batches(c_fin, batch_format="pyarrow"),
                   on=("o_custkey",), right_on=("c_custkey",),
                   num_partitions=P)

    def o_fin(t: pa.Table):
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "cust_nation": t.column("cust_nation"),
            }
        )

    on = on.map_batches(o_fin, batch_format="pyarrow")

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def l_pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        yield pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev": pa.array(price_c * (100 - disc_b)),
            }
        )

    j1 = join_auto(li.map_batches(l_pre, batch_format="pyarrow"), sn,
                   on=("l_suppkey",), right_on=("s_suppkey",),
                   num_partitions=P)
    j2 = join_auto(j1, on, on=("l_orderkey",), right_on=("o_orderkey",),
                   num_partitions=P)

    def agg(t: pa.Table):
        if t.num_rows == 0 or "supp_nation" not in t.schema.names:
            return
        g = (
            t.select(["supp_nation", "cust_nation", "rev"])
            .append_column("n", pa.array(np.ones(len(t), np.int64)))
            .group_by(["supp_nation", "cust_nation"])
            .aggregate([("n", "sum"), ("rev", "sum")])
        )
        yield g.rename_columns(
            ["supp_nation", "cust_nation", "n_items", "revenue_i"]
        )

    return keyed_reagg(
        j2.map_batches(agg, batch_format="pyarrow"),
        ["supp_nation", "cust_nation"],
        [("n_items", "sum"), ("revenue_i", "sum")], 4,
    )


NATION_TRADE_MATRIX_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS BIGINT)
    AS revenue_i
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
GROUP BY 1, 2
"""


def order_lines_histogram(sf_dir: str) -> ray.data.Dataset:
    """(n_lines, n_orders) — distribution of lineitems per order (the
    fact-table fan-out profile behind join-size estimates).  Two
    bounded reductions: per-order counts, then the count-of-counts."""
    from .shuffle import keyed_reagg

    def pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        g = (
            t.select(["l_orderkey"])
            .append_column("n", pa.array(np.ones(len(t), np.int64)))
            .group_by(["l_orderkey"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["l_orderkey", "n"])

    per_order = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["l_orderkey"], [("n", "sum")], P,
    )

    def hist(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        g = (
            t.select(["n"])
            .append_column("c", pa.array(np.ones(len(t), np.int64)))
            .group_by(["n"])
            .aggregate([("c", "sum")])
        )
        yield g.rename_columns(["n_lines", "n_orders"])

    return keyed_reagg(
        per_order.map_batches(hist, batch_format="pyarrow"),
        ["n_lines"], [("n_orders", "sum")], 4,
    )


ORDER_LINES_HISTOGRAM_SQL = """
WITH per_order AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
)
SELECT n AS n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM per_order GROUP BY 1
"""


def part_reorder_gaps(sf_dir: str) -> ray.data.Dataset:
    """(l_partkey, n_gaps, median_gap_days) — per-part reorder cadence:
    gaps between consecutive DISTINCT order days of each part, with
    the integer lower-median (quantile_disc rank = ceil(n/2), the
    exact_quantiles rule — 0.5 is dyadic so the rank is float-exact).
    The demand-cadence profile behind reorder-point planning.

    Scale shape: lineitem dedups to (part, orderkey) block-locally
    BEFORE the orders join; ONE part-keyed repartition; gaps + median
    are block-local vectorized."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    DAY = 86_400_000_000

    def l_pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        yield t.select(["l_partkey", "l_orderkey"]).group_by(
            ["l_partkey", "l_orderkey"]
        ).aggregate([]).rename_columns(["l_partkey", "l_orderkey"])

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_orderkey"]).map_batches(
        l_pre, batch_format="pyarrow"
    )

    def o_pre(t: pa.Table):
        if len(t) == 0 or "o_orderkey" not in t.schema.names:
            return
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "day": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), DAY
                ),
            }
        )

    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        o_pre, batch_format="pyarrow"
    )
    j = join_auto(li, o, on=("l_orderkey",), right_on=("o_orderkey",),
                  num_partitions=P)
    co = j.repartition(P, keys=["l_partkey"])

    def gaps(t: pa.Table):
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        o_ = np.lexsort((d, p))
        p, d = p[o_], d[o_]
        uniq = np.r_[True, (p[1:] != p[:-1]) | (d[1:] != d[:-1])]
        p, d = p[uniq], d[uniq]
        same = np.r_[False, p[1:] == p[:-1]]
        prev = np.r_[np.int64(0), d[:-1]]
        gap = (d - prev)[same]
        gp = p[same]
        if len(gp) == 0:
            return
        starts = np.flatnonzero(np.r_[True, gp[1:] != gp[:-1]])
        ends = np.r_[starts[1:], len(gp)]
        keys, ns, meds = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            keys.append(gp[s])
            ns.append(n)
            meds.append(np.sort(gap[s:e])[(n + 1) // 2 - 1])
        yield pa.table(
            {
                "l_partkey": pa.array(np.array(keys, np.int64)),
                "n_gaps": pa.array(np.array(ns, np.int64)),
                "median_gap_days": pa.array(np.array(meds, np.int64)),
            }
        )

    return co.map_batches(gaps, batch_size=None, batch_format="pyarrow")


PART_REORDER_GAPS_SQL = """
WITH pd AS (
  SELECT DISTINCT l.l_partkey,
    CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS day
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
g AS (SELECT l_partkey,
      day - LAG(day) OVER (PARTITION BY l_partkey ORDER BY day) AS gap
      FROM pd)
SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_gaps,
  CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_days
FROM g WHERE gap IS NOT NULL GROUP BY 1
"""
