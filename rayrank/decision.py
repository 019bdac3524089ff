"""Decision-support join funnels and behavioral analytics — round-2
additions widening the TPC-H-shaped surface (Q4/Q7/Q10/Q14/Q16
analogues over the testdata columns that were still unused:
``o_orderpriority``, ``l_suppkey``/``s_nationkey``, ``l_returnflag``,
``p_type``/``p_brand``) plus semi-structured JSON extraction over
``events.props``, a market-basket co-occurrence top-k, and exact
per-group Pearson correlation.

Exactness strategy is the one pinned in :mod:`rayrank.relational`:
snap 2-decimal monetary factors to int64, aggregate in integers, and
convert to double ONCE with an expression restated identically in the
SQL oracle (never rely on the database's internal float reduction).
Correlation follows :func:`rayrank.analytics.event_value_stats`: int64
first/second moments per block, arbitrary-precision Python ints for
the ≤|groups| cross terms (HUGEINT in SQL), one identical float
formula at the end.

Scale notes: every fact scan pre-aggregates inside ``map_batches``
before any shuffle; dimension sides (part, supplier, customer) go
through :func:`rayrank.joins.join_auto`'s broadcast-when-small guard;
tiny-cardinality finals (priorities, brand×type, nation pairs, event
types) use the coalesce + in-block re-agg pattern (pricing_summary);
the one unbounded-cardinality aggregate (part pairs) uses
``keyed_reagg`` + per-block top-k cutoffs so the coalesce merges
O(P·k) rows, never the pair table.
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


def _ones(n: int) -> pa.Array:
    return pa.array(np.ones(n, np.int64))


def _collect_kv(ds: ray.data.Dataset, key_col: str, val_col: str, limit=None):
    """Driver-collect a (key, value) lookup under the broadcast guard,
    sorted by key for searchsorted probes; ``None`` when the table
    exceeds the limit (caller falls back to a partitioned hash join).
    Streams batches and bails early, so an over-limit table never
    materializes on the driver."""
    from .joins import BROADCAST_JOIN_LIMIT

    limit = BROADCAST_JOIN_LIMIT if limit is None else limit
    tabs, total = [], 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        tabs.append(b)
        total += len(b)
        if total > limit:
            return None
    if not tabs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pa.concat_tables(tabs)
    k = t.column(key_col).to_numpy(zero_copy_only=False)
    v = t.column(val_col).to_numpy(zero_copy_only=False)
    o = np.argsort(k)
    return k[o], v[o]


# --------------------------------------------------------------------------
# promo revenue share (TPC-H Q14 shape): fact ⋈ broadcast dim → one scalar
# --------------------------------------------------------------------------

PROMO_WINDOW = ((1998, 1, 1), (1999, 1, 1))


def promo_revenue(sf_dir: str) -> ray.data.Dataset:
    """Percent of discounted revenue from PROMO-type parts shipped in
    one year.  lineitem pre-aggregates (partkey, rev_i) per block, the
    part dimension joins via the broadcast guard, and the two global
    sums coalesce O(blocks) two-int partials."""
    cols = ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(*PROMO_WINDOW[0])),
            pc.less(t.column("l_shipdate"), _ts(*PROMO_WINDOW[1])),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        g = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "rev_i": pa.array(price_c * (100 - disc_b)),
            }
        ).group_by(["l_partkey"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["l_partkey", "rev_i"])

    li = keyed_reagg(
        _read(sf_dir, "lineitem", cols).map_batches(pre, batch_format="pyarrow"),
        ["l_partkey"], [("rev_i", "sum")], P,
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    j = join_auto(
        li, part, on=("l_partkey",), right_on=("p_partkey",),
        num_partitions=P,
    )

    def split(t: pa.Table):
        if len(t) == 0 or "p_type" not in t.schema.names:
            return
        rev = t.column("rev_i").to_numpy(zero_copy_only=False)
        promo = pc.equal(t.column("p_type"), "PROMO").to_numpy(
            zero_copy_only=False
        )
        yield pa.table(
            {
                "promo_i": pa.array([int(rev[promo].sum())]),
                "total_i": pa.array([int(rev.sum())]),
            }
        )

    g = j.map_batches(split, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "promo_i" not in t.schema.names:
            return
        promo = sum(t.column("promo_i").to_pylist())
        total = sum(t.column("total_i").to_pylist())
        yield pa.table(
            {"promo_revenue": pa.array([100.0 * float(promo) / float(total)])}
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


PROMO_REVENUE_SQL = """
WITH f AS (
  SELECT l_partkey,
    CAST(ROUND(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev_i
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1999-01-01'
)
SELECT 100.0
  * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN f.rev_i ELSE 0 END) AS DOUBLE)
  / CAST(SUM(f.rev_i) AS DOUBLE) AS promo_revenue
FROM f JOIN part p ON f.l_partkey = p.p_partkey
"""


# --------------------------------------------------------------------------
# late-order priority counts (TPC-H Q4 shape): per-order max → join → count
# --------------------------------------------------------------------------

Q4_WINDOW = ((1997, 1, 1), (1998, 1, 1))
Q4_LATE_US = 60 * 86_400_000_000  # shipped > 60 days after order date


def priority_counts(sf_dir: str) -> ray.data.Dataset:
    """Orders placed in one year whose latest line shipped > 60 days
    after the order date, counted per priority.  EXISTS(shipdate >
    cutoff) ≡ max(shipdate) > cutoff, so the fact side reduces to one
    row per order BEFORE the join; when the date-filtered order-key set
    fits the broadcast guard it semi-filters lineitem BEFORE the max
    shuffle (the window keeps ~1/7 of orders, so the keyed exchange
    shrinks by the same factor); the 5-group final coalesces."""

    def o_pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), _ts(*Q4_WINDOW[0])),
            pc.less(t.column("o_orderdate"), _ts(*Q4_WINDOW[1])),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "odate_us": pc.cast(t.column("o_orderdate"), pa.int64()),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(o_pre, batch_format="pyarrow").materialize()

    li_raw = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    from .joins import BROADCAST_JOIN_LIMIT, broadcast_semi_filter

    if orders.count() <= BROADCAST_JOIN_LIMIT:
        tabs = list(
            orders.select_columns(["o_orderkey"]).iter_batches(
                batch_format="pyarrow"
            )
        )
        keys = (
            pa.concat_tables(tabs).column("o_orderkey").to_numpy(
                zero_copy_only=False
            )
            if tabs
            else np.empty(0, np.int64)
        )
        li_raw = broadcast_semi_filter(li_raw, keys, "l_orderkey", True)

    def li_pre(t: pa.Table):
        if len(t) == 0:
            return
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "ship_us": pc.cast(t.column("l_shipdate"), pa.int64()),
            }
        ).group_by(["l_orderkey"]).aggregate([("ship_us", "max")])
        yield g.rename_columns(["l_orderkey", "max_ship_us"])

    li = keyed_reagg(
        li_raw.map_batches(li_pre, batch_format="pyarrow"),
        ["l_orderkey"], [("max_ship_us", "max")], P,
    )
    j = join_auto(
        orders, li, on=("o_orderkey",), right_on=("l_orderkey",),
        num_partitions=P,
    )

    def late(t: pa.Table):
        if len(t) == 0 or "max_ship_us" not in t.schema.names:
            return
        lim = pc.add(t.column("odate_us"), Q4_LATE_US)
        t = t.filter(pc.greater(t.column("max_ship_us"), lim))
        if len(t) == 0:
            return
        g = (
            t.select(["o_orderpriority"])
            .append_column("n", _ones(len(t)))
            .group_by(["o_orderpriority"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["o_orderpriority", "n"])

    g = j.map_batches(late, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "o_orderpriority" not in t.schema.names:
            return
        g = t.group_by(["o_orderpriority"]).aggregate([("n", "sum")])
        yield g.rename_columns(["o_orderpriority", "order_count"])

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


PRIORITY_COUNTS_SQL = """
WITH l AS (
  SELECT l_orderkey, MAX(l_shipdate) AS max_ship FROM lineitem GROUP BY 1
)
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.max_ship > o.o_orderdate + INTERVAL 60 DAY
GROUP BY o.o_orderpriority
"""


# --------------------------------------------------------------------------
# distinct suppliers per brand×type (TPC-H Q16 shape)
# --------------------------------------------------------------------------


def supplier_part_stats(sf_dir: str) -> ray.data.Dataset:
    """Distinct supplier count per (p_brand, p_type) among parts that
    actually shipped.  The fact side dedups (partkey, suppkey) per
    block, the keyed shuffle dedups globally, the part dimension joins
    broadcast, and the brand×type distinct-count folds in the final
    coalesce (≤ brands·types·suppliers reduced rows)."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        yield t.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    pairs = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["l_partkey", "l_suppkey"], [], P,
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type"])
    j = join_auto(
        pairs, part, on=("l_partkey",), right_on=("p_partkey",),
        num_partitions=P,
    )

    def bt_pre(t: pa.Table):
        if len(t) == 0 or "p_brand" not in t.schema.names:
            return
        yield t.select(["p_brand", "p_type", "l_suppkey"]).group_by(
            ["p_brand", "p_type", "l_suppkey"]
        ).aggregate([])

    g = j.map_batches(bt_pre, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "p_brand" not in t.schema.names:
            return
        u = t.group_by(["p_brand", "p_type", "l_suppkey"]).aggregate([])
        g2 = (
            u.select(["p_brand", "p_type"])
            .append_column("n", _ones(len(u)))
            .group_by(["p_brand", "p_type"])
            .aggregate([("n", "sum")])
        )
        yield g2.rename_columns(["p_brand", "p_type", "supplier_cnt"])

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


SUPPLIER_PART_STATS_SQL = """
SELECT p.p_brand, p.p_type,
  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand, p.p_type
"""


# --------------------------------------------------------------------------
# cross-nation trade volume (TPC-H Q7 shape): 4-table funnel
# --------------------------------------------------------------------------

Q7_YEARS = (1997, 1998)


def volume_shipping(sf_dir: str) -> ray.data.Dataset:
    """Discounted revenue between (supplier nation → customer nation)
    pairs per ship-year, supplier nation ≠ customer nation.  The fact
    scan reduces to (orderkey, suppnation, year, rev_i) partials before
    the orders join; supplier and customer ride the broadcast guard;
    nation names resolve from the 25-row driver dictionary; the
    ≤ 25·24·2-group final coalesces."""
    import os

    import pyarrow.parquet as pq

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    cols = [
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate",
    ]

    def li_pre(t: pa.Table):
        if len(t) == 0:
            return
        yr = pc.year(t.column("l_shipdate"))
        m = pc.or_(pc.equal(yr, Q7_YEARS[0]), pc.equal(yr, Q7_YEARS[1]))
        t = t.append_column("l_year", pc.cast(yr, pa.int64())).filter(m)
        if len(t) == 0:
            return
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "l_year": t.column("l_year"),
                "rev_i": pa.array(price_c * (100 - disc_b)),
            }
        ).group_by(["l_orderkey", "l_suppkey", "l_year"]).aggregate(
            [("rev_i", "sum")]
        )
        yield g.rename_columns(["l_orderkey", "l_suppkey", "l_year", "rev_i"])

    li = _read(sf_dir, "lineitem", cols).map_batches(
        li_pre, batch_format="pyarrow"
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li = join_auto(
        li, supp, on=("l_suppkey",), right_on=("s_suppkey",), num_partitions=P
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = join_auto(
        li, orders, on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=P,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = join_auto(
        j, cust, on=("o_custkey",), right_on=("c_custkey",), num_partitions=P
    )

    def reduce_pairs(t: pa.Table):
        if len(t) == 0 or "c_nationkey" not in t.schema.names:
            return
        t = t.filter(
            pc.not_equal(
                pc.cast(t.column("s_nationkey"), pa.int64()),
                pc.cast(t.column("c_nationkey"), pa.int64()),
            )
        )
        if len(t) == 0:
            return
        g = pa.table(
            {
                "sn": t.column("s_nationkey"),
                "cn": t.column("c_nationkey"),
                "l_year": t.column("l_year"),
                "rev_i": t.column("rev_i"),
            }
        ).group_by(["sn", "cn", "l_year"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["sn", "cn", "l_year", "rev_i"])

    g = j.map_batches(reduce_pairs, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "sn" not in t.schema.names:
            return
        t = t.group_by(["sn", "cn", "l_year"]).aggregate([("rev_i", "sum")])
        sn = t.column("sn").to_numpy(zero_copy_only=False)
        cn = t.column("cn").to_numpy(zero_copy_only=False)
        rev = t.column("rev_i_sum").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "supp_nation": pa.array(
                    [names[int(k)] for k in sn], pa.string()
                ),
                "cust_nation": pa.array(
                    [names[int(k)] for k in cn], pa.string()
                ),
                "l_year": t.column("l_year"),
                "revenue": pa.array(rev.astype(np.float64) / 10000.0),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


VOLUME_SHIPPING_SQL = """
WITH f AS (
  SELECT l_orderkey, l_suppkey,
    CAST(year(l_shipdate) AS BIGINT) AS l_year,
    CAST(ROUND(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev_i
  FROM lineitem WHERE year(l_shipdate) IN (1997, 1998)
)
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, f.l_year,
  CAST(SUM(f.rev_i) AS DOUBLE)/10000.0 AS revenue
FROM f
JOIN supplier s ON f.l_suppkey = s.s_suppkey
JOIN orders o ON f.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE s.s_nationkey <> c.c_nationkey
GROUP BY n1.n_name, n2.n_name, f.l_year
"""


# --------------------------------------------------------------------------
# top returned-revenue customers (TPC-H Q10 shape)
# --------------------------------------------------------------------------

Q10_WINDOW = ((1998, 7, 1), (1998, 10, 1))
Q10_K = 20


def top_returned_customers(sf_dir: str, k: int = Q10_K) -> ray.data.Dataset:
    """Top-k customers by revenue on RETURNED lines for orders placed
    in one quarter, with name/nation/balance context.  Funnel reduces
    between joins (order→rev, customer→rev); deterministic (revenue
    desc, c_custkey) tie-break on exact doubles."""
    import os

    import pyarrow.parquet as pq

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    cols = ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]

    def li_pre(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        if len(t) == 0:
            return
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_i": pa.array(price_c * (100 - disc_b)),
            }
        ).group_by(["l_orderkey"]).aggregate([("rev_i", "sum")])
        yield g.rename_columns(["l_orderkey", "rev_i"])

    li = keyed_reagg(
        _read(sf_dir, "lineitem", cols).map_batches(li_pre, batch_format="pyarrow"),
        ["l_orderkey"], [("rev_i", "sum")], P,
    )

    def o_pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), _ts(*Q10_WINDOW[0])),
            pc.less(t.column("o_orderdate"), _ts(*Q10_WINDOW[1])),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        yield t.select(["o_orderkey", "o_custkey"])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_pre, batch_format="pyarrow")
    j = join_auto(
        orders, li, on=("o_orderkey",), right_on=("l_orderkey",),
        num_partitions=P,
    )

    def per_cust(t: pa.Table):
        if len(t) == 0 or "rev_i" not in t.schema.names:
            return
        g = t.select(["o_custkey", "rev_i"]).group_by(["o_custkey"]).aggregate(
            [("rev_i", "sum")]
        )
        yield g.rename_columns(["o_custkey", "rev_i"])

    percust = keyed_reagg(
        j.map_batches(per_cust, batch_format="pyarrow"),
        ["o_custkey"], [("rev_i", "sum")], P,
    )
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
    )
    jc = join_auto(
        percust, cust, on=("o_custkey",), right_on=("c_custkey",),
        num_partitions=P,
    )

    def finish(t: pa.Table):
        if len(t) == 0 or "c_name" not in t.schema.names:
            return
        rev = t.column("rev_i").to_numpy(zero_copy_only=False)
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": t.column("c_name"),
                "revenue": pa.array(rev.astype(np.float64) / 10000.0),
                "n_name": pa.array([names[int(x)] for x in nk], pa.string()),
                "c_acctbal": t.column("c_acctbal"),
            }
        )

    return (
        jc.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
    )


TOP_RETURNED_CUSTOMERS_SQL = """
WITH l AS (
  SELECT l_orderkey,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_i
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
),
o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-07-01'
    AND o_orderdate < TIMESTAMP '1998-10-01'
),
pc AS (
  SELECT o.o_custkey, SUM(l.rev_i) AS rev_i
  FROM o JOIN l ON o.o_orderkey = l.l_orderkey GROUP BY 1
)
SELECT c.c_custkey, c.c_name, CAST(pc.rev_i AS DOUBLE)/10000.0 AS revenue,
  n.n_name, c.c_acctbal
FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY revenue DESC, c.c_custkey LIMIT 20
"""


# --------------------------------------------------------------------------
# semi-structured extraction: events.props JSON field stats per type
# --------------------------------------------------------------------------

_PROPS_K_RE = r'"k":\s*(?P<k>\d+)'  # extract_regex needs a NAMED group


def props_k_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type count/sum/max/mean of the integer field ``k``
    embedded in the ``props`` JSON string — the vectorized
    semi-structured-extraction pattern (``pc.extract_regex`` per batch,
    no row loop, no JSON parser).  Integer sums; mean converts once."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        ex = pc.extract_regex(t.column("props"), _PROPS_K_RE)
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "s": k,
                "mx": k,
                "n": _ones(len(t)),
            }
        ).group_by(["event_type"]).aggregate(
            [("s", "sum"), ("mx", "max"), ("n", "sum")]
        )
        yield g.rename_columns(["event_type", "s", "mx", "n"])

    g = (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(pre, batch_format="pyarrow")
        .repartition(1)  # ≤ |event types| rows per partial
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type"]).aggregate(
            [("s", "sum"), ("mx", "max"), ("n", "sum")]
        )
        s = t.column("s_sum").to_numpy(zero_copy_only=False)
        n = t.column("n_sum").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": t.column("n_sum"),
                "sum_k": t.column("s_sum"),
                "max_k": t.column("mx_max"),
                "avg_k": pa.array(
                    s.astype(np.float64) / n.astype(np.float64)
                ),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


PROPS_K_STATS_SQL = """
WITH b AS (
  SELECT event_type,
    CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k,
  CAST(SUM(k) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS avg_k
FROM b GROUP BY event_type
"""


# --------------------------------------------------------------------------
# market-basket co-occurrence: top-k part pairs ordered together
# --------------------------------------------------------------------------

PART_PAIRS_K = 20


def part_pairs_topk(sf_dir: str, k: int = PART_PAIRS_K) -> ray.data.Dataset:
    """Top-k pairs of parts appearing in the same order.  One
    repartition by orderkey co-locates each order's lines; the block
    kernel dedups parts per order and emits all within-order pairs
    VECTORIZED (repeat/cumsum index arithmetic — per-order fan-out is
    bounded by lines-per-order², ~55 here, never corpus-quadratic);
    global pair counts reduce via ``keyed_reagg``; each count block
    keeps its local top-k so the final coalesce merges O(P·k) rows."""

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
        # element i pairs with the (group_size - 1 - local_pos) elements
        # after it; enumerate those pairs with pure index arithmetic
        local = np.arange(len(ok)) - np.repeat(starts, sizes)
        cnt = np.repeat(sizes, sizes) - 1 - local
        first = np.repeat(np.arange(len(ok)), cnt)
        cum = np.cumsum(cnt)
        off = np.arange(int(cnt.sum())) - np.repeat(cum - cnt, cnt)
        second = first + 1 + off
        if len(first) == 0:
            return
        g = pa.table(
            {
                "pa_key": pa.array(pk[first]),
                "pb_key": pa.array(pk[second]),
                "n": pa.array(np.ones(len(first), np.int64)),
            }
        ).group_by(["pa_key", "pb_key"]).aggregate([("n", "sum")])
        yield g.rename_columns(["pa_key", "pb_key", "n"])

    counted = keyed_reagg(
        co.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        ["pa_key", "pb_key"], [("n", "sum")], P,
    )

    def local_topk(t: pa.Table):
        if t.num_rows == 0 or "pa_key" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        a = t.column("pa_key").to_numpy(zero_copy_only=False)
        b = t.column("pb_key").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -n))[:k]
        yield t.take(pa.array(order))

    merged = counted.map_batches(
        local_topk, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "pa_key" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        a = t.column("pa_key").to_numpy(zero_copy_only=False)
        b = t.column("pb_key").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -n))[:k]
        out = t.take(pa.array(order))
        yield out.rename_columns(["pa_key", "pb_key", "pair_count"])

    return merged.map_batches(finish, batch_size=None, batch_format="pyarrow")


PART_PAIRS_TOPK_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS pa_key, b.l_partkey AS pb_key,
  CAST(COUNT(*) AS BIGINT) AS pair_count
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY pair_count DESC, pa_key, pb_key LIMIT 20
"""


# --------------------------------------------------------------------------
# exact per-group Pearson correlation (integer moments)
# --------------------------------------------------------------------------


def value_hour_corr(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type Pearson correlation between event value (cents)
    and hour-of-day — EXACT against SQL: both sides accumulate the five
    integer moments (Σx, Σy, Σxy, Σx², Σy²) and apply the identical
    float formula once; cross terms use Python big ints on the
    ≤|groups| reduced rows (HUGEINT in SQL).  Headroom: x ≤ 3.3e4,
    y ≤ 23 ⇒ Σx² partials safe to ~8e9 rows/block in int64."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        x = _i64(t.column("value"), 100)
        y = (
            pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        ) % 24
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "n": _ones(len(t)),
            }
        ).group_by(["event_type"]).aggregate(
            [(c, "sum") for c in ("sx", "sy", "sxy", "sxx", "syy", "n")]
        )
        yield g.rename_columns(
            ["event_type", "sx", "sy", "sxy", "sxx", "syy", "n"]
        )

    g = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(pre, batch_format="pyarrow")
        .repartition(1)  # ≤ |event types| rows per partial
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type"]).aggregate(
            [(c, "sum") for c in ("sx", "sy", "sxy", "sxx", "syy", "n")]
        )
        corrs = []
        for sx, sy, sxy, sxx, syy, n in zip(
            t.column("sx_sum").to_pylist(),
            t.column("sy_sum").to_pylist(),
            t.column("sxy_sum").to_pylist(),
            t.column("sxx_sum").to_pylist(),
            t.column("syy_sum").to_pylist(),
            t.column("n_sum").to_pylist(),
        ):
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            corrs.append(
                float(cov) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
            )
        yield pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": t.column("n_sum"),
                "corr_value_hour": pa.array(corrs, pa.float64()),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


VALUE_HOUR_CORR_SQL = """
WITH b AS (
  SELECT event_type,
    CAST(ROUND(value*100) AS BIGINT) AS x,
    (epoch_us(ts) // 3600000000) % 24 AS y
  FROM events
),
a AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
    CAST(SUM(x*y) AS HUGEINT) AS sxy,
    SUM(CAST(x AS HUGEINT)*x) AS sxx, CAST(SUM(y*y) AS HUGEINT) AS syy
  FROM b GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
  CAST(n*sxy - sx*sy AS DOUBLE)
    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
       * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_value_hour
FROM a
"""


# --------------------------------------------------------------------------
# per-group OLS regression (regr_slope / regr_intercept shape)
# --------------------------------------------------------------------------


def event_value_regression(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type least-squares line value_cents = a·hour + b —
    EXACT against SQL by the value_hour_corr strategy: both sides
    accumulate the integer moments (n, Σx, Σy, Σxy, Σx²), form the
    closed-form numerators/denominator in big ints (HUGEINT in SQL),
    and divide once as float64.  slope = (nΣxy − ΣxΣy)/(nΣx² − Σx²_),
    intercept = (ΣyΣx² − ΣxΣxy)/(nΣx² − Σx²_) — the intercept uses the
    joint closed form, NOT (ȳ − slope·x̄), so no intermediate float
    product exists on either side."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        x = (
            pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        ) % 24
        y = _i64(t.column("value"), 100)
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
                "n": _ones(len(t)),
            }
        ).group_by(["event_type"]).aggregate(
            [(c, "sum") for c in ("sx", "sy", "sxy", "sxx", "n")]
        )
        yield g.rename_columns(["event_type", "sx", "sy", "sxy", "sxx", "n"])

    g = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(pre, batch_format="pyarrow")
        .repartition(1)  # ≤ |event types| rows per partial
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type"]).aggregate(
            [(c, "sum") for c in ("sx", "sy", "sxy", "sxx", "n")]
        )
        slopes, icepts = [], []
        for sx, sy, sxy, sxx, n in zip(
            t.column("sx_sum").to_pylist(),
            t.column("sy_sum").to_pylist(),
            t.column("sxy_sum").to_pylist(),
            t.column("sxx_sum").to_pylist(),
            t.column("n_sum").to_pylist(),
        ):
            den = n * sxx - sx * sx  # Python big ints: no overflow
            slopes.append(float(n * sxy - sx * sy) / float(den))
            icepts.append(float(sy * sxx - sx * sxy) / float(den))
        yield pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": t.column("n_sum"),
                "slope_cents_per_hour": pa.array(slopes, pa.float64()),
                "intercept_cents": pa.array(icepts, pa.float64()),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_REGRESSION_SQL = """
WITH b AS (
  SELECT event_type,
    (epoch_us(ts) // 3600000000) % 24 AS x,
    CAST(ROUND(value*100) AS BIGINT) AS y
  FROM events
),
a AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
    CAST(SUM(x*y) AS HUGEINT) AS sxy, CAST(SUM(x*x) AS HUGEINT) AS sxx
  FROM b GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
    AS slope_cents_per_hour,
  CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
    AS intercept_cents
FROM a
"""


# --------------------------------------------------------------------------
# trailing moving average (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)
# --------------------------------------------------------------------------

MA_WINDOW = 3


def user_value_moving_avg(sf_dir: str, k: int = MA_WINDOW) -> ray.data.Dataset:
    """Per-event trailing k-row mean of `value` per user ordered by
    (ts, event_id) — the bounded-window sibling of
    :func:`rayrank.analytics.user_running_totals`.  One keyed
    repartition co-locates each user; the kernel is a lexsort + integer
    prefix sum with a k-lagged difference (cent snap ⇒ the window sum is
    exact; one float division per row, restated identically in SQL)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
                "val_c": pa.array(_i64(t.column("value"), 100)),
            }
        )

    co = ev.map_batches(prep, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def window(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        vc = t.column("val_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, us, u))
        u, e, vc = u[order], e[order], vc[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        local = np.arange(len(u)) - np.repeat(starts, sizes)
        cs = np.cumsum(vc)
        # window sum = cs[i] - cs[i-k], clamped at the group start
        lag = np.maximum(
            np.arange(len(u)) - k, np.repeat(starts, sizes) - 1
        )
        wsum = cs - np.where(lag >= 0, cs[np.maximum(lag, 0)], np.int64(0))
        wn = np.minimum(local + 1, k)
        yield pa.table(
            {
                "event_id": pa.array(e),
                "user_id": pa.array(u),
                "ma_value": pa.array(
                    wsum.astype(np.float64) / 100.0 / wn.astype(np.float64)
                ),
            }
        )

    return co.map_batches(window, batch_size=None, batch_format="pyarrow")


USER_VALUE_MOVING_AVG_SQL = """
SELECT event_id, user_id,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS DOUBLE)/100.0
    / CAST(COUNT(*) OVER w AS DOUBLE) AS ma_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# rank within group (ROW_NUMBER over PARTITION BY)
# --------------------------------------------------------------------------


def customer_order_ranks(sf_dir: str) -> ray.data.Dataset:
    """Every order ranked within its customer by (o_totalprice desc,
    o_orderkey) — full ROW_NUMBER assignment, not just top-k.  One
    keyed repartition, then a block-local lexsort rank; the orderkey
    tie-break makes ranks deterministic (double compare only — both
    sides order the same stored doubles, no arithmetic)."""
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    )
    co = orders.repartition(P, keys=["o_custkey"])

    def rank(t: pa.Table):
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        o = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, -p, c))
        c, o, p = c[order], o[order], p[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        sizes = np.diff(np.r_[starts, len(c)])
        rnk = np.arange(len(c)) - np.repeat(starts, sizes) + 1
        yield pa.table(
            {
                "o_orderkey": pa.array(o),
                "o_custkey": pa.array(c),
                "o_totalprice": pa.array(p),
                "rnk": pa.array(rnk.astype(np.int64)),
            }
        )

    return co.map_batches(rank, batch_size=None, batch_format="pyarrow")


CUSTOMER_ORDER_RANKS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
FROM orders
"""


# --------------------------------------------------------------------------
# degree assortativity of the lineitem bipartite graph (exact moments)
# --------------------------------------------------------------------------


def degree_assortativity(sf_dir: str) -> ray.data.Dataset:
    """Pearson correlation between source out-degree and target
    in-degree across all edge rows of the (orderkey → partkey)
    multigraph — one scalar summarizing hub-to-hub wiring.  Degrees
    reduce via ``keyed_reagg``; each degree table joins back under the
    broadcast guard; the five integer moments fold in the final
    coalesce (HUGEINT cross terms in SQL, big ints here)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pre_out(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.select(["l_orderkey"])
            .append_column("d", _ones(len(t)))
            .group_by(["l_orderkey"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["l_orderkey", "outdeg"])

    def pre_in(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.select(["l_partkey"])
            .append_column("d", _ones(len(t)))
            .group_by(["l_partkey"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["l_partkey", "indeg"])

    outdeg = keyed_reagg(
        li.map_batches(pre_out, batch_format="pyarrow"),
        ["l_orderkey"], [("outdeg", "sum")], P,
    )
    indeg = keyed_reagg(
        li.map_batches(pre_in, batch_format="pyarrow"),
        ["l_partkey"], [("indeg", "sum")], P,
    )
    def _moments_table(x: np.ndarray, y: np.ndarray):
        return pa.table(
            {
                "sx": pa.array([int(x.sum())]),
                "sy": pa.array([int(y.sum())]),
                "sxy": pa.array([int((x * y).sum())]),
                "sxx": pa.array([int((x * x).sum())]),
                "syy": pa.array([int((y * y).sum())]),
                "n": pa.array([len(x)]),
            }
        )

    kv_out = _collect_kv(outdeg, "l_orderkey", "outdeg")
    kv_in = _collect_kv(indeg, "l_partkey", "indeg")
    if kv_out is not None and kv_in is not None:
        # degree tables fit the guard: ship them once, probe per batch
        # (searchsorted is exact — every edge key exists by construction)
        import ray as _ray

        refs = tuple(_ray.put(a) for a in (*kv_out, *kv_in))

        def probe(t: pa.Table):
            if len(t) == 0:
                return
            ok, od, pk, idg = (_ray.get(r) for r in refs)
            s = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            d = t.column("l_partkey").to_numpy(zero_copy_only=False)
            x = od[np.searchsorted(ok, s)]
            y = idg[np.searchsorted(pk, d)]
            yield _moments_table(x, y)

        g = li.map_batches(probe, batch_format="pyarrow").repartition(1)
    else:
        j = join_auto(li, outdeg, on=("l_orderkey",), num_partitions=P)
        j = join_auto(j, indeg, on=("l_partkey",), num_partitions=P)

        def moments(t: pa.Table):
            if len(t) == 0 or "indeg" not in t.schema.names:
                return
            x = t.column("outdeg").to_numpy(zero_copy_only=False)
            y = t.column("indeg").to_numpy(zero_copy_only=False)
            yield _moments_table(x, y)

        g = j.map_batches(moments, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "sx" not in t.schema.names:
            return
        sx = sum(t.column("sx").to_pylist())
        sy = sum(t.column("sy").to_pylist())
        sxy = sum(t.column("sxy").to_pylist())
        sxx = sum(t.column("sxx").to_pylist())
        syy = sum(t.column("syy").to_pylist())
        n = sum(t.column("n").to_pylist())
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        r = float(cov) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        yield pa.table(
            {
                "n_edges": pa.array([n], pa.int64()),
                "assortativity": pa.array([r], pa.float64()),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


DEGREE_ASSORTATIVITY_SQL = """
WITH o AS (SELECT l_orderkey, COUNT(*) AS outdeg FROM lineitem GROUP BY 1),
i AS (SELECT l_partkey, COUNT(*) AS indeg FROM lineitem GROUP BY 1),
e AS (
  SELECT o.outdeg AS x, i.indeg AS y
  FROM lineitem l
  JOIN o ON l.l_orderkey = o.l_orderkey
  JOIN i ON l.l_partkey = i.l_partkey
),
a AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
    SUM(CAST(x AS HUGEINT)*y) AS sxy,
    SUM(CAST(x AS HUGEINT)*x) AS sxx, SUM(CAST(y AS HUGEINT)*y) AS syy
  FROM e
)
SELECT CAST(n AS BIGINT) AS n_edges,
  CAST(n*sxy - sx*sy AS DOUBLE)
    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
       * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS assortativity
FROM a
"""


# --------------------------------------------------------------------------
# neighbor Jaccard similarity top-k (normalized co-occurrence)
# --------------------------------------------------------------------------

JACCARD_PAIRS_K = 20


def part_jaccard_topk(sf_dir: str, k: int = JACCARD_PAIRS_K) -> ray.data.Dataset:
    """Top-k part pairs by Jaccard similarity of their ORDER sets:
    |A∩B| comes from the within-order pair counts (the part_pairs
    machinery), |A| and |B| from per-part distinct-order counts joined
    back under the broadcast guard; jacc = c/(da+db−c) is one exact
    small-int division, identical on both sides, so the (jacc desc,
    pa, pb) top-k is deterministic."""

    def dedup_pre(t: pa.Table):
        if len(t) == 0:
            return
        yield t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    dd = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        dedup_pre, batch_format="pyarrow"
    )
    # materialized ONCE: both the pair stream and the per-part degree
    # stream consume the orderkey-co-located blocks — without the cut
    # each consumption re-runs the read + dedup + keyed exchange
    from .shuffle import materialize_cut as _mcut

    co = _mcut(dd.repartition(P, keys=["l_orderkey"]))

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
        g = pa.table(
            {
                "pa_key": pa.array(pk[first]),
                "pb_key": pa.array(pk[second]),
                "c": pa.array(np.ones(len(first), np.int64)),
            }
        ).group_by(["pa_key", "pb_key"]).aggregate([("c", "sum")])
        yield g.rename_columns(["pa_key", "pb_key", "c"])

    counted = keyed_reagg(
        co.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        ["pa_key", "pb_key"], [("c", "sum")], P,
    )

    # per-part distinct-order counts (the dedup stream reduced by part)
    def per_part(t: pa.Table):
        if len(t) == 0 or "l_partkey" not in t.schema.names:
            return
        g = (
            t.select(["l_partkey"])
            .append_column("d", _ones(len(t)))
            .group_by(["l_partkey"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["l_partkey", "d"])

    # NOTE: per-block dedup partials may double-count an order split
    # across blocks, so count from the orderkey-partitioned stream
    # where each (order, part) survives exactly once
    def strict_dedup(t: pa.Table):
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return
        yield t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    deg = keyed_reagg(
        co.map_batches(strict_dedup, batch_size=None, batch_format="pyarrow")
        .map_batches(per_part, batch_format="pyarrow"),
        ["l_partkey"], [("d", "sum")], P,
    )

    def _score_table(a, b, c, da, db):
        jac = c.astype(np.float64) / (da + db - c).astype(np.float64)
        order = np.lexsort((b, a, -jac))[:k]
        return pa.table(
            {
                "pa_key": pa.array(a[order]),
                "pb_key": pa.array(b[order]),
                "jaccard": pa.array(jac[order]),
            }
        )

    kv = _collect_kv(deg, "l_partkey", "d")
    if kv is not None:
        # per-part degree fits the guard: broadcast once, probe both
        # pair endpoints per batch — no join touches the pair table
        import ray as _ray

        kref, vref = _ray.put(kv[0]), _ray.put(kv[1])

        def score_bcast(t: pa.Table):
            if t.num_rows == 0 or "pa_key" not in t.schema.names:
                return
            pk, dv = _ray.get(kref), _ray.get(vref)
            a = t.column("pa_key").to_numpy(zero_copy_only=False)
            b = t.column("pb_key").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            yield _score_table(
                a, b, c, dv[np.searchsorted(pk, a)], dv[np.searchsorted(pk, b)]
            )

        merged = counted.map_batches(
            score_bcast, batch_size=None, batch_format="pyarrow"
        ).repartition(1)
    else:
        j = join_auto(
            counted, deg, on=("pa_key",), right_on=("l_partkey",),
            num_partitions=P,
        )

        def rn_da(t: pa.Table):
            if len(t) == 0 or "d" not in t.schema.names:
                return
            yield t.rename_columns(["pa_key", "pb_key", "c", "da"])

        j = j.map_batches(rn_da, batch_format="pyarrow")
        j = join_auto(
            j, deg, on=("pb_key",), right_on=("l_partkey",), num_partitions=P
        )

        def score_topk(t: pa.Table):
            if len(t) == 0 or "d" not in t.schema.names:
                return
            yield _score_table(
                t.column("pa_key").to_numpy(zero_copy_only=False),
                t.column("pb_key").to_numpy(zero_copy_only=False),
                t.column("c").to_numpy(zero_copy_only=False),
                t.column("da").to_numpy(zero_copy_only=False),
                t.column("d").to_numpy(zero_copy_only=False),
            )

        merged = j.map_batches(
            score_topk, batch_size=None, batch_format="pyarrow"
        ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "pa_key" not in t.schema.names:
            return
        jac = t.column("jaccard").to_numpy(zero_copy_only=False)
        a = t.column("pa_key").to_numpy(zero_copy_only=False)
        b = t.column("pb_key").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -jac))[:k]
        yield t.take(pa.array(order))

    return merged.map_batches(finish, batch_size=None, batch_format="pyarrow")


PART_JACCARD_TOPK_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
deg AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS dd FROM d GROUP BY 1),
p AS (
  SELECT a.l_partkey AS pa_key, b.l_partkey AS pb_key,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.pa_key, p.pb_key,
  CAST(p.c AS DOUBLE)/CAST(da.dd + db.dd - p.c AS DOUBLE) AS jaccard
FROM p JOIN deg da ON p.pa_key = da.l_partkey
JOIN deg db ON p.pb_key = db.l_partkey
ORDER BY jaccard DESC, p.pa_key, p.pb_key LIMIT 20
"""


# --------------------------------------------------------------------------
# Adamic-Adar link prediction (log-weighted common neighbors, top-k)
# --------------------------------------------------------------------------

AA_TOPK = 20


def adamic_adar_topk(sf_dir: str, k: int = AA_TOPK) -> ray.data.Dataset:
    """Top-k part pairs by Adamic-Adar score over the order-part
    bipartite graph: AA(a,b) = Σ over common orders o of 1/ln(|o|).

    Exactness technique (new in this family): the irrational per-center
    contribution 1/ln(s) is QUANTIZED to int64 at wedge time —
    wq = ⌊1e9/ln(s) + 0.5⌋, identical float expression both sides
    (FLOOR(x+0.5), not ROUND: numpy rounds half-to-even, DuckDB
    half-away) — so the per-pair score is an exact integer sum, the
    top-k ranks on the INTEGER with (pa, pb) tie-break, and the float
    score is one division by 1e9 at the end.  Same wedge machinery as
    part_pairs/part_jaccard: one repartition by orderkey, vectorized
    pair expansion, block-local pre-sum, keyed re-agg, O(k) merge."""

    def dedup_pre(t: pa.Table):
        if len(t) == 0:
            return
        yield t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    dd = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        dedup_pre, batch_format="pyarrow"
    )
    co = dd.repartition(P, keys=["l_orderkey"])

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
        # per-order quantized weight, expanded to rows then to pairs
        w_grp = np.zeros(len(sizes), np.int64)
        big = sizes >= 2
        w_grp[big] = np.floor(
            1e9 / np.log(sizes[big].astype(np.float64)) + 0.5
        ).astype(np.int64)
        w_row = np.repeat(w_grp, sizes)
        local = np.arange(len(ok)) - np.repeat(starts, sizes)
        cnt = np.repeat(sizes, sizes) - 1 - local
        first = np.repeat(np.arange(len(ok)), cnt)
        cum = np.cumsum(cnt)
        off = np.arange(int(cnt.sum())) - np.repeat(cum - cnt, cnt)
        second = first + 1 + off
        if len(first) == 0:
            return
        g = pa.table(
            {
                "pa_key": pa.array(pk[first]),
                "pb_key": pa.array(pk[second]),
                "wq": pa.array(w_row[first]),
            }
        ).group_by(["pa_key", "pb_key"]).aggregate([("wq", "sum")])
        yield g.rename_columns(["pa_key", "pb_key", "wq"])

    counted = keyed_reagg(
        co.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        ["pa_key", "pb_key"], [("wq", "sum")], P,
    )

    def local_topk(t: pa.Table):
        if t.num_rows == 0 or "wq" not in t.schema.names:
            return
        a = t.column("pa_key").to_numpy(zero_copy_only=False)
        b = t.column("pb_key").to_numpy(zero_copy_only=False)
        w = t.column("wq").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -w))[:k]
        yield pa.table(
            {
                "pa_key": pa.array(a[order]),
                "pb_key": pa.array(b[order]),
                "wq": pa.array(w[order]),
            }
        )

    pre = counted.map_batches(
        local_topk, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "wq" not in t.schema.names:
            return
        a = t.column("pa_key").to_numpy(zero_copy_only=False)
        b = t.column("pb_key").to_numpy(zero_copy_only=False)
        w = t.column("wq").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -w))[:k]
        yield pa.table(
            {
                "pa_key": pa.array(a[order]),
                "pb_key": pa.array(b[order]),
                "adamic_adar": pa.array(
                    w[order].astype(np.float64) / 1e9, pa.float64()
                ),
            }
        )

    return pre.map_batches(finish, batch_size=None, batch_format="pyarrow")


ADAMIC_ADAR_TOPK_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
deg AS (
  SELECT l_orderkey,
    CAST(FLOOR(1e9/ln(CAST(COUNT(*) AS DOUBLE)) + 0.5) AS BIGINT) AS wq
  FROM d GROUP BY l_orderkey HAVING COUNT(*) >= 2
),
p AS (
  SELECT a.l_partkey AS pa_key, b.l_partkey AS pb_key,
    CAST(SUM(g.wq) AS BIGINT) AS swq
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN deg g ON g.l_orderkey = a.l_orderkey
  GROUP BY 1, 2
)
SELECT pa_key, pb_key, CAST(swq AS DOUBLE)/1e9 AS adamic_adar
FROM p ORDER BY swq DESC, pa_key, pb_key LIMIT 20
"""


# --------------------------------------------------------------------------
# Bloom-prefiltered semi-join funnel
# --------------------------------------------------------------------------


def urgent_year_revenue(sf_dir: str) -> ray.data.Dataset:
    """Lineitem revenue per ship-year restricted to 1-URGENT orders —
    the Bloom-prefiltered semi-join funnel.  The urgent key set can be
    too large to broadcast exactly at corpus scale, so a Bloom bitmap
    (10 bits/key, k=7, ~1% FP) ships once via ray.put and drops ~80% of
    lineitem rows BEFORE the semi-join shuffle; the exact join behind
    it removes the false positives, so the result is EXACT and the
    oracle is the plain join SQL.  Aggregation is integer cents with a
    coalesced tiny re-agg (pricing_summary pattern)."""
    from .joins import bloom_bits, bloom_prefilter

    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def ukeys_fn(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
        if len(t):
            yield t.select(["o_orderkey"])

    ukeys = o.map_batches(ukeys_fn, batch_format="pyarrow").materialize()
    n_keys = ukeys.count()

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice"]
    )
    bits_ref, m, k = bloom_bits(ukeys, "o_orderkey", n_keys)
    maybe = bloom_prefilter(li, "l_orderkey", bits_ref, m, k)
    exact = join_auto(
        maybe, ukeys, on=("l_orderkey",), right_on=("o_orderkey",),
        how="semi", num_partitions=P,
    )

    def pre(t: pa.Table):
        if len(t) == 0 or "l_shipdate" not in t.schema.names:
            return
        g = pa.table(
            {
                "yr": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
                "rev_c": pa.array(_i64(t.column("l_extendedprice"), 100)),
                "n": _ones(len(t)),
            }
        ).group_by(["yr"]).aggregate([("rev_c", "sum"), ("n", "sum")])
        yield g.rename_columns(["yr", "rev_c", "n"])

    g = exact.map_batches(pre, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "yr" not in t.schema.names:
            return
        t = t.group_by(["yr"]).aggregate([("rev_c", "sum"), ("n", "sum")])
        yield pa.table(
            {
                "yr": t.column("yr"),
                "revenue": pc.divide(
                    pc.cast(t.column("rev_c_sum"), pa.float64()), 100.0
                ),
                "n_items": t.column("n_sum"),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


URGENT_YEAR_REVENUE_SQL = """
SELECT CAST(year(l.l_shipdate) AS BIGINT) AS yr,
  CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0
    AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# product-type profit (TPC-H Q9 shape): revenue − cost by supplier
# nation × ship-year
# --------------------------------------------------------------------------

Q9_TYPE = "PROMO"


def product_type_profit(sf_dir: str) -> ray.data.Dataset:
    """Per supplier-nation/ship-year profit on one part type — the Q9
    shape adapted to the testdata schema (no partsupp table; unit cost
    is ``p_retailprice``).  Exactness: per-line profit is the pure-int
    expression ``price_c·(100−disc_b) − retail_c·qty·100`` (common
    1e-4-dollar unit), summed in int64, one double conversion at the
    end.  Scale shape: the filtered part side rides ``join_auto``'s
    broadcast guard into the fact scan; the scan reduces to
    (suppkey, year, profit) partials before the supplier join, so the
    second join moves O(suppliers·years) rows; nation names resolve
    from the 25-row driver dictionary; the ≤25·years-group final
    coalesces."""
    import os

    import pyarrow.parquet as pq

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    part = _read(sf_dir, "part", ["p_partkey", "p_type", "p_retailprice"])

    def p_pre(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("p_type"), Q9_TYPE))
        if len(t) == 0:
            return
        yield pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "retail_c": pa.array(_i64(t.column("p_retailprice"), 100)),
            }
        )

    part = part.map_batches(p_pre, batch_format="pyarrow")

    li = _read(
        sf_dir,
        "lineitem",
        [
            "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )
    j = join_auto(
        li, part, on=("l_partkey",), right_on=("p_partkey",), num_partitions=P
    )

    def profit_pre(t: pa.Table):
        if len(t) == 0 or "retail_c" not in t.schema.names:
            return
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        qty = _i64(t.column("l_quantity"))
        retail_c = t.column("retail_c").to_numpy(zero_copy_only=False)
        profit_i = price_c * (100 - disc_b) - retail_c * qty * 100
        yr = pc.cast(pc.year(t.column("l_shipdate")), pa.int64())
        g = pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "l_year": yr,
                "profit_i": pa.array(profit_i),
            }
        ).group_by(["l_suppkey", "l_year"]).aggregate([("profit_i", "sum")])
        yield g.rename_columns(["l_suppkey", "l_year", "profit_i"])

    by_supp = j.map_batches(profit_pre, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j2 = join_auto(
        by_supp, supp, on=("l_suppkey",), right_on=("s_suppkey",),
        num_partitions=P,
    )

    def nation_pre(t: pa.Table):
        if len(t) == 0 or "s_nationkey" not in t.schema.names:
            return
        g = pa.table(
            {
                "nk": t.column("s_nationkey"),
                "l_year": t.column("l_year"),
                "profit_i": t.column("profit_i"),
            }
        ).group_by(["nk", "l_year"]).aggregate([("profit_i", "sum")])
        yield g.rename_columns(["nk", "l_year", "profit_i"])

    g = j2.map_batches(nation_pre, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "nk" not in t.schema.names:
            return
        t = t.group_by(["nk", "l_year"]).aggregate([("profit_i", "sum")])
        nk = t.column("nk").to_numpy(zero_copy_only=False)
        pi = t.column("profit_i_sum").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "nation": pa.array([names[int(k)] for k in nk], pa.string()),
                "l_year": t.column("l_year"),
                "profit": pa.array(pi.astype(np.float64) / 10000.0),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


PRODUCT_TYPE_PROFIT_SQL = f"""
WITH f AS (
  SELECT l_suppkey, CAST(year(l_shipdate) AS BIGINT) AS l_year,
    CAST(ROUND(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
    - CAST(ROUND(p_retailprice*100) AS BIGINT)
      * CAST(ROUND(l_quantity) AS BIGINT) * 100 AS profit_i
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q9_TYPE}'
)
SELECT n.n_name AS nation, f.l_year,
  CAST(SUM(f.profit_i) AS DOUBLE)/10000.0 AS profit
FROM f
JOIN supplier s ON f.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# line-status priority counts (TPC-H Q12 shape): CASE-sum over a join
# --------------------------------------------------------------------------

Q12_WINDOW = ((1997, 1, 1), (1998, 1, 1))
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def linestatus_priority_counts(sf_dir: str) -> ray.data.Dataset:
    """Per line status, how many shipped lines belong to high- vs
    low-priority orders — the Q12 CASE-sum-over-a-join shape (grouping
    key adapted: ``l_linestatus`` stands in for the absent
    ``l_shipmode``).  The fact scan reduces to (orderkey, status, cnt)
    partials inside the window before the orders join; the CASE split
    is a vectorized mask over the joined priority; the 2-group final
    coalesces."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])
    lo, hi = Q12_WINDOW

    def li_pre(t: pa.Table):
        if len(t) == 0:
            return
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(*lo)),
            pc.less(t.column("l_shipdate"), _ts(*hi)),
        )
        t = t.filter(m)
        if len(t) == 0:
            return
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linestatus": t.column("l_linestatus"),
                "cnt": _ones(len(t)),
            }
        ).group_by(["l_orderkey", "l_linestatus"]).aggregate([("cnt", "sum")])
        yield g.rename_columns(["l_orderkey", "l_linestatus", "cnt"])

    li = li.map_batches(li_pre, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = join_auto(
        li, orders, on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=P,
    )

    def case_pre(t: pa.Table):
        if len(t) == 0 or "o_orderpriority" not in t.schema.names:
            return
        high = pc.is_in(
            t.column("o_orderpriority"),
            value_set=pa.array(list(_Q12_HIGH), pa.string()),
        ).to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "l_linestatus": t.column("l_linestatus"),
                "high_line_count": pa.array(np.where(high, cnt, 0)),
                "low_line_count": pa.array(np.where(high, 0, cnt)),
            }
        ).group_by(["l_linestatus"]).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        )
        yield g.rename_columns(
            ["l_linestatus", "high_line_count", "low_line_count"]
        )

    g = j.map_batches(case_pre, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "l_linestatus" not in t.schema.names:
            return
        g2 = t.group_by(["l_linestatus"]).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        )
        yield g2.rename_columns(
            ["l_linestatus", "high_line_count", "low_line_count"]
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


LINESTATUS_PRIORITY_COUNTS_SQL = f"""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN {_Q12_HIGH!r} THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN {_Q12_HIGH!r} THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def part_pair_lift(sf_dir: str, k: int = PART_PAIRS_K) -> pa.Table:
    """Market-basket association rules for the top-k co-purchased part
    pairs: support (co-occurrence count), confidence P(b|a), and lift
    n·c_ab/(c_a·c_b).  Reuses :func:`part_pairs_topk` for the pair
    counts (its O(P·k) merge), adds one (order, part)-deduped per-part
    count pass on the same orderkey co-location, then joins only the
    ≤ 2k needed item counts driver-side (bounded by k, never by the
    catalog).  All counts are exact integers; the two floats are
    single divisions of int64 products written identically in SQL."""
    pairs = part_pairs_topk(sf_dir, k=k).take_all()
    if not pairs:
        return pa.table(
            {
                "pa_key": pa.array([], pa.int64()),
                "pb_key": pa.array([], pa.int64()),
                "pair_count": pa.array([], pa.int64()),
                "confidence": pa.array([], pa.float64()),
                "lift": pa.array([], pa.float64()),
            }
        )
    needed = sorted({r["pa_key"] for r in pairs} | {r["pb_key"] for r in pairs})
    needed_arr = pa.array(needed, pa.int64())

    def dedup_pre(t: pa.Table):
        if len(t) == 0:
            return
        yield t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    co = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(dedup_pre, batch_format="pyarrow")
        .repartition(P, keys=["l_orderkey"])
    )

    def per_part(t: pa.Table):
        """Orders are co-located ⇒ block dedup is global; emit exact
        per-part basket counts filtered to the needed parts (≤ 2k
        rows per block)."""
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return
        d = t.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        d = d.filter(pc.is_in(d.column("l_partkey"), value_set=needed_arr))
        if len(d) == 0:
            return
        g = (
            d.append_column("c", pa.array(np.ones(len(d), np.int64)))
            .group_by(["l_partkey"])
            .aggregate([("c", "sum")])
            .rename_columns(["l_partkey", "c"])
        )
        yield g

    item: dict[int, int] = {}
    for r in co.map_batches(
        per_part, batch_size=None, batch_format="pyarrow"
    ).take_all():
        item[r["l_partkey"]] = item.get(r["l_partkey"], 0) + r["c"]
    n_total = (
        _read(sf_dir, "lineitem", ["l_orderkey"])
        .map_batches(
            _distinct_orders_partial, batch_format="pyarrow"
        )
        .repartition(1)
        .map_batches(_distinct_orders_merge, batch_size=None, batch_format="pyarrow")
        .take_all()[0]["n"]
    )

    out = []
    for r in sorted(pairs, key=lambda r: (-r["pair_count"], r["pa_key"], r["pb_key"])):
        a, b, cab = r["pa_key"], r["pb_key"], r["pair_count"]
        ca, cb = item[a], item[b]
        out.append(
            (
                a, b, cab,
                float(cab) / float(ca),
                float(n_total * cab) / float(ca * cb),
            )
        )
    return pa.table(
        {
            "pa_key": pa.array([o[0] for o in out], pa.int64()),
            "pb_key": pa.array([o[1] for o in out], pa.int64()),
            "pair_count": pa.array([o[2] for o in out], pa.int64()),
            "confidence": pa.array([o[3] for o in out], pa.float64()),
            "lift": pa.array([o[4] for o in out], pa.float64()),
        }
    )


def _distinct_orders_partial(t: pa.Table):
    if len(t) == 0:
        return
    yield t.group_by(["l_orderkey"]).aggregate([])


def _distinct_orders_merge(t: pa.Table):
    if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
        return
    n = len(t.group_by(["l_orderkey"]).aggregate([]))
    yield pa.table({"n": pa.array([n], pa.int64())})


PART_PAIR_LIFT_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem),
ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1),
p AS (
  SELECT a.l_partkey AS pa_key, b.l_partkey AS pb_key,
    CAST(COUNT(*) AS BIGINT) AS pair_count
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 ORDER BY pair_count DESC, pa_key, pb_key LIMIT 20
)
SELECT p.pa_key, p.pb_key, p.pair_count,
  CAST(p.pair_count AS DOUBLE) / CAST(ca.c AS DOUBLE) AS confidence,
  CAST(nn.n * p.pair_count AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE) AS lift
FROM p
JOIN ic ca ON ca.l_partkey = p.pa_key
JOIN ic cb ON cb.l_partkey = p.pb_key, nn
"""


# --------------------------------------------------------------------------
# exponentially-decayed popularity (recency-weighted leaderboard)
# --------------------------------------------------------------------------

DECAY_HALF_DAYS = 180.0  # decay scale: exp(-age_days / 180)
DECAY_TOP_K = 20


def decayed_part_popularity(sf_dir: str, k: int = DECAY_TOP_K) -> ray.data.Dataset:
    """(part, score) — top-k parts by EXPONENTIALLY-DECAYED shipment
    count: each lineitem row contributes floor(1e9·exp(−age/180))
    where age = whole days between its ship time and the corpus max —
    the recency-weighted popularity every freshness-aware ranker uses
    instead of raw counts.

    Exactness: the per-row weight is ONE libm exp call on an integer
    day age (the floor(1e9·f(x)) rule — ages are calendar-bounded,
    and numpy/DuckDB libm agree bit-for-bit on them, verified for all
    2 499 distinct ages at sf0.01); sums are then pure int64, so the
    distributed fold is order-free and the top-k (score desc, part
    asc) is a total order.  Age uses µs integer arithmetic
    ((max_us − ship_us) // 86 400 000 000), restated identically in
    SQL — no reliance on calendar day-boundary semantics.

    Scale shape: one scalar max fold, one scan with per-block
    (part, Σw) partials, ONE keyed re-agg, then the local-topk →
    coalesce → topk cutoff merge (O(P·k) rows, never the part
    table)."""
    base = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate"]).materialize()
    max_us = int(
        pa.scalar(base.max("l_shipdate")).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    )

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        age = (max_us - us) // 86_400_000_000
        w = np.floor(
            1e9 * np.exp(-(age.astype(np.float64) / DECAY_HALF_DAYS))
        ).astype(np.int64)
        g = (
            pa.table({"part": t.column("l_partkey"), "score": pa.array(w)})
            .group_by(["part"])
            .aggregate([("score", "sum")])
        )
        yield g.rename_columns(["part", "score"])

    scored = keyed_reagg(
        base.map_batches(pre, batch_format="pyarrow"),
        ["part"], [("score", "sum")], P,
    )

    def local_topk(t: pa.Table):
        if t.num_rows == 0 or "part" not in t.schema.names:
            return
        s = t.column("score").to_numpy(zero_copy_only=False)
        p = t.column("part").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -s))[:k]
        yield t.take(pa.array(order))

    return (
        scored.map_batches(local_topk, batch_size=None, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topk, batch_size=None, batch_format="pyarrow")
    )


DECAYED_PART_POPULARITY_SQL = f"""
WITH mx AS (SELECT CAST(epoch_us(MAX(l_shipdate)) AS BIGINT) AS m FROM lineitem),
w AS (
  SELECT l_partkey AS part,
    CAST(FLOOR(1e9 * EXP(-(CAST(
      ((SELECT m FROM mx) - CAST(epoch_us(l_shipdate) AS BIGINT))
      // 86400000000 AS DOUBLE) / {DECAY_HALF_DAYS}))) AS BIGINT) AS wt
  FROM lineitem
),
s AS (SELECT part, CAST(SUM(wt) AS BIGINT) AS score FROM w GROUP BY part)
SELECT part, score FROM s ORDER BY score DESC, part LIMIT {DECAY_TOP_K}
"""
