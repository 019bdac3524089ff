"""Decision-support shapes beyond relational.py: left-join count
distributions, HAVING-filtered join funnels, anti-joins, decorrelated
correlated subqueries, per-group mode, running-total windows, and
ROLLUP hierarchies — each with an exact DuckDB oracle.

Exactness follows relational.py's fixed-point strategy (module doc
there): snap 2-decimal monetary factors to int64 on both sides,
aggregate in integers (associative — reduction order can't change the
hash), convert to double once with an identical expression.  Running
totals are EXACT for the same reason: the per-user cumulative sum is
an integer prefix sum, so no float accumulation order exists at all.

Scale notes: every groupby is preceded by a block-local arrow
``group_by`` partial; the anti/semi joins ride :func:`rayrank.joins.
join_auto` (broadcast under the row guard, partitioned hash join
above); rollup subtotals are derived from the already-reduced leaf
table (O(nations·years) rows), never from a second scan.
"""

from __future__ import annotations

import math

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


# --------------------------------------------------------------------------
# order count distribution (TPC-H Q13 shape): left join + zero group
# --------------------------------------------------------------------------


def order_count_distribution(sf_dir: str) -> ray.data.Dataset:
    """Histogram of orders-per-customer INCLUDING the zero bucket (the
    left-join-with-empty-groups shape).  Per-custkey counts pre-combine
    in each block; the zero bucket is total-customers minus matched
    customers — two scalar aggregates, never a row-level outer join."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.select(["o_custkey"])
            .append_column("n", _ones(len(t)))
            .group_by(["o_custkey"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["o_custkey", "n"])

    per_cust = keyed_reagg(
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["o_custkey"], [("n", "sum")], P,
    )

    def to_hist(t: pa.Table):
        if len(t) == 0 or "n" not in t.schema.names:
            return
        g = (
            t.rename_columns(["o_custkey", "c_count"])
            .select(["c_count"])
            .append_column("d", _ones(len(t)))
            .group_by(["c_count"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["c_count", "custdist"])

    hist = per_cust.map_batches(to_hist, batch_format="pyarrow")
    # distributed scalar count of customers (cheap metadata aggregate)
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    g = hist.repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "c_count" not in t.schema.names:
            return
        t = t.group_by(["c_count"]).aggregate([("custdist", "sum")])
        cc = t.column("c_count").to_numpy(zero_copy_only=False)
        cd = t.column("custdist_sum").to_numpy(zero_copy_only=False)
        zero = n_cust - int(cd.sum())
        if zero > 0:
            cc = np.r_[cc, 0]
            cd = np.r_[cd, zero]
        yield pa.table({"c_count": pa.array(cc), "custdist": pa.array(cd)})

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


ORDER_COUNT_DISTRIBUTION_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) GROUP BY c_count
"""


# --------------------------------------------------------------------------
# big orders (TPC-H Q18 shape): HAVING-filtered aggregate re-joined
# --------------------------------------------------------------------------

BIG_ORDER_MIN_QTY = 250


def big_orders(sf_dir: str) -> ray.data.Dataset:
    """Orders whose total lineitem quantity exceeds a threshold, with
    their customer name — the HAVING-on-aggregate → re-join shape.
    The qty sum pre-combines per block; after the HAVING filter the
    surviving order set is small, so both joins stream the big table
    past a broadcast (hash-join fallback above the row guard)."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "q": pa.array(_i64(t.column("l_quantity"))),
            }
        ).group_by(["l_orderkey"]).aggregate([("q", "sum")])
        yield g.rename_columns(["l_orderkey", "q"])

    li = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["l_orderkey"], [("q", "sum")], P,
    )

    def having(t: pa.Table):
        if len(t) == 0 or "q" not in t.schema.names:
            return
        t = t.filter(pc.greater(t.column("q"), BIG_ORDER_MIN_QTY))
        if len(t) == 0:
            return
        yield t

    big = li.map_batches(having, batch_format="pyarrow")

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def o_prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_orderdate_us": pc.cast(t.column("o_orderdate"), pa.int64()),
                "o_totalprice": t.column("o_totalprice"),
            }
        )

    j = join_auto(
        orders.map_batches(o_prep, batch_format="pyarrow"),
        big,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
        num_partitions=P,
    )
    # the surviving big-order set is the SMALL side: broadcast it and
    # STREAM customer past it (materializing customer to broadcast it
    # the other way round would ship the big table at scale)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = join_auto(
        cust, j, on=("c_custkey",), right_on=("o_custkey",), num_partitions=P
    )

    def finish(t: pa.Table):
        if len(t) == 0 or "c_name" not in t.schema.names:
            return
        q = t.column("q").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "c_name": t.column("c_name"),
                "o_custkey": t.column("c_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "o_orderdate_us": t.column("o_orderdate_us"),
                "o_totalprice": t.column("o_totalprice"),
                "sum_qty": pa.array(q.astype(np.float64)),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


BIG_ORDERS_SQL = f"""
WITH l AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
  FROM lineitem GROUP BY l_orderkey HAVING q > {BIG_ORDER_MIN_QTY}
)
SELECT c.c_name, o.o_custkey, o.o_orderkey,
  epoch_us(o.o_orderdate) AS o_orderdate_us, o.o_totalprice,
  CAST(l.q AS DOUBLE) AS sum_qty
FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# --------------------------------------------------------------------------
# inactive customers (TPC-H Q22 shape): anti-join + per-nation aggregate
# --------------------------------------------------------------------------

INACTIVE_SINCE = (1998, 6, 1)  # chosen so the result is nonempty at sf≥0.001


def inactive_customers(sf_dir: str) -> ray.data.Dataset:
    """Per-nation count and account-balance total of customers with NO
    order on/after a cutoff — the anti-join shape.  Active custkeys
    dedup block-locally before their distinct groupby; the anti join
    broadcasts that key set under the guard and hash-partitions above
    it; balances aggregate in exact cents."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def active_pre(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(
            pc.greater_equal(t.column("o_orderdate"), _ts(*INACTIVE_SINCE))
        )
        if len(t) == 0:
            return
        yield t.select(["o_custkey"]).group_by(["o_custkey"]).aggregate([])

    active = keyed_reagg(
        orders.map_batches(active_pre, batch_format="pyarrow"),
        ["o_custkey"], [], P,
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    inactive = join_auto(
        cust, active, on=("c_custkey",), right_on=("o_custkey",),
        how="anti", num_partitions=P,
    )

    def agg(t: pa.Table):
        if len(t) == 0 or "c_nationkey" not in t.schema.names:
            return
        g = pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "bal_c": pa.array(_i64(t.column("c_acctbal"), 100)),
                "n": _ones(len(t)),
            }
        ).group_by(["c_nationkey"]).aggregate([("bal_c", "sum"), ("n", "sum")])
        yield g.rename_columns(["c_nationkey", "bal_c", "n"])

    partials = inactive.map_batches(agg, batch_format="pyarrow")
    g = partials.repartition(1)  # ≤ 25 nations per partial

    def finish(t: pa.Table):
        if t.num_rows == 0 or "c_nationkey" not in t.schema.names:
            return
        t = t.group_by(["c_nationkey"]).aggregate(
            [("bal_c", "sum"), ("n", "sum")]
        )
        bal = t.column("bal_c_sum").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "n_custs": t.column("n_sum"),
                "total_acctbal": pa.array(bal.astype(np.float64) / 100.0),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


INACTIVE_CUSTOMERS_SQL = """
WITH a AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-06-01'
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
  CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0
    AS total_acctbal
FROM customer c LEFT JOIN a ON c.c_custkey = a.o_custkey
WHERE a.o_custkey IS NULL GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# avg yearly (TPC-H Q17 shape): decorrelated correlated subquery
# --------------------------------------------------------------------------

AVG_YEARLY_BRAND = "Brand#13"


def avg_yearly(sf_dir: str) -> ray.data.Dataset:
    """Average yearly revenue lost if small orders (below 20% of the
    part's mean quantity) stopped — the correlated-subquery shape,
    decorrelated into: semi-filter lineitem to the brand's parts →
    per-part (sum qty, count) → re-join the stats → threshold filter →
    one exact fixed-point sum.  The threshold double is computed with
    the identical expression on both sides, so the comparison is
    bit-exact."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def pk(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("p_brand"), AVG_YEARLY_BRAND))
        if len(t) == 0:
            return
        yield t.select(["p_partkey"])

    pkeys = parts.map_batches(pk, batch_format="pyarrow")

    def li_filtered() -> ray.data.Dataset:
        li = _read(
            sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
        )

        def prep(t: pa.Table):
            if len(t) == 0:
                return
            yield pa.table(
                {
                    "l_partkey": t.column("l_partkey"),
                    "q": pa.array(_i64(t.column("l_quantity"))),
                    "price_c": pa.array(_i64(t.column("l_extendedprice"), 100)),
                }
            )

        li = li.map_batches(prep, batch_format="pyarrow")
        return join_auto(
            li, pkeys, on=("l_partkey",), right_on=("p_partkey",),
            how="semi", num_partitions=P,
        )

    def stat_pre(t: pa.Table):
        if len(t) == 0 or "q" not in t.schema.names:
            return
        g = (
            t.select(["l_partkey", "q"])
            .append_column("n", _ones(len(t)))
            .group_by(["l_partkey"])
            .aggregate([("q", "sum"), ("n", "sum")])
        )
        yield g.rename_columns(["l_partkey", "sq", "n"])

    stats = keyed_reagg(
        li_filtered().map_batches(stat_pre, batch_format="pyarrow"),
        ["l_partkey"], [("sq", "sum"), ("n", "sum")], P,
    )
    j = join_auto(li_filtered(), stats, on=("l_partkey",), num_partitions=P)

    def partial(t: pa.Table):
        if len(t) == 0 or "sq" not in t.schema.names:
            return
        q = t.column("q").to_numpy(zero_copy_only=False).astype(np.float64)
        sq = t.column("sq").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False)
        thr = 0.2 * (sq / n)
        keep = q < thr
        price = t.column("price_c").to_numpy(zero_copy_only=False)
        yield pa.table({"tot_c": pa.array([int(price[keep].sum())])})

    partials = j.map_batches(partial, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        tot = 0
        if t.num_rows and "tot_c" in t.schema.names:
            tot = int(
                t.column("tot_c").to_numpy(zero_copy_only=False).sum()
            )
        yield pa.table(
            {"avg_yearly": pa.array([float(tot) / 100.0 / 7.0], pa.float64())}
        )

    return partials.map_batches(
        finish, batch_size=None, batch_format="pyarrow"
    )


AVG_YEARLY_SQL = f"""
WITH l AS (
  SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS q,
    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c
  FROM lineitem
  WHERE l_partkey IN
    (SELECT p_partkey FROM part WHERE p_brand = '{AVG_YEARLY_BRAND}')
),
s AS (SELECT l_partkey, SUM(q) AS sq, COUNT(*) AS n FROM l GROUP BY l_partkey)
SELECT CAST(COALESCE(SUM(l.price_c), 0) AS DOUBLE)/100.0/7.0 AS avg_yearly
FROM l JOIN s ON l.l_partkey = s.l_partkey
WHERE CAST(l.q AS DOUBLE) < 0.2*(CAST(s.sq AS DOUBLE)/s.n)
"""


# --------------------------------------------------------------------------
# per-group mode (most frequent value, deterministic tie-break)
# --------------------------------------------------------------------------


def mode_event_type(sf_dir: str) -> ray.data.Dataset:
    """Each user's most frequent event type (ties → lexicographically
    smallest type) — the grouped-mode shape.  (user, type) counts
    pre-combine per block; the argmax kernel factorizes types to ints
    and runs one lexsort + group-start take, no per-group loop."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.append_column("n", _ones(len(t)))
            .group_by(["user_id", "event_type"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["user_id", "event_type", "n"])

    # ONE repartition by user co-locates all of a user's (type, n)
    # partials; the argmax block re-aggregates them in arrow first —
    # no Dataset.groupby aggregator anywhere (measured ~4× faster at
    # 1M events; see shuffle.keyed_reagg)
    pairs = _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
        pre, batch_format="pyarrow"
    )
    co = pairs.repartition(P, keys=["user_id"])

    def argmax(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        t = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        t = t.rename_columns(["user_id", "event_type", "n"])
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        n = t.column("n").to_numpy(zero_copy_only=False)
        vocab, ty_id = np.unique(ty, return_inverse=True)
        order = np.lexsort((ty_id, -n, u))
        u, ty_id, n = u[order], ty_id[order], n[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        yield pa.table(
            {
                "user_id": pa.array(u[starts]),
                "event_type": pa.array(vocab[ty_id[starts]].tolist(), pa.string()),
                "n_events": pa.array(n[starts]),
            }
        )

    return co.map_batches(argmax, batch_size=None, batch_format="pyarrow")


MODE_EVENT_TYPE_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY n_events DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type, n_events FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# running totals (cumulative window, exact integer prefix sums)
# --------------------------------------------------------------------------


def user_running_totals(sf_dir: str) -> ray.data.Dataset:
    """Per-event running count and running value sum per user, ordered
    by (ts, event_id) — the ROWS UNBOUNDED PRECEDING window shape.
    One keyed repartition co-locates each user; the kernel is a single
    lexsort + integer prefix sum with group-base subtraction (cent
    snap makes the cumulative sum exact — no float accumulation
    exists)."""
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

    def running(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        vc = t.column("val_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, us, u))
        u, e, us, vc = u[order], e[order], us[order], vc[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        idx = np.arange(len(u))
        run_n = idx - np.repeat(starts, sizes) + 1
        cs = np.cumsum(vc)
        base = np.r_[np.int64(0), cs[starts[1:] - 1]] if len(starts) else cs[:0]
        run_v = cs - np.repeat(base, sizes)
        yield pa.table(
            {
                "event_id": pa.array(e),
                "user_id": pa.array(u),
                "us": pa.array(us),
                "run_n": pa.array(run_n.astype(np.int64)),
                "run_value": pa.array(run_v.astype(np.float64) / 100.0),
            }
        )

    return co.map_batches(running, batch_size=None, batch_format="pyarrow")


USER_RUNNING_TOTALS_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS us,
  CAST(COUNT(*) OVER w AS BIGINT) AS run_n,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS DOUBLE)/100.0
    AS run_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS UNBOUNDED PRECEDING)
"""


# --------------------------------------------------------------------------
# cumulative distinct event types per user (running COUNT(DISTINCT))
# --------------------------------------------------------------------------


def user_cumulative_distinct(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, us, cum_types) — at every event, how many
    DISTINCT event types the user has produced so far (running
    count-distinct; SQL can't window COUNT(DISTINCT) directly, so both
    sides restate it as the prefix sum of first-occurrence flags over
    the (ts, event_id) order).  ONE user-keyed repartition co-locates
    each user; the kernel is two lexsorts + an integer prefix sum —
    first-occurrence flags come from the (user, type, time) order,
    the running sum from the (user, time) order."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        )

    co = ev.map_batches(prep, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def kernel(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        _, tc = np.unique(
            np.asarray(t.column("event_type").to_pylist(), dtype=object),
            return_inverse=True,
        )
        o1 = np.lexsort((e, us, tc, u))
        gu, gt = u[o1], tc[o1]
        first_sorted = np.r_[True, (gu[1:] != gu[:-1]) | (gt[1:] != gt[:-1])]
        flag = np.empty(len(u), np.int64)
        flag[o1] = first_sorted.astype(np.int64)
        o2 = np.lexsort((e, us, u))
        u2, e2, us2, f2 = u[o2], e[o2], us[o2], flag[o2]
        starts = np.flatnonzero(np.r_[True, u2[1:] != u2[:-1]])
        sizes = np.diff(np.r_[starts, len(u2)])
        cs = np.cumsum(f2)
        base = np.r_[np.int64(0), cs[starts[1:] - 1]] if len(starts) else cs[:0]
        cum = cs - np.repeat(base, sizes)
        yield pa.table(
            {
                "event_id": pa.array(e2),
                "user_id": pa.array(u2),
                "us": pa.array(us2),
                "cum_types": pa.array(cum.astype(np.int64)),
            }
        )

    return co.map_batches(kernel, batch_size=None, batch_format="pyarrow")


USER_CUMULATIVE_DISTINCT_SQL = """
WITH f AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
)
SELECT event_id, user_id, us,
  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
    PARTITION BY user_id ORDER BY us, event_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
FROM f
"""


# --------------------------------------------------------------------------
# event-type trigrams: per-user sequential pattern counts
# --------------------------------------------------------------------------


def event_type_trigrams(sf_dir: str) -> ray.data.Dataset:
    """(t0, t1, t2, n) — global counts of consecutive event-type
    triples within each user's (ts, event_id)-ordered stream (sequence
    mining's frequent-trigram primitive; the event-stream sibling of
    terms.top_bigrams).  ONE user-keyed repartition; the kernel sorts
    each block once, masks user boundaries by shift-compare, and
    pre-combines counts block-locally; the final reduce is a keyed
    re-agg over the type³-bounded triple table."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        )

    co = ev.map_batches(prep, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def triples(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, us, u))
        u = u[order]
        ty = t.column("event_type").take(pa.array(order))
        if len(u) < 3:
            return
        m = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not m.any():
            return
        mk = pa.array(m)
        n = len(u)
        g = (
            pa.table(
                {
                    "t0": ty.slice(0, n - 2).filter(mk),
                    "t1": ty.slice(1, n - 2).filter(mk),
                    "t2": ty.slice(2, n - 2).filter(mk),
                }
            )
            .append_column("n", pa.array(np.ones(int(m.sum()), np.int64)))
            .group_by(["t0", "t1", "t2"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["t0", "t1", "t2", "n"])

    return keyed_reagg(
        co.map_batches(triples, batch_size=None, batch_format="pyarrow"),
        ["t0", "t1", "t2"], [("n", "sum")], 4,
    )


EVENT_TYPE_TRIGRAMS_SQL = """
WITH s AS (
  SELECT user_id, event_type AS t0,
    LEAD(event_type, 1) OVER w AS t1,
    LEAD(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT t0, t1, t2, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE t2 IS NOT NULL GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# time-weighted average value per user (step-function integral)
# --------------------------------------------------------------------------


def user_time_weighted_value(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, twa) — the time-weighted mean of `value`
    per user: each event's value holds until the next event, so the
    mean is ∫value dt / (t_last − t_first) = Σ vc·Δus / (span·100) —
    the step-function integral every metering/billing pipeline needs.
    The per-term product cents×µs approaches int64 range and the sum
    exceeds it, so the fold runs in Python ints inside each user's
    co-located group (HUGEINT in SQL); ONE double division at the
    end.  Tie order is pinned to (ts, event_id) on both sides —
    zero-gap terms make tie order among equal timestamps matter.
    Single-event users (zero span) are excluded."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
                "vc": pa.array(_i64(t.column("value"), 100)),
            }
        )

    co = ev.map_batches(prep, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def kernel(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        vc = t.column("vc").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, us, u))
        u, us, vc = u[order], us[order], vc[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        out_u, out_n, out_t = [], [], []
        for s, en in zip(starts, ends):
            n = en - s
            if n < 2 or us[en - 1] == us[s]:
                continue
            num = sum(
                int(vc[i]) * (int(us[i + 1]) - int(us[i]))
                for i in range(s, en - 1)
            )
            den = (int(us[en - 1]) - int(us[s])) * 100
            out_u.append(int(u[s]))
            out_n.append(int(n))
            out_t.append(float(num) / float(den))
        if not out_u:
            return
        yield pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "n_events": pa.array(out_n, pa.int64()),
                "twa": pa.array(out_t, pa.float64()),
            }
        )

    return co.map_batches(kernel, batch_size=None, batch_format="pyarrow")


USER_TIME_WEIGHTED_VALUE_SQL = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS us,
    CAST(ROUND(value*100) AS BIGINT) AS vc,
    LEAD(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nus
  FROM events
),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
    SUM(CASE WHEN nus IS NULL THEN 0
        ELSE CAST(vc AS HUGEINT) * (nus - us) END) AS num,
    MAX(us) - MIN(us) AS den
  FROM s GROUP BY user_id
)
SELECT user_id, n_events,
  CAST(num AS DOUBLE) / CAST(den * 100 AS DOUBLE) AS twa
FROM agg WHERE den > 0
"""


# --------------------------------------------------------------------------
# grouped exact quantiles (per-group quantile_disc)
# --------------------------------------------------------------------------

GROUPED_QS = (0.25, 0.5, 0.75)  # binary-exact


def event_value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type exact p25/median/p75 of `value` — the grouped-
    quantile shape.  (type, value) count partials collapse per block,
    the keyed groupby is bounded by per-type cardinality, and ONE
    keyed repartition co-locates each type's whole value histogram so
    the rank pick (max(1, ceil(q·N)), the verified quantile_disc rule)
    is a block-local sort+cumsum — the driver never sees values."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.select(["event_type", "value"])
            .append_column("cnt", _ones(len(t)))
            .group_by(["event_type", "value"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["event_type", "value", "cnt"])

    vc = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        pre, batch_format="pyarrow"
    )
    co = vc.repartition(P, keys=["event_type"])

    def pick(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        # re-aggregate the per-block value-count partials in arrow
        # (all partials of one type co-reside after the repartition)
        t = t.group_by(["event_type", "value"]).aggregate([("cnt", "sum")])
        t = t.rename_columns(["event_type", "value", "cnt"])
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ty))
        ty, v, c = ty[order], v[order], c[order]
        starts = np.flatnonzero(np.r_[True, ty[1:] != ty[:-1]])
        ends = np.r_[starts[1:], len(ty)]
        cols = {"event_type": pa.array(ty[starts].tolist(), pa.string())}
        cum = np.cumsum(c)
        base = np.r_[np.int64(0), cum[starts[1:] - 1]]
        totals = cum[ends - 1] - base
        for q, nm in zip(GROUPED_QS, ("p25", "median", "p75")):
            # ceil(q·N) exact: q binary, N < 2^53
            ranks = np.maximum(1, np.ceil(q * totals).astype(np.int64))
            idx = np.searchsorted(cum, base + ranks, side="left")
            cols[nm] = pa.array(v[idx], pa.float64())
        yield pa.table(cols)

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_QUANTILES_SQL = """
SELECT event_type,
  quantile_disc(value, 0.25) AS p25,
  quantile_disc(value, 0.5) AS median,
  quantile_disc(value, 0.75) AS p75
FROM events GROUP BY event_type
"""


def event_value_mad(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type median absolute deviation — the robust-spread
    two-level quantile (median of |value − median|).  Rides the SAME
    co-located value-count histogram as event_value_quantiles: the
    median is a rank pick, |v − med| is one vectorized float op over
    the histogram keys (identical float64 subtraction on the SQL side,
    so deviations are bit-equal), and the MAD is a second rank pick —
    the raw rows are never re-scanned and the driver never sees
    values."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.select(["event_type", "value"])
            .append_column("cnt", _ones(len(t)))
            .group_by(["event_type", "value"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["event_type", "value", "cnt"])

    vc = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        pre, batch_format="pyarrow"
    )
    co = vc.repartition(P, keys=["event_type"])

    def pick(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type", "value"]).aggregate([("cnt", "sum")])
        t = t.rename_columns(["event_type", "value", "cnt"])
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ty))
        ty, v, c = ty[order], v[order], c[order]
        starts = np.flatnonzero(np.r_[True, ty[1:] != ty[:-1]])
        ends = np.r_[starts[1:], len(ty)]
        names, meds, mads, ns = [], [], [], []
        for s, e in zip(starts, ends):
            vv, cc = v[s:e], c[s:e]
            cum = np.cumsum(cc)
            n = int(cum[-1])
            # quantile_disc rank rule (verified): max(1, ceil(q·N))
            med = float(vv[np.searchsorted(cum, max(1, -(-n // 2)))])
            d = np.abs(vv - med)  # same float64 op as SQL's ABS(value-med)
            o2 = np.argsort(d, kind="stable")
            d, c2 = d[o2], cc[o2]
            cum2 = np.cumsum(c2)
            mad = float(d[np.searchsorted(cum2, max(1, -(-n // 2)))])
            names.append(ty[s])
            meds.append(med)
            mads.append(mad)
            ns.append(n)
        yield pa.table(
            {
                "event_type": pa.array(names, pa.string()),
                "n_events": pa.array(ns, pa.int64()),
                "median": pa.array(meds, pa.float64()),
                "mad": pa.array(mads, pa.float64()),
            }
        )

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_type, m.n AS n_events, m.med AS median,
  quantile_disc(ABS(e.value - m.med), 0.5) AS mad
FROM events e JOIN med m ON e.event_type = m.event_type
GROUP BY e.event_type, m.med, m.n
"""


# --------------------------------------------------------------------------
# retention cohorts (first-activity month × months-since matrix)
# --------------------------------------------------------------------------


DAY_US = 86_400_000_000


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix: users grouped by first-activity DAY,
    counted in each later day they were active (daily because the
    testdata spans one month).  Days are integer epoch day codes;
    distinct (user, day) pairs dedup per block, then ONE repartition by
    user makes the cohort (min day) and every (cohort, k) pair
    block-local — no second shuffle, no join; the final matrix
    coalesces O(days²) partials."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def mcodes(t: pa.Table):
        if len(t) == 0:
            return
        us = pc.cast(t.column("ts"), pa.int64())
        code = pc.divide(us, DAY_US)  # nonnegative ⇒ trunc == floor
        yield pa.table({"user_id": t.column("user_id"), "mcode": code})

    em = ev.map_batches(mcodes, batch_format="pyarrow")

    def pre_dedup(t: pa.Table):
        if len(t) == 0:
            return
        yield t.group_by(["user_id", "mcode"]).aggregate([])

    # ONE repartition by user: a block then holds ALL of a user's
    # distinct activity days, so the cohort (min day) AND the (cohort,
    # k) pairs are block-local — no second groupby, no join at all
    co = em.map_batches(pre_dedup, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def agg(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        t = t.group_by(["user_id", "mcode"]).aggregate([])  # cross-block dedup
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        mc = t.column("mcode").to_numpy(zero_copy_only=False)
        order = np.lexsort((mc, u))
        u, mc = u[order], mc[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        cohort = np.repeat(mc[starts], sizes)  # per-user min = first sorted
        g = (
            pa.table({"cohort": pa.array(cohort), "k": pa.array(mc - cohort)})
            .append_column("n", _ones(len(u)))
            .group_by(["cohort", "k"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["cohort", "k", "n_users"])

    partials = co.map_batches(agg, batch_size=None, batch_format="pyarrow")
    g = partials.repartition(1)  # O(months²) rows per partial

    def finish(t: pa.Table):
        if t.num_rows == 0 or "cohort" not in t.schema.names:
            return
        out = t.group_by(["cohort", "k"]).aggregate([("n_users", "sum")])
        yield out.rename_columns(["cohort", "k", "n_users"])

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


RETENTION_COHORTS_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS mcode
  FROM events
),
c AS (SELECT user_id, MIN(mcode) AS cohort FROM e GROUP BY user_id),
a AS (SELECT DISTINCT user_id, mcode FROM e)
SELECT c.cohort, a.mcode - c.cohort AS k,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN c ON a.user_id = c.user_id GROUP BY c.cohort, k
"""


# --------------------------------------------------------------------------
# rollup (hierarchical subtotals from the reduced leaf table)
# --------------------------------------------------------------------------


def _nation_year_leaf(sf_dir: str):
    """Shared leaf for ROLLUP/CUBE: a 1-partition Dataset of
    (c_nationkey, o_year, price_c, n) partials plus the nationkey→name
    lookup.  The leaf aggregate is the only wide step; both hierarchies
    re-aggregate the O(nations·years) leaf rows in one block."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def o_prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
                "price_c": pa.array(_i64(t.column("o_totalprice"), 100)),
            }
        )

    o = orders.map_batches(o_prep, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = join_auto(
        o, cust, on=("o_custkey",), right_on=("c_custkey",), num_partitions=P
    )

    def pre(t: pa.Table):
        if len(t) == 0 or "c_nationkey" not in t.schema.names:
            return
        g = (
            t.select(["c_nationkey", "o_year", "price_c"])
            .append_column("n", _ones(len(t)))
            .group_by(["c_nationkey", "o_year"])
            .aggregate([("price_c", "sum"), ("n", "sum")])
        )
        yield g.rename_columns(["c_nationkey", "o_year", "price_c", "n"])

    # leaf partials are ≤ nations·years rows per block — coalesce +
    # in-block re-agg beats a keyed shuffle (pricing_summary pattern)
    leaf = j.map_batches(pre, batch_format="pyarrow")

    import os

    import pyarrow.parquet as pq

    nt = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(nt.column("n_nationkey").to_pylist(), nt.column("n_name").to_pylist())
    )

    return leaf.repartition(1), names  # O(nations·years) rows


def nation_year_rollup(sf_dir: str) -> ray.data.Dataset:
    """Order revenue by (nation, year) with per-nation subtotals and a
    grand total — GROUP BY ROLLUP.  Sentinels ('ALL', -1) stand in for
    ROLLUP's NULLs so the hash compare is type-stable."""
    g, names = _nation_year_leaf(sf_dir)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "c_nationkey" not in t.schema.names:
            return
        t = t.group_by(["c_nationkey", "o_year"]).aggregate(
            [("price_c", "sum"), ("n", "sum")]
        )
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        yr = t.column("o_year").to_numpy(zero_copy_only=False)
        pcs = t.column("price_c_sum").to_numpy(zero_copy_only=False)
        ns = t.column("n_sum").to_numpy(zero_copy_only=False)
        nm = np.asarray([names[int(k)] for k in nk], dtype=object)
        # per-nation subtotals
        un, inv = np.unique(nm, return_inverse=True)
        sub_p = np.zeros(len(un), np.int64)
        sub_n = np.zeros(len(un), np.int64)
        np.add.at(sub_p, inv, pcs)
        np.add.at(sub_n, inv, ns)
        out_nm = np.r_[nm, un, np.asarray(["ALL"], dtype=object)]
        out_yr = np.r_[yr, np.full(len(un), -1, np.int64), [-1]]
        out_p = np.r_[pcs, sub_p, [int(pcs.sum())]]
        out_n = np.r_[ns, sub_n, [int(ns.sum())]]
        yield pa.table(
            {
                "n_name": pa.array(out_nm.tolist(), pa.string()),
                "o_year": pa.array(out_yr),
                "revenue": pa.array(out_p.astype(np.float64) / 100.0),
                "n_orders": pa.array(out_n),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


def nation_year_cube(sf_dir: str) -> ray.data.Dataset:
    """Order revenue by (nation, year) with BOTH marginals and a grand
    total — GROUP BY CUBE.  Same reduced-leaf strategy as the rollup
    (one wide leaf aggregate, all four grouping sets derived from the
    O(nations·years) rows in one block); integer sums ⇒ every grouping
    set is order-independent and hash-exact."""
    g, names = _nation_year_leaf(sf_dir)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "c_nationkey" not in t.schema.names:
            return
        t = t.group_by(["c_nationkey", "o_year"]).aggregate(
            [("price_c", "sum"), ("n", "sum")]
        )
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        yr = t.column("o_year").to_numpy(zero_copy_only=False)
        pcs = t.column("price_c_sum").to_numpy(zero_copy_only=False)
        ns = t.column("n_sum").to_numpy(zero_copy_only=False)
        nm = np.asarray([names[int(k)] for k in nk], dtype=object)
        un, inv = np.unique(nm, return_inverse=True)
        nat_p = np.zeros(len(un), np.int64)
        nat_n = np.zeros(len(un), np.int64)
        np.add.at(nat_p, inv, pcs)
        np.add.at(nat_n, inv, ns)
        uy, invy = np.unique(yr, return_inverse=True)
        yr_p = np.zeros(len(uy), np.int64)
        yr_n = np.zeros(len(uy), np.int64)
        np.add.at(yr_p, invy, pcs)
        np.add.at(yr_n, invy, ns)
        out_nm = np.r_[
            nm, un, np.full(len(uy), "ALL", dtype=object),
            np.asarray(["ALL"], dtype=object),
        ]
        out_yr = np.r_[yr, np.full(len(un), -1, np.int64), uy, [-1]]
        out_p = np.r_[pcs, nat_p, yr_p, [int(pcs.sum())]]
        out_n = np.r_[ns, nat_n, yr_n, [int(ns.sum())]]
        yield pa.table(
            {
                "n_name": pa.array(out_nm.tolist(), pa.string()),
                "o_year": pa.array(out_yr),
                "revenue": pa.array(out_p.astype(np.float64) / 100.0),
                "n_orders": pa.array(out_n),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


NATION_YEAR_CUBE_SQL = """
WITH b AS (
  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS price_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT COALESCE(n_name, 'ALL') AS n_name, COALESCE(o_year, -1) AS o_year,
  CAST(SUM(price_c) AS DOUBLE)/100.0 AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY CUBE(n_name, o_year)
"""


# --------------------------------------------------------------------------
# set operations (INTERSECT / EXCEPT via one flagged groupby)
# --------------------------------------------------------------------------

SETOP_YEAR_A, SETOP_YEAR_B = 1996, 1997


def _partkey_year_flags(sf_dir: str) -> ray.data.Dataset:
    """(l_partkey, max(in_a), max(in_b)) membership flags for parts
    shipped in year A / year B — ONE scan + one keyed groupby serves
    both the INTERSECT and the EXCEPT query (flags pre-maxed per
    block, so the shuffle moves ≤ distinct-keys-per-block rows)."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate"])

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        y = pc.year(t.column("l_shipdate"))
        m = pc.or_(pc.equal(y, SETOP_YEAR_A), pc.equal(y, SETOP_YEAR_B))
        t, y = t.filter(m), y.filter(m)
        if len(t) == 0:
            return
        g = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "in_a": pc.cast(pc.equal(y, SETOP_YEAR_A), pa.int64()),
                "in_b": pc.cast(pc.equal(y, SETOP_YEAR_B), pa.int64()),
            }
        ).group_by(["l_partkey"]).aggregate([("in_a", "max"), ("in_b", "max")])
        yield g.rename_columns(["l_partkey", "in_a", "in_b"])

    return keyed_reagg(
        li.map_batches(pre, batch_format="pyarrow"),
        ["l_partkey"], [("in_a", "max"), ("in_b", "max")], P,
    )


def _setop(sf_dir: str, want_b: int) -> ray.data.Dataset:
    flags = _partkey_year_flags(sf_dir)

    def pick(t: pa.Table):
        if len(t) == 0 or "in_a" not in t.schema.names:
            return
        a = t.column("in_a")
        b = t.column("in_b")
        keep = pc.and_(pc.equal(a, 1), pc.equal(b, want_b))
        out = t.filter(keep).select(["l_partkey"])
        if len(out):
            yield out

    return flags.map_batches(pick, batch_format="pyarrow")


def parts_in_both_years(sf_dir: str) -> ray.data.Dataset:
    """Partkeys shipped in BOTH years — the INTERSECT shape."""
    return _setop(sf_dir, want_b=1)


def parts_churned(sf_dir: str) -> ray.data.Dataset:
    """Partkeys shipped in year A but NOT year B — the EXCEPT shape."""
    return _setop(sf_dir, want_b=0)


PARTS_IN_BOTH_YEARS_SQL = f"""
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = {SETOP_YEAR_A}
INTERSECT
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = {SETOP_YEAR_B}
"""

PARTS_CHURNED_SQL = f"""
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = {SETOP_YEAR_A}
EXCEPT
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = {SETOP_YEAR_B}
"""


def part_qty_snapshot_diff(sf_dir: str) -> ray.data.Dataset:
    """(l_partkey, qty_a, qty_b, change) — CDC-style snapshot diff of
    per-part shipped quantity between the two snapshot years: every
    part is classified added / removed / changed / unchanged, the
    upsert-feed shape a warehouse sync emits.  Zero joins: both
    snapshots fold in ONE pass as year-masked integer sums (quantity
    ≥ 1 in the data, so a 0 sum IS absence), one keyed re-agg, then a
    block-local classification."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        y = pc.year(t.column("l_shipdate"))
        m = pc.or_(pc.equal(y, SETOP_YEAR_A), pc.equal(y, SETOP_YEAR_B))
        t2, y2 = t.filter(m), y.filter(m)
        if len(t2) == 0:
            return
        qty = _i64(t2.column("l_quantity"))
        in_a = pc.equal(y2, SETOP_YEAR_A).to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "l_partkey": t2.column("l_partkey"),
                "qty_a": pa.array(np.where(in_a, qty, 0)),
                "qty_b": pa.array(np.where(in_a, 0, qty)),
            }
        ).group_by(["l_partkey"]).aggregate([("qty_a", "sum"), ("qty_b", "sum")])
        yield g.rename_columns(["l_partkey", "qty_a", "qty_b"])

    red = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_quantity"])
        .map_batches(pre, batch_format="pyarrow"),
        ["l_partkey"], [("qty_a", "sum"), ("qty_b", "sum")], P,
    )

    def classify(t: pa.Table):
        if t.num_rows == 0 or "qty_a" not in t.schema.names:
            return
        qa = t.column("qty_a").to_numpy(zero_copy_only=False)
        qb = t.column("qty_b").to_numpy(zero_copy_only=False)
        lab = np.where(
            qa == 0, "added",
            np.where(qb == 0, "removed",
                     np.where(qa != qb, "changed", "unchanged")),
        )
        yield t.append_column("change", pa.array(lab.astype(object), pa.string()))

    return red.map_batches(classify, batch_format="pyarrow")


PART_QTY_SNAPSHOT_DIFF_SQL = f"""
WITH f AS (
  SELECT l_partkey,
    CAST(SUM(CASE WHEN year(l_shipdate) = {SETOP_YEAR_A}
      THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_a,
    CAST(SUM(CASE WHEN year(l_shipdate) = {SETOP_YEAR_B}
      THEN CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_b
  FROM lineitem
  WHERE year(l_shipdate) IN ({SETOP_YEAR_A}, {SETOP_YEAR_B})
  GROUP BY l_partkey
)
SELECT l_partkey, qty_a, qty_b,
  CASE WHEN qty_a = 0 THEN 'added' WHEN qty_b = 0 THEN 'removed'
       WHEN qty_a <> qty_b THEN 'changed' ELSE 'unchanged' END AS change
FROM f
"""


# --------------------------------------------------------------------------
# exact per-group variance (integer moments formula)
# --------------------------------------------------------------------------


def event_value_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type count, mean, and population variance of `value`,
    EXACT against SQL: both sides accumulate the first two moments as
    integers (cents, cents²) and apply the identical textbook formula
    var = (n·Σx² − (Σx)²)/n² once in doubles.  Headroom: cents ≤ 5e4 ⇒
    cents² ≤ 2.5e9 ⇒ the int64 Σx² partial is safe to ~3.7e9 rows per
    group; the cross terms use arbitrary-precision Python ints on the
    ≤|groups| reduced rows (HUGEINT in SQL)."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        vc = _i64(t.column("value"), 100)
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "s": pa.array(vc),
                "ssq": pa.array(vc * vc),
                "n": _ones(len(t)),
            }
        ).group_by(["event_type"]).aggregate(
            [("s", "sum"), ("ssq", "sum"), ("n", "sum")]
        )
        yield g.rename_columns(["event_type", "s", "ssq", "n"])

    partials = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        pre, batch_format="pyarrow"
    )
    g = partials.repartition(1)  # ≤ |event types| rows per partial

    def finish(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type"]).aggregate(
            [("s", "sum"), ("ssq", "sum"), ("n", "sum")]
        )
        means, variances = [], []
        for s, ssq, n in zip(
            t.column("s_sum").to_pylist(),
            t.column("ssq_sum").to_pylist(),
            t.column("n_sum").to_pylist(),
        ):
            means.append(float(s) / 100.0 / n)
            variances.append(
                float(n * ssq - s * s) / (float(n) * n) / 10000.0
            )
        yield pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": t.column("n_sum"),
                "mean_value": pa.array(means, pa.float64()),
                "var_value": pa.array(variances, pa.float64()),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_STATS_SQL = """
WITH b AS (
  SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events
),
a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(vc) AS s, SUM(CAST(vc AS HUGEINT)*vc) AS ssq
  FROM b GROUP BY event_type
)
SELECT event_type, n AS n_events,
  CAST(s AS DOUBLE)/100.0/n AS mean_value,
  CAST(CAST(n AS HUGEINT)*ssq - CAST(s AS HUGEINT)*s AS DOUBLE)
    /(CAST(n AS DOUBLE)*n)/10000.0 AS var_value
FROM a
"""


# --------------------------------------------------------------------------
# stratified sampling (deterministic per-stratum hash thresholds)
# --------------------------------------------------------------------------

STRATIFIED_TARGET = 120


def stratified_event_sample(
    sf_dir: str, target: int = STRATIFIED_TARGET
) -> ray.data.Dataset:
    """~``target`` events per event type via deterministic splitmix64
    thresholds f_t = min(1, target/count_t) — the stratified-sampling
    shape.  Pass 1 is a tiny per-type count (block partials, ≤|types|
    rows to the driver); pass 2 is the same stateless hash filter as
    ``hash_sample``, with the per-type threshold looked up vectorized.
    Reproducible and joinable like every hash-based sample here."""
    from .sketch import splitmix64

    def cnt_pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.select(["event_type"])
            .append_column("n", _ones(len(t)))
            .group_by(["event_type"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["event_type", "n"])

    # ≤ |types| partial rows per block: fold the partials driver-side
    # (bounded by types·blocks) instead of spinning up a keyed shuffle
    counts: dict = {}
    for r in (
        _read(sf_dir, "events", ["event_type"])
        .map_batches(cnt_pre, batch_format="pyarrow")
        .take_all()
    ):
        counts[r["event_type"]] = counts.get(r["event_type"], 0) + r["n"]
    vocab = np.asarray(sorted(counts), dtype=object)
    keep_all = np.zeros(len(vocab), bool)
    thr = np.zeros(len(vocab), np.uint64)
    for i, ty in enumerate(vocab):
        f = min(1.0, float(target) / counts[ty])
        if f >= 1.0:
            keep_all[i] = True
        else:
            thr[i] = np.uint64(int(f * float(1 << 64)))

    def fn(t: pa.Table):
        if len(t) == 0:
            return
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        idx = np.searchsorted(vocab, ty)
        idx = np.clip(idx, 0, len(vocab) - 1)
        h = splitmix64(
            t.column("event_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        keep = (vocab[idx] == ty) & (keep_all[idx] | (h < thr[idx]))
        out = t.filter(pa.array(keep))
        if len(out):
            yield out

    return _read(sf_dir, "events", ["event_id", "event_type"]).map_batches(
        fn, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# full outer join (daily click/purchase matrix with empty sides kept)
# --------------------------------------------------------------------------


def _daily_type_counts(sf_dir: str, etype: str, out_col: str) -> ray.data.Dataset:
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        t = t.filter(pc.equal(t.column("event_type"), etype))
        if len(t) == 0:
            return
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()), DAY_US)
        g = (
            pa.table(
                {"user_id": t.column("user_id"), "day": day, out_col: _ones(len(t))}
            )
            .group_by(["user_id", "day"])
            .aggregate([(out_col, "sum")])
        )
        yield g.rename_columns(["user_id", "day", out_col])

    return keyed_reagg(
        ev.map_batches(pre, batch_format="pyarrow"),
        ["user_id", "day"], [(out_col, "sum")], P,
    )


def daily_click_purchase_matrix(sf_dir: str) -> ray.data.Dataset:
    """Per (user, day): click count and purchase count, keeping days
    where only one side is present — the FULL OUTER join shape (keys
    coalesce, absent side filled with 0).  Both inputs are already
    reduced to per-key counts before the join, so the outer join moves
    O(active user-days), never raw events."""
    from .joins import hash_join

    c = _daily_type_counts(sf_dir, "click", "n_clicks")
    p = _daily_type_counts(sf_dir, "purchase", "n_purchases")
    j = hash_join(
        c, p, on=("user_id", "day"), how="full_outer", num_partitions=P
    )

    def finish(t: pa.Table):
        if len(t) == 0 or "n_clicks" not in t.schema.names:
            return
        zero = pa.scalar(0, pa.int64())
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "day": t.column("day"),
                "n_clicks": pc.coalesce(t.column("n_clicks"), zero),
                "n_purchases": pc.coalesce(t.column("n_purchases"), zero),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


DAILY_CLICK_PURCHASE_MATRIX_SQL = """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY user_id, day
),
p AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, day
)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
  COALESCE(c.day, p.day) AS day,
  COALESCE(c.n_clicks, 0) AS n_clicks,
  COALESCE(p.n_purchases, 0) AS n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id AND c.day = p.day
"""


# --------------------------------------------------------------------------
# weighted sampling (probability ∝ value, pure-integer thresholds)
# --------------------------------------------------------------------------

WEIGHTED_VMAX_C = 50_000  # cents ceiling: value ≤ 490.02 < 500.00
WEIGHTED_T = (1 << 64) // WEIGHTED_VMAX_C  # per-cent hash quantum


def weighted_event_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic weighted Bernoulli sample: keep an event with
    probability value/500 by comparing splitmix64(event_id) against
    value_cents · ⌊2^64/50000⌋ — ALL integer arithmetic (max product
    1.81e19 < 2^64), so engine and SQL replay are bit-identical with
    no float thresholds at all.  Stateless per-batch filter, no
    shuffle; reproducible and joinable like hash_sample."""
    from .sketch import splitmix64

    tq = np.uint64(WEIGHTED_T)

    def fn(t: pa.Table):
        if len(t) == 0:
            return
        h = splitmix64(
            t.column("event_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        vc = _i64(t.column("value"), 100).astype(np.uint64)
        out = t.filter(pa.array(h < vc * tq))
        if len(out):
            yield out

    return _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        fn, batch_format="pyarrow"
    )


NATION_YEAR_ROLLUP_SQL = """
WITH b AS (
  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS price_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT COALESCE(n_name, 'ALL') AS n_name, COALESCE(o_year, -1) AS o_year,
  CAST(SUM(price_c) AS DOUBLE)/100.0 AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY ROLLUP(n_name, o_year)
"""


# --------------------------------------------------------------------------
# argmax-by (last event per user), Pareto skyline, NTILE buckets
# --------------------------------------------------------------------------


def user_last_event(sf_dir: str) -> ray.data.Dataset:
    """Each user's LAST event (max (ts, event_id), fully deterministic)
    — the argmax-by / LAST_VALUE shape.  Two-phase max-by: each block
    keeps one candidate row per user (lexsort + group-end take), ONE
    keyed repartition co-locates the ≤ blocks·users candidates, and the
    same kernel picks the final row.  Whole rows never shuffle twice;
    values are carried, not re-joined."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def last_per_user(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, u))
        u_s = u[order]
        ends = np.flatnonzero(np.r_[u_s[1:] != u_s[:-1], True])
        yield t.take(pa.array(order[ends]))

    cand = ev.map_batches(last_per_user, batch_format="pyarrow")
    co = cand.repartition(P, keys=["user_id"])

    def finish(t: pa.Table):
        for out in last_per_user(t):
            yield pa.table(
                {
                    "user_id": out.column("user_id"),
                    "last_ts": out.column("ts"),
                    "last_event_type": out.column("event_type"),
                    "last_event_id": out.column("event_id"),
                }
            )

    return co.map_batches(finish, batch_size=None, batch_format="pyarrow")


USER_LAST_EVENT_SQL = """
WITH r AS (
  SELECT user_id, ts, event_type, event_id,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts AS last_ts, event_type AS last_event_type,
  event_id AS last_event_id
FROM r WHERE rn = 1
"""


def _skyline_mask(qty: np.ndarray, rev: np.ndarray) -> np.ndarray:
    """Boolean mask of Pareto-optimal (maximize both) points.  A point
    survives iff its rev equals the max rev at its qty level AND beats
    the max rev over all STRICTLY higher qty levels (ties on both
    coordinates all survive — no strict coordinate, no dominance)."""
    order = np.lexsort((-rev, -qty))
    q_s, r_s = qty[order], rev[order]
    starts = np.flatnonzero(np.r_[True, q_s[1:] != q_s[:-1]])
    level_max = r_s[starts]  # first row per level has the level max
    higher = np.r_[np.int64(-(1 << 62)), np.maximum.accumulate(level_max)[:-1]]
    lvl = np.cumsum(np.r_[np.int64(0), np.diff(q_s) != 0])
    keep_sorted = (r_s == level_max[lvl]) & (level_max[lvl] > higher[lvl])
    mask = np.zeros(len(qty), bool)
    mask[order] = keep_sorted
    return mask


def part_skyline(sf_dir: str) -> ray.data.Dataset:
    """Pareto frontier of parts over (total quantity, total revenue),
    both maximized — the skyline operator.  Exact: quantities and
    cents are integer sums.  Scale shape: per-part partials pre-combine
    per block, ONE keyed re-agg completes the totals, each block prunes
    to its LOCAL skyline (any globally non-dominated point is
    non-dominated in its block, so local pruning is lossless), and the
    O(frontier·blocks) survivors merge in one final skyline pass."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty": pa.array(_i64(t.column("l_quantity"), 1)),
                "rev_c": pa.array(_i64(t.column("l_extendedprice"), 100)),
            }
        ).group_by(["l_partkey"]).aggregate([("qty", "sum"), ("rev_c", "sum")])
        yield g.rename_columns(["l_partkey", "qty", "rev_c"])

    totals = keyed_reagg(
        li.map_batches(pre, batch_format="pyarrow"),
        ["l_partkey"], [("qty", "sum"), ("rev_c", "sum")], P,
    )

    def local_prune(t: pa.Table):
        if t.num_rows == 0 or "qty" not in t.schema.names:
            return
        qty = t.column("qty").to_numpy(zero_copy_only=False)
        rev = t.column("rev_c").to_numpy(zero_copy_only=False)
        yield t.filter(pa.array(_skyline_mask(qty, rev)))

    pruned = totals.map_batches(
        local_prune, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "qty" not in t.schema.names:
            return
        qty = t.column("qty").to_numpy(zero_copy_only=False)
        rev = t.column("rev_c").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(_skyline_mask(qty, rev)))
        yield pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty": t.column("qty"),
                "revenue": pc.divide(
                    pc.cast(t.column("rev_c"), pa.float64()), 100.0
                ),
            }
        )

    return pruned.map_batches(finish, batch_size=None, batch_format="pyarrow")


PART_SKYLINE_SQL = """
WITH pp AS (
  SELECT l_partkey,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
    CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem GROUP BY 1
)
SELECT p.l_partkey, p.qty, CAST(p.rev_c AS DOUBLE)/100.0 AS revenue
FROM pp p WHERE NOT EXISTS (
  SELECT 1 FROM pp q
  WHERE q.qty >= p.qty AND q.rev_c >= p.rev_c
    AND (q.qty > p.qty OR q.rev_c > p.rev_c)
)
"""


NTILE_BUCKETS = 4


def event_value_ntile(sf_dir: str, b: int = NTILE_BUCKETS) -> ray.data.Dataset:
    """NTILE(4) quartile bucket of every event's value within its
    event type, ordered by (value, event_id) so ties are deterministic.
    The NTILE fill rule is RESTATED explicitly on both sides (first
    n % b buckets get ⌈n/b⌉ rows) rather than trusting the database's
    internal formula — the interp_quantiles exactness family.  ONE
    keyed repartition co-locates each type; the bucket assignment is a
    lexsort + vectorized boundary arithmetic."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    co = ev.repartition(P, keys=["event_type"])

    def bucketize(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("value").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, v, ty))
        ty_s, eid_s = ty[order], eid[order]
        starts = np.flatnonzero(np.r_[True, ty_s[1:] != ty_s[:-1]])
        sizes = np.diff(np.r_[starts, len(ty_s)])
        idx = np.arange(len(ty_s)) - np.repeat(starts, sizes)  # 0-based rank
        n = np.repeat(sizes, sizes)
        size = n // b          # small-bucket size
        extra = n % b          # first `extra` buckets take size+1
        cut = (size + 1) * extra
        small = idx >= cut
        bucket = np.where(small, extra + (idx - cut) // np.maximum(size, 1),
                          idx // (size + 1))
        out = np.empty(len(ty_s), np.int64)
        out[order] = bucket + 1
        yield pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
                "quartile": pa.array(out),
            }
        )

    return co.map_batches(bucketize, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_NTILE_SQL = """
SELECT event_id, event_type, value,
  CAST(NTILE(4) OVER (PARTITION BY event_type
                      ORDER BY value, event_id) AS BIGINT) AS quartile
FROM events
"""


def daily_event_spine(sf_dir: str) -> ray.data.Dataset:
    """Per-type daily event counts over a GAP-FREE date spine: every
    (event_type, day) cell in the global [min_day, max_day] range
    appears, zero-filled — the generate_series / calendar-spine shape.
    The spine is built from the already-reduced (type, day, n) table
    (cardinality = types·days, tiny by construction), so the cross
    join never touches raw rows."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()), DAY_US)
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "day": day,
                "n": _ones(len(t)),
            }
        ).group_by(["event_type", "day"]).aggregate([("n", "sum")])
        yield g.rename_columns(["event_type", "day", "n"])

    g = (
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(pre, batch_format="pyarrow")
        .repartition(1)  # ≤ types·days rows per partial
    )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type", "day"]).aggregate([("n", "sum")])
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        day = t.column("day").to_numpy(zero_copy_only=False)
        n = t.column("n_sum").to_numpy(zero_copy_only=False)
        lo, hi = int(day.min()), int(day.max())
        span = hi - lo + 1
        types = np.unique(ty)
        tix = {v: i for i, v in enumerate(types)}
        grid = np.zeros((len(types), span), np.int64)
        rows = np.fromiter((tix[v] for v in ty), np.int64, len(ty))
        grid[rows, day - lo] = n
        yield pa.table(
            {
                "event_type": pa.array(
                    np.repeat(types, span).tolist(), pa.string()
                ),
                "day": pa.array(np.tile(np.arange(lo, hi + 1), len(types))),
                "n_events": pa.array(grid.ravel()),
            }
        )

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


DAILY_EVENT_SPINE_SQL = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM c),
days AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
types AS (SELECT DISTINCT event_type FROM c)
SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n_events
FROM types t CROSS JOIN days d
LEFT JOIN c ON c.event_type = t.event_type AND c.day = d.day
"""


# --------------------------------------------------------------------------
# grouped interpolated quantile (per-group quantile_cont)
# --------------------------------------------------------------------------

P90_Q = 0.9


def event_value_p90(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type linearly-interpolated p90 of ``value`` — the
    grouped quantile_cont shape.  Same one-shuffle value-histogram
    layout as :func:`event_value_quantiles`; the pick is the EXPLICIT
    two-rank interpolation (pos = q·(N−1), lo = 1+⌊pos⌋,
    hi = min(lo+1 if frac≠0 else lo, N), value = x_lo + frac·(x_hi −
    x_lo)) restated with identical float64 expressions in the SQL
    oracle — bit-exact independent of DuckDB's internal formula
    (the interp_quantiles technique, grouped)."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.select(["event_type", "value"])
            .append_column("cnt", _ones(len(t)))
            .group_by(["event_type", "value"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["event_type", "value", "cnt"])

    vc = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        pre, batch_format="pyarrow"
    )
    co = vc.repartition(P, keys=["event_type"])

    def pick(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type", "value"]).aggregate([("cnt", "sum")])
        t = t.rename_columns(["event_type", "value", "cnt"])
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ty))
        ty, v, c = ty[order], v[order], c[order]
        starts = np.flatnonzero(np.r_[True, ty[1:] != ty[:-1]])
        ends = np.r_[starts[1:], len(ty)]
        cum = np.cumsum(c)
        base = np.r_[np.int64(0), cum[starts[1:] - 1]]
        n = cum[ends - 1] - base
        pos = P90_Q * (n - 1).astype(np.float64)
        frac = pos - np.floor(pos)
        lor = np.floor(pos).astype(np.int64) + 1
        hir = np.minimum(lor + (frac != 0).astype(np.int64), n)
        ilo = np.searchsorted(cum, base + lor, side="left")
        ihi = np.searchsorted(cum, base + hir, side="left")
        p90 = v[ilo] + frac * (v[ihi] - v[ilo])
        yield pa.table(
            {
                "event_type": pa.array(ty[starts].tolist(), pa.string()),
                "p90": pa.array(p90, pa.float64()),
            }
        )

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_P90_SQL = """
WITH n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1
),
o AS (
  SELECT event_type, value AS x,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS r
  FROM events
),
p AS (SELECT event_type, n, CAST(0.9 AS DOUBLE)*(n-1) AS pos FROM n),
p2 AS (SELECT event_type, n, pos, CAST(FLOOR(pos) AS BIGINT)+1 AS lor,
              pos - FLOOR(pos) AS frac FROM p),
p3 AS (SELECT event_type, lor, frac,
              LEAST(lor + CASE WHEN frac <> 0 THEN 1 ELSE 0 END, n) AS hir
       FROM p2)
SELECT p3.event_type, lo.x + p3.frac*(hi.x - lo.x) AS p90
FROM p3
JOIN o lo ON lo.event_type = p3.event_type AND lo.r = p3.lor
JOIN o hi ON hi.event_type = p3.event_type AND hi.r = p3.hir
"""


# --------------------------------------------------------------------------
# per-group z-score outliers (pure-integer 3-sigma rule, zero float)
# --------------------------------------------------------------------------

OUTLIER_Z = 3


def event_value_outliers(sf_dir: str, z: int = OUTLIER_Z) -> ray.data.Dataset:
    """Events whose ``value`` is more than ``z`` population standard
    deviations from their event type's mean — anomaly flagging with a
    PURE-INTEGER rule (the event_value_stats moment technique, pushed
    into the filter).  `z > k` is restated as
    ``(vc·n − S)² > k²·(n·Q − S²)`` (cents moments S=Σvc, Q=Σvc²),
    which on the Ray side collapses to two per-type integer value
    thresholds via T = isqrt(k²(nQ−S²)):
    ``vc > (S+T)//n  OR  vc ≤ (S−T−1)//n`` — exact because for ints
    a² > m ⟺ |a| > isqrt(m).  No float exists on either side, so the
    match is bit-trivial.  Scale shape: pass 1 is the tiny per-type
    moment reduce (block partials, ≤|types| rows cross the wire); the
    thresholds are broadcast and pass 2 is a stateless vectorized
    filter over the stream — no join, no shuffle of event rows."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        vc = _i64(t.column("value"), 100)
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "s": pa.array(vc),
                "ssq": pa.array(vc * vc),
                "n": _ones(len(t)),
            }
        ).group_by(["event_type"]).aggregate(
            [("s", "sum"), ("ssq", "sum"), ("n", "sum")]
        )
        yield g.rename_columns(["event_type", "s", "ssq", "n"])

    cols = ["event_id", "event_type", "value"]
    partials = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        pre, batch_format="pyarrow"
    )
    import math

    # driver fold over the ≤ |types|·blocks partial rows (arbitrary-
    # precision Python ints for the n·Q − S² cross term)
    acc: dict[str, list[int]] = {}
    for r in partials.take_all():
        a = acc.setdefault(r["event_type"], [0, 0, 0])
        a[0] += int(r["s"])
        a[1] += int(r["ssq"])
        a[2] += int(r["n"])
    thr: dict[str, tuple[int, int]] = {}
    for ty, (s, q, n) in acc.items():
        t_int = math.isqrt(z * z * (n * q - s * s))
        thr[ty] = ((s - t_int - 1) // n, (s + t_int) // n)

    def flag(t: pa.Table):
        if len(t) == 0:
            return
        vc = _i64(t.column("value"), 100)
        ty = t.column("event_type").to_pylist()
        lo = np.fromiter((thr[x][0] for x in ty), np.int64, len(ty))
        hi = np.fromiter((thr[x][1] for x in ty), np.int64, len(ty))
        keep = (vc > hi) | (vc <= lo)
        if not keep.any():
            return
        yield t.select(cols).filter(pa.array(keep))

    return _read(sf_dir, "events", cols).map_batches(
        flag, batch_format="pyarrow"
    )


EVENT_VALUE_OUTLIERS_SQL = f"""
WITH b AS (
  SELECT event_id, event_type, value,
         CAST(ROUND(value*100) AS BIGINT) AS vc FROM events
),
m AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(vc AS HUGEINT)) AS s, SUM(CAST(vc AS HUGEINT)*vc) AS q
  FROM b GROUP BY 1
)
SELECT b.event_id, b.event_type, b.value
FROM b JOIN m USING (event_type)
WHERE (CAST(b.vc AS HUGEINT)*m.n - m.s)*(CAST(b.vc AS HUGEINT)*m.n - m.s)
      > {OUTLIER_Z * OUTLIER_Z}*(m.n*m.q - m.s*m.s)
"""


# --------------------------------------------------------------------------
# per-group percent_rank (min-rank window shape)
# --------------------------------------------------------------------------


def event_value_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """``PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value)``
    for every event — the min-rank window shape.  The formula is
    restated explicitly on both sides (never the DB's internal one):
    ``pct = (rank_min − 1)/(n − 1)`` as one float64 division, 0.0 when
    n = 1.  rank_min − 1 = count of strictly-smaller values in the
    group, computed vectorized from one in-block lexsort
    (first-occurrence index propagation — no searchsorted per group).
    Scale shape: ONE event_type-keyed repartition; groups rank wholly
    in-block (same co-location assumption as event_value_p90)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    co = ds.repartition(P, keys=["event_type"])

    def rank(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("value").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ty))
        ty, v, eid = ty[order], v[order], eid[order]
        m = len(ty)
        idx = np.arange(m, dtype=np.int64)
        grp_new = np.r_[True, ty[1:] != ty[:-1]]
        val_new = grp_new | np.r_[True, v[1:] != v[:-1]]
        grp_start = np.maximum.accumulate(np.where(grp_new, idx, 0))
        val_start = np.maximum.accumulate(np.where(val_new, idx, 0))
        # group sizes: end − start, broadcast back per row
        starts = np.flatnonzero(grp_new)
        ends = np.r_[starts[1:], m]
        n = np.repeat(ends - starts, ends - starts)
        rk0 = val_start - grp_start  # rank_min − 1
        pct = np.where(
            n == 1, 0.0, rk0.astype(np.float64) / (n - 1).astype(np.float64)
        )
        yield pa.table(
            {
                "event_id": pa.array(eid),
                "event_type": pa.array(ty.tolist(), pa.string()),
                "value": pa.array(v, pa.float64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return co.map_batches(rank, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_PERCENT_RANK_SQL = """
WITH r AS (
  SELECT event_id, event_type, value,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
    CAST(RANK() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT)
      AS rk
  FROM events
)
SELECT event_id, event_type, value,
  CASE WHEN n = 1 THEN CAST(0 AS DOUBLE)
       ELSE CAST(rk - 1 AS DOUBLE)/CAST(n - 1 AS DOUBLE) END AS pct_rank
FROM r
"""


# --------------------------------------------------------------------------
# equal-width value histogram: two-pass with broadcast scalar bounds
# --------------------------------------------------------------------------

HIST_BINS = 20


def event_value_histogram(sf_dir: str) -> ray.data.Dataset:
    """(bin, n_events) equal-width histogram of event values over
    HIST_BINS bins — the canonical two-pass broadcast-scalar shape:
    pass 1 folds per-block (min, max) cent partials to two driver
    scalars; pass 2 bins PURE-INTEGER (``(vc − lo)·B // (hi − lo)``,
    clamped to B−1 so the max lands in the last bin) and pre-combines
    per block, so only ≤ B rows per block reach the final re-agg.
    Zero float anywhere ⇒ the SQL oracle's ``//`` floor-division is
    bit-identical.  Assumes hi > lo (any non-constant column)."""

    def mm(t: pa.Table):
        if len(t) == 0:
            return
        vc = _i64(t.column("value"), 100)
        yield pa.table({"lo": [int(vc.min())], "hi": [int(vc.max())]})

    ev = _read(sf_dir, "events", ["value"])
    parts = ev.map_batches(mm, batch_format="pyarrow").take_all()
    lo = min(r["lo"] for r in parts)
    hi = max(r["hi"] for r in parts)
    if hi == lo:
        hi = lo + 1  # constant column: everything in bin 0

    def binner(t: pa.Table):
        if len(t) == 0:
            return
        vc = _i64(t.column("value"), 100)
        b = np.minimum((vc - lo) * HIST_BINS // (hi - lo), HIST_BINS - 1)
        g = (
            pa.table({"bin": pa.array(b.astype(np.int64)), "n": _ones(len(t))})
            .group_by(["bin"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["bin", "n_events"])

    # ≤ HIST_BINS rows per block: repartition(1) + in-block re-agg
    # beats a keyed shuffle (tiny-partial rule, CLAUDE.md)
    partials = ev.map_batches(binner, batch_format="pyarrow").repartition(1)

    def fin(t: pa.Table):
        if t.num_rows == 0 or "bin" not in t.schema.names:
            return
        g = t.group_by(["bin"]).aggregate([("n_events", "sum")])
        yield g.rename_columns(["bin", "n_events"])

    return partials.map_batches(fin, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_HISTOGRAM_SQL = f"""
WITH b AS (
  SELECT CAST(ROUND(value*100) AS BIGINT) AS vc FROM events
),
mm AS (SELECT MIN(vc) AS lo, MAX(vc) AS hi FROM b)
SELECT CAST(LEAST((vc - lo) * {HIST_BINS} // (hi - lo), {HIST_BINS} - 1)
            AS BIGINT) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM b, mm GROUP BY 1
"""


# --------------------------------------------------------------------------
# interval stabbing: open orders per day (sweep-line +1/−1 prefix sum)
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def open_orders_over_time(sf_dir: str) -> ray.data.Dataset:
    """(day, open_orders) — how many orders are open on each knot day,
    an order being open from its order date through its last lineitem
    ship date (orders with no lineitems have no interval).  The
    classic sweep-line shape: per-order (+1 at start, −1 after end)
    deltas pre-combine per block, ONE day-keyed re-agg bounds the
    stream at distinct-knot-days rows, and the prefix sum runs in one
    tiny coalesced block (the day domain is thousands of knots no
    matter the row count — same rationale as the packing bucket scan).
    Pure integer epoch-days; output rows at delta days only (the step
    function's knots), identical to the SQL window prefix."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    def ship_pre(t: pa.Table):
        if len(t) == 0:
            return
        day = pc.cast(
            pc.divide(pc.cast(t.column("l_shipdate"), pa.int64()), _DAY_US),
            pa.int64(),
        )
        g = (
            pa.table({"l_orderkey": t.column("l_orderkey"), "ed": day})
            .group_by(["l_orderkey"])
            .aggregate([("ed", "max")])
        )
        yield g.rename_columns(["l_orderkey", "ed"])

    ends = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
            ship_pre, batch_format="pyarrow"
        ),
        ["l_orderkey"], [("ed", "max")], P,
    )

    def ord_pre(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "sd": pc.cast(
                    pc.divide(
                        pc.cast(t.column("o_orderdate"), pa.int64()), _DAY_US
                    ),
                    pa.int64(),
                ),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        ord_pre, batch_format="pyarrow"
    )
    j = join_auto(orders, ends, on=("l_orderkey",), num_partitions=P)

    def deltas(t: pa.Table):
        if len(t) == 0 or "ed" not in t.schema.names:
            return
        sd = t.column("sd").to_numpy(zero_copy_only=False)
        ed = t.column("ed").to_numpy(zero_copy_only=False)
        day = np.concatenate([sd, ed + 1])
        dd = np.concatenate(
            [np.ones(len(sd), np.int64), np.full(len(ed), -1, np.int64)]
        )
        g = (
            pa.table({"day": pa.array(day), "delta": pa.array(dd)})
            .group_by(["day"])
            .aggregate([("delta", "sum")])
        )
        yield g.rename_columns(["day", "delta"])

    knots = keyed_reagg(
        j.map_batches(deltas, batch_format="pyarrow"), ["day"], [("delta", "sum")], P
    ).repartition(1)

    def prefix(t: pa.Table):
        if t.num_rows == 0 or "day" not in t.schema.names:
            return
        g = t.group_by(["day"]).aggregate([("delta", "sum")])
        day = g.column("day").to_numpy(zero_copy_only=False)
        dd = g.column("delta_sum").to_numpy(zero_copy_only=False)
        o = np.argsort(day)
        yield pa.table(
            {
                "day": pa.array(day[o]),
                "open_orders": pa.array(np.cumsum(dd[o]).astype(np.int64)),
            }
        )

    return knots.map_batches(prefix, batch_size=None, batch_format="pyarrow")


OPEN_ORDERS_SQL = """
WITH ends AS (
  SELECT l_orderkey,
    MAX(CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT)) AS ed
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS sd, e.ed
  FROM orders o JOIN ends e ON o.o_orderkey = e.l_orderkey
),
d AS (
  SELECT sd AS day, 1 AS dd FROM j
  UNION ALL SELECT ed + 1, -1 FROM j
),
g AS (SELECT day, CAST(SUM(dd) AS BIGINT) AS delta FROM d GROUP BY day)
SELECT day, CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM g
"""


# --------------------------------------------------------------------------
# referential-integrity audit (distributed anti-join counts)
# --------------------------------------------------------------------------

_FK_PAIRS = [
    ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_violations(sf_dir: str) -> pa.Table:
    """(fk, violations) referential-integrity audit across every
    foreign-key edge of the schema — the ingest-gate data-quality
    check a pipeline runs before training jobs consume a drop.  Each
    edge is one distributed anti join (join_auto: keys-only right side
    broadcasts under the guard, hash-partitions above) + a count; the
    driver folds |edges| scalars.  All-zero on a consistent extract —
    the value is the guarantee, and any violation surfaces with its
    edge name."""
    from .joins import join_auto

    rows = []
    for name, lt, lk, rt, rk in _FK_PAIRS:
        anti = join_auto(
            _read(sf_dir, lt, [lk]),
            _read(sf_dir, rt, [rk]),
            on=(lk,),
            right_on=(rk,),
            how="anti",
            num_partitions=P,
        )
        rows.append((name, anti.count()))
    return pa.table(
        {
            "fk": pa.array([n for n, _ in rows], pa.string()),
            "violations": pa.array([v for _, v in rows], pa.int64()),
        }
    )


FK_VIOLATIONS_SQL = """
SELECT 'orders_custkey' AS fk, CAST(COUNT(*) AS BIGINT) AS violations
FROM orders ANTI JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem_orderkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'lineitem_partkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem ANTI JOIN part ON l_partkey = p_partkey
UNION ALL
SELECT 'lineitem_suppkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem ANTI JOIN supplier ON l_suppkey = s_suppkey
UNION ALL
SELECT 'customer_nationkey', CAST(COUNT(*) AS BIGINT)
FROM customer ANTI JOIN nation ON c_nationkey = n_nationkey
UNION ALL
SELECT 'supplier_nationkey', CAST(COUNT(*) AS BIGINT)
FROM supplier ANTI JOIN nation ON s_nationkey = n_nationkey
UNION ALL
SELECT 'nation_regionkey', CAST(COUNT(*) AS BIGINT)
FROM nation ANTI JOIN region ON n_regionkey = r_regionkey
"""


# --------------------------------------------------------------------------
# winsorized mean: clip at exact per-group p10/p90, then integer mean
# --------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.10, 0.90


def event_value_winsorized(sf_dir: str) -> ray.data.Dataset:
    """(event_type, lo_cents, hi_cents, winsorized_mean) — the robust
    mean with values clipped at the exact per-type p10/p90
    (quantile_disc rank rule max(1, ⌈q·N⌉)).  Rides the SAME
    co-located (type, cents, count) histogram as the grouped
    quantiles: cutoff pick AND clipped integer sum happen in ONE
    block-local kernel — no second pass over the raw rows, no driver
    values.  mean = float(Σ clipped cents)/100/N, the identical
    division chain in SQL."""

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "vc": pa.array(_i64(t.column("value"), 100)),
                    "cnt": _ones(len(t)),
                }
            )
            .group_by(["event_type", "vc"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["event_type", "vc", "cnt"])

    co = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        pre, batch_format="pyarrow"
    ).repartition(P, keys=["event_type"])

    def pick(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type", "vc"]).aggregate([("cnt", "sum")])
        t = t.rename_columns(["event_type", "vc", "cnt"])
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("vc").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ty))
        ty, v, c = ty[order], v[order], c[order]
        starts = np.flatnonzero(np.r_[True, ty[1:] != ty[:-1]])
        ends = np.r_[starts[1:], len(ty)]
        cum = np.cumsum(c)
        base = np.r_[np.int64(0), cum[starts[1:] - 1]]
        totals = cum[ends - 1] - base
        los, his, means = [], [], []
        for gi, (s, e) in enumerate(zip(starts, ends)):
            n = int(totals[gi])
            cuts = []
            for q in (WINSOR_LO, WINSOR_HI):
                rank = max(1, int(np.ceil(q * n)))
                idx = int(np.searchsorted(cum[s:e], base[gi] + rank, side="left"))
                cuts.append(int(v[s + idx]))
            lo, hi = cuts
            clipped = np.clip(v[s:e], lo, hi)
            total = int((clipped * c[s:e]).sum())
            los.append(lo), his.append(hi)
            means.append(float(total) / 100.0 / n)
        yield pa.table(
            {
                "event_type": pa.array(ty[starts].tolist(), pa.string()),
                "lo_cents": pa.array(los, pa.int64()),
                "hi_cents": pa.array(his, pa.int64()),
                "winsorized_mean": pa.array(means, pa.float64()),
            }
        )

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


EVENT_VALUE_WINSORIZED_SQL = f"""
WITH b AS (
  SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events
),
q AS (
  SELECT event_type,
    quantile_disc(vc, {WINSOR_LO}) AS lo,
    quantile_disc(vc, {WINSOR_HI}) AS hi
  FROM b GROUP BY event_type
)
SELECT b.event_type, q.lo AS lo_cents, q.hi AS hi_cents,
  CAST(SUM(LEAST(GREATEST(b.vc, q.lo), q.hi)) AS DOUBLE) / 100.0 / COUNT(*)
    AS winsorized_mean
FROM b JOIN q ON b.event_type = q.event_type
GROUP BY b.event_type, q.lo, q.hi
"""


# --------------------------------------------------------------------------
# inter-arrival gap quantiles: window diff → grouped exact quantiles
# --------------------------------------------------------------------------


def event_gap_quantiles(sf_dir: str) -> ray.data.Dataset:
    """(event_type, median_gap_us, p90_gap_us, n_gaps) — exact
    quantiles of the inter-arrival gaps between consecutive
    same-(user, type) events: the window-diff → grouped-quantile
    composition.  ONE user-keyed repartition makes each user's stream
    block-complete; the diff kernel is a lexsort + shifted compare
    (gap multisets are tie-order invariant: consecutive diffs of a
    sorted multiset don't depend on how equal timestamps order); gaps
    leave the block as (type, gap, count) histogram partials, and the
    rank pick (max(1, ⌈q·N⌉), the verified quantile_disc rule) is
    block-local after the type-keyed repartition — the driver never
    sees a gap."""

    def prep(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"]).map_batches(
        prep, batch_format="pyarrow"
    ).repartition(P, keys=["user_id"])

    def gaps(t: pa.Table):
        if t.num_rows == 0 or "us" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        us = t.column("us").to_numpy(zero_copy_only=False)
        order = np.lexsort((us, ty, u))
        u, ty, us = u[order], ty[order], us[order]
        same = (u[1:] == u[:-1]) & (ty[1:] == ty[:-1])
        if not same.any():
            return
        g = (
            pa.table(
                {
                    "event_type": pa.array(ty[1:][same].tolist(), pa.string()),
                    "gap": pa.array((us[1:] - us[:-1])[same]),
                    "cnt": _ones(int(same.sum())),
                }
            )
            .group_by(["event_type", "gap"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["event_type", "gap", "cnt"])

    co = ev.map_batches(gaps, batch_format="pyarrow").repartition(
        P, keys=["event_type"]
    )

    def pick(t: pa.Table):
        if t.num_rows == 0 or "event_type" not in t.schema.names:
            return
        t = t.group_by(["event_type", "gap"]).aggregate([("cnt", "sum")])
        t = t.rename_columns(["event_type", "gap", "cnt"])
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("gap").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, ty))
        ty, v, c = ty[order], v[order], c[order]
        starts = np.flatnonzero(np.r_[True, ty[1:] != ty[:-1]])
        ends = np.r_[starts[1:], len(ty)]
        cum = np.cumsum(c)
        base = np.r_[np.int64(0), cum[starts[1:] - 1]]
        totals = cum[ends - 1] - base
        cols = {"event_type": pa.array(ty[starts].tolist(), pa.string())}
        for q, nm in ((0.5, "median_gap_us"), (0.9, "p90_gap_us")):
            ranks = np.maximum(1, np.ceil(q * totals).astype(np.int64))
            idx = np.searchsorted(cum, base + ranks, side="left")
            cols[nm] = pa.array(v[idx], pa.int64())
        cols["n_gaps"] = pa.array(totals.astype(np.int64))
        yield pa.table(cols)

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


EVENT_GAP_QUANTILES_SQL = """
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts)) AS prev
  FROM events
),
g AS (SELECT event_type, us - prev AS gap FROM o WHERE prev IS NOT NULL)
SELECT event_type,
  quantile_disc(gap, 0.5) AS median_gap_us,
  quantile_disc(gap, 0.9) AS p90_gap_us,
  CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM g GROUP BY event_type
"""


# --------------------------------------------------------------------------
# equal-frequency (decile) revenue share: exact cutoffs then binned sums
# --------------------------------------------------------------------------


def revenue_by_price_decile(sf_dir: str) -> ray.data.Dataset:
    """(decile, n_items, revenue_cents, revenue_share) — revenue
    concentration across exact price deciles: the equal-FREQUENCY
    complement of event_value_histogram's equal-width bins.  Pass 1:
    the distributed exact-quantile machinery (value-count partials,
    rank pick) yields the 9 cent cutoffs — 9 scalars to the driver.
    Pass 2: bin = #cuts strictly below the value (np.searchsorted
    'left' == SQL len(list_filter(cuts, c -> c < vc)) — identical on
    ties), block-local integer sums, one tiny keyed re-agg; shares are
    per-row divisions of exact int64 sums by the exact total."""
    from .quantiles import exact_quantiles
    from .shuffle import keyed_reagg

    def cents(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table({"vc": pa.array(_i64(t.column("l_extendedprice"), 100))})

    base = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        cents, batch_format="pyarrow"
    )
    qs = [i / 10 for i in range(1, 10)]
    cuts = np.array(
        sorted(
            int(r["value"])
            for r in exact_quantiles(base, "vc", qs=qs).take_all()
        ),
        np.int64,
    )

    def binned(t: pa.Table):
        if len(t) == 0 or "vc" not in t.schema.names:
            return
        vc = t.column("vc").to_numpy(zero_copy_only=False)
        d = np.searchsorted(cuts, vc, side="left").astype(np.int64)
        g = (
            pa.table(
                {
                    "decile": pa.array(d),
                    "n_items": _ones(len(vc)),
                    "revenue_cents": pa.array(vc),
                }
            )
            .group_by(["decile"])
            .aggregate([("n_items", "sum"), ("revenue_cents", "sum")])
        )
        yield g.rename_columns(["decile", "n_items", "revenue_cents"])

    folded = keyed_reagg(
        base.map_batches(binned, batch_format="pyarrow"),
        ["decile"], [("n_items", "sum"), ("revenue_cents", "sum")], 4,
    ).repartition(1)

    def fin(t: pa.Table):
        if t.num_rows == 0 or "decile" not in t.schema.names:
            return
        t = t.group_by(["decile"]).aggregate(
            [("n_items", "sum"), ("revenue_cents", "sum")]
        )
        t = t.rename_columns(["decile", "n_items", "revenue_cents"])
        rev = t.column("revenue_cents").to_numpy(zero_copy_only=False)
        tot = int(rev.sum())
        yield t.append_column(
            "revenue_share",
            pa.array(rev.astype(np.float64) / float(tot), pa.float64()),
        )

    return folded.map_batches(fin, batch_size=None, batch_format="pyarrow")


REVENUE_BY_PRICE_DECILE_SQL = """
WITH b AS (
  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS vc FROM lineitem
),
q AS (
  SELECT quantile_disc(vc, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts
  FROM b
),
t AS (SELECT CAST(SUM(vc) AS BIGINT) AS tot FROM b),
binned AS (
  SELECT CAST(len(list_filter(q.cuts, c -> c < b.vc)) AS BIGINT) AS decile,
    b.vc
  FROM b, q
)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(vc) AS BIGINT) AS revenue_cents,
  CAST(SUM(vc) AS DOUBLE) / CAST(t.tot AS DOUBLE) AS revenue_share
FROM binned, t GROUP BY decile, t.tot
"""


# --------------------------------------------------------------------------
# relational division: customers whose EVERY order is urgent
# --------------------------------------------------------------------------


def customers_all_expedited(sf_dir: str) -> ray.data.Dataset:
    """(o_custkey, n_orders) — customers with ≥1 order and NO order
    below '3-MEDIUM' priority (the relational-division shape: "for
    all" restated as a conditional-count equality; priorities are
    '1-'..'5-'-prefixed, so the cut is one string compare).  Block
    partials carry (n, n_ok) per customer; ONE keyed re-agg; the
    division predicate n == n_ok filters block-locally.  The terminal
    filter always yields (possibly zero-row) TYPED tables so an empty
    result keeps its schema."""
    from .shuffle import keyed_reagg

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        urgent = pc.cast(
            pc.less_equal(t.column("o_orderpriority"), "3-MEDIUM"), pa.int64()
        )
        g = (
            pa.table(
                {
                    "o_custkey": t.column("o_custkey"),
                    "n_orders": _ones(len(t)),
                    "n_urgent": urgent,
                }
            )
            .group_by(["o_custkey"])
            .aggregate([("n_orders", "sum"), ("n_urgent", "sum")])
        )
        yield g.rename_columns(["o_custkey", "n_orders", "n_urgent"])

    folded = keyed_reagg(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["o_custkey"], [("n_orders", "sum"), ("n_urgent", "sum")], P,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "n_orders" not in t.schema.names:
            return
        keep = t.filter(
            pc.equal(t.column("n_orders"), t.column("n_urgent"))
        )
        yield keep.select(["o_custkey", "n_orders"])

    return folded.map_batches(fin, batch_format="pyarrow")


CUSTOMERS_ALL_EXPEDITED_SQL = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) = SUM(CASE WHEN o_orderpriority <= '3-MEDIUM' THEN 1 ELSE 0 END)
"""


# --------------------------------------------------------------------------
# aggregate-then-window: month-over-month revenue change per nation
# --------------------------------------------------------------------------


def nation_monthly_mom(sf_dir: str) -> ray.data.Dataset:
    """(n_name, month, revenue_cents, mom_change) — monthly revenue per
    nation with the month-over-month ratio: the aggregate-THEN-window
    composition.  The heavy part is the integer month re-agg
    (fixed-point cents; customer→nation broadcast-joined); the window
    runs over the REDUCED series (nations × months rows), co-located
    per nation, LAG = one vectorized shifted compare.  mom_change =
    (cur − prev)/prev, one double division of exact ints per row;
    first month per nation is NULL both sides."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = us // 86_400_000_000
        # month id = year*12 + (month-1), from epoch days via numpy
        dt = (day.astype("datetime64[D]")).astype("datetime64[M]")
        month = dt.astype(np.int64) + 1970 * 12
        yield pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "month": pa.array(month),
                "rev": pa.array(_i64(t.column("o_totalprice"), 100)),
            }
        )

    j = join_auto(
        orders.map_batches(pre, batch_format="pyarrow"),
        cust,
        on=("o_custkey",),
        right_on=("c_custkey",),
        num_partitions=P,
    )
    j2 = join_auto(j, nat, on=("c_nationkey",), right_on=("n_nationkey",))

    def month_pre(t: pa.Table):
        if len(t) == 0 or "n_name" not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "n_name": t.column("n_name"),
                    "month": t.column("month"),
                    "revenue_cents": t.column("rev"),
                }
            )
            .group_by(["n_name", "month"])
            .aggregate([("revenue_cents", "sum")])
        )
        yield g.rename_columns(["n_name", "month", "revenue_cents"])

    series = keyed_reagg(
        j2.map_batches(month_pre, batch_format="pyarrow"),
        ["n_name", "month"], [("revenue_cents", "sum")], P,
    ).repartition(P, keys=["n_name"])

    def window(t: pa.Table):
        if t.num_rows == 0 or "n_name" not in t.schema.names:
            return
        t = t.group_by(["n_name", "month"]).aggregate(
            [("revenue_cents", "sum")]
        ).rename_columns(["n_name", "month", "revenue_cents"])
        nm = np.asarray(t.column("n_name").to_pylist(), dtype=object)
        mo = t.column("month").to_numpy(zero_copy_only=False)
        rv = t.column("revenue_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((mo, nm))
        nm, mo, rv = nm[order], mo[order], rv[order]
        same = np.r_[False, nm[1:] == nm[:-1]]
        prev = np.r_[np.int64(1), rv[:-1]]  # sentinel dodges 0-div at group starts
        with np.errstate(divide="ignore", invalid="ignore"):
            change = np.where(
                same,
                (rv - prev).astype(np.float64) / prev.astype(np.float64),
                np.nan,
            )
        yield pa.table(
            {
                "n_name": pa.array(nm.tolist(), pa.string()),
                "month": pa.array(mo),
                "revenue_cents": pa.array(rv),
                "mom_change": pa.array(change, pa.float64()),
            }
        )

    return series.map_batches(window, batch_size=None, batch_format="pyarrow")


TRENDING_K = 5


def trending_parts(sf_dir: str) -> ray.data.Dataset:
    """(month, part, qty, rnk, prev_rnk) — monthly top-``TRENDING_K``
    parts by shipped quantity with each part's rank in the PREVIOUS
    month's top list (0 if it wasn't there): the trending/leaderboard-
    delta shape (rank now ⋈ rank then) that powers "new this month"
    reporting.  Rank is (qty desc, part asc) — all-integer total
    order; quantities are integral doubles snapped to int64 (the
    fixed-point rule).

    Scale shape: raw rows reduce via block partials + ONE
    (month, part)-keyed re-agg; a month-keyed repartition makes each
    month's reduced slice block-local for the rank/truncate (≤ K rows
    per month survive); the prev-month join then runs over the
    months×K leaderboard — bounded by the calendar, never by data —
    in one coalesced block."""
    from .shuffle import keyed_reagg

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_shipdate"])

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = us // 86_400_000_000
        month = (day.astype("datetime64[D]")).astype(
            "datetime64[M]").astype(np.int64) + 1970 * 12
        qty = t.column("l_quantity").to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    "month": pa.array(month),
                    "part": t.column("l_partkey"),
                    "qty": pa.array(qty),
                }
            )
            .group_by(["month", "part"])
            .aggregate([("qty", "sum")])
        )
        yield g.rename_columns(["month", "part", "qty"])

    per = keyed_reagg(
        li.map_batches(pre, batch_format="pyarrow"),
        ["month", "part"], [("qty", "sum")], 8,
    ).repartition(8, keys=["month"])

    def rank_trunc(t: pa.Table):
        if t.num_rows == 0 or "qty" not in t.schema.names:
            return
        m = t.column("month").to_numpy(zero_copy_only=False)
        p = t.column("part").to_numpy(zero_copy_only=False)
        q = t.column("qty").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -q, m))
        m, p, q = m[order], p[order], q[order]
        starts = np.flatnonzero(np.r_[True, m[1:] != m[:-1]])
        rnk = np.arange(len(m)) - np.repeat(
            starts, np.diff(np.r_[starts, len(m)])) + 1
        keep = rnk <= TRENDING_K
        yield pa.table(
            {
                "month": pa.array(m[keep]),
                "part": pa.array(p[keep]),
                "qty": pa.array(q[keep]),
                "rnk": pa.array(rnk[keep].astype(np.int64)),
            }
        )

    board = per.map_batches(
        rank_trunc, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def join_prev(t: pa.Table):
        if t.num_rows == 0 or "rnk" not in t.schema.names:
            return
        m = t.column("month").to_numpy(zero_copy_only=False)
        p = t.column("part").to_numpy(zero_copy_only=False)
        r = t.column("rnk").to_numpy(zero_copy_only=False)
        prev = {(mm, pp): rr for mm, pp, rr in zip(m, p, r)}
        pr = np.fromiter(
            (prev.get((mm - 1, pp), 0) for mm, pp in zip(m, p)),
            np.int64, len(m),
        )
        yield t.append_column("prev_rnk", pa.array(pr))

    return board.map_batches(
        join_prev, batch_size=None, batch_format="pyarrow")


TRENDING_PARTS_SQL = f"""
WITH per AS (
  SELECT (year(l_shipdate) * 12 + month(l_shipdate) - 1) AS month,
    l_partkey AS part,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
rk AS (
  SELECT CAST(month AS BIGINT) AS month, part, qty,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY month ORDER BY qty DESC, part) AS BIGINT) AS rnk
  FROM per
  QUALIFY rnk <= {TRENDING_K}
)
SELECT r.month, r.part, r.qty, r.rnk, COALESCE(p.rnk, 0) AS prev_rnk
FROM rk r LEFT JOIN rk p ON p.month = r.month - 1 AND p.part = r.part
"""


NATION_MONTHLY_MOM_SQL = """
WITH j AS (
  SELECT n.n_name,
    (year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1) AS month,
    CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
s AS (
  SELECT n_name, CAST(month AS BIGINT) AS month,
    CAST(SUM(rev) AS BIGINT) AS revenue_cents
  FROM j GROUP BY 1, 2
)
SELECT n_name, month, revenue_cents,
  CAST(revenue_cents - LAG(revenue_cents) OVER w AS DOUBLE)
    / CAST(LAG(revenue_cents) OVER w AS DOUBLE) AS mom_change
FROM s WINDOW w AS (PARTITION BY n_name ORDER BY month)
"""


# --------------------------------------------------------------------------
# Gini coefficient of per-order revenue (inequality statistic)
# --------------------------------------------------------------------------


MANTISSA_BITS = 4  # sub-buckets per octave in the monotone value bucketing


def _exact_rank_sums(x: np.ndarray) -> tuple[int, int]:
    """(Σx, Σ j·x) with j the 0-based index, EXACT Python ints for any
    non-negative int64 x — dynamic power-of-two chunking keeps every
    numpy partial below 2^62 (the in-chunk rank part is one int64
    np.dot; chunk bases fold in Python), so nothing can wrap at any
    data scale."""
    n_b = len(x)
    xmax = int(x.max()) if n_b else 0
    if xmax == 0:
        return 0, 0
    # total: chunk so each reduceat partial stays below 2^62
    c_t = 1 << max(0, 62 - xmax.bit_length())
    parts = np.add.reduceat(x, np.arange(0, n_b, min(c_t, n_b)))
    t_b = sum(int(s) for s in parts)
    # rank-weighted: j = C·chunk + jc; Σ jc·x ≤ C·T_b < 2^62
    c = 1 << max(0, 62 - t_b.bit_length())
    c = min(c, 1 << 30)
    w = int(np.dot(np.arange(n_b, dtype=np.int64) & (c - 1), x))
    chunk_sums = np.add.reduceat(x, np.arange(0, n_b, c))
    w += sum(int(i) * c * int(s) for i, s in enumerate(chunk_sums))
    return t_b, w


def _order_rev_bucketed(sf_dir: str):
    """Per-order revenue (integer cent·pct, NATION_REVENUE_SQL
    convention) bucketized by the monotone frexp+MANTISSA_BITS key and
    co-located by ONE bucket-keyed repartition — the shared front end
    of the rank-statistic queries (gini, pareto point)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        rev = _i64(t.column("l_extendedprice"), 100) * (
            100 - _i64(t.column("l_discount"), 100)
        )
        g = (
            pa.table({"l_orderkey": t.column("l_orderkey"), "v": pa.array(rev)})
            .group_by(["l_orderkey"])
            .aggregate([("v", "sum")])
        )
        yield g.rename_columns(["l_orderkey", "v"])

    rev = keyed_reagg(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"],
        [("v", "sum")],
        num_partitions=P,
    )

    def bucketize(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        v = t.column("v").to_numpy(zero_copy_only=False)
        if v.size and int(v.max()) >= 1 << 53:
            raise OverflowError("rank stats: value exceeds exact-double range")
        m, e = np.frexp(v.astype(np.float64))
        scale = 1 << (MANTISSA_BITS + 1)
        bucket = e.astype(np.int64) * (1 << MANTISSA_BITS) + np.floor(
            m * scale
        ).astype(np.int64)
        yield pa.table({"bucket": pa.array(bucket), "v": pa.array(v)})

    return rev.map_batches(bucketize, batch_format="pyarrow").repartition(
        P, keys=["bucket"]
    )


def _bucket_stats(co) -> list[tuple[int, int, int, int]]:
    """Ascending (bucket, n_b, ΣT_b, Σj·x_b) rows — ≤ ~850 of them —
    via the exact chunked per-bucket kernel (never wraps); the only
    thing the driver ever materializes."""

    def per_bucket(t: pa.Table):
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, b))
        b, v = b[order], v[order]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        rows = []
        for s, e in zip(starts, ends):
            t_b, w_b = _exact_rank_sums(v[s:e])
            rows.append((int(b[s]), int(e - s), t_b, w_b))
        dec = pa.decimal128(38, 0)
        yield pa.table(
            {
                "bucket": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "t": pa.array([r[2] for r in rows], dec),
                "w": pa.array([r[3] for r in rows], dec),
            }
        )

    return sorted(
        (r["bucket"], r["n"], int(r["t"]), int(r["w"]))
        for r in co.map_batches(
            per_bucket, batch_size=None, batch_format="pyarrow"
        ).take_all()
    )


def gini_order_revenue(sf_dir: str) -> pa.Table:
    """Gini coefficient of per-order revenue via the sorted-rank
    identity G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) (x ascending,
    1-based), computed EXACTLY without a global sort:

      * per-order revenue in integer cent·pct units (block partials →
        keyed_reagg by orderkey, the NATION_REVENUE_SQL convention);
      * a MONOTONE value bucketing — frexp exponent + 4 mantissa bits
        (order-preserving, needs no vmax pass; ≤ ~16·53 buckets) — so
        global rank = bucket count-offset + in-bucket rank;
      * ONE bucket-keyed repartition; per bucket the kernel sorts
        ascending and folds Σ j·x with dynamic power-of-two chunking
        (C chosen so C·T_b < 2^62: the in-chunk part is one int64
        np.dot, chunk bases fold in Python ints — exact at ANY scale,
        never wraps), emitting (bucket, n, t, w) with t/w as
        decimal128(38);
      * the driver scans only the ≤ ~850 bucket rows: off_b =
        exclusive count prefix, S = Σ (off_b+1)·T_b + W_b in Python
        ints.

    Rank ties need no rule: equal values share a bucket (bucketing is
    a function of the value) and Σ i·x over a tie block is
    permutation-invariant.  The ONLY float op — the final
    (2S−(n+1)T)/(nT) after integer→double casts — is written
    identically in the SQL oracle (HUGEINT side), so the driver match
    is bit-identical."""
    stats = _bucket_stats(_order_rev_bucketed(sf_dir))
    n_tot, t_tot, s_tot, off = 0, 0, 0, 0
    for _, n_b, t_b, w_b in stats:
        s_tot += (off + 1) * t_b + w_b
        off += n_b
        n_tot += n_b
        t_tot += t_b
    gini = (
        float(2 * s_tot - (n_tot + 1) * t_tot) / float(n_tot * t_tot)
        if n_tot and t_tot
        else 0.0
    )
    return pa.table(
        {
            "n_orders": pa.array([n_tot], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


GINI_ORDER_REVENUE_SQL = """
WITH rev AS (
  SELECT l_orderkey,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS v
  FROM lineitem GROUP BY l_orderkey
),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS i FROM rev),
agg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(v AS HUGEINT)) AS t,
               SUM(CAST(i AS HUGEINT) * v) AS s FROM r)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(2*s - (n+1)*t AS DOUBLE) / CAST(n*t AS DOUBLE) AS gini
FROM agg
"""


def pareto_revenue_point(sf_dir: str) -> pa.Table:
    """The Lorenz-curve 50% point: the smallest k such that the k
    highest-revenue orders cover at least half of total revenue
    (integer rule 2·cum ≥ total — no T/2 fraction exists), plus the
    exact covered amount and its share.

    Two bounded passes over the shared bucketized revenue front end
    (:func:`_order_rev_bucketed`): (1) the ≤ ~850 bucket stat rows
    locate the crossing bucket B* from the top (Python-int cumulative
    — exact); (2) ONE filtered fetch of B*'s values (a single
    octave-slice of the distribution — raise MANTISSA_BITS if a slice
    ever outgrows a block) finishes the prefix inside the tie-safe
    rule: k is invariant to tie order because every row at the
    crossing shares the same value.  Output integers are exact; the
    one float (share = covered/total after integer→double casts) is
    written identically in the SQL oracle."""
    stats = _bucket_stats(_order_rev_bucketed(sf_dir))
    t_tot = sum(t_b for _, _, t_b, _ in stats)
    if t_tot == 0:
        return pa.table(
            {
                "k_orders": pa.array([], pa.int64()),
                "covered_cents": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
                "share": pa.array([], pa.float64()),
            }
        )
    cum_above, n_above, b_star = 0, 0, None
    for bucket, n_b, t_b, _ in reversed(stats):
        if 2 * (cum_above + t_b) >= t_tot:
            b_star = bucket
            break
        cum_above += t_b
        n_above += n_b
    def pick(t: pa.Table):
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return
        yield t.filter(pc.equal(t.column("bucket"), b_star))

    vals = sorted(
        (
            r["v"]
            for r in _order_rev_bucketed(sf_dir)
            .map_batches(pick, batch_format="pyarrow")
            .take_all()
        ),
        reverse=True,
    )
    covered, k = cum_above, n_above
    for v in vals:
        covered += int(v)
        k += 1
        if 2 * covered >= t_tot:
            break
    return pa.table(
        {
            "k_orders": pa.array([k], pa.int64()),
            "covered_cents": pa.array([covered], pa.int64()),
            "total_cents": pa.array([t_tot], pa.int64()),
            "share": pa.array([float(covered) / float(t_tot)], pa.float64()),
        }
    )


PARETO_REVENUE_POINT_SQL = """
WITH rev AS (
  SELECT l_orderkey,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS v
  FROM lineitem GROUP BY l_orderkey
),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC) AS i,
             SUM(CAST(v AS HUGEINT)) OVER
               (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev),
tot AS (SELECT SUM(CAST(v AS HUGEINT)) AS t FROM rev),
s AS (SELECT i, cum FROM r, tot WHERE 2*cum >= tot.t ORDER BY i LIMIT 1)
SELECT CAST(s.i AS BIGINT) AS k_orders,
       CAST(s.cum AS BIGINT) AS covered_cents,
       CAST(tot.t AS BIGINT) AS total_cents,
       CAST(s.cum AS DOUBLE) / CAST(tot.t AS DOUBLE) AS share
FROM s, tot
"""


# --------------------------------------------------------------------------
# incremental view maintenance: CDC delta applied to a materialized agg
# --------------------------------------------------------------------------

IVM_CUTOFF_US = 1705363200000000  # 2024-01-16 00:00:00 (mid-corpus)
IVM_DEL_MOD = 10  # splitmix64(event_id) % 10 == 0 -> CDC delete


def ivm_event_revenue(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n, sum_cents) — a materialized per-type revenue
    aggregate MAINTAINED under a CDC delta instead of recomputed: the
    base state is the aggregate over events before ``IVM_CUTOFF_US``;
    the delta stream carries inserts (events at/after the cutoff) and
    deletes (a deterministic splitmix64-picked tenth of the base).
    Counts and integer-cent sums form an abelian group, so
    state ⊕ agg(signed delta) equals the full recompute the SQL oracle
    runs — the incremental-refresh path that avoids rescanning 100 TB
    of history for a daily tail of new rows.  Both the state partials
    and the signed delta partials are block-local group_bys merged by
    ONE |types|-bounded keyed re-agg; groups whose maintained count
    hits zero are retracted (dropped)."""
    from .sketch import splitmix64

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def partials(t: pa.Table):
        if len(t) == 0 or "event_id" not in t.schema.names:
            return
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        vc = _i64(t.column("value"), 100)
        h = splitmix64(
            t.column("event_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        base = us < IVM_CUTOFF_US
        deleted = base & (h % IVM_DEL_MOD == 0)
        inserted = ~base
        # signs: +1 state row, -1 CDC delete, +1 CDC insert
        sign = base.astype(np.int64) - deleted.astype(np.int64) + inserted.astype(np.int64)
        keep = sign != 0
        et = t.column("event_type")
        g = (
            pa.table(
                {
                    "event_type": et.filter(pa.array(keep)),
                    "n": pa.array(sign[keep]),
                    "sc": pa.array(sign[keep] * vc[keep]),
                }
            )
            .group_by(["event_type"])
            .aggregate([("n", "sum"), ("sc", "sum")])
        )
        yield g.rename_columns(["event_type", "n", "sc"])

    merged = keyed_reagg(
        ev.map_batches(partials, batch_format="pyarrow"),
        ["event_type"], [("n", "sum"), ("sc", "sum")], 4,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        t = t.filter(pc.greater(t.column("n"), 0))  # group retraction
        if t.num_rows:
            yield t.rename_columns(["event_type", "n", "sum_cents"])

    return merged.map_batches(fin, batch_size=None, batch_format="pyarrow")


# --------------------------------------------------------------------------
# daily-revenue autocorrelation (seasonality probe, lags 1..7)
# --------------------------------------------------------------------------

AC_MAX_LAG = 7


def revenue_autocorr(sf_dir: str) -> pa.Table:
    """(lag, n, r) — Pearson autocorrelation of the daily order-revenue
    series at calendar-day lags 1..``AC_MAX_LAG`` (pairs exist only
    where BOTH days have orders), the seasonality probe behind
    forecast/backfill decisions.  The heavy reduction (orders → one
    int-cent total per day) is distributed and exact; the day series
    is calendar-bounded (~2.4k rows), so the lag moments fold in ONE
    block with Python-int arithmetic (cents² sums exceed int64 —
    HUGEINT in the oracle), and r is the textbook integer-moment
    formula with the SAME final double expression on both sides."""
    od = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def pre(t: pa.Table):
        if len(t) == 0 or "o_orderdate" not in t.schema.names:
            return
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pa.table(
                {
                    "day": pa.array(us // 86_400_000_000),
                    "cents": pa.array(_i64(t.column("o_totalprice"), 100)),
                }
            )
            .group_by(["day"])
            .aggregate([("cents", "sum")])
        )
        yield g.rename_columns(["day", "cents"])

    daily = keyed_reagg(od.map_batches(pre, batch_format="pyarrow"),
                        ["day"], [("cents", "sum")], 4).repartition(1)

    def fold(t: pa.Table):
        if t.num_rows == 0 or "day" not in t.schema.names:
            return
        day = t.column("day").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(day)
        day, cents = day[order], cents[order]
        pos = {int(d): i for i, d in enumerate(day)}
        out_l, out_n, out_r = [], [], []
        for lag in range(1, AC_MAX_LAG + 1):
            xs, ys = [], []
            for i, d in enumerate(day):
                j = pos.get(int(d) + lag)
                if j is not None:
                    xs.append(int(cents[i]))
                    ys.append(int(cents[j]))
            n = len(xs)
            if n < 2:
                continue
            sx, sy = sum(xs), sum(ys)
            sxx = sum(v * v for v in xs)
            syy = sum(v * v for v in ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            va, vb = n * sxx - sx * sx, n * syy - sy * sy
            if va <= 0 or vb <= 0:
                continue
            out_l.append(lag)
            out_n.append(n)
            out_r.append(
                float(n * sxy - sx * sy) / math.sqrt(float(va) * float(vb))
            )
        if not out_l:
            return
        yield pa.table(
            {
                "lag": pa.array(out_l, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "r": pa.array(out_r, pa.float64()),
            }
        )

    return daily.map_batches(fold, batch_size=None, batch_format="pyarrow")


REVENUE_AUTOCORR_SQL = f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
l AS (SELECT unnest(range(1, {AC_MAX_LAG + 1})) AS lg),
p AS (
  SELECT l.lg, a.cents AS x, b.cents AS y
  FROM l CROSS JOIN d a JOIN d b ON b.day = a.day + l.lg
),
m AS (
  SELECT lg, CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
    SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
    SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM p GROUP BY lg
)
SELECT CAST(lg AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
           * CAST(n * syy - sy * sy AS DOUBLE)) AS r
FROM m
WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


# --------------------------------------------------------------------------
# z-order (Morton) layout buckets — space-filling-curve data clustering
# --------------------------------------------------------------------------

Z_BITS = 10
Z_BUCKET_SHIFT = 14  # 20-bit code >> 14 -> 64 buckets


def zorder_layout(sf_dir: str) -> ray.data.Dataset:
    """(bucket, n, min_x, max_x, min_y, max_y) — lineitem rows
    clustered by the Morton (z-order) interleave of
    (l_partkey mod 2^10, l_suppkey mod 2^10), bucketed by the code's
    top 6 bits: the space-filling-curve layout that gives a 100-TB
    table min/max-prunable files on BOTH dimensions at once (each
    bucket's x AND y ranges are tight, which no single-column sort
    achieves).  The per-bucket extents this emits are exactly the
    file-skipping statistics a reader would prune with.  Pure integer
    bit arithmetic, vectorized; block-local pre-agg to ≤64 groups,
    one tiny keyed re-agg."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    mask = (1 << Z_BITS) - 1

    def pre(t: pa.Table):
        if len(t) == 0 or "l_partkey" not in t.schema.names:
            return
        x = t.column("l_partkey").to_numpy(zero_copy_only=False) & mask
        y = t.column("l_suppkey").to_numpy(zero_copy_only=False) & mask
        z = np.zeros(len(x), np.int64)
        for i in range(Z_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        g = (
            pa.table(
                {
                    "bucket": pa.array(z >> Z_BUCKET_SHIFT),
                    "n": pa.array(np.ones(len(x), np.int64)),
                    "min_x": pa.array(x), "max_x": pa.array(x),
                    "min_y": pa.array(y), "max_y": pa.array(y),
                }
            )
            .group_by(["bucket"])
            .aggregate(
                [("n", "sum"), ("min_x", "min"), ("max_x", "max"),
                 ("min_y", "min"), ("max_y", "max")]
            )
        )
        yield g.rename_columns(["bucket", "n", "min_x", "max_x", "min_y", "max_y"])

    return keyed_reagg(
        li.map_batches(pre, batch_format="pyarrow"),
        ["bucket"],
        [("n", "sum"), ("min_x", "min"), ("max_x", "max"),
         ("min_y", "min"), ("max_y", "max")],
        4,
    )


_ZTERMS = " + ".join(
    f"((x // {1 << i}) % 2) * {1 << (2 * i)}"
    f" + ((y // {1 << i}) % 2) * {1 << (2 * i + 1)}"
    for i in range(Z_BITS)
)

ZORDER_LAYOUT_SQL = f"""
WITH s AS (
  SELECT l_partkey % {1 << Z_BITS} AS x, l_suppkey % {1 << Z_BITS} AS y
  FROM lineitem
),
z AS (SELECT x, y, ({_ZTERMS}) // {1 << Z_BUCKET_SHIFT} AS bucket FROM s)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
  CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
FROM z GROUP BY bucket
"""


# --------------------------------------------------------------------------
# interval-overlap self-join (concurrent orders per customer)
# --------------------------------------------------------------------------

CONC_WINDOW_DAYS = 30


def concurrent_orders(sf_dir: str) -> ray.data.Dataset:
    """(c_custkey, n_pairs) — pairs of a customer's orders whose
    ``CONC_WINDOW_DAYS``-day service windows overlap (|day₁ − day₂| ≤
    W): the interval-overlap self-join every ops/billing pipeline
    needs, done as a per-key sweep instead of the quadratic blow-up a
    naive self-join produces.  One repartition co-locates each
    customer; the block kernel sorts each group's day vector once and
    counts window-mates with a vectorized searchsorted (O(n log n) per
    group vs O(n²)); per-customer counts are exact ints."""
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def pre(t: pa.Table):
        if len(t) == 0 or "o_custkey" not in t.schema.names:
            return
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        yield pa.table(
            {
                "c": t.column("o_custkey"),
                "day": pa.array(us // 86_400_000_000),
            }
        )

    co = od.map_batches(pre, batch_format="pyarrow").repartition(
        P, keys=["c"]
    )

    def sweep(t: pa.Table):
        if t.num_rows == 0 or "c" not in t.schema.names:
            return
        c = t.column("c").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, c))
        c, day = c[order], day[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        lens = np.diff(np.r_[starts, len(c)])
        # for each position i: mates = i − first index ≥ day[i] − W
        lo = np.empty(len(day), np.int64)
        for s, ln in zip(starts, lens):
            seg = day[s:s + ln]
            lo[s:s + ln] = np.searchsorted(
                seg, seg - CONC_WINDOW_DAYS, side="left"
            )
        idx_in_seg = np.arange(len(day)) - np.repeat(starts, lens)
        mates = idx_in_seg - lo
        g = (
            pa.table(
                {
                    "c_custkey": pa.array(c),
                    "n_pairs": pa.array(mates.astype(np.int64)),
                }
            )
            .group_by(["c_custkey"])
            .aggregate([("n_pairs", "sum")])
        )
        out = g.rename_columns(["c_custkey", "n_pairs"])
        out = out.filter(pc.greater(out.column("n_pairs"), 0))
        if out.num_rows:
            yield out

    return co.map_batches(sweep, batch_size=None, batch_format="pyarrow")


CONCURRENT_ORDERS_SQL = f"""
WITH o AS (
  SELECT o_custkey AS c, o_orderkey AS k,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
)
SELECT a.c AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM o a JOIN o b
  ON a.c = b.c AND a.k < b.k
  AND abs(a.day - b.day) <= {CONC_WINDOW_DAYS}
GROUP BY a.c
"""


def value_ecdf(sf_dir: str) -> ray.data.Dataset:
    """(event_id, value_cents, n_le) — the exact empirical CDF rank of
    every event's value: n_le = #events with value_cents ≤ mine — the
    quantile-normalization / probability-integral-transform feature
    map (divide by the total for the ecdf; the rank itself stays
    integer so the hash match is exact).

    Scale shape: pass 1 reduces a (cents → count) histogram
    (value-DOMAIN-bounded: cents of a bounded price range saturate, so
    the broadcast stays small as rows grow; an open domain would swap
    in the pack_sequences bucket-prefix machinery); the sorted
    cumulative counts broadcast in the closure; pass 2 is block-local
    searchsorted — zero row shuffle."""

    def hist(t: pa.Table):
        if len(t) == 0:
            return
        vc = _i64(t.column("value"), 100)
        g = (
            pa.table(
                {"vc": pa.array(vc), "c": pa.array(np.ones(len(vc), np.int64))}
            )
            .group_by(["vc"])
            .aggregate([("c", "sum")])
        )
        yield g.rename_columns(["vc", "c"])

    src = _read(sf_dir, "events", ["event_id", "value"])
    rows = keyed_reagg(
        src.map_batches(hist, batch_format="pyarrow"), ["vc"], [("c", "sum")], P
    ).take_all()  # distinct-cents-bounded
    vals = np.array(sorted(int(r["vc"]) for r in rows), np.int64)
    cnts = {int(r["vc"]): int(r["c"]) for r in rows}
    cum = np.cumsum(np.array([cnts[v] for v in vals], np.int64))

    def score(t: pa.Table):
        if len(t) == 0:
            return
        vc = _i64(t.column("value"), 100)
        idx = np.searchsorted(vals, vc, side="right") - 1
        yield pa.table(
            {
                "event_id": t.column("event_id"),
                "value_cents": pa.array(vc),
                "n_le": pa.array(cum[idx]),
            }
        )

    return src.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Hierarchy rollup — recursive subtree aggregation without recursion
# --------------------------------------------------------------------------

HR_MAX_DEPTH = 40  # SQL unnests k = 0..39; covers part keys < 2^39


def hierarchy_rollup(sf_dir: str) -> ray.data.Dataset:
    """(node, subtree_cents, n_desc) — BOM-style subtree totals over
    the implicit binary part hierarchy ``parent(h) = h >> 1`` with
    ``h = p_partkey + 1`` (the +1 keeps 0 out of the id space, whose
    ancestor chain would never terminate): every part contributes its
    retail price (snapped to cents, the relational.py fixed-point
    rule) to itself and every ancestor up to the root 1.

    The point of the op: a recursive-CTE rollup shape (explode each
    leaf's ancestor PATH, then one keyed sum) executed with ZERO joins
    and ZERO rounds — ancestors of an arithmetic hierarchy are
    computable per row (``h >> k``), so the whole rollup is a
    vectorized ≤ log₂(max_key)-way block-local expansion + per-block
    pre-combine + ONE keyed re-agg.  The same routing serves any
    hierarchy whose ancestor chain ships WITH the row (materialized
    path / dotted-category ids), the common case in catalog data.

    Scale shape: expansion factor is exactly depth ≈ log₂ |parts|
    (never quadratic); the shuffle carries (node, cents, 1) int64
    triples; output is ≤ 2·|parts| rows."""
    src = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def expand(t: pa.Table):
        if len(t) == 0:
            return
        h = t.column("p_partkey").to_numpy(zero_copy_only=False) + 1
        cents = np.rint(
            t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        nodes, vals = [], []
        v = h.astype(np.int64)
        for _ in range(HR_MAX_DEPTH):
            m = v >= 1
            if not m.any():
                break
            nodes.append(v[m])
            vals.append(cents[m])
            v = v >> 1
        node = np.concatenate(nodes)
        val = np.concatenate(vals)
        g = (
            pa.table(
                {
                    "node": pa.array(node),
                    "subtree_cents": pa.array(val),
                    "n_desc": pa.array(np.ones(len(node), np.int64)),
                }
            )
            .group_by(["node"])
            .aggregate([("subtree_cents", "sum"), ("n_desc", "sum")])
        )
        yield g.rename_columns(["node", "subtree_cents", "n_desc"])

    return keyed_reagg(
        src.map_batches(expand, batch_format="pyarrow"),
        ["node"], [("subtree_cents", "sum"), ("n_desc", "sum")], P,
    )


HIERARCHY_ROLLUP_SQL = f"""
WITH anc AS (
  SELECT (p_partkey + 1) >> CAST(k AS BIGINT) AS node,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
  FROM part, UNNEST(range({HR_MAX_DEPTH})) t(k)
  WHERE ((p_partkey + 1) >> CAST(k AS BIGINT)) >= 1
)
SELECT node, CAST(SUM(cents) AS BIGINT) AS subtree_cents,
       CAST(COUNT(*) AS BIGINT) AS n_desc
FROM anc GROUP BY node
"""


# --------------------------------------------------------------------------
# Zone-map prune stats — data-layout effectiveness diagnostics
# --------------------------------------------------------------------------

ZM_TILE = 1024           # rows per zone-map tile (row-group analogue)
ZM_LO = "1995-06-01"     # pinned ship-date window [lo, hi)
ZM_HI = "1995-09-01"
ZM_NAT_SPAN = 64         # orderkey span per rank bucket (natural layout)
ZM_DAY_SPAN = 32         # days per rank bucket (shipdate layout)
_US_PER_DAY = 86_400_000_000


def zonemap_prune_stats(sf_dir: str) -> ray.data.Dataset:
    """(layout, tiles_total, tiles_pruned, rows_pruned) — how many
    fixed-size zone-map tiles (``ZM_TILE`` rows, the row-group
    analogue) a ship-date window scan could SKIP under two physical
    layouts of lineitem: ``natural`` (sorted by the (l_orderkey,
    l_linenumber) key — insert order) and ``shipdate`` (re-clustered
    by (l_shipdate, l_orderkey, l_linenumber)).  A tile is pruned when
    its [min, max] ship-date zone map misses the pinned window — the
    measurement that justifies a re-clustering / Z-order pass before a
    100-TB scan workload (compare zorder_layout, which produces the
    layout; this op scores one).

    Scale shape (per layout): global rank is the pack_sequences
    two-level scan — a monotone bucket key derived from the sort-key
    prefix (orderkey // span, resp. day // span), per-bucket totals
    folded once on the driver (bucket-count rows, never data rows),
    ONE bucket-keyed repartition, then vectorized within-bucket rank +
    tile assignment; per-tile (min, max, count) partials ride one
    tile-keyed re-agg, and the final classification folds tile-count
    rows.  No global sort ever runs."""
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"]
    )
    lo_us = int(np.datetime64(ZM_LO, "us").astype(np.int64))
    hi_us = int(np.datetime64(ZM_HI, "us").astype(np.int64))

    out_rows = []
    for layout in ("natural", "shipdate"):

        def keyed(t: pa.Table, layout=layout):
            if len(t) == 0:
                return
            ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            ln = t.column("l_linenumber").to_numpy(
                zero_copy_only=False).astype(np.int64)
            d = (
                t.column("l_shipdate")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            b = (
                ok // ZM_NAT_SPAN
                if layout == "natural"
                else d // (_US_PER_DAY * ZM_DAY_SPAN)
            )
            yield pa.table(
                {"b": pa.array(b), "ok": pa.array(ok),
                 "ln": pa.array(ln), "d": pa.array(d)}
            )

        keyed_ds = li.map_batches(keyed, batch_format="pyarrow")

        def pre(t: pa.Table):
            if len(t) == 0 or "b" not in t.schema.names:
                return
            g = (
                t.select(["b"])
                .append_column("n", _ones(len(t)))
                .group_by(["b"])
                .aggregate([("n", "sum")])
            )
            yield g.rename_columns(["b", "n"])

        sums = keyed_reagg(
            keyed_ds.map_batches(pre, batch_format="pyarrow"),
            ["b"], [("n", "sum")], P,
        ).take_all()  # ≤ bucket-count rows
        sums.sort(key=lambda r: r["b"])
        offsets: dict[int, int] = {}
        run = 0
        for r in sums:
            offsets[r["b"]] = run
            run += int(r["n"])

        co = keyed_ds.repartition(P, keys=["b"])

        def assign(t: pa.Table, layout=layout, offsets=offsets):
            if t.num_rows == 0 or "b" not in t.schema.names:
                return
            b = t.column("b").to_numpy(zero_copy_only=False)
            ok = t.column("ok").to_numpy(zero_copy_only=False)
            ln = t.column("ln").to_numpy(zero_copy_only=False)
            d = t.column("d").to_numpy(zero_copy_only=False)
            order = (
                np.lexsort((ln, ok, b))
                if layout == "natural"
                else np.lexsort((ln, ok, d, b))
            )
            b, d = b[order], d[order]
            starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
            local = np.arange(len(b), dtype=np.int64) - np.repeat(
                starts, np.diff(np.r_[starts, len(b)])
            )
            off = np.fromiter((offsets[x] for x in b), np.int64, len(b))
            tile = (off + local) // ZM_TILE
            g = (
                pa.table(
                    {
                        "tile": pa.array(tile),
                        "lo": pa.array(d),
                        "hi": pa.array(d),
                        "n": _ones(len(d)),
                    }
                )
                .group_by(["tile"])
                .aggregate([("lo", "min"), ("hi", "max"), ("n", "sum")])
            )
            yield g.rename_columns(["tile", "lo", "hi", "n"])

        tiles = keyed_reagg(
            co.map_batches(assign, batch_size=None, batch_format="pyarrow"),
            ["tile"], [("lo", "min"), ("hi", "max"), ("n", "sum")], P,
        )

        def cls(t: pa.Table):
            if t.num_rows == 0 or "lo" not in t.schema.names:
                return
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            pruned = (hi < lo_us) | (lo >= hi_us)
            yield pa.table(
                {
                    "tiles_total": pa.array([len(lo)], pa.int64()),
                    "tiles_pruned": pa.array(
                        [int(pruned.sum())], pa.int64()),
                    "rows_pruned": pa.array(
                        [int(n[pruned].sum())], pa.int64()),
                }
            )

        tot = [0, 0, 0]
        for r in tiles.map_batches(cls, batch_format="pyarrow").take_all():
            tot[0] += r["tiles_total"]
            tot[1] += r["tiles_pruned"]
            tot[2] += r["rows_pruned"]
        out_rows.append((layout, tot[0], tot[1], tot[2]))

    return ray.data.from_arrow(
        pa.table(
            {
                "layout": pa.array([r[0] for r in out_rows]),
                "tiles_total": pa.array(
                    [r[1] for r in out_rows], pa.int64()),
                "tiles_pruned": pa.array(
                    [r[2] for r in out_rows], pa.int64()),
                "rows_pruned": pa.array(
                    [r[3] for r in out_rows], pa.int64()),
            }
        )
    )


ZONEMAP_PRUNE_SQL = f"""
WITH nat AS (
  SELECT l_shipdate AS d,
    (ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
      // {ZM_TILE} AS tile
  FROM lineitem
),
shp AS (
  SELECT l_shipdate AS d,
    (ROW_NUMBER() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) - 1)
      // {ZM_TILE} AS tile
  FROM lineitem
),
tn AS (SELECT tile, MIN(d) AS lo, MAX(d) AS hi, COUNT(*) AS n
       FROM nat GROUP BY tile),
ts AS (SELECT tile, MIN(d) AS lo, MAX(d) AS hi, COUNT(*) AS n
       FROM shp GROUP BY tile),
cls AS (
  SELECT 'natural' AS layout, CAST(COUNT(*) AS BIGINT) AS tiles_total,
    CAST(SUM(CASE WHEN hi < TIMESTAMP '{ZM_LO}'
                    OR lo >= TIMESTAMP '{ZM_HI}'
             THEN 1 ELSE 0 END) AS BIGINT) AS tiles_pruned,
    CAST(SUM(CASE WHEN hi < TIMESTAMP '{ZM_LO}'
                    OR lo >= TIMESTAMP '{ZM_HI}'
             THEN n ELSE 0 END) AS BIGINT) AS rows_pruned
  FROM tn
  UNION ALL
  SELECT 'shipdate', CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN hi < TIMESTAMP '{ZM_LO}'
                    OR lo >= TIMESTAMP '{ZM_HI}'
             THEN 1 ELSE 0 END) AS BIGINT),
    CAST(SUM(CASE WHEN hi < TIMESTAMP '{ZM_LO}'
                    OR lo >= TIMESTAMP '{ZM_HI}'
             THEN n ELSE 0 END) AS BIGINT)
  FROM ts
)
SELECT layout, tiles_total, tiles_pruned, rows_pruned FROM cls
"""


# --------------------------------------------------------------------------
# Theil–Sen robust trend + Mann–Kendall S over the daily revenue series
# --------------------------------------------------------------------------

TS_SCALE = 10**6          # slope quantized to micro-cents/day
TS_OFF = 1 << 31          # |Δvalue| guard: keeps every // numerator ≥ 0


def revenue_theil_sen(sf_dir: str) -> ray.data.Dataset:
    """One row (n_days, n_pairs, theil_sen_q, mk_s) — the Theil–Sen
    median slope (Theil 1950 / Sen 1968) and Mann–Kendall trend
    statistic S = Σ sign(Δv) of the DAILY order-revenue series
    (o_orderdate, Σ o_totalprice in cents): the outlier-robust trend
    check next to the OLS in event_value_regression.

    Exactness: pair slope quantized as ``⌊1e6·Δv/Δd⌋`` computed with
    the offset identity ``((Δv + OFF·Δd)·1e6) // Δd − OFF·1e6`` so
    every floor-division numerator is NON-NEGATIVE — DuckDB's ``//``
    truncates toward zero while numpy floors, so negative numerators
    are banned outright (raises if |Δv| ≥ OFF); the median of the
    sorted slope multiset is ``(s_((n−1)//2) + s_(n//2))·… same offset
    trick … // 2`` — pure integers end to end, bit-identical in SQL.

    Scale shape: the only reduce is day-keyed (the open_orders knot
    rule: days are a BOUNDED dimension — a decade is 3.7k rows no
    matter the corpus size); the O(days²) pair fold runs vectorized on
    the driver over that bounded table, never over corpus rows."""

    def pre(t: pa.Table):
        if len(t) == 0 or "o_orderdate" not in t.schema.names:
            return
        g = pa.table(
            {
                "day": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), _DAY_US
                ),
                "vc": pa.array(_i64(t.column("o_totalprice"), 100)),
            }
        ).group_by(["day"]).aggregate([("vc", "sum")])
        yield g.rename_columns(["day", "vc"])

    rows = keyed_reagg(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["day"], [("vc", "sum")], P,
    ).take_all()  # bounded by the calendar, never by corpus rows
    d = np.array(sorted(r["day"] for r in rows), np.int64)
    by = {r["day"]: r["vc"] for r in rows}
    v = np.array([by[x] for x in d], np.int64)
    n = len(d)
    iu, ju = np.triu_indices(n, k=1)
    dv = v[ju] - v[iu]
    dd = d[ju] - d[iu]  # > 0 by sort
    if len(dv) and int(np.abs(dv).max()) >= TS_OFF:
        raise OverflowError("revenue_theil_sen: |Δv| exceeds the offset guard")
    sq = (dv + TS_OFF * dd) * TS_SCALE // dd - TS_OFF * TS_SCALE
    sq.sort()
    npairs = len(sq)
    med = (
        int(sq[(npairs - 1) // 2])
        + int(sq[npairs // 2])
        + 2 * TS_OFF * TS_SCALE
    ) // 2 - TS_OFF * TS_SCALE
    mk_s = int(np.sign(dv).sum())
    return ray.data.from_arrow(
        pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "n_pairs": pa.array([npairs], pa.int64()),
                "theil_sen_q": pa.array([med], pa.int64()),
                "mk_s": pa.array([mk_s], pa.int64()),
            }
        )
    )


REVENUE_THEIL_SEN_SQL = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM orders GROUP BY 1
),
pr AS (
  SELECT b.vc - a.vc AS dv, b.day - a.day AS dd
  FROM daily a JOIN daily b ON b.day > a.day
),
sl AS (
  SELECT ((dv + {TS_OFF} * dd) * {TS_SCALE}) // dd
           - CAST({TS_OFF} AS BIGINT) * {TS_SCALE} AS sq,
    CAST(SIGN(dv) AS BIGINT) AS sg
  FROM pr
),
rk AS (SELECT sq, ROW_NUMBER() OVER (ORDER BY sq) AS rn FROM sl),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM sl),
r1 AS (SELECT sq FROM rk, tot WHERE rn = (np - 1) // 2 + 1),
r2 AS (SELECT sq FROM rk, tot WHERE rn = np // 2 + 1),
med AS (
  SELECT (r1.sq + r2.sq + 2 * CAST({TS_OFF} AS BIGINT) * {TS_SCALE}) // 2
           - CAST({TS_OFF} AS BIGINT) * {TS_SCALE} AS m
  FROM r1, r2
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
  (SELECT np FROM tot) AS n_pairs,
  CAST(med.m AS BIGINT) AS theil_sen_q,
  (SELECT CAST(SUM(sg) AS BIGINT) FROM sl) AS mk_s
FROM med
"""


# --------------------------------------------------------------------------
# Holt double-exponential smoothing over the daily revenue series
# --------------------------------------------------------------------------

HOLT_OFF = 1 << 40  # offset (divisible by 4) for floor-division parity


def holt_daily_revenue(sf_dir: str) -> ray.data.Dataset:
    """(rnk, day, vc, level_q, trend_q, forecast_q) — Holt's linear
    double-exponential smoothing (Holt 1957) of the daily order-revenue
    series, the streaming trend-following smoother next to the robust
    Theil–Sen estimate.  α = β = 1/4 restated as PURE-INTEGER floor
    recurrences over the day-ordered observations::

        level_t = ⌊(vc_t + 3·(level_{t−1} + trend_{t−1})) / 4⌋
        trend_t = ⌊((level_t − level_{t−1}) + 3·trend_{t−1}) / 4⌋

    (level_1 = vc_1, trend_1 = 0; forecast_q = level + trend).  Both
    floors go through the offset identity ``(x + OFF)//4 − OFF//4``
    because trends go negative and DuckDB's ``//`` truncates toward
    zero while Python floors (the revenue_theil_sen rule); the oracle
    replays the chain as a rank-recursive CTE.

    Scale shape: ONE day-keyed reduce (the bounded-calendar knot rule);
    the recurrence is inherently sequential but runs over that bounded
    knot table on the driver — never over corpus rows."""

    def pre(t: pa.Table):
        if len(t) == 0 or "o_orderdate" not in t.schema.names:
            return
        g = pa.table(
            {
                "day": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), _DAY_US
                ),
                "vc": pa.array(_i64(t.column("o_totalprice"), 100)),
            }
        ).group_by(["day"]).aggregate([("vc", "sum")])
        yield g.rename_columns(["day", "vc"])

    rows = keyed_reagg(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["day"], [("vc", "sum")], P,
    ).take_all()  # bounded by the calendar, never by corpus rows
    rows.sort(key=lambda r: r["day"])

    def ediv4(x: int) -> int:
        if abs(x) >= HOLT_OFF:
            raise OverflowError("holt_daily_revenue: offset guard exceeded")
        return (x + HOLT_OFF) // 4 - HOLT_OFF // 4

    days, vcs, lvl, trd, fct = [], [], [], [], []
    level = trend = 0
    for i, r in enumerate(rows):
        vc = int(r["vc"])
        if i == 0:
            level, trend = vc, 0
        else:
            prev = level
            level = ediv4(vc + 3 * (level + trend))
            trend = ediv4((level - prev) + 3 * trend)
        days.append(int(r["day"]))
        vcs.append(vc)
        lvl.append(level)
        trd.append(trend)
        fct.append(level + trend)
    return ray.data.from_arrow(
        pa.table(
            {
                "rnk": pa.array(
                    np.arange(1, len(days) + 1, dtype=np.int64)
                ),
                "day": pa.array(days, pa.int64()),
                "vc": pa.array(vcs, pa.int64()),
                "level_q": pa.array(lvl, pa.int64()),
                "trend_q": pa.array(trd, pa.int64()),
                "forecast_q": pa.array(fct, pa.int64()),
            }
        )
    )


HOLT_DAILY_REVENUE_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM orders GROUP BY 1
),
rk AS (
  SELECT day, vc,
    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rnk
  FROM daily
),
holt AS (
  SELECT rnk, day, vc, vc AS level_q, CAST(0 AS BIGINT) AS trend_q
  FROM rk WHERE rnk = 1
  UNION ALL
  SELECT r.rnk, r.day, r.vc,
    (r.vc + 3 * (h.level_q + h.trend_q) + {HOLT_OFF}) // 4
      - {HOLT_OFF // 4},
    (((r.vc + 3 * (h.level_q + h.trend_q) + {HOLT_OFF}) // 4
        - {HOLT_OFF // 4}) - h.level_q + 3 * h.trend_q + {HOLT_OFF}) // 4
      - {HOLT_OFF // 4}
  FROM holt h JOIN rk r ON r.rnk = h.rnk + 1
)
SELECT rnk, day, vc, level_q, trend_q,
  CAST(level_q + trend_q AS BIGINT) AS forecast_q
FROM holt
"""


# --------------------------------------------------------------------------
# k-anonymity audit over a quasi-identifier combination
# --------------------------------------------------------------------------

KANON_K = 8  # sf0.01's smallest QI group is 5 — k=5 would be degenerate


def k_anonymity_audit(sf_dir: str) -> ray.data.Dataset:
    """One row (k, n_groups, n_rows, violating_groups, violating_rows,
    suppression_ppm) — the k-anonymity audit (Sweeney 2002) of the
    customer table under the quasi-identifier (c_nationkey,
    c_mktsegment): how many equivalence classes are smaller than
    ``KANON_K`` and what fraction of rows would need suppression
    before a release.  suppression_ppm = violating_rows·10⁶ //
    n_rows — non-negative floor division, identical in DuckDB.

    Scale shape: block-local QI group_by partials, ONE QI-keyed
    re-agg (groups bounded by the QI domain, never corpus rows), then
    a single-block scalar fold."""

    def pre(t: pa.Table):
        if len(t) == 0 or "c_nationkey" not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "nk": pc.cast(t.column("c_nationkey"), pa.int64()),
                    "seg": t.column("c_mktsegment"),
                    "n": _ones(len(t)),
                }
            ).group_by(["nk", "seg"]).aggregate([("n", "sum")])
        )
        yield g.rename_columns(["nk", "seg", "n"])

    grp = keyed_reagg(
        _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["nk", "seg"], [("n", "sum")], P,
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        viol = n < KANON_K
        n_rows = int(n.sum())
        vr = int(n[viol].sum())
        yield pa.table(
            {
                "k": pa.array([KANON_K], pa.int64()),
                "n_groups": pa.array([len(n)], pa.int64()),
                "n_rows": pa.array([n_rows], pa.int64()),
                "violating_groups": pa.array([int(viol.sum())], pa.int64()),
                "violating_rows": pa.array([vr], pa.int64()),
                "suppression_ppm": pa.array(
                    [vr * 10**6 // n_rows], pa.int64()
                ),
            }
        )

    return grp.repartition(1).map_batches(
        fold, batch_size=None, batch_format="pyarrow"
    )


K_ANONYMITY_AUDIT_SQL = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
)
SELECT CAST({KANON_K} AS BIGINT) AS k,
  CAST(COUNT(*) AS BIGINT) AS n_groups,
  CAST(SUM(n) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN n < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
    AS violating_groups,
  CAST(SUM(CASE WHEN n < {KANON_K} THEN n ELSE 0 END) AS BIGINT)
    AS violating_rows,
  CAST(SUM(CASE WHEN n < {KANON_K} THEN n ELSE 0 END) * 1000000
         // SUM(n) AS BIGINT) AS suppression_ppm
FROM g
"""


# --------------------------------------------------------------------------
# CUSUM change-point trace over the daily revenue series
# --------------------------------------------------------------------------


def cusum_daily_revenue(sf_dir: str) -> ray.data.Dataset:
    """(rnk, day, vc, cusum_q) — one-sided CUSUM change-point trace
    (Page 1954) of the daily order-revenue series with allowance
    k = μ/2: the upward-shift detector a pipeline runs over ingest
    volumes.  PURE INTEGER by scaling deviations by 2n::

        dev_t   = 2n·vc_t − 3·Σvc          (= 2n·(vc_t − 1.5·μ))
        cusum_t = max(0, cusum_{t−1} + dev_t)

    — no float and no floor division anywhere, so the rank-recursive
    CTE oracle is trivially bit-exact.  Scale shape: ONE day-keyed
    reduce (bounded calendar), sequential recurrence over the knot
    table on the driver."""

    def pre(t: pa.Table):
        if len(t) == 0 or "o_orderdate" not in t.schema.names:
            return
        g = pa.table(
            {
                "day": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), _DAY_US
                ),
                "vc": pa.array(_i64(t.column("o_totalprice"), 100)),
            }
        ).group_by(["day"]).aggregate([("vc", "sum")])
        yield g.rename_columns(["day", "vc"])

    rows = keyed_reagg(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["day"], [("vc", "sum")], P,
    ).take_all()
    rows.sort(key=lambda r: r["day"])
    n = len(rows)
    total = sum(int(r["vc"]) for r in rows)
    days, vcs, cus = [], [], []
    c = 0
    for r in rows:
        vc = int(r["vc"])
        c = max(0, c + 2 * n * vc - 3 * total)
        days.append(int(r["day"]))
        vcs.append(vc)
        cus.append(c)
    return ray.data.from_arrow(
        pa.table(
            {
                "rnk": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "day": pa.array(days, pa.int64()),
                "vc": pa.array(vcs, pa.int64()),
                "cusum_q": pa.array(cus, pa.int64()),
            }
        )
    )


CUSUM_DAILY_REVENUE_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM orders GROUP BY 1
),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(vc) AS BIGINT) AS total FROM daily),
rk AS (
  SELECT day, vc,
    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rnk
  FROM daily
),
cus AS (
  SELECT r.rnk, r.day, r.vc,
    GREATEST(CAST(0 AS BIGINT), 2 * st.n * r.vc - 3 * st.total) AS cusum_q
  FROM rk r, st WHERE r.rnk = 1
  UNION ALL
  SELECT r.rnk, r.day, r.vc,
    GREATEST(CAST(0 AS BIGINT),
             c.cusum_q + 2 * st.n * r.vc - 3 * st.total)
  FROM cus c JOIN rk r ON r.rnk = c.rnk + 1, st
)
SELECT rnk, day, vc, cusum_q FROM cus
"""


def weekday_seasonality(sf_dir: str) -> ray.data.Dataset:
    """(dow, n_days, revenue_cents, idx_ppm) — day-of-week seasonal
    index of the daily order-revenue series: mean daily revenue of
    each weekday relative to the overall daily mean, the additive
    seasonal-profile step of an STL-style decomposition restated
    PURE-INTEGER::

        idx_ppm = (rv_dow · n_days_total · 10⁶) // (nd_dow · rv_total)

    with the wide product held in Python ints / HUGEINT only (the
    Q11 overflow rule).  dow = (epoch_day + 4) % 7 (0 = Sunday).
    Scale shape: ONE day-keyed reduce (bounded by the calendar), then
    a 7-row fold on the driver."""

    def pre(t: pa.Table):
        if len(t) == 0 or "o_orderdate" not in t.schema.names:
            return
        g = pa.table(
            {
                "day": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), _DAY_US
                ),
                "vc": pa.array(_i64(t.column("o_totalprice"), 100)),
            }
        ).group_by(["day"]).aggregate([("vc", "sum")])
        yield g.rename_columns(["day", "vc"])

    rows = keyed_reagg(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["day"], [("vc", "sum")], P,
    ).take_all()
    n_total = len(rows)
    rv_total = sum(int(r["vc"]) for r in rows)
    nd = [0] * 7
    rv = [0] * 7
    for r in rows:
        w = (int(r["day"]) + 4) % 7
        nd[w] += 1
        rv[w] += int(r["vc"])
    dows = [w for w in range(7) if nd[w] > 0]
    return ray.data.from_arrow(
        pa.table(
            {
                "dow": pa.array(dows, pa.int64()),
                "n_days": pa.array([nd[w] for w in dows], pa.int64()),
                "revenue_cents": pa.array([rv[w] for w in dows], pa.int64()),
                "idx_ppm": pa.array(
                    [
                        rv[w] * n_total * 10**6 // (nd[w] * rv_total)
                        for w in dows
                    ],
                    pa.int64(),
                ),
            }
        )
    )


WEEKDAY_SEASONALITY_SQL = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(vc) AS BIGINT) AS total FROM daily),
byw AS (
  SELECT (day + 4) % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(vc) AS BIGINT) AS revenue_cents
  FROM daily GROUP BY 1
)
SELECT dow, n_days, revenue_cents,
  CAST(CAST(revenue_cents AS HUGEINT) * tot.n * 1000000
       // (CAST(n_days AS HUGEINT) * tot.total) AS BIGINT) AS idx_ppm
FROM byw, tot ORDER BY dow
"""


# --------------------------------------------------------------------------
# Incremental view maintenance of a JOIN view (bilinear delta rule)
# --------------------------------------------------------------------------

IVM_J_INS = 0    # orders with splitmix64(o_orderkey) % 10 == 0: CDC inserts
IVM_J_DEL = 1    # orders with splitmix64(o_orderkey) % 10 == 1: CDC deletes
IVM_J_LMOD = 8   # lineitems with splitmix64(8k+ln) % 8 == 0: CDC inserts


def ivm_join_revenue(sf_dir: str) -> ray.data.Dataset:
    """(o_orderpriority, n, sum_revi) — a JOIN view (revenue per order
    priority over orders ⋈ lineitem) MAINTAINED under CDC deltas on
    BOTH join sides via the bilinear delta rule

        Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB

    — the incremental refresh that, at 100 TB, joins only the small
    delta batches against the other side instead of recomputing.
    Orders are split by splitmix64(o_orderkey) % 10 into delta inserts
    (0), delta deletes (1, sign −1) and base; lineitems by
    splitmix64(8·l_orderkey + l_linenumber) % 8 into delta inserts (0)
    and base.  Each order carries (b, s) presence/delta signs; each
    per-orderkey lineitem partial carries (b, s); the maintained
    coefficient of a pair is (b_o+s_o)(b_l+s_l), expanded into the
    four signed IVM terms engine-side.  Counts and integer-cent
    revenue form an abelian group, so the merged state equals the SQL
    oracle's full recompute over surviving rows; groups whose count
    hits zero are retracted.

    Scale shape: lineitem reduces to per-(orderkey, side) partials
    BEFORE the join; one orderkey-keyed join; one |priorities|-bounded
    re-agg."""
    from .sketch import splitmix64

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def o_pre(t: pa.Table):
        if len(t) == 0 or "o_orderkey" not in t.schema.names:
            return
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        z = splitmix64(k.astype(np.uint64)) % np.uint64(10)
        bo = (z != IVM_J_INS).astype(np.int64)
        so = np.where(
            z == IVM_J_INS, 1, np.where(z == IVM_J_DEL, -1, 0)
        ).astype(np.int64)
        yield pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "prio": t.column("o_orderpriority"),
                "bo": pa.array(bo),
                "so": pa.array(so),
            }
        )

    o = orders.map_batches(o_pre, batch_format="pyarrow")

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )

    def l_pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = t.column("l_linenumber").to_numpy(zero_copy_only=False)
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        with np.errstate(over="ignore"):
            z = splitmix64(
                k.astype(np.uint64) * np.uint64(IVM_J_LMOD)
                + ln.astype(np.uint64)
            ) % np.uint64(IVM_J_LMOD)
        g = (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "w": pa.array((z == 0).astype(np.int64)),
                    "n": pa.array(np.ones(len(t), np.int64)),
                    "rev": pa.array(price_c * (100 - disc_b)),
                }
            )
            .group_by(["l_orderkey", "w"])
            .aggregate([("n", "sum"), ("rev", "sum")])
        )
        yield g.rename_columns(["l_orderkey", "w", "n", "rev"])

    lp = keyed_reagg(
        li.map_batches(l_pre, batch_format="pyarrow"),
        ["l_orderkey", "w"], [("n", "sum"), ("rev", "sum")], P,
    )

    j = join_auto(lp, o, on=("l_orderkey",), right_on=("o_orderkey",),
                  num_partitions=P)

    def terms(t: pa.Table):
        if t.num_rows == 0 or "bo" not in t.schema.names:
            return
        bo = t.column("bo").to_numpy(zero_copy_only=False)
        so = t.column("so").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        bl = (w == 0).astype(np.int64)
        sl = (w == 1).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False)
        rev = t.column("rev").to_numpy(zero_copy_only=False)
        prio = t.column("prio")
        outs = []
        # the four IVM terms, each a signed partial
        for c in (bo * bl, bo * sl, so * bl, so * sl):
            keep = c != 0
            if not keep.any():
                continue
            outs.append(
                pa.table(
                    {
                        "prio": prio.filter(pa.array(keep)),
                        "n": pa.array(c[keep] * n[keep]),
                        "rev": pa.array(c[keep] * rev[keep]),
                    }
                )
            )
        if not outs:
            return
        g = (
            pa.concat_tables(outs)
            .group_by(["prio"])
            .aggregate([("n", "sum"), ("rev", "sum")])
        )
        yield g.rename_columns(["prio", "n", "rev"])

    merged = keyed_reagg(
        j.map_batches(terms, batch_format="pyarrow"),
        ["prio"], [("n", "sum"), ("rev", "sum")], 4,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        t = t.filter(pc.greater(t.column("n"), 0))  # group retraction
        if t.num_rows:
            yield t.rename_columns(["o_orderpriority", "n", "sum_revi"])

    return merged.map_batches(fin, batch_size=None, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SCD2 (slowly-changing-dimension type 2) interval build
# --------------------------------------------------------------------------

SCD2_OPEN_US = 1 << 62   # sentinel valid_to for the current (open) row


def _scd2_interval_arrays(t: pa.Table):
    """Shared SCD2 interval build (scd2_user_state AND
    user_state_at_day — ONE definition of the tiebreak/sentinel):
    events (user_id, ts_us, event_id, state) → change-point arrays
    (cu, cts, cst, vto) sorted by (user, ts, event_id), with vto =
    next change's ts within the user, else the SCD2_OPEN_US
    sentinel."""
    u = t.column("user_id").to_numpy(zero_copy_only=False)
    ts = t.column("ts_us").to_numpy(zero_copy_only=False)
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    o = np.lexsort((eid, ts, u))
    u, ts = u[o], ts[o]
    st = t.column("state").take(pa.array(o))
    sa = st.to_numpy(zero_copy_only=False)
    newu = np.r_[True, u[1:] != u[:-1]]
    chg = newu | np.r_[False, sa[1:] != sa[:-1]]
    cu, cts, cst = u[chg], ts[chg], st.filter(pa.array(chg))
    nxt = np.r_[cts[1:], np.int64(0)]
    same = np.r_[cu[1:] == cu[:-1], False]
    vto = np.where(same, nxt, np.int64(SCD2_OPEN_US))
    return cu, cts, cst, vto


def scd2_user_state(sf_dir: str) -> ray.data.Dataset:
    """(user_id, state, valid_from_us, valid_to_us) — the SCD2
    dimension build: each user's event_type stream compressed into
    validity intervals (a new interval at every state CHANGE, ordered
    by (ts, event_id); the open current interval gets the
    ``SCD2_OPEN_US`` sentinel).  The warehouse op that turns an event
    log into a point-in-time joinable dimension.

    Scale shape: ONE user-keyed repartition; runs/intervals are
    block-local window arithmetic (a user's events land in one block);
    output is change-bounded, not event-bounded."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def pre(t: pa.Table):
        if len(t) == 0 or "event_id" not in t.schema.names:
            return
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "state": t.column("event_type"),
            }
        )

    co = ev.map_batches(pre, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def intervals(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        cu, cts, cst, vto = _scd2_interval_arrays(t)
        yield pa.table(
            {
                "user_id": pa.array(cu),
                "state": cst,
                "valid_from_us": pa.array(cts),
                "valid_to_us": pa.array(vto),
            }
        )

    return co.map_batches(
        intervals, batch_size=None, batch_format="pyarrow"
    )


def revenue_max_drawdown(sf_dir: str) -> ray.data.Dataset:
    """One row (peak_day, trough_day, peak_cents, trough_cents,
    drawdown_cents) — maximum drawdown of the daily order-revenue
    series: the largest drop from a running peak to a later day, the
    standard stability probe on any monitored series.  PURE INTEGER
    (running max + differences); ties pinned: earliest trough with
    the max drawdown, then earliest day attaining that trough's
    running peak.

    Scale shape: ONE day-keyed reduce (calendar-bounded knot table),
    sequential scan on the driver (the cusum precedent)."""

    def pre(t: pa.Table):
        if len(t) == 0 or "o_orderdate" not in t.schema.names:
            return
        g = pa.table(
            {
                "day": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), _DAY_US
                ),
                "vc": pa.array(_i64(t.column("o_totalprice"), 100)),
            }
        ).group_by(["day"]).aggregate([("vc", "sum")])
        yield g.rename_columns(["day", "vc"])

    rows = keyed_reagg(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["day"], [("vc", "sum")], P,
    ).take_all()
    rows.sort(key=lambda r: r["day"])
    best = None  # (dd, trough_day, peak_cents, trough_cents)
    peak = None
    for r in rows:
        d, v = int(r["day"]), int(r["vc"])
        if peak is None or v > peak:
            peak = v
        dd = peak - v
        if best is None or dd > best[0]:
            best = (dd, d, peak, v)
    dd, tday, pk, tv = best
    pday = next(
        int(r["day"]) for r in rows
        if int(r["day"]) <= tday and int(r["vc"]) == pk
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "peak_day": pa.array([pday], pa.int64()),
                "trough_day": pa.array([tday], pa.int64()),
                "peak_cents": pa.array([pk], pa.int64()),
                "trough_cents": pa.array([tv], pa.int64()),
                "drawdown_cents": pa.array([dd], pa.int64()),
            }
        )
    )


REVENUE_MAX_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS vc
  FROM orders GROUP BY 1
),
run AS (
  SELECT day, vc,
    MAX(vc) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS peak
  FROM daily
),
tr AS (
  SELECT day AS trough_day, vc AS trough_cents, peak AS peak_cents,
    peak - vc AS drawdown_cents,
    ROW_NUMBER() OVER (ORDER BY peak - vc DESC, day) AS rn
  FROM run
)
SELECT
  (SELECT MIN(day) FROM daily d
   WHERE d.day <= tr.trough_day AND d.vc = tr.peak_cents) AS peak_day,
  trough_day, peak_cents, trough_cents, drawdown_cents
FROM tr WHERE rn = 1
"""


def user_event_sequence(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, seq) — each user's full ordered event-type
    string (events ordered by (ts, event_id), joined with '>'): the
    sequence-extraction step that turns an event log into
    behavioral-sequence training rows.  Deterministic: the order key
    is total.

    Scale shape: ONE user-keyed repartition; per-user concatenation is
    block-local vectorized arrow (binary_join over list slices);
    output is user-bounded."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def pre(t: pa.Table):
        if len(t) == 0 or "event_id" not in t.schema.names:
            return
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "et": t.column("event_type"),
            }
        )

    co = ev.map_batches(pre, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def seq(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, u))
        u = u[o]
        et = t.column("et").take(pa.array(o)).combine_chunks()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, len(u)]).astype(np.int32)
        offsets = np.r_[np.int32(0), np.cumsum(cnt, dtype=np.int32)]
        lists = pa.ListArray.from_arrays(pa.array(offsets), et)
        joined = pc.binary_join(lists, ">")
        yield pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_events": pa.array(cnt.astype(np.int64)),
                "seq": joined,
            }
        )

    return co.map_batches(seq, batch_size=None, batch_format="pyarrow")


USER_EVENT_SEQUENCE_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
  string_agg(event_type, '>' ORDER BY ts_us, event_id) AS seq
FROM e GROUP BY user_id
"""


def missing_order_days(sf_dir: str) -> ray.data.Dataset:
    """(day) — calendar gap detection: epoch-days within the observed
    [min, max] order-date span that have NO orders (1311 gaps at
    sf0.001, 6 at sf0.01 — the data-completeness audit an ingest
    pipeline alarms on).

    Scale shape: ONE day-keyed reduce; the gap scan is driver-side
    over the calendar-bounded day set (bounded by the date span, never
    by row count)."""

    def pre(t: pa.Table):
        if len(t) == 0 or "o_orderdate" not in t.schema.names:
            return
        g = pa.table(
            {
                "day": pc.divide(
                    pc.cast(t.column("o_orderdate"), pa.int64()), _DAY_US
                )
            }
        ).group_by(["day"]).aggregate([])
        yield g.rename_columns(["day"])

    rows = keyed_reagg(
        _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
            pre, batch_format="pyarrow"
        ),
        ["day"], [], P,
    ).take_all()
    have = np.sort(np.array([r["day"] for r in rows], np.int64))
    full = np.arange(have[0], have[-1] + 1, dtype=np.int64)
    missing = np.setdiff1d(full, have, assume_unique=True)
    return ray.data.from_arrow(pa.table({"day": pa.array(missing)}))


MISSING_ORDER_DAYS_SQL = """
WITH d AS (
  SELECT DISTINCT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
    AS day
  FROM orders
),
mm AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT UNNEST(range(lo, hi + 1)) AS day FROM mm)
SELECT CAST(cal.day AS BIGINT) AS day FROM cal
ANTI JOIN d ON d.day = cal.day
"""


def user_state_at_day(sf_dir: str) -> ray.data.Dataset:
    """(user_id, day_us, state) — the point-in-time temporal join the
    SCD2 build exists to feed: for every observed day start, each
    user's state whose validity interval contains that instant
    (valid_from <= p < valid_to; users not yet seen at p are absent).
    asof_join's sibling for dimensioned lookups.  (Probes are DAY
    starts: the events table spans a single month, so month probes
    are degenerate — the check-selectivity-at-both-SFs rule.)

    Scale shape: probe instants are the DISTINCT day starts
    (calendar-bounded, broadcast); intervals are the block-local SCD2
    windows after ONE user-keyed repartition; the containment lookup
    is a per-user searchsorted."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def days_pre(t: pa.Table):
        if len(t) == 0 or "ts" not in t.schema.names:
            return
        m = pc.unique(pc.floor_temporal(t.column("ts"), unit="day"))
        yield pa.table({"m": pc.cast(m, pa.int64())})

    months = np.sort(
        np.unique(
            np.concatenate(
                [
                    np.asarray([r["m"]], np.int64)
                    for r in ev.map_batches(
                        days_pre, batch_format="pyarrow"
                    ).take_all()
                ]
            )
        )
    )

    def pre(t: pa.Table):
        if len(t) == 0 or "event_id" not in t.schema.names:
            return
        yield pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "state": t.column("event_type"),
            }
        )

    co = ev.map_batches(pre, batch_format="pyarrow").repartition(
        P, keys=["user_id"]
    )

    def lookup(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        cu, cts, cst, vto = _scd2_interval_arrays(t)
        # per-user containment lookup for every probe day
        starts = np.flatnonzero(np.r_[True, cu[1:] != cu[:-1]])
        ends = np.r_[starts[1:], len(cu)]
        out_u, out_m, out_i = [], [], []
        for s, e in zip(starts, ends):
            idx = np.searchsorted(cts[s:e], months, side="right") - 1
            ok = (idx >= 0) & (months < vto[s:e][idx.clip(0)])
            if not ok.any():
                continue
            out_u.append(np.full(ok.sum(), cu[s], np.int64))
            out_m.append(months[ok])
            out_i.append(s + idx[ok])
        if not out_u:
            return
        take = np.concatenate(out_i)
        yield pa.table(
            {
                "user_id": pa.array(np.concatenate(out_u)),
                "day_us": pa.array(np.concatenate(out_m)),
                "state": cst.take(pa.array(take)),
            }
        )

    return co.map_batches(lookup, batch_size=None, batch_format="pyarrow")


USER_STATE_AT_DAY_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           event_type AS state FROM events),
lg AS (SELECT user_id, ts_us, event_id, state,
       LAG(state) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         AS prev FROM e),
chg AS (SELECT user_id, ts_us, event_id, state FROM lg
        WHERE prev IS NULL OR prev <> state),
iv AS (SELECT user_id, state, ts_us AS valid_from_us,
       COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id), {1 << 62}) AS valid_to_us
       FROM chg),
months AS (SELECT DISTINCT epoch_us(date_trunc('day', ts)) AS m
           FROM events)
SELECT iv.user_id, CAST(months.m AS BIGINT) AS day_us, iv.state
FROM iv JOIN months
  ON months.m >= iv.valid_from_us AND months.m < iv.valid_to_us
"""


MIX_T_BUDGET = 10**6   # total token budget to allocate


def mixture_temperature_budgets(sf_dir: str) -> ray.data.Dataset:
    """(source, n_tokens, weight_q, budget_tokens) — temperature-based
    data-mixing weights (α = 1/2, the GPT-3-style sub-linear source
    reweighting): each source's share of a 10⁶-token budget is
    proportional to sqrt(its token count), flattening the head.
    weight_q = floor(10⁶·sqrt(n)) — ONE correctly-rounded IEEE sqrt
    mirrored verbatim in SQL (the floor(1e9·ln) rule's sqrt sibling)
    — then budgets are pure-integer floor division with the wide
    product in HUGEINT/Python int only.

    Scale shape: block-local per-source token partials, one
    |sources|-bounded re-agg, driver fold over the source table."""
    import math

    def tok_pre(t: pa.Table):
        if len(t) == 0 or "text" not in t.schema.names:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        )
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
        keep = pc.not_equal(arr.values, "").to_numpy(zero_copy_only=False)
        cnt = np.bincount(doc_idx[keep], minlength=len(arr)).astype(np.int64)
        g = (
            pa.table({"source": t.column("source"), "n": pa.array(cnt)})
            .group_by(["source"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["source", "n"])

    import os

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "text"],
    )
    rows = keyed_reagg(
        docs.map_batches(tok_pre, batch_format="pyarrow"),
        ["source"], [("n", "sum")], 4,
    ).take_all()
    rows.sort(key=lambda r: r["source"])
    wq = [int(math.floor(10**6 * math.sqrt(float(r["n"])))) for r in rows]
    tot = sum(wq)
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([r["source"] for r in rows]),
                "n_tokens": pa.array(
                    [int(r["n"]) for r in rows], pa.int64()
                ),
                "weight_q": pa.array(wq, pa.int64()),
                "budget_tokens": pa.array(
                    [MIX_T_BUDGET * w // tot for w in wq], pa.int64()
                ),
            }
        )
    )


MIXTURE_TEMPERATURE_SQL = rf"""
WITH tk AS (
  SELECT source,
    CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (SELECT source, n_tokens,
      CAST(FLOOR(1000000.0 * SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
        AS weight_q
      FROM tk),
s AS (SELECT CAST(SUM(weight_q) AS BIGINT) AS tot FROM w)
SELECT source, n_tokens, weight_q,
  CAST(CAST({MIX_T_BUDGET} AS HUGEINT) * weight_q // s.tot AS BIGINT)
    AS budget_tokens
FROM w, s
"""


WJS_RMAX = 1 << 31   # revenue-cap for the weighted keep probability
WJS_T = (1 << 64) // WJS_RMAX


def weighted_join_sample(sf_dir: str) -> ray.data.Dataset:
    """(o_orderpriority, n_sampled, sum_rev_i) — revenue-weighted
    sampling over a JOIN with the weight test pushed BELOW the join
    (the shape of "Streaming Weighted Sampling over Join Queries",
    EDBT 2023 — public algorithm): each lineitem survives with
    probability rev_i/2³¹ via the pure-integer threshold
    splitmix64(8k+ln) < rev_i·⌊2⁶⁴/2³¹⌋ (the weighted_event_sample
    rule), and because the weight depends only on the FACT side, the
    filter runs BEFORE the orders join — only sampled rows ever
    shuffle.  Output is the per-priority sample aggregate.

    Scale shape: stateless vectorized pre-join filter; the join and
    the |priorities|-bounded re-agg see only the sample."""
    from .sketch import splitmix64

    tq = np.uint64(WJS_T)

    def l_pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = t.column("l_linenumber").to_numpy(zero_copy_only=False)
        price_c = _i64(t.column("l_extendedprice"), 100)
        disc_b = _i64(t.column("l_discount"), 100)
        rev = price_c * (100 - disc_b)
        if (rev >= WJS_RMAX).any():
            raise ValueError(
                f"rev_i >= WJS_RMAX ({WJS_RMAX}): the uint64 threshold "
                "product would wrap and diverge from the HUGEINT oracle; "
                "raise WJS_RMAX (no-silent-caps rule)"
            )
        with np.errstate(over="ignore"):
            h = splitmix64(
                k.astype(np.uint64) * np.uint64(8) + ln.astype(np.uint64)
            )
            keep = h < rev.astype(np.uint64) * tq
        if not keep.any():
            return
        yield pa.table(
            {
                "l_orderkey": pa.array(k[keep]),
                "rev": pa.array(rev[keep]),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    ).map_batches(l_pre, batch_format="pyarrow")
    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = join_auto(li, o, on=("l_orderkey",), right_on=("o_orderkey",),
                  num_partitions=P)

    def agg(t: pa.Table):
        if t.num_rows == 0 or "o_orderpriority" not in t.schema.names:
            return
        g = (
            t.select(["o_orderpriority", "rev"])
            .append_column("n", pa.array(np.ones(len(t), np.int64)))
            .group_by(["o_orderpriority"])
            .aggregate([("n", "sum"), ("rev", "sum")])
        )
        yield g.rename_columns(["o_orderpriority", "n_sampled", "sum_rev_i"])

    return keyed_reagg(
        j.map_batches(agg, batch_format="pyarrow"),
        ["o_orderpriority"], [("n_sampled", "sum"), ("sum_rev_i", "sum")], 4,
    )
