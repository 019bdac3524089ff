"""Edge-case semantics for the Q2/Q11/Q15/Q19/Q20 shapes in
rayrank/reports.py — the boundaries the sf0.001 oracle mirror
(test_entry_queries) can't be relied on to hit: exact-half dominance
excluded, max-of-aggregate ties kept, argmin tie broken by suppkey."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(dir_, name, table):
    pq.write_table(table, f"{dir_}/{name}.parquet")


TS97 = dt.datetime(1997, 6, 1)
TS97Q4 = dt.datetime(1997, 11, 1)


@pytest.fixture()
def tiny_sf(tmp_path):
    """Hand-built tables hitting the boundary cases."""
    d = str(tmp_path)
    # lineitem: part 1 -> supp 1 ships 10 of 20 (exactly half: NOT
    # dominant), part 2 -> supp 2 ships 11 of 20 (dominant).
    # suppliers 1 and 2 tie exactly on Q4-1997 revenue (Q15 ties);
    # part 3 is sold by supp 1 and 2 at the same price (Q2 tie ->
    # suppkey 1 wins).
    _write(d, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 2, 3, 3, 3, 3], pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 1, 1, 2, 2, 1], pa.int64()),
        "l_quantity": pa.array([10.0, 10.0, 11.0, 9.0, 1.0, 1.0, 1.0, 1.0]),
        "l_extendedprice": pa.array(
            [100.0, 100.0, 50.0, 50.0, 25.0, 25.0, 30.0, 30.0]
        ),
        "l_discount": pa.array([0.0] * 8),
        "l_tax": pa.array([0.0] * 8),
        "l_returnflag": pa.array(["N"] * 8),
        "l_linestatus": pa.array(["O"] * 8),
        "l_shipdate": pa.array(
            [TS97, TS97, TS97, TS97, TS97Q4, TS97Q4, TS97Q4, TS97Q4],
            pa.timestamp("us"),
        ),
    }))
    _write(d, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["Supplier#1", "Supplier#2"]),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([100.0, 200.0]),
    }))
    _write(d, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["ALPHA", "BETA"]),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }))
    _write(d, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["p1", "p2", "p3"]),
        "p_brand": pa.array(["Brand#1"] * 3),
        "p_type": pa.array(["SMALL", "MEDIUM", "LARGE"]),
        "p_size": pa.array([5, 10, 40], pa.int32()),
        "p_retailprice": pa.array([1.0, 2.0, 3.0]),
    }))
    return d


def _rows(ds):
    return sorted(
        (tuple(sorted(r.items())) for r in ds.take_all()), key=repr
    )


def test_dominance_strictly_more_than_half(tiny_sf):
    from rayrank.reports import dominant_suppliers

    rows = {r["s_suppkey"]: r for r in dominant_suppliers(tiny_sf).take_all()}
    # supp 1: exactly half of part 1 (10/20) -> excluded there; but
    # dominates part 3 in 1997 (2 of 4 is half -> also excluded).
    # part 3 qty: supp1 ships 2, supp2 ships 2 -> nobody dominates.
    assert 2 in rows and rows[2]["dominated_parts"] == 1  # part 2: 11/20
    assert 1 not in rows


def test_top_suppliers_keeps_ties(tiny_sf):
    from rayrank.reports import top_suppliers

    rows = sorted(r["s_suppkey"] for r in top_suppliers(tiny_sf).take_all())
    # Q4-1997 revenue: supp1 = 25+30, supp2 = 25+30 -> exact tie, both kept
    assert rows == [1, 2]
    revs = {r["s_suppkey"]: r["total_revenue"]
            for r in top_suppliers(tiny_sf).take_all()}
    assert revs[1] == revs[2] == 55.0


def test_cheapest_supplier_tie_breaks_by_suppkey(tiny_sf):
    from rayrank.reports import cheapest_supplier_per_part

    rows = {r["l_partkey"]: r
            for r in cheapest_supplier_per_part(tiny_sf).take_all()}
    # part 3: both suppliers offer 25.0 -> suppkey 1 (ALPHA) wins
    assert rows[3]["s_name"] == "Supplier#1"
    assert rows[3]["n_name"] == "ALPHA"
    assert rows[3]["best_price"] == 25.0
    assert rows[1]["best_price"] == 100.0


def test_important_parts_above_threshold_only(tiny_sf):
    from rayrank.reports import important_parts

    rows = {r["l_partkey"]: r["revenue"]
            for r in important_parts(tiny_sf).take_all()}
    # per-part revenue: p1=200, p2=100, p3=110; mean=136.67,
    # 1.5x mean = 205 -> nothing passes (strict >)
    assert rows == {}


def test_disjunctive_revenue_groups(tiny_sf):
    from rayrank.reports import disjunctive_revenue

    (row,) = disjunctive_revenue(tiny_sf).take_all()
    # SMALL part 1 qty 10,10 in [1,11] size 5<=15 -> 200
    # MEDIUM part 2 qty 11,9 -> only 11 in [10,20] size 10<=25 -> 50
    # LARGE part 3 qty 1 not in [20,30] -> 0
    assert row["revenue"] == 250.0
