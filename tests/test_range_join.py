"""range_join semantics (joins.py): banded inner range join, inclusive
bounds, per-group windows, across multiple blocks."""

import pyarrow as pa
import ray
import ray.data

from rayrank.joins import range_join


def rows_of(ds):
    return [r for b in ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()]


def test_range_join_banded_inner():
    left = pa.table(
        {
            "lid": pa.array([1, 2, 3, 4], pa.int64()),
            "u": pa.array([1, 1, 2, 3], pa.int64()),
            "t": pa.array([10, 30, 10, 10], pa.int64()),
        }
    )
    right = pa.table(
        {
            "u": pa.array([1, 1, 1, 1, 2, 4], pa.int64()),
            "t": pa.array([5, 10, 12, 25, 100, 10], pa.int64()),
            "rid": pa.array([50, 100, 120, 250, 999, 888], pa.int64()),
        }
    )
    lds = ray.data.from_arrow(left).repartition(3)
    rds = ray.data.from_arrow(right).repartition(2)
    # window [t-5, t+2] inclusive on both ends
    out = rows_of(range_join(lds, rds, on="t", by="u", lo=-5, hi=2))
    pairs = sorted((r["lid"], r["rid"]) for r in out)

    # lid=1 (u=1,t=10): window [5,12] -> rids 50,100,120
    # lid=2 (u=1,t=30): window [25,32] -> rid 250
    # lid=3 (u=2,t=10): window [5,12] -> right u=2 only at t=100 -> none
    # lid=4 (u=3):      no right rows for u=3 -> none
    # right u=4 never matches (no left side)
    assert pairs == [(1, 50), (1, 100), (1, 120), (2, 250)]
    by_rid = {r["rid"]: r for r in out}
    assert by_rid[50]["t_right"] == 5
    assert by_rid[250]["t_right"] == 25
    assert all(r["u"] in (1,) for r in out)


def test_range_join_inclusive_bounds_and_empty():
    left = pa.table(
        {"lid": pa.array([1], pa.int64()), "u": pa.array([7], pa.int64()),
         "t": pa.array([100], pa.int64())}
    )
    right = pa.table(
        {"u": pa.array([7, 7, 7], pa.int64()),
         "t": pa.array([99, 100, 101], pa.int64()),
         "rid": pa.array([1, 2, 3], pa.int64())}
    )
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    # degenerate band [t, t]: only the exact match
    out = rows_of(range_join(lds, rds, on="t", by="u", lo=0, hi=0))
    assert [(r["lid"], r["rid"]) for r in out] == [(1, 2)]
    # band that misses everything -> empty result, schema still works
    out2 = rows_of(range_join(lds, rds, on="t", by="u", lo=5, hi=6))
    assert out2 == []


def test_range_join_column_collision_raises():
    t = pa.table({"u": pa.array([1], pa.int64()), "t": pa.array([1], pa.int64()),
                  "x": pa.array([1], pa.int64())})
    lds = ray.data.from_arrow(t)
    rds = ray.data.from_arrow(t)
    try:
        range_join(lds, rds, on="t", by="u", lo=0, hi=1)
        raise AssertionError("expected ValueError on colliding column x")
    except ValueError as e:
        assert "collision" in str(e)
