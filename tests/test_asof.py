"""asof_join semantics (joins.py): backward inner as-of with the
pinned greatest-tuple tie rule, across multiple blocks."""

import pyarrow as pa
import ray
import ray.data

from rayrank.joins import asof_join


def rows_of(ds):
    return [r for b in ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()]


def test_asof_join_backward_inner_ties_and_unmatched():
    left = pa.table(
        {
            "lid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "u": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "t": pa.array([5, 10, 25, 35, 7, 9], pa.int64()),
        }
    )
    right = pa.table(
        {
            "u": pa.array([1, 1, 1, 1, 3], pa.int64()),
            "t": pa.array([10, 20, 20, 30, 1], pa.int64()),
            "rid": pa.array([100, 200, 201, 300, 900], pa.int64()),
        }
    )
    lds = ray.data.from_arrow(left).repartition(3)
    rds = ray.data.from_arrow(right).repartition(2)
    out = {r["lid"]: r for r in rows_of(asof_join(lds, rds, on="t", by="u"))}

    # lid=1 (t=5): no right row <= 5 for u=1 -> dropped (inner)
    # lid=2 (t=10): equal ts matches -> rid 100
    # lid=3 (t=25): two right rows at t=20 -> greatest tuple (rid 201)
    # lid=4 (t=35): latest right t=30 -> rid 300
    # u=2 left rows: no right side for the group -> dropped
    # u=3 right row: never emitted (inner keeps left rows only)
    assert sorted(out) == [2, 3, 4]
    assert out[2]["rid"] == 100
    assert out[3]["rid"] == 201
    assert out[4]["rid"] == 300
    assert all(r["u"] == 1 for r in out.values())


def test_asof_join_column_collision_raises():
    t = pa.table({"u": pa.array([1], pa.int64()), "t": pa.array([1], pa.int64()),
                  "x": pa.array([1], pa.int64())})
    lds = ray.data.from_arrow(t)
    rds = ray.data.from_arrow(t)
    try:
        asof_join(lds, rds, on="t", by="u")
        raise AssertionError("expected ValueError on colliding column x")
    except ValueError as e:
        assert "collision" in str(e)
