"""broadcast_join / join_auto: equivalence with hash_join, limit
fallback, empty right side, key renaming."""

import pyarrow as pa
import ray.data

from rayrank.joins import broadcast_join, hash_join, join_auto


def _left():
    return ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3, 5], pa.int64()),
                  "lv": pa.array([10, 20, 21, 30, 50], pa.int64())})
    ).repartition(3)


def _right():
    return ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 3, 4], pa.int64()),
                  "rv": pa.array([200, 300, 400], pa.int64())})
    ).repartition(2)


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_broadcast_matches_hash_join():
    b = broadcast_join(_left(), _right(), on=("k",), right_on=("rk",))
    h = hash_join(_left(), _right(), on=("k",), right_on=("rk",),
                  num_partitions=4)
    assert b is not None
    assert _rows(b) == _rows(h)
    assert len(b.take_all()) == 3  # keys 2 (x2 left rows), 3


def test_limit_fallback_returns_none_and_auto_falls_back():
    assert broadcast_join(_left(), _right(), on=("k",), right_on=("rk",),
                          limit=2) is None
    a = join_auto(_left(), _right(), on=("k",), right_on=("rk",),
                  num_partitions=4, broadcast_limit=2)
    h = hash_join(_left(), _right(), on=("k",), right_on=("rk",),
                  num_partitions=4)
    assert _rows(a) == _rows(h)


def test_empty_right_side():
    empty = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
    )
    b = broadcast_join(_left(), empty, on=("k",), right_on=("rk",))
    assert b is not None and b.count() == 0


def _right_keys():
    return ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 3, 4], pa.int64())})
    ).repartition(2)


def test_semi_join_broadcast_and_hash_agree():
    want = [(("k", 2), ("lv", 20)), (("k", 2), ("lv", 21)),
            (("k", 3), ("lv", 30))]
    for lim in (10, 1):  # broadcast path, then forced hash path
        a = join_auto(_left(), _right_keys(), on=("k",), right_on=("rk",),
                      how="semi", num_partitions=4, broadcast_limit=lim)
        assert _rows(a) == want


def test_anti_join_broadcast_and_hash_agree():
    want = [(("k", 1), ("lv", 10)), (("k", 5), ("lv", 50))]
    for lim in (10, 1):
        a = join_auto(_left(), _right_keys(), on=("k",), right_on=("rk",),
                      how="anti", num_partitions=4, broadcast_limit=lim)
        assert _rows(a) == want


def test_semi_join_rejects_extra_right_columns():
    import pytest

    with pytest.raises(ValueError, match="keys-only"):
        hash_join(_left(), _right(), on=("k",), right_on=("rk",),
                  how="semi", num_partitions=4)
    with pytest.raises(ValueError, match="keys-only"):
        broadcast_join(_left(), _right(), on=("k",), right_on=("rk",),
                       how="anti")
