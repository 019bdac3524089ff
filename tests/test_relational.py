"""Unit tests for rayrank.relational edge semantics (the sf0.001
DuckDB parity for all five pipelines runs in test_entry_queries.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from rayrank.relational import SESSION_GAP_US, _i64


def test_i64_snaps_near_integers():
    col = pa.chunked_array([pa.array([901.82, 0.07, 104997.88])])
    assert _i64(col, 100).tolist() == [90182, 7, 10499788]


def _sessions_of(rows):
    from rayrank import relational

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = relational.user_sessions(d).take_all()
    return sorted(
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in out
    )


def test_session_gap_boundary_is_exclusive():
    h = SESSION_GAP_US
    # gaps: exactly h (same session), h+1 (new session)
    rows = [
        (1, 0, 7),
        (2, h, 7),          # gap == h → same session
        (3, 2 * h + 1, 7),  # gap == h+1 → new session
    ]
    got = _sessions_of(rows)
    assert got == [(7, 1, 2, 0, h), (7, 2, 1, 2 * h + 1, 2 * h + 1)]


def test_sessions_multiple_users_one_block():
    h = SESSION_GAP_US
    rows = [
        (1, 0, 1),
        (2, 10, 2),
        (3, 20, 1),
        (4, 3 * h, 2),
        (5, 30, 3),
    ]
    got = _sessions_of(rows)
    assert got == [
        (1, 1, 2, 0, 20),
        (2, 1, 1, 10, 10),
        (2, 2, 1, 3 * h, 3 * h),
        (3, 1, 1, 30, 30),
    ]


def test_sessions_tie_timestamps_single_session():
    rows = [(1, 100, 5), (2, 100, 5), (3, 100, 5)]
    got = _sessions_of(rows)
    assert got == [(5, 1, 3, 100, 100)]
