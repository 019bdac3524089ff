"""Planted-hub fixture for the two_hop_neighbors hub cap (r2 VERDICT
finding #2): one vertex with degree ≈ n/10 must complete without a
straggler partition, capped vertices must be flagged via ``truncated``,
and every UNFLAGGED vertex's ball2 must equal the exact numpy oracle.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_hub_graph(tmp_path) -> tuple[str, np.ndarray, np.ndarray]:
    """lineitem-shaped edge table: hub 0 → 1..H, plus a deterministic
    sparse background ring among 1..N."""
    N, H = 600, 64  # hub degree 64 ≈ N/10
    src = [0] * H + [i for i in range(1, N)]
    dst = list(range(1, H + 1)) + [(i % N) + 1 for i in range(1, N)]
    t = pa.table(
        {
            "l_orderkey": pa.array(src, pa.int64()),
            "l_partkey": pa.array(dst, pa.int64()),
        }
    )
    d = tmp_path / "sf_hub"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, str(d / "lineitem.parquet"))
    return str(d), np.array(src), np.array(dst)


def _exact_ball2(src, dst) -> dict[int, int]:
    nbrs: dict[int, set] = {}
    for s, t in zip(src.tolist(), dst.tolist()):
        if s == t:
            continue
        nbrs.setdefault(s, set()).add(t)
        nbrs.setdefault(t, set()).add(s)
    out = {}
    for v, n1 in nbrs.items():
        ball = set(n1)
        for m in n1:
            ball |= nbrs[m]
        ball.discard(v)
        out[v] = len(ball)
    return out


def test_two_hop_uncapped_exact(ray_session, tmp_path):
    from rayrank.pipelines import two_hop_neighbors

    d, src, dst = _write_hub_graph(tmp_path)
    rows = two_hop_neighbors(d).take_all()
    got = {r["name"]: r["ball2"] for r in rows}
    assert all(r["truncated"] == 0 for r in rows)  # cap far above degrees
    assert got == _exact_ball2(src, dst)


def test_two_hop_hub_capped_flags_and_bounds(ray_session, tmp_path, monkeypatch):
    import rayrank.pipelines as pl

    monkeypatch.setattr(pl, "TWO_HOP_HUB_CAP", 16)  # force hub truncation
    d, src, dst = _write_hub_graph(tmp_path)
    rows = pl.two_hop_neighbors(d).take_all()
    exact = _exact_ball2(src, dst)
    by_name = {r["name"]: r for r in rows}
    assert set(by_name) == set(exact)
    flagged = {n for n, r in by_name.items() if r["truncated"] > 0}
    # the hub (deg 64 > 16) was capped: its members and the hub itself
    # must be flagged; everyone unflagged must be exact
    assert 0 in flagged and len(flagged) > 16
    for n, r in by_name.items():
        if r["truncated"] == 0:
            assert r["ball2"] == exact[n], n
        else:
            assert r["ball2"] <= exact[n]
