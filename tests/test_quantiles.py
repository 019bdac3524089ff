"""Exact-quantile operator tests: DuckDB quantile_disc parity on
random multisets across block layouts, duplicates, and int columns."""

import duckdb
import numpy as np
import pytest
import ray.data

from rayrank.quantiles import DEFAULT_QS, exact_quantiles


def duck_quantiles(vals, qs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [list(vals)])
    return {
        q: con.execute("SELECT quantile_disc(x, ?) FROM t", [q]).fetchone()[0]
        for q in qs
    }


def engine_quantiles(vals, qs, blocks=5):
    ds = ray.data.from_items(
        [{"x": v} for v in vals], override_num_blocks=blocks
    )
    return {
        r["q"]: r["value"] for r in exact_quantiles(ds, "x", qs).take_all()
    }


@pytest.mark.parametrize("seed,n,card", [(1, 500, 40), (2, 2000, 1000), (3, 100, 3)])
def test_matches_duckdb_random(seed, n, card):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, card, n).astype(float).tolist()
    got = engine_quantiles(vals, DEFAULT_QS)
    want = duck_quantiles(vals, DEFAULT_QS)
    assert got == {q: float(v) for q, v in want.items()}


def test_block_layout_invariant():
    rng = np.random.default_rng(9)
    vals = rng.normal(0, 100, 3000).round(1).tolist()
    outs = [engine_quantiles(vals, DEFAULT_QS, blocks=b) for b in (1, 4, 23)]
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == {q: float(v) for q, v in duck_quantiles(vals, DEFAULT_QS).items()}


def test_heavy_duplicates():
    vals = [1.0] * 90 + [2.0] * 9 + [100.0]
    got = engine_quantiles(vals, (0.5, 0.875))
    assert got == {0.5: 1.0, 0.875: 1.0}
    got2 = engine_quantiles(vals, (0.9375,))
    assert got2 == {0.9375: 2.0}


def test_single_value_and_int_column():
    got = engine_quantiles([7] * 10, DEFAULT_QS)
    assert set(got.values()) == {7.0}


# ---------------------------------------------------------------------------
# interpolated (quantile_cont semantics via explicit two-rank formula)
# ---------------------------------------------------------------------------

def numpy_interp(vals, qs):
    """Reference implementation of the pinned interpolation rule
    (pos = q·(N−1), straddling order statistics, lo + frac·(hi−lo))."""
    import math

    s = sorted(vals)
    out = {}
    for q in qs:
        pos = q * (len(s) - 1)
        lo = int(math.floor(pos))
        hi = min(lo + (1 if pos != math.floor(pos) else 0), len(s) - 1)
        frac = pos - math.floor(pos)
        out[q] = s[lo] + frac * (s[hi] - s[lo])
    return out


def engine_interp(vals, qs, blocks=5):
    from rayrank.quantiles import interp_quantiles

    ds = ray.data.from_items(
        [{"x": v} for v in vals], override_num_blocks=blocks
    )
    t = interp_quantiles(ds, "x", qs)
    return dict(zip(t.column("q").to_pylist(), t.column("value").to_pylist()))


@pytest.mark.parametrize("seed,n", [(4, 500), (5, 101)])
def test_interp_matches_reference_random(seed, n):
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 50, n).round(2).tolist()
    got = engine_interp(vals, DEFAULT_QS)
    want = numpy_interp(vals, DEFAULT_QS)
    assert got == want  # bit-identical: same float64 expressions


def test_interp_duplicates_straddle_and_singleton():
    vals = [1.0] * 3 + [2.0]  # q=0.5: pos=1.5 straddles equal values
    assert engine_interp(vals, (0.5,)) == {0.5: 1.0}
    vals2 = [1.0, 2.0]  # pos=0.5 → midpoint
    assert engine_interp(vals2, (0.5,)) == {0.5: 1.5}
    assert engine_interp([7.0], DEFAULT_QS) == {q: 7.0 for q in DEFAULT_QS}
