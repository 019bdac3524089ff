"""Unit checks for the SQL-checked HLL ball-register kernel
(rayrank/pipelines.py hll_ball_registers) — the rank rule and the
init layout; the end-to-end merge is covered by the oracle mirror in
test_entry_queries.py."""

import numpy as np

from rayrank.pipelines import HLL_REGS, _hll_rank


def _naive_rank(y: int) -> int:
    if y == 0:
        return 15
    tz = 0
    while y % 2 == 0:
        y //= 2
        tz += 1
    return min(15, 1 + tz)


def test_rank_matches_naive_trailing_zeros():
    ys = np.array(
        [0, 1, 2, 3, 4, 6, 8, 16, 1024, 2**13, 2**14, 2**15,
         2**40, 2**40 + 2**5, (1 << 60) - 1],
        dtype=np.uint64,
    )
    got = _hll_rank(ys)
    want = [_naive_rank(int(y)) for y in ys]
    assert got.tolist() == want


def test_rank_caps_at_15():
    ys = (np.uint64(1) << np.arange(14, 60, dtype=np.uint64)).astype(
        np.uint64
    )
    assert (_hll_rank(ys) == 15).all()


def test_rank_uniform_hash_distribution_sane():
    # ranks of uniform uint64 draws follow P(rank=k) = 2^-k (k<15):
    # the deterministic splitmix stream must at least put >40% at 1.
    from rayrank.sketch import splitmix64

    h = splitmix64(np.arange(100_000, dtype=np.int64))
    r = _hll_rank(h // np.uint64(HLL_REGS))
    frac1 = (r == 1).mean()
    assert 0.45 < frac1 < 0.55
