"""_exact_rank_sums (rayrank/analytics.py gini kernel): exact Python-int
parity at magnitudes that would silently wrap a naive int64 fold — the
scale-safety claim of gini_order_revenue.  (The full query is checked
bit-identically against its SQL oracle by tests/test_entry_queries.py.)"""

import numpy as np
import pytest

from rayrank.analytics import _exact_rank_sums


def oracle(x):
    xs = [int(v) for v in x]
    return sum(xs), sum(j * v for j, v in enumerate(xs))


@pytest.mark.parametrize(
    "seed,n,hi",
    [
        (1, 1000, 10**6),          # everyday magnitudes
        (2, 5000, 1),              # heavy ties
        (3, 2000, 2**55),          # Σ j·x far beyond int64 — forces c=1-ish chunks
        (4, 1, 2**52),             # single element
        (5, 3, 0),                 # all zeros
    ],
)
def test_matches_python_ints(seed, n, hi):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.integers(0, hi + 1, size=n, dtype=np.int64))
    assert _exact_rank_sums(x) == oracle(x)


def test_wrap_regression():
    # 2^20 copies of 2^43: naive int64 Σ j·x = ~2^82 wraps; the chunked
    # fold must not.
    x = np.full(1 << 20, 1 << 43, np.int64)
    t, w = _exact_rank_sums(x)
    n = 1 << 20
    assert t == n * (1 << 43)
    assert w == (n * (n - 1) // 2) * (1 << 43)
