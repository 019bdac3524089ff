"""Unit checks for the watermark late-data kernel's segmented scan
(rayrank/pipelines.py watermark_late_events) — the end-to-end integer
result is covered by the oracle mirror in test_entry_queries.py."""

import numpy as np

from rayrank.pipelines import _segmented_cummax

SEED = -(1 << 62)


def _naive(vals, starts, sizes, seeds):
    # exclusive seeded running max, per segment
    out = np.empty(len(vals), np.int64)
    for s, z, seed in zip(starts, sizes, seeds):
        run = seed
        for i in range(s, s + z):
            out[i] = run
            run = max(run, vals[i])
    return out


def test_matches_naive_random():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1000, 50).astype(np.int64)
    starts = np.array([0, 7, 20, 21, 40], np.int64)
    sizes = np.diff(np.r_[starts, len(vals)])
    seeds = np.array([SEED, 500, SEED, 999, 3], np.int64)
    prev = np.r_[SEED, vals[:-1]]
    prev[starts] = seeds
    got = _segmented_cummax(prev, starts, sizes)
    want = _naive(vals, starts, sizes, seeds)
    assert (got == want).all()


def test_single_element_segments():
    vals = np.array([5, 9, 1], np.int64)
    starts = np.array([0, 1, 2], np.int64)
    sizes = np.array([1, 1, 1], np.int64)
    seeds = np.array([SEED, 5, 9], np.int64)
    prev = np.r_[SEED, vals[:-1]]
    prev[starts] = seeds
    got = _segmented_cummax(prev, starts, sizes)
    assert got.tolist() == [SEED, 5, 9]
