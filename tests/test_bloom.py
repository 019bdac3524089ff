"""Bloom-filter semi-join prefilter (rayrank.joins.bloom_bits /
bloom_prefilter): no false negatives ever, FP rate near the design
point, and prefilter + exact semi join ≡ exact semi join alone."""

import numpy as np
import pyarrow as pa
import ray.data

from rayrank.joins import (
    bloom_bits,
    bloom_prefilter,
    broadcast_semi_filter,
)


def _ds(vals, col):
    return ray.data.from_arrow(
        pa.table({col: pa.array(np.asarray(vals, np.int64))})
    ).repartition(4)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(11)
    keys = rng.choice(200_000, size=5_000, replace=False)
    bits_ref, m, k = bloom_bits(_ds(keys, "key"), "key", len(keys))
    probe = _ds(keys, "x")  # every member must pass
    out = bloom_prefilter(probe, "x", bits_ref, m, k).take_all()
    assert len(out) == len(keys)


def test_bloom_fp_rate_and_exactness():
    rng = np.random.default_rng(7)
    keys = rng.choice(1_000_000, size=4_096, replace=False)
    non_members = np.setdiff1d(
        rng.choice(1_000_000, size=60_000, replace=False), keys
    )
    bits_ref, m, k = bloom_bits(_ds(keys, "key"), "key", len(keys))
    passed = bloom_prefilter(
        _ds(non_members, "x"), "x", bits_ref, m, k
    ).count()
    fp_rate = passed / len(non_members)
    assert fp_rate < 0.05  # design point ~1% at 10 bits/key, k=7

    # prefilter + exact semi == exact semi (false positives removed)
    mixed = np.concatenate([keys[:1000], non_members[:5000]])
    pre = bloom_prefilter(_ds(mixed, "x"), "x", bits_ref, m, k)
    got = sorted(
        r["x"]
        for r in broadcast_semi_filter(pre, keys, "x", True).take_all()
    )
    want = sorted(
        r["x"]
        for r in broadcast_semi_filter(
            _ds(mixed, "x"), keys, "x", True
        ).take_all()
    )
    assert got == want
