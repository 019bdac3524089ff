"""Unit tests for the KMV / HyperLogLog cardinality sketches
(rayrank/sketch.py): hash correctness, merge-order invariance,
exact small-cardinality branches, and accuracy bounds."""

import numpy as np
import pytest
import ray.data

from rayrank.sketch import (
    _bit_length_u64,
    hll_distinct,
    kmv_distinct,
    splitmix64,
)


def _one_row(ds):
    rows = ds.take_all()
    assert len(rows) == 1
    return rows[0]


def test_splitmix64_known_vector():
    # First output of the splitmix64 generator seeded with 0
    # (Steele et al. 2014 reference implementation).
    out = splitmix64(np.array([0], dtype=np.uint64))
    assert out.dtype == np.uint64
    assert int(out[0]) == 0xE220A8397B1DCDAF


def test_splitmix64_accepts_signed_ints():
    a = splitmix64(np.array([-1], dtype=np.int64))
    b = splitmix64(np.array([2**64 - 1], dtype=np.uint64))
    assert int(a[0]) == int(b[0])


def test_bit_length_u64_matches_python():
    vals = np.array(
        [0, 1, 2, 3, 255, 256, 2**31, 2**52 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    got = _bit_length_u64(vals)
    want = [int(v).bit_length() for v in vals]
    assert got.tolist() == want


def test_kmv_exact_below_k():
    ds = ray.data.from_items([{"x": i % 10} for i in range(1000)])
    row = _one_row(kmv_distinct(ds, "x", k=64))
    assert row["est_distinct"] == 10
    assert row["k"] == 64


def test_kmv_merge_order_invariant():
    # Same values, different block layouts -> identical estimate.
    vals = [{"x": int(v)} for v in np.random.default_rng(7).integers(0, 5000, 20000)]
    est = {
        n: _one_row(
            kmv_distinct(ray.data.from_items(vals, override_num_blocks=n), "x", k=64)
        )["est_distinct"]
        for n in (1, 3, 17)
    }
    assert len(set(est.values())) == 1


def test_kmv_accuracy():
    n = 20000
    ds = ray.data.from_items([{"x": i} for i in range(n)], override_num_blocks=8)
    est = _one_row(kmv_distinct(ds, "x", k=256))["est_distinct"]
    # KMV stderr ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma.
    assert abs(est - n) / n < 0.25


def test_hll_linear_counting_branch():
    # Tiny cardinality -> linear-counting branch, near-exact.
    ds = ray.data.from_items([{"x": i % 25} for i in range(500)])
    row = _one_row(hll_distinct(ds, "x", p=12))
    assert row["p"] == 12
    assert abs(row["est_distinct"] - 25) < 1.0


def test_hll_merge_order_invariant():
    vals = [{"x": int(v)} for v in np.random.default_rng(3).integers(0, 50000, 30000)]
    est = {
        n: _one_row(
            hll_distinct(ray.data.from_items(vals, override_num_blocks=n), "x", p=12)
        )["est_distinct"]
        for n in (1, 4, 13)
    }
    assert len(set(est.values())) == 1


def test_hll_accuracy():
    n = 30000
    ds = ray.data.from_items([{"x": i} for i in range(n)], override_num_blocks=8)
    est = _one_row(hll_distinct(ds, "x", p=12))["est_distinct"]
    # HLL stderr ~ 1.04/sqrt(2^12) ~ 1.6%; allow 4 sigma.
    assert abs(est - n) / n < 0.07


def test_hll_empty_and_single():
    ds = ray.data.from_items([{"x": 42}])
    row = _one_row(hll_distinct(ds, "x", p=12))
    assert abs(row["est_distinct"] - 1.0) < 0.01


def test_kmv_jaccard_exact_small_sets():
    """Union fits in k → the estimator is EXACT Jaccard."""
    import pyarrow as pa
    import ray.data

    from rayrank.sketch import kmv_jaccard

    a = ray.data.from_arrow(pa.table({"x": pa.array(list(range(0, 30)), pa.int64())}))
    b = ray.data.from_arrow(pa.table({"x": pa.array(list(range(20, 50)), pa.int64())}))
    row = kmv_jaccard(a, b, "x", "x", k=64).to_pylist()[0]
    # |A∪B| = 50, |A∩B| = 10 → exact
    assert row["union_k"] == 50 and row["inter_k"] == 10
    assert row["jaccard_est"] == 10 / 50


def test_kmv_jaccard_estimates_overlap():
    import pyarrow as pa
    import ray.data

    from rayrank.sketch import kmv_jaccard

    n = 20_000
    a = ray.data.from_arrow(pa.table({"x": pa.array(list(range(n)), pa.int64())}))
    b = ray.data.from_arrow(
        pa.table({"x": pa.array(list(range(n // 2, n + n // 2)), pa.int64())})
    )
    row = kmv_jaccard(a, b, "x", "x", k=256).to_pylist()[0]
    # true J = (n/2) / (3n/2) = 1/3; KMV with k=256 ⇒ ~±0.06
    assert abs(row["jaccard_est"] - 1 / 3) < 0.1


def test_cms_grid_matches_single_machine_rebuild():
    import pyarrow as pa
    import ray.data

    from rayrank.sketch import cms_estimates, cms_sketch, splitmix64

    rng = np.random.default_rng(42)
    keys = rng.zipf(1.5, size=30_000).astype(np.int64) % 500
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)})).repartition(8)
    W, D = 64, 3
    grid = cms_sketch(ds, "k", width=W, depth=D)

    ref = np.zeros((D, W), np.int64)
    for d in range(D):
        h = splitmix64(keys.astype(np.uint64) * np.uint64(D) + np.uint64(d)) % np.uint64(W)
        ref[d] = np.bincount(h.astype(np.int64), minlength=W)
    assert (grid == ref).all()  # block partitioning cannot change the grid

    # estimates dominate true counts and equal the grid-min rule
    true = {int(k): int(c) for k, c in zip(*np.unique(keys, return_counts=True))}
    uniq = ray.data.from_arrow(
        pa.table({"k": pa.array(sorted(true), pa.int64())})
    )
    for r in cms_estimates(uniq, "k", grid).take_all():
        k, e = r["k"], r["est_count"]
        assert e >= true[k]
        hs = [
            int(splitmix64(np.array([k * D + d], np.uint64))[0] % np.uint64(W))
            for d in range(D)
        ]
        assert e == min(int(grid[d, hs[d]]) for d in range(D))


def test_ams_f2_exact_and_pinned_estimate():
    import pyarrow as pa

    from rayrank.sketch import ams_f2

    freqs = np.arange(1, 21, dtype=np.int64)  # key k appears k+1 times
    vals = np.repeat(np.arange(20, dtype=np.int64), freqs)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    row = _one_row(ams_f2(ds, "x", r=16))
    assert row["exact_f2"] == int((freqs.astype(object) ** 2).sum())

    # pinned integer median-of-means mirror
    r = 16
    h = splitmix64(
        vals.astype(np.uint64)[:, None] * np.uint64(r)
        + np.arange(r, dtype=np.uint64)[None, :]
    )
    z = (2 * (h & np.uint64(1)).astype(np.int64) - 1).sum(axis=0)
    x = [int(v) ** 2 for v in z]
    means = sorted(sum(x[g * 4:(g + 1) * 4]) // 4 for g in range(4))
    assert row["est_f2"] == (means[1] + means[2]) // 2
    assert row["r_estimators"] == 16


def test_ams_f2_rejects_bad_r():
    import pyarrow as pa

    from rayrank.sketch import ams_f2

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3])}))
    with pytest.raises(ValueError):
        ams_f2(ds, "x", r=12)
