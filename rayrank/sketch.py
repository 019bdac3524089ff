"""Distributed cardinality sketches: KMV (k-minimum-values) and
HyperLogLog over a ``ray.data.Dataset`` column.

Reference scope: the reference engine has no sketches; these are the
"novel sketch" additions the 100-TB training-data brief asks for
(approximate distinct counts without a wide shuffle).  Both are built
on ONE deterministic 64-bit hash — splitmix64 (Steele et al., "Fast
Splittable Pseudorandom Number Generators", OOPSLA 2014; public
constants) — vectorized in numpy uint64 (wrapping arithmetic) and
reproduced bit-identically in the DuckDB oracles via HUGEINT split
multiplication, so even the *approximate* estimates are SQL-checkable.

Scale shape: each input block folds to a tiny partial (≤ k hashes for
KMV; ≤ m nonzero registers for HLL) inside ``map_batches``; partials
are unioned and merged in ONE single-block reduce — no groupby, no
sort, no driver-side iteration over data rows.  Estimator float math
is arranged to be order-independent (exact-integer register sum
scaled by 2^60) so the distributed merge order can never change the
reported estimate.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

_C0 = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping mod 2^64)."""
    z = np.asarray(x).astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        z = z + _C0
        z = (z ^ (z >> np.uint64(30))) * _C1
        z = (z ^ (z >> np.uint64(27))) * _C2
        z = z ^ (z >> np.uint64(31))
    return z


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0), exact (no float log)."""
    w = w.copy()
    bl = np.zeros(w.shape, np.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        m = w >= np.uint64(1 << sh)
        bl[m] += sh
        w[m] >>= np.uint64(sh)
    return bl + (w > 0)


def kmv_distinct(
    ds: ray.data.Dataset, column: str, k: int = 64
) -> ray.data.Dataset:
    """KMV distinct-count estimate of ``column`` (int-valued).

    Per block: unique values -> splitmix64 -> k smallest hashes (a
    sorted uint64 list ≤ k long).  Merge: union of all partials, k
    smallest, estimate (k-1)·2^64/h_(k) — exact count when fewer than
    k unique hashes were ever seen.  Returns a one-row Dataset
    ``{est_distinct: int64, k: int64}``.
    """

    def part(t: pa.Table):
        if t.num_rows == 0:
            return
        v = t.column(column).to_numpy(zero_copy_only=False)
        h = np.unique(splitmix64(np.unique(v)))
        yield pa.table({"h": pa.array(h[:k], pa.uint64())})

    def merge(t: pa.Table):
        if "h" not in t.schema.names:
            h = np.empty(0, np.uint64)
        else:
            h = np.unique(t.column("h").to_numpy(zero_copy_only=False))
        nu = len(h)
        if nu < k:
            est = nu
        else:
            # (k-1)·2^64 is exact in float64 for k ≤ 2^53; both oracle
            # and engine divide the same two doubles -> identical result
            est = math.floor((k - 1) * 2.0**64 / float(h[k - 1]))
        yield pa.table(
            {
                "est_distinct": pa.array([est], pa.int64()),
                "k": pa.array([k], pa.int64()),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
    )


def kmv_distinct_by(
    ds: ray.data.Dataset, key_col: str, value_col: str, k: int = 64
) -> ray.data.Dataset:
    """Per-KEY KMV distinct-count estimates — the grouped-sketch shape
    (approximate COUNT(DISTINCT value) GROUP BY key at cardinalities
    where the exact two-level groupby would shuffle too much).

    Per block: distinct (key, value) pairs → splitmix64(value) → k
    smallest hashes PER KEY (vectorized lexsort + group-rank, no
    per-group loop).  Merge is one coalesce of O(blocks·keys·k) rows;
    per key the union's k-th minimum gives (k−1)·2^64/h_(k), exact
    when fewer than k distinct hashes exist.  Bit-identical to the SQL
    replay (same branch, same two doubles divided)."""

    def part(t: pa.Table):
        if t.num_rows == 0:
            return
        ty = np.asarray(t.column(key_col).to_pylist(), dtype=object)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        h = splitmix64(v.astype(np.uint64))
        order = np.lexsort((h, ty))
        ty, h = ty[order], h[order]
        first = np.r_[True, (ty[1:] != ty[:-1]) | (h[1:] != h[:-1])]
        ty, h = ty[first], h[first]
        starts = np.flatnonzero(np.r_[True, ty[1:] != ty[:-1]])
        sizes = np.diff(np.r_[starts, len(ty)])
        rank = np.arange(len(ty)) - np.repeat(starts, sizes)
        keep = rank < k
        yield pa.table(
            {
                "key": pa.array(ty[keep].tolist(), pa.string()),
                "h": pa.array(h[keep], pa.uint64()),
            }
        )

    def merge(t: pa.Table):
        if t.num_rows == 0 or "h" not in t.schema.names:
            return
        ty = np.asarray(t.column("key").to_pylist(), dtype=object)
        h = t.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((h, ty))
        ty, h = ty[order], h[order]
        first = np.r_[True, (ty[1:] != ty[:-1]) | (h[1:] != h[:-1])]
        ty, h = ty[first], h[first]
        starts = np.flatnonzero(np.r_[True, ty[1:] != ty[:-1]])
        sizes = np.diff(np.r_[starts, len(ty)])
        keys, ests = [], []
        for s, n in zip(starts, sizes):
            keys.append(ty[s])
            if n < k:
                ests.append(int(n))
            else:
                ests.append(
                    math.floor((k - 1) * 2.0**64 / float(h[s + k - 1]))
                )
        yield pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "est_distinct": pa.array(ests, pa.int64()),
                "k": pa.array(np.full(len(keys), k, np.int64)),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
    )


def hll_partials(
    ds: ray.data.Dataset, column: str, p: int = 12
) -> ray.data.Dataset:
    """Sparse HyperLogLog register partials: one (idx, rho) row per
    nonzero register per block; registers merge by max."""
    m = 1 << p

    def part(t: pa.Table):
        if t.num_rows == 0:
            return
        v = t.column(column).to_numpy(zero_copy_only=False)
        h = splitmix64(v)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        rho = (64 - p) + 1 - _bit_length_u64(w)
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, idx, rho)
        nz = np.flatnonzero(regs)
        yield pa.table(
            {
                "idx": pa.array(nz, pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    return ds.map_batches(part, batch_format="pyarrow")


def hll_distinct(
    ds: ray.data.Dataset, column: str, p: int = 12
) -> ray.data.Dataset:
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007) of
    ``column``; m = 2^p registers, linear-counting small-range branch.

    The harmonic denominator is an EXACT python-int sum of 2^(60−M_j)
    (every register value ≤ 53 at p ≥ 11), so the estimate is
    independent of block/merge order; the only float ops are one
    division + multiplies (and ln on the linear-counting branch),
    mirrored operation-for-operation by the SQL oracle.  Returns a
    one-row Dataset ``{est_distinct: double, p: int64}`` with the
    estimate rounded to 4 decimals.
    """
    m = 1 << p

    def merge(t: pa.Table):
        regs = np.zeros(m, np.int64)
        if "idx" in t.schema.names and t.num_rows:
            np.maximum.at(
                regs,
                t.column("idx").to_numpy(zero_copy_only=False),
                t.column("rho").to_numpy(zero_copy_only=False),
            )
        counts = np.bincount(regs, minlength=61)
        s = sum(int(c) << (60 - r) for r, c in enumerate(counts) if c)
        v = int(counts[0])
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m * 2.0**60 / float(s)
        if est <= 2.5 * m and v > 0:
            est = m * math.log(m / v)
        yield pa.table(
            {
                "est_distinct": pa.array([round(est, 4)], pa.float64()),
                "p": pa.array([p], pa.int64()),
            }
        )

    return (
        hll_partials(ds, column, p)
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
    )


def hash_sample(
    ds: ray.data.Dataset, column: str, fraction: float
) -> ray.data.Dataset:
    """Deterministic Bernoulli-by-key sampling: keep rows where
    ``splitmix64(column) < fraction · 2^64``.  Unlike RNG-based
    ``random_sample``, the same key always makes the same decision —
    resumable, reproducible across runs/cluster sizes, and joinable
    (two tables sampled on a shared key stay aligned).  Embarrassingly
    parallel: a stateless vectorized filter per batch, no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = np.uint64(int(fraction * float(1 << 64))) if fraction < 1.0 else None

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or thresh is None:
            return t
        keys = t.column(column).to_numpy(zero_copy_only=False)
        h = splitmix64(keys.astype(np.uint64))
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(fn, batch_format="pyarrow")


def kmv_sketch(ds: ray.data.Dataset, column: str, k: int = 64) -> np.ndarray:
    """The k smallest splitmix64 hashes of ``column``'s distinct values
    — per-block ≤k-row partials, ONE driver fold of k·blocks hashes
    (never the value set).  Deterministic: a pure function of the
    value SET, so sketches of the same set agree at any cluster
    size."""

    def part(t: pa.Table):
        if t.num_rows == 0 or column not in t.schema.names:
            return
        v = t.column(column).to_numpy(zero_copy_only=False)
        h = np.unique(splitmix64(np.unique(v)))
        yield pa.table({"h": pa.array(h[:k], pa.uint64())})

    hs = [
        r["h"] for r in ds.map_batches(part, batch_format="pyarrow").take_all()
    ]
    if not hs:
        return np.empty(0, np.uint64)
    return np.unique(np.asarray(hs, np.uint64))[:k]


def kmv_jaccard(
    a_ds: ray.data.Dataset,
    b_ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
    k: int = 64,
) -> pa.Table:
    """One-row KMV Jaccard estimate between two key sets: union sketch
    = k smallest of merge(sketch_A, sketch_B); estimate = (union-sketch
    hashes present in BOTH side sketches) / |union sketch| — the
    standard mergeable set-similarity estimator (exact when both sets
    fit in k).  Only 2·k hashes ever reach the driver; ONE double
    division of exact ints, mirrored by the SQL oracle."""
    ha = kmv_sketch(a_ds, col_a, k)
    hb = kmv_sketch(b_ds, col_b, k)
    u = np.unique(np.concatenate([ha, hb]))[:k]
    both = np.intersect1d(ha, hb)
    c = int(np.isin(u, both).sum())
    n = int(len(u))
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "union_k": pa.array([n], pa.int64()),
            "inter_k": pa.array([c], pa.int64()),
            "jaccard_est": pa.array(
                [float(c) / float(n) if n else 0.0], pa.float64()
            ),
        }
    )


# --------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005, public algorithm)
# --------------------------------------------------------------------------

CMS_WIDTH = 256
CMS_DEPTH = 4


def cms_sketch(
    ds: ray.data.Dataset,
    column: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> np.ndarray:
    """depth×width count-min counter grid over ``column`` — the
    frequency-estimation sketch (est ≥ true, error ≤ N/width w.h.p.).
    One splitmix64 chain serves all rows: h_d(k) = splitmix64(k·depth
    + d) % width (k·depth + d < 2^63 required — raises otherwise).

    Scale shape: each block folds to ≤ depth·width nonzero counter
    partials inside ``map_batches`` (np.bincount per row of the grid);
    ONE keyed re-agg over (d, bucket) reduces them; the driver holds
    only the grid — memory bounded by the SKETCH, never the data.
    Counters are exact integers, so the merge is order-free and the
    estimates replay bit-identically at any cluster size."""
    from .shuffle import keyed_reagg

    def partial(t: pa.Table):
        if t.num_rows == 0 or column not in t.schema.names:
            return
        k = t.column(column).to_numpy(zero_copy_only=False)
        if len(k) and (int(k.max()) * depth + depth - 1) >= 1 << 63:
            raise OverflowError("cms_sketch: key·depth exceeds int63")
        ku = k.astype(np.uint64)
        parts = []
        for d in range(depth):
            with np.errstate(over="ignore"):
                h = splitmix64(ku * np.uint64(depth) + np.uint64(d)) % np.uint64(
                    width
                )
            cnt = np.bincount(h.astype(np.int64), minlength=width)
            nz = np.flatnonzero(cnt)
            parts.append(
                pa.table(
                    {
                        "d": pa.array(np.full(len(nz), d, np.int64)),
                        "bucket": pa.array(nz.astype(np.int64)),
                        "c": pa.array(cnt[nz]),
                    }
                )
            )
        yield pa.concat_tables(parts)

    rows = keyed_reagg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["d", "bucket"],
        [("c", "sum")],
        num_partitions=4,
    ).take_all()
    grid = np.zeros((depth, width), np.int64)
    for r in rows:
        grid[r["d"], r["bucket"]] = r["c"]
    return grid


# --------------------------------------------------------------------------
# AMS "tug-of-war" second-frequency-moment sketch (Alon, Matias &
# Szegedy 1996, public algorithm)
# --------------------------------------------------------------------------

AMS_R = 16  # estimators: 4 groups of 4 -> median-of-means


def ams_f2(ds: ray.data.Dataset, column: str, r: int = AMS_R) -> ray.data.Dataset:
    """One-row AMS estimate of F2 = Σ_key f_key² (the self-join size /
    skew statistic) over an int64 ``column``, next to the exact value.

    Sketch: estimator j keeps Z_j = Σ_rows s_j(key), the tug-of-war sum
    with sign s_j(key) = ±1 from the low bit of splitmix64(key·r + j)
    (the cms_sketch hash-chain rule; key·r + r − 1 must stay < 2^63 —
    raises otherwise).  E[Z_j²] = F2.  Estimate pinned to PURE INTEGER
    median-of-means: group means ⌊ΣZ²/4⌋ over 4 groups of 4, median =
    ⌊(m_(2)+m_(3))/2⌋ — floor division on non-negatives matches DuckDB
    ``//`` exactly, so the *approximate* estimate is SQL-checkable.

    Scale shape: each block folds to r signed counters inside
    ``map_batches`` (Z is a sum, so partials merge order-free); the
    exact side pre-counts per key per block, reduces through ONE keyed
    re-agg, and folds Σc² block-locally — the key table never
    materializes anywhere.  Returns ``{r_estimators, est_f2, exact_f2}``.
    """
    if r % 8 != 0:
        # groups of 4, and an even group count so the pinned median is
        # the mean of the two middle group means on both sides
        raise ValueError(f"ams_f2 needs r divisible by 8, got {r}")
    from .shuffle import keyed_reagg

    def zpart(t: pa.Table):
        if t.num_rows == 0 or column not in t.schema.names:
            return
        v = t.column(column).to_numpy(zero_copy_only=False)
        if len(v) and (int(v.max()) * r + r - 1) >= 1 << 63:
            raise OverflowError("ams_f2: key·r exceeds int63")
        vu = v.astype(np.uint64)
        z = np.empty(r, np.int64)
        for j in range(r):
            with np.errstate(over="ignore"):
                h = splitmix64(vu * np.uint64(r) + np.uint64(j))
            ones = int((h & np.uint64(1)).sum())
            z[j] = 2 * ones - len(v)  # Σ(+1/-1) signs
        yield pa.table(
            {"j": pa.array(np.arange(r, dtype=np.int64)), "z": pa.array(z)}
        )

    def zmerge(t: pa.Table):
        zs = np.zeros(r, np.int64)
        if t.num_rows and "j" in t.schema.names:
            np.add.at(
                zs,
                t.column("j").to_numpy(zero_copy_only=False),
                t.column("z").to_numpy(zero_copy_only=False),
            )
        x = [int(v) * int(v) for v in zs]  # python ints: no overflow
        means = sorted(sum(x[g * 4:(g + 1) * 4]) // 4 for g in range(r // 4))
        mid = len(means) // 2
        est = (means[mid - 1] + means[mid]) // 2
        yield pa.table({"est_f2": pa.array([est], pa.int64())})

    est_ds = (
        ds.map_batches(zpart, batch_format="pyarrow")
        .repartition(1)
        .map_batches(zmerge, batch_size=None, batch_format="pyarrow")
    )

    def cpart(t: pa.Table):
        if t.num_rows == 0 or column not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "key": t.column(column),
                    "c": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ).group_by(["key"]).aggregate([("c", "sum")])
        )
        yield g.rename_columns(["key", "c"])

    def sq(t: pa.Table):
        if t.num_rows == 0 or "c" not in t.schema.names:
            return
        c = t.column("c").to_numpy(zero_copy_only=False)
        yield pa.table({"f2": pa.array([int((c * c).sum())], pa.int64())})

    exact_ds = (
        keyed_reagg(
            ds.map_batches(cpart, batch_format="pyarrow"),
            ["key"], [("c", "sum")], num_partitions=4,
        )
        .map_batches(sq, batch_format="pyarrow")
        .repartition(1)
    )

    def final(est: int, exact: int) -> pa.Table:
        return pa.table(
            {
                "r_estimators": pa.array([r], pa.int64()),
                "est_f2": pa.array([est], pa.int64()),
                "exact_f2": pa.array([exact], pa.int64()),
            }
        )

    est = est_ds.take_all()[0]["est_f2"]
    exact = sum(row["f2"] for row in exact_ds.take_all())
    return ray.data.from_arrow(final(int(est), int(exact)))


def cms_estimates(
    keys: ray.data.Dataset,
    column: str,
    grid: np.ndarray,
    out_col: str = "est_count",
) -> ray.data.Dataset:
    """(column, est_count) per input key row: est = min over the grid's
    depth rows of the key's counter — the grid is broadcast via
    ``ray.put`` once (tiny) and looked up inside ``map_batches``."""
    import ray

    depth, width = grid.shape
    grid_ref = ray.put(grid)

    def est(t: pa.Table, g=grid_ref) -> pa.Table:
        gr = g if isinstance(g, np.ndarray) else ray.get(g)
        k = t.column(column).to_numpy(zero_copy_only=False)
        ku = k.astype(np.uint64)
        e = np.full(len(k), np.iinfo(np.int64).max, np.int64)
        for d in range(depth):
            with np.errstate(over="ignore"):
                h = splitmix64(ku * np.uint64(depth) + np.uint64(d)) % np.uint64(
                    width
                )
            np.minimum(e, gr[d, h.astype(np.int64)], out=e)
        return pa.table({column: t.column(column), out_col: pa.array(e)})

    return keys.map_batches(est, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Bloom-filter join pruning audit
# --------------------------------------------------------------------------

BLOOM_M = 8192        # filter bits (2^13)
BLOOM_SHIFT = 20      # second hash = bits 20..32 of the same splitmix64


def bloom_prune_stats(sf_dir: str) -> ray.data.Dataset:
    """One row (n_build, n_probe, n_pass, n_true, n_false_pos, fp_ppm)
    — the broadcast-Bloom semi-join pruning audit: build a
    ``BLOOM_M``-bit, 2-hash Bloom filter over the URGENT orders'
    o_orderkey set, stream lineitem through it, and report how many
    probe rows the filter passes vs. true membership.  Both hash bit
    positions come from ONE splitmix64 (low 13 bits and bits 20..32),
    so the filter contents — and therefore even the false-positive
    count — are deterministic and oracle-exact.

    This is the scale pattern itself under test: at 100 TB the 1 KiB
    bitmap broadcasts to every probe task and prunes the shuffle that
    a plain semi-join would need; the audit tells you the pass rate
    before you rely on it.  Scale shape: build side reduced to ≤ 2
    bit-positions/key partials (bitmap unioned on the driver, ≤ 1 KiB);
    ONE streaming probe pass emitting scalar count partials."""
    import os

    import pyarrow.compute as pc

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )

    def build_keys(t: pa.Table):
        t = t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
        if len(t) == 0:
            return
        yield t.select(["o_orderkey"])

    tk = np.sort(
        np.concatenate(
            [
                r.column("o_orderkey").to_numpy(zero_copy_only=False)
                for r in orders.map_batches(
                    build_keys, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow", batch_size=None)
            ]
            or [np.empty(0, np.int64)]
        ).astype(np.int64)
    )
    n_build = int(len(tk))
    h = splitmix64(tk)
    bitmap = np.zeros(BLOOM_M, bool)
    bitmap[(h & np.uint64(BLOOM_M - 1)).astype(np.int64)] = True
    bitmap[
        ((h >> np.uint64(BLOOM_SHIFT)) & np.uint64(BLOOM_M - 1)).astype(
            np.int64
        )
    ] = True

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
    )

    def probe(t: pa.Table):
        if len(t) == 0:
            return
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        h = splitmix64(k)
        p1 = (h & np.uint64(BLOOM_M - 1)).astype(np.int64)
        p2 = ((h >> np.uint64(BLOOM_SHIFT)) & np.uint64(BLOOM_M - 1)).astype(
            np.int64
        )
        passed = bitmap[p1] & bitmap[p2]
        true = tk[np.searchsorted(tk, k).clip(0, len(tk) - 1)] == k if len(tk) else np.zeros(len(k), bool)
        yield pa.table(
            {
                "n_probe": pa.array([len(k)], pa.int64()),
                "n_pass": pa.array([int(passed.sum())], pa.int64()),
                "n_true": pa.array([int(true.sum())], pa.int64()),
            }
        )

    n_probe = n_pass = n_true = 0
    for r in li.map_batches(probe, batch_format="pyarrow").take_all():
        n_probe += r["n_probe"]
        n_pass += r["n_pass"]
        n_true += r["n_true"]
    n_fp = n_pass - n_true
    denom = n_probe - n_true
    return ray.data.from_arrow(
        pa.table(
            {
                "n_build": pa.array([n_build], pa.int64()),
                "n_probe": pa.array([n_probe], pa.int64()),
                "n_pass": pa.array([n_pass], pa.int64()),
                "n_true": pa.array([n_true], pa.int64()),
                "n_false_pos": pa.array([n_fp], pa.int64()),
                "fp_ppm": pa.array(
                    [n_fp * 10**6 // denom if denom else 0], pa.int64()
                ),
            }
        )
    )
