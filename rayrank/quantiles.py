"""Distributed EXACT quantiles (``quantile_disc`` semantics) over a
``ray.data.Dataset`` column.

Reference scope: the reference engine has no quantile operator; this is
a training-data-pipeline addition (length/score percentile cutoffs for
quality filtering) that stays SQL-checkable because it is exact.

Rank rule (verified against DuckDB ``quantile_disc`` empirically):
``rank(q) = max(1, ceil(q·N))`` over the value-sorted multiset; use
binary-exact q (k/2^m) so ``q·N`` is float64-exact on both sides.

Scale shape — never sorts the raw rows and never ships them anywhere:

1. per-block value-count partials (``np.unique`` inside map_batches)
   collapse N rows to ≤ distinct-per-block rows;
2. ONE ``groupby(value).sum(cnt)`` shuffle bounded by global distinct
   cardinality, then a range-partitioning ``sort(value)``;
3. the sorted value-count table is materialized (bounded by
   cardinality, not rows) so two passes see identical blocks: a
   summary pass emits ONE (min value, row mass) row per block
   — the driver holds only O(#blocks) — and a pick pass selects each
   target rank inside the single block that owns it (blocks identify
   themselves by their min value; distinct + range-partitioned ⇒
   mins are unique).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

DEFAULT_QS = (0.125, 0.25, 0.5, 0.75, 0.875)


def _value_counts(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    def part(t: pa.Table):
        if t.num_rows == 0:
            return
        v, c = np.unique(
            t.column(column).to_numpy(zero_copy_only=False), return_counts=True
        )
        yield pa.table({"value": v, "cnt": c.astype(np.int64)})

    vc = ds.map_batches(part, batch_format="pyarrow").groupby("value").sum("cnt")
    return vc.map_batches(
        lambda t: t.rename_columns(["value", "cnt"]), batch_format="pyarrow"
    )


def exact_quantiles(
    ds: ray.data.Dataset, column: str, qs=DEFAULT_QS
) -> ray.data.Dataset:
    """One row per q: ``{q: double, value: double}`` with value =
    quantile_disc(column, q) exactly."""
    qs = sorted(qs)
    svc = _value_counts(ds, column).sort("value").materialize()

    def summary(t: pa.Table):
        if t.num_rows == 0:
            return
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "minv": pa.array([float(v[0])], pa.float64()),
                "mass": pa.array([int(c.sum())], pa.int64()),
            }
        )

    sums = sorted(
        (
            (r["minv"], r["mass"])
            for r in svc.map_batches(
                summary, batch_size=None, batch_format="pyarrow"
            ).take_all()
        ),
    )
    n_total = sum(m for _, m in sums)
    if n_total == 0:
        return ray.data.from_arrow(
            pa.table({"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())})
        )

    # ceil(q*N) is exact: q are k/2^m and N < 2^53
    ranks = [(max(1, math.ceil(q * n_total)), q) for q in qs]
    targets: dict[float, list[tuple[int, float]]] = {}
    off = 0
    it = iter(sums)
    minv, mass = next(it)
    for rank, q in ranks:  # ranks ascending, blocks ascending
        while rank > off + mass:
            off += mass
            minv, mass = next(it)
        targets.setdefault(minv, []).append((rank - off, q))

    def pick(t: pa.Table):
        if t.num_rows == 0:
            return
        v = t.column("value").to_numpy(zero_copy_only=False)
        mine = targets.get(float(v[0]))
        if not mine:
            return
        cum = np.cumsum(t.column("cnt").to_numpy(zero_copy_only=False))
        lr = np.array([r for r, _ in mine], np.int64)
        idx = np.searchsorted(cum, lr, side="left")
        yield pa.table(
            {
                "q": pa.array([q for _, q in mine], pa.float64()),
                "value": pa.array(v[idx].astype(np.float64), pa.float64()),
            }
        )

    return svc.map_batches(pick, batch_size=None, batch_format="pyarrow").sort("q")


def interp_quantiles(
    ds: ray.data.Dataset, column: str, qs=DEFAULT_QS
) -> pa.Table:
    """``quantile_cont`` (linearly interpolated) quantiles, exact to the
    bit against a SQL oracle that interpolates EXPLICITLY: pos =
    q·(N−1), lo = 1+⌊pos⌋ (1-based rank), hi = lo+1 when pos is
    fractional, value = lo + (pos−⌊pos⌋)·(hi−lo) — identical float64
    expressions on both sides, so no dependence on the database's
    internal quantile_cont formula.  Distribution shape is the same as
    :func:`exact_quantiles` (value-count partials + rank picks); only
    the ≤ 2·|qs| picked (rank, value) rows reach the driver."""
    qs = sorted(qs)
    svc = _value_counts(ds, column).sort("value").materialize()

    def summary(t: pa.Table):
        if t.num_rows == 0:
            return
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "minv": pa.array([float(v[0])], pa.float64()),
                "mass": pa.array([int(c.sum())], pa.int64()),
            }
        )

    sums = sorted(
        (r["minv"], r["mass"])
        for r in svc.map_batches(
            summary, batch_size=None, batch_format="pyarrow"
        ).take_all()
    )
    n_total = sum(m for _, m in sums)
    empty = pa.table(
        {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
    )
    if n_total == 0:
        return empty

    # 1-based ranks of the two straddling order statistics per q
    plan = []  # (q, pos, lo_rank, hi_rank)
    want_ranks: set[int] = set()
    for q in qs:
        pos = q * (n_total - 1)
        lo = int(math.floor(pos)) + 1
        hi = min(lo + (1 if pos != math.floor(pos) else 0), n_total)
        plan.append((q, pos, lo, hi))
        want_ranks.update((lo, hi))

    ranks = sorted(want_ranks)
    targets: dict[float, list[int]] = {}
    off = 0
    it = iter(sums)
    minv, mass = next(it)
    for rank in ranks:
        while rank > off + mass:
            off += mass
            minv, mass = next(it)
        targets.setdefault(minv, []).append(rank)
    offsets = {}
    off = 0
    for mv, mass in sums:
        offsets[mv] = off
        off += mass

    def pick(t: pa.Table):
        if t.num_rows == 0:
            return
        v = t.column("value").to_numpy(zero_copy_only=False)
        mine = targets.get(float(v[0]))
        if not mine:
            return
        cum = np.cumsum(t.column("cnt").to_numpy(zero_copy_only=False))
        lr = np.array(mine, np.int64) - offsets[float(v[0])]
        idx = np.searchsorted(cum, lr, side="left")
        yield pa.table(
            {
                "rank": pa.array(mine, pa.int64()),
                "value": pa.array(v[idx].astype(np.float64), pa.float64()),
            }
        )

    picked = {
        r["rank"]: r["value"]
        for r in svc.map_batches(
            pick, batch_size=None, batch_format="pyarrow"
        ).take_all()
    }
    out_q, out_v = [], []
    for q, pos, lo, hi in plan:
        frac = pos - math.floor(pos)
        lo_v, hi_v = picked[lo], picked[hi]
        out_q.append(q)
        out_v.append(lo_v + frac * (hi_v - lo_v))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


SQE_QS = ((125, 0.125), (250, 0.25), (500, 0.5), (750, 0.75), (875, 0.875))
SQE_FRACTION = 0.25   # threshold 2^62 exactly


def sample_quantile_error(sf_dir: str) -> ray.data.Dataset:
    """(qpm, est_cents, n_le, err_ppm) — the sampling-accuracy audit:
    estimate five quantiles (per-mille 125/250/500/750/875 — DYADIC so
    ceil(q·N) is float-exact on both sides) of the event-value
    distribution from a deterministic 25% hash sample
    (splitmix64(event_id) < 2^62), then measure each estimate's TRUE
    rank error against the full data:

        err_ppm = | n_le·10⁶ // N  −  qpm·10³ |

    where n_le counts full-data values <= the sample estimate.  This
    is the measurement that justifies (or rejects) sample-based
    profiling before committing to it at 100 TB — and because the
    sample is hash-deterministic, even the error itself is
    oracle-exact.

    Scale shape: the sample estimate reuses the distributed exact-
    quantile path (value-counts groupby + block summaries); the audit
    is ONE streaming pass over the full data with 5 broadcast cutoffs
    and scalar count partials."""
    import os

    from .relational import _i64
    from .sketch import hash_sample

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )

    def to_cents(t: pa.Table):
        if len(t) == 0:
            return
        yield pa.table(
            {
                "event_id": t.column("event_id"),
                "vc": pa.array(_i64(t.column("value"), 100)),
            }
        )

    evc = ev.map_batches(to_cents, batch_format="pyarrow")
    smp = hash_sample(evc, "event_id", SQE_FRACTION)
    ests = {
        round(r["q"] * 1000): int(r["value"])
        for r in exact_quantiles(
            smp, "vc", qs=[qd for _, qd in SQE_QS]
        ).take_all()
    }
    cut = np.array([ests[qp] for qp, _ in SQE_QS], np.int64)

    def audit(t: pa.Table):
        if len(t) == 0 or "vc" not in t.schema.names:
            return
        v = t.column("vc").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "n": pa.array(np.full(len(cut), len(v), np.int64)),
                "le": pa.array(
                    [int((v <= c).sum()) for c in cut], pa.int64()
                ),
                "qi": pa.array(np.arange(len(cut)), pa.int64()),
            }
        )

    n_full = 0
    le = np.zeros(len(cut), np.int64)
    for r in evc.map_batches(audit, batch_format="pyarrow").take_all():
        le[r["qi"]] += r["le"]
        if r["qi"] == 0:
            n_full += r["n"]
    qps = np.array([qp for qp, _ in SQE_QS], np.int64)
    err = np.abs(le * 10**6 // n_full - qps * 10**3)
    return ray.data.from_arrow(
        pa.table(
            {
                "qpm": pa.array(qps),
                "est_cents": pa.array(cut),
                "n_le": pa.array(le),
                "err_ppm": pa.array(err),
            }
        )
    )
