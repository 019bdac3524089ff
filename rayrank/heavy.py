"""Exact heavy hitters (frequent items) over a ``ray.data.Dataset``
column: all values with global count ≥ φ·N, with their exact counts.

Reference scope: none in the reference engine — training-data-pipeline
addition (dominant boilerplate/URL/host detection before dedup).

Two passes, no keyed shuffle over raw rows:

1. candidate pass — each block is counted exactly (vectorized
   ``pyarrow.Table.group_by``) and emits only values with block count
   ≥ φ·(block rows) (≤ 1/φ values per block) plus one null-marker row
   carrying the block's row count.  Averaging argument: a value with
   global count ≥ φ·N has count ≥ φ·n_b in at least one block, so the
   union of per-block candidates is a SUPERSET of the true heavy
   hitters.  Driver holds O(#blocks/φ) candidate rows only.
2. verify pass — candidate set broadcast into a block-local
   ``is_in`` filter + exact per-block counts, folded by one TINY
   ``groupby(value)`` over ≤ #blocks·|candidates| partial rows, then
   thresholded at ceil(φ·N).

Use binary-exact φ (k/2^m) so the threshold arithmetic is float64-
identical to a SQL ``HAVING COUNT(*) >= CEIL(φ*N)`` oracle.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _block_counts(t: pa.Table, column: str) -> pa.Table:
    g = t.select([column]).group_by(column).aggregate([(column, "count")])
    return g.rename_columns(["value", "cnt"])


def heavy_hitters(
    ds: ray.data.Dataset, column: str, phi: float = 0.0078125
) -> ray.data.Dataset:
    """(value, cnt) for every value with count ≥ ceil(φ·N), exact."""

    def candidates(t: pa.Table):
        if t.num_rows == 0:
            return
        g = _block_counts(t, column)
        thresh = phi * t.num_rows
        keep = g.filter(pc.greater_equal(g.column("cnt"), pa.scalar(thresh)))
        yield pa.table(
            {
                "value": pa.concat_arrays(
                    [
                        keep.column("value").combine_chunks(),
                        pa.array([None], keep.column("value").type),
                    ]
                ),
                "cnt": pa.concat_arrays(
                    [
                        keep.column("cnt").cast(pa.int64()).combine_chunks(),
                        pa.array([t.num_rows], pa.int64()),
                    ]
                ),
            }
        )

    rows = ds.map_batches(candidates, batch_format="pyarrow").take_all()
    n_total = sum(r["cnt"] for r in rows if r["value"] is None)
    cand_vals = sorted({r["value"] for r in rows if r["value"] is not None})
    if n_total == 0 or not cand_vals:
        empty = pa.table(
            {"value": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty)

    cand_arr = pa.array(cand_vals)
    thresh = math.ceil(phi * n_total)

    def verify(t: pa.Table):
        if t.num_rows == 0:
            return
        sel = t.filter(pc.is_in(t.column(column), value_set=cand_arr))
        if sel.num_rows == 0:
            return
        yield _block_counts(sel, column)

    out = (
        ds.map_batches(verify, batch_format="pyarrow")
        .groupby("value")
        .sum("cnt")
    )

    def fin(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["value", "cnt"])
        keep = t.filter(
            pc.greater_equal(t.column("cnt"), pa.scalar(thresh, pa.int64()))
        )
        return keep.set_column(1, "cnt", keep.column("cnt").cast(pa.int64()))

    return out.map_batches(fin, batch_format="pyarrow")
