"""Robust grouped-map on top of key-based hash repartitioning.

Ray 2.49's ``GroupedData.map_groups`` finalizes each shuffle partition
with ``sort_by(key)`` (hash_shuffle.py:162, should_sort=True).  When the
FIRST block an operator receives is empty, the one-shot schema
broadcast is consumed without distributing a schema
(hash_shuffle.py:548/588 vs the ``block.num_rows == 0`` early-return at
:223), so any partition that receives no real rows finalizes as a
schema-less table and the sort crashes (``No match for
FieldRef.Name(...)``).  Empty blocks are unavoidable — generator UDFs
that yield nothing still emit one, and filters legitimately drain
blocks — so this module avoids the sorting finalize entirely:

    repartition(P, keys=key_cols, sort=False)   # hash co-location only
      → map_batches(whole block)                # vectorized block kernel

``repartition`` guarantees all rows of one key land in one output block
(possibly sharing it with other keys), which is exactly the contract a
grouped map needs.  Empty / schema-less blocks are skipped by the
mapper (a generator that yields nothing).  Per-group work is expressed
as lexsort + segment kernels over the whole block
(:func:`segment_starts`, :func:`triu_pair_indices`) — never a Python
loop over groups.
"""

from __future__ import annotations

import ray.data

from . import NUM_PARTITIONS_DEFAULT


def materialize_cut(ds):
    """``ds.materialize()`` + LINEAGE CUT: rebuild the Dataset from the
    materialized block refs so the logical plan has depth 1.

    Why (Ray 2.49 pathology, measured): a MaterializedDataset still
    carries its full upstream logical plan, and a round loop whose body
    references the previous round's output TWICE (any self-join —
    triangle support, edge-Luby endpoint mins, degree semi-joins)
    builds a plan that is a binary tree of depth = rounds → 2^rounds
    plan nodes.  Execution stays constant but PLANNING doubles per
    round: the 14-generation support chain measured 2.2 s/round flat
    with this cut vs 2.2→157 s/round without.  The cut trades away
    lineage reconstruction for those blocks (the driver pins the refs)
    — the same contract as every other from_arrow_refs use here.  Use
    in ANY loop whose next round consumes the previous round's
    materialized output."""
    import ray.data as _rd

    m = ds.materialize()
    return _rd.from_arrow_refs(m.to_arrow_refs())


def keyed_reagg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[tuple[str, str]],
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """``groupby(keys).agg(...)`` as ONE keyed repartition + a
    block-local arrow re-aggregation — measured 3–4× faster than
    ``Dataset.groupby`` at medium key cardinality (the hash-shuffle
    aggregator actors cost more than the partials they move; same
    finding as the pricing_summary coalesce, generalized to keyed
    output).  Contract: ``ds`` must already be PRE-REDUCED partials
    (e.g. per-block ``pa.Table.group_by`` output) so each repartition
    block is bounded by distinct-keys, not raw rows — feed raw rows
    through a per-block partial first.  Output columns: keys then one
    column per agg, named after its source column."""
    import pyarrow as pa  # local: keep module import surface unchanged

    co = ds.repartition(num_partitions, keys=list(keys))
    out_names = list(keys) + [c for c, _ in aggs]

    def fn(t: pa.Table):
        if t.num_rows == 0 or keys[0] not in t.schema.names:
            return
        g = t.group_by(list(keys)).aggregate(list(aggs))
        yield g.rename_columns(out_names)

    return co.map_batches(fn, batch_size=None, batch_format="pyarrow")


def salted_sum(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    salt: int = 8,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """Skew-safe ``groupby(key).sum(value)``: rows are first combined
    under ``(key, salt)`` — bounding any hot key's fan-in per reducer to
    ``salt`` partials — then the tiny salted partials are re-summed per
    key (SURVEY.md §4.2 heavy-hitter mitigation; the shard-actor solve
    path gets the same effect from its map-side combine, which bounds a
    hot dst's fan-in to Q shard partials).

    The salt is derived from a row hash, not randomness, so results are
    deterministic."""
    import numpy as np
    import pyarrow as pa

    def add_salt(t):
        if t.num_rows == 0 or key not in t.schema.names:
            return
        # cheap deterministic per-row salt: row position within block
        s = np.arange(len(t), dtype=np.int64) % salt
        yield t.append_column("__salt", pa.array(s))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partial = salted.groupby([key, "__salt"], num_partitions=num_partitions).sum(
        value
    )
    col = f"sum({value})"

    def unsalt(t):
        if t.num_rows == 0 or col not in t.schema.names:
            return
        yield t.select([key, col]).rename_columns([key, value])

    partial = partial.map_batches(unsalt, batch_format="pyarrow")
    out = partial.groupby(key, num_partitions=num_partitions).sum(value)

    def rename(t):
        if t.num_rows == 0:
            return
        yield t.rename_columns([key, f"sum_{value}"])

    return out.map_batches(rename, batch_format="pyarrow")


def triu_pair_indices(sizes):
    """Vectorized ``np.triu_indices(s, k=1)`` across variable-size
    segments laid end-to-end in one global array: given per-segment
    element counts, return ``(a, b, seg)`` — GLOBAL positions of every
    within-segment pair with local ``i < j``, plus each pair's segment
    id.  This is the block kernel that replaces the per-group pandas
    ``grouped_map`` calls in the bucket-pairing stages (LSH candidate
    pairs, SimHash buckets, embedding near-dups, the wedge fallback):
    one call expands EVERY bucket in a block, no Python per group.

    Derivation: the element at local index l pairs as the RIGHT side
    with the l elements before it, so pair counts per element are the
    local indices themselves and both sides come from two segmented
    aranges."""
    import numpy as np

    sizes = np.asarray(sizes, np.int64)
    n = int(sizes.sum())
    starts = np.cumsum(sizes) - sizes
    local = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    b = np.repeat(np.arange(n, dtype=np.int64), local)
    elem_start = np.repeat(starts, sizes)
    off = np.arange(int(local.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(local) - local, local
    )
    a = np.repeat(elem_start, local) + off
    seg = np.repeat(
        np.repeat(np.arange(len(sizes), dtype=np.int64), sizes), local
    )
    return a, b, seg


def segment_starts(*key_arrays):
    """Boundary positions of equal-key runs in parallel sorted arrays:
    returns (starts, sizes).  Callers must have lexsorted the arrays
    by these keys already."""
    import numpy as np

    ks = [np.asarray(k) for k in key_arrays]
    n = len(ks[0])
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    new = np.zeros(n, bool)
    new[0] = True
    for k in ks:
        new[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, n])
    return starts, sizes


