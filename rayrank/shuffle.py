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
      → map_batches(whole block)                # in-block pandas groupby

``repartition`` guarantees all rows of one key land in one output block
(possibly sharing it with other keys), which is exactly the contract a
grouped map needs.  Empty / schema-less blocks are skipped by the
mapper (a generator that yields nothing).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import ray.data

from . import NUM_PARTITIONS_DEFAULT


def grouped_map(
    ds: ray.data.Dataset,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """Apply ``fn`` to every key group (pandas in / pandas out — the
    ``map_groups`` contract), hash-partitioned, sort-free, safe with
    empty blocks.  Output blocks are pandas; follow with an arrow
    normalization map if the consumer unions with arrow data."""
    keys = list(keys)
    ds2 = ds.repartition(num_partitions, keys=keys)

    def apply(block):
        if block.num_rows == 0 or any(
            k not in block.schema.names for k in keys
        ):
            return
        df = block.to_pandas()
        outs = []
        for _, g in df.groupby(keys, sort=True, dropna=False):
            out = fn(g)
            if out is not None and len(out):
                outs.append(out)
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return ds2.map_batches(apply, batch_size=None, batch_format="pyarrow")
