"""Sequence packing (rayrank/packing.py) invariants beyond the SQL
oracle: the oracle pins capacity=256, so the parametrized capacity path
is checked here against a single-process numpy prefix sum."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrank.packing import pack_sequences, packed_sequence_stats

SF_DIR = "/root/testdata/sf0.001"


def _expected(capacity):
    t = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    doc = t.column("doc_id").to_numpy(zero_copy_only=False)
    n = np.array(
        [len(s.split()) for s in t.column("text").to_pylist()], dtype=np.int64
    )
    keep = n > 0
    doc, n = doc[keep], n[keep]
    order = np.argsort(doc)
    doc, n = doc[order], n[order]
    st = np.cumsum(n) - n
    return {
        int(d): (int(a), int(b))
        for d, a, b in zip(doc, st // capacity, (st + n - 1) // capacity)
    }


@pytest.mark.parametrize("capacity", [64, 1000])
def test_pack_sequences_capacity(capacity):
    got = pa.concat_tables(
        pack_sequences(SF_DIR, capacity=capacity).iter_batches(
            batch_format="pyarrow"
        )
    )
    m = {
        int(d): (int(a), int(b))
        for d, a, b in zip(
            got.column("doc_id").to_pylist(),
            got.column("seq_first").to_pylist(),
            got.column("seq_last").to_pylist(),
        )
    }
    assert m == _expected(capacity)


def test_packed_stats_conservation():
    capacity = 128
    stats = pa.concat_tables(
        packed_sequence_stats(SF_DIR, capacity=capacity).iter_batches(
            batch_format="pyarrow"
        )
    )
    exp = _expected(capacity)
    # total docs started == docs with tokens; stats group by seq_first
    assert sum(stats.column("docs_started").to_pylist()) == len(exp)
    seqs = set(stats.column("seq_id").to_pylist())
    assert seqs == {a for a, _ in exp.values()}
