"""The fused single-pass text stage (rayrank.text.TextFeatures) must be
BIT-identical to the three chained stages it replaces (TokenCounter →
QualityScorer → LangId) — fusion is plumbing, not math (r4 VERDICT
item #3: the chain crossed the object store 3×; the kernels were
already bit-parity-locked against the per-row references).

No Ray needed: the stages are plain callables over pyarrow tables.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rayrank.text import LangId, QualityScorer, TextFeatures, TokenCounter

EDGE_TEXTS = [
    "",
    " ",
    "the the the",
    "le la les et en une",
    "der die und ist nicht",
    "el la los y en que",
    "12345 !!! ???",
    "word",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "punctuation, heavy; text: with! lots? of. marks...",
    "MIXED Case Words And THE THE of of",
    "x" * 600,
]


def _chained(batch: pa.Table) -> pa.Table:
    return LangId()(QualityScorer()(TokenCounter()(batch)))


def _assert_tables_bitequal(a: pa.Table, b: pa.Table):
    assert set(a.schema.names) == set(b.schema.names)
    for name in a.schema.names:
        ca = a.column(name).combine_chunks()
        cb = b.column(name).combine_chunks()
        if pa.types.is_floating(ca.type):
            va = ca.to_numpy(zero_copy_only=False)
            vb = cb.to_numpy(zero_copy_only=False)
            # bit equality, not allclose: fusion must not change a ulp
            assert np.array_equal(
                va.view(np.int64), vb.view(np.int64)
            ), name
        else:
            assert ca.equals(cb), name


def test_fused_matches_chain_on_edge_cases():
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(EDGE_TEXTS)), pa.int64()),
            "text": pa.array(EDGE_TEXTS, pa.string()),
        }
    )
    _assert_tables_bitequal(TextFeatures()(batch), _chained(batch))


def test_fused_matches_chain_on_corpus():
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    _assert_tables_bitequal(TextFeatures()(t), _chained(t))


def test_fused_column_order_is_chain_order():
    """Downstream select_columns don't depend on order, but the fused
    stage keeps the chain's append order so schemas compare equal for
    any consumer that does."""
    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()),
         "text": pa.array(["hello world"], pa.string())}
    )
    assert TextFeatures()(batch).schema.names == _chained(batch).schema.names


def test_fused_without_tokens_matches_quality_langid_chain():
    """include_tokens=False must equal the QualityScorer → LangId
    chain exactly (the doc_quality-family shape — TokenCounter never
    ran there pre-fusion)."""
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    got = TextFeatures(include_tokens=False)(t)
    want = LangId()(QualityScorer()(t))
    assert got.schema.names == want.schema.names
    _assert_tables_bitequal(got, want)
