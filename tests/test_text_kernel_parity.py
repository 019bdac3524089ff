"""The r4 vectorized text-analysis kernels (polars extract_all /
count_matches + bincount folds — no per-word Python) must stay
BIT-IDENTICAL to the per-row reference kernels they replaced: the
doc-quality oracle family hash-matches DuckDB on these exact floats,
so any drift in the regex semantics or float chains breaks the
correctness gate, not just performance.  Same discipline as the
batched-hasher parity test (r3).  No Ray needed."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrank.text import (
    LangId,
    QualityScorer,
    TokenCounter,
    langid_row_reference,
    quality_row_reference,
    token_counts_row_reference,
)

_QCOLS = [
    "n_chars_q",
    "punct_ratio",
    "stopword_ratio",
    "digit_ratio",
    "mean_word_len",
]

# empty / whitespace-only / unicode / apostrophes / punctuation-heavy /
# long / digit-heavy — the regex-semantics edge cases where Python re
# and the Rust regex crate could plausibly diverge
_TRICKY = [
    "",
    "   ",
    "the the THE the",
    "l'été était belle — naïve café 123",
    "a'b'c don't CAN'T",
    "....!!!",
    "der die das und ist",
    "x" * 600,
    "Tab\tnewline\nmix  spaces",
    "123 456 789",
    "ümlaut Wörter über",
]


def _tables():
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    tricky = pa.table(
        {
            "doc_id": pa.array(range(len(_TRICKY)), pa.int64()),
            "text": pa.array(_TRICKY),
        }
    )
    return [t, tricky]


@pytest.mark.parametrize("ti", [0, 1], ids=["corpus", "tricky"])
def test_token_counter_matches_row_reference(ti):
    t = _tables()[ti]
    out = TokenCounter()(t)
    for i, x in enumerate(t.column("text").to_pylist()):
        ws, bpe = token_counts_row_reference(x)
        assert out.column("ws_tokens")[i].as_py() == ws, (i, x)
        assert out.column("re_tokens")[i].as_py() == bpe, (i, x)


@pytest.mark.parametrize("ti", [0, 1], ids=["corpus", "tricky"])
def test_langid_matches_row_reference_bit_exact(ti):
    t = _tables()[ti]
    out = LangId()(t)
    for i, x in enumerate(t.column("text").to_pylist()):
        lg, sc = langid_row_reference(x)
        assert out.column("lang_pred")[i].as_py() == lg, (i, x)
        got = out.column("lang_score")[i].as_py()
        assert got == sc, (i, x, got, sc)  # == on floats: bit parity


@pytest.mark.parametrize("ti", [0, 1], ids=["corpus", "tricky"])
def test_quality_matches_row_reference_bit_exact(ti):
    t = _tables()[ti]
    out = QualityScorer()(t)
    for i, x in enumerate(t.column("text").to_pylist()):
        ref = quality_row_reference(x)
        for c, rv in zip(_QCOLS, ref):
            gv = out.column(c)[i].as_py()
            assert gv == rv, (i, c, x, gv, rv)


def test_quality_score_formula_unchanged():
    """The fused [0,1] score is a pure numpy expression over the five
    feature columns; pin it against an independent recomputation so a
    formula edit cannot hide inside the vectorization."""
    t = _tables()[1]
    out = QualityScorer()(t)
    length = out.column("n_chars_q").to_numpy().astype(np.float64)
    score = (
        0.35 * np.clip(length / 500.0, 0, 1)
        + 0.25 * np.clip(out.column("stopword_ratio").to_numpy() / 0.4, 0, 1)
        + 0.20 * (1 - np.clip(out.column("punct_ratio").to_numpy() / 0.3, 0, 1))
        + 0.20 * (1 - np.clip(out.column("digit_ratio").to_numpy() / 0.3, 0, 1))
    ) * (length > 0)
    assert np.array_equal(out.column("quality").to_numpy(), score)


def test_known_engine_divergence_pinned():
    """The batched kernels' bit-parity contract is ASCII/NFC text
    (pinned in rayrank/text.py above _WORD_PAT): Python re and Rust
    regex DISAGREE on \\x1c-class whitespace (Python str-whitespace,
    not Unicode White_Space) and NFD combining marks (\\w vs \\p{M}).
    This test PINS the divergence on representative inputs so an
    engine change on either side is caught — it asserts the two paths
    differ exactly where documented, not that they agree."""
    cases = ["a\x1cb c", "café naive"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(cases)), pa.int64()),
            "text": pa.array(cases),
        }
    )
    tc = TokenCounter()(t)
    # \x1c: str.split() sees 3 tokens, Rust \S+ sees 2
    assert token_counts_row_reference(cases[0])[0] == 3
    assert tc.column("ws_tokens")[0].as_py() == 2
    # NFD: Python \w splits at the combining mark (3 regex tokens),
    # Rust keeps the word whole (2)
    assert token_counts_row_reference(cases[1])[1] == 3
    assert tc.column("re_tokens")[1].as_py() == 2
