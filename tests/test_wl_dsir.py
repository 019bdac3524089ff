"""WL color refinement + DSIR importance weights.

Exactness vs DuckDB is covered by test_entry_queries (both ops are
SQL-checked); these tests pin the op-level properties the oracle can't
state: WL's refinement invariants and the featurizer's instance counts.
"""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_feat_block_counts():
    from rayrank.lm import DSIR_B, _feat_block
    from rayrank.text import _sorted_vocab

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "a", "  b  a  "]),
            "lang": pa.array(["en", "de", "fr"]),
        }
    )
    vocab = np.sort(np.array(["a", "b", "c"], dtype=object))
    rows, bkts = _feat_block(t, vocab)
    # unigrams: 3 + 1 + 2; bigrams (adjacent within doc): 2 + 0 + 1
    assert len(rows) == 6 + 3
    assert (bkts >= 0).all() and (bkts < DSIR_B).all()
    # features never cross documents
    assert set(rows.tolist()) == {0, 1, 2}
    uni = np.bincount(rows[:6], minlength=3)
    assert uni.tolist() == [3, 1, 2]
    bi = np.bincount(rows[6:], minlength=3)
    assert bi.tolist() == [2, 0, 1]
    # same token -> same bucket regardless of the carrying document
    _, ba = _feat_block(
        pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array(["a"])}),
        vocab,
    )
    _, bb = _feat_block(
        pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array(["a"])}),
        vocab,
    )
    assert ba.tolist() == bb.tolist()


def test_dsir_weights_deterministic_and_raw_only():
    import duckdb

    from rayrank.lm import DSIR_TARGET_LANG, dsir_weights

    rows = {r["doc_id"]: r["dsir_w"] for r in dsir_weights(SF).take_all()}
    con = duckdb.connect()
    langs = dict(
        con.sql(
            f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    assert rows  # non-degenerate
    for did in rows:
        assert langs[did] != DSIR_TARGET_LANG  # raw docs only
    # every non-target doc with >=1 token is scored
    n_raw = sum(1 for v in langs.values() if v != DSIR_TARGET_LANG)
    assert len(rows) == n_raw
    again = {r["doc_id"]: r["dsir_w"] for r in dsir_weights(SF).take_all()}
    assert rows == again


def test_wl_refinement_invariants():
    import duckdb

    from rayrank.wl import wl_refinement

    colors = {r["name"]: r["wl_color"] for r in wl_refinement(SF).take_all()}
    con = duckdb.connect()
    deg = dict(
        con.sql(
            f"""
            WITH raw AS (
              SELECT CAST(l_orderkey AS VARCHAR) s, CAST(l_partkey AS VARCHAR) t
              FROM read_parquet('{SF}/lineitem.parquet')
            ),
            und AS (
              SELECT DISTINCT a, b FROM (
                SELECT s AS a, t AS b FROM raw WHERE s <> t
                UNION ALL SELECT t, s FROM raw WHERE s <> t
              )
            )
            SELECT a, COUNT(*) FROM und GROUP BY a
            """
        ).fetchall()
    )
    # round 1 separates degree classes (l0 constant => msg = deg * g(1)):
    # 3 rounds can only refine further, so color equal => degree equal.
    class_deg: dict[int, int] = {}
    for v, c in colors.items():
        d = deg.get(v, 0)
        assert class_deg.setdefault(c, d) == d
    assert len(set(colors.values())) >= len(set(deg.values()))
