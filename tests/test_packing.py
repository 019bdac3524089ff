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


def test_shuffle_order_is_permutation():
    from rayrank.packing import shuffle_order
    from rayrank.sketch import splitmix64

    got = pa.concat_tables(
        shuffle_order(SF_DIR, bits=4).iter_batches(batch_format="pyarrow")
    )
    doc = np.array(got.column("doc_id").to_pylist())
    pos = np.array(got.column("pos").to_pylist())
    assert sorted(pos) == list(range(len(doc)))  # total 0-based permutation
    # rank order == splitmix64 order regardless of bucket width
    h = splitmix64(doc.astype(np.uint64))
    assert list(doc[np.argsort(pos)]) == list(doc[np.argsort(h)])


def test_mixture_sample_budget_rule():
    from rayrank.packing import mixture_sample
    from rayrank.sketch import splitmix64

    got = pa.concat_tables(
        mixture_sample(SF_DIR).iter_batches(batch_format="pyarrow")
    ).to_pandas()
    exp = _expected(1)  # doc -> (anything); reuse for token counts
    t = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["doc_id", "text", "source"]
    ).to_pandas()
    t["n"] = [len(s.split()) for s in t["text"]]
    t = t[t["n"] > 0].copy()
    t["h"] = splitmix64(t["doc_id"].to_numpy().astype(np.uint64))
    kept = set()
    for src, g in t.groupby("source"):
        g = g.sort_values("h")
        bud = int(g["n"].sum()) // 2
        cum = g["n"].cumsum()
        kept |= set(g.loc[cum <= bud, "doc_id"])
    assert set(got["doc_id"]) == kept
    # every kept row carries its true token count
    m = dict(zip(t["doc_id"], t["n"]))
    assert all(m[d] == n for d, n in zip(got["doc_id"], got["n_tokens"]))


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


def test_doc_chunks_windows(tmp_path):
    import pyarrow.parquet as pq

    from rayrank.packing import CHUNK_LEN, CHUNK_STRIDE, doc_chunks

    texts = {
        1: " ".join(["t"] * 5),           # 1 chunk of 5
        2: " ".join(["t"] * CHUNK_LEN),   # exactly one full window
        3: " ".join(["t"] * (CHUNK_LEN + 1)),  # 2 chunks, 2nd short
        4: " ".join(["t"] * 100),
        5: "",                            # excluded (0 tokens)
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["chunk_tokens"])
        for b in doc_chunks(str(tmp_path)).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    want = []
    for d, s in texts.items():
        n = len(s.split())
        if n == 0:
            continue
        cnt = 1 + max(0, -(-(n - CHUNK_LEN) // CHUNK_STRIDE)) if n > CHUNK_LEN else 1
        for c in range(cnt):
            start = c * CHUNK_STRIDE
            want.append((d, c, start, min(n - start, CHUNK_LEN)))
    assert got == sorted(want)


def test_holdout_contamination_planted(tmp_path):
    """Planted cross-split duplicates must be counted: pick doc_ids
    whose splitmix64 hash lands in train vs test, give a train/test
    pair identical canonical text (differing only in case/punct), and
    check (n_test, n_contaminated) per source."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayrank.packing import (
        SPLIT_TRAIN_T,
        SPLIT_VAL_T,
        holdout_contamination,
    )
    from rayrank.sketch import splitmix64

    ids = np.arange(0, 4000, dtype=np.uint64)
    z = splitmix64(ids)
    train_ids = ids[z < np.uint64(SPLIT_TRAIN_T)][:3].astype(np.int64)
    test_ids = ids[z >= np.uint64(SPLIT_VAL_T)][:3].astype(np.int64)
    assert len(train_ids) == 3 and len(test_ids) == 3

    # test doc 0 duplicates train doc 0 modulo canonicalization;
    # test doc 1 duplicates train doc 1 exactly; test doc 2 is clean
    rows = {
        "doc_id": np.r_[train_ids, test_ids],
        "text": [
            "Hello, World!", "same exact text", "unique train three",
            "hello    world", "same exact text", "clean test doc",
        ],
        "source": ["a", "a", "a", "a", "b", "b"],
    }
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))

    got = {
        r["source"]: (r["n_test"], r["n_contaminated"])
        for r in holdout_contamination(str(d)).take_all()
    }
    assert got == {"a": (1, 1), "b": (2, 1)}
