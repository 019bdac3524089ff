"""Unit tests for hash_sample and term-stat kernels (sf0.001 DuckDB
parity runs in test_entry_queries.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.sketch import hash_sample, splitmix64
from rayrank.terms import _token_pairs


def _ds(ids):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})
    ).repartition(3)


def test_hash_sample_deterministic_and_consistent():
    ids = list(range(1000))
    a = sorted(r["doc_id"] for r in hash_sample(_ds(ids), "doc_id", 0.25).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(_ds(ids), "doc_id", 0.25).take_all())
    assert a == b
    # matches the direct numpy predicate
    h = splitmix64(np.arange(1000, dtype=np.uint64))
    want = sorted(np.flatnonzero(h < np.uint64(1 << 62)).tolist())
    assert a == want
    # roughly a quarter
    assert 150 < len(a) < 350


def test_hash_sample_nested_subsets():
    """Smaller fractions select subsets of larger ones (same hash,
    lower threshold) — the property that keeps samples joinable."""
    ids = list(range(2000))
    s_small = {r["doc_id"] for r in hash_sample(_ds(ids), "doc_id", 0.125).take_all()}
    s_big = {r["doc_id"] for r in hash_sample(_ds(ids), "doc_id", 0.5).take_all()}
    assert s_small <= s_big


def test_hash_sample_bounds():
    ids = [1, 2, 3]
    assert len(hash_sample(_ds(ids), "doc_id", 1.0).take_all()) == 3
    assert len(hash_sample(_ds(ids), "doc_id", 0.0).take_all()) == 0
    with pytest.raises(ValueError):
        hash_sample(_ds(ids), "doc_id", 1.5)


def test_token_pairs_drops_empty_docs():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b  a", "", "   ", "c"], pa.string()),
        }
    )
    docs, terms = _token_pairs(t)
    assert docs.tolist() == [1, 1, 1, 4]
    assert terms.to_pylist() == ["a", "b", "a", "c"]


def test_span_dedup_stats_brute_force(tmp_path):
    """Interval-union coverage vs a per-doc brute-force mirror on a
    corpus with overlapping + disjoint duplicated passages."""
    import pyarrow.parquet as pq
    from rayrank.terms import span_dedup_stats

    texts = {
        1: "a b c d e f g h i j",          # shares a..g with doc 2
        2: "a b c d e f g x y z",
        3: "p q r s t u v w",              # unique
        4: "x y z a b c d q q q q q q",    # shares x y z + a b c d
        5: "q q q q q",                    # shares q-runs with doc 4
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    N = 4
    grams = {}
    for d, s in texts.items():
        tk = s.split()
        grams[d] = [" ".join(tk[i : i + N]) for i in range(len(tk) - N + 1)]
    df = {}
    for d, gs in grams.items():
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    want = {}
    for d, s in texts.items():
        tk = s.split()
        covered = set()
        for i, g in enumerate(grams[d]):
            if df[g] >= 2:
                covered.update(range(i, i + N))
        want[d] = (len(tk), len(covered))

    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for b in span_dedup_stats(str(tmp_path)).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert got == want


def test_span_dedup_stats_forced_fallback_paths(tmp_path, monkeypatch):
    """The at-scale regimes no test corpus reaches naturally: force the
    partitioned semi join (SPAN_DUP_BCAST_LIMIT=0) in BOTH gate
    branches — bloom prefilter ON (mostly-unique corpus: n_dup*2 <
    n_grams) and OFF (all-dup corpus of identical docs: gate skips) —
    and require row-identical output to the broadcast-lookup default.
    Guard-gated code must be forced-tested (the r3 jaccard rule)."""
    import pyarrow.parquet as pq

    import rayrank.terms as tm

    def corpus(d, texts):
        d.mkdir(exist_ok=True)
        t = pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array(
                    [texts[k] for k in sorted(texts)], pa.string()
                ),
            }
        )
        pq.write_table(t, str(d / "documents.parquet"))
        return str(d)

    def rows(ds):
        return sorted(
            (r["doc_id"], r["n_tokens"], r["covered_tokens"])
            for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )

    # mostly-unique corpus: few dup grams among many -> bloom gate ON
    sparse = corpus(tmp_path / "sparse", {
        1: "a b c d e f g h i j",
        2: "a b c d e f g x y z",
        3: "p q r s t u v w m n o k",
        4: "x y z a b c d q q q q q q",
        5: "k1 k2 k3 k4 k5 k6 k7 k8 k9",
    })
    # all-dup corpus: every gram dup -> gate skips bloom
    dense = corpus(tmp_path / "dense", {
        1: "a b c d e f g h",
        2: "a b c d e f g h",
    })

    for d in (sparse, dense):
        fast = rows(tm.span_dedup_stats(d))
        assert fast, "fixture must produce rows"
        monkeypatch.setattr(tm, "SPAN_DUP_BCAST_LIMIT", 0)
        assert rows(tm.span_dedup_stats(d)) == fast
        monkeypatch.undo()
