"""Both verify paths of the similarity self-join must agree: the
broadcast-lookup fast path (corpus fits JJ_BLOB_BCAST_LIMIT) and the
partitioned blob-join fallback (forced here by monkeypatching the
guard to 0).  The sf0.001 corpus exercises the fast path everywhere
else, so this is the only coverage the fallback joins get."""

import pytest

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted(
        (
            (r["doc_a"], r["doc_b"], r["inter_size"], r["union_size"])
            for r in ds.take_all()
        )
    )


def test_merge_inter_counts_matches_set_intersection():
    """Property test of the merge-count kernel against per-pair python
    set arithmetic on 50 random ragged pairings (no Ray needed)."""
    import numpy as np

    from rayrank.text import _merge_inter_counts

    rng = np.random.RandomState(7)
    for _ in range(50):
        n_pairs = int(rng.randint(1, 40))
        cnt_a = rng.randint(0, 30, n_pairs)
        cnt_b = rng.randint(0, 30, n_pairs)
        # distinct values per side, overlapping domains
        va = np.concatenate(
            [rng.choice(100, c, replace=False) for c in cnt_a]
        ).astype(np.int64) if cnt_a.sum() else np.zeros(0, np.int64)
        vb = np.concatenate(
            [rng.choice(100, c, replace=False) for c in cnt_b]
        ).astype(np.int64) if cnt_b.sum() else np.zeros(0, np.int64)
        got = _merge_inter_counts(n_pairs, cnt_a, va, cnt_b, vb)
        sa = np.r_[0, np.cumsum(cnt_a)]
        sb = np.r_[0, np.cumsum(cnt_b)]
        want = [
            len(set(va[sa[i]:sa[i + 1]]) & set(vb[sb[i]:sb[i + 1]]))
            for i in range(n_pairs)
        ]
        assert got.tolist() == want


def test_blob_roundtrip():
    """_corpus_blob_table's packing is inverted exactly by
    _blob_values, including a sliced (nonzero-offset) column."""
    import numpy as np
    import pyarrow as pa

    from rayrank.text import _blob_values

    rng = np.random.RandomState(3)
    sizes = rng.randint(1, 9, 20)
    flat = rng.randint(-(2**62), 2**62, int(sizes.sum())).astype(np.int64)
    offsets = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes * 8, out=offsets[1:])
    arr = pa.Array.from_buffers(
        pa.large_binary(), len(sizes),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(flat.astype("<i8").tobytes())],
    )
    cnt, vals = _blob_values(arr)
    assert cnt.tolist() == sizes.tolist()
    assert np.array_equal(vals, flat)
    # sliced view: offsets no longer start at element 0
    sl = arr.slice(5, 10)
    cnt2, vals2 = _blob_values(sl)
    assert cnt2.tolist() == sizes[5:15].tolist()
    lo = int(sizes[:5].sum())
    hi = lo + int(sizes[5:15].sum())
    assert np.array_equal(vals2, flat[lo:hi])


def test_fallback_join_path_matches_lookup(ray_session, monkeypatch):
    import rayrank.text as tx

    fast = _rows(tx.jaccard_join_pairs(SF))
    assert fast, "fixture must produce pairs or the test is vacuous"

    monkeypatch.setattr(tx, "JJ_BLOB_BCAST_LIMIT", 0)
    slow = _rows(tx.jaccard_join_pairs(SF))
    assert slow == fast


def test_fallback_candidate_filter_path(ray_session, monkeypatch):
    """Force BOTH the blob-join fallback AND the candidate semi-filter
    branch (ids is not None) so broadcast_semi_filter + the filtered
    blob build run."""
    import rayrank.text as tx

    fast = _rows(tx.lsh_candidate_jaccard(SF))
    monkeypatch.setattr(tx, "JJ_BLOB_BCAST_LIMIT", 0)
    slow = _rows(tx.lsh_candidate_jaccard(SF))
    assert slow == fast


def test_fallback_unfiltered_blob_hash_join(ray_session, monkeypatch):
    """Blob join with NEITHER broadcast lookup NOR candidate filter
    NOR acero broadcast (broadcast_join forced to decline): the pure
    partitioned hash_join regime a >4M-doc corpus with a huge
    candidate set would hit — the only coverage the keyed repartition
    of large_binary blob payloads gets."""
    import rayrank.joins as jn
    import rayrank.text as tx

    fast = _rows(tx.jaccard_join_pairs(SF))
    monkeypatch.setattr(tx, "JJ_BLOB_BCAST_LIMIT", 0)
    monkeypatch.setattr(tx, "JJ_CAND_ID_LIMIT", 0)
    monkeypatch.setattr(jn, "broadcast_join", lambda *a, **k: None)
    slow = _rows(tx.jaccard_join_pairs(SF))
    assert slow == fast


def test_lookup_verify_chunked_pair_loop(ray_session, monkeypatch):
    """A chunk cap far below any block's Σ(na+nb) forces the sub-batch
    loop inside lookup_verify through many iterations (including the
    hi = lo+1 single-pair floor when one pair alone exceeds the cap);
    results must be identical to the unchunked run."""
    import rayrank.text as tx

    fast = _rows(tx.jaccard_join_pairs(SF))
    assert fast, "fixture must produce pairs or the test is vacuous"
    monkeypatch.setattr(tx, "JJ_VERIFY_CHUNK_VALUES", 1)
    slow = _rows(tx.jaccard_join_pairs(SF))
    assert slow == fast


def test_both_verify_regimes_raise_on_missing_blob(ray_session, monkeypatch):
    """Identical corruption (a candidate doc id absent from the blob
    table) must fail the SAME way in both regimes: the broadcast
    lookup raises ValueError, and the join fallback's left joins +
    null check must raise the same message instead of silently
    dropping the pair (the pre-r4 inner joins did).  The victim doc
    is taken from a real candidate pair so the corruption is
    guaranteed to be observed."""
    import numpy as np
    import pytest
    import ray

    import rayrank.text as tx

    fast = _rows(tx.jaccard_join_pairs(SF))
    assert fast, "fixture must produce pairs or the test is vacuous"
    victim = fast[0][0]

    real_refs = tx._blob_lookup_refs

    def corrupt_refs(blobs):
        refs, m = real_refs(blobs)
        assert refs is not None, "sf0.001 must fit the broadcast guard"
        kd, kn, kst, kv = (ray.get(r) for r in refs)
        j = int(np.searchsorted(kd, victim))
        assert kd[j] == victim
        lo, hi = int(kst[j]), int(kst[j] + kn[j])
        kd2 = np.delete(kd, j)
        kn2 = np.delete(kn, j)
        kv2 = np.concatenate([kv[:lo], kv[hi:]])
        kst2 = np.cumsum(kn2) - kn2
        return (
            ray.put(kd2), ray.put(kn2), ray.put(kst2), ray.put(kv2)
        ), m

    monkeypatch.setattr(tx, "_blob_lookup_refs", corrupt_refs)
    with pytest.raises(Exception, match="missing from"):
        _rows(tx.jaccard_join_pairs(SF))
    monkeypatch.undo()

    # fallback regime: drop the same doc's blob row AFTER the lookup
    # guard declines (r5: ONE blob artifact feeds both the prefix
    # phase and the verify, so corrupting _corpus_blob_table itself
    # would remove the doc from the candidate chain too and nothing
    # would be left to miss it — the verify-side seam is the
    # materialized table _blob_lookup_refs hands the join fallback)
    real_refs2 = tx._blob_lookup_refs

    def corrupt_fallback_refs(blobs):
        import pyarrow.compute as pc

        from rayrank.shuffle import materialize_cut

        refs, m = real_refs2(blobs)
        assert refs is None, "JJ_BLOB_BCAST_LIMIT=0 must force fallback"

        def drop_victim(t):
            if t.num_rows == 0:
                return
            yield t.filter(pc.not_equal(t.column("doc_id"), victim))

        return None, materialize_cut(
            m.map_batches(drop_victim, batch_format="pyarrow")
        )

    monkeypatch.setattr(tx, "JJ_BLOB_BCAST_LIMIT", 0)
    monkeypatch.setattr(tx, "JJ_CAND_ID_LIMIT", 0)
    monkeypatch.setattr(tx, "_blob_lookup_refs", corrupt_fallback_refs)
    with pytest.raises(Exception, match="missing from"):
        _rows(tx.jaccard_join_pairs(SF))


def test_blob_build_chunked_gather_forced(ray_session, monkeypatch):
    """Force the build task's chunked reorder-gather through many
    chunks (including the hi = lo+1 single-doc floor) — the memory-
    bounded path a near-guard-limit corpus would take — and assert the
    lookup arrays equal a direct per-doc reconstruction."""
    import numpy as np
    import ray

    import rayrank.text as tx

    monkeypatch.setattr(tx, "JJ_BUILD_CHUNK_VALUES", 7)
    blobs = tx._corpus_blob_table(SF)
    refs, _m = tx._blob_lookup_refs(blobs)
    assert refs is not None
    kd, kn, kst, kv = (ray.get(r) for r in refs)
    assert np.array_equal(kd, np.sort(kd))
    assert np.array_equal(kst, np.cumsum(kn) - kn)
    # rebuild expected flat values directly from the blob table rows
    rows = {}
    for bt in blobs.iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        cnt, vals = tx._blob_values(bt.column("blob"))
        starts = np.cumsum(cnt) - cnt
        ids = bt.column("doc_id").to_numpy(zero_copy_only=False)
        for i, d in enumerate(ids):
            rows[int(d)] = vals[starts[i]: starts[i] + cnt[i]]
    want = np.concatenate([rows[int(d)] for d in kd])
    assert np.array_equal(kv, want)
