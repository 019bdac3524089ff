"""Training-data pipeline operators: text analysis, dedup family, ANN,
multimodal plumbing — vs driver-side python/numpy oracles."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from rayrank.ann import brute_force_topk, lsh_topk
from rayrank.multimodal import (
    DecodeStub,
    decode_features,
    sample_frames,
    synthetic_media,
)
from rayrank.text import (
    Fingerprinter,
    LangId,
    MinHasher,
    QualityScorer,
    SimHasher,
    TokenCounter,
    exact_dedup,
    minhash_dedup_clusters,
    simhash_candidates,
    with_text_sha256,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2, "the quick brown fox jumps over the lazy dog and walks far away home"),
    (3, "der hund läuft und die katze ist nicht da mit den anderen"),
    (4, "completely different text about ray data pipelines for training corpora"),
    (5, "le chat est dans la maison et les enfants sont pour le jardin"),
    (6, ""),
]


def docs_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    )


def rows_of(ds):
    return [r for b in ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()]


def test_exact_dedup():
    out = rows_of(exact_dedup(with_text_sha256(docs_ds())))
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 2, 3, 4, 5, 6]  # doc 1 deduped against doc 0


def test_exact_dedup_cross_block_min_of_mins():
    # duplicates split across MANY input blocks: the block-local
    # pre-combine keeps each block's min, the post-shuffle pass must
    # still pick the global min id per key
    texts = ["dup text alpha", "dup text beta", "unique gamma"]
    ids = list(range(30))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i % 2] if i != 7 else texts[2] for i in ids]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = rows_of(exact_dedup(with_text_sha256(ds)))
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 1, 7]  # min even id, min odd id, the unique row


def test_token_counts():
    out = {r["doc_id"]: r for r in rows_of(docs_ds().map_batches(
        TokenCounter, batch_format="pyarrow", concurrency=2))}
    import re

    word_re = re.compile(r"\w+|[^\w\s]", re.UNICODE)
    for did, text in DOCS:
        assert out[did]["ws_tokens"] == len(text.split())
        assert out[did]["re_tokens"] == len(word_re.findall(text))


def test_lang_id_and_quality():
    out = {r["doc_id"]: r for r in rows_of(docs_ds().map_batches(
        LangId, batch_format="pyarrow", concurrency=2))}
    assert out[0]["lang_pred"] == "en"
    assert out[3]["lang_pred"] == "de"
    assert out[5]["lang_pred"] == "fr"
    assert out[6]["lang_pred"] == "und"

    q = {r["doc_id"]: r for r in rows_of(docs_ds().map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=2))}
    for did, _ in DOCS:
        assert 0.0 <= q[did]["quality"] <= 1.0
    assert q[6]["quality"] == 0.0
    assert q[0]["quality"] > q[6]["quality"]


def test_fingerprint_deterministic():
    out1 = {r["doc_id"]: r["fingerprint"] for r in rows_of(
        docs_ds().map_batches(Fingerprinter, batch_format="pyarrow", concurrency=2))}
    out2 = {r["doc_id"]: r["fingerprint"] for r in rows_of(
        docs_ds().map_batches(Fingerprinter, batch_format="pyarrow", concurrency=2))}
    assert out1 == out2
    assert out1[0] == out1[1]          # identical text → identical fingerprint
    assert out1[0] != out1[4]


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=128)
    s0, s2 = mh.signature(DOCS[0][1]), mh.signature(DOCS[2][1])
    est = float((s0 == s2).mean())
    a = set(mh.shingle_hashes(DOCS[0][1]).tolist())
    b = set(mh.shingle_hashes(DOCS[2][1]).tolist())
    true_j = len(a & b) / len(a | b)
    assert est == pytest.approx(true_j, abs=0.15)
    assert (mh.signature(DOCS[0][1]) == mh.signature(DOCS[1][1])).all()


def test_batched_hashers_match_per_row_reference():
    """The r3 vectorized __call__ paths must reproduce the per-row
    reference kernels bit-for-bit (the signature hash chain is pinned:
    polars xxhash seed 0 → wrapped-uint64 permutation arithmetic)."""
    import numpy as np
    import pyarrow as pa

    texts = [t for _, t in DOCS] + [
        "", "   ", "one", "one two", "a  b   c", "tab\tsep\nnl mix",
        "x " * 97, "repeat repeat repeat",
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    mh = MinHasher(num_perm=64, shingle_k=3)
    got = (
        mh(batch).column("sig").combine_chunks().values
        .to_numpy(zero_copy_only=False).reshape(len(texts), 64)
    )
    ref = np.stack([mh.signature(t).astype(np.int64) for t in texts])
    assert (got == ref).all()

    sh = SimHasher()
    got_s = sh(batch).column("simhash").to_numpy(zero_copy_only=False)
    ref_s = np.array(
        [np.uint64(SimHasher.simhash(t)) for t in texts]
    ).astype(np.int64)
    assert (got_s == ref_s).all()


def test_minhash_dedup_clusters(tmp_path):
    out = {r["doc_id"]: r["cluster"] for r in rows_of(
        minhash_dedup_clusters(
            docs_ds(), threshold=0.5, work_dir=str(tmp_path / "g")
        )
    )}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6}
    assert out[0] == out[1] == out[2] == 0   # near-dup family clusters to min id
    for solo in (3, 4, 5, 6):
        assert out[solo] == solo


def test_simhash_candidates():
    out = rows_of(simhash_candidates(docs_ds(), max_hamming=6))
    pairs = {(r["a"], r["b"]): r["hamming"] for r in out}
    assert pairs[(0, 1)] == 0            # identical docs
    h0 = int(SimHasher.simhash(DOCS[0][1]))
    h2 = int(SimHasher.simhash(DOCS[2][1]))
    want = bin(h0 ^ h2).count("1")
    # 4×16-bit banding only GUARANTEES recall for hamming ≤ 3
    # (pigeonhole); beyond that a pair may legitimately share no chunk
    if want <= 3:
        assert pairs[(0, 2)] == want
    # every reported pair's hamming must be exact regardless
    for (a, b), hm in pairs.items():
        ha = int(SimHasher.simhash(DOCS[a][1]))
        hb = int(SimHasher.simhash(DOCS[b][1]))
        assert hm == bin(ha ^ hb).count("1")


EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_brute_force_topk_matches_numpy():
    t = pq.read_table(EMB)
    x = np.asarray(t.column("embedding").to_pylist(), np.float64)
    ids = t.column("vec_id").to_numpy()
    q = x[:3]
    ds = ray.data.read_parquet(EMB)
    out = rows_of(brute_force_topk(ds, q, k=5))
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ xn.T
    for qi in range(3):
        want = sorted(
            zip(ids.tolist(), sims[qi].tolist()), key=lambda p: (-p[1], p[0])
        )[:5]
        have = sorted(got[qi], key=lambda p: (-p[1], p[0]))
        assert [w[0] for w in want] == [h[0] for h in have]
        np.testing.assert_allclose(
            [w[1] for w in want], [h[1] for h in have], atol=1e-9
        )
        assert have[0][0] == ids[qi] and have[0][1] == pytest.approx(1.0)


def test_brute_force_topk_exact_ties_at_cutoff():
    # 12 identical vectors (all cosine == 1 to the query) spread over
    # several blocks with shuffled ids; top-5 must be the 5 SMALLEST
    # vec_ids — the (cosine desc, id asc) tie-break at the partition
    # cutoff, both block-locally and in the merge
    # one-hot vector: dot products and norms are exact in float64, so
    # every copy's cosine is EXACTLY 1.0 regardless of how BLAS orders
    # the per-block summation (a dense random vector is not tie-stable
    # across different block shapes)
    v = np.zeros(16)
    v[4] = 1.0
    ids = [50, 3, 41, 17, 8, 29, 5, 33, 12, 60, 2, 45]
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist()] * len(ids)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = rows_of(brute_force_topk(ds, v[None, :], k=5))
    got = [r["vec_id"] for r in out]
    assert got == sorted(ids)[:5]
    assert all(r["cosine"] == pytest.approx(1.0) for r in out)


def test_lsh_topk_self_retrieval():
    t = pq.read_table(EMB)
    x = np.asarray(t.column("embedding").to_pylist(), np.float64)
    ids = t.column("vec_id").to_numpy()
    q = x[:3]
    ds = ray.data.read_parquet(EMB)
    out = rows_of(lsh_topk(ds, q, k=5, planes=10, probes=3))
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for qi in range(3):
        assert len(got[qi]) <= 5
        top = max(got[qi], key=lambda p: p[1])
        assert top[0] == ids[qi] and top[1] == pytest.approx(1.0)
        # scores must be exact cosines (pruning approximates, scoring doesn't)
        for vid, cos in got[qi]:
            j = int(np.where(ids == vid)[0][0])
            assert cos == pytest.approx(
                float(xn[j] @ xn[qi]), abs=1e-9
            )


def test_embedding_near_dups():
    from rayrank.ann import embedding_near_dups

    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16))
    # rows 20/21 duplicate rows 0/1 exactly; row 22 = slightly noised row 2
    x = np.vstack([base, base[0], base[1], base[2] + 0.01 * rng.standard_normal(16)])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(x)), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in x]),
            }
        )
    )
    out = rows_of(embedding_near_dups(ds, threshold=0.99, planes=4))
    pairs = {(r["a"], r["b"]): r["cosine"] for r in out}
    assert pairs[(0, 20)] == pytest.approx(1.0)
    assert pairs[(1, 21)] == pytest.approx(1.0)
    assert (2, 22) in pairs and pairs[(2, 22)] > 0.99
    for (a, b), cos in pairs.items():
        assert cos >= 0.99 and a < b


def test_multimodal_decode_and_frames():
    media = ray.data.from_arrow(synthetic_media(20, seed=3))
    out = rows_of(decode_features(media, fake=True, concurrency=2))
    assert len(out) == 20
    stub = DecodeStub(fake=True)
    payloads = {
        r["media_id"]: r["payload"] for r in synthetic_media(20, seed=3).to_pylist()
    }
    for r in out:
        np.testing.assert_allclose(
            r["features"], stub.codec.decode(payloads[r["media_id"]])
        )
        assert r["payload_bytes"] == len(payloads[r["media_id"]])

    # the real-codec adapter exists behind the same interface; in this
    # codec-less container constructing it fails LOUDLY at init
    with pytest.raises(Exception, match="PIL|ImportError"):
        rows_of(decode_features(media, fake=False, concurrency=2))


def test_decode_schema_contract():
    """Fake double and any real codec share DECODE_FEATURES_SCHEMA by
    construction: DecodeStub builds the table, codecs only supply the
    feature vector — and the stub asserts the schema on every batch."""
    from rayrank.multimodal import (
        DECODE_FEATURES_SCHEMA,
        FakeCodec,
        N_DECODE_FEATURES,
        PillowCodec,
        synthetic_media,
    )

    batch = synthetic_media(5, seed=9)
    out = DecodeStub(fake=True)(batch)
    assert out.schema.equals(DECODE_FEATURES_SCHEMA)
    assert FakeCodec().decode(b"abc").shape == (N_DECODE_FEATURES,)
    try:
        codec = PillowCodec()
    except ImportError:
        return  # no codec in this container — the documented state
    # a host WITH Pillow must produce the same shape and thus schema
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 4)).save(buf, format="PNG")
    assert codec.decode(buf.getvalue()).shape == (N_DECODE_FEATURES,)

    frames = rows_of(sample_frames(media, num_frames=4, concurrency=2))
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r)
    for mid, rs in per.items():
        assert 1 <= len(rs) <= 4
        assert sorted(r["frame"] for r in rs) == list(range(len(rs)))


def test_candidate_pairs_truncation_flag():
    """No-silent-caps: buckets above max_bucket must surface the
    dropped-id count via the truncated column (r1 VERDICT finding #4)."""
    import pyarrow as pa
    import ray.data

    from rayrank.text import candidate_pairs

    n = 8
    t = pa.table(
        {
            "band": pa.array([0] * n + [1, 1], pa.int64()),
            "band_hash": pa.array([42] * n + [7, 7], pa.int64()),
            "doc_id": pa.array(list(range(n)) + [100, 101], pa.int64()),
        }
    )
    out = candidate_pairs(ray.data.from_arrow(t), max_bucket=5)
    rows = {(r["a"], r["b"]): r["truncated"] for b in out.iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()}
    big = {(a, b): tr for (a, b), tr in rows.items() if a < 50}
    small = {(a, b): tr for (a, b), tr in rows.items() if a >= 50}
    assert len(big) == 10  # C(5,2) after truncation
    assert all(tr == 3 for tr in big.values())  # 8 - 5 dropped, flagged
    assert small == {(100, 101): 0}


def test_simhash_bucket_cap_flag():
    """SimHash in-bucket pairing is capped AND flagged (r1 VERDICT
    finding #5: a degenerate boilerplate corpus must not go O(B²))."""
    import pyarrow as pa
    import ray.data

    from rayrank.text import simhash_candidates

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(12)), pa.int64()),
            "text": pa.array(["same boilerplate text here"] * 12, pa.string()),
        }
    )
    out = simhash_candidates(
        ray.data.from_arrow(docs), max_hamming=3, max_bucket=4
    )
    rows = [r for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    assert len(rows) == 6  # C(4,2) pairs survive the cap
    assert all(r["truncated"] == 8 for r in rows)  # 12 - 4, flagged
    assert all(r["hamming"] == 0 for r in rows)


def test_canonicalize_and_normalized_dedup():
    from rayrank.text import canonicalize

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "Hello, World!",
                    "hello   world",
                    "HELLO.world",
                    "a different doc",
                    "  hello world  ",
                ],
                pa.string(),
            ),
        }
    )
    ds = canonicalize(ray.data.from_arrow(tbl))
    canon = {r["doc_id"]: r["canon"] for r in rows_of(ds)}
    assert canon[0] == canon[1] == canon[2] == canon[4] == "hello world"
    assert canon[3] == "a different doc"
    out = rows_of(
        exact_dedup(
            with_text_sha256(ds, col="canon").select_columns(
                ["doc_id", "text_sha256"]
            )
        )
    )
    assert sorted(r["doc_id"] for r in out) == [0, 3]
