"""IVF ANN: exactness at full probe, determinism, recall on clustered
data, and centroid-trainer sanity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rayrank.ann import brute_force_topk, ivf_centroids, ivf_topk


def _clustered(n_clusters=4, per=50, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    vecs, ids = [], []
    for c in range(n_clusters):
        vecs.append(centers[c] + rng.standard_normal((per, dim)) * 0.3)
        ids.extend(range(c * per, c * per + per))
    x = np.concatenate(vecs)
    return np.asarray(ids, np.int64), x, centers


def _ds(ids, x):
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.ravel(), pa.float64()), x.shape[1]
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def _rows(ds):
    return sorted(
        (r["query_id"], r["vec_id"], round(r["cosine"], 9))
        for r in ds.take_all()
    )


@pytest.fixture(scope="module")
def corpus():
    ids, x, centers = _clustered()
    return ids, x, centers


def test_full_probe_equals_brute_force(corpus):
    ids, x, centers = corpus
    ds = _ds(ids, x)
    q = x[[0, 57, 103]]
    exact = _rows(brute_force_topk(ds, q, k=7))
    full = _rows(ivf_topk(ds, q, k=7, n_centroids=8, nprobe=8, iters=2))
    assert full == exact


def test_recall_on_clustered_data(corpus):
    ids, x, centers = corpus
    ds = _ds(ids, x)
    q = centers + 0.1  # near cluster centers
    exact = brute_force_topk(ds, q, k=10).take_all()
    approx = ivf_topk(ds, q, k=10, n_centroids=4, nprobe=1, iters=4).take_all()
    want = {(r["query_id"], r["vec_id"]) for r in exact}
    got = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall


def test_centroids_deterministic_and_separating(corpus):
    ids, x, centers = corpus
    ds = _ds(ids, x)
    c1 = ivf_centroids(ds, n_centroids=8, iters=4)
    c2 = ivf_centroids(ds, n_centroids=8, iters=4)
    np.testing.assert_array_equal(c1, c2)
    # with centroids ≥ 2× the true cluster count, the trained quantizer
    # must separate the 4 true clusters (k = cluster-count exactly can
    # legitimately merge two clusters in a Lloyd local optimum)
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.argmax(cn @ c1.T, axis=1)
    assert len(set(assign.tolist())) == 4


def test_probe_subset_scores_only_probed_lists(corpus):
    """With nprobe=1 every hit must belong to the query's own probed
    centroid list (classic IVF semantics, not a union filter)."""
    ids, x, centers = corpus
    ds = _ds(ids, x)
    cent = ivf_centroids(ds, n_centroids=4, iters=4)
    q = centers[:2] + 0.05
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probe_of_query = np.argmax(qn @ cent.T, axis=1)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    assign = np.argmax(xn @ cent.T, axis=1)
    list_of_vec = dict(zip(ids.tolist(), assign.tolist()))
    out = ivf_topk(
        ds, q, k=5, n_centroids=4, nprobe=1, iters=4, centroids=cent
    ).take_all()
    assert len(out) > 0
    for r in out:
        assert list_of_vec[r["vec_id"]] == probe_of_query[r["query_id"]]


def test_scalar_quantize_known_codes():
    from rayrank.ann import scalar_quantize

    emb = [
        [0.0, 10.0],
        [1.0, 20.0],
        [2.0, 30.0],
        [4.0, 50.0],
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
            }
        )
    )
    got = {r["vec_id"]: r for r in scalar_quantize(ds).take_all()}
    # dim0: lo=0 hi=4 → codes 0, 63, 127, 255; dim1: lo=10 hi=50 → 0, 63, 127, 255
    import numpy as np

    m = np.asarray(emb, np.float64)
    lo, hi = m.min(axis=0), m.max(axis=0)
    codes = np.minimum(np.floor((m - lo) * 255.0 / (hi - lo)), 255.0).astype(int)
    for i in range(4):
        assert got[i]["code_sum"] == codes[i].sum()
        assert got[i]["code_min"] == codes[i].min()
        assert got[i]["code_max"] == codes[i].max()
    assert got[3]["code_min"] == 255 and got[3]["code_max"] == 255


def test_mutual_knn_pairs_brute_force(tmp_path):
    import pyarrow.parquet as pq

    from rayrank.ann import mutual_knn_pairs

    rng = np.random.default_rng(31)
    n, d, k = 24, 6, 3
    m = rng.normal(size=(n, d))
    m[5] = m[2]  # exact duplicate pair → guaranteed mutual
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in m],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    # python mirror: exact cosine, (cos desc, id asc), self excluded
    x = np.asarray(
        [np.asarray(r, np.float64) for r in t.column("embedding").to_pylist()]
    )
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    top = {}
    for i in range(n):
        cand = [(-sims[i, j], j) for j in range(n) if j != i]
        cand.sort()
        top[i] = {j for _, j in cand[:k]}
    want = {
        (a, b)
        for a in range(n)
        for b in top[a]
        if a < b and a in top[b]
    }
    got = {
        (r["a"], r["b"])
        for b_ in mutual_knn_pairs(str(tmp_path), k=k).iter_batches(
            batch_format="pyarrow"
        )
        for r in b_.to_pylist()
    }
    assert got == want and (2, 5) in got


def test_semantic_dedup_mirror_and_flags(tmp_path):
    """semantic_dedup's distributed plumbing must equal a numpy mirror
    built from the SAME trained centroids (assign → min-id keeper →
    cosine-vs-keeper threshold), keepers must never be flagged, and a
    planted same-direction copy of a keeper must be flagged."""
    import pyarrow.parquet as pq

    from rayrank.ann import _normalize, semantic_dedup

    ids, x, _ = _clustered()
    # plant exact-direction duplicates of the first five vectors
    x2 = np.vstack([x, x[:5] * 1.001])
    ids2 = np.r_[ids, np.arange(10_000, 10_005)]
    t = pa.table(
        {
            "vec_id": pa.array(ids2),
            "embedding": pa.array(
                [list(map(float, row)) for row in x2],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    # train once, share the centroids between the op and the mirror
    cent = ivf_centroids(
        ray.data.read_parquet(str(tmp_path / "embeddings.parquet")),
        n_centroids=8,
    )
    res = {
        r["vec_id"]: (r["cluster"], r["keeper_id"], r["cos_keeper"], r["is_dup"])
        for r in semantic_dedup(
            str(tmp_path), n_centroids=8, tau=0.999, centroids=cent
        ).take_all()
    }
    assert len(res) == len(ids2)
    xn = _normalize(np.asarray([list(map(float, r)) for r in x2.astype(np.float32)]))
    a = np.argmax(xn @ cent.T, axis=1)
    keeper = {}
    for i, c in zip(ids2, a):
        keeper[c] = min(keeper.get(c, i), i)
    n_dup = 0
    for j, (i, c) in enumerate(zip(ids2, a)):
        kid = keeper[c]
        kvec = xn[np.flatnonzero(ids2 == kid)[0]]
        cos = float(xn[j] @ kvec)
        dup = int(cos >= 0.999 and i != kid)
        n_dup += dup
        got = res[i]
        assert got[0] == c and got[1] == kid and got[3] == dup
        assert abs(got[2] - cos) < 1e-9
        if i == kid:
            assert got[3] == 0
    assert n_dup >= 1  # planted copies must be caught


def test_ivf_recall_full_probe_is_exact():
    """nprobe == n_centroids degrades IVF to brute force, so the recall
    audit must report exactly 10^6 per query; partial probing must
    never exceed it."""
    from rayrank.pipelines import ivf_recall

    sf_dir = "/root/testdata/sf0.001"
    full = ivf_recall(sf_dir, nprobe=16, n_centroids=16).take_all()
    assert full and all(r["recall_ppm"] == 10**6 for r in full)
    part = ivf_recall(sf_dir, nprobe=2, n_centroids=16).take_all()
    assert all(r["recall_ppm"] <= 10**6 for r in part)
