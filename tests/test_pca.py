"""PCA top-component: distributed moment fold + driver power iteration
vs a single-process numpy mirror (same init/sign rule) and vs the
eigendecomposition ground truth."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rayrank.ann import pca_top_component

SF_DIR = "/root/testdata/sf0.001"


def _X():
    t = pq.read_table(SF_DIR + "/embeddings.parquet", columns=["embedding"])
    return np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)


def test_matches_numpy_eig():
    got = pa.concat_tables(
        pca_top_component(SF_DIR).iter_batches(batch_format="pyarrow")
    )
    v = np.array(got.column("loading").to_pylist())
    eig = got.column("eigval").to_pylist()[0]
    dims = got.column("dim").to_pylist()
    assert dims == list(range(len(v)))
    x = _X()
    cov = np.cov(x, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    if top[np.argmax(np.abs(top))] < 0:
        top = -top
    assert np.allclose(eig, w[-1], rtol=1e-8)
    assert np.allclose(v, top, atol=1e-6)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
