"""The r5 incremental percolation machinery — ONE graph build + the
per-edge tag overlay + shard-side edge masking — must reproduce a
fresh-build-per-rate sweep exactly.  The entry mirror checks the
lineitem corpus against the SQL oracle; this planted test checks the
MECHANISM (tag alignment, masked gather, active census) against
networkx on a random graph where every rate kills a different edge
subset, including rates with a fully-dead graph."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray

networkx = pytest.importorskip("networkx")


def _planted_edges(rng, n_vertices=40, n_edges=90):
    u = rng.integers(0, n_vertices, n_edges)
    v = rng.integers(0, n_vertices, n_edges)
    keep = u != v
    lo = np.minimum(u[keep], v[keep]).astype(np.int64)
    hi = np.maximum(u[keep], v[keep]).astype(np.int64)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def test_edge_masked_cc_matches_networkx_per_rate(ray_session):
    from rayrank.graph import GraphMeta, build_graph
    from rayrank.iterate import iterate_labels
    from rayrank.pipelines import _write_edge_tags
    from rayrank.shards import create_shards
    from rayrank.sketch import splitmix64

    rng = np.random.default_rng(5)
    u, v = _planted_edges(rng)
    key = (u.astype(np.uint64) << np.uint64(31)) | v.astype(np.uint64)
    etag = (splitmix64(key) % np.uint64(100)).astype(np.int64)

    named = ray.data.from_arrow(
        pa.table(
            {
                "src_name": pa.array([str(x) for x in u]),
                "dst_name": pa.array([str(x) for x in v]),
                "etag": pa.array(etag),
            }
        )
    )
    gdir = tempfile.mkdtemp(prefix="rayrank_perc_test_")
    Q = 4
    build_graph(named, gdir, num_partitions=Q, undirected=True)
    meta = GraphMeta.load(os.path.join(gdir, "meta.json"))
    _write_edge_tags(named, gdir, os.path.join(gdir, "etags"), Q)

    shards = create_shards(gdir, meta)
    try:
        ray.get(
            [s.load_edge_tags.remote(os.path.join(gdir, "etags")) for s in shards]
        )
        # 0 and 100 are the degenerate extremes; the rest hit partial masks
        for rate in (0, 13, 37, 61, 88, 100):
            ray.get([s.set_edge_rate.remote(rate) for s in shards])
            n_alive = sum(
                ray.get([s.alive_edge_count.remote() for s in shards])
            )
            assert n_alive % 2 == 0
            alive_mask = etag < rate
            assert n_alive // 2 == int(alive_mask.sum())

            iterate_labels(
                gdir,
                gather_method="gather_min_edge_masked",
                reduce_method="reduce_min",
                max_iterations=200,
                shards=shards,
                algo_name="percolation_cc_test",
                init_fn=lambda sh: ray.get(
                    [s.init_labels.remote() for s in sh]
                ),
            )
            census = pa.concat_tables(
                ray.get([s.rate_label_census.remote() for s in shards])
            )
            got_sizes = sorted(
                census.group_by("label")
                .aggregate([("n", "sum")])
                .column("n_sum")
                .to_pylist()
            )
            g = networkx.Graph()
            g.add_edges_from(zip(u[alive_mask], v[alive_mask]))
            want_sizes = sorted(
                len(c) for c in networkx.connected_components(g)
            )
            assert got_sizes == want_sizes, f"rate={rate}"
    finally:
        for s in shards:
            ray.kill(s)


def test_edge_tag_overlay_mismatch_raises(ray_session):
    """A wrong overlay (tags written for a DIFFERENT edge set) must
    raise at load, never silently mask the wrong edges."""
    from rayrank.graph import GraphMeta, build_graph
    from rayrank.pipelines import _write_edge_tags
    from rayrank.shards import create_shards

    rng = np.random.default_rng(9)
    u, v = _planted_edges(rng)

    def named(uu, vv, tags):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src_name": pa.array([str(x) for x in uu]),
                    "dst_name": pa.array([str(x) for x in vv]),
                    "etag": pa.array(tags, pa.int64()),
                }
            )
        )

    gdir = tempfile.mkdtemp(prefix="rayrank_perc_mismatch_")
    Q = 4
    tags = np.zeros(len(u), np.int64)
    build_graph(named(u, v, tags), gdir, num_partitions=Q, undirected=True)
    # overlay built from a PRUNED edge stream — one edge missing
    _write_edge_tags(
        named(u[:-1], v[:-1], tags[:-1]),
        gdir, os.path.join(gdir, "etags"), Q,
    )
    meta = GraphMeta.load(os.path.join(gdir, "meta.json"))
    shards = create_shards(gdir, meta)
    try:
        with pytest.raises(Exception, match="does not match"):
            ray.get(
                [
                    s.load_edge_tags.remote(os.path.join(gdir, "etags"))
                    for s in shards
                ]
            )
    finally:
        for s in shards:
            ray.kill(s)
