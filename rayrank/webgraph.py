"""CSV-parity ingest path: the reference's gzip-CSV edge reader as a
Ray Data pipeline (SURVEY.md §2.1 S1-S2, §2.2 M1).

Reproduced semantics:
  * header ``source,target`` CSV (gzip or plain);
  * ``max_nnz`` row cap INCLUDING the reference's off-by-one (it reads
    ``max_nnz + 1`` rows — pagerank.py:30-31 breaks when ``i >
    max_nnz``) — preserved deliberately for parity, applied BEFORE the
    regex filter, in file order;
  * non-leaf regex filter: drop edges where source OR target matches
    ``.*((/$)|(/.*/)).*`` (pagerank.py:32-35), vectorized;
  * downstream (ids, weights, filter_ratio, dangling) is the shared
    graph build — no sorted-input assumption (§3.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import NUM_PARTITIONS_DEFAULT
from .graph import GraphMeta, build_graph

NONLEAF_PATTERN = r".*((/$)|(/.*/)).*"


def read_edge_csv(path: str, max_nnz: int | None = None) -> ray.data.Dataset:
    kwargs = {}
    if path.endswith(".gz"):
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = ray.data.read_csv(path, **kwargs)
    if max_nnz is not None:
        ds = ds.limit(max_nnz + 1)  # reference off-by-one, preserved

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_name": t.column("source").cast(pa.string()),
                "dst_name": t.column("target").cast(pa.string()),
            }
        )

    return ds.map_batches(rename, batch_format="pyarrow")


def filter_nonleaf(edges: ray.data.Dataset) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        bad = pc.or_(
            pc.match_substring_regex(t.column("src_name"), NONLEAF_PATTERN),
            pc.match_substring_regex(t.column("dst_name"), NONLEAF_PATTERN),
        )
        return t.filter(pc.invert(bad))

    return edges.map_batches(fn, batch_format="pyarrow")


def build_webgraph(
    csv_path: str,
    out_dir: str,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
    filter_ratio: float | None = None,
    max_nnz: int | None = None,
    undirected: bool = False,
) -> GraphMeta:
    """WebGraph.__init__ end-to-end: CSV → cap → regex filter → shared
    partitioned graph build."""
    edges = filter_nonleaf(read_edge_csv(csv_path, max_nnz=max_nnz))
    return build_graph(
        edges,
        out_dir,
        num_partitions=num_partitions,
        filter_ratio=filter_ratio,
        undirected=undirected,
    )
