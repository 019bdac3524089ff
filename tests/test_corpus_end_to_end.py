"""End-to-end flagship pipeline vs the numpy oracle on the sf0.001
synthetic corpus (SURVEY.md §5.2 item 4): corpus → derived edges →
graph → PageRank must match the reference-exact oracle on the SAME
derived edge list, including the iteration count; CC partitions must
match networkx."""

import collections

import pytest

from oracle import oracle_components, oracle_pagerank_by_name
from rayrank.components import connected_components
from rayrank.corpus import default_corpus_dir, generate_corpus
from rayrank.graph import build_graph
from rayrank.ingest import derive_edges, read_corpus
from rayrank.pagerank import power_method


@pytest.fixture(scope="module")
def corpus_edges(tmp_path_factory):
    cdir = generate_corpus(str(tmp_path_factory.mktemp("c") / "sf"), sf=0.001)
    ds = derive_edges(read_corpus(cdir), num_partitions=8).materialize()
    edges = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        edges.extend(
            zip(b.column("src_name").to_pylist(), b.column("dst_name").to_pylist())
        )
    return ds, sorted(edges)


def test_flagship_pagerank_matches_oracle(corpus_edges, tmp_path):
    ds, edges = corpus_edges
    gdir = str(tmp_path / "g")
    meta = build_graph(ds, gdir, num_partitions=8)
    res = power_method(gdir)
    assert res.converged

    want, want_iters = oracle_pagerank_by_name(edges)
    assert res.iterations == want_iters
    got = res.scores_by_name(gdir)
    assert set(got) == set(want)
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_flagship_components_match_networkx(corpus_edges, tmp_path):
    ds, edges = corpus_edges
    gdir = str(tmp_path / "u")
    build_graph(ds, gdir, num_partitions=8, undirected=True)
    cc = connected_components(gdir)
    assert cc.converged
    groups = collections.defaultdict(set)
    for nm, lb in cc.labels_by_name(gdir).items():
        groups[lb].add(nm)
    assert {frozenset(g) for g in groups.values()} == {
        frozenset(c) for c in oracle_components(edges)
    }
