"""Query predicates, expansion, score fusion, top-k, and the CSV-parity
WebGraph path (SURVEY.md §2.2 M1/M4-M6, §2.6, §3.3)."""

import csv
import gzip
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from oracle import oracle_pagerank_by_name
from rayrank.pagerank import power_method
from rayrank.search import (
    DictEmbedding,
    NullEmbedding,
    expand_query,
    fuse_scores,
    personalization_vector,
    satisfies_mask,
    top_k,
)
from rayrank.webgraph import build_webgraph


def mask_one(url: str, query: str) -> bool:
    return bool(satisfies_mask(pa.array([url]), query)[0])


def test_plain_predicate_reference_doctests():
    # pagerank.py:217-233 cases that don't depend on expansion
    u = "www.lawfareblog.com/covid-19-speech"
    assert mask_one(u, "covid") is True
    assert mask_one(u, "covid -speech") is False
    assert mask_one(u, "covid -corona") is True
    assert mask_one(u, "-speech") is False
    assert mask_one(u, "-corona") is True
    assert mask_one(u, "") is True
    assert mask_one(u, "coronavirus") is False


def test_expansion():
    model = DictEmbedding({"covid": [("coronavirus", 0.9), ("pandemic", 0.8)]})
    q = expand_query("covid", model, topn=5)
    assert q.split() == ["covid", "coronavirus", "pandemic"]
    # dash-containing words are never expanded (pagerank.py:238-239)
    assert expand_query("covid-19", model).split() == ["covid-19"]
    assert expand_query("-covid", model).split() == ["-covid"]
    # OOV expands to nothing instead of crashing (documented divergence)
    assert expand_query("zzz", model).split() == ["zzz"]
    assert expand_query("zzz", NullEmbedding()).split() == ["zzz"]


def test_expanded_match():
    model = DictEmbedding({"corona": [("coronavirus", 0.9)]})
    u = "www.lawfareblog.com/coronavirus-update"
    q = expand_query("corona", model)
    assert mask_one(u, q) is True  # matched via the expansion


def test_fuse_and_topk():
    names = ["a/covid", "b/corona", "c/other"]
    scores = [0.3, 0.2, 0.5]
    ds = ray.data.from_arrow(
        pa.table({"name": pa.array(names), "score": pa.array(scores, pa.float64())})
    )
    model = DictEmbedding({"covid": [("corona", 0.9)] + [(f"w{i}", 0.1) for i in range(9)]})
    fused = {
        r["name"]: r["fused"]
        for b in fuse_scores(ds, "covid", model, sum_weight=0.03, power=2)
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    # scalar mirror of pagerank.py:154-174
    def expected(name, pr):
        number = weight = 0.0
        if "covid" in name:
            number += 1; weight += 0.03
        for w, sim in model.most_similar("covid", topn=10):
            if w in name:
                number += 1; weight += sim ** 2
        return pr + number * weight

    for nm, pr in zip(names, scores):
        assert fused[nm] == pytest.approx(expected(nm, pr), rel=1e-12)

    top = top_k(ds, query="covid", model=model, k=2, power=2).take_all()
    got_names = [r["name"] for r in top]
    # only names satisfying the expanded query (covid OR corona) survive
    assert got_names == sorted(
        [n for n in names if "covid" in n or "corona" in n],
        key=lambda n: fused[n],
        reverse=True,
    )[:2]


URL_EDGES = [
    ("site.com/a", "site.com/b"),
    ("site.com/a", "site.com/covid"),
    ("site.com/b", "site.com/covid"),
    ("site.com/covid", "site.com/a"),
    ("site.com/x/", "site.com/a"),        # dropped: source ends with /
    ("site.com/a", "site.com/d/e/f"),     # dropped: multi-segment target
    ("site.com/covid", "site.com/b"),
    ("site.com/b", "site.com/a"),
]


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("web")
    csv_path = str(base / "edges.csv.gz")
    with gzip.open(csv_path, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "target"])
        w.writerows(URL_EDGES)
    gdir = str(base / "graph")
    build_webgraph(csv_path, gdir, num_partitions=3)
    return gdir


def test_webgraph_regex_parity_and_scores(web_dir):
    want, _ = oracle_pagerank_by_name(URL_EDGES, apply_regex=True)
    res = power_method(web_dir)
    got = res.scores_by_name(web_dir)
    assert set(got) == set(want)  # filtered URLs never got vertices
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)


def test_max_nnz_cap(tmp_path):
    # the reference reads max_nnz+1 rows (pagerank.py:30-31 off-by-one,
    # preserved for parity) BEFORE the regex filter, in file order
    import ray.data  # noqa: F401

    from rayrank.webgraph import read_edge_csv

    csv_path = str(tmp_path / "e.csv.gz")
    with gzip.open(csv_path, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "target"])
        w.writerows([(f"s{i}", f"t{i}") for i in range(20)])
    assert read_edge_csv(csv_path, max_nnz=4).count() == 5
    assert read_edge_csv(csv_path).count() == 20


def test_personalized_via_query(web_dir):
    want, _ = oracle_pagerank_by_name(
        URL_EDGES,
        apply_regex=True,
        v_indicator_names={"site.com/covid"},
    )
    v_parts = personalization_vector(web_dir, "covid")
    res = power_method(web_dir, v_parts=v_parts)
    got = res.scores_by_name(web_dir)
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-6)
    with pytest.raises(ValueError):
        personalization_vector(web_dir, "nomatch-zzz")


def test_gensim_adapter_plumbing(monkeypatch):
    """Exercise gensim_embedding's most_similar plumbing behind a mock
    gensim.downloader (the real model needs network — r1 VERDICT
    missing-item #1)."""
    import sys
    import types

    class FakeVectors:
        def most_similar(self, word, topn=10):
            return [(word + f"_n{i}", 1.0 - 0.1 * i) for i in range(topn)]

    fake_dl = types.ModuleType("gensim.downloader")
    fake_dl.load = lambda name: FakeVectors()
    fake_gensim = types.ModuleType("gensim")
    fake_gensim.downloader = fake_dl
    monkeypatch.setitem(sys.modules, "gensim", fake_gensim)
    monkeypatch.setitem(sys.modules, "gensim.downloader", fake_dl)

    from rayrank.search import expand_query, gensim_embedding

    model = gensim_embedding("fake-model")
    out = model.most_similar("covid", topn=3)
    assert out == [("covid_n0", 1.0), ("covid_n1", 0.9), ("covid_n2", 0.8)]
    # the expansion path drives the adapter exactly like the reference
    expanded = expand_query("covid", model, topn=2)
    assert expanded.split() == ["covid", "covid_n0", "covid_n1"]
