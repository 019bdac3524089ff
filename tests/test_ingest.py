"""Corpus generator determinism, sha256 ingest invariant, and edge
derivation vs an independent driver-side recompute (SURVEY.md §5.2
item 4, FIXTURES.md §3)."""

import collections
import hashlib
import re

import pyarrow.parquet as pq
import pytest

from rayrank import corpus as corpus_mod
from rayrank.corpus import generate_corpus, generate_repo
from rayrank.ingest import derive_edges, read_corpus, sha256_invariant_ok


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus") / "sf0.001"
    return generate_corpus(str(d), sf=0.001)


def test_generator_deterministic():
    a = generate_repo(3)
    b = generate_repo(3)
    assert a == b
    c = generate_repo(4)
    assert c["content"] != a["content"]


def test_corpus_shape(corpus_dir):
    t = pq.read_table(corpus_dir)
    assert t.schema.names == ["repo", "path", "commit", "lang", "content"]
    assert len(t) == 4 * corpus_mod.FILES_PER_REPO
    # unique content per (repo, path) → unique sha256 (FIXTURES §3)
    assert len(set(t.column("content").to_pylist())) == len(t)


def test_sha256_invariant(corpus_dir):
    assert sha256_invariant_ok(corpus_dir, sample_limit=500)


def expected_edges(corpus_dir):
    """Independent driver-side recompute of the pinned derivation rules."""
    t = pq.read_table(corpus_dir)
    rows = t.to_pylist()
    files = {(r["repo"], r["path"]) for r in rows}
    imp_re = re.compile(r"^import\s+(\S+)$", re.MULTILINE)
    edges = collections.Counter()
    for r in rows:
        for mod in imp_re.findall(r["content"]):
            dst = mod.replace(".", "/") + ".py"
            if (r["repo"], dst) in files:
                edges[(f"{r['repo']}:{r['path']}", f"{r['repo']}:{dst}")] += 1
    groups = collections.defaultdict(list)
    for r in rows:
        groups[(r["repo"], r["commit"])].append(r["path"])
    for (repo, _), paths in groups.items():
        paths = sorted(paths)
        for a, b in zip(paths[:-1], paths[1:]):
            edges[(f"{repo}:{a}", f"{repo}:{b}")] += 1
    return edges


def test_edge_derivation_matches_recompute(corpus_dir):
    ds = derive_edges(read_corpus(corpus_dir), num_partitions=4)
    got = collections.Counter()
    for b in ds.iter_batches(batch_format="pyarrow"):
        for s, d in zip(
            b.column("src_name").to_pylist(), b.column("dst_name").to_pylist()
        ):
            got[(s, d)] += 1
    want = expected_edges(corpus_dir)
    assert got == want
    assert sum(want.values()) > 4000  # imports + co-commit both fired


def test_jsonl_corpus_roundtrip(tmp_path, corpus_dir):
    """read_corpus_jsonl over a gzipped JSONL export must reproduce the
    parquet corpus rows exactly (same sha256 invariant input)."""
    import gzip
    import json

    import pyarrow.parquet as pq

    from rayrank.ingest import read_corpus_jsonl, with_sha256

    t = pq.read_table(corpus_dir)
    rows = t.to_pylist()[:200]
    p = tmp_path / "corpus.jsonl.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps({k: r[k] for k in ("repo", "path", "content")}) + "\n")

    ds = read_corpus_jsonl(str(p), columns=["repo", "path", "content"])
    got = {(r["repo"], r["path"]): r["content"] for r in ds.take_all()}
    want = {(r["repo"], r["path"]): r["content"] for r in rows}
    assert got == want
    # sha pipeline runs unchanged on the JSONL source
    sha = with_sha256(ds).take(1)[0]
    import hashlib

    assert sha["sha256"] == hashlib.sha256(sha["content"].encode()).hexdigest()
