"""Corpus → edge-table derivation (SURVEY.md §7.2, FIXTURES.md §3).

Input: the ``input_hint`` Parquet corpus ``(repo, path, commit, lang,
content)``.  Vertex name = ``repo + ":" + path``.  Two extractors:

  * **import edges** — every line matching ``^import\\s+(\\S+)$`` whose
    module path resolves (``mod.replace('.','/') + '.py'``) to a file of
    the *same repo*; unresolved imports are dropped.  Resolution is a
    distributed inner join of candidate edges against the distinct
    ``(repo, path)`` file table — NOT a driver-side set — so it scales
    past what a broadcast lookup can hold (10^12 files per north_rule).
  * **co-commit edges** — for each ``(repo, commit)`` group, members
    sorted by path, consecutive-pair edges ``f_i → f_{i+1}`` (linear in
    group size by construction; deterministic).

Per-row ``sha256(content)`` is computed at scan time inside the same
pipeline and can be asserted equal to a direct pyarrow scan
(``input_hint`` invariant; reference parity: the reference computes no
hashes, this is the generalization contract).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa
import ray.data

from . import NUM_PARTITIONS_DEFAULT

IMPORT_RE = re.compile(r"^import\s+(\S+)$", re.MULTILINE)


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Pruned parquet scan of the corpus (pass only the columns a
    downstream stage needs — SURVEY.md 'prune at the read')."""
    return ray.data.read_parquet(path, columns=columns)


def _sha256_batch(batch: pa.Table) -> pa.Table:
    hashes = [
        hashlib.sha256(c.encode("utf-8")).hexdigest()
        for c in batch.column("content").to_pylist()
    ]
    return batch.append_column("sha256", pa.array(hashes, type=pa.string()))


def with_sha256(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Append a ``sha256`` column (stateless vectorized-per-batch map)."""
    return corpus.map_batches(_sha256_batch, batch_format="pyarrow")


def file_table(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct ``(repo, path)`` rows (hash aggregate, no driver state)."""
    return (
        corpus.select_columns(["repo", "path"])
        .groupby(["repo", "path"])
        .count()
        .select_columns(["repo", "path"])
    )


def _extract_import_candidates(batch: pa.Table) -> pa.Table:
    repos, srcs, dsts = [], [], []
    r_col = batch.column("repo").to_pylist()
    p_col = batch.column("path").to_pylist()
    c_col = batch.column("content").to_pylist()
    for repo, path, content in zip(r_col, p_col, c_col):
        for mod in IMPORT_RE.findall(content):
            repos.append(repo)
            srcs.append(path)
            dsts.append(mod.replace(".", "/") + ".py")
    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "src_path": pa.array(srcs, type=pa.string()),
            "dst_path": pa.array(dsts, type=pa.string()),
        }
    )


def import_edges(
    corpus: ray.data.Dataset, num_partitions: int = NUM_PARTITIONS_DEFAULT
) -> ray.data.Dataset:
    """``(src_name, dst_name, kind='import')`` edges.

    Candidates flat-mapped per batch, then resolved with a partitioned
    hash join against the file table keyed on ``(repo, path)``.
    """
    cands = corpus.select_columns(["repo", "path", "content"]).map_batches(
        _extract_import_candidates, batch_format="pyarrow"
    )
    files = file_table(corpus).map_batches(
        lambda t: t.rename_columns(["f_repo", "f_path"]), batch_format="pyarrow"
    )
    from .joins import hash_join

    resolved = hash_join(
        cands,
        files,
        on=("repo", "dst_path"),
        right_on=("f_repo", "f_path"),
        num_partitions=num_partitions,
    )

    def to_names(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = pc.binary_join_element_wise(t.column("repo"), t.column("src_path"), ":")
        dst = pc.binary_join_element_wise(t.column("repo"), t.column("dst_path"), ":")
        return pa.table(
            {
                "src_name": src,
                "dst_name": dst,
                "kind": pa.array(["import"] * len(t), type=pa.string()),
            }
        )

    return resolved.map_batches(to_names, batch_format="pyarrow")


def _commit_pairs(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("path")
    names = (g["repo"] + ":" + g["path"]).to_numpy()
    if len(names) < 2:
        return pd.DataFrame({"src_name": [], "dst_name": [], "kind": []}).astype(
            {"src_name": str, "dst_name": str, "kind": str}
        )
    return pd.DataFrame(
        {
            "src_name": names[:-1],
            "dst_name": names[1:],
            "kind": "cocommit",
        }
    )


def cocommit_edges(
    corpus: ray.data.Dataset, num_partitions: int = NUM_PARTITIONS_DEFAULT
) -> ray.data.Dataset:
    """Consecutive-pair edges among the files of one ``(repo, commit)``
    group (shuffle keyed on the group; linear output per group)."""
    from .shuffle import grouped_map

    out = grouped_map(
        corpus.select_columns(["repo", "commit", "path"]),
        ["repo", "commit"],
        _commit_pairs,
        num_partitions=num_partitions,
    )
    # normalize to arrow blocks: unioning pandas-block output with the
    # arrow-block import edges trips Ray's block-type batcher assert
    return out.map_batches(
        lambda t: t.select(["src_name", "dst_name", "kind"]),
        batch_format="pyarrow",
    )


def derive_edges(
    corpus: ray.data.Dataset, num_partitions: int = NUM_PARTITIONS_DEFAULT
) -> ray.data.Dataset:
    """Full edge table: import ∪ co-commit, duplicates KEPT (the
    reference weights duplicate edges by multiplicity —
    /root/reference/pagerank.py:50-67)."""
    return import_edges(corpus, num_partitions).union(cocommit_edges(corpus))


def sha256_invariant_ok(corpus_path: str, sample_limit: int | None = None) -> bool:
    """Check the input_hint invariant: pipeline sha256 == direct pyarrow
    scan sha256, per row (keyed by repo:path)."""
    import pyarrow.parquet as pq

    ds = with_sha256(read_corpus(corpus_path, columns=["repo", "path", "content"]))
    got = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        for r, p, h in zip(
            b.column("repo").to_pylist(),
            b.column("path").to_pylist(),
            b.column("sha256").to_pylist(),
        ):
            got[(r, p)] = h
    direct = pq.read_table(corpus_path, columns=["repo", "path", "content"])
    items = zip(
        direct.column("repo").to_pylist(),
        direct.column("path").to_pylist(),
        direct.column("content").to_pylist(),
    )
    for i, (r, p, c) in enumerate(items):
        if sample_limit is not None and i >= sample_limit:
            break
        if got[(r, p)] != hashlib.sha256(c.encode("utf-8")).hexdigest():
            return False
    return True
