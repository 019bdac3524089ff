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

import pyarrow as pa
import ray.data

from . import NUM_PARTITIONS_DEFAULT

IMPORT_RE = re.compile(r"^import\s+(\S+)$", re.MULTILINE)

# worker-process-local cache for the broadcast file table (see resolve())
_RESOLVE_CACHE: dict = {}


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Pruned parquet scan of the corpus (pass only the columns a
    downstream stage needs — SURVEY.md 'prune at the read')."""
    return ray.data.read_parquet(path, columns=columns)


def read_corpus_jsonl(
    path: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Corpus ingest from (optionally gzipped) JSON-Lines exports —
    the other wire format corpora commonly arrive in.  Ray's JSON
    reader handles .jsonl / .jsonl.gz natively (pyarrow json backend,
    one block per file chunk); column pruning happens post-parse (JSONL
    has no column projection at the read, unlike parquet — prefer
    parquet for hot paths, keep this for interchange)."""
    import pyarrow.json as _  # noqa: F401 — fail fast if backend missing

    ds = ray.data.read_json(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


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
    """Distinct ``(repo, path)`` rows (map-side combine then hash
    aggregate — the local dedup shrinks the shuffle by the per-file
    commit multiplicity)."""

    def local_dedup(t: pa.Table):
        if t.num_rows == 0:
            return
        yield t.group_by(["repo", "path"]).aggregate([])

    return (
        corpus.select_columns(["repo", "path"])
        .map_batches(local_dedup, batch_format="pyarrow")
        .groupby(["repo", "path"])
        .count()
        .select_columns(["repo", "path"])
    )


def _extract_import_candidates(batch: pa.Table) -> pa.Table:
    """Vectorized polars extract_all (rust regex ``(?m)^import\\s+\\S+$``
    is match-equivalent to the Python ``re.MULTILINE`` pattern above) —
    no Python loop over documents."""
    from . import polars_mod

    pl = polars_mod()
    df = pl.from_arrow(batch.select(["repo", "path", "content"]))
    df = (
        df.with_columns(
            pl.col("content")
            .str.extract_all(r"(?m)^import\s+\S+$")
            .alias("m")
        )
        .drop("content")
        .explode("m")
        .drop_nulls("m")
    )
    df = df.with_columns(
        (
            pl.col("m")
            .str.replace(r"^import\s+", "")
            .str.replace_all(".", "/", literal=True)
            + ".py"
        ).alias("dst_path")
    )
    out = df.select(
        pl.col("repo"), pl.col("path").alias("src_path"), pl.col("dst_path")
    ).to_arrow()
    return out.cast(
        pa.schema(
            [("repo", pa.string()), ("src_path", pa.string()),
             ("dst_path", pa.string())]
        )
    )


BROADCAST_FILE_LIMIT = 5_000_000


def import_edges(
    corpus: ray.data.Dataset, num_partitions: int = NUM_PARTITIONS_DEFAULT
) -> ray.data.Dataset:
    """``(src_name, dst_name, kind='import')`` edges.

    Candidates flat-mapped per batch, then resolved against the distinct
    ``(repo, path)`` file table.  Resolution is a broadcast SEMI-join
    when the corpus row count (parquet metadata, free) is at or under
    ``BROADCAST_FILE_LIMIT`` — the file table is collected once with a
    map-side dedup and shipped via ``ray.put``; each candidate batch
    filters with one vectorized polars semi-join, zero shuffles.  Above
    the limit it falls back to the partitioned hash join (the
    10^12-file path — no driver-side state)."""
    cands = corpus.select_columns(["repo", "path", "content"]).map_batches(
        _extract_import_candidates, batch_format="pyarrow"
    )

    n_rows = None
    try:
        n_rows = corpus.count()  # parquet-metadata count on plain reads
    except Exception:
        pass

    if n_rows is not None and n_rows <= BROADCAST_FILE_LIMIT:
        import ray as _ray

        from . import polars_mod

        pl = polars_mod()

        def local_dedup(t: pa.Table):
            if t.num_rows == 0:
                return
            yield t.group_by(["repo", "path"]).aggregate([])

        blocks = [
            b
            for b in _ray.get(
                corpus.select_columns(["repo", "path"])
                .map_batches(local_dedup, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if b.num_rows and {"repo", "path"} <= set(b.schema.names)
        ]
        if blocks:
            ft = (
                pl.from_arrow(pa.concat_tables(
                    [b.select(["repo", "path"]) for b in blocks]
                ))
                .unique()
                .rename({"path": "dst_path"})
            )
        else:
            ft = pl.DataFrame({"repo": [], "dst_path": []})
        files_ref = _ray.put(ft.rechunk())

        key = files_ref.hex()

        def resolve(t: pa.Table):
            if t.num_rows == 0:
                return
            from . import polars_mod as _pm

            _pl = _pm()
            # task-based stage (fuses with the regex-extract map into one
            # task per block — an actor pool here measured 2x slower at
            # SF=0.1 from unfusion + 32 actor spin-ups), but the broadcast
            # frame is deserialized once per WORKER PROCESS, not per
            # batch: ray.get re-deserializes on every call it appears in
            f = _RESOLVE_CACHE.get(key)
            if f is None:
                _RESOLVE_CACHE.clear()  # at most one resident file table
                f = _RESOLVE_CACHE[key] = _ray.get(files_ref)
            df = _pl.from_arrow(t)
            out = df.join(f, on=["repo", "dst_path"], how="semi").to_arrow()
            if len(out):
                yield out.cast(t.schema)

        resolved = cands.map_batches(resolve, batch_format="pyarrow")
    else:
        files = file_table(corpus).map_batches(
            lambda t: t.rename_columns(["f_repo", "f_path"]),
            batch_format="pyarrow",
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


def cocommit_edges(
    corpus: ray.data.Dataset, num_partitions: int = NUM_PARTITIONS_DEFAULT
) -> ray.data.Dataset:
    """Consecutive-pair edges among the files of one ``(repo, commit)``
    group (shuffle keyed on the group; linear output per group).
    Arrow/polars-native: one block sort + windowed shift per block —
    no pandas round-trip, no per-group Python calls."""
    ds = corpus.select_columns(["repo", "commit", "path"]).repartition(
        num_partitions, keys=["repo", "commit"]
    )

    def pairs_block(t: pa.Table):
        if t.num_rows == 0 or "repo" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t).sort(["repo", "commit", "path"])
        df = df.with_columns(
            (pl.col("repo") + ":" + pl.col("path")).alias("src_name")
        )
        df = df.with_columns(
            pl.col("src_name")
            .shift(-1)
            .over(["repo", "commit"])
            .alias("dst_name")
        )
        df = df.filter(pl.col("dst_name").is_not_null())
        out = df.select(
            pl.col("src_name"),
            pl.col("dst_name"),
            pl.lit("cocommit").alias("kind"),
        ).to_arrow()
        yield out.cast(
            pa.schema(
                [("src_name", pa.string()), ("dst_name", pa.string()),
                 ("kind", pa.string())]
            )
        )

    return ds.map_batches(pairs_block, batch_size=None, batch_format="pyarrow")


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
