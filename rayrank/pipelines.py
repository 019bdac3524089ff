"""Operator pipelines over the driver's testdata tables
(``$sf_dir/{lineitem,orders,customer,documents,embeddings,events}.parquet``)
— the ``__ray_entry__.queries()`` implementations, each mirrored by an
ANSI-SQL oracle in ``__ray_entry__.oracle_sql()``.

Graph-on-relational mapping (FIXTURES.md §4): the canonical edge table
is ``lineitem(l_orderkey → l_partkey)``; a denser triangle-bearing edge
table is derived as ``(l_suppkey, l_partkey % 100)``.  Float outputs
that depend on distributed summation order are rounded to 6 decimals in
BOTH the Ray pipeline and the SQL oracle so value-hash comparison is
meaningful; exact rationals (mult/outdeg) are NOT rounded.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import configure_data_context
from .graph import build_graph
from .joins import hash_join
from .undirected import und_both, und_both_names, und_both_one, und_canon, und_canon_count, und_canon_guard31, und_canon_names, und_canon_weight

configure_data_context()  # driver imports this module after ray.init

P = 8  # hash-partition count for testdata-scale queries


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def sf_edges(sf_dir: str) -> ray.data.Dataset:
    """(src, dst) int64 edge table from lineitem — duplicates kept."""
    return _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        lambda t: pa.table(
            {"src": t.column("l_orderkey"), "dst": t.column("l_partkey")}
        ),
        batch_format="pyarrow",
    )


def tri_edges(sf_dir: str) -> ray.data.Dataset:
    """Triangle-bearing edge table (l_suppkey, l_partkey % 100)."""

    def fn(t: pa.Table) -> pa.Table:
        a = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        b = t.column("l_partkey").to_numpy(zero_copy_only=False) % 100
        return pa.table({"src": pa.array(a, pa.int64()), "dst": pa.array(b, pa.int64())})

    return _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"]).map_batches(
        fn, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# degree / weight / dangling operators (SURVEY.md §2.5 A1-A3, §2.2 M3)
# --------------------------------------------------------------------------


def out_degree(sf_dir: str) -> ray.data.Dataset:
    g = sf_edges(sf_dir).groupby("src").count()
    return g.map_batches(
        lambda t: t.rename_columns(["src", "outdeg"]), batch_format="pyarrow"
    )


def in_degree(sf_dir: str) -> ray.data.Dataset:
    g = sf_edges(sf_dir).groupby("dst").count()
    return g.map_batches(
        lambda t: t.rename_columns(["dst", "indeg"]), batch_format="pyarrow"
    )


def edge_weights(sf_dir: str) -> ray.data.Dataset:
    """(src, dst, mult, w) with w = mult/outdeg — reference transition
    weights (pagerank.py:50-67) on the testdata edge table."""
    e = sf_edges(sf_dir).groupby(["src", "dst"]).count()
    e = e.map_batches(
        lambda t: t.rename_columns(["src", "dst", "mult"]), batch_format="pyarrow"
    )
    deg = e.groupby("src").sum("mult")
    deg = deg.map_batches(
        lambda t: t.rename_columns(["src", "outdeg"]), batch_format="pyarrow"
    )
    j = hash_join(e, deg, on=("src",), num_partitions=P)
    return j.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "mult": t.column("mult"),
                "w": pc.divide(
                    pc.cast(t.column("mult"), pa.float64()),
                    pc.cast(t.column("outdeg"), pa.float64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def degree_histogram(sf_dir: str) -> ray.data.Dataset:
    """(outdeg, n_vertices) — aggregate-of-aggregate: the per-source
    degree table (already reduced: one row per source) feeds a second
    tiny groupby over the degree value.  Both shuffles move reduced
    rows; raw edges never re-shuffle."""
    deg = out_degree(sf_dir)

    def strip(t: pa.Table):
        if len(t) == 0 or "outdeg" not in t.schema.names:
            return
        yield t.select(["outdeg"])

    h = deg.map_batches(strip, batch_format="pyarrow").groupby("outdeg").count()

    def rename(t: pa.Table):
        if len(t) == 0 or "count()" not in t.schema.names:
            return
        yield t.rename_columns(["outdeg", "n_vertices"])

    return h.map_batches(rename, batch_format="pyarrow")


def edge_reciprocity(sf_dir: str) -> ray.data.Dataset:
    """Single-row graph reciprocity of the directed lineitem edge set:
    n_directed distinct non-loop edges, n_reciprocal = edges whose
    reverse also exists, and their exact ratio (one integer division
    as float64, identical both sides).  Shape: canonicalize (lo, hi)
    per block with fwd/rev flags pre-maxed (the setop flag trick), ONE
    keyed re-agg completes the flags, then three scalar partial sums
    coalesce — the driver sees one row."""
    from .shuffle import keyed_reagg

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) == 0:
            return
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        g = pa.table(
            {
                "lo": pa.array(lo),
                "hi": pa.array(hi),
                "f": pa.array((s < d).astype(np.int64)),
                "r": pa.array((s > d).astype(np.int64)),
            }
        ).group_by(["lo", "hi"]).aggregate([("f", "max"), ("r", "max")])
        yield g.rename_columns(["lo", "hi", "f", "r"])

    flags = keyed_reagg(
        sf_edges(sf_dir).map_batches(pre, batch_format="pyarrow"),
        ["lo", "hi"], [("f", "max"), ("r", "max")], P,
    )

    def partial(t: pa.Table):
        if t.num_rows == 0 or "f" not in t.schema.names:
            return
        f = t.column("f").to_numpy(zero_copy_only=False)
        r = t.column("r").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "nd": pa.array([int(f.sum() + r.sum())]),
                "nr": pa.array([int(2 * (f & r).sum())]),
            }
        )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "nd" not in t.schema.names:
            return
        nd = int(pc.sum(t.column("nd")).as_py())
        nr = int(pc.sum(t.column("nr")).as_py())
        yield pa.table(
            {
                "n_directed": pa.array([nd]),
                "n_reciprocal": pa.array([nr]),
                "reciprocity": pa.array([float(nr) / float(nd)], pa.float64()),
            }
        )

    return (
        flags.map_batches(partial, batch_size=None, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_size=None, batch_format="pyarrow")
    )


EDGE_RECIPROCITY_SQL = """
WITH e AS (
  SELECT DISTINCT l_orderkey AS s, l_partkey AS t
  FROM lineitem WHERE l_orderkey <> l_partkey
),
c AS (
  SELECT LEAST(s, t) AS lo, GREATEST(s, t) AS hi,
    MAX(CASE WHEN s < t THEN 1 ELSE 0 END) AS f,
    MAX(CASE WHEN s > t THEN 1 ELSE 0 END) AS r
  FROM e GROUP BY 1, 2
)
SELECT CAST(SUM(f) + SUM(r) AS BIGINT) AS n_directed,
  CAST(2*SUM(f*r) AS BIGINT) AS n_reciprocal,
  CAST(2*SUM(f*r) AS DOUBLE)/CAST(SUM(f) + SUM(r) AS DOUBLE) AS reciprocity
FROM c
"""


def _vertices(sf_dir: str) -> ray.data.Dataset:
    e = sf_edges(sf_dir)
    a = e.select_columns(["src"]).map_batches(
        lambda t: t.rename_columns(["v"]), batch_format="pyarrow"
    )
    b = e.select_columns(["dst"]).map_batches(
        lambda t: t.rename_columns(["v"]), batch_format="pyarrow"
    )
    return a.union(b).groupby("v").count().select_columns(["v"])


def distinct_vertex_count(sf_dir: str) -> pa.Table:
    return pa.table({"n": pa.array([_vertices(sf_dir).count()], pa.int64())})


def dangling_vertices(sf_dir: str) -> ray.data.Dataset:
    """Vertices with no out-edges (pagerank.py:105-107 semantics) via a
    left-outer hash join + null filter (anti-join)."""
    deg = out_degree(sf_dir)
    j = hash_join(
        _vertices(sf_dir), deg, on=("v",), right_on=("src",), how="left_outer",
        num_partitions=P,
    )
    return j.map_batches(
        lambda t: t.filter(pc.is_null(t.column("outdeg"))).select(["v"]),
        batch_format="pyarrow",
    )


def hot_targets(sf_dir: str, min_indeg: int = 40) -> ray.data.Dataset:
    """Heavy-hitter detection (the skew/salting trigger, SURVEY §4.2)."""
    return in_degree(sf_dir).filter(expr=f"indeg >= {min_indeg}")


def filter_ratio_kept_edges(sf_dir: str, ratio: float = 0.002) -> pa.Table:
    """Edge count surviving the reference's in-link-ratio prune
    (pagerank.py:42-47): indeg(dst) < ratio·n, n fixed pre-prune."""
    n = distinct_vertex_count(sf_dir).column("n")[0].as_py()
    thresh = ratio * n
    e = sf_edges(sf_dir)
    deg = in_degree(sf_dir)
    j = hash_join(e, deg, on=("dst",), num_partitions=P)
    kept = j.filter(expr=f"indeg < {thresh}")
    return pa.table({"kept_edges": pa.array([kept.count()], pa.int64())})


# --------------------------------------------------------------------------
# sort / top-k / filters (SURVEY.md §2.6, §2.2 M1/M4)
# --------------------------------------------------------------------------


def top_customers(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    return (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
        .sort(["c_acctbal", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def regex_filter_docs(sf_dir: str) -> ray.data.Dataset:
    """Docs whose text matches the reference's non-leaf regex (M1)."""
    pat = r".*((/$)|(/.*/)).*"
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.invert(pc.match_substring_regex(t.column("text"), pat))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )


def query_filter_docs(sf_dir: str, query: str = "scan -join") -> ray.data.Dataset:
    """new_url_satisfies_query (M4) over documents.text."""
    from .search import filter_by_query

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"), "name": t.column("text")}),
        batch_format="pyarrow",
    )
    return filter_by_query(ds, "name", query).select_columns(["doc_id"])


# --------------------------------------------------------------------------
# text / dedup / events / ann
# --------------------------------------------------------------------------


def docs_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    from .text import exact_dedup, with_text_sha256

    # only (doc_id, sha) cross the shuffle — the text payload never
    # leaves the reading task (the oracle's output is doc_id alone)
    ds = with_text_sha256(_read(sf_dir, "documents", ["doc_id", "text"]))
    slim = ds.select_columns(["doc_id", "text_sha256"])
    return exact_dedup(slim).select_columns(["doc_id"])


REDACT_PATTERN = r"\b(customer|key|value)\b"
REDACT_MASK = "[MASK]"


def docs_redact(sf_dir: str) -> ray.data.Dataset:
    """Sensitive-term redaction (the PII-scrub shape on a corpus with
    no real PII: a blocklist of tokens stands in for emails/phones) —
    (doc_id, n_masked, text_redacted).  Pure per-block Arrow RE2
    kernels, zero shuffle; DuckDB's regexp_replace/regexp_extract_all
    are also RE2, so both the replacement and the non-overlapping
    match COUNT are bit-identical (the canonicalize precedent,
    rayrank/text.py)."""

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_masked": pc.cast(
                    pc.count_substring_regex(txt, REDACT_PATTERN), pa.int64()
                ),
                "text_redacted": pc.replace_substring_regex(
                    txt, pattern=REDACT_PATTERN, replacement=REDACT_MASK
                ),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


DOCS_REDACT_SQL = rf"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS BIGINT) AS n_masked,
  regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_MASK}', 'g') AS text_redacted
FROM documents
"""


def docs_normalized_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup AFTER text canonicalization (lowercase, punctuation
    runs → one space, trim) — catches trivially-reformatted duplicates
    raw-byte dedup misses, the standard first rung of a near-dup
    ladder.  Same slim shuffle as docs_exact_dedup: only (doc_id,
    sha256(canon)) cross the wire; the text payload never leaves the
    reading task.  SQL oracle groups by the identical regexp_replace
    canonical form (sha collisions negligible)."""
    from .text import canonicalize, exact_dedup, with_text_sha256

    ds = canonicalize(_read(sf_dir, "documents", ["doc_id", "text"]))
    ds = with_text_sha256(ds, col="canon")
    slim = ds.select_columns(["doc_id", "text_sha256"])
    return exact_dedup(slim).select_columns(["doc_id"])


PREP_MIN_TOKENS = 20


def corpus_prep_stats(sf_dir: str) -> ray.data.Dataset:
    """(stage, n_docs, n_tokens) accounting for the full training-data
    prep chain — the flagship LLM-corpus composition over the engine's
    own primitives, each stage feeding the next:

      input → exact_dedup (raw sha) → normalized_dedup (canonical sha)
      → quality gate (≥ PREP_MIN_TOKENS ws-tokens)
      → train/val/test split (splitmix64 hash ranges)

    Survivor rule everywhere is min-doc_id-per-key, so the SQL oracle
    is a plain CTE chain.  Scale shape: the two dedups shuffle only
    (doc_id, sha); token counts and the split are block-local; each
    stage's (n_docs, n_tokens) partials fold through one tiny re-agg.
    All counts exact int64."""
    from .packing import SPLIT_TRAIN_T, SPLIT_VAL_T
    from .sketch import splitmix64
    from .shuffle import keyed_reagg
    from .text import canonicalize, exact_dedup, with_text_sha256

    tt, tv = np.uint64(SPLIT_TRAIN_T), np.uint64(SPLIT_VAL_T)

    def with_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pc.equal(pc.utf8_trim_whitespace(t.column("text")), "")
        n = np.where(empty.to_numpy(zero_copy_only=False), 0, n)
        return t.append_column("n_tokens", pa.array(n))

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        with_counts, batch_format="pyarrow"
    )
    d1 = exact_dedup(with_text_sha256(ds), key="text_sha256").select_columns(
        ["doc_id", "text", "n_tokens"]
    )
    d2 = exact_dedup(
        with_text_sha256(canonicalize(d1), col="canon"), key="text_sha256"
    ).select_columns(["doc_id", "n_tokens"])

    def gate_and_stats(t: pa.Table):
        if len(t) == 0 or "n_tokens" not in t.schema.names:
            return
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        rows = [("2_normalized_dedup", len(n), int(n.sum()))]
        keep = n >= PREP_MIN_TOKENS
        n, ids = n[keep], ids[keep]
        rows.append(("3_quality_gate", len(n), int(n.sum())))
        z = splitmix64(ids)
        split = np.where(z < tt, "4_train", np.where(z < tv, "4_val", "4_test"))
        yield pa.concat_tables(
            [
                pa.table(
                    {
                        "stage": pa.array([s for s, _, _ in rows], pa.string()),
                        "n_docs": pa.array([d for _, d, _ in rows], pa.int64()),
                        "n_tokens": pa.array([k for _, _, k in rows], pa.int64()),
                    }
                ),
                pa.table({"stage": pa.array(split.tolist(), pa.string()),
                          "n_docs": pa.array(np.ones(len(n), np.int64)),
                          "n_tokens": pa.array(n)})
                .group_by(["stage"])
                .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
                .rename_columns(["stage", "n_docs", "n_tokens"]),
            ]
        )

    def base_stats(t: pa.Table, stage: str):
        if len(t) == 0 or "n_tokens" not in t.schema.names:
            return
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "stage": pa.array([stage], pa.string()),
                "n_docs": pa.array([len(n)], pa.int64()),
                "n_tokens": pa.array([int(n.sum())], pa.int64()),
            }
        )

    def stats_input(t: pa.Table):
        yield from base_stats(t, "0_input")

    def stats_exact(t: pa.Table):
        yield from base_stats(t, "1_exact_dedup")

    parts = (
        ds.map_batches(stats_input, batch_format="pyarrow")
        .union(d1.map_batches(stats_exact, batch_format="pyarrow"))
        .union(d2.map_batches(gate_and_stats, batch_format="pyarrow"))
    )
    return keyed_reagg(
        parts, ["stage"], [("n_docs", "sum"), ("n_tokens", "sum")], 4
    )


def token_counts(sf_dir: str) -> ray.data.Dataset:
    from .text import TokenCounter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        TokenCounter, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "ws_tokens"])


def docs_hash_sample(sf_dir: str, fraction: float = 0.25) -> ray.data.Dataset:
    """Deterministic Bernoulli sample of documents by
    splitmix64(doc_id) threshold — reproducible across runs and
    cluster sizes (rayrank.sketch.hash_sample); SQL oracle replays the
    identical hash in HUGEINT arithmetic."""
    from .sketch import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id"])
    return hash_sample(ds, "doc_id", fraction)


def doc_stats(sf_dir: str) -> ray.data.Dataset:
    """Quality scoring + language-ID + fingerprint (rows-only check —
    the heuristics are not ANSI-SQL-expressible)."""
    from .text import Fingerprinter, TextFeatures

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    # fused stage (r5): one actor pool, one object-store crossing —
    # bit-identical to the former QualityScorer → LangId chain
    ds = ds.map_batches(
        TextFeatures, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_kwargs={"include_tokens": False},
    )
    ds = ds.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=(1, 4))
    return ds.select_columns(
        ["doc_id", "quality", "stopword_ratio", "lang_pred", "fingerprint"]
    )


def doc_quality(sf_dir: str) -> ray.data.Dataset:
    """SQL-checkable slice of the quality/language heuristics: raw
    doubles (bit-identical to the DuckDB oracle — verified in-sandbox;
    no pre-rounding, the driver's canonicalization rounds both sides
    the same way)."""
    from .text import TextFeatures

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # fused stage (r5): one actor pool, one object-store crossing —
    # bit-identical to the former QualityScorer → LangId chain
    ds = ds.map_batches(
        TextFeatures, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_kwargs={"include_tokens": False},
    )
    return ds.select_columns(
        ["doc_id", "quality", "stopword_ratio", "punct_ratio",
         "digit_ratio", "lang_pred"]
    )


def lang_confusion(sf_dir: str) -> ray.data.Dataset:
    """(lang, lang_pred, n) — confusion matrix of the stopword-ratio
    language-ID heuristic against the corpus's labeled ``lang`` column
    (the evaluation loop a pipeline owner runs before trusting a
    filter).  Counts are integers; the float score comparisons that
    pick lang_pred are bit-identical to the SQL oracle (same property
    doc_quality's value-hash match already proves), and np.argmax's
    first-max tie rule equals the oracle's ordered CASE chain.
    One |langs|²-bounded keyed re-agg after block-local counting."""
    from .shuffle import keyed_reagg
    from .text import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))

    def pre(t: pa.Table):
        if len(t) == 0 or "lang_pred" not in t.schema.names:
            return
        g = (
            t.select(["lang", "lang_pred"])
            .append_column("n", pa.array(np.ones(len(t), np.int64)))
            .group_by(["lang", "lang_pred"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["lang", "lang_pred", "n"])

    return keyed_reagg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["lang", "lang_pred"], [("n", "sum")], 4,
    )


def minhash_clusters(sf_dir: str) -> ray.data.Dataset:
    from .text import minhash_dedup_clusters

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_clusters(docs, threshold=0.8)


def ngram_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """Exact 3-word-shingle Jaccard for the deterministic pair list
    (doc_id 2i, 2i+1) — exposes the dedup family's verify KERNEL to the
    SQL oracle (candidate GENERATION is minhash-based and stays
    rows-only; the kernel's set math is fully SQL-expressible).
    Jaccard is computed over hashed shingles engine-side and over
    shingle strings oracle-side — identical unless xxhash64 collides
    within one document (~1e-14 at these set sizes)."""
    from .text import verify_pairs_jaccard

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def even_pairs(t: pa.Table):
        ids = t.column("doc_id")
        mask = pc.equal(pc.bit_wise_and(ids, 1), 0)
        a = ids.filter(mask)
        if len(a) == 0:
            return
        yield pa.table({"a": a, "b": pc.add(a, 1)})

    pairs = docs.select_columns(["doc_id"]).map_batches(
        even_pairs, batch_format="pyarrow"
    )
    # threshold=0.0 keeps every pair; the inner text join drops pairs
    # whose b does not exist (mirrored by EXISTS in the oracle)
    return verify_pairs_jaccard(pairs, docs, threshold=0.0)


def simhash_pairs(sf_dir: str) -> ray.data.Dataset:
    from .text import simhash_candidates

    return simhash_candidates(
        _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3
    )


def purchase_signup_asof(sf_dir: str) -> ray.data.Dataset:
    """Backward as-of join on the events stream: each purchase matched
    to the SAME user's latest signup at-or-before it (inner; ties on
    (user, ts) pinned to max signup event_id — joins.asof_join's
    greatest-tuple rule == the oracle's GROUP BY max()).  Exercises the
    custom as-of operator Ray Data lacks; oracle = DuckDB ASOF JOIN."""
    from .joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def side(kind: str, rename: dict[str, str] | None = None):
        def fn(t: pa.Table):
            t = t.filter(pc.equal(t.column("event_type"), kind))
            if len(t) == 0:
                return
            t = t.drop_columns(["event_type"])
            if rename:
                t = t.rename_columns(
                    [rename.get(nm, nm) for nm in t.schema.names]
                )
            yield t

        return ev.map_batches(fn, batch_format="pyarrow")

    left = side("purchase")
    right = side("signup", {"event_id": "signup_event_id"}).map_batches(
        lambda t: t.append_column("signup_ts", t.column("ts")),
        batch_format="pyarrow",
    )
    j = asof_join(left, right, on="ts", by="user_id")

    def finish(t: pa.Table) -> pa.Table:
        gap = pc.cast(
            pc.subtract(t.column("ts"), t.column("signup_ts")), pa.int64()
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "signup_event_id": t.column("signup_event_id"),
                "gap_us": gap,
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def purchase_click_window(sf_dir: str) -> ray.data.Dataset:
    """Banded range join on the events stream: each purchase paired with
    every click by the SAME user in the preceding 24 h (inclusive band
    [ts−24h, ts] in int64 microseconds).  Exercises joins.range_join —
    one hash shuffle by user, per-block sorted-window kernel; oracle =
    DuckDB inner join with BETWEEN."""
    from .joins import range_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def side(kind: str, rename: dict[str, str] | None = None):
        def fn(t: pa.Table):
            t = t.filter(pc.equal(t.column("event_type"), kind))
            if len(t) == 0:
                return
            t = t.drop_columns(["event_type"])
            t = t.set_column(
                t.schema.get_field_index("ts"),
                "ts_us",
                pc.cast(t.column("ts"), pa.int64()),
            )
            if rename:
                t = t.rename_columns(
                    [rename.get(nm, nm) for nm in t.schema.names]
                )
            yield t

        return ev.map_batches(fn, batch_format="pyarrow")

    left = side("purchase")
    right = side("click", {"event_id": "click_event_id"})
    j = range_join(
        left, right, on="ts_us", by="user_id", lo=-86_400_000_000, hi=0
    )

    def finish(t: pa.Table) -> pa.Table:
        gap = pc.subtract(t.column("ts_us"), t.column("ts_us_right"))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "click_event_id": t.column("click_event_id"),
                "gap_us": gap,
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def events_prior_hour_counts(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window aggregate: for every event, how many events the
    SAME user generated in the preceding hour (exclusive of itself,
    inclusive band [ts−1h, ts) in int64 microseconds).  Composed as a
    range_join self-join (band [−3600s, 0]) + groupby count, minus the
    self-match — the streaming-window shape expressed with ONE hash
    shuffle plus a keyed count."""
    from .joins import range_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(rename: dict[str, str] | None = None):
        def fn(t: pa.Table):
            t = t.set_column(
                t.schema.get_field_index("ts"),
                "ts_us",
                pc.cast(t.column("ts"), pa.int64()),
            )
            if rename:
                t = t.rename_columns(
                    [rename.get(nm, nm) for nm in t.schema.names]
                )
            yield t

        return ev.map_batches(fn, batch_format="pyarrow")

    left = prep()
    right = prep({"event_id": "prior_event_id"})
    j = range_join(
        left, right, on="ts_us", by="user_id", lo=-3_600_000_000, hi=0
    )

    # count matches per left event; each event matches itself at gap 0
    # and may tie with same-(user, ts) events — keep strictly-earlier
    # rows plus same-ts rows with a smaller event_id OUT (window is
    # [ts-1h, ts) + never self): prior := ts_right < ts, i.e. gap > 0.
    def count_block(t: pa.Table):
        if t.num_rows == 0:
            return
        gap = pc.subtract(t.column("ts_us"), t.column("ts_us_right"))
        t = t.filter(pc.greater(gap, 0))
        if t.num_rows == 0:
            return
        yield (
            t.select(["event_id", "user_id"])
            .group_by(["event_id", "user_id"])
            .aggregate([("event_id", "count")])
            .rename_columns(["event_id", "user_id", "prior_cnt"])
        )

    counted = j.map_batches(count_block, batch_format="pyarrow")

    # range_join already co-partitioned by user: every (event_id, user)
    # lives in one block, so block-local counts are final — but blocks
    # of the same bucket may be split by Ray's dynamic block splitting,
    # so re-aggregate with a small keyed groupby to be safe.
    return counted.groupby(["event_id", "user_id"]).sum("prior_cnt").map_batches(
        lambda t: t.rename_columns(["event_id", "user_id", "prior_cnt"]),
        batch_format="pyarrow",
    )


def kmv_distinct_parts(sf_dir: str) -> ray.data.Dataset:
    """KMV (k=64) distinct-count sketch of lineitem.l_partkey — the
    approximate-distinct path whose estimate the SQL oracle reproduces
    bit-identically (splitmix64 in HUGEINT arithmetic)."""
    from .sketch import kmv_distinct

    return kmv_distinct(_read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey", k=64)


def hll_distinct_parts(sf_dir: str) -> ray.data.Dataset:
    """HyperLogLog (p=12) distinct-count sketch of lineitem.l_partkey;
    estimate reproduced exactly by the SQL oracle (exact-integer
    register sum -> order-independent float math)."""
    from .sketch import hll_distinct

    return hll_distinct(_read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey", p=12)


def cms_part_counts(sf_dir: str) -> ray.data.Dataset:
    """(l_partkey, est_count) count-min-sketch frequency estimates for
    every distinct lineitem.l_partkey (width 256 × depth 4, one
    splitmix64 chain) — deliberately narrow so collisions occur and
    the MIN across depths does real work.  Counters are exact integers
    and the hash is the HUGEINT-reproducible splitmix64, so the SQL
    oracle rebuilds the same grid and matches every estimate exactly."""
    from .shuffle import keyed_reagg
    from .sketch import cms_estimates, cms_sketch

    grid = cms_sketch(_read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey")

    def uniq(t: pa.Table):
        if len(t) == 0:
            return
        u = pc.unique(t.column("l_partkey"))
        yield pa.table(
            {"l_partkey": u, "one": pa.array(np.ones(len(u), np.int64))}
        )

    keys = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
            uniq, batch_format="pyarrow"
        ),
        ["l_partkey"],
        [("one", "sum")],
        num_partitions=P,
    ).select_columns(["l_partkey"])
    return cms_estimates(keys, "l_partkey", grid)


def ams_f2_parts(sf_dir: str) -> ray.data.Dataset:
    """One-row AMS tug-of-war F2 sketch of lineitem.l_partkey next to
    the exact Σf² (self-join-size estimation before planning a keyed
    join) — pure-integer median-of-means, so even the approximate
    estimate replays bit-identically in the SQL oracle
    (rayrank.sketch.ams_f2)."""
    from .sketch import ams_f2

    return ams_f2(_read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey")


def price_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact quantile_disc of lineitem.l_extendedprice at binary-exact
    q (so ceil(q·N) is float64-identical in engine and oracle) —
    distributed selection over value-count partials, never a raw-row
    sort (rayrank.quantiles)."""
    from .quantiles import exact_quantiles

    return exact_quantiles(
        _read(sf_dir, "lineitem", ["l_extendedprice"]), "l_extendedprice"
    )


def price_quantiles_cont(sf_dir: str):
    """Interpolated (quantile_cont) quantiles of l_extendedprice —
    same distributed selection as price_quantiles, plus an explicit
    two-rank interpolation computed identically on both sides
    (rayrank.quantiles.interp_quantiles)."""
    from .quantiles import interp_quantiles

    return interp_quantiles(
        _read(sf_dir, "lineitem", ["l_extendedprice"]), "l_extendedprice"
    )


def users_per_type_kmv(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type KMV distinct-user estimates (grouped sketch —
    rayrank.sketch.kmv_distinct_by); k=64 exercises the exact branch at
    sf0.001 (<64 users/type) and the estimator branch at sf≥0.01."""
    from .sketch import kmv_distinct_by

    out = kmv_distinct_by(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id", k=64,
    )
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "est_distinct", "k"]),
        batch_format="pyarrow",
    )


def frequent_event_types(sf_dir: str) -> ray.data.Dataset:
    """Exact heavy hitters (φ=1/8) over events.event_type — candidate
    superset from per-block counts, broadcast exact verify
    (rayrank.heavy); binary-exact φ keeps ceil(φ·N) float64-identical
    to the SQL HAVING threshold."""
    from .heavy import heavy_hitters

    return heavy_hitters(
        _read(sf_dir, "events", ["event_type"]), "event_type", phi=0.125
    )


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """Consecutive event-type pairs per user ordered by (ts, event_id)
    — the co-commit-pair shape (§7.2) on the events table.  Sessionize
    with a polars block sort + windowed shift: Arrow-native, no pandas
    round-trip (r1 VERDICT finding #7)."""

    def pairs_block(t: pa.Table):
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        df = df.with_columns(
            pl.col("event_type").shift(-1).over("user_id").alias("to_type")
        )
        df = df.filter(pl.col("to_type").is_not_null())
        out = df.select(
            pl.col("user_id"),
            pl.col("event_type").alias("from_type"),
            pl.col("to_type"),
        ).to_arrow()
        # polars emits large_string; pin the oracle-facing schema
        yield out.cast(
            pa.schema(
                [
                    ("user_id", out.schema.field("user_id").type),
                    ("from_type", pa.string()),
                    ("to_type", pa.string()),
                ]
            )
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    out = ds.repartition(P, keys=["user_id"]).map_batches(
        pairs_block, batch_size=None, batch_format="pyarrow"
    )
    agg = out.groupby(["user_id", "from_type", "to_type"]).count()
    return agg.map_batches(
        lambda t: t.rename_columns(["user_id", "from_type", "to_type", "cnt"]),
        batch_format="pyarrow",
    )


def event_window_counts(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-day windows per event type (batch windowing: truncate
    the timestamp, hash aggregate — SQL-checkable via date_trunc)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def win(t: pa.Table):
        if t.num_rows == 0:
            return
        yield pa.table(
            {
                "win": pc.floor_temporal(t.column("ts"), unit="day"),
                "event_type": t.column("event_type"),
            }
        )

    g = ds.map_batches(win, batch_format="pyarrow").groupby(
        ["win", "event_type"], num_partitions=P
    ).count()

    def finish(t: pa.Table):
        if t.num_rows == 0:
            return
        t = t.rename_columns(["win", "event_type", "cnt"])
        # the shuffle round-trips through pandas and downgrades the
        # timestamp to [s]; match DuckDB's timestamp[us] exactly
        yield pa.table(
            {
                "win": t.column("win").cast(pa.timestamp("us")),
                "event_type": t.column("event_type"),
                "cnt": t.column("cnt"),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow")


HOP_US = 3_600_000_000  # 1h hop
HOP_WINDOW_HOPS = 2  # 2h windows ⇒ each event lands in 2 windows

WM_LATE_US = 3_600_000_000        # watermark lateness bound: 1h
WM_JITTER_US = 4 * 3_600_000_000  # planted arrival jitter: < 4h
WM_SPAN_US = 86_400_000_000       # arrival-key bucket: 1 day


def watermark_late_events(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n_events, n_late, max_lateness_us) — late-data
    accounting under a watermark, the streaming bookkeeping every
    event-time window needs before it can close.  The raw testdata is
    PERFECTLY ordered by event_id (any watermark over it is
    degenerate), so disorder is PLANTED deterministically: arrival key
    ak = event_time_us + splitmix64(event_id) mod ``WM_JITTER_US`` —
    the standard bounded-out-of-orderness model, bit-replayable.
    Processing events in (ak, event_id) order, an event is LATE iff
    its event time < (max event time among strictly-earlier arrivals)
    − ``WM_LATE_US``; lateness = that watermark minus the event time.
    27% of events are late at sf0.001, 59% at sf0.01 — non-degenerate
    both ways.

    Scale shape: a running MAX over a value-ordered stream =
    the pack_sequences two-level scan with max for plus: bucket =
    ak // ``WM_SPAN_US`` (bucket order IS arrival order; calendar-
    bounded count), per-bucket max partials reduce via ONE keyed
    re-agg, the driver folds only the bucket maxes into an exclusive
    prefix max, and one bucket-keyed repartition makes each bucket's
    rows block-local for the seeded exclusive cummax.  All integers;
    the SQL oracle is the identical window MAX unrolled over the same
    HUGEINT splitmix chain."""
    from .shuffle import keyed_reagg
    from .sketch import splitmix64

    SEED = -(1 << 62)  # "no earlier arrival" sentinel; SEED−W cannot wrap

    def hb(t: pa.Table):
        if len(t) == 0:
            return
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        tus = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        jit = (splitmix64(eid) % np.uint64(WM_JITTER_US)).astype(np.int64)
        ak = tus + jit
        yield pa.table(
            {
                "event_id": pa.array(eid),
                "event_type": t.column("event_type"),
                "tus": pa.array(tus),
                "ak": pa.array(ak),
                "bucket": pa.array(ak // WM_SPAN_US),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"]).map_batches(
        hb, batch_format="pyarrow"
    ).materialize()

    def bpre(t: pa.Table):
        if t.num_rows == 0 or "bucket" not in t.schema.names:
            return
        g = (
            t.select(["bucket", "tus"])
            .group_by(["bucket"])
            .aggregate([("tus", "max")])
        )
        yield g.rename_columns(["bucket", "mx"])

    brows = keyed_reagg(
        ds.map_batches(bpre, batch_format="pyarrow"),
        ["bucket"], [("mx", "max")], P,
    ).take_all()  # calendar-bounded: one row per active day
    brows.sort(key=lambda r: r["bucket"])
    bids = np.array([r["bucket"] for r in brows], np.int64)
    bmax = np.array([r["mx"] for r in brows], np.int64)
    # exclusive prefix max in bucket (= arrival) order
    excl = np.r_[SEED, np.maximum.accumulate(bmax)[:-1]]
    seed_ref = ray.put((bids, excl))

    co = ds.repartition(P, keys=["bucket"])

    def late(t: pa.Table):
        if t.num_rows == 0 or "ak" not in t.schema.names:
            return
        ids, seeds = ray.get(seed_ref)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        ak = t.column("ak").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        tus = t.column("tus").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ak, b))
        b, ak, eid, tus = b[order], ak[order], eid[order], tus[order]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        sizes = np.diff(np.r_[starts, len(b)])
        # seeded EXCLUSIVE running max of tus within each bucket segment
        seg_seed = seeds[np.searchsorted(ids, b[starts])]
        prev = np.r_[SEED, tus[:-1]]
        prev[starts] = seg_seed
        wm = _segmented_cummax(prev, starts, sizes)
        is_late = tus < wm - WM_LATE_US
        lat = np.where(is_late, (wm - WM_LATE_US) - tus, 0)
        g = (
            pa.table(
                {
                    "event_type": t.column("event_type").take(pa.array(order)),
                    "n": pa.array(np.ones(len(b), np.int64)),
                    "nl": pa.array(is_late.astype(np.int64)),
                    "mx": pa.array(lat.astype(np.int64)),
                }
            )
            .group_by(["event_type"])
            .aggregate([("n", "sum"), ("nl", "sum"), ("mx", "max")])
        )
        yield g.rename_columns(["event_type", "n", "nl", "mx"])

    out = keyed_reagg(
        co.map_batches(late, batch_size=None, batch_format="pyarrow"),
        ["event_type"], [("n", "sum"), ("nl", "sum"), ("mx", "max")], P,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        yield t.rename_columns(
            ["event_type", "n_events", "n_late", "max_lateness_us"]
        )

    return out.map_batches(fin, batch_size=None, batch_format="pyarrow")


def _segmented_cummax(prev: np.ndarray, starts: np.ndarray,
                      sizes: np.ndarray) -> np.ndarray:
    """Running max per segment of ``prev`` (which holds each element's
    predecessor, seed at segment starts, so the result is the seeded
    EXCLUSIVE running max).  Per-segment accumulate loop — the segment
    count per block is calendar-bounded (one per active day), never
    row-bounded."""
    out = np.empty_like(prev)
    for s, z in zip(starts, sizes):
        out[s:s + z] = np.maximum.accumulate(prev[s:s + z])
    return out


def hopping_event_counts(sf_dir: str) -> ray.data.Dataset:
    """Hopping-window counts per event type: 2-hour windows starting
    every hour (window w covers [w·1h, w·1h + 2h)), so each event
    expands to exactly 2 (window, type) rows — the overlapping-window
    flat-map shape that tumbling windows can't express.  The expansion
    is one vectorized tile per block; counts pre-combine before the
    keyed shuffle.  Window ids are integer epoch hours — exact."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def expand(t: pa.Table):
        if t.num_rows == 0:
            return
        hr = (
            pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
            // HOP_US
        )
        wins = np.concatenate([hr - i for i in range(HOP_WINDOW_HOPS)])
        ty = pa.concat_arrays(
            [t.column("event_type").combine_chunks()] * HOP_WINDOW_HOPS
        )
        g = pa.table(
            {
                "win_hour": pa.array(wins),
                "event_type": ty,
                "cnt": pa.array(np.ones(len(wins), np.int64)),
            }
        ).group_by(["win_hour", "event_type"]).aggregate([("cnt", "sum")])
        yield g.rename_columns(["win_hour", "event_type", "cnt"])

    from .shuffle import keyed_reagg

    return keyed_reagg(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["win_hour", "event_type"], [("cnt", "sum")], P,
    )


HOPPING_EVENT_COUNTS_SQL = """
WITH b AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, event_type FROM events
),
x AS (
  SELECT hr AS win_hour, event_type FROM b
  UNION ALL
  SELECT hr - 1 AS win_hour, event_type FROM b
)
SELECT win_hour, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
FROM x GROUP BY 1, 2
"""


def hopping_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Distinct USERS per hopping window (2-hour windows every hour —
    same expansion as :func:`hopping_event_counts`) — the overlapping-
    window DISTINCT aggregate, which unlike a count cannot pre-combine
    as a sum: each block first dedups its (window, user) pairs (block
    partial), ONE window-keyed repartition co-locates a window's
    partials, and the block-local re-dedup is then globally exact.
    Only already-deduped (window, user) int64 pairs shuffle."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def expand(t: pa.Table):
        if t.num_rows == 0:
            return
        hr = (
            pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
            // HOP_US
        )
        wins = np.concatenate([hr - i for i in range(HOP_WINDOW_HOPS)])
        uid = np.tile(
            t.column("user_id").to_numpy(zero_copy_only=False), HOP_WINDOW_HOPS
        )
        yield pa.table(
            {"win_hour": pa.array(wins), "user_id": pa.array(uid)}
        ).group_by(["win_hour", "user_id"]).aggregate([])

    co = ds.map_batches(expand, batch_format="pyarrow").repartition(
        P, keys=["win_hour"]
    )

    def count_distinct(t: pa.Table):
        if t.num_rows == 0 or "win_hour" not in t.schema.names:
            return
        d = t.group_by(["win_hour", "user_id"]).aggregate([])
        g = (
            d.append_column("n_users", pa.array(np.ones(len(d), np.int64)))
            .group_by(["win_hour"])
            .aggregate([("n_users", "sum")])
        )
        yield g.rename_columns(["win_hour", "n_users"])

    return co.map_batches(count_distinct, batch_size=None, batch_format="pyarrow")


HOPPING_DISTINCT_USERS_SQL = """
WITH b AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, user_id FROM events
),
x AS (
  SELECT hr AS win_hour, user_id FROM b
  UNION ALL
  SELECT hr - 1 AS win_hour, user_id FROM b
)
SELECT win_hour, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM x GROUP BY 1
"""


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.2) -> ray.data.Dataset:
    """Embedding-cosine near-dup candidates (rows-only: LSH bucketing is
    approximate by construction; exact-cosine verification inside)."""
    from .ann import embedding_near_dups

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_dups(ds, threshold=threshold, planes=6)


def ann_topk(sf_dir: str, k: int = 5, m: int = 3) -> ray.data.Dataset:
    """Brute-force cosine top-k; queries = the first m embeddings
    (vec_id < m).  Cosine rounded to 4 decimals for comparison."""
    import pyarrow.parquet as pq

    from .ann import brute_force_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, filters=[("vec_id", "<", m)])
    order = np.argsort(t.column("vec_id").to_numpy())
    q = np.asarray(t.column("embedding").to_pylist(), np.float64)[order]
    ds = ray.data.read_parquet(path)
    out = brute_force_topk(ds, q, k=k)
    return out.map_batches(
        lambda t: pa.table(
            {
                "query_id": t.column("query_id"),
                "vec_id": t.column("vec_id"),
                "cosine": pc.round(t.column("cosine"), 4),
            }
        ),
        batch_format="pyarrow",
    )


def filtered_ann_topk(sf_dir: str, k: int = 5, m: int = 3) -> ray.data.Dataset:
    """Metadata-filtered vector search: brute-force cosine top-k where
    the corpus is restricted to rows sharing the QUERY's label
    (ann.brute_force_topk_filtered) — the predicate-pushdown ANN shape.
    Queries = the first m embeddings; cosine rounded to 4 decimals for
    comparison (the ann_topk order-agreement precedent)."""
    import pyarrow.parquet as pq

    from .ann import brute_force_topk_filtered

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, filters=[("vec_id", "<", m)])
    order = np.argsort(t.column("vec_id").to_numpy())
    q = np.asarray(t.column("embedding").to_pylist(), np.float64)[order]
    qlab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)[order]
    out = brute_force_topk_filtered(
        ray.data.read_parquet(path), q, qlab, k=k
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "query_id": t.column("query_id"),
                "vec_id": t.column("vec_id"),
                "cosine": pc.round(t.column("cosine"), 4),
            }
        ),
        batch_format="pyarrow",
    )


def lsh_ann_topk(sf_dir: str, k: int = 5, m: int = 3) -> ray.data.Dataset:
    """LSH-bucketed ANN (rows-only: approximate by design)."""
    import pyarrow.parquet as pq

    from .ann import lsh_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, filters=[("vec_id", "<", m)])
    order = np.argsort(t.column("vec_id").to_numpy())
    q = np.asarray(t.column("embedding").to_pylist(), np.float64)[order]
    return lsh_topk(ray.data.read_parquet(path), q, k=k)


def ivf_ann_topk(sf_dir: str, k: int = 5, m: int = 3) -> ray.data.Dataset:
    """IVF ANN: distributed spherical k-means coarse quantizer +
    per-query probe lists (rows-only: approximate by design)."""
    import pyarrow.parquet as pq

    from .ann import ivf_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, filters=[("vec_id", "<", m)])
    order = np.argsort(t.column("vec_id").to_numpy())
    q = np.asarray(t.column("embedding").to_pylist(), np.float64)[order]
    return ivf_topk(
        ray.data.read_parquet(path), q, k=k, n_centroids=16, nprobe=6, iters=3
    )


def semantic_dedup(sf_dir: str) -> ray.data.Dataset:
    """SemDedup-style embedding dedup (rows-only: k-means clusters are
    not SQL-expressible; dedup logic numpy-mirrored in tests)."""
    from .ann import semantic_dedup as _sd

    return _sd(sf_dir)


# --------------------------------------------------------------------------
# graph algorithms on testdata edges (shared cached builds)
# --------------------------------------------------------------------------

_GRAPH_CACHE: dict = {}


def _edge_names(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: pa.table(
            {
                "src_name": pc.cast(t.column("src"), pa.string()),
                "dst_name": pc.cast(t.column("dst"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


SCC_BACK_QTY = 40


def scc_edges(sf_dir: str) -> ray.data.Dataset:
    """Named edge table of a cyclic order↔part graph: ``o<okey> →
    p<pkey>`` for every lineitem row, plus back edges ``p<pkey> →
    o<okey>`` on returned first lines (``l_returnflag='R' AND
    l_linenumber=1 AND l_quantity >= 40``) — the predicate was tuned so
    BOTH testdata SFs show a rich nontrivial-SCC size distribution
    (neither one giant SCC nor all singletons)."""

    def fn(t: pa.Table) -> pa.Table:
        o = pc.binary_join_element_wise(
            "o", pc.cast(t.column("l_orderkey"), pa.string()), ""
        )
        p = pc.binary_join_element_wise(
            "p", pc.cast(t.column("l_partkey"), pa.string()), ""
        )
        back = pc.and_(
            pc.and_(
                pc.equal(t.column("l_returnflag"), "R"),
                pc.equal(t.column("l_linenumber"), 1),
            ),
            pc.greater_equal(t.column("l_quantity"), SCC_BACK_QTY),
        )
        fwd = pa.table({"src_name": o, "dst_name": p})
        rev = pa.table({"src_name": p, "dst_name": o}).filter(back)
        return pa.concat_tables([fwd, rev])

    return _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_returnflag", "l_linenumber", "l_quantity"],
    ).map_batches(fn, batch_format="pyarrow")


def _graph(sf_dir: str, kind: str) -> str:
    key = (os.path.abspath(sf_dir), kind)
    if key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    gdir = tempfile.mkdtemp(prefix=f"rayrank_sf_{kind}_")
    if kind == "directed":
        build_graph(_edge_names(sf_edges(sf_dir)), gdir, num_partitions=P)
    elif kind == "undirected":
        from .graph import derive_undirected

        derive_undirected(_graph(sf_dir, "directed"), gdir)
    elif kind == "reversed":
        from .graph import derive_reversed

        derive_reversed(_graph(sf_dir, "directed"), gdir)
    elif kind == "scc":
        build_graph(scc_edges(sf_dir), gdir, num_partitions=P)
    elif kind == "scc_rev":
        from .graph import derive_reversed

        derive_reversed(_graph(sf_dir, "scc"), gdir)
    elif kind == "dag":
        # acyclic orientation: every distinct edge points low→high
        # NUMERIC id (np.minimum on ints — the SQL mirror is LEAST on
        # BIGINT, so orientation happens BEFORE stringifying names)
        def orient(t: pa.Table):
            if len(t) == 0 or "src" not in t.schema.names:
                return
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            keep = s != d
            s, d = s[keep], d[keep]
            if len(s) == 0:
                return
            yield pa.table(
                {
                    "src": pa.array(np.minimum(s, d), pa.int64()),
                    "dst": pa.array(np.maximum(s, d), pa.int64()),
                }
            )

        build_graph(
            _edge_names(
                sf_edges(sf_dir).map_batches(orient, batch_format="pyarrow")
            ),
            gdir,
            num_partitions=P,
        )
    else:  # tri
        build_graph(
            _edge_names(tri_edges(sf_dir)), gdir, num_partitions=P, undirected=True
        )
    _GRAPH_CACHE[key] = gdir
    return gdir


def bfs_depths_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, depth) hop distances from the lexicographically-minimum
    vertex name on the undirected lineitem graph — third instance of
    the shard gather/reduce loop (rayrank.bfs).  SQL oracle: bounded
    min-plus recursive CTE; MIN(d) over iterations = exact BFS depth
    (every CTE row is a walk length; the shortest-path row appears at
    it = depth)."""
    from .bfs import bfs, min_vertex_name, reachable_depths

    gdir = _graph(sf_dir, "undirected")
    seed = min_vertex_name(gdir)
    res = bfs(gdir, [seed])
    return reachable_depths(res, gdir)


def descendant_depths_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, depth) hop distances from the min-name vertex following
    the STORED edge direction (directed reachability — who does the
    root transitively link to, and how far).  Same gather_min/min-plus
    loop as bfs_depths but on the directed layout: self-loops never
    relax (d+1 > d), so the oracle's DISTINCT (s, t) walk recursion is
    equivalent."""
    from .bfs import bfs, min_vertex_name, reachable_depths

    gdir = _graph(sf_dir, "directed")
    seed = min_vertex_name(gdir)
    res = bfs(gdir, [seed])
    return reachable_depths(res, gdir)


def shortest_path_counts_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, dist, paths) σ-counts from the min-name vertex on the
    undirected lineitem graph — Brandes forward pass on the shard loop
    (rayrank.bfs.shortest_path_counts).  SQL oracle: layered recursion
    extending only dist→dist+1 edges over the bounded-BFS distance
    table."""
    from .bfs import min_vertex_name, shortest_path_counts

    gdir = _graph(sf_dir, "undirected")
    return shortest_path_counts(gdir, [min_vertex_name(gdir)])


def betweenness_contrib_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, dependency) single-source Brandes dependency from the
    min-name vertex on the undirected lineitem graph
    (rayrank.bfs.betweenness_contrib).  Rows-only for the driver —
    float accumulation order; exact python-Brandes mirror in
    tests/test_bfs.py."""
    from .bfs import betweenness_contrib, min_vertex_name

    gdir = _graph(sf_dir, "undirected")
    return betweenness_contrib(gdir, [min_vertex_name(gdir)])


def landmark_assignment_sf(sf_dir: str, k: int = 4) -> ray.data.Dataset:
    """(name, dist, landmark) nearest-landmark assignment from the k
    lexicographically-smallest vertex names on the undirected lineitem
    graph — K-source BFS in ONE encoded int64 label per vertex
    (rayrank.bfs.landmarks; label = dist·K + seed rank, min-plus +K).
    SQL oracle: the _BFS_SQL bounded recursion per seed, then the
    per-vertex lexicographic (dist, seed-rank) pick — identical to the
    encoded minimum by construction."""
    from .bfs import landmark_table, landmarks, smallest_vertex_names

    gdir = _graph(sf_dir, "undirected")
    seeds = smallest_vertex_names(gdir, k)
    res, ordered = landmarks(gdir, seeds)
    return landmark_table(res, gdir, ordered)


def seed_closeness_sf(sf_dir: str, k: int = 4) -> pa.Table:
    """(seed, n_reached, total_dist, closeness) closeness centrality of
    the k lexicographically-smallest vertices on the undirected
    lineitem graph — one BFS per seed on shared resident shards
    (rayrank.bfs.seed_closeness); integer fold + ONE float division.
    SQL oracle: the _LANDMARK_SQL per-seed bounded min-plus recursion,
    re-aggregated per seed instead of per vertex."""
    from .bfs import seed_closeness, smallest_vertex_names

    gdir = _graph(sf_dir, "undirected")
    return seed_closeness(gdir, smallest_vertex_names(gdir, k))


def harmonic_centrality_sf(sf_dir: str, k: int = 4) -> pa.Table:
    """(seed, n_reached, max_dist, harmonic_q, harmonic) harmonic
    centrality of the k lexicographically-smallest vertices on the
    undirected lineitem graph — quantized-reciprocal integer sums
    (rayrank.bfs.seed_harmonic), one float division at the end.  SQL
    oracle: the seed-closeness bounded min-plus recursion with the
    identical 2^40 // d quantization."""
    from .bfs import seed_harmonic, smallest_vertex_names

    gdir = _graph(sf_dir, "undirected")
    return seed_harmonic(gdir, smallest_vertex_names(gdir, k))


def seed_distance_histogram_sf(sf_dir: str, k: int = 4) -> pa.Table:
    """(seed, d, cnt) BFS distance distribution of the k smallest
    vertices on the undirected lineitem graph — the exact per-seed
    neighborhood function.  Pure-integer output; per-partition
    histogram partials, never a distance vector on the driver."""
    from .bfs import seed_distance_histogram, smallest_vertex_names

    gdir = _graph(sf_dir, "undirected")
    return seed_distance_histogram(gdir, smallest_vertex_names(gdir, k))


def graph_diameter_sf(sf_dir: str) -> pa.Table:
    """(start, far1, ecc_start, far2, diameter_lb) double-sweep
    diameter lower bound of the undirected lineitem graph — two chained
    BFS runs on shared resident shards (rayrank.bfs.diameter_sweep);
    farthest pick = (max dist, min name) scalar fold.  SQL oracle: two
    bounded min-plus recursions, the second seeded by the first's
    (max depth, min name) pick."""
    from .bfs import diameter_sweep

    return diameter_sweep(_graph(sf_dir, "undirected"))


MIS_SQL_ROUNDS = 8  # fixpoint is 3 rounds at sf0.001 AND sf0.01; 2.6× headroom
# coloring unroll sizes (measured at both SFs + headroom; extras are no-ops)
COLORING_SQL_CLASSES = 14
COLORING_SQL_ROUNDS = 8


def mis_vertices_sf(sf_dir: str) -> ray.data.Dataset:
    """(name) maximal-independent-set members of the undirected
    lineitem graph — deterministic Luby-by-hash on the shard loop
    (rayrank.mis, named_priority: equals sequential greedy in
    splitmix64(int(name)) order, so the fixpoint is independent of the
    vid assignment).  SQL oracle: the rounds unrolled as materialized
    CTEs (select = strict priority minimum over the alive
    neighbourhood, exclude = alive neighbours of selected) over the
    HUGEINT splitmix chain — ``MIS_SQL_ROUNDS`` ≥ the measured
    fixpoint round count at both test SFs; extra rounds are no-ops on
    an empty alive set."""
    from .mis import mis, mis_members

    gdir = _graph(sf_dir, "undirected")
    res = mis(gdir, named_priority=True)
    if not res.converged:
        raise RuntimeError("mis_vertices: no fixpoint within bound")
    return mis_members(res, gdir)


def sssp_dists_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, dist) weighted shortest-path distances from the
    lexicographically-minimum vertex on the undirected lineitem graph,
    edge weight = collapsed multiplicity (directed ∪ reversed counts
    summed, self-loops dropped — graph.derive_undirected semantics).
    SQL oracle: bounded weighted min-plus recursive CTE; MIN(d) over
    iterations is exact once the bound exceeds the max hop count of a
    min-cost path (hops ≤ cost ≤ diameter·max-mult ≪ the 64 bound)."""
    from .bfs import min_vertex_name, reachable_dists, sssp

    gdir = _graph(sf_dir, "undirected")
    seed = min_vertex_name(gdir)
    res = sssp(gdir, [seed])
    return reachable_dists(res, gdir)


def kcore_vertices_sf(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """(name) vertices of the k-core (k=3) of the undirected lineitem
    graph — synchronous peeling on the shard label loop
    (rayrank.kcore).  SQL oracle: single-reference recursive CTE of
    the monotone un-intersected peel rule (HAVING COUNT ≥ k), exact
    at fixpoint."""
    from .kcore import core_vertices, kcore

    gdir = _graph(sf_dir, "undirected")
    res = kcore(gdir, k)
    return core_vertices(res, gdir)


def core_numbers_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, core) bounded k-core decomposition (core = min(coreness,
    4)) of the undirected lineitem graph — k_max peels on shared
    resident shards, per-partition alive-sum + co-resident name zip
    (rayrank.kcore.core_numbers).  SQL oracle: one recursive peel CTE
    per k, summed per vertex."""
    from .kcore import core_numbers

    return core_numbers(_graph(sf_dir, "undirected"))


def parts_kmv_jaccard(sf_dir: str) -> pa.Table:
    """(k, union_k, inter_k, jaccard_est) KMV set-similarity estimate
    between the partkey sets shipped in the two set-op years — the
    sketch-based answer to parts_in_both_years' exact INTERSECT, at
    O(k) driver traffic instead of a keyed shuffle
    (rayrank.sketch.kmv_jaccard).  SQL oracle replays the identical
    splitmix64 chain per side in HUGEINT."""
    from .analytics import SETOP_YEAR_A, SETOP_YEAR_B
    from .sketch import kmv_jaccard

    def year_parts(y: int):
        def fn(t: pa.Table):
            if len(t) == 0:
                return
            yr = pc.year(t.column("l_shipdate"))
            keep = t.filter(pc.equal(yr, y))
            if keep.num_rows:
                yield keep.select(["l_partkey"])

        return fn

    base = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate"])
    a = base.map_batches(year_parts(SETOP_YEAR_A), batch_format="pyarrow")
    b = base.map_batches(year_parts(SETOP_YEAR_B), batch_format="pyarrow")
    return kmv_jaccard(a, b, "l_partkey", "l_partkey", k=64)


def pagerank_2iter(sf_dir: str) -> ray.data.Dataset:
    """Exactly two reference-exact power iterations on the lineitem edge
    table — SQL-expressible by unrolling (oracle does the same two
    iterations in CTEs).  Scores rounded to 6 decimals both sides."""
    from .pagerank import power_method

    gdir = _graph(sf_dir, "directed")
    # epsilon=0: always run BOTH updates — the unrolled CTE oracle does
    # two unconditional iterations, and the lagged convergence check
    # could otherwise return after one on near-fixed-point inputs
    res = power_method(gdir, max_iterations=2, epsilon=0.0)
    ds = res.scores_dataset(gdir)
    return ds.map_batches(
        lambda t: pa.table(
            {"name": t.column("name"), "score": pc.round(t.column("score"), 6)}
        ),
        batch_format="pyarrow",
    )


PPR_PREFIX = "1"  # personalization seed set: names starting with "1"


@ray.remote
def _prefix_v_part(
    graph_dir: str, q: int, Q: int, size: int, prefix: str
) -> np.ndarray:
    """Indicator personalization partition for names with a prefix —
    built from the partition's own vertex file (no driver vertex scan;
    same shape as search._v_part, reference pagerank.py:81-97)."""
    import pyarrow.parquet as pq

    v = np.zeros(size, np.float64)
    part_dir = os.path.join(graph_dir, "vertices", f"q={q}")
    if not os.path.isdir(part_dir):
        return v
    t = pq.read_table(part_dir, columns=["vid", "name"])
    mask = pc.starts_with(t.column("name"), prefix).to_numpy(
        zero_copy_only=False
    )
    vids = t.column("vid").to_numpy()[mask]
    v[vids // Q] = 1.0
    return v


def pagerank_personalized_2iter(sf_dir: str) -> ray.data.Dataset:
    """Two reference-exact PERSONALIZED power iterations (v = indicator
    on names starting with '1', L2-normalized actor-side; x0 stays
    uniform 1/√n exactly as power_method does).  SQL oracle unrolls the
    same two updates with a per-vertex v̂ column — flips the
    personalization path (previously pytest-only) to hash-checked."""
    from .graph import GraphMeta
    from .pagerank import power_method

    gdir = _graph(sf_dir, "directed")
    meta = GraphMeta.load(os.path.join(gdir, "meta.json"))
    v_parts = [
        _prefix_v_part.remote(gdir, q, meta.Q, meta.part_sizes[q], PPR_PREFIX)
        for q in range(meta.Q)
    ]
    res = power_method(gdir, max_iterations=2, epsilon=0.0, v_parts=v_parts)
    ds = res.scores_dataset(gdir)
    return ds.map_batches(
        lambda t: pa.table(
            {"name": t.column("name"), "score": pc.round(t.column("score"), 6)}
        ),
        batch_format="pyarrow",
    )


def spam_mass(sf_dir: str) -> ray.data.Dataset:
    """(name, pr, tr, spam_mass) — the classic link-spam signal
    (Gyöngyi et al.): global PageRank vs TrustRank (PageRank
    personalized on a trusted seed set — here the '1'-prefix set the
    personalized query already pins); spam_mass = (pr − tr) / pr, the
    fraction of a page's rank NOT explainable from trusted sources.
    Both inputs are the SQL-checked 2-iteration runs (6dp-rounded on
    both sides, so the one subtract-and-divide float chain operates on
    bit-identical inputs and the oracle composes the two unrolled CTE
    bodies as derived tables).  Scale shape: two shard solves over the
    SAME resident layout + one name-keyed join — no new wide op."""
    from .joins import join_auto

    pr = pagerank_2iter(sf_dir).map_batches(
        lambda t: t.rename_columns(["name", "pr"]), batch_format="pyarrow"
    )
    tr = pagerank_personalized_2iter(sf_dir).map_batches(
        lambda t: t.rename_columns(["tname", "tr"]), batch_format="pyarrow"
    )
    j = join_auto(pr, tr, on=("name",), right_on=("tname",),
                  num_partitions=P)

    def score(t: pa.Table):
        if t.num_rows == 0 or "tr" not in t.schema.names:
            return
        p = t.column("pr").to_numpy(zero_copy_only=False)
        r = t.column("tr").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "name": t.column("name"),
                "pr": t.column("pr"),
                "tr": t.column("tr"),
                "spam_mass": pa.array((p - r) / p),
            }
        )

    return j.map_batches(score, batch_format="pyarrow")


def hits_2iter(sf_dir: str) -> ray.data.Dataset:
    """Exactly two HITS iterations (pinned rule in rayrank.hits) on the
    lineitem edge graph — (name, auth, hub) rounded to 6 decimals.
    SQL-expressible by unrolling the two L2-normalized half-step pairs
    (same strategy as pagerank_2iter)."""
    from .hits import hits

    gdir = _graph(sf_dir, "directed")
    rdir = _graph(sf_dir, "reversed")
    res = hits(gdir, rdir, iterations=2)
    ds = res.scores_dataset(gdir)
    return ds.map_batches(
        lambda t: pa.table(
            {
                "name": t.column("name"),
                "auth": pc.round(t.column("auth"), 6),
                "hub": pc.round(t.column("hub"), 6),
            }
        ),
        batch_format="pyarrow",
    )


def pagerank_converged(sf_dir: str) -> ray.data.Dataset:
    """Full converged PageRank — (name, score) rounded to 6 decimals.
    SQL oracle: recursive-CTE power iteration with the SAME lagged L2
    stop (window-normalized per step, dangling mass via self-subquery;
    verified exact vs the numpy reference oracle in-sandbox)."""
    from .pagerank import power_method

    gdir = _graph(sf_dir, "directed")
    res = power_method(gdir)
    ds = res.scores_dataset(gdir)
    return ds.map_batches(
        lambda t: pa.table(
            {"name": t.column("name"), "score": pc.round(t.column("score"), 6)}
        ),
        batch_format="pyarrow",
    )


def triangle_count_sf(sf_dir: str) -> pa.Table:
    from .triangles import triangle_count

    gdir = _graph(sf_dir, "tri")
    return pa.table(
        {"triangles": pa.array([triangle_count(gdir)], pa.int64())}
    )


def clustering_coeff(sf_dir: str) -> ray.data.Dataset:
    """(name, triangles, degree, coeff) local clustering coefficient on
    the triangle-bearing undirected graph: coeff = 2T/(d·(d−1)), 0 when
    d < 2.  Triangles ride the shard protocol (per-vertex counts stay
    actor-resident, zipped with names in tasks); simple degrees are
    block-local counts on the part=src%Q edge layout (every src's edges
    co-reside, so NO shuffle); one vid-keyed join marries them.  The
    division is a single double op computed identically in the SQL
    oracle — no rounding needed."""
    from .graph import load_edges
    from .joins import join_auto
    from .triangles import triangles_per_vertex, triangles_per_vertex_shards

    gdir = _graph(sf_dir, "tri")
    try:
        tri = triangles_per_vertex_shards(gdir)
    except Exception as e:  # uint64 key-width guard → Dataset path
        if "combined wedge key" not in str(e):
            raise
        tri = triangles_per_vertex(gdir)

    def deg_block(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        g = t.select(["src"]).group_by(["src"]).aggregate([([], "count_all")])
        yield g.rename_columns(["src", "degree"])

    # block partials + keyed sum: the parquet reader may split one
    # part file into several blocks, so a src's rows can span blocks
    def rn_deg(t: pa.Table):
        if len(t) == 0 or "sum(degree)" not in t.schema.names:
            return
        yield t.rename_columns(["src", "degree"])

    deg = (
        load_edges(gdir)
        .map_batches(deg_block, batch_format="pyarrow")
        .groupby("src")
        .sum("degree")
        .map_batches(rn_deg, batch_format="pyarrow")
    )
    j = join_auto(tri, deg, on=("vid",), right_on=("src",), num_partitions=P)

    def finish(t: pa.Table):
        if len(t) == 0 or "degree" not in t.schema.names:
            return
        tr = t.column("triangles").to_numpy(zero_copy_only=False)
        d = t.column("degree").to_numpy(zero_copy_only=False)
        denom = d * (d - 1)
        coeff = np.divide(
            (2 * tr).astype(np.float64),
            denom,
            out=np.zeros(len(d), np.float64),
            where=denom > 0,
        )
        yield pa.table(
            {
                "name": t.column("name"),
                "triangles": pa.array(tr),
                "degree": pa.array(d),
                "coeff": pa.array(coeff),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def connected_components_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, component=min member name) on the undirected lineitem
    graph.  SQL oracle: iterated min-label CTE is not expressible in
    guaranteed-terminating ANSI SQL → rows-only; pytest covers exact
    equality vs networkx."""
    from .components import canonical_components, connected_components

    gdir = _graph(sf_dir, "undirected")
    cc = connected_components(gdir)
    return canonical_components(cc, gdir)


CCD_Y_OLD, CCD_Y_NEW = 1995, 1996


def cc_delta_refresh(sf_dir: str) -> ray.data.Dataset:
    """(name, component) — INCREMENTAL connected-components
    maintenance: labels for the ship-year ≤ ``CCD_Y_OLD`` snapshot are
    computed once, then the ``CCD_Y_NEW`` delta edges merge into them
    WITHOUT re-running CC on the union — the daily-crawl refresh path
    (edge_churn tells you whether to take it; this op takes it).
    303 old components merge to 8 at sf0.01 — non-degenerate.

    Incremental rule: each delta edge maps its endpoints through the
    old labels (new vertices are their own label), the distinct
    cross-label pairs form a QUOTIENT graph (bounded by the delta,
    never the base), CC runs on the quotient only, and one relabel
    join updates the base.  Canonical labels survive: every old label
    is the min member name of its component, so the min over merged
    reps IS the min name of the union component — the output equals a
    full recompute bit-for-bit, which is exactly what the SQL oracle
    does (min-label CTE over the union edge set): the oracle proves
    the incremental path equivalent to the full rebuild.

    Scale shape: base CC on resident shards (once), delta = one year
    of edges, quotient ≤ delta rows, two label joins — no wide op
    touches the base edge set again."""
    from .components import canonical_components, connected_components
    from .graph import build_graph, derive_undirected
    from .joins import join_auto
    from .shuffle import keyed_reagg

    def year_edges(lo_ok, hi):
        def fn(t: pa.Table):
            if len(t) == 0:
                return
            y = pc.year(t.column("l_shipdate")).to_numpy(zero_copy_only=False)
            keep = (y <= hi) if lo_ok else (y == hi)
            if not keep.any():
                return
            s = t.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
            d = t.column("l_partkey").to_numpy(zero_copy_only=False)[keep]
            yield pa.table(
                {
                    "src_name": pc.cast(pa.array(s), pa.string()),
                    "dst_name": pc.cast(pa.array(d), pa.string()),
                }
            )

        return _read(
            sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_shipdate"]
        ).map_batches(fn, batch_format="pyarrow")

    # base snapshot: CC once
    gdir = tempfile.mkdtemp(prefix="rayrank_ccd_old_")
    build_graph(year_edges(True, CCD_Y_OLD), gdir, num_partitions=P)
    udir = tempfile.mkdtemp(prefix="rayrank_ccd_und_")
    derive_undirected(gdir, udir)
    base = canonical_components(
        connected_components(udir), udir
    ).materialize()  # (name, component); reused three times

    delta = year_edges(False, CCD_Y_NEW).materialize()

    # delta endpoints through old labels (own name when unseen)
    j1 = join_auto(delta, base, on=("src_name",), right_on=("name",),
                   how="left_outer", num_partitions=P)

    def r1(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        yield pa.table(
            {
                "ca": pc.coalesce(t.column("component"), t.column("src_name")),
                "dst_name": t.column("dst_name"),
            }
        )

    j2 = join_auto(
        j1.map_batches(r1, batch_format="pyarrow"), base,
        on=("dst_name",), right_on=("name",), how="left_outer",
        num_partitions=P,
    )

    def quo(t: pa.Table):
        if t.num_rows == 0 or "ca" not in t.schema.names:
            return
        cb = pc.coalesce(t.column("component"), t.column("dst_name"))
        g = (
            pa.table({"src_name": t.column("ca"), "dst_name": cb})
            .group_by(["src_name", "dst_name"])
            .aggregate([])
        )
        yield g.rename_columns(["src_name", "dst_name"])

    quotient = j2.map_batches(quo, batch_format="pyarrow")
    qdir = tempfile.mkdtemp(prefix="rayrank_ccd_q_")
    build_graph(quotient, qdir, num_partitions=P)
    qudir = tempfile.mkdtemp(prefix="rayrank_ccd_qu_")
    derive_undirected(qdir, qudir)
    qmap = canonical_components(connected_components(qudir), qudir)

    def as_map(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        yield pa.table(
            {"rep": t.column("name"), "super": t.column("component")}
        )

    qmap = qmap.map_batches(as_map, batch_format="pyarrow").materialize()

    # old vertices: label -> coalesce(super, label)
    upd = join_auto(base, qmap, on=("component",), right_on=("rep",),
                    how="left_outer", num_partitions=P)

    def fin_old(t: pa.Table):
        if t.num_rows == 0 or "name" not in t.schema.names:
            return
        yield pa.table(
            {
                "name": t.column("name"),
                "component": pc.coalesce(
                    t.column("super"), t.column("component")
                ),
            }
        )

    old_labels = upd.map_batches(fin_old, batch_format="pyarrow")

    # brand-new vertices: rep = own name; anti-join against the base
    def dverts(t: pa.Table):
        if t.num_rows == 0 or "src_name" not in t.schema.names:
            return
        both = pa.concat_arrays(
            [
                t.column("src_name").combine_chunks(),
                t.column("dst_name").combine_chunks(),
            ]
        )
        g = pa.table({"name": both}).group_by(["name"]).aggregate([])
        yield g.rename_columns(["name"])

    nv = keyed_reagg(
        delta.map_batches(dverts, batch_format="pyarrow"), ["name"], [], P,
    )
    nv = join_auto(
        nv, base.select_columns(["name"]), on=("name",), how="anti",
        num_partitions=P,
    )
    nupd = join_auto(nv, qmap, on=("name",), right_on=("rep",),
                     how="left_outer", num_partitions=P)

    def fin_new(t: pa.Table):
        if t.num_rows == 0 or "name" not in t.schema.names:
            return
        yield pa.table(
            {
                "name": t.column("name"),
                "component": pc.coalesce(t.column("super"), t.column("name")),
            }
        )

    return old_labels.union(nupd.map_batches(fin_new, batch_format="pyarrow"))


def katz_centrality_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, katz) — exactly 3 Katz iterations (α=1/16, β=1,
    multiplicity adjacency) on the directed lineitem graph.  The
    integer z-recurrence (rayrank/katz.py) makes every distributed sum
    exact, so the unrolled SQL oracle matches BIT-IDENTICALLY (one
    shared final /16³ division — no rounding needed)."""
    from .katz import katz

    gdir = _graph(sf_dir, "directed")
    res = katz(gdir, iters=3)
    return res.scores_dataset(gdir).select_columns(["name", "katz"])


def strongly_connected_components_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, component=min member name) strongly connected components
    of the cyclic order↔part lineitem graph (scc_edges) — trim +
    forward-coloring + backward-mark peel on the shard loop
    (rayrank/scc.py).  SQL oracle (_SCC_SQL): closure from the small
    back-edge-head set only — every cycle here crosses a p→o edge, so
    mutual reachability with some back-head identifies the SCC without
    a quadratic all-pairs closure.  pytest additionally pins exact
    equality vs networkx."""
    from .components import canonical_components
    from .scc import scc

    gdir = _graph(sf_dir, "scc")
    rdir = _graph(sf_dir, "scc_rev")
    res = scc(gdir, rdir)
    return canonical_components(res, gdir)


def scc_condensation_edges(sf_dir: str) -> ray.data.Dataset:
    """(comp_s, comp_t, n_edges) — the condensation DAG of the cyclic
    order↔part graph (scc_edges): every DISTINCT directed edge
    re-expressed between SCC supernodes; intra-SCC edges vanish.  The
    condensation is acyclic by construction — the summary graph a
    100-TB reachability index iterates on.  Supernode ids are the
    canonical min-member names, identical to the _SCC_SQL back-head
    closure's labels, so the whole contraction is oracle-checked.
    Scale shape: ONE keyed dedup of the edge set, the engine's SCC
    shard loop for labels, two hash joins against the label table,
    one (comp_s, comp_t)-keyed count."""
    from .components import canonical_components
    from .joins import join_auto
    from .scc import scc
    from .shuffle import keyed_reagg

    gdir = _graph(sf_dir, "scc")
    rdir = _graph(sf_dir, "scc_rev")
    labels = canonical_components(scc(gdir, rdir), gdir)

    def pre(t: pa.Table):
        if t.num_rows == 0 or "src_name" not in t.schema.names:
            return
        g = (
            t.select(["src_name", "dst_name"])
            .group_by(["src_name", "dst_name"])
            .aggregate([])
        )
        yield g.rename_columns(["src_name", "dst_name"])

    dedup = keyed_reagg(
        scc_edges(sf_dir).map_batches(pre, batch_format="pyarrow"),
        ["src_name", "dst_name"], [], P,
    )
    j1 = join_auto(
        dedup, labels, on=("src_name",), right_on=("name",),
        num_partitions=P,
    )

    def lab1(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        yield pa.table(
            {
                "comp_s": t.column("component"),
                "dst_name": t.column("dst_name"),
            }
        )

    j2 = join_auto(
        j1.map_batches(lab1, batch_format="pyarrow"),
        labels, on=("dst_name",), right_on=("name",),
        num_partitions=P,
    )

    def quot(t: pa.Table):
        if t.num_rows == 0 or "comp_s" not in t.schema.names:
            return
        cs, ct = t.column("comp_s"), t.column("component")
        keep = pc.invert(pc.equal(cs, ct))
        g = (
            pa.table(
                {
                    "comp_s": cs.filter(keep),
                    "comp_t": ct.filter(keep),
                    "n_edges": pa.array(
                        np.ones(int(pc.sum(keep).as_py() or 0), np.int64)
                    ),
                }
            )
            .group_by(["comp_s", "comp_t"])
            .aggregate([("n_edges", "sum")])
        )
        yield g.rename_columns(["comp_s", "comp_t", "n_edges"])

    return keyed_reagg(
        j2.map_batches(quot, batch_format="pyarrow"),
        ["comp_s", "comp_t"], [("n_edges", "sum")], P,
    )


KNN_CC_K = 2


def knn_graph_components(sf_dir: str) -> ray.data.Dataset:
    """(name, component=min member name) connected components of the
    MUTUAL-kNN graph over the embeddings table — the embedding-dedup
    clustering composite (RNN pairs → graph → CC), and the one
    clustering path with an EXACT SQL oracle (the LSH/minhash cluster
    analogues are approximate by design, rows-only).  Pipeline: exact
    reciprocal top-k pairs (ann.mutual_knn_pairs), cast to the name
    edge schema, ONE graph build, shard-loop CC, canonical min-name
    labels.  Vertices with no mutual neighbor are absent (no edge ⇒
    not in the graph), mirrored by the oracle's pair-member vertex
    set.  k=2 (strictest mutuality) — the k=5 mutual graph percolates
    into one giant component on this corpus; at 2 the clustering is
    real (93 components at sf0.001)."""
    from .ann import mutual_knn_pairs
    from .components import canonical_components, connected_components

    def names(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        yield pa.table(
            {
                "src_name": pc.cast(t.column("a"), pa.string()),
                "dst_name": pc.cast(t.column("b"), pa.string()),
            }
        )

    edges = mutual_knn_pairs(sf_dir, k=KNN_CC_K).map_batches(
        names, batch_format="pyarrow"
    )
    gdir = tempfile.mkdtemp(prefix="rayrank_knn_cc_")
    build_graph(edges, gdir, num_partitions=P, undirected=True)
    cc = connected_components(gdir)
    return canonical_components(cc, gdir)


def minhash_cluster_labels(sf_dir: str) -> ray.data.Dataset:
    """(name, component=min member name) near-duplicate clusters from
    the fully ORACLE-CHECKED exact-minhash LSH chain: splitmix-exact
    signatures → banded bucket candidates → exact shingle Jaccard
    (text.lsh_candidate_jaccard, every stage SQL-green) → pairs kept
    by the INTEGER threshold ``10·inter ≥ 8·union`` (jaccard ≥ 0.8
    with no float comparison) → ONE graph build → shard-loop CC →
    canonical min-name labels.  This gives the dedup family an
    end-to-end SQL-checked clustering path; the polars-hash
    ``minhash_clusters`` twin stays rows-only by design (its shingle
    hash is not SQL-reproducible).  Labels are lexicographic string
    mins on BOTH sides (the ego_network_edges lesson: canonicalize
    after casting)."""
    from .components import canonical_components, connected_components
    from .text import lsh_candidate_jaccard

    def names(t: pa.Table):
        if t.num_rows == 0 or "inter_size" not in t.schema.names:
            return
        keep = pc.greater_equal(
            pc.multiply(t.column("inter_size"), pa.scalar(10, pa.int64())),
            pc.multiply(t.column("union_size"), pa.scalar(8, pa.int64())),
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return
        yield pa.table(
            {
                "src_name": pc.cast(t.column("doc_a"), pa.string()),
                "dst_name": pc.cast(t.column("doc_b"), pa.string()),
            }
        )

    edges = lsh_candidate_jaccard(sf_dir).map_batches(
        names, batch_format="pyarrow"
    )
    gdir = tempfile.mkdtemp(prefix="rayrank_mh_cc_")
    build_graph(edges, gdir, num_partitions=P, undirected=True)
    cc = connected_components(gdir)
    return canonical_components(cc, gdir)


def label_propagation_sf(sf_dir: str) -> ray.data.Dataset:
    from .labelprop import label_propagation

    gdir = _graph(sf_dir, "undirected")
    lp = label_propagation(gdir, max_iterations=10)
    return lp.labels_dataset(gdir).select_columns(["name", "label"])


def two_hop_neighbors(sf_dir: str) -> ray.data.Dataset:
    """(name, ball2) — the number of distinct vertices within ≤ 2 hops
    of each vertex (self excluded) on the undirected lineitem graph:
    the multi-hop expansion + distinct-count shape.  NO join and NO
    pair-level shuffle: because und is symmetric, routing the deduped
    edge set by its SECOND endpoint co-locates each mid vertex m's
    full neighbor set N(m); the block then emits N(m) ONCE per
    receiver as a ``list<int64>`` payload — (a, N(m)) for every
    a ∈ N(m), plus (m, N(m)) for the 1-hop set — so the wire carries
    Σ deg rows (not the Σ deg² expansion, ~19 M at SF=0.1; the same
    bytes move, but per-row shuffle overhead is what dominates).  One
    repartition by receiver co-locates everything a vertex can reach
    in ≤ 2 hops; the distinct count is a single vectorized lexsort +
    dedup per block.

    Hub safety (r2 VERDICT #2): a mid vertex's shipped list is capped
    at ``TWO_HOP_HUB_CAP`` ids (deterministic: the ascending-id
    prefix), so a celebrity vertex of degree D costs D·cap receiver
    rows instead of D² — no straggler partition at web scale.  EVERY
    member of a capped mid's neighborhood still receives a row, with
    ``trunc`` = dropped-id count; the output's ``truncated`` column
    (Σ dropped over a receiver's mids) is therefore 0 exactly when
    that vertex's ball2 is exact — the no-silent-caps rule.  At the
    test SFs no degree approaches the cap, so the oracle pins
    truncated = 0."""
    from . import dyn_partitions

    # width=1: the expansion-heavy shuffle wants ONE partition per CPU
    # (2× over-partitioning measured +2 s of exchange spin-up at sf0.1)
    P2 = max(16, dyn_partitions(width=1))
    cap = TWO_HOP_HUB_CAP

    und_pre = und_both
    # block-deduped both-direction rows route STRAIGHT to the mid
    # partition: the global (a, b) dedup happens inside the mid block
    # (every copy of (a, m) lands there), saving a whole keyed re-agg
    und = sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow")

    mid = und.repartition(P2, keys=["b"])

    def ship_nbr_sets(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((a, b))
        a_s, b_s = a[order], b[order]
        uniq = np.r_[True, (b_s[1:] != b_s[:-1]) | (a_s[1:] != a_s[:-1])]
        a_s, b_s = a_s[uniq], b_s[uniq]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        d = np.diff(np.r_[starts, len(b_s)])
        # hub cap: the shipped PAYLOAD keeps only each mid's first
        # ``cap`` ascending ids; every member still gets a row (so
        # affected receivers are all flagged), carrying the drop count
        local = np.arange(len(a_s), dtype=np.int64) - np.repeat(starts, d)
        keep = local < cap
        a_c = a_s[keep]
        d_c = np.minimum(d, cap)
        dropped = (d - d_c).astype(np.int64)
        off_c = np.r_[0, np.cumsum(d_c)].astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(off_c), pa.array(a_c))
        gidx = np.repeat(np.arange(len(d)), d)
        # 2-hop: every member of N(m) receives N(m); 1-hop: m itself does
        yield pa.table(
            {
                "recv": pa.array(np.r_[a_s, b_s[starts]]),
                "nbrs": pa.concat_arrays(
                    [lists.take(pa.array(gidx)), lists]
                ),
                "trunc": pa.array(np.r_[dropped[gidx], dropped]),
            }
        )

    shipped = mid.map_batches(
        ship_nbr_sets, batch_size=None, batch_format="pyarrow"
    ).repartition(P2, keys=["recv"])

    def count_distinct(t: pa.Table):
        if t.num_rows == 0 or "recv" not in t.schema.names:
            return
        recv = t.column("recv").to_numpy(zero_copy_only=False)
        trunc = t.column("trunc").to_numpy(zero_copy_only=False)
        lst = t.column("nbrs").combine_chunks()
        vals = lst.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(lst.offsets.to_numpy(zero_copy_only=False))
        owner = np.repeat(recv, lens)
        order = np.lexsort((vals, owner))
        o_s, v_s = owner[order], vals[order]
        keep = np.r_[True, (o_s[1:] != o_s[:-1]) | (v_s[1:] != v_s[:-1])]
        keep &= o_s != v_s  # self excluded
        o_k = o_s[keep]
        if len(o_k) == 0:
            return
        starts = np.flatnonzero(np.r_[True, o_k[1:] != o_k[:-1]])
        cnt = np.diff(np.r_[starts, len(o_k)])
        # Σ dropped ids over this receiver's mids: 0 ⟺ ball2 exact
        tr = (
            pa.table({"r": pa.array(recv), "tr": pa.array(trunc)})
            .group_by(["r"]).aggregate([("tr", "sum")])
        )
        tr_r = tr.column("r").to_numpy(zero_copy_only=False)
        tr_v = tr.column("tr_sum").to_numpy(zero_copy_only=False)
        tro = np.argsort(tr_r, kind="stable")
        tr_r, tr_v = tr_r[tro], tr_v[tro]
        names = o_k[starts]
        # every receiver in names has ≥1 recv row, so the lookup is exact
        yield pa.table(
            {
                "name": pa.array(names),
                "ball2": pa.array(cnt.astype(np.int64)),
                "truncated": pa.array(
                    tr_v[np.searchsorted(tr_r, names)].astype(np.int64)
                ),
            }
        )

    return shipped.map_batches(
        count_distinct, batch_size=None, batch_format="pyarrow"
    )


TWO_HOP_NEIGHBORS_SQL = """
WITH raw AS (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
reach AS (
  SELECT e1.a, e2.b FROM und e1 JOIN und e2 ON e1.b = e2.a
  WHERE e1.a <> e2.b
  UNION ALL
  SELECT a, b FROM und
)
SELECT a AS name, CAST(COUNT(DISTINCT b) AS BIGINT) AS ball2,
  CAST(0 AS BIGINT) AS truncated
FROM reach GROUP BY 1
"""


CN_DEG_CAP = 24
CN_TOP_K = 100


def common_neighbors(sf_dir: str) -> ray.data.Dataset:
    """Link prediction by common-neighbor counting on the undirected
    lineitem graph: the top-``CN_TOP_K`` NON-edges (u, v) ranked by
    the number of shared neighbors ``cn`` (ties: Σ deg(center) asc,
    then u, v) — the candidate-generation stage of a link-prediction /
    recommendation pipeline (Adamic-Adar family, kept in integers so
    the oracle match is exact).

    Hub rule (standard for this family, and the scale guard): only
    centers with ``2 ≤ deg ≤ CN_DEG_CAP`` generate wedges, so the pair
    expansion is Σ_{deg≤cap} deg² ≈ cap·|E|, never the unbounded hub
    quadratic; the cap is part of the operator contract and mirrored
    in the SQL oracle.

    Scale shape: the two_hop_neighbors routing — block-deduped
    both-direction edges repartition ONCE by the center endpoint, so
    each center's full (globally deduped) neighbor set is block-local;
    pair emission is a vectorized segmented arange (no per-center
    Python loop); per-block ``group_by`` pre-combines before the ONE
    (u, v)-keyed re-agg; existing edges leave via a keyed anti-join;
    the final top-k uses the pre-truncate → coalesce → re-rank pattern
    (≤ k rows per block cross the wire)."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    P2 = 16

    und_pre = und_both
    # materialized ONCE: the wedge repartition AND the existing-edge
    # anti-join both consume the undirected edge map — without the cut
    # each consumption re-runs the read + canonicalization
    from .shuffle import materialize_cut as _mcut

    und = _mcut(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow")
    )
    mid = und.repartition(P2, keys=["b"])

    def emit_pairs(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((a, b))
        a_s, b_s = a[order], b[order]
        uniq = np.r_[True, (b_s[1:] != b_s[:-1]) | (a_s[1:] != a_s[:-1])]
        a_s, b_s = a_s[uniq], b_s[uniq]  # global dedup: all copies land here
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        deg = np.diff(np.r_[starts, len(b_s)])
        ok = (deg >= 2) & (deg <= CN_DEG_CAP)
        if not ok.any():
            return
        starts, deg = starts[ok], deg[ok]
        # neighbors of each kept center, ascending (lexsort guarantees)
        take = np.repeat(starts, deg) + _seg_arange(deg)
        vals = a_s[take]
        seg_starts = np.r_[0, np.cumsum(deg)[:-1]]
        # each position p in its segment pairs with the tail after it
        tail = np.repeat(seg_starts + deg, deg) - np.arange(len(vals)) - 1
        first = np.repeat(np.arange(len(vals)), tail)
        second = first + _seg_arange(tail) + 1
        if len(first) == 0:
            return
        sdeg = np.repeat(np.repeat(deg.astype(np.int64), deg), tail)
        g = (
            pa.table(
                {
                    "u": pa.array(vals[first]),
                    "v": pa.array(vals[second]),
                    "cn": pa.array(np.ones(len(first), np.int64)),
                    "sdeg": pa.array(sdeg),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("cn", "sum"), ("sdeg", "sum")])
        )
        yield g.rename_columns(["u", "v", "cn", "sdeg"])

    pairs = keyed_reagg(
        mid.map_batches(emit_pairs, batch_size=None, batch_format="pyarrow"),
        ["u", "v"], [("cn", "sum"), ("sdeg", "sum")], P2,
    )
    fresh = join_auto(pairs, und, on=("u", "v"), right_on=("a", "b"),
                      how="anti", num_partitions=P2)

    def local_topk(t: pa.Table):
        if t.num_rows == 0 or "cn" not in t.schema.names:
            return
        t = _cn_rank_head(t, CN_TOP_K)
        yield t

    g = fresh.map_batches(
        local_topk, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "cn" not in t.schema.names:
            return
        yield _cn_rank_head(t, CN_TOP_K)

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


def adamic_adar(sf_dir: str) -> ray.data.Dataset:
    """Weighted link prediction on the undirected lineitem graph: the
    top-``CN_TOP_K`` non-edges (u, v) scored by BOTH classic
    common-neighbor weightings, kept in quantized integers so the
    DuckDB oracle match is exact —

    * Adamic-Adar   ``aa_q = Σ_c floor(1e9 / ln(deg(c)))``
    * resource allocation ``ra_q = Σ_c 10^12 // deg(c)`` (pure int)

    over shared neighbors ``c`` with ``2 ≤ deg(c) ≤ CN_DEG_CAP`` (the
    common_neighbors hub rule; the cap is the operator contract).  The
    ln quantization is the zipf_slope floor(·1e9) rule: ln on an exact
    int-valued double, one division, one floor — numpy and DuckDB
    share libm, so per-pair integer sums are order-free and exact.
    Rank: (aa_q desc, ra_q desc, u, v) — an all-integer total order.

    Scale shape: identical to common_neighbors — ONE repartition by
    the wedge center makes global degree block-local, vectorized
    segmented pair emission, per-block pre-combine, one (u, v)-keyed
    re-agg, keyed anti-join against existing edges, pre-truncate →
    coalesce → re-rank top-k."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    P2 = 16

    und_pre = und_both
    # materialized ONCE: the wedge repartition AND the existing-edge
    # anti-join both consume the undirected edge map — without the cut
    # each consumption re-runs the read + canonicalization
    from .shuffle import materialize_cut as _mcut

    und = _mcut(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow")
    )
    mid = und.repartition(P2, keys=["b"])

    def emit_pairs(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((a, b))
        a_s, b_s = a[order], b[order]
        uniq = np.r_[True, (b_s[1:] != b_s[:-1]) | (a_s[1:] != a_s[:-1])]
        a_s, b_s = a_s[uniq], b_s[uniq]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        deg = np.diff(np.r_[starts, len(b_s)])
        ok = (deg >= 2) & (deg <= CN_DEG_CAP)
        if not ok.any():
            return
        starts, deg = starts[ok], deg[ok]
        # per-center quantized weights (one float chain, SQL-mirrored)
        aaq = np.floor(
            1000000000.0 / np.log(deg.astype(np.float64))
        ).astype(np.int64)
        raq = 10**12 // deg.astype(np.int64)
        take = np.repeat(starts, deg) + _seg_arange(deg)
        vals = a_s[take]
        seg_starts = np.r_[0, np.cumsum(deg)[:-1]]
        tail = np.repeat(seg_starts + deg, deg) - np.arange(len(vals)) - 1
        first = np.repeat(np.arange(len(vals)), tail)
        second = first + _seg_arange(tail) + 1
        if len(first) == 0:
            return
        w_aa = np.repeat(np.repeat(aaq, deg), tail)
        w_ra = np.repeat(np.repeat(raq, deg), tail)
        g = (
            pa.table(
                {
                    "u": pa.array(vals[first]),
                    "v": pa.array(vals[second]),
                    "cn": pa.array(np.ones(len(first), np.int64)),
                    "aa_q": pa.array(w_aa),
                    "ra_q": pa.array(w_ra),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("cn", "sum"), ("aa_q", "sum"), ("ra_q", "sum")])
        )
        yield g.rename_columns(["u", "v", "cn", "aa_q", "ra_q"])

    pairs = keyed_reagg(
        mid.map_batches(emit_pairs, batch_size=None, batch_format="pyarrow"),
        ["u", "v"], [("cn", "sum"), ("aa_q", "sum"), ("ra_q", "sum")], P2,
    )
    fresh = join_auto(pairs, und, on=("u", "v"), right_on=("a", "b"),
                      how="anti", num_partitions=P2)

    def _head(t: pa.Table) -> pa.Table:
        aa = t.column("aa_q").to_numpy(zero_copy_only=False)
        ra = t.column("ra_q").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u, -ra, -aa))[:CN_TOP_K]
        return t.take(pa.array(order))

    def local_topk(t: pa.Table):
        if t.num_rows == 0 or "aa_q" not in t.schema.names:
            return
        yield _head(t)

    g = fresh.map_batches(
        local_topk, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "aa_q" not in t.schema.names:
            return
        yield _head(t)

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


ADAMIC_ADAR_SQL = f"""
WITH raw AS (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
deg AS (
  SELECT b AS c, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY b
),
elig AS (
  SELECT c, d,
    CAST(FLOOR(1000000000.0 / LN(CAST(d AS DOUBLE))) AS BIGINT) AS aaq,
    CAST(1000000000000 // d AS BIGINT) AS raq
  FROM deg WHERE d BETWEEN 2 AND {CN_DEG_CAP}
),
wedge AS (
  SELECT e1.a AS u, e2.a AS v, el.aaq, el.raq
  FROM und e1 JOIN und e2 ON e1.b = e2.b AND e1.a < e2.a
  JOIN elig el ON el.c = e1.b
),
cnt AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
         CAST(SUM(aaq) AS BIGINT) AS aa_q,
         CAST(SUM(raq) AS BIGINT) AS ra_q
  FROM wedge GROUP BY u, v
),
fresh AS (
  SELECT cnt.* FROM cnt ANTI JOIN und ON cnt.u = und.a AND cnt.v = und.b
)
SELECT u, v, cn, aa_q, ra_q FROM fresh
QUALIFY ROW_NUMBER() OVER (ORDER BY aa_q DESC, ra_q DESC, u, v) <= {CN_TOP_K}
"""


DISPARITY_ALPHA_Q = -1609437913  # floor(1e9 * ln(0.2)) — pinned


def disparity_backbone(sf_dir: str) -> ray.data.Dataset:
    """Multiscale backbone extraction (Serrano/Boguna/Vespignani
    disparity filter) on the weighted undirected lineitem graph: keep
    edge (u, v) iff it is statistically significant for at least one
    endpoint, ``alpha_ij = (1 - w/s_i)^(k_i - 1) < 0.2`` — the
    graph-sparsification stage that strips noise edges before an
    expensive downstream algorithm.

    Quantized rule (exact, pinned): per direction ``q = floor(ln(1 -
    w/s) * (k-1) * 1e9)`` for ``k >= 2`` else 0 (w < s is guaranteed
    at k >= 2 since every multi-edge weight is >= 1), edge survives iff
    ``min(q_uv, q_vu) < DISPARITY_ALPHA_Q``.  One left-associated
    float chain mirrored verbatim in SQL (the zipf_slope libm rule);
    every aggregate is integer min/max, so the match is bit-exact.

    Scale shape: weight collapse is block-local partials + ONE
    (a, b)-keyed re-agg; node (degree, strength) is a node-bounded
    keyed re-agg; the per-side score joins edges to nodes via
    join_auto (broadcast under the limit, partitioned hash above);
    canonicalization is one more (u, v)-keyed re-agg.  Nothing is
    driver-materialized; output is |backbone|-bounded."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    P2 = 16

    def wund_pre(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) == 0:
            return
        g = (
            pa.table({"a": pa.array(np.r_[s, d]), "b": pa.array(np.r_[d, s])})
            .append_column("w", pa.array(np.ones(2 * len(s), np.int64)))
            .group_by(["a", "b"])
            .aggregate([("w", "sum")])
        )
        yield g.rename_columns(["a", "b", "w"])

    wund = keyed_reagg(
        sf_edges(sf_dir).map_batches(wund_pre, batch_format="pyarrow"),
        ["a", "b"], [("w", "sum")], P2,
    ).materialize()  # edge-bounded; reused by node stats AND the join

    def node_pre(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        g = (
            t.select(["a", "w"])
            .append_column("k", pa.array(np.ones(len(t), np.int64)))
            .group_by(["a"])
            .aggregate([("k", "sum"), ("w", "sum")])
        )
        yield g.rename_columns(["a", "k", "s"])

    node = keyed_reagg(
        wund.map_batches(node_pre, batch_format="pyarrow"),
        ["a"], [("k", "sum"), ("s", "sum")], P2,
    )

    joined = join_auto(wund, node, on=("a",), num_partitions=P2)

    def score(t: pa.Table):
        if t.num_rows == 0 or "k" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        k = t.column("k").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        q = np.zeros(len(w), np.int64)
        m = k >= 2
        if m.any():
            # ONE left-associated float chain, mirrored in the SQL
            q[m] = np.floor(
                np.log(1.0 - w[m].astype(np.float64) / s[m].astype(np.float64))
                * (k[m] - 1).astype(np.float64)
                * 1000000000.0
            ).astype(np.int64)
        g = (
            pa.table(
                {
                    "u": pa.array(np.minimum(a, b)),
                    "v": pa.array(np.maximum(a, b)),
                    "w": pa.array(w),
                    "q": pa.array(q),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("w", "max"), ("q", "min")])
        )
        yield g.rename_columns(["u", "v", "w", "q"])

    canon = keyed_reagg(
        joined.map_batches(score, batch_size=None, batch_format="pyarrow"),
        ["u", "v"], [("w", "max"), ("q", "min")], P2,
    )

    def keep(t: pa.Table):
        if t.num_rows == 0 or "q" not in t.schema.names:
            return
        t = t.filter(pc.less(t.column("q"), DISPARITY_ALPHA_Q))
        if t.num_rows == 0:
            return
        yield t.rename_columns(["u", "v", "w", "q_min"])

    return canon.map_batches(keep, batch_format="pyarrow")


DISPARITY_BACKBONE_SQL = f"""
WITH raw AS (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
  WHERE l_orderkey <> l_partkey
),
wund AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w FROM (
    SELECT s AS a, t AS b FROM raw UNION ALL SELECT t, s FROM raw
  ) GROUP BY a, b
),
node AS (
  SELECT a, CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(w) AS BIGINT) AS s
  FROM wund GROUP BY a
),
q AS (
  SELECT w.a, w.b, w.w,
    CASE WHEN n.k >= 2 THEN
      CAST(FLOOR(LN(1 - CAST(w.w AS DOUBLE) / CAST(n.s AS DOUBLE))
                 * CAST(n.k - 1 AS DOUBLE) * 1000000000.0) AS BIGINT)
    ELSE 0 END AS q
  FROM wund w JOIN node n ON w.a = n.a
),
canon AS (
  SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v,
         CAST(MAX(w) AS BIGINT) AS w, CAST(MIN(q) AS BIGINT) AS q_min
  FROM q GROUP BY 1, 2
)
SELECT u, v, w, q_min FROM canon WHERE q_min < {DISPARITY_ALPHA_Q}
"""


ATTACK_KS = (0, 8, 32)

# two_hop_neighbors ships each mid vertex's neighbor list capped at
# this many ids (ascending prefix); receivers of a capped list carry
# the dropped count in the output's `truncated` column.  Far above any
# test-SF degree, so the oracle pins truncated = 0.
TWO_HOP_HUB_CAP = 4096

# Max-min rounds unrolled by the widest-path SQL oracle
# (__ray_entry__._widest_path_sql uses this same constant); the engine
# asserts its measured round count fits inside the unroll.
WIDEST_PATH_SQL_ROUNDS = 16


def _vids_for_names(gdir: str, Q: int, names: list[str]) -> np.ndarray:
    """vids for a SMALL driver-held name list (≤ a pinned top-k), in
    input order: each name's id partition is known from the stable
    hash, so resolution is ≤ len(names) bounded vertex-partition
    probes in remote tasks — never a corpus-wide dictionary pull."""
    from .ids import stable_hash

    if not names:
        return np.zeros(0, np.int64)
    vdir = os.path.join(gdir, "vertices")
    if not os.path.isdir(vdir):
        # r4 ADVICE: an absent vertex LAYOUT (wrong gdir or a layout
        # change) must not surface as 'names not in graph' — that
        # misdiagnoses an infrastructure problem as missing data
        raise FileNotFoundError(
            f"_vids_for_names: vertex layout missing at {vdir} "
            "(wrong graph_dir or layout change)"
        )
    qs = (stable_hash(np.array(names, dtype=object)) % np.uint64(Q)).astype(
        np.int64
    )

    @ray.remote
    def probe(q: int, want: list[str]) -> pa.Table:
        import pyarrow.parquet as pq

        d = os.path.join(gdir, "vertices", f"q={q}")
        if not os.path.isdir(d):  # empty id partition (same guard as
            return pa.table(      # ids._dict_slice) → the missing-name
                {"name": pa.array([], pa.string()),  # ValueError below
                 "vid": pa.array([], pa.int64())}    # diagnoses it
            )
        t = pq.read_table(d, columns=["name", "vid"])
        m = pc.is_in(t.column("name"), value_set=pa.array(want))
        return t.filter(m)

    by_q: dict[int, list[str]] = {}
    for nm, q in zip(names, qs):
        by_q.setdefault(int(q), []).append(nm)
    got: dict[str, int] = {}
    for t in ray.get([probe.remote(q, w) for q, w in by_q.items()]):
        for nm, vid in zip(
            t.column("name").to_pylist(), t.column("vid").to_pylist()
        ):
            got[nm] = vid
    missing = [nm for nm in names if nm not in got]
    if missing:
        raise ValueError(
            f"vids_for_names: names not in graph: {missing[:5]} "
            f"(vertex layout at {vdir} exists; these names are "
            "genuinely absent)"
        )
    return np.array([got[nm] for nm in names], np.int64)


def attack_robustness(sf_dir: str) -> ray.data.Dataset:
    """(k_removed, n_edges, giant_size) — targeted-attack robustness
    curve: remove the top-k degree hubs (degree desc, id asc — a total
    order) from the undirected distinct lineitem graph and measure the
    surviving edge count and giant connected component, for each
    pinned k.  The resilience audit a link-graph owner runs before
    relying on connectivity (percolation_sweep's sibling: that one
    thins edges at random, this one deletes the most-wired vertices).

    Scale shape (r3 VERDICT item #5 — incremental): ONE canonical edge
    dedup re-agg AND ONE graph build + shard spin-up serve the whole
    sweep; per k the ≤ max(k) hub vids are broadcast into the resident
    shards as a DEAD mask (labels pinned at the min-identity sentinel
    and clamped after every reduce, so dead vertices neither transmit
    nor conduit — vertex removal without touching the CSR arrays), CC
    re-runs on the same actors, and the giant pick is the distributed
    top-1 fold over the ACTIVE-vertex census (never a driver label
    vector).  The hub set is a distributed (deg desc, id) top-k fold;
    name→vid resolution is ≤ max(k) bounded vertex-partition probes.
    Pre-r4 this rebuilt the full graph + CC per k (3 build passes)."""
    from .graph import GraphMeta, build_graph
    from .iterate import iterate_labels
    from .shards import create_shards
    from .shuffle import keyed_reagg

    und_pre = und_canon
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["u", "v"], [], P,
    ).materialize()

    def deg_pre(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        g = (
            pa.table({"x": pa.array(np.r_[u, v])})
            .append_column("d", pa.array(np.ones(2 * len(u), np.int64)))
            .group_by(["x"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["x", "d"])

    deg = keyed_reagg(
        und.map_batches(deg_pre, batch_format="pyarrow"),
        ["x"], [("d", "sum")], P,
    )
    kmax = max(ATTACK_KS)

    def local_top(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        x = t.column("x").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((x, -d))[:kmax]
        yield t.take(pa.array(order))

    hub_rows = (
        deg.map_batches(local_top, batch_size=None, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_top, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    hubs_all = np.array([r["x"] for r in hub_rows], np.int64)  # ranked

    # ONE graph build over the FULL undirected edge set; every k reuses
    # these resident shards with a different dead mask
    def to_names(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        yield pa.table(
            {
                "src_name": pc.cast(t.column("u"), pa.string()),
                "dst_name": pc.cast(t.column("v"), pa.string()),
            }
        )

    gdir = tempfile.mkdtemp(prefix="rayrank_attack_")
    build_graph(
        und.map_batches(to_names, batch_format="pyarrow"),
        gdir, num_partitions=P, undirected=True,
    )
    meta = GraphMeta.load(os.path.join(gdir, "meta.json"))

    def top1(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        lab = t.column("label").to_numpy(zero_copy_only=False)
        i = np.lexsort((lab, -n))[:1]
        yield t.take(pa.array(i))

    out = []
    # shard actors created INSIDE the try: a failed vid probe would
    # otherwise leak 2·Q resident actors that pin CPUs for the session
    # (the fourteenth-sitting bench lesson)
    shards = create_shards(gdir, meta)
    try:
        hub_vids_all = _vids_for_names(
            gdir, meta.Q, [str(int(x)) for x in hubs_all]
        )
        for k in ATTACK_KS:
            hubs = np.sort(hubs_all[:k])

            def cnt_pre(t: pa.Table, hubs=hubs):
                if t.num_rows == 0 or "u" not in t.schema.names:
                    return
                u = t.column("u").to_numpy(zero_copy_only=False)
                v = t.column("v").to_numpy(zero_copy_only=False)
                if len(hubs):
                    bad = np.isin(u, hubs) | np.isin(v, hubs)
                    n = int((~bad).sum())
                else:
                    n = len(u)
                yield pa.table({"c": pa.array([n], pa.int64())})

            n_kept = int(
                und.map_batches(cnt_pre, batch_format="pyarrow").sum("c")
                or 0
            )

            hub_vids = np.sort(hub_vids_all[:k])
            ray.get([s.set_dead.remote(hub_vids) for s in shards])
            iterate_labels(
                gdir,
                gather_method="gather_min",
                reduce_method="reduce_min_masked",
                max_iterations=200,
                shards=shards,
                algo_name="attack_cc",
                init_fn=lambda sh: ray.get(
                    [s.init_labels_masked.remote() for s in sh]
                ),
            )
            sizes = keyed_reagg(
                ray.data.from_arrow_refs(
                    [s.masked_label_census.remote() for s in shards]
                ),
                ["label"], [("n", "sum")], P,
            )
            giant = (
                sizes.map_batches(
                    top1, batch_size=None, batch_format="pyarrow"
                )
                .repartition(1)
                .map_batches(top1, batch_size=None, batch_format="pyarrow")
                .take_all()
            )
            out.append(
                (k, n_kept, int(giant[0]["n"]) if giant else 0)
            )
    finally:
        for s in shards:  # resident shard actors pin CPUs (bench lesson)
            ray.kill(s)

    return ray.data.from_arrow(
        pa.table(
            {
                "k_removed": pa.array([r[0] for r in out], pa.int64()),
                "n_edges": pa.array([r[1] for r in out], pa.int64()),
                "giant_size": pa.array([r[2] for r in out], pa.int64()),
            }
        )
    )


RDV_SHARDS = 8


def rendezvous_shards(sf_dir: str) -> ray.data.Dataset:
    """Rendezvous (highest-random-weight) shard assignment audit: each
    vertex of the lineitem graph goes to ``argmax_j splitmix64(v·S +
    j)`` over shards j = 0..``RDV_SHARDS``−1 (the id-combining hash
    chain used throughout; ties j asc, unreachable in practice), and
    the audit reports (shard, n_vertices, min_v, max_v) — the
    placement-balance check run before pinning stateful actors to a
    keyspace.  HRW's property (removing one shard only moves that
    shard's keys) is what makes it the resharding-safe assignment.

    Scale shape: assignment is pure per-row integer hashing (S
    vectorized splitmix calls per block, no lookup state); the audit
    folds via |S|-bounded partials + one tiny keyed re-agg."""
    from .shuffle import keyed_reagg
    from .sketch import splitmix64

    def vert_pre(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        g = pa.table({"v": pa.array(np.r_[s, d])}).group_by(["v"]).aggregate([])
        yield g.rename_columns(["v"])

    verts = keyed_reagg(
        sf_edges(sf_dir).map_batches(vert_pre, batch_format="pyarrow"),
        ["v"], [], 16,
    )

    def assign(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        v = t.column("v").to_numpy(zero_copy_only=False)
        S = RDV_SHARDS
        w = np.stack(
            [splitmix64(v * np.int64(S) + np.int64(j)) for j in range(S)]
        )  # (S, n) uint64
        shard = np.argmax(w, axis=0).astype(np.int64)  # first max = min j
        g = (
            pa.table(
                {
                    "shard": pa.array(shard),
                    "n_vertices": pa.array(np.ones(len(v), np.int64)),
                    "min_v": pa.array(v),
                    "max_v": pa.array(v),
                }
            )
            .group_by(["shard"])
            .aggregate(
                [("n_vertices", "sum"), ("min_v", "min"), ("max_v", "max")]
            )
        )
        yield g.rename_columns(["shard", "n_vertices", "min_v", "max_v"])

    return keyed_reagg(
        verts.map_batches(assign, batch_format="pyarrow"),
        ["shard"],
        [("n_vertices", "sum"), ("min_v", "min"), ("max_v", "max")],
        2,
    )


def _rendezvous_sql() -> str:
    return f"""
WITH raw AS MATERIALIZED (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
verts0 AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)
),
vj AS MATERIALIZED (
  SELECT v, j, v * {RDV_SHARDS} + j AS key
  FROM verts0, UNNEST(range({RDV_SHARDS})) AS r(j)
),
{{SM}},
pick AS (
  SELECT vj.v, vj.j AS shard
  FROM vj JOIN hh ON vj.key = hh.id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vj.v ORDER BY hh.z DESC, vj.j) = 1
)
SELECT CAST(shard AS BIGINT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_vertices,
  MIN(v) AS min_v, MAX(v) AS max_v
FROM pick GROUP BY shard"""


SLS_ROUNDS = 2


def seeded_label_spread(sf_dir: str) -> ray.data.Dataset:
    """Semi-supervised label spreading (seeded node classification,
    the transductive complement of the community label_propagation op
    — THAT one is rows-only because its labels live in vid space;
    this one is pinned to SQL-reproducible integers): seeds are
    vertices ``v % 10 == 0`` carrying label ``v % 5``; each round
    every still-unlabeled vertex adopts the (vote-count desc, label
    asc) majority label among its labeled neighbors on the undirected
    distinct lineitem graph; seeds and earlier rounds are clamped.
    Exactly ``SLS_ROUNDS`` rounds; output (v, label, rnd).

    Scale shape: per round ONE edge⋈labels join, (v, label)-keyed
    vote re-agg, a v-keyed repartition for the block-local argmax
    pick, and a keyed anti-join to clamp — the gather/majority shape
    of the LP kernel restated over Datasets, rounds bounded by a
    pinned constant."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    P2 = 16
    edges = sf_edges(sf_dir)

    def vert_pre(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        g = pa.table({"v": pa.array(np.r_[s, d])}).group_by(["v"]).aggregate([])
        yield g.rename_columns(["v"])

    verts = keyed_reagg(
        edges.map_batches(vert_pre, batch_format="pyarrow"), ["v"], [], P2,
    )

    und_pre = und_both
    und = keyed_reagg(
        edges.map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [], P2,
    ).materialize()

    def seed(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        v = t.column("v").to_numpy(zero_copy_only=False)
        m = (v % 10) == 0
        if not m.any():
            return
        v = v[m]
        yield pa.table(
            {
                "v": pa.array(v),
                "label": pa.array((v % 5).astype(np.int64)),
                "rnd": pa.array(np.zeros(len(v), np.int64)),
            }
        )

    labeled = verts.map_batches(seed, batch_format="pyarrow")

    from .shuffle import materialize_cut

    for rnd in range(1, SLS_ROUNDS + 1):
        # lineage cut: labeled self-chains and is referenced twice per
        # round (join + union) — uncut plans double per round
        labeled = materialize_cut(labeled)
        nb = join_auto(und, labeled, on=("b",), right_on=("v",),
                       num_partitions=P2)

        def vote_pre(t: pa.Table):
            if t.num_rows == 0 or "label" not in t.schema.names:
                return
            g = (
                pa.table({"v": t.column("a"), "label": t.column("label")})
                .append_column("c", pa.array(np.ones(len(t), np.int64)))
                .group_by(["v", "label"])
                .aggregate([("c", "sum")])
            )
            yield g.rename_columns(["v", "label", "c"])

        votes = keyed_reagg(
            nb.map_batches(vote_pre, batch_format="pyarrow"),
            ["v", "label"], [("c", "sum")], P2,
        ).repartition(P2, keys=["v"])

        def pick(t: pa.Table, rnd=rnd):
            if t.num_rows == 0 or "c" not in t.schema.names:
                return
            v = t.column("v").to_numpy(zero_copy_only=False)
            lab = t.column("label").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            order = np.lexsort((lab, -c, v))
            v, lab = v[order], lab[order]
            first = np.r_[True, v[1:] != v[:-1]]
            yield pa.table(
                {
                    "v": pa.array(v[first]),
                    "label": pa.array(lab[first]),
                    "rnd": pa.array(np.full(int(first.sum()), rnd, np.int64)),
                }
            )

        cand = votes.map_batches(
            pick, batch_size=None, batch_format="pyarrow")

        def keys_only(t: pa.Table):
            if t.num_rows == 0 or "v" not in t.schema.names:
                return
            yield t.select(["v"])

        new = join_auto(
            cand,
            labeled.map_batches(keys_only, batch_format="pyarrow"),
            on=("v",), how="anti", num_partitions=P2,
        )
        labeled = labeled.union(new)

    return labeled


def _seeded_label_sql() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, SLS_ROUNDS + 1):
        rounds.append(f""",
v{r} AS MATERIALIZED (
  SELECT und.a AS v, l.label, CAST(COUNT(*) AS BIGINT) AS c
  FROM und JOIN {prev} l ON und.b = l.v
  WHERE und.a NOT IN (SELECT v FROM {prev})
  GROUP BY 1, 2
),
p{r} AS MATERIALIZED (
  SELECT v, label FROM v{r}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label) = 1
),
l{r} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL SELECT v, label, CAST({r} AS BIGINT) FROM p{r}
)""")
        prev = f"l{r}"
    return f"""
WITH raw AS MATERIALIZED (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)
),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
l0 AS MATERIALIZED (
  SELECT v, CAST(v % 5 AS BIGINT) AS label, CAST(0 AS BIGINT) AS rnd
  FROM verts WHERE v % 10 = 0
){''.join(rounds)}
SELECT v, label, rnd FROM {prev}"""


SEEDED_LABEL_SQL = _seeded_label_sql()


TRIPLE_MIN_SUP = 2
TRIPLE_BASKET_CAP = 64


def frequent_triples(sf_dir: str) -> ray.data.Dataset:
    """Frequent 3-itemsets over order baskets (the Apriori depth-3
    market-basket step): (p1 < p2 < p3, support) for every part
    triple co-purchased in ≥ TRIPLE_MIN_SUP distinct orders.

    Scale shape: baskets are the (order, part) distinct pairs — one
    keyed dedup re-agg — then ONE repartition by order makes each
    basket block-local; triple emission is per-basket combinations
    (bounded by the basket size: C(n,3) with n ≤ 13 in this data; a
    basket over TRIPLE_BASKET_CAP items RAISES, the no-silent-caps
    close_wedges rule, because a pathological 10^5-item basket would
    be a quadrillion-row blowup to emit silently); support folds via
    block partials + one (p1, p2, p3)-keyed re-agg."""
    from itertools import combinations

    from .shuffle import keyed_reagg

    P2 = 16

    def bp_pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        g = (
            pa.table(
                {"o": t.column("l_orderkey"), "p": t.column("l_partkey")}
            )
            .group_by(["o", "p"])
            .aggregate([])
        )
        yield g.rename_columns(["o", "p"])

    baskets = keyed_reagg(
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        ).map_batches(bp_pre, batch_format="pyarrow"),
        ["o", "p"], [], P2,
    ).repartition(P2, keys=["o"])

    def triples(t: pa.Table):
        if t.num_rows == 0 or "o" not in t.schema.names:
            return
        o = t.column("o").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
        lens = np.diff(np.r_[starts, len(o)])
        if (lens > TRIPLE_BASKET_CAP).any():
            raise ValueError(
                f"basket over {TRIPLE_BASKET_CAP} items — refusing the "
                "cubic emission (raise the cap deliberately if intended)"
            )
        p1, p2, p3 = [], [], []
        for s, ln in zip(starts, lens):
            if ln < 3:
                continue
            for a, b, c in combinations(p[s:s + ln], 3):
                p1.append(a)
                p2.append(b)
                p3.append(c)
        if not p1:
            return
        g = (
            pa.table(
                {
                    "p1": pa.array(np.asarray(p1, np.int64)),
                    "p2": pa.array(np.asarray(p2, np.int64)),
                    "p3": pa.array(np.asarray(p3, np.int64)),
                    "support": pa.array(np.ones(len(p1), np.int64)),
                }
            )
            .group_by(["p1", "p2", "p3"])
            .aggregate([("support", "sum")])
        )
        yield g.rename_columns(["p1", "p2", "p3", "support"])

    sup = keyed_reagg(
        baskets.map_batches(
            triples, batch_size=None, batch_format="pyarrow"),
        ["p1", "p2", "p3"], [("support", "sum")], P2,
    )

    def keep(t: pa.Table):
        if t.num_rows == 0 or "support" not in t.schema.names:
            return
        t = t.filter(
            pc.greater_equal(t.column("support"), TRIPLE_MIN_SUP))
        if t.num_rows:
            yield t

    return sup.map_batches(keep, batch_format="pyarrow")


FREQUENT_TRIPLES_SQL = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
t AS (
  SELECT b1.p AS p1, b2.p AS p2, b3.p AS p3,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM b b1
  JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p
  JOIN b b3 ON b2.o = b3.o AND b2.p < b3.p
  GROUP BY 1, 2, 3
)
SELECT p1, p2, p3, support FROM t WHERE support >= {TRIPLE_MIN_SUP}
"""


SUBGRAPH_DENOMS = (2, 4, 8)
_M64_FULL = 1 << 64


def subgraph_sample_curve(sf_dir: str) -> ray.data.Dataset:
    """(denom, n_edges, n_vertices) — vertex-induced subgraph sampling
    audit at pinned rates 1/2, 1/4, 1/8: an edge of the distinct
    directed lineitem graph survives rate 1/d iff BOTH endpoints pass
    ``splitmix64(v) < 2^64 // d`` (the dataset_split exact-integer
    threshold rule, so the sample replays identically at any cluster
    size); n_vertices counts distinct endpoints of surviving edges.
    This is the scale-down harness op: run an expensive algorithm on
    the induced sample before paying for the full graph.

    Scale shape: the edge dedup is one keyed re-agg; per-denom flags
    are computed inline per block (two vectorized splitmix calls, no
    vertex table materializes anywhere); edge counts fold as 3-row
    partials; vertex counts ride one (denom, v)-keyed dedup re-agg —
    everything after the dedup is O(kept edges)."""
    from .shuffle import keyed_reagg
    from .sketch import splitmix64

    P2 = 16

    def e_pre(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        g = (
            pa.table({"s": t.column("src"), "t": t.column("dst")})
            .group_by(["s", "t"])
            .aggregate([])
        )
        yield g.rename_columns(["s", "t"])

    edges = keyed_reagg(
        sf_edges(sf_dir).map_batches(e_pre, batch_format="pyarrow"),
        ["s", "t"], [], P2,
    ).materialize()

    def flags(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("t").to_numpy(zero_copy_only=False)
        hs, hd = splitmix64(s), splitmix64(d)
        for den in SUBGRAPH_DENOMS:
            thr = np.uint64(_M64_FULL // den)
            keep = (hs < thr) & (hd < thr)
            if not keep.any():
                continue
            yield den, s[keep], d[keep]

    def edge_cnt(t: pa.Table):
        for den, s, d in flags(t):
            yield pa.table(
                {
                    "denom": pa.array([den], pa.int64()),
                    "n_edges": pa.array([len(s)], pa.int64()),
                }
            )

    ec = keyed_reagg(
        edges.map_batches(edge_cnt, batch_format="pyarrow"),
        ["denom"], [("n_edges", "sum")], 2,
    )

    def vert_pairs(t: pa.Table):
        for den, s, d in flags(t):
            g = (
                pa.table(
                    {
                        "denom": pa.array(
                            np.full(2 * len(s), den, np.int64)),
                        "v": pa.array(np.r_[s, d]),
                    }
                )
                .group_by(["denom", "v"])
                .aggregate([])
            )
            yield g.rename_columns(["denom", "v"])

    vd = keyed_reagg(
        edges.map_batches(vert_pairs, batch_format="pyarrow"),
        ["denom", "v"], [], P2,
    )

    def v_cnt(t: pa.Table):
        if t.num_rows == 0 or "denom" not in t.schema.names:
            return
        g = (
            t.select(["denom"])
            .append_column("n_vertices", pa.array(np.ones(len(t), np.int64)))
            .group_by(["denom"])
            .aggregate([("n_vertices", "sum")])
        )
        yield g.rename_columns(["denom", "n_vertices"])

    vc = keyed_reagg(
        vd.map_batches(v_cnt, batch_format="pyarrow"),
        ["denom"], [("n_vertices", "sum")], 2,
    )

    from .joins import join_auto

    return join_auto(ec, vc, on=("denom",), num_partitions=2)


def _subgraph_sample_sql() -> str:
    per = []
    for den in SUBGRAPH_DENOMS:
        thr = _M64_FULL // den
        per.append(f"""
SELECT CAST({den} AS BIGINT) AS denom, r.s, r.t
FROM raw r JOIN hh hs ON r.s = hs.id JOIN hh ht ON r.t = ht.id
WHERE hs.z < {thr} AND ht.z < {thr}""")
    kept = " UNION ALL ".join(per)
    return f"""
WITH raw AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS s, l_partkey AS t FROM lineitem
),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)
),
{{SM}},
kept AS MATERIALIZED ({kept}),
ec AS (
  SELECT denom, CAST(COUNT(*) AS BIGINT) AS n_edges FROM kept GROUP BY denom
),
vc AS (
  SELECT denom, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_vertices FROM (
    SELECT denom, s AS v FROM kept UNION ALL SELECT denom, t FROM kept
  ) GROUP BY denom
)
SELECT ec.denom, ec.n_edges, vc.n_vertices
FROM ec JOIN vc ON ec.denom = vc.denom"""


HLL_REGS = 16
HLL_ROUNDS = 2


def _hll_rank(y: np.ndarray) -> np.ndarray:
    """1 + trailing-zero count of y (uint64), capped at 15 — the HLL
    rank rule, restated as the unrolled modulo conditions the SQL
    oracle uses (y % 2^k == 2^(k-1) → rank k), zero float anywhere."""
    r = np.full(len(y), 15, np.int64)
    done = np.zeros(len(y), bool)
    for k in range(1, 15):
        hit = (~done) & ((y % np.uint64(1 << k)) == np.uint64(1 << (k - 1)))
        r[hit] = k
        done |= hit
    return r


def hll_ball_registers(sf_dir: str) -> ray.data.Dataset:
    """Per-vertex HyperLogLog register state after exactly
    ``HLL_ROUNDS`` neighbor max-merge rounds on the undirected
    distinct lineitem graph — the SQL-CHECKED mirror of the HyperANF
    register algebra (rayrank/hyperanf.py runs the same merge to the
    fixpoint in packed int64 labels on the resident shards; this
    bounded-round Dataset variant exposes the registers as 16 integer
    columns so the DuckDB oracle can verify the merge bit-for-bit).

    Init (pinned): ``h = splitmix64(v)``, bucket ``j = h % 16``, rank
    ``min(15, 1 + tz(h // 16))`` — register j holds the rank, all
    others 0.  Round: ``R'(v, j) = max(R(v, j), max_{u∈N(v)} R(u, j))``.
    Output (v, r0..r15) — all integers, order-free maxes, exact.

    Scale shape: one (a, b)-keyed dedup re-agg builds the edge set;
    each round is ONE edge⋈register join + a vertex-keyed 16-column
    max re-agg (union with the previous state folds the self term) —
    the gather/reduce SpMV shape with max for plus."""
    from .joins import join_auto
    from .shuffle import keyed_reagg
    from .sketch import splitmix64

    P2 = 16
    edges = sf_edges(sf_dir)
    rcols = [f"r{j}" for j in range(HLL_REGS)]
    raggs = [(c, "max") for c in rcols]

    def vert_pre(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        g = (
            pa.table({"v": pa.array(np.r_[s, d])})
            .group_by(["v"])
            .aggregate([])
        )
        yield g.rename_columns(["v"])

    verts = keyed_reagg(
        edges.map_batches(vert_pre, batch_format="pyarrow"), ["v"], [], P2,
    )

    und_pre = und_both
    und = keyed_reagg(
        edges.map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [], P2,
    ).materialize()  # reused by every round

    def init(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        v = t.column("v").to_numpy(zero_copy_only=False)
        h = splitmix64(v)
        j = (h % np.uint64(HLL_REGS)).astype(np.int64)
        rank = _hll_rank(h // np.uint64(HLL_REGS))
        cols = {"v": pa.array(v)}
        for jj in range(HLL_REGS):
            cols[f"r{jj}"] = pa.array(
                np.where(j == jj, rank, 0).astype(np.int64)
            )
        yield pa.table(cols)

    state = verts.map_batches(init, batch_format="pyarrow")

    def relabel(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        yield pa.table(
            {"v": t.column("a"), **{c: t.column(c) for c in rcols}}
        )

    from .shuffle import materialize_cut

    for _ in range(HLL_ROUNDS):
        # lineage cut: state self-chains, two refs per round (join+union)
        state = materialize_cut(state)
        nb = join_auto(und, state, on=("b",), right_on=("v",),
                       num_partitions=P2)
        nbr = nb.map_batches(relabel, batch_format="pyarrow")
        state = keyed_reagg(state.union(nbr), ["v"], raggs, P2)

    return state


def _hll_ball_sql() -> str:
    regs, R = HLL_REGS, HLL_ROUNDS
    y = f"(z // {regs})"
    rank_case = "CASE " + " ".join(
        f"WHEN {y} % {1 << k} = {1 << (k - 1)} THEN {k}"
        for k in range(1, 15)
    ) + " ELSE 15 END"
    rcols = ", ".join(f"r{j}" for j in range(regs))
    init_cols = ", ".join(
        f"CAST(CASE WHEN j = {j} THEN rk ELSE 0 END AS BIGINT) AS r{j}"
        for j in range(regs)
    )
    maxes = ", ".join(f"MAX(r{j}) AS r{j}" for j in range(regs))
    rounds = []
    prev = "init"
    for t in range(1, R + 1):
        rounds.append(f""",
rd{t} AS MATERIALIZED (
  SELECT v, {maxes} FROM (
    SELECT v, {rcols} FROM {prev}
    UNION ALL
    SELECT und.a AS v, {rcols} FROM und JOIN {prev} p ON und.b = p.v
  ) GROUP BY v
)""")
        prev = f"rd{t}"
    return f"""
WITH raw AS MATERIALIZED (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)
),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
{{SM}},
hjr AS (SELECT id AS v, z % {regs} AS j, {rank_case} AS rk FROM hh),
init AS MATERIALIZED (SELECT v, {init_cols} FROM hjr)
{''.join(rounds)}
SELECT v, {rcols} FROM {prev}"""


def node_features(sf_dir: str) -> ray.data.Dataset:
    """Per-vertex feature assembly — the feature-engineering stage
    that precedes node-classification / ranking-model training: one
    wide table (name, score, out_deg, in_deg, und_deg) joining the
    reference-exact 2-iteration PageRank score with raw out/in edge
    counts (multiplicity kept, the outdeg CTE rule) and the distinct
    undirected neighbor count; absent degrees coalesce to 0.

    Scale shape: each degree is block partials + ONE keyed re-agg
    (the und count needs the global (a, b) dedup re-agg first); the
    assembly is three keyed left-outer joins onto the score table —
    every stage is vertex- or edge-bounded, nothing driver-side.  The
    SQL oracle is the pagerank_2iter unroll verbatim plus three degree
    CTEs (scores ROUND 6 both sides, same as pagerank_2iter)."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    P2 = 16
    pr = pagerank_2iter(sf_dir)
    edges = sf_edges(sf_dir)

    def od_pre(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        g = (
            pa.table({"name": pc.cast(t.column("src"), pa.string())})
            .append_column("out_deg", pa.array(np.ones(len(t), np.int64)))
            .group_by(["name"])
            .aggregate([("out_deg", "sum")])
        )
        yield g.rename_columns(["name", "out_deg"])

    def id_pre(t: pa.Table):
        if len(t) == 0 or "dst" not in t.schema.names:
            return
        g = (
            pa.table({"name": pc.cast(t.column("dst"), pa.string())})
            .append_column("in_deg", pa.array(np.ones(len(t), np.int64)))
            .group_by(["name"])
            .aggregate([("in_deg", "sum")])
        )
        yield g.rename_columns(["name", "in_deg"])

    od = keyed_reagg(
        edges.map_batches(od_pre, batch_format="pyarrow"),
        ["name"], [("out_deg", "sum")], P2,
    )
    idg = keyed_reagg(
        edges.map_batches(id_pre, batch_format="pyarrow"),
        ["name"], [("in_deg", "sum")], P2,
    )

    und_pre = und_both_names
    und = keyed_reagg(
        edges.map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [], P2,
    )

    def ud_cnt(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        g = (
            t.select(["a"])
            .append_column("und_deg", pa.array(np.ones(len(t), np.int64)))
            .group_by(["a"])
            .aggregate([("und_deg", "sum")])
        )
        yield g.rename_columns(["name", "und_deg"])

    ud = keyed_reagg(
        und.map_batches(ud_cnt, batch_format="pyarrow"),
        ["name"], [("und_deg", "sum")], P2,
    )

    out = join_auto(pr, od, on=("name",), how="left_outer",
                    num_partitions=P2)
    out = join_auto(out, idg, on=("name",), how="left_outer",
                    num_partitions=P2)
    out = join_auto(out, ud, on=("name",), how="left_outer",
                    num_partitions=P2)

    def fin(t: pa.Table):
        if t.num_rows == 0 or "name" not in t.schema.names:
            return
        cols = {"name": t.column("name"), "score": t.column("score")}
        for c in ("out_deg", "in_deg", "und_deg"):
            cols[c] = pc.fill_null(t.column(c), 0)
        yield pa.table(cols)

    return out.map_batches(fin, batch_format="pyarrow")


# The pagerank_2iter unroll VERBATIM (same CTE chain as
# _PAGERANK_2ITER_SQL in __ray_entry__) plus three degree CTEs.
NODE_FEATURES_SQL = """
WITH raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
outdeg AS (SELECT s, COUNT(*) AS d FROM raw GROUP BY s),
e AS (SELECT s, t, COUNT(*) AS m FROM raw GROUP BY s, t),
w AS (SELECT e.s, e.t, CAST(e.m AS DOUBLE)/o.d AS w FROM e JOIN outdeg o ON e.s = o.s),
x0 AS (SELECT v.v, 1.0/sqrt(nn.n) AS x FROM verts v, nn),
dang AS (SELECT v.v FROM verts v LEFT JOIN outdeg o ON v.v = o.s WHERE o.s IS NULL),
am0 AS (SELECT COALESCE(SUM(x.x), 0.0) AS m FROM dang d JOIN x0 x ON d.v = x.v),
c0 AS (SELECT w.t AS v, SUM(w.w * x.x) AS c FROM w JOIN x0 x ON w.s = x.v GROUP BY w.t),
r1 AS (
  SELECT v.v,
         0.85*COALESCE(c0.c, 0.0)
         + (0.85*(SELECT m FROM am0) + 0.15) * (1.0/sqrt((SELECT n FROM nn))) AS x
  FROM verts v LEFT JOIN c0 ON v.v = c0.v
),
l1a AS (SELECT SUM(ABS(x)) AS s FROM r1),
x1 AS (SELECT v, x/(SELECT s FROM l1a) AS x FROM r1),
am1 AS (SELECT COALESCE(SUM(x.x), 0.0) AS m FROM dang d JOIN x1 x ON d.v = x.v),
c1 AS (SELECT w.t AS v, SUM(w.w * x.x) AS c FROM w JOIN x1 x ON w.s = x.v GROUP BY w.t),
r2 AS (
  SELECT v.v,
         0.85*COALESCE(c1.c, 0.0)
         + (0.85*(SELECT m FROM am1) + 0.15) * (1.0/sqrt((SELECT n FROM nn))) AS x
  FROM verts v LEFT JOIN c1 ON v.v = c1.v
),
l1b AS (SELECT SUM(ABS(x)) AS s FROM r2),
ind AS (SELECT t AS v, CAST(COUNT(*) AS BIGINT) AS in_deg FROM raw GROUP BY t),
undd AS (
  SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS und_deg FROM (
    SELECT DISTINCT a, b FROM (
      SELECT s AS a, t AS b FROM raw WHERE s <> t
      UNION ALL SELECT t, s FROM raw WHERE s <> t
    )
  ) GROUP BY a
)
SELECT r2.v AS name, ROUND(r2.x/(SELECT s FROM l1b), 6) AS score,
  CAST(COALESCE(outdeg.d, 0) AS BIGINT) AS out_deg,
  COALESCE(ind.in_deg, 0) AS in_deg,
  COALESCE(undd.und_deg, 0) AS und_deg
FROM r2
LEFT JOIN outdeg ON r2.v = outdeg.s
LEFT JOIN ind ON r2.v = ind.v
LEFT JOIN undd ON r2.v = undd.v
"""


DD_SEEDS_K = 8


def degree_discount_seeds(sf_dir: str) -> ray.data.Dataset:
    """Influence-maximization seed selection by single-discount greedy
    (the pure-integer core of Chen et al.'s DegreeDiscount): pick
    ``DD_SEEDS_K`` seeds one at a time, each round taking the non-seed
    vertex maximizing ``residual(v) = deg(v) − |N(v) ∩ S|`` (ties: v
    asc) on the undirected distinct lineitem graph.  Output (rnk,
    seed, gain) with gain = residual at pick time — all integers, so
    the unrolled per-round SQL oracle matches exactly.

    Scale shape: the edge set and degree table are built once (block
    partials + one keyed re-agg each) and reused across rounds; each
    of the K rounds ships only the ≤K seed ids into a vectorized edge
    filter, re-aggregates the seed-adjacency counts by vertex, left-
    joins degrees, and folds a (residual desc, id) top-1 through the
    pre-truncate → coalesce pattern — per round the driver moves ONE
    row, never a vertex table.  K is a pinned constant, so the round
    loop is bounded exactly like the Lloyd/k-truss precedents."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    P2 = 16

    und_pre = und_both_one
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [("one", "max")], P2,
    ).materialize()

    def deg_pre(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        g = (
            t.select(["a", "one"])
            .group_by(["a"])
            .aggregate([("one", "sum")])
        )
        yield g.rename_columns(["a", "d"])

    deg = keyed_reagg(
        und.map_batches(deg_pre, batch_format="pyarrow"),
        ["a"], [("d", "sum")], P2,
    ).materialize()

    seeds: list[int] = []
    gains: list[int] = []
    for _ in range(DD_SEEDS_K):
        sarr = np.sort(np.asarray(seeds, dtype=np.int64))

        def top_pre(t: pa.Table, sarr=sarr):
            if t.num_rows == 0 or "d" not in t.schema.names:
                return
            a = t.column("a").to_numpy(zero_copy_only=False)
            d = t.column("d").to_numpy(zero_copy_only=False)
            if "c" in t.schema.names:
                c = pc.fill_null(t.column("c"), 0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
            else:
                c = np.zeros(len(a), np.int64)
            r = d - c
            keep = ~np.isin(a, sarr)
            a, r = a[keep], r[keep]
            if len(a) == 0:
                return
            order = np.lexsort((a, -r))[:1]
            yield pa.table({"a": pa.array(a[order]), "r": pa.array(r[order])})

        if seeds:
            def cnt_pre(t: pa.Table, sarr=sarr):
                if t.num_rows == 0 or "b" not in t.schema.names:
                    return
                b = t.column("b").to_numpy(zero_copy_only=False)
                idx = np.clip(np.searchsorted(sarr, b), 0, len(sarr) - 1)
                hit = sarr[idx] == b
                if not hit.any():
                    return
                g = (
                    t.filter(pa.array(hit))
                    .select(["a", "one"])
                    .group_by(["a"])
                    .aggregate([("one", "sum")])
                )
                yield g.rename_columns(["a", "c"])

            cnt = keyed_reagg(
                und.map_batches(cnt_pre, batch_format="pyarrow"),
                ["a"], [("c", "sum")], P2,
            )
            resid = join_auto(
                deg, cnt, on=("a",), how="left_outer", num_partitions=P2
            )
        else:
            resid = deg

        def top_fin(t: pa.Table):
            if t.num_rows == 0 or "r" not in t.schema.names:
                return
            a = t.column("a").to_numpy(zero_copy_only=False)
            r = t.column("r").to_numpy(zero_copy_only=False)
            order = np.lexsort((a, -r))[:1]
            yield t.take(pa.array(order))

        rows = (
            resid.map_batches(
                top_pre, batch_size=None, batch_format="pyarrow"
            )
            .repartition(1)
            .map_batches(top_fin, batch_size=None, batch_format="pyarrow")
            .take(1)
        )
        seeds.append(int(rows[0]["a"]))
        gains.append(int(rows[0]["r"]))

    return ray.data.from_arrow(
        pa.table(
            {
                "rnk": pa.array(np.arange(1, DD_SEEDS_K + 1, dtype=np.int64)),
                "seed": pa.array(np.asarray(seeds, np.int64)),
                "gain": pa.array(np.asarray(gains, np.int64)),
            }
        )
    )


def _degree_discount_sql() -> str:
    # Every CTE is MATERIALIZED: each round references all prior picks,
    # so DuckDB's default CTE inlining re-evaluates the whole chain
    # exponentially (2^K plans — observed as a multi-minute hang at K=8;
    # materialization makes it 8 linear steps).
    head = """
WITH raw AS MATERIALIZED (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
  WHERE l_orderkey <> l_partkey
),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw UNION ALL SELECT t, s FROM raw
  )
),
deg AS MATERIALIZED (
  SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY a
),
p1 AS MATERIALIZED (
  SELECT a AS v, d AS g FROM deg ORDER BY d DESC, a LIMIT 1
)"""
    parts = [head]
    for r in range(2, DD_SEEDS_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT v FROM p{i}" for i in range(1, r)
        )
        parts.append(f""",
s{r} AS MATERIALIZED ({prev}),
c{r} AS MATERIALIZED (
  SELECT a, CAST(COUNT(*) AS BIGINT) AS c FROM und
  WHERE b IN (SELECT v FROM s{r}) GROUP BY a
),
p{r} AS MATERIALIZED (
  SELECT deg.a AS v, deg.d - COALESCE(c{r}.c, 0) AS g
  FROM deg LEFT JOIN c{r} ON deg.a = c{r}.a
  WHERE deg.a NOT IN (SELECT v FROM s{r})
  ORDER BY g DESC, deg.a LIMIT 1
)""")
    tail = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rnk, v AS seed, "
        f"CAST(g AS BIGINT) AS gain FROM p{i}"
        for i in range(1, DD_SEEDS_K + 1)
    )
    return "".join(parts) + "\n" + tail


DEGREE_DISCOUNT_SQL = _degree_discount_sql()


def _seg_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated — vectorized segmented arange."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def _cn_rank_head(t: pa.Table, k: int) -> pa.Table:
    """(cn desc, sdeg asc, u, v) head-k — all-integer total order."""
    cn = t.column("cn").to_numpy(zero_copy_only=False)
    sdeg = t.column("sdeg").to_numpy(zero_copy_only=False)
    u = t.column("u").to_numpy(zero_copy_only=False)
    v = t.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u, sdeg, -cn))[:k]
    return t.take(pa.array(order))


COMMON_NEIGHBORS_SQL = f"""
WITH raw AS (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
deg AS (
  SELECT b AS c, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY b
),
elig AS (SELECT c, d FROM deg WHERE d BETWEEN 2 AND {CN_DEG_CAP}),
wedge AS (
  SELECT e1.a AS u, e2.a AS v, el.d
  FROM und e1 JOIN und e2 ON e1.b = e2.b AND e1.a < e2.a
  JOIN elig el ON el.c = e1.b
),
cnt AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
         CAST(SUM(d) AS BIGINT) AS sdeg
  FROM wedge GROUP BY u, v
),
fresh AS (
  SELECT cnt.* FROM cnt ANTI JOIN und ON cnt.u = und.a AND cnt.v = und.b
)
SELECT u, v, cn, sdeg FROM fresh
QUALIFY ROW_NUMBER() OVER (ORDER BY cn DESC, sdeg, u, v) <= {CN_TOP_K}
"""


def component_size_histogram(sf_dir: str) -> ray.data.Dataset:
    """(component size → number of components) on the undirected
    lineitem graph — the aggregate-of-aggregate shape over the CC
    labels.  Per-block (component, n) partials ride ONE keyed re-agg;
    the size histogram itself is tiny (≤ distinct sizes) and folds in
    a single coalesced block.  SQL oracle: the bounded min-label
    recursive CTE (the connected_components oracle) re-aggregated."""
    from .components import canonical_components, connected_components
    from .shuffle import keyed_reagg

    gdir = _graph(sf_dir, "undirected")
    cc = connected_components(gdir)
    labels = canonical_components(cc, gdir)

    def pre(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        g = (
            t.select(["component"])
            .append_column("n", pa.array(np.ones(len(t), np.int64)))
            .group_by(["component"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["component", "n"])

    sizes = keyed_reagg(
        labels.map_batches(pre, batch_format="pyarrow"),
        ["component"], [("n", "sum")], P,
    )

    def size_pre(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        g = (
            t.select(["n"])
            .append_column("c", pa.array(np.ones(len(t), np.int64)))
            .group_by(["n"])
            .aggregate([("c", "sum")])
        )
        yield g.rename_columns(["size", "num_components"])

    g = sizes.map_batches(size_pre, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "size" not in t.schema.names:
            return
        g2 = t.group_by(["size"]).aggregate([("num_components", "sum")])
        yield g2.rename_columns(["size", "num_components"])

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


def component_count_sf(sf_dir: str) -> pa.Table:
    """Number of connected components — distributed distinct-count of
    the label partitions (per-shard unique → tiny groupby; the driver
    never materializes the label vector).  SQL oracle: bounded-depth
    recursive min-label CTE (__ray_entry__)."""
    from .components import connected_components

    gdir = _graph(sf_dir, "undirected")
    cc = connected_components(gdir)
    n = cc.distinct_label_count()
    return pa.table({"components": pa.array([n], pa.int64())})


# --------------------------------------------------------------------------
# flagship corpus pipeline (entry)
# --------------------------------------------------------------------------


def corpus_flagship(sf: float = 0.001, top_k: int = 20) -> ray.data.Dataset:
    """End-to-end: synthetic code corpus → sha256 ingest → import +
    co-commit edge derivation → partitioned graph build → reference-
    exact PageRank to convergence → top-k files with scores."""
    from .corpus import default_corpus_dir, generate_corpus
    from .ingest import derive_edges, read_corpus
    from .pagerank import power_method

    cdir = generate_corpus(default_corpus_dir(sf), sf=sf)
    gdir = tempfile.mkdtemp(prefix="rayrank_flagship_")
    edges = derive_edges(read_corpus(cdir), num_partitions=P)
    build_graph(edges, gdir, num_partitions=P)
    res = power_method(gdir)
    scores = res.scores_dataset(gdir)
    return scores.sort("score", descending=True).limit(top_k)


RW_STEPS = 3


def random_walks(sf_dir: str, steps: int = RW_STEPS) -> ray.data.Dataset:
    """Deterministic random walks on the undirected lineitem graph —
    the walk-corpus generation stage of a node2vec/DeepWalk embedding
    pipeline.  One walk starts at EVERY vertex; at step ``s`` a walker
    at ``cur`` moves to the ``splitmix64(cur·8 + s) mod deg(cur)``-th
    neighbor in ascending-neighbor order, so the whole corpus is a
    pure function of the graph (bit-identical replay, no RNG state —
    the hash_sample / shuffle_order rule applied to walks).

    Output: (seed, step, vertex) for step 0..``steps``; every walk
    completes (the undirected graph has no dangling vertices).

    Scale shape: adjacency is flattened to (a, rn, b) rows with a
    block-local segmented rank (one repartition by vertex, vectorized
    dedup + rank), materialized ONCE and reused by all steps; each
    step is two keyed joins (degree lookup, then (cur, pick)=(a, rn))
    through ``join_auto`` — broadcast when the graph fits, partitioned
    hash join at scale.  Walker rows are (seed, cur) int64 pairs, so a
    step shuffles O(V) scalars; a resident-shard kernel (the SpMV
    layout) would replace the per-step join at cluster scale — this is
    the documented partitioning assumption."""
    from .joins import join_auto
    from .sketch import splitmix64

    P2 = 16

    und_pre = und_both
    und = sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow")
    mid = und.repartition(P2, keys=["a"])

    def rank_adj(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        uniq = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        a_s, b_s = a_s[uniq], b_s[uniq]  # global dedup: keyed by a
        starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
        d = np.diff(np.r_[starts, len(a_s)])
        yield pa.table(
            {
                "a": pa.array(a_s),
                "rn": pa.array(_seg_arange(d)),
                "b": pa.array(b_s),
            }
        )

    adj = mid.map_batches(
        rank_adj, batch_size=None, batch_format="pyarrow"
    ).materialize()  # edge-bounded, reused by every step

    def to_deg(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        g = (
            t.select(["a"])
            .append_column("d", pa.array(np.ones(len(t), np.int64)))
            .group_by(["a"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["a", "d"])

    # adj blocks are already a-complete, so per-block counts ARE degrees
    deg = adj.map_batches(
        to_deg, batch_size=None, batch_format="pyarrow"
    ).materialize()  # vertex-bounded

    def seed0(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        yield pa.table({"seed": t.column("a"), "cur": t.column("a")})

    walkers = deg.map_batches(seed0, batch_format="pyarrow")

    def snapshot(s: int):
        def fn(t: pa.Table):
            if t.num_rows == 0 or "seed" not in t.schema.names:
                return
            yield pa.table(
                {
                    "seed": t.column("seed"),
                    "step": pa.array(np.full(len(t), s, np.int64)),
                    "vertex": t.column("cur"),
                }
            )
        return fn

    out = walkers.map_batches(snapshot(0), batch_format="pyarrow")
    for s in range(steps):
        wd = join_auto(walkers, deg, on=("cur",), right_on=("a",),
                       num_partitions=P2)

        def pick(t: pa.Table, _s=s):
            if t.num_rows == 0 or "d" not in t.schema.names:
                return
            cur = t.column("cur").to_numpy(zero_copy_only=False)
            d = t.column("d").to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                z = splitmix64(cur * np.int64(8) + np.int64(_s))
            rn = (z % d.astype(np.uint64)).astype(np.int64)
            yield pa.table(
                {
                    "seed": t.column("seed"),
                    "cur": t.column("cur"),
                    "rn": pa.array(rn),
                }
            )

        picked = wd.map_batches(pick, batch_format="pyarrow")
        moved = join_auto(picked, adj, on=("cur", "rn"),
                          right_on=("a", "rn"), num_partitions=P2)

        def advance(t: pa.Table):
            if t.num_rows == 0 or "b" not in t.schema.names:
                return
            yield pa.table({"seed": t.column("seed"), "cur": t.column("b")})

        walkers = moved.map_batches(advance, batch_format="pyarrow")
        out = out.union(
            walkers.map_batches(snapshot(s + 1), batch_format="pyarrow")
        )
    return out


def hourly_anomalies(sf_dir: str) -> pa.Table:
    """(hour, cnt, is_anomaly) — global hourly event counts flagged
    where |z| > 2, with ZERO float arithmetic: z² > 4 restates as
    ``(cnt·n − tot)² > 4·(n·ss − tot²)`` over exact integer moments
    (the exact-variance trick from analytics.py applied as a
    threshold), so the SQL oracle matches bit-for-bit with no float
    comparison anywhere.  Per-block (hour, cnt) pre-combine, ONE
    hours-bounded keyed reduce; the reduced table is hours-bounded, so
    the scalar moment fold and flagging run driver-side (the
    vocab-bounded take_all precedent)."""
    from .shuffle import keyed_reagg

    ds = _read(sf_dir, "events", ["ts"])

    def pre(t: pa.Table):
        if t.num_rows == 0:
            return
        g = (
            pa.table({"hour": pc.floor_temporal(t.column("ts"), unit="hour")})
            .append_column("cnt", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by(["hour"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["hour", "cnt"])

    red = keyed_reagg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["hour"], [("cnt", "sum")], P,
    ).take_all()  # hours-bounded
    hours = [r["hour"] for r in red]
    cnts = [int(r["cnt"]) for r in red]
    n, tot = len(cnts), sum(cnts)
    ss = sum(c * c for c in cnts)
    flags = [
        1 if (c * n - tot) ** 2 > 4 * (n * ss - tot * tot) else 0
        for c in cnts
    ]
    return pa.table(
        {
            "hour": pa.array(hours, pa.timestamp("us")),
            "cnt": pa.array(cnts, pa.int64()),
            "is_anomaly": pa.array(flags, pa.int64()),
        }
    )


def walk_visit_counts(sf_dir: str) -> ray.data.Dataset:
    """(vertex, visits) — visit frequencies over the deterministic
    walk corpus (random_walks): the Monte-Carlo stationary-distribution
    / PPR-style estimator an embedding pipeline derives negative-
    sampling tables from.  Per-block pre-combine then ONE vertex-keyed
    reduce over the V·(steps+1) walk rows; deterministic because the
    walks are (SQL oracle = the unrolled walk CTEs re-aggregated)."""
    from .shuffle import keyed_reagg

    def pre(t: pa.Table):
        if t.num_rows == 0 or "vertex" not in t.schema.names:
            return
        g = (
            t.select(["vertex"])
            .append_column("visits", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by(["vertex"])
            .aggregate([("visits", "sum")])
        )
        yield g.rename_columns(["vertex", "visits"])

    return keyed_reagg(
        random_walks(sf_dir).map_batches(pre, batch_format="pyarrow"),
        ["vertex"], [("visits", "sum")], P,
    )


def graph_coloring_sf(sf_dir: str) -> ray.data.Dataset:
    """(name, color) greedy coloring of the undirected lineitem graph
    by iterated hash-MIS (rayrank.mis.coloring; class c = deterministic
    greedy MIS of the residual graph).  Name-space priorities
    (splitmix64(int(name)) — the mis_vertices flip), so the full
    Jones–Plassmann chain is SQL-checked: the oracle unrolls
    ``COLORING_SQL_CLASSES`` classes × ``COLORING_SQL_ROUNDS`` Luby
    rounds as materialized CTEs (extra classes/rounds are no-ops);
    exact sequential oracle additionally in pytest."""
    from .mis import coloring

    gdir = _graph(sf_dir, "undirected")
    res = coloring(gdir, named_priority=True)
    ds = res.labels_dataset(gdir)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"name": t.column("name"), "color": t.column("label")})

    return ds.map_batches(fin, batch_format="pyarrow")


def tokenizer_fertility(sf_dir: str) -> ray.data.Dataset:
    """(lang, docs, tokens, chars, fertility) — tokens-per-character by
    language, the tokenizer-efficiency metric a multilingual training
    pipeline tracks (a tokenizer with poor fertility on a language
    inflates its effective cost per document).  Token rule is the
    whitespace count token_counts already SQL-matches; chars is
    utf8 code-point length.  Integer sums via block-local group_by +
    one |langs|-bounded keyed re-agg; fertility is ONE double division
    applied identically in the oracle."""
    from .shuffle import keyed_reagg
    from .text import TokenCounter

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    ds = ds.map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 4))

    def pre(t: pa.Table):
        if len(t) == 0 or "ws_tokens" not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "lang": t.column("lang"),
                    "docs": pa.array(np.ones(len(t), np.int64)),
                    "tokens": t.column("ws_tokens"),
                    "chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
                }
            )
            .group_by(["lang"])
            .aggregate([("docs", "sum"), ("tokens", "sum"), ("chars", "sum")])
        )
        yield g.rename_columns(["lang", "docs", "tokens", "chars"])

    agg = keyed_reagg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["lang"], [("docs", "sum"), ("tokens", "sum"), ("chars", "sum")], 4,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "tokens" not in t.schema.names:
            return
        tok = t.column("tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        ch = t.column("chars").to_numpy(zero_copy_only=False).astype(np.float64)
        yield t.append_column("fertility", pa.array(tok / ch, pa.float64()))

    return agg.map_batches(fin, batch_size=None, batch_format="pyarrow")


TOKENIZER_FERTILITY_SQL = r"""
WITH s AS (
  SELECT lang,
    CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
      array_length(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tok,
    CAST(LENGTH(text) AS BIGINT) AS ch
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(tok) AS BIGINT) AS tokens,
  CAST(SUM(ch) AS BIGINT) AS chars,
  CAST(SUM(tok) AS DOUBLE) / CAST(SUM(ch) AS DOUBLE) AS fertility
FROM s GROUP BY lang
"""


QUOTIENT_MIN_MULT = 2


def component_quotient_edges(sf_dir: str) -> ray.data.Dataset:
    """(comp_a, comp_b, n_edges) — graph contraction: vertices are
    collapsed into the connected components of the STRONG-TIE subgraph
    (undirected lineitem pairs with raw multiplicity ≥
    ``QUOTIENT_MIN_MULT``), then every distinct full-graph edge is
    re-expressed between supernodes and counted; intra-supernode edges
    vanish.  This is the coarsening step of multilevel partitioning /
    community summarization — the quotient graph is what a 100-TB
    engine would actually iterate on after contraction.  Component ids
    are min member NAMES (canonical_components), so the SQL oracle's
    min-label CTE produces identical ids; vertices outside the strong
    subgraph stay singletons via left-join + coalesce to their own
    name.  Scale shape: ONE keyed count builds the distinct und edge
    set (shared by subgraph and quotient), the contraction itself is
    the engine's distributed CC, and the relabel is two hash joins on
    the bounded label table."""
    from .components import canonical_components, connected_components
    from .joins import join_auto
    from .shuffle import keyed_reagg

    und_pre = und_canon_count
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["u", "v"], [("n", "sum")], P,
    ).materialize()  # distinct und edges + multiplicity, reused twice

    def strong_names(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        t = t.filter(pc.greater_equal(t.column("n"), QUOTIENT_MIN_MULT))
        if t.num_rows == 0:
            return
        yield pa.table(
            {
                "src_name": pc.cast(t.column("u"), pa.string()),
                "dst_name": pc.cast(t.column("v"), pa.string()),
            }
        )

    gdir = tempfile.mkdtemp(prefix="rayrank_quotient_")
    build_graph(
        und.map_batches(strong_names, batch_format="pyarrow"),
        gdir, num_partitions=P, undirected=True,
    )
    labels = canonical_components(connected_components(gdir), gdir)

    def as_names(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        yield pa.table(
            {
                "un": pc.cast(t.column("u"), pa.string()),
                "vn": pc.cast(t.column("v"), pa.string()),
            }
        )

    full = und.map_batches(as_names, batch_format="pyarrow")
    j1 = join_auto(
        full, labels, on=("un",), right_on=("name",),
        how="left_outer", num_partitions=P,
    )

    def lab1(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        ca = pc.coalesce(t.column("component"), t.column("un"))
        yield pa.table({"ca": ca, "vn": t.column("vn")})

    j2 = join_auto(
        j1.map_batches(lab1, batch_format="pyarrow"),
        labels, on=("vn",), right_on=("name",),
        how="left_outer", num_partitions=P,
    )

    def quot(t: pa.Table):
        if t.num_rows == 0 or "ca" not in t.schema.names:
            return
        ca = t.column("ca")
        cb = pc.coalesce(t.column("component"), t.column("vn"))
        keep = pc.invert(pc.equal(ca, cb))
        lo = pc.min_element_wise(ca, cb)
        hi = pc.max_element_wise(ca, cb)
        g = (
            pa.table(
                {
                    "comp_a": lo.filter(keep),
                    "comp_b": hi.filter(keep),
                    "n_edges": pa.array(
                        np.ones(int(pc.sum(keep).as_py() or 0), np.int64)
                    ),
                }
            )
            .group_by(["comp_a", "comp_b"])
            .aggregate([("n_edges", "sum")])
        )
        if g.num_rows:
            yield g.rename_columns(["comp_a", "comp_b", "n_edges"])

    return keyed_reagg(
        j2.map_batches(quot, batch_format="pyarrow"),
        ["comp_a", "comp_b"], [("n_edges", "sum")], P,
    )


def global_transitivity(sf_dir: str) -> pa.Table:
    """(triangles, wedges, transitivity) — the global clustering
    coefficient 3·T/W of the triangle-bearing undirected graph, where
    W = Σ_v C(deg(v), 2) counts open+closed wedges.  The one-number
    connectivity-quality summary (how much of the neighborhood
    structure closes into triangles).  Triangles ride the existing
    shard kernel; degrees are block-local counts on the part=src%Q
    layout re-summed by ONE keyed re-agg (reader block splits can
    split a src across blocks); the wedge fold is Python-int exact and
    order-independent; the ratio is ONE double division mirrored in
    the oracle."""
    from .graph import load_edges
    from .shuffle import keyed_reagg
    from .triangles import triangle_count

    gdir = _graph(sf_dir, "tri")
    tri = triangle_count(gdir)

    def deg_block(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        g = t.select(["src"]).group_by(["src"]).aggregate([([], "count_all")])
        yield g.rename_columns(["src", "degree"])

    deg = keyed_reagg(
        load_edges(gdir).map_batches(deg_block, batch_format="pyarrow"),
        ["src"], [("degree", "sum")], P,
    )

    def wedge_fold(t: pa.Table):
        if t.num_rows == 0 or "degree" not in t.schema.names:
            return
        d = t.column("degree").to_numpy(zero_copy_only=False)
        yield pa.table(
            {"w": pa.array([sum(int(x) * (int(x) - 1) // 2 for x in d)], pa.int64())}
        )

    wedges = sum(
        r["w"]
        for r in deg.map_batches(
            wedge_fold, batch_size=None, batch_format="pyarrow"
        ).take_all()
    )
    return pa.table(
        {
            "triangles": pa.array([tri], pa.int64()),
            "wedges": pa.array([wedges], pa.int64()),
            "transitivity": pa.array(
                [float(3 * tri) / float(wedges)], pa.float64()
            ),
        }
    )


GLOBAL_TRANSITIVITY_SQL = """
WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x
),
w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS wedges FROM deg),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS triangles
  FROM und e1 JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT t.triangles, w.wedges,
  CAST(3 * t.triangles AS DOUBLE) / CAST(w.wedges AS DOUBLE) AS transitivity
FROM t, w
"""


EGO_SEEDS_K = 4
EGO_RADIUS = 2


def ego_network_edges(sf_dir: str) -> ray.data.Dataset:
    """(a, b) — the radius-``EGO_RADIUS`` ego network of the
    ``EGO_SEEDS_K`` lexicographically-smallest vertices on the
    undirected lineitem graph: all distinct edges whose BOTH endpoints
    lie within ``EGO_RADIUS`` hops of the seed set (the induced-
    subgraph extraction every graph-exploration / debugging workflow
    needs — pull a neighborhood out of a 100-TB graph without touching
    the rest).  Multi-source BFS rides the unchanged gather_min shard
    kernel (one run, K seeds at distance 0); the ball membership then
    prunes the distinct edge set via two semi-joins (broadcast under
    the small-side limit, keyed otherwise)."""
    from .bfs import bfs, reachable_depths, smallest_vertex_names
    from .joins import join_auto
    from .shuffle import keyed_reagg

    gdir = _graph(sf_dir, "undirected")
    seeds = smallest_vertex_names(gdir, EGO_SEEDS_K)
    res = bfs(gdir, seeds, max_iterations=EGO_RADIUS)
    depths = reachable_depths(res, gdir)

    def ball_names(t: pa.Table):
        if t.num_rows == 0 or "depth" not in t.schema.names:
            return
        t = t.filter(pc.less_equal(t.column("depth"), EGO_RADIUS))
        if t.num_rows:
            yield t.select(["name"])

    # materialized ONCE: both semi-joins probe the ball — without the
    # cut each consumption re-runs the depth scan
    from .shuffle import materialize_cut as _mcut

    ball = _mcut(depths.map_batches(ball_names, batch_format="pyarrow"))

    und_pre = und_canon_names
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [], P,
    )
    j1 = join_auto(und, ball, on=("a",), right_on=("name",), how="semi",
                   num_partitions=P)
    return join_auto(j1, ball, on=("b",), right_on=("name",), how="semi",
                     num_partitions=P)


# --------------------------------------------------------------------------
# bow-tie decomposition (Broder et al. 2000 web-graph macro-structure)
# --------------------------------------------------------------------------


@ray.remote
def _label_count_part(ref) -> pa.Table:
    vals = np.asarray(ref, np.int64)
    labs, counts = np.unique(vals, return_counts=True)
    return pa.table({"label": labs, "n": counts.astype(np.int64)})


@ray.remote
def _giant_locals_part(ref, giant: int) -> np.ndarray:
    return np.flatnonzero(np.asarray(ref, np.int64) == giant).astype(np.int64)


@ray.remote
def _bowtie_count_part(lab_ref, f_ref, r_ref, giant: int, inf: int) -> np.ndarray:
    lab = np.asarray(lab_ref, np.int64)
    f = np.asarray(f_ref, np.int64)
    r = np.asarray(r_ref, np.int64)
    scc_m = lab == giant
    out_m = ~scc_m & (f < inf)
    in_m = ~scc_m & ~out_m & (r < inf)
    other = ~(scc_m | out_m | in_m)
    return np.array(
        [scc_m.sum(), in_m.sum(), out_m.sum(), other.sum()], np.int64
    )


def bowtie_regions(fwd_dir: str, rev_dir: str) -> pa.Table:
    """(region, n) — Broder bow-tie macro-structure of a directed
    graph: SCC = the largest strongly connected component (ties: min
    label vid), IN = vertices reaching the SCC but not in it, OUT =
    vertices reached from the SCC, OTHER = tendrils + disconnected.
    The canonical 100-TB web-graph census.

    Fully distributed: SCC rides the existing trim+color shard loop;
    the giant pick is per-partition (label, n) partials → keyed re-agg
    → block-local top-1 → ONE coalesced top-1 (the driver never holds
    the label vector); IN/OUT are two multi-source BFS runs seeded
    in-place from the giant's per-partition local indices (no name
    list ships through the driver); the census is Q int-quadruples."""
    from .graph import GraphMeta
    from .iterate import iterate_labels
    from .scc import scc
    from .shards import INF_DIST, create_shards
    from .shuffle import keyed_reagg

    meta = GraphMeta.load(os.path.join(fwd_dir, "meta.json"))
    Q = meta.Q
    res = scc(fwd_dir, rev_dir)

    # giant SCC label: distributed sizes + pre-truncate/coalesce top-1
    sizes = keyed_reagg(
        ray.data.from_arrow_refs(
            [_label_count_part.remote(ref) for ref in res.part_refs]
        ),
        ["label"], [("n", "sum")], P,
    )

    def top1(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        lab = t.column("label").to_numpy(zero_copy_only=False)
        i = np.lexsort((lab, -n))[:1]
        yield t.take(pa.array(i))

    g = (
        sizes.map_batches(top1, batch_size=None, batch_format="pyarrow")
        .repartition(1)
        .map_batches(top1, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    giant = int(g[0]["label"])

    seed_locs = [
        _giant_locals_part.remote(ref, giant) for ref in res.part_refs
    ]

    def run_bfs(gdir: str) -> list:
        shards = create_shards(gdir, GraphMeta.load(os.path.join(gdir, "meta.json")))

        def init(sh):
            ray.get(
                [s.init_dists.remote(seed_locs[q]) for q, s in enumerate(sh)]
            )

        r = iterate_labels(
            gdir, gather_method="gather_min",
            reduce_method="reduce_min_plus1", max_iterations=200,
            shards=shards, algo_name="bowtie_bfs", init_fn=init,
        )
        # force the label snapshots into the object store BEFORE the
        # actor handles drop (an eager ray.kill here lost queued
        # get_labels tasks -> ActorDiedError in the census tasks);
        # scope-drop termination is graceful and objects persist
        ray.wait(r.part_refs, num_returns=len(r.part_refs))
        return r.part_refs

    f_refs = run_bfs(fwd_dir)   # reached FROM the giant -> OUT
    r_refs = run_bfs(rev_dir)   # reaching the giant -> IN

    counts = sum(
        ray.get(
            [
                _bowtie_count_part.remote(
                    res.part_refs[q], f_refs[q], r_refs[q], giant, INF_DIST
                )
                for q in range(Q)
            ]
        )
    )
    return pa.table(
        {
            "region": pa.array(["scc", "in", "out", "other"], pa.string()),
            "n": pa.array([int(x) for x in counts], pa.int64()),
        }
    )


def bowtie_profile(sf_dir: str) -> pa.Table:
    """Bow-tie census of the cyclic order↔part lineitem graph
    (scc_edges) — see :func:`bowtie_regions`.  SQL oracle
    (_BOWTIE_SQL): the back-head SCC closure picks the (unique at both
    oracle SFs) giant component, then two bounded recursions from its
    member set give OUT/IN; pytest additionally pins exactness vs a
    networkx reachability oracle."""
    return bowtie_regions(_graph(sf_dir, "scc"), _graph(sf_dir, "scc_rev"))


N2V_STEPS = 3
N2V_W_RET = 4    # b == prev       (return,   1/p with p = 1/2, scaled ×2)
N2V_W_COMMON = 2  # edge(b, prev)  (distance-1 neighbor, weight 1 ×2)
N2V_W_FAR = 1    # otherwise       (distance-2 hop, 1/q with q = 2, ×2)


def node2vec_walks(sf_dir: str, steps: int = N2V_STEPS) -> ray.data.Dataset:
    """Biased second-order (node2vec) walks on the undirected lineitem
    graph — random_walks' corpus generator upgraded with the
    return/in-out bias (p = 1/2, q = 2): from context (prev → cur) the
    neighbor b of cur is drawn with integer weight ``N2V_W_RET`` when
    b = prev, ``N2V_W_COMMON`` when (b, prev) is an edge, else
    ``N2V_W_FAR``.  The draw is the engine's deterministic-hash rule:
    threshold = splitmix64(cur·16 + step) mod Σw, pick the first
    neighbor (ascending-b adjacency rank) whose cumulative weight
    exceeds it — a pure function of the graph, bit-identically
    replayed by the unrolled SQL oracle.  Walkers start with
    prev = cur = seed, which makes step 1 uniform through the SAME
    kernel (every candidate is a neighbor of prev ⇒ all weights
    N2V_W_COMMON).

    Output: (seed, step, vertex) for step 0..``steps``, one walk per
    vertex.  Scale shape: the ranked adjacency and the marked edge
    table are materialized once (edge-bounded); each step is one
    adjacency join (Σdeg candidate rows — the documented random_walks
    trade), one left-outer mark join, and ONE seed-keyed repartition
    whose block-local segmented cumsum+pick is fully vectorized."""
    from .joins import join_auto
    from .sketch import splitmix64

    P2 = 16

    und_pre = und_both
    und = sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow")
    mid = und.repartition(P2, keys=["a"])

    def rank_adj(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        uniq = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        a_s, b_s = a_s[uniq], b_s[uniq]
        starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
        d = np.diff(np.r_[starts, len(a_s)])
        yield pa.table(
            {
                "a": pa.array(a_s),
                "rn": pa.array(_seg_arange(d)),
                "b": pa.array(b_s),
            }
        )

    adj = mid.map_batches(
        rank_adj, batch_size=None, batch_format="pyarrow"
    ).materialize()

    def to_mark(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        yield pa.table(
            {
                "x": t.column("a"),
                "y": t.column("b"),
                "m": pa.array(np.ones(len(t), np.int64)),
            }
        )

    undm = adj.map_batches(to_mark, batch_format="pyarrow").materialize()

    def seed0(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        g = t.select(["a"]).group_by(["a"]).aggregate([])
        g = g.rename_columns(["a"])
        yield pa.table(
            {"seed": g.column("a"), "prev": g.column("a"), "cur": g.column("a")}
        )

    walkers = adj.map_batches(seed0, batch_size=None, batch_format="pyarrow")

    def snapshot(s: int):
        def fn(t: pa.Table):
            if t.num_rows == 0 or "seed" not in t.schema.names:
                return
            yield pa.table(
                {
                    "seed": t.column("seed"),
                    "step": pa.array(np.full(len(t), s, np.int64)),
                    "vertex": t.column("cur"),
                }
            )
        return fn

    out = walkers.map_batches(snapshot(0), batch_format="pyarrow")
    for s in range(1, steps + 1):
        cand = join_auto(walkers, adj, on=("cur",), right_on=("a",),
                         num_partitions=P2)
        marked = join_auto(
            cand, undm, on=("b", "prev"), right_on=("x", "y"),
            how="left_outer", num_partitions=P2,
        ).repartition(P2, keys=["seed"])

        def advance(t: pa.Table, _s=s):
            if t.num_rows == 0 or "rn" not in t.schema.names:
                return
            seed = t.column("seed").to_numpy(zero_copy_only=False)
            prev = t.column("prev").to_numpy(zero_copy_only=False)
            cur = t.column("cur").to_numpy(zero_copy_only=False)
            rn = t.column("rn").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            m = pc.fill_null(t.column("m"), 0).to_numpy(zero_copy_only=False)
            order = np.lexsort((rn, seed))
            seed, prev, cur, rn, b, m = (
                seed[order], prev[order], cur[order], rn[order], b[order],
                m[order],
            )
            wt = np.where(
                b == prev, N2V_W_RET,
                np.where(m == 1, N2V_W_COMMON, N2V_W_FAR),
            ).astype(np.int64)
            starts = np.flatnonzero(np.r_[True, seed[1:] != seed[:-1]])
            lens = np.diff(np.r_[starts, len(seed)])
            cw = np.cumsum(wt)
            seg_base = np.repeat(np.r_[0, cw[starts[1:] - 1]], lens)
            cw = cw - seg_base
            tot = cw[np.r_[starts[1:] - 1, len(cw) - 1]]  # last of each seg
            with np.errstate(over="ignore"):
                z = splitmix64(
                    cur[starts].astype(np.uint64) * np.uint64(16)
                    + np.uint64(_s)
                )
            thr = (z % tot.astype(np.uint64)).astype(np.int64)
            mask = cw > np.repeat(thr, lens)
            pos = np.arange(len(cw))
            first = np.minimum.reduceat(np.where(mask, pos, len(cw)), starts)
            yield pa.table(
                {
                    "seed": pa.array(seed[starts]),
                    "prev": pa.array(cur[starts]),
                    "cur": pa.array(b[first]),
                }
            )

        from .shuffle import materialize_cut

        # lineage cut: walkers self-chain, two refs per step (join +
        # snapshot union) — uncut plans double per step
        walkers = materialize_cut(
            marked.map_batches(advance, batch_size=None, batch_format="pyarrow")
        )
        out = out.union(
            walkers.map_batches(snapshot(s), batch_format="pyarrow")
        )
    return out


def lp_modularity(sf_dir: str) -> pa.Table:
    """(communities, m_edges, modularity) — Newman modularity of the
    10-round label-propagation partition on the undirected lineitem
    graph: the quality score that tells a pipeline owner whether the
    LP communities are real before acting on them.  Q = (2m·Σintra_c −
    Σd_c²) / 4m² restated over integers (d_c² exceeds int64 ⇒
    Python-int fold over the |C|-bounded reduced table; ONE double
    conversion), so the distributed result is deterministic.  Label
    lookup per endpoint is two vid-keyed joins against the bounded
    label table; per-community partials ride one keyed re-agg.
    Rows-only driver check (LP labels live in vid space); pytest pins
    the value against networkx.community.modularity on the SAME
    partition."""
    from .graph import GraphMeta, load_edges
    from .joins import join_auto
    from .labelprop import label_propagation
    from .shuffle import keyed_reagg

    gdir = _graph(sf_dir, "undirected")
    return _modularity_of(gdir, label_propagation(gdir, max_iterations=10))


def _modularity_of(gdir: str, lp) -> pa.Table:
    from .graph import GraphMeta, load_edges
    from .joins import join_auto
    from .shuffle import keyed_reagg

    meta = GraphMeta.load(os.path.join(gdir, "meta.json"))
    m = meta.nnz // 2  # und dir stores each pair in both directions

    lab = lp.labels_dataset(gdir).select_columns(["vid", "label"])

    def slim(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        yield t.select(["src", "dst"])

    e = load_edges(gdir).map_batches(slim, batch_format="pyarrow")
    j1 = join_auto(e, lab, on=("src",), right_on=("vid",), num_partitions=P)

    def r1(t: pa.Table):
        if t.num_rows == 0 or "label" not in t.schema.names:
            return
        yield pa.table({"ls": t.column("label"), "dst": t.column("dst")})

    j2 = join_auto(
        j1.map_batches(r1, batch_format="pyarrow"), lab,
        on=("dst",), right_on=("vid",), num_partitions=P,
    )

    def partial(t: pa.Table):
        if t.num_rows == 0 or "ls" not in t.schema.names:
            return
        ls = t.column("ls").to_numpy(zero_copy_only=False)
        ld = t.column("label").to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "label": pa.array(ls),
                    "d": pa.array(np.ones(len(ls), np.int64)),
                    "intra": pa.array((ls == ld).astype(np.int64)),
                }
            )
            .group_by(["label"])
            .aggregate([("d", "sum"), ("intra", "sum")])
        )
        yield g.rename_columns(["label", "d", "intra"])

    per_c = keyed_reagg(
        j2.map_batches(partial, batch_format="pyarrow"),
        ["label"], [("d", "sum"), ("intra", "sum")], P,
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        d = t.column("d").to_numpy(zero_copy_only=False)
        i = t.column("intra").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "c": pa.array([len(d)], pa.int64()),
                # intra rows are directed (both copies) -> Σintra_c = 2·Σe_c
                "a2": pa.array([sum(int(x) for x in i)], pa.int64()),
                "b": pa.array([str(sum(int(x) * int(x) for x in d))], pa.string()),
            }
        )

    C = A2 = 0
    B = 0
    for r in per_c.map_batches(
        fold, batch_size=None, batch_format="pyarrow"
    ).take_all():
        C += r["c"]
        A2 += r["a2"]
        B += int(r["b"])  # d_c² sums exceed int64 -> string transport
    # Q = Σ e_c/m − Σ (d_c/2m)² with Σe_c = A2/2 (A2 counts both
    # directions): e_c/m = A2/(2m) = 2m·A2 / 4m², so
    #   Q = (2m·A2 − B) / 4m²
    # (sanity: one community ⇒ A2 = 2m, B = 4m² ⇒ Q = 0)
    q = float(2 * m * A2 - B) / float(4 * m * m)
    return pa.table(
        {
            "communities": pa.array([C], pa.int64()),
            "m_edges": pa.array([m], pa.int64()),
            "modularity": pa.array([q], pa.float64()),
        }
    )


def hyperanf_nf(sf_dir: str) -> pa.Table:
    """HyperANF neighborhood function on the undirected lineitem graph
    (see rayrank.hyperanf) — (t, n_pairs_est, frac_of_final) up to the
    register fixpoint.  Rows-only driver check (probabilistic
    estimate); pytest pins the registers AND the estimate fold
    bit-exactly against a numpy mirror, plus a loose accuracy band vs
    exact BFS ball sizes."""
    from .hyperanf import hyperanf

    return hyperanf(_graph(sf_dir, "undirected"))


def bfs_tree_parents(sf_dir: str) -> ray.data.Dataset:
    """(name, depth, parent) — the canonical BFS tree from the
    lexicographically-minimum vertex on the undirected lineitem graph:
    parent = the min-NAME neighbor one hop closer to the root (a total
    order, so the tree is deterministic and SQL-reproducible).  The
    path/tree-extraction step that turns plain hop distances into
    routable provenance (who discovered whom) — roots of spanning-tree
    maintenance at scale.  Root row excluded (no parent).

    Scale shape: depths ride the existing multi-source BFS shard
    kernel; the parent pick is one edge⋈depth join per endpoint and a
    (child)-keyed min re-agg — the same relabel shape as the quotient
    operator, min over VARCHAR matching SQL's MIN."""
    from .bfs import bfs, min_vertex_name, reachable_depths
    from .joins import join_auto
    from .shuffle import keyed_reagg

    gdir = _graph(sf_dir, "undirected")
    seed = min_vertex_name(gdir)
    depths = reachable_depths(bfs(gdir, [seed]), gdir)  # (name, depth)

    und_pre = und_both_names
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [], P,
    )
    j1 = join_auto(und, depths, on=("a",), right_on=("name",),
                   num_partitions=P)

    def r1(t: pa.Table):
        if t.num_rows == 0 or "depth" not in t.schema.names:
            return
        yield pa.table(
            {"a": t.column("a"), "b": t.column("b"), "da": t.column("depth")}
        )

    j2 = join_auto(
        j1.map_batches(r1, batch_format="pyarrow"), depths,
        on=("b",), right_on=("name",), num_partitions=P,
    )

    def cand(t: pa.Table):
        if t.num_rows == 0 or "da" not in t.schema.names:
            return
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("depth").to_numpy(zero_copy_only=False)
        keep = pa.array(da == db - 1)
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return
        g = (
            pa.table(
                {
                    "name": t2.column("b"),
                    "depth": t2.column("depth"),
                    "parent": t2.column("a"),
                }
            )
            .group_by(["name", "depth"])
            .aggregate([("parent", "min")])
        )
        yield g.rename_columns(["name", "depth", "parent"])

    return keyed_reagg(
        j2.map_batches(cand, batch_format="pyarrow"),
        ["name", "depth"], [("parent", "min")], P,
    )


def mst_edges(sf_dir: str) -> ray.data.Dataset:
    """(u, v, w) — minimum spanning forest of the undirected lineitem
    graph under the strict edge order (w = pair multiplicity, u, v),
    via distributed Borůvka rounds (rayrank.mst).  Rows-only driver
    check (iterative contraction fixpoint); pytest compares the edge
    SET exactly against networkx under the same composite weights
    (unique by construction ⇒ the forest is unique)."""
    from .mst import boruvka_forest
    from .shuffle import keyed_reagg

    und_pre = und_canon_weight
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["u", "v"], [("w", "sum")], P,
    )
    forest, _rounds = boruvka_forest(und)
    return forest


PERC_RATES = (20, 40, 60, 80)  # percent of edges kept


def _write_edge_tags(
    named: ray.data.Dataset, graph_dir: str, tag_dir: str, Q: int
) -> None:
    """Encode a (src_name, dst_name, etag) stream into an existing
    graph's vid space and write BOTH directions hive-partitioned by
    part = src % Q — the per-edge attribute overlay
    ``CsrShard.load_edge_tags`` aligns to its resident arrays.  Uses
    the SAME encode (dictionary broadcast / partitioned fallback via
    ``keep_cols``) and the SAME self-loop drop as build_graph, so the
    overlay's edge set is exactly the CSR's; the shard-side alignment
    check raises on any divergence."""
    from .graph import GraphMeta, load_vertices
    from .ids import encode_edges

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    enc = encode_edges(
        named, load_vertices(graph_dir), Q, n_vertices=meta.n,
        vert_dir=os.path.join(graph_dir, "vertices"),
        keep_cols=("etag",),
    )

    def both_dirs(t: pa.Table):
        if t.num_rows == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        g = t.column("etag").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d, g = s[keep], d[keep], g[keep]
        src = np.concatenate([s, d])
        yield pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
                "etag": pa.array(np.concatenate([g, g]), pa.int64()),
                "part": pa.array(src % Q, pa.int64()),
            }
        )

    enc.map_batches(both_dirs, batch_format="pyarrow").repartition(
        Q, keys=["part"]
    ).write_parquet(tag_dir, partition_cols=["part"])


def percolation_sweep(sf_dir: str) -> ray.data.Dataset:
    """(rate_pct, n_edges, giant_size) — bond-percolation sweep of the
    undirected lineitem graph: at each rate the distinct edge set is
    thinned by the deterministic splitmix64 rule (hash of the packed
    canonical pair % 100 < rate) and the giant connected component is
    measured — the robustness/threshold curve a link-graph owner reads
    before trusting connectivity-dependent algorithms on partial
    crawls.  Sampling is a pure function of the edge (replays at any
    cluster size and in SQL); vertex set per rate = endpoints of
    surviving edges (isolated vertices are not 'components of size 1'
    here — mirrored in the oracle).

    Scale shape (r5 — r4 VERDICT item #4, incremental): ONE canonical
    dedup re-agg, ONE graph build and ONE shard spin-up serve the
    whole sweep.  The per-edge hash tag rides a parquet overlay
    (_write_edge_tags) the resident shards align to their CSR arrays;
    per rate the shards flip a threshold mask (dead edges transmit
    the min identity through gather_min_edge_masked — the edge twin
    of attack_robustness' r4 dead-VERTEX mask), CC re-runs on the
    same actors, and the giant pick is the distributed top-1 fold
    over the rate-ACTIVE census.  Pre-r5 this rebuilt graph + CC per
    rate (4 build passes)."""
    from .graph import GraphMeta, build_graph
    from .iterate import iterate_labels
    from .shards import create_shards
    from .shuffle import keyed_reagg
    from .sketch import splitmix64

    und_pre = und_canon_guard31
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["u", "v"], [], P,
    ).materialize()

    def named_tagged(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        key = (u.astype(np.uint64) << np.uint64(31)) | v.astype(np.uint64)
        etag = (splitmix64(key) % np.uint64(100)).astype(np.int64)
        yield pa.table(
            {
                "src_name": pc.cast(pa.array(u), pa.string()),
                "dst_name": pc.cast(pa.array(v), pa.string()),
                "etag": pa.array(etag),
            }
        )

    tagged = und.map_batches(named_tagged, batch_format="pyarrow")
    gdir = tempfile.mkdtemp(prefix="rayrank_perc_")
    build_graph(tagged, gdir, num_partitions=P, undirected=True)
    meta = GraphMeta.load(os.path.join(gdir, "meta.json"))
    tag_dir = os.path.join(gdir, "etags")
    _write_edge_tags(tagged, gdir, tag_dir, meta.Q)

    def top1(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        lab = t.column("label").to_numpy(zero_copy_only=False)
        i = np.lexsort((lab, -n))[:1]
        yield t.take(pa.array(i))

    rows = []
    # shard actors created INSIDE the try: a failure would otherwise
    # leak 2·Q resident actors that pin CPUs for the session (the
    # fourteenth-sitting bench lesson)
    shards = create_shards(gdir, meta)
    try:
        ray.get([s.load_edge_tags.remote(tag_dir) for s in shards])
        for rate in PERC_RATES:
            ray.get([s.set_edge_rate.remote(rate) for s in shards])
            n_alive = sum(
                ray.get([s.alive_edge_count.remote() for s in shards])
            )
            if n_alive % 2:
                raise ValueError(
                    "percolation edge mask must be direction-symmetric"
                )
            iterate_labels(
                gdir,
                gather_method="gather_min_edge_masked",
                reduce_method="reduce_min",
                max_iterations=200,
                shards=shards,
                algo_name="percolation_cc",
                init_fn=lambda sh: ray.get(
                    [s.init_labels.remote() for s in sh]
                ),
            )
            sizes = keyed_reagg(
                ray.data.from_arrow_refs(
                    [s.rate_label_census.remote() for s in shards]
                ),
                ["label"], [("n", "sum")], P,
            )
            g = (
                sizes.map_batches(
                    top1, batch_size=None, batch_format="pyarrow"
                )
                .repartition(1)
                .map_batches(top1, batch_size=None, batch_format="pyarrow")
                .take_all()
            )
            rows.append(
                (rate, n_alive // 2, int(g[0]["n"]) if g else 0)
            )
    finally:
        for s in shards:  # resident shard actors pin CPUs (bench lesson)
            ray.kill(s)

    return ray.data.from_arrow(
        pa.table(
            {
                "rate_pct": pa.array([r for r, _, _ in rows], pa.int64()),
                "n_edges": pa.array([n for _, n, _ in rows], pa.int64()),
                "giant_size": pa.array([g for _, _, g in rows], pa.int64()),
            }
        )
    )


TEMPORAL_MAX_ROUNDS = 40  # raise-guard; the SQL oracle unrolls 48 layers


def temporal_reachability(sf_dir: str) -> ray.data.Dataset:
    """(vertex, arrival) — earliest-arrival time-respecting
    reachability from the minimum vertex over the UNDIRECTED temporal
    lineitem graph (edge {u,v} active at t = epoch-day of l_shipdate;
    a path may traverse an edge only at t ≥ the arrival at its tail;
    arrival(seed) = 0).  The min-arrival fixpoint is monotone, so
    delta rounds are exact: each round joins only the IMPROVED
    frontier against the (materialized, distinct) edge table —
    broadcast while the frontier fits, partitioned hash join above
    the limit (join_auto) — then ONE keyed re-agg both min-merges the
    feasible messages (t ≥ arrival) into the arrival table and detects
    change (the old arrival rides along as a sentinel-padded ``aold``
    min, so ``a < aold`` IS the next frontier).  Arrival state never
    passes through the driver (it moves only the change count).
    Rounds are bounded by the hop length of the longest optimal
    temporal path (Bellman-Ford argument); the guard RAISES before the
    SQL oracle's 48-layer recursion bound can be outrun.  At cluster
    scale the edge table would live in per-partition shard actors
    (iterate_labels layout) so only frontier rows move; the Dataset
    join keeps the same hash-partitioning contract."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    def pre(t: pa.Table):
        if len(t) == 0 or "l_orderkey" not in t.schema.names:
            return
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        d = (
            t.column("l_shipdate")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        blk = pa.table(
            {
                "u": pa.array(np.concatenate([o, p]), pa.int64()),
                "v": pa.array(np.concatenate([p, o]), pa.int64()),
                "t": pa.array(np.concatenate([d, d]), pa.int64()),
            }
        )
        g = blk.group_by(["u", "v", "t"]).aggregate([])
        yield g.rename_columns(["u", "v", "t"])

    e = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_shipdate"])
        .map_batches(pre, batch_format="pyarrow"),
        ["u", "v", "t"], [], P,
    ).materialize()
    seed = int(e.min("u"))

    def _tbl(rows_v, rows_a):
        return pa.table(
            {"v": pa.array(rows_v, pa.int64()), "a": pa.array(rows_a, pa.int64())}
        )

    arr = ray.data.from_arrow(_tbl([seed], [0])).materialize()
    frontier = arr
    SENT = np.int64(1 << 62)

    for rnd in range(TEMPORAL_MAX_ROUNDS):
        fr = frontier.map_batches(
            lambda t: t.select(["v", "a"]).rename_columns(["u", "au"]),
            batch_format="pyarrow",
        )
        joined = join_auto(e, fr, on=("u",), num_partitions=P)

        def feas(t: pa.Table):
            if t.num_rows == 0 or "au" not in t.schema.names:
                return
            f = t.filter(pc.greater_equal(t.column("t"), t.column("au")))
            if f.num_rows == 0:
                return
            g = f.select(["v", "t"]).group_by(["v"]).aggregate([("t", "min")])
            g = g.rename_columns(["v", "a"])
            yield g.append_column(
                "aold", pa.array(np.full(len(g), SENT), pa.int64())
            )

        def tag(t: pa.Table):
            if t.num_rows == 0 or "a" not in t.schema.names:
                return
            yield t.select(["v", "a"]).append_column("aold", t.column("a"))

        merged = keyed_reagg(
            joined.map_batches(feas, batch_format="pyarrow").union(
                arr.map_batches(tag, batch_format="pyarrow")
            ),
            ["v"], [("a", "min"), ("aold", "min")], P,
        ).materialize()

        def improved(t: pa.Table):
            if t.num_rows == 0 or "aold" not in t.schema.names:
                return
            f = t.filter(pc.less(t.column("a"), t.column("aold")))
            if f.num_rows:
                yield f.select(["v", "a"])

        frontier = merged.map_batches(improved, batch_format="pyarrow")
        arr = merged.map_batches(
            lambda t: t.select(["v", "a"]), batch_format="pyarrow"
        )
        if frontier.count() == 0:
            break
    else:
        raise RuntimeError(
            f"temporal_reachability exceeded {TEMPORAL_MAX_ROUNDS} rounds "
            "(SQL oracle recursion bound would be outrun)"
        )

    return arr.map_batches(
        lambda t: t.rename_columns(["vertex", "arrival"]),
        batch_format="pyarrow",
    )


DAG_MAX_ROUNDS = 60  # SQL oracle unrolls 64 recursive layers


def dag_longest_path(sf_dir: str) -> ray.data.Dataset:
    """(vertex, chain) — longest-path length ending at each vertex of
    the low→high-oriented DAG of the distinct lineitem graph (critical
    path under the canonical acyclic orientation — the depth a
    topological scheduler would assign).  Max-plus gather/reduce on
    the actor-resident label loop (bfs.dag_longest); the guard RAISES
    if convergence would outrun the SQL oracle's recursion bound."""
    from .bfs import dag_longest

    gdir = _graph(sf_dir, "dag")
    res = dag_longest(gdir, max_iterations=DAG_MAX_ROUNDS)
    if not res.converged:
        raise RuntimeError(
            f"dag_longest_path did not converge in {DAG_MAX_ROUNDS} rounds"
        )
    ds = res.labels_dataset(gdir)
    return ds.map_batches(
        lambda t: pa.table(
            {
                "vertex": pc.cast(t.column("name"), pa.int64()),
                "chain": t.column("label"),
            }
        ),
        batch_format="pyarrow",
    )


# (table, key chain columns) — the canonical per-row hash recipe shared
# bit-for-bit with the SQL oracle (money snaps to cents per the
# relational.py fixed-point rule).
_FPR_SPECS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_linenumber", "l_extendedprice"],
    "orders": ["o_orderkey", "o_custkey", "o_totalprice"],
    "events": ["event_id", "user_id", "value"],
    "customer": ["c_custkey", "c_nationkey"],
    "part": ["p_partkey", "p_size"],
}
_FPR_CENTS = {"l_extendedprice", "o_totalprice", "value"}


def table_fingerprint(sf_dir: str) -> pa.Table:
    """(tbl, n_rows, checksum) — order-free dataset fingerprints: per
    row, a chained splitmix64 over the table's key + payload columns
    (z₁ = sm64(c₀), z_k = sm64(z_{k-1} ⊕ c_{k-1})); the table checksum
    is Σ z mod 2^64 (emitted as VARCHAR — the value is a uint64).

    This is the integrity-audit primitive of a 100-TB pipeline:
    recompute after a copy / compaction / re-partition and compare —
    row order, file layout and block boundaries cannot change the sum
    (abelian fold), while any lost, duplicated or bit-flipped row
    does.  The SQL oracle re-derives every checksum independently, so
    the op itself is value-verified, not just row-counted.

    Scale shape: one pruned-column pass per table; per-block partials
    are (count, wrapped sum) pairs — block-count rows reach the
    driver, nothing else."""
    from .sketch import splitmix64

    out_t, out_n, out_c = [], [], []
    for tbl in sorted(_FPR_SPECS):
        cols = _FPR_SPECS[tbl]

        def partial(t: pa.Table, cols=cols):
            if len(t) == 0:
                return
            z = None
            for c in cols:
                arr = t.column(c).to_numpy(zero_copy_only=False)
                if c in _FPR_CENTS:
                    v = np.rint(arr * 100).astype(np.int64).view(np.uint64)
                else:
                    v = arr.astype(np.int64).view(np.uint64)
                z = splitmix64(v) if z is None else splitmix64(z ^ v)
            with np.errstate(over="ignore"):
                s = np.sum(z, dtype=np.uint64)
            yield pa.table(
                {
                    "n": pa.array([len(t)], pa.int64()),
                    "s": pa.array([np.int64(s.view(np.int64))], pa.int64()),
                }
            )

        rows = (
            _read(sf_dir, tbl, cols)
            .map_batches(partial, batch_format="pyarrow")
            .take_all()
        )  # block-count rows
        n = sum(int(r["n"]) for r in rows)
        total = sum(int(r["s"]) & 0xFFFFFFFFFFFFFFFF for r in rows) % (1 << 64)
        out_t.append(tbl)
        out_n.append(n)
        out_c.append(str(total))
    return pa.table(
        {
            "tbl": pa.array(out_t),
            "n_rows": pa.array(out_n, pa.int64()),
            "checksum": pa.array(out_c),
        }
    )


PARTQ = 8  # partition count profiled (pinned, mirrors P)


def partition_profile(sf_dir: str) -> ray.data.Dataset:
    """(part, n_vertices, n_src_edges, n_cut_edges) — the quality of a
    splitmix64(id) mod ``PARTQ`` vertex partitioning of the directed
    lineitem graph: per-partition vertex load, source-edge load, and
    cut edges (src part ≠ dst part) — the numbers a 100-TB placement
    planner reads before committing a partitioning key (balanced loads
    + low cut = less all-to-all traffic per gather).

    Scale shape: edge metrics are BLOCK-LOCAL (both endpoint parts are
    pure hashes of values already in the row — no lookup join, no
    shuffle); only the distinct-vertex count moves data, and it ships
    (part, v) pairs pre-deduped per block.  Output is Q rows."""
    from .shuffle import keyed_reagg
    from .sketch import splitmix64

    q = np.uint64(PARTQ)

    def emetrics(t: pa.Table):
        if len(t) == 0:
            return
        s = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        d = t.column("l_partkey").to_numpy(zero_copy_only=False)
        # distinct directed edges, block-local pre-dedup
        g = (
            pa.table({"s": pa.array(s), "d": pa.array(d)})
            .group_by(["s", "d"])
            .aggregate([])
        )
        yield g.rename_columns(["s", "d"])

    edges = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
            emetrics, batch_format="pyarrow"
        ),
        ["s", "d"], [], P,
    )

    def efold(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        ps = (splitmix64(s) % q).astype(np.int64)
        pd_ = (splitmix64(d) % q).astype(np.int64)
        g = (
            pa.table(
                {
                    "part": pa.array(ps),
                    "n_src_edges": pa.array(np.ones(len(s), np.int64)),
                    "n_cut_edges": pa.array((ps != pd_).astype(np.int64)),
                }
            )
            .group_by(["part"])
            .aggregate([("n_src_edges", "sum"), ("n_cut_edges", "sum")])
        )
        yield g.rename_columns(["part", "n_src_edges", "n_cut_edges"])

    emet = keyed_reagg(
        edges.map_batches(efold, batch_format="pyarrow"),
        ["part"], [("n_src_edges", "sum"), ("n_cut_edges", "sum")], P,
    )

    def vpairs(t: pa.Table):
        if t.num_rows == 0 or "s" not in t.schema.names:
            return
        both = np.concatenate(
            [
                t.column("s").to_numpy(zero_copy_only=False),
                t.column("d").to_numpy(zero_copy_only=False),
            ]
        )
        g = pa.table({"v": pa.array(both)}).group_by(["v"]).aggregate([])
        yield g.rename_columns(["v"])

    verts = keyed_reagg(
        edges.map_batches(vpairs, batch_format="pyarrow"), ["v"], [], P
    )

    def vfold(t: pa.Table):
        if t.num_rows == 0 or "v" not in t.schema.names:
            return
        pv = (
            splitmix64(t.column("v").to_numpy(zero_copy_only=False)) % q
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "part": pa.array(pv),
                    "n_vertices": pa.array(np.ones(len(pv), np.int64)),
                }
            )
            .group_by(["part"])
            .aggregate([("n_vertices", "sum")])
        )
        yield g.rename_columns(["part", "n_vertices"])

    vmet = keyed_reagg(
        verts.map_batches(vfold, batch_format="pyarrow"),
        ["part"], [("n_vertices", "sum")], P,
    )

    from .joins import join_auto

    out = join_auto(vmet, emet, on=("part",), how="left_outer",
                    num_partitions=P)

    def fin(t: pa.Table):
        if t.num_rows == 0 or "part" not in t.schema.names:
            return
        zero = pa.scalar(0, pa.int64())
        cols = {"part": t.column("part"), "n_vertices": t.column("n_vertices")}
        for c in ("n_src_edges", "n_cut_edges"):
            cols[c] = (
                pc.coalesce(t.column(c), zero)
                if c in t.schema.names
                else pa.array(np.zeros(t.num_rows, np.int64))
            )
        yield pa.table(cols)

    return out.map_batches(fin, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Square (4-cycle) census — the rectangle analogue of triangle_count
# --------------------------------------------------------------------------

SQ_DEG_CAP = 24  # wedge centers obey the common_neighbors hub rule


def square_count(sf_dir: str) -> ray.data.Dataset:
    """One row (pairs, wedges, squares) — the 4-cycle census of the
    undirected lineitem graph: for every unordered vertex pair (u, v),
    ``codeg(u, v)`` = shared neighbors c with ``2 ≤ deg(c) ≤
    SQ_DEG_CAP`` (the common_neighbors hub rule — the cap is the
    operator contract, mirrored in SQL); then

    * ``pairs``   = #{(u, v) : codeg ≥ 1}
    * ``wedges``  = Σ codeg            (capped wedge count)
    * ``squares`` = Σ C(codeg, 2)      (each 4-cycle counted once per
      opposite-corner pair whose two connecting centers are capped)

    The rectangle census is the bipartite-ish cousin of
    triangle_count: on the order–part graph it measures co-purchase
    redundancy (two orders sharing ≥2 parts), the signal behind
    butterfly_count generalized to one vertex space.

    Scale shape: identical routing to common_neighbors — block-local
    both-direction dedup, ONE repartition by wedge center so each
    center's global neighbor set is block-local, vectorized segmented
    pair emission bounded by cap·|E|, per-block pre-combine, one
    (u, v)-keyed re-agg, then a 3-scalar per-block fold (block-count
    rows reach the coalesced finish, never pair rows)."""
    from .shuffle import keyed_reagg

    P2 = 16

    und_pre = und_both
    und = sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow")
    mid = und.repartition(P2, keys=["b"])

    def emit_pairs(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((a, b))
        a_s, b_s = a[order], b[order]
        uniq = np.r_[True, (b_s[1:] != b_s[:-1]) | (a_s[1:] != a_s[:-1])]
        a_s, b_s = a_s[uniq], b_s[uniq]  # global dedup: all copies land here
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        deg = np.diff(np.r_[starts, len(b_s)])
        ok = (deg >= 2) & (deg <= SQ_DEG_CAP)
        if not ok.any():
            return
        starts, deg = starts[ok], deg[ok]
        take = np.repeat(starts, deg) + _seg_arange(deg)
        vals = a_s[take]
        seg_starts = np.r_[0, np.cumsum(deg)[:-1]]
        tail = np.repeat(seg_starts + deg, deg) - np.arange(len(vals)) - 1
        first = np.repeat(np.arange(len(vals)), tail)
        second = first + _seg_arange(tail) + 1
        if len(first) == 0:
            return
        g = (
            pa.table(
                {
                    "u": pa.array(vals[first]),
                    "v": pa.array(vals[second]),
                    "cn": pa.array(np.ones(len(first), np.int64)),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("cn", "sum")])
        )
        yield g.rename_columns(["u", "v", "cn"])

    pairs = keyed_reagg(
        mid.map_batches(emit_pairs, batch_size=None, batch_format="pyarrow"),
        ["u", "v"], [("cn", "sum")], P2,
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "cn" not in t.schema.names:
            return
        c = t.column("cn").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "pairs": pa.array([len(c)], pa.int64()),
                "wedges": pa.array([int(c.sum())], pa.int64()),
                "squares": pa.array([int((c * (c - 1) // 2).sum())],
                                    pa.int64()),
            }
        )

    def finish(t: pa.Table):
        if t.num_rows == 0 or "pairs" not in t.schema.names:
            return
        yield pa.table(
            {
                c: pa.array(
                    [int(t.column(c).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                )
                for c in ("pairs", "wedges", "squares")
            }
        )

    return (
        pairs.map_batches(fold, batch_size=None, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_size=None, batch_format="pyarrow")
    )


SQUARE_COUNT_SQL = f"""
WITH raw AS (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
deg AS (
  SELECT b AS c, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY b
),
elig AS (SELECT c FROM deg WHERE d BETWEEN 2 AND {SQ_DEG_CAP}),
wedge AS (
  SELECT e1.a AS u, e2.a AS v
  FROM und e1 JOIN und e2 ON e1.b = e2.b AND e1.a < e2.a
  JOIN elig el ON el.c = e1.b
),
cnt AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS c FROM wedge GROUP BY u, v
)
SELECT CAST(COUNT(*) AS BIGINT) AS pairs,
       CAST(SUM(c) AS BIGINT) AS wedges,
       CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS squares
FROM cnt
"""


def bipartite_conflict(sf_dir: str) -> ray.data.Dataset:
    """One row (edges, conflict_edges, components, odd_components) —
    the bipartiteness / odd-cycle census of the undirected lineitem
    graph: 2-color every component by BFS parity from its canonical
    representative (= min member name, string order — the
    canonical_components label), then count edges whose endpoints got
    the SAME color.  A component is bipartite iff it has no conflict
    edge; conflict edges certify odd cycles (each lies on one).  This
    is the screening pass before any algorithm that assumes
    two-sidedness (butterfly counting, bipartite matching, two-tower
    sampling).

    Composition of verified parts: CC (min-label loop) supplies one
    seed per component, ONE multi-seed BFS (gather_min shard loop)
    supplies parities, and the parity check is a two-way name join
    over the deduped edge list — no new kernels.  The seed list
    crosses the driver (component-count bounded, the landmark
    precedent); everything row-scale stays distributed.  SQL: the CC
    CTE chains into a multi-seed min-plus BFS recursion (b2←f1←b1
    precedent), then one parity join."""
    from .bfs import bfs, reachable_depths
    from .components import canonical_components, connected_components
    from .joins import join_auto
    from .shuffle import keyed_reagg

    gdir = _graph(sf_dir, "undirected")
    cc = connected_components(gdir)
    labels = canonical_components(cc, gdir)

    def comp_pre(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        yield t.select(["component"]).group_by(["component"]).aggregate([])

    comps = keyed_reagg(
        labels.map_batches(comp_pre, batch_format="pyarrow"),
        ["component"], [], P,
    )
    seeds = sorted(r["component"] for r in comps.take_all())

    depths = reachable_depths(bfs(gdir, seeds), gdir)  # (name, depth)

    und_pre = und_canon_names
    epairs = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["a", "b"], [], P,
    )

    j1 = join_auto(
        epairs, depths, on=("a",), right_on=("name",), num_partitions=P
    )

    def tag_da(t: pa.Table):
        if t.num_rows == 0 or "depth" not in t.schema.names:
            return
        yield t.rename_columns(
            ["da" if c == "depth" else c for c in t.schema.names]
        )

    j2 = join_auto(
        j1.map_batches(tag_da, batch_format="pyarrow"), depths,
        on=("b",), right_on=("name",), num_partitions=P,
    )

    def conflict_rows(t: pa.Table):
        if t.num_rows == 0 or "da" not in t.schema.names:
            return
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("depth").to_numpy(zero_copy_only=False)
        bad = ((da + db) % 2 == 0).astype(np.int64)
        yield pa.table(
            {
                "a": t.column("a"),
                "conflict": pa.array(bad),
                "one": pa.array(np.ones(len(bad), np.int64)),
            }
        )

    flagged = j2.map_batches(conflict_rows, batch_format="pyarrow")

    # ONE pass: per-component (edges, conflicts) partials — the driver
    # folds component-count rows, never edge rows
    jc = join_auto(
        flagged, labels, on=("a",), right_on=("name",), num_partitions=P
    )

    def comp_counts(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        g = (
            t.select(["component", "one", "conflict"])
            .group_by(["component"])
            .aggregate([("one", "sum"), ("conflict", "sum")])
        )
        yield g.rename_columns(["component", "edges", "conflicts"])

    per_comp = keyed_reagg(
        jc.map_batches(comp_counts, batch_format="pyarrow"),
        ["component"], [("edges", "sum"), ("conflicts", "sum")], P,
    ).take_all()
    n_edges = sum(int(r["edges"]) for r in per_comp)
    n_conf = sum(int(r["conflicts"]) for r in per_comp)
    odd = sum(1 for r in per_comp if r["conflicts"] > 0)

    return ray.data.from_arrow(
        pa.table(
            {
                "edges": pa.array([n_edges], pa.int64()),
                "conflict_edges": pa.array([n_conf], pa.int64()),
                "components": pa.array([len(seeds)], pa.int64()),
                "odd_components": pa.array([odd], pa.int64()),
            }
        )
    )


NS_SEEDS = 16
NS_F1 = 3
NS_F2 = 2


def neighbor_sample_2hop(sf_dir: str) -> ray.data.Dataset:
    """(seed, hop, src, dst) — GraphSAGE-style fixed-fanout neighbor
    sampling (Hamilton et al., NeurIPS 2017 — public algorithm) on the
    undirected lineitem graph: for each of the ``NS_SEEDS`` smallest
    vertices, the minibatch computation tree with fanout ``NS_F1`` at
    hop 1 and ``NS_F2`` at hop 2.  Sampling is a deterministic
    PER-NODE neighbor cache — each vertex's neighbors ranked by
    (splitmix64(a·2³² + b), b) and truncated — the fixed sampled
    adjacency scaled GNN systems precompute and reuse across
    minibatches, so the whole tree is a pure function of the graph.

    Scale shape: ONE vertex-keyed repartition ranks adjacency
    block-locally and truncates to ≤ ``NS_F1`` rows/vertex (the cache
    is vertex-bounded, NOT edge-bounded); hop expansions are joins
    against that cache; seeds broadcast as a pinned-constant set."""
    from .joins import join_auto
    from .sketch import splitmix64

    P2 = 16

    und_pre = und_both
    und = sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow")
    mid = und.repartition(P2, keys=["a"])

    def rank_hash(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        uniq = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
        a_s, b_s = a_s[uniq], b_s[uniq]  # global dedup: keyed by a
        with np.errstate(over="ignore"):
            x = (a_s.astype(np.uint64) << np.uint64(32)) + b_s.astype(
                np.uint64
            )
        z = splitmix64(x)
        o2 = np.lexsort((b_s, z, a_s))
        a_s, b_s = a_s[o2], b_s[o2]
        starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
        d = np.diff(np.r_[starts, len(a_s)])
        hrn = _seg_arange(d)
        keep = hrn < NS_F1
        yield pa.table(
            {
                "a": pa.array(a_s[keep]),
                "hrn": pa.array(hrn[keep]),
                "b": pa.array(b_s[keep]),
            }
        )

    top = mid.map_batches(
        rank_hash, batch_size=None, batch_format="pyarrow"
    ).materialize()  # vertex-bounded: <= NS_F1 rows per vertex

    def mins(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        u = np.unique(t.column("a").to_numpy(zero_copy_only=False))
        yield pa.table({"m": pa.array(u[:NS_SEEDS])})

    seed_set = np.sort(
        np.unique(
            np.concatenate(
                [
                    np.asarray([r["m"]], np.int64)
                    for r in top.map_batches(
                        mins, batch_format="pyarrow"
                    ).take_all()
                ]
                or [np.empty(0, np.int64)]
            )
        )
    )[:NS_SEEDS]

    def h1(t: pa.Table):
        if t.num_rows == 0 or "a" not in t.schema.names:
            return
        a = t.column("a").to_numpy(zero_copy_only=False)
        keep = np.isin(a, seed_set)
        if not keep.any():
            return
        yield pa.table(
            {
                "seed": pa.array(a[keep]),
                "src": pa.array(a[keep]),
                "dst": pa.array(
                    t.column("b").to_numpy(zero_copy_only=False)[keep]
                ),
            }
        )

    hop1 = top.map_batches(h1, batch_format="pyarrow").materialize()

    def f2(t: pa.Table):
        if t.num_rows == 0 or "hrn" not in t.schema.names:
            return
        m = pc.less(t.column("hrn"), NS_F2)
        t = t.filter(m)
        if len(t) == 0:
            return
        yield t.select(["a", "b"])

    top2 = top.map_batches(f2, batch_format="pyarrow")
    j = join_auto(hop1, top2, on=("dst",), right_on=("a",),
                  num_partitions=P2)

    def h2(t: pa.Table):
        if t.num_rows == 0 or "b" not in t.schema.names:
            return
        yield pa.table(
            {
                "seed": t.column("seed"),
                "hop": pa.array(np.full(len(t), 2, np.int64)),
                "src": t.column("dst"),
                "dst": t.column("b"),
            }
        )

    def tag1(t: pa.Table):
        if t.num_rows == 0 or "seed" not in t.schema.names:
            return
        yield pa.table(
            {
                "seed": t.column("seed"),
                "hop": pa.array(np.ones(len(t), np.int64)),
                "src": t.column("src"),
                "dst": t.column("dst"),
            }
        )

    return hop1.map_batches(tag1, batch_format="pyarrow").union(
        j.map_batches(h2, batch_format="pyarrow")
    )


def eigenvector_2iter(sf_dir: str) -> ray.data.Dataset:
    """(name, score) — two iterations of eigenvector centrality on the
    undirected lineitem multigraph.  On a symmetric adjacency HITS
    degenerates to plain power iteration (auth == hub == eigenvector
    iterate), so this reuses the resident-shard HITS kernels verbatim
    with fwd == rev == the undirected layout (derive_undirected:
    directed ∪ reversed, self-loops dropped, multiplicities summed);
    score is the final normalized half-step (x₄).  Completes the
    classical centrality set (degree/PageRank/Katz/HITS/SALSA/
    closeness/betweenness/harmonic + this).  SQL oracle: the unrolled
    L2-normalized half-steps over the symmetric weighted edge CTE."""
    from .hits import hits

    udir = _graph(sf_dir, "undirected")
    res = hits(udir, udir, iterations=2)
    ds = res.scores_dataset(udir)
    return ds.map_batches(
        lambda t: pa.table(
            {
                "name": t.column("name"),
                "score": pc.round(t.column("hub"), 6),
            }
        ),
        batch_format="pyarrow",
    )


def dedup_keeper_quality(sf_dir: str) -> ray.data.Dataset:
    """(component, keeper_doc_id, n_members, quality) — the dedup
    family's END STATE: each near-duplicate cluster (the fully
    SQL-checked exact-minhash LSH → jaccard ≥ 0.8 → CC chain of
    minhash_cluster_labels) keeps its highest-quality member (quality
    DESC, doc_id ASC — the quality doubles are bit-identical to the
    oracle, the property doc_quality's hash match proves).  This is
    the quality-aware keeper policy production dedup runs instead of
    min-id.

    Scale shape: cluster labels are pair-graph-bounded (docs with ≥ 1
    near-dup edge, not the corpus); ONE doc-keyed join against the
    quality scores; ONE component-keyed repartition; block-local
    argmax."""
    from .joins import join_auto

    labels = minhash_cluster_labels(sf_dir)

    def to_int(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        yield pa.table(
            {
                "doc_id": pc.cast(t.column("name"), pa.int64()),
                "component": pc.cast(t.column("component"), pa.int64()),
            }
        )

    lab = labels.map_batches(to_int, batch_format="pyarrow")
    q = doc_quality(sf_dir).select_columns(["doc_id", "quality"])
    j = join_auto(lab, q, on=("doc_id",), right_on=("doc_id",),
                  num_partitions=4)
    co = j.repartition(4, keys=["component"])

    def pick(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        comp = t.column("component").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        qual = t.column("quality").to_numpy(zero_copy_only=False)
        o = np.lexsort((did, -qual, comp))
        comp, did, qual = comp[o], did[o], qual[o]
        first = np.r_[True, comp[1:] != comp[:-1]]
        cnt = np.diff(np.r_[np.flatnonzero(first), len(comp)])
        yield pa.table(
            {
                "component": pa.array(comp[first]),
                "keeper_doc_id": pa.array(did[first]),
                "n_members": pa.array(cnt),
                "quality": pa.array(qual[first]),
            }
        )

    return co.map_batches(pick, batch_size=None, batch_format="pyarrow")


def ivf_recall(
    sf_dir: str, k: int = 5, m: int = 3, n_centroids: int = 16,
    nprobe: int = 6,
) -> ray.data.Dataset:
    """(query_id, k, n_hit, recall_ppm) — the IVF quality audit
    completing the retrieval-audit family (pq_recall / lsh_recall /
    sample_quantile_error): per query, how many of the IVF top-k
    (nprobe of n_centroids lists probed) appear in the exact
    brute-force cosine top-k.  Rows-only: the k-means coarse quantizer
    is float-iterative, not SQL-expressible — but ``nprobe ==
    n_centroids`` provably degrades to brute force (recall ≡ 10⁶),
    which the pytest exploits as an exact oracle.

    Scale shape: both sides are the existing streaming top-k paths;
    only 2·m·k (query_id, vec_id) rows reach the driver."""
    import pyarrow.parquet as pq

    from .ann import brute_force_topk, ivf_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, filters=[("vec_id", "<", m)])
    order = np.argsort(t.column("vec_id").to_numpy())
    q = np.asarray(t.column("embedding").to_pylist(), np.float64)[order]
    ds = ray.data.read_parquet(path)
    exact: dict[int, set] = {}
    for r in brute_force_topk(ds, q, k=k).take_all():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits: dict[int, int] = {qi: 0 for qi in exact}
    for r in ivf_topk(
        ds, q, k=k, n_centroids=n_centroids, nprobe=nprobe, iters=3
    ).take_all():
        if r["vec_id"] in exact.get(r["query_id"], ()):
            hits[r["query_id"]] += 1
    qs = sorted(exact)
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "k": pa.array([k] * len(qs), pa.int64()),
                "n_hit": pa.array([hits[qi] for qi in qs], pa.int64()),
                "recall_ppm": pa.array(
                    [hits[qi] * 10**6 // k for qi in qs], pa.int64()
                ),
            }
        )
    )


FAIL_PMLS = (125, 250, 500)   # failure fractions (per-mille, dyadic)


def random_failure_robustness(sf_dir: str) -> ray.data.Dataset:
    """(fail_pml, n_edges, giant_size) — RANDOM-failure robustness
    curve completing the resilience family (percolation_sweep thins
    edges, attack_robustness deletes hubs, this one fails vertices
    uniformly): a vertex x fails at level f iff splitmix64(x) <
    f·2^64 (the dataset_split threshold rule — dyadic f so the
    threshold is exact), surviving edges need both endpoints alive,
    and the giant component is measured per level.

    Scale shape: the failure rule is computable IN PLACE per edge
    endpoint (no hub set, no broadcast at all — strictly better than
    the attack variant); CC reuses the shard kernel; the giant pick is
    the distributed top-1 label fold."""
    from .components import connected_components
    from .graph import build_graph
    from .shuffle import keyed_reagg
    from .sketch import splitmix64

    und_pre = und_canon
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["u", "v"], [], P,
    ).materialize()

    out = []
    for pml in FAIL_PMLS:
        thr = np.uint64(((1 << 64) * pml) // 1000)  # exact for dyadic f

        def keep_fn(t: pa.Table, thr=thr):
            if t.num_rows == 0 or "u" not in t.schema.names:
                return
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            alive = (splitmix64(u.astype(np.uint64)) >= thr) & (
                splitmix64(v.astype(np.uint64)) >= thr
            )
            if not alive.any():
                return
            yield pa.table(
                {
                    "src_name": pc.cast(pa.array(u[alive]), pa.string()),
                    "dst_name": pc.cast(pa.array(v[alive]), pa.string()),
                }
            )

        kept = und.map_batches(keep_fn, batch_format="pyarrow").materialize()
        n_kept = kept.count()
        gdir = tempfile.mkdtemp(prefix=f"rayrank_fail_{pml}_")
        build_graph(kept, gdir, num_partitions=P, undirected=True)
        cc = connected_components(gdir)

        @ray.remote
        def label_counts(ref) -> pa.Table:
            vals = np.asarray(ref, np.int64)
            labs, counts = np.unique(vals, return_counts=True)
            return pa.table({"label": labs, "n": counts.astype(np.int64)})

        sizes = keyed_reagg(
            ray.data.from_arrow_refs(
                [label_counts.remote(r) for r in cc.part_refs]
            ),
            ["label"], [("n", "sum")], P,
        )

        def top1(t: pa.Table):
            if t.num_rows == 0 or "n" not in t.schema.names:
                return
            n = t.column("n").to_numpy(zero_copy_only=False)
            lab = t.column("label").to_numpy(zero_copy_only=False)
            i = np.lexsort((lab, -n))[:1]
            yield t.take(pa.array(i))

        giant = (
            sizes.map_batches(top1, batch_size=None, batch_format="pyarrow")
            .repartition(1)
            .map_batches(top1, batch_size=None, batch_format="pyarrow")
            .take_all()
        )
        out.append((pml, n_kept, int(giant[0]["n"]) if giant else 0))

    return ray.data.from_arrow(
        pa.table(
            {
                "fail_pml": pa.array([r[0] for r in out], pa.int64()),
                "n_edges": pa.array([r[1] for r in out], pa.int64()),
                "giant_size": pa.array([r[2] for r in out], pa.int64()),
            }
        )
    )


def joint_degree_matrix(sf_dir: str) -> ray.data.Dataset:
    """(du, dv, n_edges) — the joint degree matrix of the undirected
    distinct lineitem graph: for every edge, the (lower, higher)
    endpoint-degree pair, counted.  The full degree-correlation
    structure that degree_assortativity summarizes to one number —
    what a graph owner inspects when the summary looks off.

    Scale shape: canonical edge dedup re-agg, vertex-degree reduce,
    TWO endpoint-keyed joins against the degree table, one
    (du, dv)-bounded re-agg (output is degree-distinct-bounded, not
    edge-bounded)."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    und_pre = und_canon
    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(und_pre, batch_format="pyarrow"),
        ["u", "v"], [], P,
    ).materialize()

    def deg_pre(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        g = (
            pa.table({"x": pa.array(np.r_[u, v])})
            .append_column("d", pa.array(np.ones(2 * len(u), np.int64)))
            .group_by(["x"])
            .aggregate([("d", "sum")])
        )
        yield g.rename_columns(["x", "d"])

    deg = keyed_reagg(
        und.map_batches(deg_pre, batch_format="pyarrow"),
        ["x"], [("d", "sum")], P,
    )

    j1 = join_auto(und, deg, on=("u",), right_on=("x",), num_partitions=P)

    def tag_du(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.schema.names:
            return
        yield t.rename_columns(
            ["du_raw" if c == "d" else c for c in t.schema.names]
        )

    j2 = join_auto(
        j1.map_batches(tag_du, batch_format="pyarrow"), deg,
        on=("v",), right_on=("x",), num_partitions=P,
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "du_raw" not in t.schema.names:
            return
        a = t.column("du_raw").to_numpy(zero_copy_only=False)
        b = t.column("d").to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "du": pa.array(np.minimum(a, b)),
                    "dv": pa.array(np.maximum(a, b)),
                }
            )
            .append_column("n_edges", pa.array(np.ones(len(a), np.int64)))
            .group_by(["du", "dv"])
            .aggregate([("n_edges", "sum")])
        )
        yield g.rename_columns(["du", "dv", "n_edges"])

    return keyed_reagg(
        j2.map_batches(fold, batch_format="pyarrow"),
        ["du", "dv"], [("n_edges", "sum")], 4,
    )


CMS_AUDIT_K = 20


def cms_error_audit(sf_dir: str) -> ray.data.Dataset:
    """(l_partkey, exact_count, est_count, overcount, err_ppm) — the
    sketch-accuracy audit closing the CMS loop: for the top
    ``CMS_AUDIT_K`` partkeys by EXACT frequency (ties key asc), the
    count-min estimate vs truth (CMS never undercounts, so overcount
    >= 0 — the deliberately-narrow 256x4 grid makes the collisions
    measurable).  Both sides are deterministic integers, so even the
    error is oracle-exact — the audit-family rule.

    Scale shape: exact counts are ONE keyed reduce; top-k is a
    pinned-constant fold; estimates run over the k-row key table with
    the sketch grid broadcast."""
    from .shuffle import keyed_reagg
    from .sketch import cms_estimates, cms_sketch

    li = _read(sf_dir, "lineitem", ["l_partkey"])
    grid = cms_sketch(li, "l_partkey")

    def cnt_pre(t: pa.Table):
        if len(t) == 0:
            return
        g = (
            t.append_column("n", pa.array(np.ones(len(t), np.int64)))
            .group_by(["l_partkey"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["l_partkey", "n"])

    exact = keyed_reagg(
        li.map_batches(cnt_pre, batch_format="pyarrow"),
        ["l_partkey"], [("n", "sum")], P,
    )

    def local_top(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        k = t.column("l_partkey").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -n))[:CMS_AUDIT_K]
        yield t.take(pa.array(order))

    top_rows = sorted(
        (
            (-r["n"], r["l_partkey"])
            for r in exact.map_batches(
                local_top, batch_size=None, batch_format="pyarrow"
            ).take_all()
        )
    )[:CMS_AUDIT_K]
    keys = [k for _, k in top_rows]
    counts = {k: -negn for negn, k in top_rows}
    key_ds = ray.data.from_arrow(
        pa.table({"l_partkey": pa.array(keys, pa.int64())})
    )
    ests = {
        r["l_partkey"]: r["est_count"]
        for r in cms_estimates(key_ds, "l_partkey", grid).take_all()
    }
    ex = np.array([counts[k] for k in keys], np.int64)
    es = np.array([ests[k] for k in keys], np.int64)
    over = es - ex
    return ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array(keys, pa.int64()),
                "exact_count": pa.array(ex),
                "est_count": pa.array(es),
                "overcount": pa.array(over),
                "err_ppm": pa.array(over * 10**6 // ex),
            }
        )
    )


def distinct_sketch_audit(sf_dir: str) -> ray.data.Dataset:
    """(sketch, est_milli, exact_distinct, abs_err_ppm) — the
    distinct-count sketch audit: KMV (k=64) and HLL (p=12) estimates
    of |distinct l_partkey| against the exact count, errors in ppm.
    Both sketches are splitmix-deterministic and the HLL float chain
    is already bit-identical to its SQL oracle, so flooring 1000x the
    estimate keeps even the error integer-exact (the audit-family
    rule: measure the approximation, exactly).

    Scale shape: composes three existing streaming reductions; three
    scalar rows reach the driver."""
    import math

    from .shuffle import keyed_reagg

    kmv = kmv_distinct_parts(sf_dir).take_all()[0]["est_distinct"]
    hll = hll_distinct_parts(sf_dir).take_all()[0]["est_distinct"]

    def uniq(t: pa.Table):
        if len(t) == 0:
            return
        u = pc.unique(t.column("l_partkey"))
        yield pa.table(
            {"l_partkey": u, "one": pa.array(np.ones(len(u), np.int64))}
        )

    exact = keyed_reagg(
        _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
            uniq, batch_format="pyarrow"
        ),
        ["l_partkey"], [("one", "sum")], P,
    ).count()

    est_m = [int(math.floor(1000.0 * float(hll))), 1000 * int(kmv)]
    names = ["hll", "kmv"]
    return ray.data.from_arrow(
        pa.table(
            {
                "sketch": pa.array(names),
                "est_milli": pa.array(est_m, pa.int64()),
                "exact_distinct": pa.array([exact, exact], pa.int64()),
                "abs_err_ppm": pa.array(
                    [abs(e - 1000 * exact) * 1000 // exact for e in est_m],
                    pa.int64(),
                ),
            }
        )
    )


def widest_path_from_seed(sf_dir: str) -> ray.data.Dataset:
    """(name, width) — widest (maximum-bottleneck) path capacity from
    the minimum-id vertex to every vertex of the undirected weighted
    lineitem multigraph (weights = collapsed multiplicities): the
    max-min semiring on the resident-shard label loop (bfs
    .widest_paths), completing the semiring set (min-plus SSSP,
    max-plus critical path, min-label CC, this).  Seed holds 2^62;
    unreached vertices 0.  SQL oracle: unrolled AS MATERIALIZED
    max-min rounds (monotone — extra rounds are no-ops)."""
    from .bfs import widest_paths

    def mn(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        yield pa.table(
            {"m": pa.array([int(min(s.min(), d.min()))], pa.int64())}
        )

    seed = min(
        r["m"]
        for r in sf_edges(sf_dir).map_batches(
            mn, batch_format="pyarrow"
        ).take_all()
    )
    gdir = _graph(sf_dir, "undirected")
    res = widest_paths(gdir, [str(seed)])
    # The SQL oracle unrolls exactly WIDEST_PATH_SQL_ROUNDS max-min
    # rounds.  Bottleneck paths can be longer than the BFS diameter, so
    # a deeper fixture could need more rounds than the unroll — fail
    # LOUDLY here rather than letting the oracle silently disagree with
    # a correctly converged engine result.
    if res.iterations > WIDEST_PATH_SQL_ROUNDS:
        raise AssertionError(
            f"widest_paths converged in {res.iterations} rounds > SQL "
            f"unroll {WIDEST_PATH_SQL_ROUNDS}; raise WIDEST_PATH_SQL_ROUNDS"
        )
    ds = res.labels_dataset(gdir)
    return ds.map_batches(
        lambda t: pa.table(
            {"name": t.column("name"), "width": t.column("label")}
        ),
        batch_format="pyarrow",
    )


def source_quality_profile(sf_dir: str) -> ray.data.Dataset:
    """(source, n_docs, sum_quality_q, n_en_pred) — the per-source
    quality dashboard a corpus owner reads before setting mixture
    weights: document count, summed quality score quantized as
    floor(10⁹·quality) per doc BEFORE the sum (per-doc quality doubles
    are bit-identical to the oracle — doc_quality's proven property —
    and integer sums are order-free, so the aggregate is exact where a
    float SUM would be fold-order-dependent), and how many docs the
    language heuristic calls English.

    Scale shape: scorer actor pool → block-local group partials → one
    |sources|-bounded re-agg."""
    from .shuffle import keyed_reagg
    from .text import TextFeatures

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    # fused stage (r5): one actor pool, one object-store crossing
    ds = ds.map_batches(
        TextFeatures, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_kwargs={"include_tokens": False},
    )

    def pre(t: pa.Table):
        if len(t) == 0 or "quality" not in t.schema.names:
            return
        q = t.column("quality").to_numpy(zero_copy_only=False)
        en = pc.equal(t.column("lang_pred"), "en").to_numpy(
            zero_copy_only=False
        )
        g = (
            pa.table(
                {
                    "source": t.column("source"),
                    "n_docs": pa.array(np.ones(len(t), np.int64)),
                    "sum_quality_q": pa.array(
                        np.floor(1e9 * q).astype(np.int64)
                    ),
                    "n_en_pred": pa.array(en.astype(np.int64)),
                }
            )
            .group_by(["source"])
            .aggregate(
                [("n_docs", "sum"), ("sum_quality_q", "sum"),
                 ("n_en_pred", "sum")]
            )
        )
        yield g.rename_columns(
            ["source", "n_docs", "sum_quality_q", "n_en_pred"]
        )

    return keyed_reagg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["source"],
        [("n_docs", "sum"), ("sum_quality_q", "sum"), ("n_en_pred", "sum")],
        4,
    )


HOST_DIV = 100


def host_quotient_edges(sf_dir: str) -> ray.data.Dataset:
    """(host_a, host_b, n_edges) — the host-level quotient of the
    undirected distinct lineitem graph with the ARITHMETIC grouping
    host = id // 100 (the hierarchy_rollup trick: the contraction key
    is computable per row, so unlike component_quotient_edges there is
    no label join at all).  The host-graph aggregation webgraph
    pipelines run before spam/TrustRank analysis at site granularity;
    canonical (low, high) host pairs, self-pairs kept (intra-host
    edge counts).

    Scale shape: block-local contraction + pre-combine, ONE
    host-pair-bounded re-agg — zero joins, zero label state."""
    from .shuffle import keyed_reagg

    def canon(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) == 0:
            return
        g = (
            pa.table(
                {
                    "u": pa.array(np.minimum(s, d)),
                    "v": pa.array(np.maximum(s, d)),
                }
            )
            .group_by(["u", "v"])
            .aggregate([])
        )
        yield g.rename_columns(["u", "v"])

    und = keyed_reagg(
        sf_edges(sf_dir).map_batches(canon, batch_format="pyarrow"),
        ["u", "v"], [], P,
    )

    def contract(t: pa.Table):
        if t.num_rows == 0 or "u" not in t.schema.names:
            return
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        ha, hb = u // HOST_DIV, v // HOST_DIV
        lo, hi = np.minimum(ha, hb), np.maximum(ha, hb)
        g = (
            pa.table({"host_a": pa.array(lo), "host_b": pa.array(hi)})
            .append_column("n_edges", pa.array(np.ones(len(lo), np.int64)))
            .group_by(["host_a", "host_b"])
            .aggregate([("n_edges", "sum")])
        )
        yield g.rename_columns(["host_a", "host_b", "n_edges"])

    return keyed_reagg(
        und.map_batches(contract, batch_format="pyarrow"),
        ["host_a", "host_b"], [("n_edges", "sum")], 4,
    )


def source_dup_rates(sf_dir: str) -> ray.data.Dataset:
    """(source, n_docs, n_distinct, dup_ppm) — per-source exact-dup
    rate: documents vs distinct sha256(text) per source, dup_ppm =
    (n − distinct)·10⁶ // n.  The per-source contamination number
    that decides which feeds need dedup before mixing.

    Scale shape: sha + block-local (source, sha) dedup pre-combine,
    ONE keyed re-agg on (source, sha), then a |sources|-bounded
    count fold."""
    import hashlib

    from .shuffle import keyed_reagg

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def pre(t: pa.Table):
        if len(t) == 0 or "text" not in t.schema.names:
            return
        shas = [
            hashlib.sha256(x.encode("utf-8")).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        g = (
            pa.table({"source": t.column("source"), "sha": pa.array(shas)})
            .append_column("n", pa.array(np.ones(len(t), np.int64)))
            .group_by(["source", "sha"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["source", "sha", "n"])

    per_sha = keyed_reagg(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["source", "sha"], [("n", "sum")], P,
    )

    def fold(t: pa.Table):
        if t.num_rows == 0 or "sha" not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "source": t.column("source"),
                    "n_docs": t.column("n"),
                    "n_distinct": pa.array(
                        np.ones(t.num_rows, np.int64)
                    ),
                }
            )
            .group_by(["source"])
            .aggregate([("n_docs", "sum"), ("n_distinct", "sum")])
        )
        yield g.rename_columns(["source", "n_docs", "n_distinct"])

    agg = keyed_reagg(
        per_sha.map_batches(fold, batch_format="pyarrow"),
        ["source"], [("n_docs", "sum"), ("n_distinct", "sum")], 4,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "n_docs" not in t.schema.names:
            return
        n = t.column("n_docs").to_numpy(zero_copy_only=False)
        d = t.column("n_distinct").to_numpy(zero_copy_only=False)
        yield t.append_column(
            "dup_ppm", pa.array((n - d) * 10**6 // n)
        )

    return agg.map_batches(fin, batch_size=None, batch_format="pyarrow")


def host_pagerank_2iter(sf_dir: str) -> ray.data.Dataset:
    """(name, score) — two reference-exact power iterations on the
    HOST-contracted directed graph (host = id // 100, the arithmetic
    contraction of host_quotient_edges, direction and per-row
    multiplicity kept): site-level rank, the aggregation-then-rank
    step webgraph pipelines run for spam/TrustRank analysis at host
    granularity.  Contraction is per-row arithmetic (zero joins);
    build_graph's collapse turns repeated host pairs into
    multiplicities exactly as the SQL oracle's COUNT(*) does.
    Scores rounded to 6 decimals both sides (the pagerank_2iter
    pattern)."""
    from .pagerank import power_method

    def contract(t: pa.Table):
        if len(t) == 0 or "src" not in t.schema.names:
            return
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "src_name": pc.cast(
                    pa.array(s // HOST_DIV, pa.int64()), pa.string()
                ),
                "dst_name": pc.cast(
                    pa.array(d // HOST_DIV, pa.int64()), pa.string()
                ),
            }
        )

    key = (os.path.abspath(sf_dir), "hostpr")
    if key not in _GRAPH_CACHE:
        gdir = tempfile.mkdtemp(prefix="rayrank_hostpr_")
        build_graph(
            sf_edges(sf_dir).map_batches(contract, batch_format="pyarrow"),
            gdir, num_partitions=P,
        )
        _GRAPH_CACHE[key] = gdir
    res = power_method(_GRAPH_CACHE[key], max_iterations=2, epsilon=0.0)
    ds = res.scores_dataset(_GRAPH_CACHE[key])
    return ds.map_batches(
        lambda t: pa.table(
            {"name": t.column("name"), "score": pc.round(t.column("score"), 6)}
        ),
        batch_format="pyarrow",
    )
