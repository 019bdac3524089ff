"""Term statistics over the documents table: document frequency and
TF-IDF top terms — the vocabulary-building stage of a training-data
pipeline, with exact DuckDB oracles.

Tokenization contract (shared with the ``token_counts`` oracle):
whitespace split of the trimmed text, empty tokens dropped — byte-level
identical on both sides (``pc.split_pattern_regex`` here,
``string_split_regex`` in SQL).

Scale shape: tokens are flattened VECTORIZED from the arrow list
offsets (no per-row Python), then pre-aggregated per block
(``Table.group_by``) so the global (doc, term) groupby shuffles unique
pairs with counts, not raw tokens.  DF derives from the reduced TF
table; the TF⋈DF join is a keyed hash join on term; ranking reuses the
pre-truncate → repartition → vectorized re-rank pattern (≤ k rows per
doc cross the wire).  Scores are ranked on the ROUNDED value on both
sides so float ulp noise cannot flip the top-k boundary.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import configure_data_context
from .joins import join_auto

configure_data_context()  # entry path: hash-shuffle strategy required

P = 8


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _token_pairs(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Flatten (doc_id, token) pairs from a block, vectorized via the
    list-array offsets; empty tokens (empty/whitespace docs) dropped."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
    )
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    docs = np.repeat(
        t.column("doc_id").to_numpy(zero_copy_only=False), lens
    )
    terms = arr.values
    keep = pc.not_equal(terms, "").to_numpy(zero_copy_only=False)
    return docs[keep], terms.filter(pa.array(keep))


def term_frequencies(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, term, tf) — exact per-document term counts."""

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        docs, terms = _token_pairs(t)
        if len(docs) == 0:
            return
        block = pa.table(
            {
                "doc_id": pa.array(docs),
                "term": terms,
                "tf": pa.array(np.ones(len(docs), np.int64)),
            }
        )
        yield block.group_by(["doc_id", "term"]).aggregate(
            [("tf", "sum")]
        ).rename_columns(["doc_id", "term", "tf"])

    partials = _read_docs(sf_dir).map_batches(partial, batch_format="pyarrow")
    g = partials.groupby(["doc_id", "term"]).sum("tf")

    def rename(t: pa.Table):
        if len(t) == 0 or "sum(tf)" not in t.schema.names:
            return
        yield t.rename_columns(["doc_id", "term", "tf"])

    return g.map_batches(rename, batch_format="pyarrow")


def _doc_freq(tf: ray.data.Dataset) -> ray.data.Dataset:
    """(term, df) from the reduced TF table (rows are unique
    (doc, term) pairs, so a count per term IS the document
    frequency)."""

    def strip(t: pa.Table):
        if len(t) == 0 or "term" not in t.schema.names:
            return
        yield t.select(["term"])

    g = tf.map_batches(strip, batch_format="pyarrow").groupby("term").count()

    def rename(t: pa.Table):
        if len(t) == 0 or "count()" not in t.schema.names:
            return
        yield t.rename_columns(["term", "df"])

    return g.map_batches(rename, batch_format="pyarrow")


def term_doc_freq(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Top-``k`` vocabulary terms by document frequency,
    (df desc, term asc) deterministic order.  The sort runs on the
    already-reduced vocabulary table, never on raw tokens."""
    df = _doc_freq(term_frequencies(sf_dir))
    return df.sort(["df", "term"], descending=[True, False]).limit(k)


def tfidf_top_terms(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """(doc_id, term, tf, df, score, rn) — the ``k`` highest-TF-IDF
    terms per document, score = round(tf·ln(N/df), 6), ranked by
    (score desc, term asc).  N counts ALL documents (empty ones
    too)."""
    n_docs = float(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).count()
    )
    tf = term_frequencies(sf_dir)
    df = _doc_freq(tf)
    # vocabulary side broadcasts when it fits (the common case even at
    # corpus scale: vocab ≪ corpus); partitioned hash join above limit
    j = join_auto(tf, df, on=("term",), num_partitions=P)

    def score(t: pa.Table):
        if len(t) == 0 or "df" not in t.schema.names:
            return
        tfv = t.column("tf").to_numpy(zero_copy_only=False)
        dfv = t.column("df").to_numpy(zero_copy_only=False)
        s = np.round(tfv * np.log(n_docs / dfv), 6)
        yield t.append_column("score", pa.array(s, pa.float64()))

    scored = j.map_batches(score, batch_format="pyarrow")

    def rank(t: pa.Table, emit_rank: bool):
        if t.num_rows == 0 or "score" not in t.schema.names:
            return
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("score").to_numpy(zero_copy_only=False)
        term = np.asarray(t.column("term").to_pylist(), dtype=object)
        order = np.lexsort((term, -s, d))
        rank_ = np.empty(len(d), np.int64)
        ds_, ss_ = d[order], s[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        rank_ = np.arange(len(ds_)) - np.repeat(
            starts, np.diff(np.r_[starts, len(ds_)])
        )
        keep_idx = order[rank_ < k]
        out = t.take(pa.array(keep_idx))
        if emit_rank:
            out = out.append_column(
                "rn", pa.array(rank_[rank_ < k] + 1, pa.int64())
            )
        yield out

    pre = scored.map_batches(
        lambda t: rank(t, emit_rank=False), batch_format="pyarrow"
    )
    co = pre.repartition(P, keys=["doc_id"])
    return co.map_batches(
        lambda t: rank(t, emit_rank=True),
        batch_size=None,
        batch_format="pyarrow",
    )


VOCAB_K = 100


def inverted_index(sf_dir: str, k: int = VOCAB_K) -> ray.data.Dataset:
    """(term, df, postings) inverted index for the top-``k``-DF
    vocabulary — the search-index-build stage: postings is the
    doc_id-sorted posting list (comma-joined so the hash compare is
    type-stable; a list<int64> column would hash unreliably through
    pandas).

    ONE keyed shuffle total: (doc, term) pairs dedup per block, the
    repartition by term co-locates every copy of a pair, and the build
    kernel dedups + sorts + joins block-locally, emitting the FULL
    per-term index (term, df, postings) without any Dataset.groupby
    aggregator.  The top-k vocabulary pick is then a sort+limit on the
    already-reduced per-term table (|vocab| rows) — the v1 that picked
    the vocabulary FIRST tokenized the corpus twice and paid two
    aggregator shuffles (22.7 s → ~6 s at SF=0.1)."""
    # testdata-scale query surface: the corpus is tiny, so pin the
    # module partition count — dyn_partitions would spin a 64-partition
    # exchange over 5k docs (measured +1.5 s of pure spin-up at sf0.1);
    # the scale path (inverted_index_ds direct, bench) stays dynamic
    return inverted_index_ds(_read_docs(sf_dir), k, num_partitions=P)


def inverted_index_ds(
    docs: ray.data.Dataset, k: int = VOCAB_K, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Dataset-input core of :func:`inverted_index` (docstring there);
    also the bench surface for text-pipeline scaling runs over
    synthetic corpora.

    Combiner-style: each block emits PER-TERM posting-list partials
    (term, docs ``list<int64>``, df) instead of raw (doc, term) pairs,
    so the keyed shuffle moves ≤ blocks·|vocab| rows (each term string
    once per block) rather than one row per pair; the reduce merges
    the partial lists with one vectorized int64 lexsort + dedup and
    renders postings via ``pc.binary_join`` — no Python-object sort or
    per-doc ``str()`` loop anywhere (the v2 object-lexsort build was
    the reduce hot spot in the text-pipeline scaling run)."""
    if num_partitions is None:
        from . import dyn_partitions

        num_partitions = dyn_partitions()

    def pairs(t: pa.Table):
        if len(t) == 0:
            return
        docs_np, terms = _token_pairs(t)
        if len(docs_np) == 0:
            return
        pt = pa.table({"doc_id": pa.array(docs_np), "term": terms}).group_by(
            ["doc_id", "term"]
        ).aggregate([])
        enc = pc.dictionary_encode(pt.column("term").combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False)
        doc = pt.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, idx))
        idx_s, doc_s = idx[order], doc[order]
        starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
        offsets = np.r_[starts, len(doc_s)].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(doc_s)
        )
        yield pa.table(
            {
                "term": enc.dictionary.take(pa.array(idx_s[starts])),
                "docs": lists,
            }
        )

    co = docs.map_batches(pairs, batch_format="pyarrow").repartition(
        num_partitions, keys=["term"]
    )

    def build(t: pa.Table):
        if t.num_rows == 0 or "term" not in t.schema.names:
            return
        enc = pc.dictionary_encode(t.column("term").combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        lst = t.column("docs").combine_chunks().take(pa.array(order))
        vals = lst.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(lst.offsets.to_numpy(zero_copy_only=False))
        tid = np.repeat(idx[order], lens)
        vo = np.lexsort((vals, tid))
        tid_s, val_s = tid[vo], vals[vo]
        # exact pair dedup (duplicate doc_id rows in the corpus)
        keep = np.r_[True, (tid_s[1:] != tid_s[:-1]) | (val_s[1:] != val_s[:-1])]
        tid_s, val_s = tid_s[keep], val_s[keep]
        starts = np.flatnonzero(np.r_[True, tid_s[1:] != tid_s[:-1]])
        offsets = np.r_[starts, len(val_s)].astype(np.int32)
        merged = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pc.cast(pa.array(val_s), pa.string()),
        )
        yield pa.table(
            {
                "term": enc.dictionary.take(pa.array(tid_s[starts])),
                "df": pa.array(np.diff(offsets).astype(np.int64)),
                "postings": pc.binary_join(merged, ","),
            }
        )

    idx = co.map_batches(build, batch_size=None, batch_format="pyarrow")
    return idx.sort(["df", "term"], descending=[True, False]).limit(k)


_TOK_CTE = r"""
tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS term
  FROM documents
),
tfq AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY term)
"""

TERM_DOC_FREQ_SQL = (
    "WITH " + _TOK_CTE
    + "SELECT term, df FROM dfq ORDER BY df DESC, term LIMIT 100"
)

TFIDF_TOP_TERMS_SQL = (
    "WITH " + _TOK_CTE + """,
nq AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
sc AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
    ROUND(t.tf * ln((SELECT n FROM nq) / d.df), 6) AS score
  FROM tfq t JOIN dfq d USING (term)
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS rn
  FROM sc
)
SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
"""
)

INVERTED_INDEX_SQL = (
    "WITH " + _TOK_CTE + """,
vocab AS (SELECT term, df FROM dfq ORDER BY df DESC, term LIMIT 100)
SELECT v.term, v.df,
  string_agg(CAST(t.doc_id AS VARCHAR), ',' ORDER BY t.doc_id) AS postings
FROM tfq t JOIN vocab v USING (term)
GROUP BY v.term, v.df
"""
)


# --------------------------------------------------------------------------
# top bigrams: adjacent-token pairs, vectorized from the list offsets
# --------------------------------------------------------------------------

TOP_BIGRAMS_K = 15


def top_bigrams(sf_dir: str, k: int = TOP_BIGRAMS_K) -> ray.data.Dataset:
    """Global top-k adjacent-token bigrams (count desc, bigram asc).
    Pairing is pure offset arithmetic on the split list array (empty
    tokens dropped FIRST, so adjacency matches the filtered sequence —
    same rule as the SQL's list_filter→list_zip); per-block counts
    pre-combine, ONE bigram-keyed shuffle reduces, each reduce block
    emits its boundary-tie-complete local top-k, and the O(blocks·k)
    candidates fold in a single coalesced block.  Never materializes
    the bigram vocabulary outside the keyed partitions."""

    def pairs(t: pa.Table):
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values
        doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        vals_k = vals.filter(pa.array(keep))
        doc_k = doc_idx[keep]
        n = len(vals_k)
        if n < 2:
            return
        adj = doc_k[1:] == doc_k[:-1]
        if not adj.any():
            return
        m = pa.array(adj)
        bigram = pc.binary_join_element_wise(
            vals_k.slice(0, n - 1).filter(m), vals_k.slice(1).filter(m), " "
        )
        g = (
            pa.table({"bigram": bigram})
            .append_column("cnt", pa.array(np.ones(len(bigram), np.int64)))
            .group_by(["bigram"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["bigram", "cnt"])

    from .shuffle import keyed_reagg

    counts = keyed_reagg(
        _read_docs(sf_dir).map_batches(pairs, batch_format="pyarrow"),
        ["bigram"], [("cnt", "sum")], P,
    )

    def local_topk(t: pa.Table):
        if t.num_rows == 0 or "cnt" not in t.schema.names:
            return
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        if len(cnt) > k:
            # boundary-tie-complete cutoff: keep everything >= the kth
            # largest count, so the global winner set is preserved
            kth = np.partition(cnt, len(cnt) - k)[len(cnt) - k]
            t = t.filter(pc.greater_equal(t.column("cnt"), int(kth)))
        yield t

    g = counts.map_batches(
        local_topk, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "bigram" not in t.schema.names:
            return
        big = np.asarray(t.column("bigram").to_pylist(), dtype=object)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((big, -cnt))[:k]
        yield t.take(pa.array(order))

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


TOP_BIGRAMS_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), big AS (
  SELECT u[1] || ' ' || u[2] AS bigram
  FROM tok, UNNEST(list_zip(lst[1:-1], lst[2:])) AS t(u)
  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM big
GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT {TOP_BIGRAMS_K}
"""


# --------------------------------------------------------------------------
# Windowed co-occurrence (skip-gram counts) — the word2vec context stage
# --------------------------------------------------------------------------

COOCCUR_WINDOW = 3
COOCCUR_K = 20


def windowed_cooccurrence(
    sf_dir: str, window: int = COOCCUR_WINDOW, k: int = COOCCUR_K
) -> ray.data.Dataset:
    """Global top-k ordered token pairs (w1, w2) with w2 at distance
    1..window after w1 in the same document — the skip-gram
    co-occurrence counting stage of word2vec/GloVe training data prep.
    top_bigrams' adjacency rule generalized: for each offset d the
    pairing is pure slice arithmetic on the filtered token array (doc
    boundaries enforced by comparing the repeated doc index), so the
    hot loop is `window` vectorized passes, never per-row Python.
    Per-block pre-combine, ONE pair-keyed shuffle, boundary-tie-complete
    local top-k, O(blocks·k) final fold — the same scale shape as
    top_bigrams."""

    def pairs(t: pa.Table):
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values
        doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        vals_k = vals.filter(pa.array(keep))
        doc_k = doc_idx[keep]
        n = len(vals_k)
        tabs = []
        for d in range(1, window + 1):
            if n <= d:
                break
            adj = doc_k[d:] == doc_k[:-d]
            if not adj.any():
                continue
            m = pa.array(adj)
            p = pc.binary_join_element_wise(
                vals_k.slice(0, n - d).filter(m), vals_k.slice(d).filter(m), " "
            )
            tabs.append(pa.table({"pair": p}))
        if not tabs:
            return
        allp = pa.concat_tables(tabs)
        g = (
            allp.append_column(
                "cnt", pa.array(np.ones(allp.num_rows, np.int64))
            )
            .group_by(["pair"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["pair", "cnt"])

    from .shuffle import keyed_reagg

    counts = keyed_reagg(
        _read_docs(sf_dir).map_batches(pairs, batch_format="pyarrow"),
        ["pair"], [("cnt", "sum")], P,
    )

    def local_topk(t: pa.Table):
        if t.num_rows == 0 or "cnt" not in t.schema.names:
            return
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        if len(cnt) > k:
            kth = np.partition(cnt, len(cnt) - k)[len(cnt) - k]
            t = t.filter(pc.greater_equal(t.column("cnt"), int(kth)))
        yield t

    g = counts.map_batches(
        local_topk, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "pair" not in t.schema.names:
            return
        p = np.asarray(t.column("pair").to_pylist(), dtype=object)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -cnt))[:k]
        yield t.take(pa.array(order))

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


def _cooccur_branch(d: int) -> str:
    return (
        f"SELECT u[1] || ' ' || u[2] AS pair\n"
        f"  FROM tok, UNNEST(list_zip(lst, lst[{d + 1}:])) AS t(u)\n"
        f"  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL"
    )


WINDOWED_COOCCURRENCE_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), big AS (
  {" UNION ALL ".join(_cooccur_branch(d) for d in range(1, COOCCUR_WINDOW + 1))}
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM big
GROUP BY 1 ORDER BY cnt DESC, pair LIMIT {COOCCUR_K}
"""


# --------------------------------------------------------------------------
# Gopher-style repetition signal: per-doc distinct-token ratio
# --------------------------------------------------------------------------


def doc_repetition(sf_dir: str) -> ray.data.Dataset:
    """Per-document token-repetition signal (the Gopher "fraction of
    duplicate tokens" quality rule): total tokens, distinct tokens, and
    ``rep_ratio = 1 − distinct/total``.  Entirely block-local — a
    document's text is one row, so both counts come from one in-block
    arrow group_by; NO shuffle at any scale.  The ratio is a single
    float expression restated identically in SQL, so it is bit-stable."""

    def per_doc(t: pa.Table):
        if len(t) == 0:
            return
        docs, terms = _token_pairs(t)
        if len(docs) == 0:
            return
        ones = pa.array(np.ones(len(docs), np.int64))
        tot = (
            pa.table({"doc_id": pa.array(docs), "one": ones})
            .group_by(["doc_id"]).aggregate([("one", "sum")])
        )
        dis = (
            pa.table({"doc_id": pa.array(docs), "w": terms})
            .group_by(["doc_id", "w"]).aggregate([])
            .group_by(["doc_id"]).aggregate([("w", "count")])
        )
        # align: both tables keyed by doc_id (KEYS FIRST in this pyarrow)
        tk = tot.column("doc_id").to_numpy(zero_copy_only=False)
        tv = tot.column("one_sum").to_numpy(zero_copy_only=False)
        dk = dis.column("doc_id").to_numpy(zero_copy_only=False)
        dv = dis.column("w_count").to_numpy(zero_copy_only=False)
        o_t, o_d = np.argsort(tk), np.argsort(dk)
        tk, tv = tk[o_t], tv[o_t]
        dv = dv[o_d]
        nt = tv.astype(np.int64)
        nd = dv.astype(np.int64)
        yield pa.table(
            {
                "doc_id": pa.array(tk),
                "n_tokens": pa.array(nt),
                "n_distinct": pa.array(nd),
                "rep_ratio": pa.array(
                    1.0 - nd.astype(np.float64) / nt.astype(np.float64)
                ),
            }
        )

    return _read_docs(sf_dir).map_batches(per_doc, batch_format="pyarrow")


DOC_REPETITION_SQL = r"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
)
SELECT doc_id, CAST(len(lst) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(lst)) AS BIGINT) AS n_distinct,
  1.0 - CAST(len(list_distinct(lst)) AS DOUBLE) / CAST(len(lst) AS DOUBLE)
    AS rep_ratio
FROM tok WHERE len(lst) > 0
"""


# --------------------------------------------------------------------------
# benchmark decontamination: exact n-gram overlap vs a holdout set
# --------------------------------------------------------------------------

N_GRAM = 3  # 31-token synthetic vocab: 3-grams give non-degenerate overlap
HOLDOUT_MOD = 50  # docs with doc_id % 50 == 0 act as the "benchmark" set


def _gram_pairs(t: pa.Table, n: int):
    """(doc row-index, n-gram string) pairs for a block, vectorized from
    the split list offsets — top_bigrams' adjacency rule generalized to
    n: a window starting at flat position i is valid iff positions i and
    i+n−1 fall in the same document."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
    )
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    vals = arr.values
    doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
    keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    vals_k = vals.filter(pa.array(keep))
    doc_k = doc_idx[keep]
    m = len(vals_k)
    if m < n:
        return None, None
    valid = doc_k[: m - n + 1] == doc_k[n - 1 :]
    if not valid.any():
        return None, None
    vm = pa.array(valid)
    parts = [vals_k.slice(i, m - n + 1).filter(vm) for i in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    rows = doc_k[: m - n + 1][valid]
    return rows, gram


def contamination_ngram(sf_dir: str) -> ray.data.Dataset:
    """Benchmark-decontamination report: for every corpus document, the
    number of DISTINCT ``N_GRAM``-grams it shares with the holdout
    ("benchmark") docs (``doc_id % 50 == 0``) — the exact n-gram overlap
    check run before training on scraped data (13-gram in the published
    recipes; 3 here because the synthetic corpus has a 31-token
    vocabulary).  Scale shape: both sides shingle
    vectorized per block and pre-distinct with an in-block group_by (a
    document is ONE row, so per-block distinct == global distinct for
    the (doc, gram) pairs); the holdout gram set reduces through one
    gram-keyed ``keyed_reagg``; membership is a semi join under
    ``join_auto``'s broadcast guard (zero shuffle while the holdout
    vocabulary is small, partitioned hash semi above it); matched pairs
    fold to per-doc counts with one doc-keyed reagg.  The corpus gram
    table itself is never materialized anywhere."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    def side(holdout: bool):
        def fn(t: pa.Table):
            if len(t) == 0:
                return
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % HOLDOUT_MOD == 0) if holdout else (
                ids % HOLDOUT_MOD != 0
            )
            t2 = t.filter(pa.array(mask))
            if len(t2) == 0:
                return
            rows, gram = _gram_pairs(t2, N_GRAM)
            if rows is None:
                return
            if holdout:
                yield pa.table({"gram": gram}).group_by(["gram"]).aggregate([])
            else:
                docs = t2.column("doc_id").to_numpy(zero_copy_only=False)[rows]
                yield pa.table(
                    {"doc_id": pa.array(docs), "gram": gram}
                ).group_by(["doc_id", "gram"]).aggregate([])

        return fn

    corp = _read_docs(sf_dir).map_batches(side(False), batch_format="pyarrow")
    hold = _read_docs(sf_dir).map_batches(side(True), batch_format="pyarrow")

    def add_one(t: pa.Table):
        if len(t) == 0 or "gram" not in t.schema.names:
            return
        yield t.append_column("one", pa.array(np.ones(len(t), np.int64)))

    hold_keys = keyed_reagg(
        hold.map_batches(add_one, batch_format="pyarrow"),
        ["gram"], [("one", "sum")], P,
    ).select_columns(["gram"])

    hit = join_auto(corp, hold_keys, on=("gram",), how="semi", num_partitions=P)

    def cnt(t: pa.Table):
        if len(t) == 0 or "doc_id" not in t.schema.names:
            return
        g = (
            pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "one": pa.array(np.ones(len(t), np.int64)),
                }
            ).group_by(["doc_id"]).aggregate([("one", "sum")])
        )
        yield g.rename_columns(["doc_id", "contaminated"])

    return keyed_reagg(
        hit.map_batches(cnt, batch_format="pyarrow"),
        ["doc_id"], [("contaminated", "sum")], P,
    )


_G_PARTS = " || ' ' || ".join(f"u[{i + 1}]" for i in range(N_GRAM))
_G_ZIPS = ", ".join(f"lst[{i + 1}:]" for i in range(N_GRAM))

CONTAMINATION_NGRAM_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), g AS (
  SELECT doc_id, {_G_PARTS} AS gram
  FROM tok, UNNEST(list_zip({_G_ZIPS})) AS t(u)
  WHERE u[{N_GRAM}] IS NOT NULL
), hold AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % {HOLDOUT_MOD} = 0
), corp AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % {HOLDOUT_MOD} <> 0
)
SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS contaminated
FROM corp c JOIN hold h USING (gram)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# cross-source corpus similarity: shared distinct n-grams per source pair
# --------------------------------------------------------------------------

MAX_SOURCES = 63  # masks live in int64


def cross_source_ngram_overlap(sf_dir: str) -> ray.data.Dataset:
    """Corpus-overlap matrix: for every pair of ``source`` values, how
    many DISTINCT ``N_GRAM``-grams the two sources share — the
    cross-crawl redundancy check run before mixing scraped corpora.

    Scale shape: sources are a bounded dimension (guarded ≤ 63, raises
    above — the masks live in one int64); each block shingles
    vectorized and dedups (gram, source-bit) pairs with an in-block
    arrow group_by, so per gram at most |sources| rows shuffle (1–2 in
    practice); ONE gram-keyed repartition completes the OR as a
    sum-of-distinct-bits; per-block (mask, cnt) histograms coalesce to
    ≤ |masks| rows; the pair expansion is a vectorized popcount over
    the mask histogram — the gram table never leaves the keyed
    partitions and no pair list is ever materialized per gram."""
    src_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )

    def s_distinct(t: pa.Table):
        if len(t) == 0:
            return
        yield t.group_by(["source"]).aggregate([])

    srcs = sorted(
        set(
            v
            for b in src_ds.map_batches(s_distinct, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            for v in b.column("source").to_pylist()
        )
    )
    if len(srcs) > MAX_SOURCES:
        raise ValueError(
            f"cross_source_ngram_overlap supports <= {MAX_SOURCES} sources, "
            f"got {len(srcs)}; widen the mask type before raising the cap"
        )
    bit_of = {s: i for i, s in enumerate(srcs)}

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def gram_masks(t: pa.Table):
        if len(t) == 0:
            return
        rows, gram = _gram_pairs(t, N_GRAM)
        if rows is None:
            return
        src = t.column("source").to_pylist()
        bits = np.array([np.int64(1) << bit_of[s] for s in src], np.int64)[rows]
        # distinct (gram, bitval) pairs: sum-of-distinct-bits == OR, so
        # the whole OR-fold stays in arrow group_by kernels (no string
        # sort); per gram ≤ |sources| rows shuffle, 1–2 in practice
        yield (
            pa.table({"gram": gram, "bitval": pa.array(bits)})
            .group_by(["gram", "bitval"]).aggregate([])
        )

    partials = docs.map_batches(gram_masks, batch_format="pyarrow")
    co = partials.repartition(P, keys=["gram"])

    def fold(t: pa.Table):
        if t.num_rows == 0 or "gram" not in t.schema.names:
            return
        g = (
            t.group_by(["gram", "bitval"]).aggregate([])
            .group_by(["gram"]).aggregate([("bitval", "sum")])
        )
        mask = g.column("bitval_sum")
        hist = (
            pa.table(
                {"mask": mask, "cnt": pa.array(np.ones(len(g), np.int64))}
            ).group_by(["mask"]).aggregate([("cnt", "sum")])
        )
        yield hist.rename_columns(["mask", "cnt"])

    hist = co.map_batches(
        fold, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def expand(t: pa.Table):
        if t.num_rows == 0 or "mask" not in t.schema.names:
            return
        t = t.group_by(["mask"]).aggregate([("cnt", "sum")])
        mask = t.column("mask").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt_sum").to_numpy(zero_copy_only=False)
        a_out, b_out, n_out = [], [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                both = (mask >> i & 1).astype(bool) & (
                    mask >> j & 1
                ).astype(bool)
                n = int(cnt[both].sum())
                if n > 0:
                    a_out.append(srcs[i])
                    b_out.append(srcs[j])
                    n_out.append(n)
        yield pa.table(
            {
                "source_a": pa.array(a_out, pa.string()),
                "source_b": pa.array(b_out, pa.string()),
                "shared_ngrams": pa.array(n_out, pa.int64()),
            }
        )

    return hist.map_batches(expand, batch_size=None, batch_format="pyarrow")


CROSS_SOURCE_NGRAM_OVERLAP_SQL = rf"""
WITH tok AS (
  SELECT source,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), g AS (
  SELECT DISTINCT source, {_G_PARTS} AS gram
  FROM tok, UNNEST(list_zip({_G_ZIPS})) AS t(u)
  WHERE u[{N_GRAM}] IS NOT NULL
)
SELECT a.source AS source_a, b.source AS source_b,
  CAST(COUNT(*) AS BIGINT) AS shared_ngrams
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Bigram PMI: collocation strength over adjacent token pairs
# --------------------------------------------------------------------------

BIGRAM_PMI_K = 50
BIGRAM_PMI_MIN_CNT = 5


def bigram_pmi(
    sf_dir: str, k: int = BIGRAM_PMI_K, min_count: int = BIGRAM_PMI_MIN_CNT
) -> ray.data.Dataset:
    """Top-k adjacent-token bigrams by pointwise mutual information
    ``ln(c_ab·Nu²/(c_a·c_b·Nb))`` with ``c_ab ≥ min_count`` (rank on
    the ROUNDED score, bigram-asc ties — the tfidf_top_terms rule).

    Scale shape: unigram counts reduce to a VOCAB-bounded table
    (driver-folded and broadcast here; a partitioned lookup above a
    vocab cap would be the 100-TB path), bigram counts reduce by ONE
    (a, b)-keyed shuffle, and the reduced bigram table is materialized
    once — bounded by bigram vocabulary, never corpus rows — so the
    Nb scalar fold and the scoring pass reuse it without recomputing
    the scan.  The PMI double is computed with ONE explicit
    left-associated expression mirrored in the SQL oracle, so the
    match never depends on DuckDB's internal float algebra."""
    from .shuffle import keyed_reagg

    def uni(t: pa.Table):
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        vals = arr.values.filter(pc.not_equal(arr.values, ""))
        if len(vals) == 0:
            return
        g = (
            pa.table({"tok": vals})
            .append_column("cnt", pa.array(np.ones(len(vals), np.int64)))
            .group_by(["tok"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["tok", "cnt"])

    ucnt = keyed_reagg(
        _read_docs(sf_dir).map_batches(uni, batch_format="pyarrow"),
        ["tok"], [("cnt", "sum")], P,
    ).take_all()  # vocab-bounded
    cdict = {r["tok"]: int(r["cnt"]) for r in ucnt}
    nu = float(sum(cdict.values()))

    def pairs(t: pa.Table):
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values
        doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        vals_k = vals.filter(pa.array(keep))
        doc_k = doc_idx[keep]
        n = len(vals_k)
        if n < 2:
            return
        adj = doc_k[1:] == doc_k[:-1]
        if not adj.any():
            return
        m = pa.array(adj)
        g = (
            pa.table(
                {
                    "a": vals_k.slice(0, n - 1).filter(m),
                    "b": vals_k.slice(1).filter(m),
                }
            )
            .append_column("cnt", pa.array(np.ones(int(adj.sum()), np.int64)))
            .group_by(["a", "b"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["a", "b", "cnt"])

    counts = keyed_reagg(
        _read_docs(sf_dir).map_batches(pairs, batch_format="pyarrow"),
        ["a", "b"], [("cnt", "sum")], P,
    ).materialize()  # bigram-vocab-bounded reduced table

    def nb_part(t: pa.Table):
        if t.num_rows == 0 or "cnt" not in t.schema.names:
            return
        yield pa.table({"s": pa.array([int(
            pc.sum(t.column("cnt")).as_py() or 0)])})

    nb = float(sum(
        r["s"] for r in counts.map_batches(
            nb_part, batch_size=None, batch_format="pyarrow"
        ).take_all()
    ))

    def score(t: pa.Table):
        if t.num_rows == 0 or "cnt" not in t.schema.names:
            return
        t = t.filter(pc.greater_equal(t.column("cnt"), min_count))
        if t.num_rows == 0:
            return
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        ca = np.fromiter((cdict[x] for x in a), np.float64, len(a))
        cb = np.fromiter((cdict[x] for x in b), np.float64, len(b))
        # ONE left-associated expression, mirrored verbatim in SQL
        pmi = np.round(
            np.log((cnt.astype(np.float64) * nu) * nu / ((ca * cb) * nb)), 6
        )
        out = pa.table(
            {
                "bigram": pc.binary_join_element_wise(
                    t.column("a"), t.column("b"), " "
                ),
                "cnt": t.column("cnt"),
                "pmi": pa.array(pmi),
            }
        )
        if out.num_rows > k:
            kth = np.partition(pmi, len(pmi) - k)[len(pmi) - k]
            out = out.filter(pc.greater_equal(out.column("pmi"), float(kth)))
        yield out

    g = counts.map_batches(
        score, batch_size=None, batch_format="pyarrow"
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "bigram" not in t.schema.names:
            return
        big = np.asarray(t.column("bigram").to_pylist(), dtype=object)
        pmi = t.column("pmi").to_numpy(zero_copy_only=False)
        order = np.lexsort((big, -pmi))[:k]
        yield t.take(pa.array(order))

    return g.map_batches(finish, batch_size=None, batch_format="pyarrow")


BIGRAM_PMI_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
),
uni AS (SELECT unnest(lst) AS t FROM tok),
ucnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY t),
nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM ucnt),
big AS (
  SELECT u[1] AS a, u[2] AS b
  FROM tok, UNNEST(list_zip(lst[1:-1], lst[2:])) AS t(u)
  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL
),
bcnt AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM big GROUP BY a, b
),
nb AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM bcnt),
p AS (
  SELECT a || ' ' || b AS bigram, cnt,
    ROUND(LN((CAST(cnt AS DOUBLE) * nu.n) * nu.n
             / ((CAST(ua.c AS DOUBLE) * ub.c) * nb.n)), 6) AS pmi
  FROM bcnt JOIN ucnt ua ON bcnt.a = ua.t JOIN ucnt ub ON bcnt.b = ub.t,
       nu, nb
  WHERE cnt >= {BIGRAM_PMI_MIN_CNT}
)
SELECT bigram, cnt, pmi FROM p
QUALIFY ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) <= {BIGRAM_PMI_K}
"""


# --------------------------------------------------------------------------
# Keyword-in-context (concordance) extraction
# --------------------------------------------------------------------------


def keyword_contexts(sf_dir: str) -> ray.data.Dataset:
    """Concordance (KWIC) lines for the corpus's single most frequent
    token (count desc, token asc — a total order): every occurrence as
    (doc_id, term, pos, left_ctx, right_ctx) with up to two tokens of
    context either side, joined with single spaces.

    Scale shape: the term pick is the vocab-bounded unigram reduce
    (driver-folded, term broadcast into the extraction UDF as one
    string); extraction is BLOCK-LOCAL — positions come from pure
    offset arithmetic on the filtered token array, context tokens from
    four clipped vectorized takes, and doc boundaries from the repeated
    doc index — no shuffle at any scale.  Context strings are built
    with the same space-join rule the SQL's array_to_string applies."""
    from .shuffle import keyed_reagg

    def uni(t: pa.Table):
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        vals = arr.values.filter(pc.not_equal(arr.values, ""))
        if len(vals) == 0:
            return
        g = (
            pa.table({"tok": vals})
            .append_column("cnt", pa.array(np.ones(len(vals), np.int64)))
            .group_by(["tok"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["tok", "cnt"])

    ucnt = keyed_reagg(
        _read_docs(sf_dir).map_batches(uni, batch_format="pyarrow"),
        ["tok"], [("cnt", "sum")], P,
    ).take_all()  # vocab-bounded
    term = min(ucnt, key=lambda r: (-int(r["cnt"]), r["tok"]))["tok"]

    def extract(t: pa.Table):
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values
        doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        vals_k = vals.filter(pa.array(keep))
        doc_k = doc_idx[keep]
        n = len(vals_k)
        if n == 0:
            return
        newdoc = np.r_[True, doc_k[1:] != doc_k[:-1]]
        startidx = np.flatnonzero(newdoc)
        runlens = np.diff(np.r_[startidx, n])
        pos = np.arange(n) - np.repeat(startidx, runlens)
        doclen = np.repeat(runlens, runlens)
        j = np.flatnonzero(pc.equal(vals_k, term).to_numpy(zero_copy_only=False))
        if len(j) == 0:
            return
        p, dl = pos[j], doclen[j]
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[doc_k[j]]

        def tok_at(idx):
            return vals_k.take(pa.array(np.clip(idx, 0, n - 1)))

        l1, l2 = tok_at(j - 1), tok_at(j - 2)
        r1, r2 = tok_at(j + 1), tok_at(j + 2)
        left = pc.if_else(
            pa.array(p >= 2),
            pc.binary_join_element_wise(l2, l1, " "),
            pc.if_else(pa.array(p == 1), l1, pa.scalar("")),
        )
        rem = dl - p  # tokens from the match to end of doc, inclusive
        right = pc.if_else(
            pa.array(rem >= 3),
            pc.binary_join_element_wise(r1, r2, " "),
            pc.if_else(pa.array(rem == 2), r1, pa.scalar("")),
        )
        yield pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "term": pa.array([term] * len(j), pa.string()),
                "pos": pa.array(p, pa.int64()),
                "left_ctx": left,
                "right_ctx": right,
            }
        )

    return _read_docs(sf_dir).map_batches(extract, batch_format="pyarrow")


KEYWORD_CONTEXTS_SQL = r"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), term AS (
  SELECT u AS tok FROM tok, UNNEST(lst) AS t(u)
  GROUP BY u ORDER BY COUNT(*) DESC, u LIMIT 1
), m AS (
  SELECT doc_id, lst, CAST(u[2] AS BIGINT) AS pos
  FROM tok, UNNEST(list_zip(lst, range(len(lst)))) AS t(u)
  WHERE u[1] = (SELECT tok FROM term)
)
SELECT doc_id, (SELECT tok FROM term) AS term, pos,
  COALESCE(array_to_string(lst[GREATEST(pos - 1, 1) : pos], ' '), '') AS left_ctx,
  COALESCE(array_to_string(lst[pos + 2 : pos + 3], ' '), '') AS right_ctx
FROM m
"""


# --------------------------------------------------------------------------
# Corpus-unigram document scoring (quality-filter / perplexity-proxy stage)
# --------------------------------------------------------------------------

UNIGRAM_VOCAB_K = 16


def doc_unigram_rarity(
    sf_dir: str, vocab_k: int = UNIGRAM_VOCAB_K
) -> ray.data.Dataset:
    """Per-document corpus-unigram statistics — the quality-filter /
    perplexity-proxy stage of a training-data pipeline: documents made
    of globally common tokens score high ``commonness``; documents
    with many tokens outside the top-``vocab_k`` vocabulary score high
    ``oov_frac`` (the OOV-rate filter).

    Output: (doc_id, n_tok, oov_n, commonness, oov_frac) where
    ``commonness = (Σ_tokens cnt(tok)) / (n_tok · N)`` with cnt the
    corpus unigram count and N the corpus token total.

    Exactness: every aggregate is an int64 sum; the two doubles are
    each ONE division of exactly-representable integers (mirrored
    verbatim in SQL), so the hash match is independent of float
    summation order — the fixed-point-sum rule from relational.py.

    Scale shape: the unigram reduce is VOCAB-bounded (keyed_reagg →
    driver fold → broadcast, the bigram_pmi pattern); per-document
    scoring is then block-local with ZERO further shuffle, because a
    document is one parquet row and never splits across blocks.  The
    per-block python lookup iterates the block's REDUCED (doc, term)
    pairs (vocab·docs-bounded), never raw tokens.
    """
    from .shuffle import keyed_reagg

    def uni(t: pa.Table):
        if len(t) == 0:
            return
        docs, terms = _token_pairs(t)
        if len(docs) == 0:
            return
        g = (
            pa.table({"tok": terms})
            .append_column("cnt", pa.array(np.ones(len(docs), np.int64)))
            .group_by(["tok"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["tok", "cnt"])

    ucnt = keyed_reagg(
        _read_docs(sf_dir).map_batches(uni, batch_format="pyarrow"),
        ["tok"], [("cnt", "sum")], P,
    ).take_all()  # vocab-bounded
    cdict = {r["tok"]: int(r["cnt"]) for r in ucnt}
    n_total = float(sum(cdict.values()))  # exact: int total < 2^53
    vocab = {
        t
        for t, _ in sorted(cdict.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_k
        ]
    }

    def score(t: pa.Table):
        if len(t) == 0:
            return
        docs, terms = _token_pairs(t)
        if len(docs) == 0:
            return
        red = (
            pa.table({"doc_id": pa.array(docs), "term": terms})
            .append_column("tf", pa.array(np.ones(len(docs), np.int64)))
            .group_by(["doc_id", "term"])
            .aggregate([("tf", "sum")])
            .rename_columns(["doc_id", "term", "tf"])
        )
        terms_r = red.column("term").to_pylist()
        tf = red.column("tf").to_numpy(zero_copy_only=False)
        cnt = np.fromiter(
            (cdict[x] for x in terms_r), np.int64, len(terms_r)
        )
        oov = np.fromiter(
            (0 if x in vocab else 1 for x in terms_r), np.int64, len(terms_r)
        )
        per = (
            pa.table(
                {
                    "doc_id": red.column("doc_id"),
                    "n_tok": pa.array(tf),
                    "rar": pa.array(tf * cnt),
                    "oov_n": pa.array(tf * oov),
                }
            )
            .group_by(["doc_id"])
            .aggregate([("n_tok", "sum"), ("rar", "sum"), ("oov_n", "sum")])
            .rename_columns(["doc_id", "n_tok", "rar", "oov_n"])
        )
        n_tok = per.column("n_tok").to_numpy(zero_copy_only=False)
        rar = per.column("rar").to_numpy(zero_copy_only=False)
        oov_n = per.column("oov_n").to_numpy(zero_copy_only=False)
        # ONE division of exact integers each, mirrored verbatim in SQL
        commonness = rar.astype(np.float64) / (
            n_tok.astype(np.float64) * n_total
        )
        oov_frac = oov_n.astype(np.float64) / n_tok.astype(np.float64)
        yield pa.table(
            {
                "doc_id": per.column("doc_id"),
                "n_tok": per.column("n_tok"),
                "oov_n": per.column("oov_n"),
                "commonness": pa.array(commonness),
                "oov_frac": pa.array(oov_frac),
            }
        )

    return _read_docs(sf_dir).map_batches(score, batch_format="pyarrow")


DOC_UNIGRAM_RARITY_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS t
  FROM documents
),
cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
ntok AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt),
vocab AS (SELECT t FROM cnt ORDER BY c DESC, t LIMIT {UNIGRAM_VOCAB_K}),
per AS (
  SELECT k.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_tok,
    CAST(SUM(c.c) AS BIGINT) AS rar,
    CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_n
  FROM tok k JOIN cnt c ON k.t = c.t LEFT JOIN vocab v ON k.t = v.t
  GROUP BY k.doc_id
)
SELECT doc_id, n_tok, oov_n,
  CAST(rar AS DOUBLE) / (CAST(n_tok AS DOUBLE) * ntok.n) AS commonness,
  CAST(oov_n AS DOUBLE) / CAST(n_tok AS DOUBLE) AS oov_frac
FROM per, ntok
"""


# --------------------------------------------------------------------------
# Corpus-duplicate n-gram fraction (MassiveText/RefinedWeb boilerplate rule)
# --------------------------------------------------------------------------

DUP_NGRAM_N = 4
DUP_NGRAM_DF = 2
# span-dedup dup-hash-set broadcast guard (int64 keys; 64M ≈ 0.5 GB —
# ONE plasma copy per node): below it the dup membership test is a
# block-local sorted-array lookup with zero wide exchange, above it the
# bloom-gated partitioned semi join takes over
SPAN_DUP_BCAST_LIMIT = 64_000_000


def duplicate_ngram_fraction(
    sf_dir: str, n: int = DUP_NGRAM_N, min_df: int = DUP_NGRAM_DF
) -> ray.data.Dataset:
    """Per-document fraction of ``n``-gram positions whose gram occurs
    in ≥ ``min_df`` DISTINCT documents — the cross-corpus duplicated
    n-gram filter from the published web-corpus recipes (boilerplate /
    template detection; documents above a threshold get dropped).

    Output: (doc_id, n_pos, dup_pos, dup_frac); docs shorter than
    ``n`` tokens have no positions and are excluded on both sides;
    ``dup_frac`` is ONE division of exact int64 counts.

    Scale shape: per-block (doc, gram) position counts pre-combine
    with an in-block group_by ((doc, gram) block-distinct == global —
    a document is one row); gram document-frequency reduces from the
    already-distinct pair stream through one gram-keyed re-agg and the
    ≥ min_df survivors form the dup set (bounded by the duplicated
    vocabulary, far smaller than the corpus); membership is a semi
    join under the broadcast guard; per-doc totals are block-local.
    The raw gram stream is never materialized."""
    from .joins import join_auto
    from .shuffle import keyed_reagg

    def pair_counts(t: pa.Table):
        """(doc_id, gram, tf) position counts + (doc_id, n_pos) totals,
        marked by a side column so one scan feeds both consumers."""
        if len(t) == 0:
            return
        rows, gram = _gram_pairs(t, n)
        if rows is None:
            return
        docs = t.column("doc_id").to_numpy(zero_copy_only=False)[rows]
        g = (
            pa.table({"doc_id": pa.array(docs), "gram": gram})
            .append_column("tf", pa.array(np.ones(len(docs), np.int64)))
            .group_by(["doc_id", "gram"])
            .aggregate([("tf", "sum")])
        )
        yield g.rename_columns(["doc_id", "gram", "tf"])

    pairs = _read_docs(sf_dir).map_batches(
        pair_counts, batch_format="pyarrow"
    ).materialize()  # (doc, gram)-distinct rows; reused by df + totals

    def df_partial(t: pa.Table):
        if len(t) == 0 or "gram" not in t.schema.names:
            return
        g = (
            t.select(["gram"])
            .append_column("df", pa.array(np.ones(len(t), np.int64)))
            .group_by(["gram"])
            .aggregate([("df", "sum")])
        )
        yield g.rename_columns(["gram", "df"])

    dfs = keyed_reagg(
        pairs.map_batches(df_partial, batch_format="pyarrow"),
        ["gram"], [("df", "sum")], P,
    )

    def dup_only(t: pa.Table):
        if len(t) == 0 or "df" not in t.schema.names:
            return
        keep = t.filter(pc.greater_equal(t.column("df"), min_df))
        if len(keep) == 0:
            return
        yield keep.select(["gram"])

    dup = dfs.map_batches(dup_only, batch_format="pyarrow")

    def tot_partial(t: pa.Table):
        if len(t) == 0 or "tf" not in t.schema.names:
            return
        g = (
            t.select(["doc_id", "tf"])
            .group_by(["doc_id"])
            .aggregate([("tf", "sum")])
        )
        yield g.rename_columns(["doc_id", "n_pos"])

    totals = keyed_reagg(
        pairs.map_batches(tot_partial, batch_format="pyarrow"),
        ["doc_id"], [("n_pos", "sum")], P,
    )

    hit = join_auto(pairs, dup, on=("gram",), how="semi", num_partitions=P)

    def dup_partial(t: pa.Table):
        if len(t) == 0 or "tf" not in t.schema.names:
            return
        g = (
            t.select(["doc_id", "tf"])
            .group_by(["doc_id"])
            .aggregate([("tf", "sum")])
        )
        yield g.rename_columns(["doc_id", "dup_pos"])

    from .shuffle import materialize_cut as _mcut2

    # cut before the final join (the span_dedup_stats probe-barrier
    # lesson): an un-cut dup_pos would re-run the semi join + re-agg
    # for join_auto's broadcast probe and again for the join itself
    dup_pos = _mcut2(keyed_reagg(
        hit.map_batches(dup_partial, batch_format="pyarrow"),
        ["doc_id"], [("dup_pos", "sum")], P,
    ))

    joined = join_auto(
        totals, dup_pos, on=("doc_id",), how="left_outer", num_partitions=P
    )

    def finish(t: pa.Table):
        if len(t) == 0 or "n_pos" not in t.schema.names:
            return
        n_pos = t.column("n_pos").to_numpy(zero_copy_only=False)
        dp = (
            pc.fill_null(t.column("dup_pos"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        frac = dp.astype(np.float64) / n_pos.astype(np.float64)
        yield pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_pos": t.column("n_pos"),
                "dup_pos": pa.array(dp),
                "dup_frac": pa.array(frac),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


_DUP_PARTS = " || ' ' || ".join(f"u[{i + 1}]" for i in range(DUP_NGRAM_N))
_DUP_ZIPS = ", ".join(f"lst[{i + 1}:]" for i in range(DUP_NGRAM_N))

DUPLICATE_NGRAM_FRACTION_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), g AS (
  SELECT doc_id, {_DUP_PARTS} AS gram
  FROM tok, UNNEST(list_zip({_DUP_ZIPS})) AS t(u)
  WHERE u[{DUP_NGRAM_N}] IS NOT NULL
), tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos FROM g GROUP BY doc_id
), df AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
), dup AS (
  SELECT gram FROM df WHERE df >= {DUP_NGRAM_DF}
), d AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_pos
  FROM g SEMI JOIN dup USING (gram) GROUP BY doc_id
)
SELECT t.doc_id, t.n_pos,
  COALESCE(d.dup_pos, 0) AS dup_pos,
  CAST(COALESCE(d.dup_pos, 0) AS DOUBLE) / CAST(t.n_pos AS DOUBLE)
    AS dup_frac
FROM tot t LEFT JOIN d ON t.doc_id = d.doc_id
"""


# --------------------------------------------------------------------------
# BPE merge training rounds (tokenizer-training stage)
# --------------------------------------------------------------------------

BPE_ROUNDS = 3
BPE_SEP = "~"


def _bpe_apply_merge(vals: np.ndarray, docs: np.ndarray, a: str, b: str):
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    token pairs within each document — str.replace semantics on the
    space-joined stream (consecutive overlapping matches only occur
    when a == b; keeping even offsets within each run IS the greedy
    scan)."""
    if len(vals) < 2:
        return vals, docs
    m = (vals[:-1] == a) & (vals[1:] == b) & (docs[:-1] == docs[1:])
    idx = np.flatnonzero(m)
    if len(idx) == 0:
        return vals, docs
    run_start = np.r_[True, idx[1:] != idx[:-1] + 1]
    run_id = np.cumsum(run_start) - 1
    offset = idx - idx[run_start][run_id]
    keep = idx[offset % 2 == 0]
    out = vals.copy()
    out[keep] = a + BPE_SEP + b
    drop = np.zeros(len(vals), bool)
    drop[keep + 1] = True
    return out[~drop], docs[~drop]


def bpe_merges(sf_dir: str, rounds: int = BPE_ROUNDS) -> ray.data.Dataset:
    """The first ``rounds`` byte-pair-encoding merge rules learned from
    the corpus — the tokenizer-training stage of an LLM data pipeline.
    Each round counts every adjacent token pair (overlaps counted, the
    standard BPE statistic), picks the (count desc, a asc, b asc)
    maximum, and rewrites the corpus by greedy left-to-right
    non-overlapping replacement; merged tokens join with ``~``
    (assumes ``~`` absent from the raw vocabulary).

    Output: (round, a, b, cnt) — the chosen pair per round with its
    pre-merge count.

    Scale shape: each round is ONE corpus scan (earlier merges are
    REPLAYED per block instead of materializing a mutated corpus —
    rounds × scan beats corpus-sized state); pair counts pre-combine
    per block and reduce through one keyed re-agg (bigram-vocab
    bounded); the driver folds only per-block argmax partials, never
    the pair table.  SQL oracle: the merge rewrite is expressed as
    string replace() over a DOUBLE-SPACED token join — each token owns
    its delimiters, so leftmost-non-overlapping replace() is exactly
    the greedy token merge, and the pair pick is a scalar CTE the next
    round's rewrite cross-joins."""
    from .shuffle import keyed_reagg

    merges: list[tuple[str, str]] = []
    out_rows = []
    for r in range(1, rounds + 1):
        cur = list(merges)

        def count_pairs(t: pa.Table, _m=cur):
            if len(t) == 0:
                return
            docs, terms = _token_pairs(t)
            if len(docs) == 0:
                return
            vals = terms.to_numpy(zero_copy_only=False).astype(object)
            for a, b in _m:  # replay: ≤ rounds tiny vectorized passes
                vals, docs = _bpe_apply_merge(vals, docs, a, b)
            if len(vals) < 2:
                return
            adj = docs[1:] == docs[:-1]
            if not adj.any():
                return
            g = (
                pa.table(
                    {
                        "a": pa.array(vals[:-1][adj].tolist(), pa.string()),
                        "b": pa.array(vals[1:][adj].tolist(), pa.string()),
                        "cnt": pa.array(
                            np.ones(int(adj.sum()), np.int64)
                        ),
                    }
                )
                .group_by(["a", "b"])
                .aggregate([("cnt", "sum")])
            )
            yield g.rename_columns(["a", "b", "cnt"])

        reduced = keyed_reagg(
            _read_docs(sf_dir).map_batches(count_pairs, batch_format="pyarrow"),
            ["a", "b"], [("cnt", "sum")], P,
        )

        def local_max(t: pa.Table):
            if len(t) == 0 or "cnt" not in t.schema.names:
                return
            cnt = t.column("cnt").to_numpy(zero_copy_only=False)
            top = t.filter(pc.equal(t.column("cnt"), int(cnt.max())))
            rows = sorted(
                zip(
                    top.column("a").to_pylist(),
                    top.column("b").to_pylist(),
                    top.column("cnt").to_pylist(),
                )
            )
            a, b, c = rows[0]
            yield pa.table(
                {"a": [a], "b": [b], "cnt": pa.array([c], pa.int64())}
            )

        cands = reduced.map_batches(
            local_max, batch_size=None, batch_format="pyarrow"
        ).take_all()  # ≤ one row per reduce partition
        if not cands:
            break
        a, b, c = min(
            ((r_["a"], r_["b"], int(r_["cnt"])) for r_ in cands),
            key=lambda x: (-x[2], x[0], x[1]),
        )
        merges.append((a, b))
        out_rows.append((r, a, b, c))

    return ray.data.from_arrow(
        pa.table(
            {
                "round": pa.array([x[0] for x in out_rows], pa.int64()),
                "a": pa.array([x[1] for x in out_rows], pa.string()),
                "b": pa.array([x[2] for x in out_rows], pa.string()),
                "cnt": pa.array([x[3] for x in out_rows], pa.int64()),
            }
        )
    )


def bpe_merges_sql(rounds: int = BPE_ROUNDS) -> str:
    """Programmatic oracle: round r counts pairs of the round-(r-1)
    stream, picks (cnt desc, a, b) LIMIT 1, and rewrites via replace()
    on the double-spaced join (see bpe_merges docstring)."""
    ctes = [r"""
d0 AS (
  SELECT doc_id,
    ' ' || array_to_string(
      list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''),
      '  ') || ' ' AS s
  FROM documents
)"""]
    sels = []
    for r in range(1, rounds + 1):
        ctes.append(rf"""
p{r} AS (
  SELECT u[1] AS a, u[2] AS b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT list_filter(string_split_regex(trim(s), '\s+'), x -> x <> '')
      AS lst FROM d{r - 1}
  ), UNNEST(list_zip(lst[1:-1], lst[2:])) AS t(u)
  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL
  GROUP BY a, b
),
t{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
d{r} AS (
  SELECT d.doc_id,
    replace(d.s, ' ' || t.a || '  ' || t.b || ' ',
                 ' ' || t.a || '{BPE_SEP}' || t.b || ' ') AS s
  FROM d{r - 1} d CROSS JOIN t{r} t
)""")
        sels.append(
            f"SELECT CAST({r} AS BIGINT) AS round, a, b, cnt FROM t{r}"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(sels)


BPE_MERGES_SQL = bpe_merges_sql()


# --------------------------------------------------------------------------
# span-level dedup accounting: tokens covered by duplicated n-grams
# --------------------------------------------------------------------------


def _gram_pairs_pos(t: pa.Table, n: int):
    """(doc_id values, in-doc window position, n-gram string) for a
    block — _gram_pairs extended with the 0-based position of each
    window inside its document (flat index minus the document's first
    flat index; pure offset arithmetic, no per-row loop)."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
    )
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    vals = arr.values
    doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
    keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    vals_k = vals.filter(pa.array(keep))
    doc_k = doc_idx[keep]
    m = len(vals_k)
    if m < n:
        return None, None, None
    run_starts = np.flatnonzero(np.r_[True, doc_k[1:] != doc_k[:-1]])
    run_lens = np.diff(np.r_[run_starts, m])
    doc_start_flat = np.repeat(run_starts, run_lens)
    valid = doc_k[: m - n + 1] == doc_k[n - 1 :]
    if not valid.any():
        return None, None, None
    vm = pa.array(valid)
    parts = [vals_k.slice(i, m - n + 1).filter(vm) for i in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    flat = np.arange(m - n + 1)[valid]
    rows = doc_k[flat]
    pos = flat - doc_start_flat[flat]
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)[rows]
    return ids, pos.astype(np.int64), gram


def _hash_grams(gram) -> pa.Array:
    """int64 polars (seed 0) hash of a gram string array — gram
    IDENTITY for the span-dedup exchanges.  Shuffling 64-bit hashes
    instead of ~40-byte gram strings cuts the two heaviest exchanges
    of the chain ~3× in bytes (measured; BASELINE.md round 4).  Hash
    identity carries the standard birthday bound (~n²/2⁶⁵ expected
    collisions — ~10⁻⁴ at the 54M-gram bench corpus), the SAME
    semantics every minhash/shingle operator in this repo already
    uses for shingle identity; gram strings never appear in any
    output, so the driver-checked result is unchanged."""
    from . import polars_mod

    pl = polars_mod()
    g = gram.combine_chunks() if isinstance(gram, pa.ChunkedArray) else gram
    return pa.array(pl.from_arrow(g).hash(seed=0).to_numpy().view(np.int64))


def span_dedup_stats(
    sf_dir: str, n: int = DUP_NGRAM_N, min_df: int = DUP_NGRAM_DF
) -> ray.data.Dataset:
    """Span-level dedup accounting (the passage-dedup recipe of
    "Deduplicating Training Data Makes Language Models Better", public
    arXiv 2107.06499): per document, how many TOKENS are covered by
    the union of windows [p, p+n) whose n-gram occurs in ≥ ``min_df``
    distinct documents.  Output (doc_id, n_tokens, covered_tokens,
    covered_frac); docs shorter than n tokens are excluded both sides
    (they have no windows), so n_tokens = n_pos + n − 1 exactly.

    Scale shape (restructured r4): gram identity is a 64-bit polars
    hash (:func:`_hash_grams` — strings never shuffle); pass 1 folds
    (gh, df) partials straight out of the scan (block-distinct
    (doc, gh) IS global distinct) into ONE gram-keyed re-agg; per-doc
    totals are block-local with ZERO exchange (n_pos = tokens − n + 1);
    pass 2 re-scans with positions and tests dup membership against
    the broadcast sorted dup-hash array (block-local searchsorted, no
    exchange) under ``SPAN_DUP_BCAST_LIMIT``, falling back to the
    bloom-gated partitioned semi join above it; ONE doc-keyed
    repartition of bare (doc_id, pos) int rows co-locates a document's
    surviving positions for the vectorized island kernel (sort +
    gap>n−1 breaks).  Exchanges: 2 keyed + the final join (pre-r4: 4
    keyed incl. a 65M-row string shuffle + a 65M-row materialize).
    Interval union is exact: islands are separated by gaps ≥ n, so
    island [s, e] contributes e − s + n non-overlapping tokens."""
    from . import dyn_partitions
    from .joins import join_auto
    from .shuffle import keyed_reagg

    # Session-scaled partition count (shadows the testdata-scale module
    # P): a 3-wide-op chain at a pinned 8 partitions leaves 3/4 of a
    # 32-CPU session idle through every exchange (round-2
    # spandedup_scaling_320k = 0.466).
    P = dyn_partitions()

    def df_block(t: pa.Table):
        """Per-block (gh, df) partials in ONE pass: block-local
        distinct (doc, gh) IS global distinct (a document is one
        parquet row), so the per-gram distinct-doc count can fold
        straight out of the scan — the pre-r4 chain materialized a
        65M-row (doc, gh, tf) intermediate just to re-derive this."""
        if len(t) == 0:
            return
        rows, gram = _gram_pairs(t, n)
        if rows is None:
            return
        docs = t.column("doc_id").to_numpy(zero_copy_only=False)[rows]
        dd = (
            pa.table({"doc_id": pa.array(docs), "gh": _hash_grams(gram)})
            .group_by(["doc_id", "gh"])
            .aggregate([])
        )
        g = (
            dd.select(["gh"])
            .append_column("df", pa.array(np.ones(len(dd), np.int64)))
            .group_by(["gh"])
            .aggregate([("df", "sum")])
        )
        yield g.rename_columns(["gh", "df"])

    from .shuffle import materialize_cut as _mcut

    # materialized ONCE: feeds the dup derivation AND the bloom
    # selectivity gate's total-gram count without re-running the reduce
    dfs = _mcut(keyed_reagg(
        _read_docs(sf_dir).map_batches(df_block, batch_format="pyarrow"),
        ["gh"], [("df", "sum")], P,
    ))

    def dup_only(t: pa.Table):
        if len(t) == 0 or "df" not in t.schema.names:
            return
        keep = t.filter(pc.greater_equal(t.column("df"), min_df))
        if len(keep):
            yield keep.select(["gh"])

    dup = dfs.map_batches(dup_only, batch_format="pyarrow")

    def tot_block(t: pa.Table):
        """(doc_id, n_pos) with ZERO exchange: n_pos = window count =
        token count − n + 1 per doc, computable block-locally because a
        document never splits across blocks; docs shorter than n tokens
        are excluded (no windows), matching the pre-r4 reduce exactly.
        No gram build, no hash — the cheapest of the three scans."""
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        )
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
        keep = pc.not_equal(arr.values, "").to_numpy(zero_copy_only=False)
        cnt = np.bincount(doc_idx[keep], minlength=len(arr))
        m = cnt >= n
        if not m.any():
            return
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[m]
        yield pa.table(
            {
                "doc_id": pa.array(ids),
                "n_pos": pa.array((cnt[m] - n + 1).astype(np.int64)),
            }
        )

    totals = _read_docs(sf_dir).map_batches(tot_block, batch_format="pyarrow")

    def positions(t: pa.Table):
        if len(t) == 0:
            return
        ids, pos, gram = _gram_pairs_pos(t, n)
        if ids is None:
            return
        yield pa.table(
            {
                "doc_id": pa.array(ids),
                "pos": pa.array(pos),
                "gh": _hash_grams(gram),
            }
        )

    pos_stream = _read_docs(sf_dir).map_batches(positions, batch_format="pyarrow")
    from .joins import (BROADCAST_JOIN_LIMIT, bloom_bits, bloom_prefilter,
                        broadcast_semi_filter)
    from .shuffle import materialize_cut

    dup = materialize_cut(dup)
    n_dup = dup.count()
    # dup membership is a KEY-SET lookup, not a general join: while the
    # dup-hash set fits SPAN_DUP_BCAST_LIMIT int64s (~0.5 GB plasma at
    # the cap — ONE shared copy per node), ship the sorted array once
    # and filter block-locally (searchsorted) with ZERO wide exchange —
    # the same broadcast-sorted-lookup regime as the jaccard blob
    # verify.  Above the guard, fall back to the bloom-gated
    # partitioned semi join (r2 VERDICT #4).
    if n_dup <= SPAN_DUP_BCAST_LIMIT:
        from .joins import sorted_keys_ref

        # sorted key array assembled in a remote task straight from
        # the block refs — never round-trips through the driver
        hits = broadcast_semi_filter(
            pos_stream, sorted_keys_ref(dup, "gh"), "gh", True
        )
    else:
        n_grams = dfs.count()
        # selectivity gate: a Bloom filter only pays when it can PRUNE
        # — if most grams are duplicated (boilerplate-heavy corpora),
        # nearly every position passes and the probe pass is pure
        # overhead, so skip it.  Gram-fraction UNDERestimates
        # position-fraction (positions skew toward high-df grams), so
        # a high gram-fraction is a safe skip signal.
        if n_dup * 2 < n_grams:
            # gram identity is ALREADY the polars hash — the bloom
            # probe keys on the gh column directly
            bits_ref, m, k = bloom_bits(dup, "gh", n_dup)
            pos_stream = bloom_prefilter(pos_stream, "gh", bits_ref, m, k)
        hits = join_auto(
            pos_stream, dup, on=("gh",), how="semi", num_partitions=P
        )
    # islands needs only (doc_id, pos): dropping gh before the
    # doc-keyed exchange cuts its shuffled bytes ~2x
    co = hits.drop_columns(["gh"]).repartition(P, keys=["doc_id"])

    def islands(t: pa.Table):
        if t.num_rows == 0 or "pos" not in t.schema.names:
            return
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        p = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        brk = np.r_[True, (d[1:] != d[:-1]) | (p[1:] - p[:-1] > n - 1)]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(d)] - 1
        cover = (p[ends] - p[starts] + n).astype(np.int64)
        g = (
            pa.table({"doc_id": pa.array(d[starts]), "covered": pa.array(cover)})
            .group_by(["doc_id"])
            .aggregate([("covered", "sum")])
        )
        yield g.rename_columns(["doc_id", "covered"])

    # CUT before the final join: join_auto's broadcast probe hits the
    # repartition barrier (limit cannot stream past it), so an un-cut
    # covered would execute the scan→filter→repartition→islands chain
    # up to THREE times (probe, then the join's own consumption of
    # both plans).  Measured at 5.12M docs / 8 CPUs: the whole query
    # 998 s un-cut vs ~330 s cut.  covered is ≤ n_docs rows — the cut
    # is cheap by construction.
    covered = materialize_cut(
        co.map_batches(islands, batch_size=None, batch_format="pyarrow")
    )
    joined = join_auto(
        totals, covered, on=("doc_id",), how="left_outer", num_partitions=P
    )

    def finish(t: pa.Table):
        if len(t) == 0 or "n_pos" not in t.schema.names:
            return
        n_tok = pc.add(t.column("n_pos"), n - 1)
        cov = (
            pc.fill_null(t.column("covered"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        nt = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
        yield pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(nt),
                "covered_tokens": pa.array(cov),
                "covered_frac": pa.array(
                    cov.astype(np.float64) / nt.astype(np.float64)
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


_SPAN_PARTS = " || ' ' || ".join(f"u[{i + 1}]" for i in range(DUP_NGRAM_N))
_SPAN_ZIPS = ", ".join(f"lst[{i + 1}:]" for i in range(DUP_NGRAM_N))

# ORACLE-CLASS NOTE (r4 ADVICE): this SQL groups EXACT gram strings
# while the Ray side's gram identity is the 64-bit polars hash
# (_hash_grams) — the match is therefore probabilistic, not
# structural: a hash collision between a below-min_df gram and any
# other gram could inflate its df past min_df and flip covered
# positions.  Accepted bound: ~n²/2⁶⁵ expected collisions (~1e-4 at
# the 54M-gram bench corpus; ~1e-9 at the sf0.01 driver gate) — the
# same birthday-bound trade every shingle-identity operator in this
# repo already makes.  If this query ever flakes at a much larger
# corpus, diagnose it as this documented trade, not a regression.
SPAN_DEDUP_STATS_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), g AS (
  SELECT doc_id, {_SPAN_PARTS} AS gram, pos
  FROM (
    SELECT doc_id,
      UNNEST(list_zip({_SPAN_ZIPS})) AS u,
      UNNEST(range(len(lst))) AS pos
    FROM tok
  )
  WHERE u[{DUP_NGRAM_N}] IS NOT NULL
), tot AS (
  SELECT doc_id, CAST(COUNT(*) + {DUP_NGRAM_N} - 1 AS BIGINT) AS n_tokens
  FROM g GROUP BY doc_id
), df AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
), dup AS (SELECT gram FROM df WHERE df >= {DUP_NGRAM_DF}),
dg AS (SELECT doc_id, pos FROM g SEMI JOIN dup USING (gram)),
r AS (
  SELECT doc_id, pos,
    CASE WHEN LAG(pos) OVER w IS NULL
           OR pos - LAG(pos) OVER w > {DUP_NGRAM_N} - 1
         THEN 1 ELSE 0 END AS brk
  FROM dg WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
i AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS isl
  FROM r
),
c1 AS (
  SELECT doc_id, isl, MAX(pos) - MIN(pos) + {DUP_NGRAM_N} AS c
  FROM i GROUP BY doc_id, isl
),
cov AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS covered FROM c1 GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens,
  COALESCE(cov.covered, CAST(0 AS BIGINT)) AS covered_tokens,
  CAST(COALESCE(cov.covered, 0) AS DOUBLE) / CAST(t.n_tokens AS DOUBLE)
    AS covered_frac
FROM tot t LEFT JOIN cov ON t.doc_id = cov.doc_id
"""


NOVELTY_BUCKET = 50


def ngram_novelty(sf_dir: str, n: int = DUP_NGRAM_N) -> ray.data.Dataset:
    """(bucket, new_grams) vocabulary-growth curve: how many DISTINCT
    n-grams appear for the FIRST time in each ``NOVELTY_BUCKET``-doc
    slab of the corpus (first occurrence = min doc_id) — the
    diminishing-novelty diagnostic used to decide when more crawl data
    stops adding content.  Scale shape: block-local (gram, min-doc)
    partials (min-of-mins exact), ONE gram-keyed re-agg (bounded by
    the distinct-gram vocabulary), then ≤ buckets-per-block partials
    fold through a tiny re-agg.  All int64."""
    from .shuffle import keyed_reagg

    def pre(t: pa.Table):
        if len(t) == 0:
            return
        rows, gram = _gram_pairs(t, n)
        if rows is None:
            return
        docs = t.column("doc_id").to_numpy(zero_copy_only=False)[rows]
        g = (
            pa.table({"gram": gram, "fd": pa.array(docs)})
            .group_by(["gram"])
            .aggregate([("fd", "min")])
        )
        yield g.rename_columns(["gram", "fd"])

    firsts = keyed_reagg(
        _read_docs(sf_dir).map_batches(pre, batch_format="pyarrow"),
        ["gram"], [("fd", "min")], P,
    )

    def buckets(t: pa.Table):
        if t.num_rows == 0 or "fd" not in t.schema.names:
            return
        b = t.column("fd").to_numpy(zero_copy_only=False) // NOVELTY_BUCKET
        g = (
            pa.table(
                {
                    "bucket": pa.array(b.astype(np.int64)),
                    "new_grams": pa.array(np.ones(len(b), np.int64)),
                }
            )
            .group_by(["bucket"])
            .aggregate([("new_grams", "sum")])
        )
        yield g.rename_columns(["bucket", "new_grams"])

    return keyed_reagg(
        firsts.map_batches(buckets, batch_format="pyarrow"),
        ["bucket"], [("new_grams", "sum")], 4,
    )


_NOV_PARTS = " || ' ' || ".join(f"u[{i + 1}]" for i in range(DUP_NGRAM_N))
_NOV_ZIPS = ", ".join(f"lst[{i + 1}:]" for i in range(DUP_NGRAM_N))

NGRAM_NOVELTY_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
), g AS (
  SELECT doc_id, {_NOV_PARTS} AS gram
  FROM tok, UNNEST(list_zip({_NOV_ZIPS})) AS t(u)
  WHERE u[{DUP_NGRAM_N}] IS NOT NULL
), f AS (SELECT gram, MIN(doc_id) AS fd FROM g GROUP BY gram)
SELECT fd // {NOVELTY_BUCKET} AS bucket,
  CAST(COUNT(*) AS BIGINT) AS new_grams
FROM f GROUP BY 1
"""


# ---------------------------------------------------------------------------
# fixed-vocabulary OOV rate by language
# ---------------------------------------------------------------------------

OOV_VOCAB_K = 16


COVERAGE_KS = (1, 2, 4, 8, 16, 32)


def vocab_coverage_curve(sf_dir: str) -> ray.data.Dataset:
    """(k, covered_tokens, total_tokens, frac) — corpus token-mass
    coverage of the top-k unigram vocabulary for each pinned k (the
    vocab-sizing audit that picks a tokenizer vocabulary: how much of
    the stream the k most frequent types absorb).  Vocab rank is the
    (count desc, term asc) total order shared with vocab_oov_rate;
    ``frac`` is ONE double division mirrored in SQL.

    Scale shape: the standard vocab-bounded unigram reduce (block
    partials + one keyed re-agg), then a single-block rank/cumsum over
    the ≤|vocab| table — the curve never touches corpus rows after
    the first pass."""
    from .shuffle import keyed_reagg

    def uni(t: pa.Table):
        if len(t) == 0:
            return
        _, toks = _token_pairs(t)
        if len(toks) == 0:
            return
        g = (
            pa.table({"tok": toks})
            .append_column("cnt", pa.array(np.ones(len(toks), np.int64)))
            .group_by(["tok"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["tok", "cnt"])

    ucnt = keyed_reagg(
        _read_docs(sf_dir).map_batches(uni, batch_format="pyarrow"),
        ["tok"], [("cnt", "sum")], P,
    ).repartition(1)

    def finish(t: pa.Table):
        if t.num_rows == 0 or "cnt" not in t.schema.names:
            return
        toks = np.asarray(t.column("tok").to_pylist(), dtype=object)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -cnt))
        cs = np.cumsum(cnt[order])
        total = int(cs[-1])
        ks = np.asarray(COVERAGE_KS, np.int64)
        cov = cs[np.minimum(ks, len(cs)) - 1].astype(np.int64)
        yield pa.table(
            {
                "k": pa.array(ks),
                "covered_tokens": pa.array(cov),
                "total_tokens": pa.array(np.full(len(ks), total, np.int64)),
                "frac": pa.array(cov.astype(np.float64) / float(total)),
            }
        )

    return ucnt.map_batches(finish, batch_size=None, batch_format="pyarrow")


VOCAB_COVERAGE_SQL = rf"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '')) AS t
  FROM documents
),
ucnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
rk AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rn FROM ucnt
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM ucnt),
ks AS (SELECT UNNEST({list(COVERAGE_KS)}) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
  CAST(SUM(rk.c) AS BIGINT) AS covered_tokens,
  tot.total AS total_tokens,
  CAST(CAST(SUM(rk.c) AS BIGINT) AS DOUBLE) / CAST(tot.total AS DOUBLE)
    AS frac
FROM ks JOIN rk ON rk.rn <= ks.k, tot
GROUP BY ks.k, tot.total
"""


def vocab_oov_rate(sf_dir: str) -> ray.data.Dataset:
    """(lang, tokens, oov_tokens, oov_rate) — out-of-vocabulary token
    fraction per language against the corpus's own top-``OOV_VOCAB_K``
    unigram vocabulary (rank by count desc, term asc — a total order,
    so the vocab is deterministic on both sides): the coverage audit
    run before fixing a tokenizer vocabulary for training.

    Scale shape: the vocab build is the standard vocab-bounded reduce
    (block-local term partials → one keyed re-agg → a ≤|vocab| table
    picked ONCE on the driver and closed over — the bigram_pmi
    broadcast rule); the scoring pass is block-local ``is_in`` with
    per-lang integer partials and a |langs|-bounded final re-agg; the
    rate is ONE double division mirrored in the oracle."""
    from .shuffle import keyed_reagg

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def term_partial(t: pa.Table):
        if len(t) == 0:
            return
        _, terms = _token_pairs(t)
        if len(terms) == 0:
            return
        g = (
            pa.table({"term": terms, "n": pa.array(np.ones(len(terms), np.int64))})
            .group_by(["term"])
            .aggregate([("n", "sum")])
        )
        yield g.rename_columns(["term", "n"])

    counts = keyed_reagg(
        docs.map_batches(term_partial, batch_format="pyarrow"),
        ["term"], [("n", "sum")], P,
    ).take_all()  # vocab-bounded: ≤ distinct-terms rows
    ranked = sorted(counts, key=lambda r: (-r["n"], r["term"]))
    vocab = pa.array([r["term"] for r in ranked[:OOV_VOCAB_K]], pa.string())

    def score(t: pa.Table):
        if len(t) == 0 or "lang" not in t.schema.names:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        langs = np.repeat(
            np.asarray(t.column("lang").to_pylist(), dtype=object), lens
        )
        terms = arr.values
        keep = pc.not_equal(terms, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return
        langs = langs[keep]
        inv = pc.is_in(terms.filter(pa.array(keep)), value_set=vocab)
        oov = (~inv.to_numpy(zero_copy_only=False)).astype(np.int64)
        g = (
            pa.table(
                {
                    "lang": pa.array(langs.tolist(), pa.string()),
                    "tokens": pa.array(np.ones(len(langs), np.int64)),
                    "oov_tokens": pa.array(oov),
                }
            )
            .group_by(["lang"])
            .aggregate([("tokens", "sum"), ("oov_tokens", "sum")])
        )
        yield g.rename_columns(["lang", "tokens", "oov_tokens"])

    agg = keyed_reagg(
        docs.map_batches(score, batch_format="pyarrow"),
        ["lang"], [("tokens", "sum"), ("oov_tokens", "sum")], 4,
    )

    def fin(t: pa.Table):
        if t.num_rows == 0 or "tokens" not in t.schema.names:
            return
        tok = t.column("tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        ov = t.column("oov_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        yield t.append_column("oov_rate", pa.array(ov / tok, pa.float64()))

    return agg.map_batches(fin, batch_size=None, batch_format="pyarrow")


VOCAB_OOV_RATE_SQL = rf"""
WITH tok AS (
  SELECT lang,
    unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS term
  FROM documents
),
cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY term),
voc AS (SELECT term FROM cnt ORDER BY n DESC, term LIMIT {OOV_VOCAB_K})
SELECT lang, CAST(COUNT(*) AS BIGINT) AS tokens,
  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS oov_tokens,
  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM tok LEFT JOIN voc v USING (term) GROUP BY lang
"""


# --------------------------------------------------------------------------
# BM25 ranked retrieval: score every document against the corpus'
# top-DF query terms, return the global top-k
# --------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QN = 3   # query = the BM25_QN highest-DF terms (df desc, term asc)
BM25_K = 10   # result size


def bm25_topk(sf_dir: str, k: int = BM25_K) -> ray.data.Dataset:
    """(doc_id, score, rn) — the ``k`` best documents under BM25
    (Lucene idf form, k1=1.2, b=0.75) for the deterministic query =
    the corpus' :data:`BM25_QN` highest-DF terms — the ranked-retrieval
    stage a search engine runs over the inverted index.

    Float contract (how the hash match against DuckDB is exact): the
    per-term contribution ``idf·(tf·(k1+1))/(tf + k1·((1-b) +
    b·(dl/avgdl)))`` is written with the SAME literal constants and the
    SAME association on both sides, the query-term sum is the explicit
    left-associated ``(c1+c2)+c3`` (never an unordered SUM()), and the
    ranking key is the ROUNDED score so ulp noise cannot flip the
    boundary (the tfidf_top_terms rule).

    Scale shape: ONE tokenization pass (TF materialized once, DF and
    the query pick derive from the reduced table), the per-doc fold is
    block-local partials + one keyed re-agg on doc_id shuffling only
    (doc_id, dl, tf1..tfQN) int rows, and the global top-k is the
    block-local pre-truncate → single-block merge (O(blocks·k) rows
    cross the wire, never a full sort)."""
    from .shuffle import keyed_reagg

    tf = term_frequencies(sf_dir).materialize()
    dfq = _doc_freq(tf)
    qrows = (
        dfq.sort(["df", "term"], descending=[True, False])
        .limit(BM25_QN)
        .take_all()
    )
    qterms = [r["term"] for r in qrows]
    qdfs = [int(r["df"]) for r in qrows]
    n_docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()
    total_tokens = int(tf.sum("tf"))
    avgdl = total_tokens / float(n_docs)
    idfs = [
        float(np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))) for d in qdfs
    ]

    def fold(t: pa.Table):
        if t.num_rows == 0 or "tf" not in t.schema.names:
            return
        tfv = t.column("tf")
        cols = {"doc_id": t.column("doc_id"), "dl": tfv}
        for i, q in enumerate(qterms):
            m = pc.cast(pc.equal(t.column("term"), q), pa.int64())
            cols[f"tf{i + 1}"] = pc.multiply(tfv, m)
        blk = pa.table(cols)
        g = blk.group_by(["doc_id"]).aggregate(
            [("dl", "sum")] + [(f"tf{i + 1}", "sum") for i in range(len(qterms))]
        )
        yield g.rename_columns(
            ["doc_id", "dl"] + [f"tf{i + 1}" for i in range(len(qterms))]
        )

    per_doc = keyed_reagg(
        tf.map_batches(fold, batch_format="pyarrow"),
        ["doc_id"],
        [("dl", "sum")] + [(f"tf{i + 1}", "sum") for i in range(len(qterms))],
        P,
    )

    def score(t: pa.Table):
        if t.num_rows == 0 or "dl" not in t.schema.names:
            return
        tfs = [
            t.column(f"tf{i + 1}").to_numpy(zero_copy_only=False)
            for i in range(len(qterms))
        ]
        hit = tfs[0] > 0
        for a in tfs[1:]:
            hit = hit | (a > 0)
        if not hit.any():
            return
        dl = t.column("dl").to_numpy(zero_copy_only=False)[hit].astype(
            np.float64
        )
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
        s = np.zeros(len(dl), np.float64)
        for i, a in enumerate(tfs):
            tfi = a[hit].astype(np.float64)
            s = s + idfs[i] * (tfi * (BM25_K1 + 1.0)) / (tfi + norm)
        yield pa.table(
            {
                "doc_id": pc.array_filter(t.column("doc_id"), pa.array(hit)),
                "score": pa.array(np.round(s, 6), pa.float64()),
            }
        )

    def topk(t: pa.Table):
        if t.num_rows == 0 or "score" not in t.schema.names:
            return
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("score").to_numpy(zero_copy_only=False)
        keep = np.lexsort((d, -s))[:k]
        yield t.take(pa.array(keep))

    pre = per_doc.map_batches(score, batch_format="pyarrow").map_batches(
        topk, batch_format="pyarrow"
    )
    merged = pre.repartition(1).map_batches(
        topk, batch_size=None, batch_format="pyarrow"
    )

    def rank(t: pa.Table):
        if t.num_rows == 0 or "score" not in t.schema.names:
            return
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -s))
        out = t.take(pa.array(order))
        yield out.append_column(
            "rn", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return merged.map_batches(rank, batch_size=None, batch_format="pyarrow")


BM25_TOPK_SQL = (
    "WITH " + _TOK_CTE + f""",
qt AS (
  SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rnk
  FROM dfq QUALIFY rnk <= {BM25_QN}
),
nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
avq AS (
  SELECT CAST((SELECT SUM(tf) FROM tfq) AS DOUBLE)
       / CAST((SELECT n FROM nq) AS DOUBLE) AS avgdl
),
piv AS (
  SELECT t.doc_id,
    CAST(SUM(t.tf) AS BIGINT) AS dl,
    {", ".join(f"CAST(COALESCE(SUM(CASE WHEN q.rnk = {i + 1} THEN t.tf END), 0) AS BIGINT) AS tf{i + 1}" for i in range(BM25_QN))}
  FROM tfq t LEFT JOIN qt q USING (term)
  GROUP BY t.doc_id
  HAVING {" + ".join(f"tf{i + 1}" for i in range(BM25_QN))} > 0
),
idf AS (
  SELECT rnk,
    ln(1.0 + (CAST((SELECT n FROM nq) AS DOUBLE) - df + 0.5) / (df + 0.5))
      AS v
  FROM qt
),
sc AS (
  SELECT doc_id,
    ROUND({" + ".join(
        f"(SELECT v FROM idf WHERE rnk = {i + 1})"
        f" * (CAST(tf{i + 1} AS DOUBLE) * (1.2 + 1.0))"
        f" / (CAST(tf{i + 1} AS DOUBLE)"
        f" + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / (SELECT avgdl FROM avq))))"
        for i in range(BM25_QN)
    )}, 6) AS score
  FROM piv
)
SELECT doc_id, score,
  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rn
FROM sc ORDER BY score DESC, doc_id LIMIT {BM25_K}
"""
)


# --------------------------------------------------------------------------
# Zipf rank-frequency slope: the corpus-health diagnostic
# --------------------------------------------------------------------------

ZIPF_Q = 1_000_000_000.0  # quantization for order-free integer sums


def zipf_slope(sf_dir: str) -> ray.data.Dataset:
    """(vocab_size, slope) — least-squares slope of ln(count) against
    ln(rank) over the full vocabulary (rank = (count desc, term asc),
    a total order) — the Zipf-fit diagnostic run before trusting a
    corpus' token distribution.

    Float contract: each per-term product (x, y, x², xy of the ln
    values) is quantized ``floor(v·1e9)`` to int64 BEFORE summing, so
    every Σ is an ORDER-FREE integer sum (DuckDB's unordered SUM and
    numpy's reduce meet bit-identically); only the final closed-form
    slope divides back to float, with the same expression tree on both
    sides.  floor (not round) because numpy rounds half-even while SQL
    rounds half-away.

    Scale shape: token counts reduce via block partials + one keyed
    re-agg; the ranking and the quantized fold run on the REDUCED
    vocabulary table coalesced to one block (vocab-bounded — the
    bigram_pmi contract, never corpus rows)."""
    from .shuffle import keyed_reagg

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        _docs, terms = _token_pairs(t)
        if len(terms) == 0:
            return
        blk = pa.table(
            {"term": terms, "n": pa.array(np.ones(len(terms), np.int64))}
        )
        yield blk.group_by(["term"]).aggregate([("n", "sum")]).rename_columns(
            ["term", "n"]
        )

    cnt = keyed_reagg(
        _read_docs(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["term"], [("n", "sum")], P,
    )

    def fit(t: pa.Table):
        if t.num_rows == 0 or "n" not in t.schema.names:
            return
        n = t.column("n").to_numpy(zero_copy_only=False)
        term = np.asarray(t.column("term").to_pylist(), dtype=object)
        order = np.lexsort((term, -n))
        ns = n[order].astype(np.float64)
        rnk = np.arange(1, len(ns) + 1, dtype=np.float64)
        x, y = np.log(rnk), np.log(ns)
        qx = np.floor(x * ZIPF_Q)
        qy = np.floor(y * ZIPF_Q)
        qxx = np.floor(x * x * ZIPF_Q)
        qxy = np.floor(x * y * ZIPF_Q)
        sx, sy, sxx, sxy = (
            sum(int(v) for v in q) for q in (qx, qy, qxx, qxy)
        )
        v = float(len(ns))
        slope = (v * (sxy / ZIPF_Q) - (sx / ZIPF_Q) * (sy / ZIPF_Q)) / (
            v * (sxx / ZIPF_Q) - (sx / ZIPF_Q) * (sx / ZIPF_Q)
        )
        yield pa.table(
            {
                "vocab_size": pa.array([len(ns)], pa.int64()),
                "slope": pa.array([slope], pa.float64()),
            }
        )

    return cnt.repartition(1).map_batches(
        fit, batch_size=None, batch_format="pyarrow"
    )


ZIPF_SLOPE_SQL = r"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
),
cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY term),
r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rnk FROM cnt
),
q AS (
  SELECT
    CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * 1000000000.0) AS BIGINT) AS qx,
    CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000000.0) AS BIGINT) AS qy,
    CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS qxx,
    CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * ln(CAST(n AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS qxy
  FROM r
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v,
    SUM(qx) AS sx, SUM(qy) AS sy, SUM(qxx) AS sxx, SUM(qxy) AS sxy
  FROM q
)
SELECT v AS vocab_size,
  (CAST(v AS DOUBLE) * (sxy / 1000000000.0)
     - (sx / 1000000000.0) * (sy / 1000000000.0))
  / (CAST(v AS DOUBLE) * (sxx / 1000000000.0)
     - (sx / 1000000000.0) * (sx / 1000000000.0)) AS slope
FROM s
"""


SHARED_NGRAM_NMAX = 12  # longest gram length probed (pinned)


def shared_ngram_lengths(sf_dir: str) -> pa.Table:
    """(n, dup_grams) for n = 1..``SHARED_NGRAM_NMAX``: how many
    DISTINCT word n-grams occur in ≥ 2 distinct documents — the
    cross-document duplicated-substring length profile (the max n with
    dup_grams > 0 is the longest shared token span, the quantity a
    suffix-array substring-dedup pass would chase; Lee et al. 2022
    deduplicate at 50 tokens — this measures where THIS corpus sits).

    Gram identity is the chained splitmix hash over 1-based alphabetic
    token ranks (the exact-minhash shingle rule generalized to length
    n): z₁ = tid₀, z_k = sm64(z_{k-1}) ⊕ tid_{k-1}, h = sm64(z_n) —
    both sides compare the SAME hashes, so the SQL recursive-CTE
    oracle (one recursion over gram LENGTH, not document position)
    matches exactly.

    "≥ 2 distinct docs" folds as min(doc) < max(doc) per (n, gram) —
    an abelian pair of aggregates, no distinct-count needed (a doc is
    one parquet row, so per-doc gram dedup is block-local).

    Scale shape: ONE corpus pass emits Σ_n per-position hashes
    (NMAX × tokens rows) through ONE keyed reduce; the per-n counts
    are NMAX-bounded.  At open-ended NMAX a doubling search over n
    (O(log L) passes) replaces the pinned profile."""
    from .shuffle import keyed_reagg
    from .sketch import splitmix64
    from .text import _sorted_vocab

    vocab = _sorted_vocab(sf_dir)
    nmax = SHARED_NGRAM_NMAX

    def grams(t: pa.Table):
        docs, terms = _token_pairs(t)
        if len(docs) == 0:
            return
        tid = (
            np.searchsorted(vocab, terms.to_numpy(zero_copy_only=False)) + 1
        ).astype(np.uint64)
        L = len(tid)
        parts = []
        cur = tid  # pre-final chain value, start positions 0..L-1
        valid = np.ones(L, bool)
        for n in range(1, nmax + 1):
            if n > 1:
                if len(cur) <= 1:
                    break
                s = len(cur) - 1
                cur = splitmix64(cur[:-1]) ^ tid[n - 1 :]
                valid = valid[:-1] & (docs[n - 1 :] == docs[:s])
            if not valid.any():
                break
            h = splitmix64(cur[valid]).view(np.int64)
            dd = docs[: len(cur)][valid]
            g = (
                pa.table(
                    {
                        "n": pa.array(np.full(len(h), n, np.int64)),
                        "g": pa.array(h),
                        "mn": pa.array(dd),
                        "mx": pa.array(dd),
                    }
                )
                .group_by(["n", "g"])
                .aggregate([("mn", "min"), ("mx", "max")])
            )
            parts.append(g.rename_columns(["n", "g", "mn", "mx"]))
        if parts:
            yield pa.concat_tables(parts)

    red = keyed_reagg(
        _read_docs(sf_dir).map_batches(grams, batch_format="pyarrow"),
        ["n", "g"],
        [("mn", "min"), ("mx", "max")],
        8,
    )

    def pcnt(t: pa.Table):
        if t.num_rows == 0 or "mn" not in t.schema.names:
            return
        keep = t.filter(pc.less(t.column("mn"), t.column("mx")))
        if keep.num_rows == 0:
            return
        g = (
            keep.select(["n"])
            .append_column("c", pa.array(np.ones(keep.num_rows, np.int64)))
            .group_by(["n"])
            .aggregate([("c", "sum")])
        )
        yield g.rename_columns(["n", "c"])

    rows = keyed_reagg(
        red.map_batches(pcnt, batch_format="pyarrow"), ["n"], [("c", "sum")], 8
    ).take_all()  # <= NMAX rows
    counts = {int(r["n"]): int(r["c"]) for r in rows}
    return pa.table(
        {
            "n": pa.array(np.arange(1, nmax + 1, dtype=np.int64)),
            "dup_grams": pa.array(
                np.array([counts.get(n, 0) for n in range(1, nmax + 1)], np.int64)
            ),
        }
    )


# --------------------------------------------------------------------------
# per-document character entropy (quality heuristic)
# --------------------------------------------------------------------------

# RE2's \s (the DuckDB regexp class mirrored by the oracle's '\S'):
_RE2_WS = np.array([9, 10, 12, 13, 32], np.uint8)
_ENT_SCALE = 10**9


def doc_char_entropy(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars, ent_q) — per-document character-unigram
    entropy, the cheap gibberish/boilerplate detector run before
    training (low entropy = repeated characters, high = random bytes).

    Exactness: with counts c_i over non-whitespace chars and n = Σc_i,
    H·n = n·ln n − Σ c_i·ln c_i; both ln terms are quantized through
    the libm rule (floor(1e9·ln x) is bit-equal in numpy and DuckDB),
    so ``ent_q = n·⌊1e9·ln n⌋ − Σ c_i·⌊1e9·ln c_i⌋`` is an exact
    integer (≈ 1e9·n·H) and the sums are order-free.

    Scale shape: entirely block-local (a document is ONE parquet row),
    zero shuffle; chars are counted VECTORIZED from the arrow string
    value buffer (one bincount over doc_idx·128 + byte — no per-row
    Python).  ASCII is asserted (raises on high bytes) because the
    byte==char identity is what makes the numpy count equal the SQL
    side's regexp_extract_all(text, '\\S') unnest."""

    def fn(t: pa.Table):
        if t.num_rows == 0 or "text" not in t.schema.names:
            return
        col = t.column("text")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # StringArray layout: buffers()[1] = int32 offsets (absolute into
        # the value buffer, arr.offset entries ahead), buffers()[2] = bytes
        otype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offbuf = np.frombuffer(arr.buffers()[1], otype)
        off = offbuf[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        buf = arr.buffers()[2]
        data = (
            np.frombuffer(buf, np.uint8)
            if buf is not None
            else np.empty(0, np.uint8)
        )
        flat = data[off[0]: off[-1]]
        if flat.size and int(flat.max()) >= 128:
            raise ValueError("doc_char_entropy: non-ASCII text")
        lens = np.diff(off)
        doc_idx = np.repeat(np.arange(len(arr)), lens)
        keep = ~np.isin(flat, _RE2_WS)
        key = doc_idx[keep] * 128 + flat[keep].astype(np.int64)
        cnt = np.bincount(key, minlength=len(arr) * 128).reshape(len(arr), 128)
        n = cnt.sum(axis=1)
        lnq = np.zeros_like(cnt)
        nz = cnt > 0
        lnq[nz] = np.floor(_ENT_SCALE * np.log(cnt[nz].astype(np.float64))).astype(
            np.int64
        )
        s = (cnt * lnq).sum(axis=1)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = n > 0
        n_ln_n = (
            n[m]
            * np.floor(_ENT_SCALE * np.log(n[m].astype(np.float64))).astype(np.int64)
        )
        yield pa.table(
            {
                "doc_id": pa.array(ids[m]),
                "n_chars": pa.array(n[m].astype(np.int64)),
                "ent_q": pa.array((n_ln_n - s[m]).astype(np.int64)),
            }
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow")


DOC_CHAR_ENTROPY_SQL = rf"""
WITH ch AS (
  SELECT doc_id, UNNEST(regexp_extract_all(text, '\S')) AS c FROM documents
),
cc AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2),
agg AS (
  SELECT doc_id, SUM(cnt) AS n,
    SUM(cnt * CAST(FLOOR({_ENT_SCALE} * ln(CAST(cnt AS DOUBLE))) AS BIGINT)) AS s
  FROM cc GROUP BY 1
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
  CAST(n * CAST(FLOOR({_ENT_SCALE} * ln(CAST(n AS DOUBLE))) AS BIGINT) - s
       AS BIGINT) AS ent_q
FROM agg WHERE n > 0
"""


# --------------------------------------------------------------------------
# per-source-pair unigram KL divergence (corpus drift audit)
# --------------------------------------------------------------------------


def source_unigram_kl(sf_dir: str) -> ray.data.Dataset:
    """(source_a, source_b, n_a, kl_q) for every ordered source pair —
    the corpus-mixture drift audit: KL(P_a ‖ P_b) between add-one-
    smoothed unigram distributions, the check run before mixing
    scraped corpora (large KL = the sources disagree).

    Quantized integer restatement (order-free sums, the lm.py rule)::

        kl_q = Σ_{w ∈ vocab} (c_a(w)+1) ·
               (⌊1e9·ln((c_a+1)/(n_a+V))⌋ − ⌊1e9·ln((c_b+1)/(n_b+V))⌋)

    over the FULL global vocab (absent words contribute through the
    smoothing floor), so kl_q ≈ 1e9·(n_a+V)·KL and both lns ride the
    libm rule — the SQL oracle matches bit-identically.

    Scale shape: ONE (source, token)-keyed vocab-bounded reduce (the
    bigram_pmi precedent — sources·vocab rows, never corpus rows);
    the S²·V pair grid folds on the driver in one vectorized numpy
    pass."""
    from .shuffle import keyed_reagg

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def cnts(t: pa.Table):
        if len(t) == 0:
            return
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        off = arr.offsets.to_numpy(zero_copy_only=False)
        ridx = np.repeat(np.arange(len(arr)), np.diff(off))
        vals = arr.values
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return
        src = np.asarray(t.column("source").to_pylist(), dtype=object)[
            ridx[keep]
        ]
        g = (
            pa.table(
                {
                    "source": pa.array(src.tolist(), pa.string()),
                    "tok": vals.filter(pa.array(keep)),
                    "c": pa.array(np.ones(int(keep.sum()), np.int64)),
                }
            ).group_by(["source", "tok"]).aggregate([("c", "sum")])
        )
        yield g.rename_columns(["source", "tok", "c"])

    rows = keyed_reagg(
        docs.map_batches(cnts, batch_format="pyarrow"),
        ["source", "tok"], [("c", "sum")], P,
    ).take_all()  # sources·vocab-bounded
    srcs = sorted({r["source"] for r in rows})
    vocab = sorted({r["tok"] for r in rows})
    si = {s: i for i, s in enumerate(srcs)}
    wi = {w: i for i, w in enumerate(vocab)}
    S, V = len(srcs), len(vocab)
    cm = np.zeros((S, V), np.int64)
    for r in rows:
        cm[si[r["source"]], wi[r["tok"]]] = r["c"]
    n = cm.sum(axis=1)
    # ⌊1e9·ln((c+1)/(n_s+V))⌋ per (source, word) — ONE float chain
    lq = np.floor(
        1e9 * np.log((cm + 1.0) / (n + float(V))[:, None])
    ).astype(np.int64)
    sa, sb, na_out, kl = [], [], [], []
    for a in range(S):
        diff = lq[a][None, :] - lq  # (S, V)
        t = ((cm[a] + 1)[None, :] * diff).sum(axis=1)
        for b in range(S):
            if a == b:
                continue
            sa.append(srcs[a])
            sb.append(srcs[b])
            na_out.append(int(n[a]))
            kl.append(int(t[b]))
    return ray.data.from_arrow(
        pa.table(
            {
                "source_a": pa.array(sa, pa.string()),
                "source_b": pa.array(sb, pa.string()),
                "n_a": pa.array(na_out, pa.int64()),
                "kl_q": pa.array(kl, pa.int64()),
            }
        )
    )


SOURCE_UNIGRAM_KL_SQL = r"""
WITH tok AS (
  SELECT source, UNNEST(
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')
  ) AS tok
  FROM documents
),
cnt AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2),
ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
voc AS (SELECT DISTINCT tok FROM tok),
vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM voc),
grid AS (
  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb, w.tok
  FROM ns a JOIN ns b ON a.source <> b.source CROSS JOIN voc w
),
terms AS (
  SELECT g.sa, g.sb, g.na,
    (COALESCE(ca.c, 0) + 1) * (
      CAST(FLOOR(1000000000.0 * ln(
        CAST(COALESCE(ca.c, 0) + 1 AS DOUBLE) / CAST(g.na + vv.v AS DOUBLE)
      )) AS BIGINT)
      - CAST(FLOOR(1000000000.0 * ln(
        CAST(COALESCE(cb.c, 0) + 1 AS DOUBLE) / CAST(g.nb + vv.v AS DOUBLE)
      )) AS BIGINT)
    ) AS term
  FROM grid g
  LEFT JOIN cnt ca ON ca.source = g.sa AND ca.tok = g.tok
  LEFT JOIN cnt cb ON cb.source = g.sb AND cb.tok = g.tok
  CROSS JOIN vv
)
SELECT sa AS source_a, sb AS source_b, CAST(na AS BIGINT) AS n_a,
  CAST(SUM(term) AS BIGINT) AS kl_q
FROM terms GROUP BY 1, 2, 3
"""
