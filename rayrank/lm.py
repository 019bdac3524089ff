"""Bigram language-model heldout scoring — the perplexity-filter stage
of a pretraining data pipeline (train an n-gram LM on the train split,
score every heldout document, gate on the score; CCNet/Gopher-style
quality filtering restated over the reference corpus tables).

Model rule (pinned): the train split is ``splitmix64(doc_id) <
SPLIT_TRAIN_T`` (the exact-integer 80 % threshold shared with
``packing.dataset_split``); tokens are the corpus-wide ``\\s+`` split;
the LM is add-one-smoothed conditional bigrams over the TRAIN
vocabulary::

    logp(b | a) = ln( (c(a,b) + 1) / (ctx(a) + V) )

with ``c(a,b)`` the train bigram count (0 if unseen), ``ctx(a) =
Σ_b c(a,b)`` the bigram-start count (0 for OOV context) and ``V`` the
distinct-token count of the train split.  Every heldout document with
at least one adjacent token pair scores ``q_sum = Σ floor(1e9 ·
logp)`` over its bigrams — the zipf_slope quantize-to-int rule, so the
per-document sum is order-free and the DuckDB oracle matches
bit-identically (ln on exact dyadic ratios, one multiply, one floor;
numpy and DuckDB share libm on this host).

Scale shape: the bigram and unigram reduces are VOCAB-bounded
(``keyed_reagg`` partials, driver-folded and closure-broadcast like
``terms.bigram_pmi`` — a partitioned lookup above a vocab cap is the
100-TB path); scoring is one block-local pass over heldout docs (a
document is one parquet row, so per-doc grouping never crosses
blocks); nothing corpus-sized is ever materialized.

Reference parity: the reference has no LM stage; this extends its
corpus pipeline (reference pagerank.py:118-141 document scoring) with
the standard pretraining-curation operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .packing import SPLIT_TRAIN_T
from .shuffle import keyed_reagg
from .sketch import splitmix64
from .terms import _read_docs, _token_pairs

P = 8
_QSCALE = 1_000_000_000.0


def _train_mask(doc_ids: np.ndarray) -> np.ndarray:
    return splitmix64(doc_ids) < np.uint64(SPLIT_TRAIN_T)


def _split_block(t: pa.Table, train: bool) -> pa.Table:
    if len(t) == 0:
        return t
    m = _train_mask(t.column("doc_id").to_numpy(zero_copy_only=False))
    return t.filter(pa.array(m if train else ~m))


def _bigrams_of_block(t: pa.Table):
    """(doc_ids, a, b) adjacent-pair arrays for one block (the
    bigram_pmi offset-arithmetic extraction, with the doc id kept)."""
    docs, toks = _token_pairs(t)
    n = len(docs)
    if n < 2:
        return None
    adj = docs[1:] == docs[:-1]
    if not adj.any():
        return None
    m = pa.array(adj)
    return (
        docs[:-1][adj],
        toks.slice(0, n - 1).filter(m),
        toks.slice(1).filter(m),
    )


def bigram_lm_perplexity(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_bigrams, q_sum) for every heldout document with ≥1
    bigram: quantized add-one bigram log-likelihood under the train-
    split LM (see module docstring for the pinned rule)."""

    def train_bigrams(t: pa.Table):
        t = _split_block(t, train=True)
        if len(t) == 0:
            return
        got = _bigrams_of_block(t)
        if got is None:
            return
        _, a, b = got
        g = (
            pa.table({"a": a, "b": b})
            .append_column("cnt", pa.array(np.ones(len(a), np.int64)))
            .group_by(["a", "b"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["a", "b", "cnt"])

    def train_unigrams(t: pa.Table):
        t = _split_block(t, train=True)
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

    docs = _read_docs(sf_dir)
    brows = keyed_reagg(
        docs.map_batches(train_bigrams, batch_format="pyarrow"),
        ["a", "b"], [("cnt", "sum")], P,
    ).take_all()  # bigram-vocab-bounded
    urows = keyed_reagg(
        docs.map_batches(train_unigrams, batch_format="pyarrow"),
        ["tok"], [("cnt", "sum")], P,
    ).take_all()  # vocab-bounded
    bdict = {(r["a"], r["b"]): int(r["cnt"]) for r in brows}
    ctx: dict[str, int] = {}
    for (a, _), c in bdict.items():
        ctx[a] = ctx.get(a, 0) + c
    vf = float(len(urows))

    def score(t: pa.Table):
        t = _split_block(t, train=False)
        if len(t) == 0:
            return
        got = _bigrams_of_block(t)
        if got is None:
            return
        dids, a, b = got
        al = a.to_pylist()
        bl = b.to_pylist()
        n = len(al)
        cab = np.fromiter(
            (bdict.get(p, 0) for p in zip(al, bl)), np.float64, n
        )
        cc = np.fromiter((ctx.get(x, 0) for x in al), np.float64, n)
        # ONE explicit float chain, mirrored verbatim in the SQL oracle
        q = np.floor(
            np.log((cab + 1.0) / (cc + vf)) * _QSCALE
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "doc_id": pa.array(dids),
                    "n_bigrams": pa.array(np.ones(n, np.int64)),
                    "q_sum": pa.array(q),
                }
            )
            .group_by(["doc_id"])
            .aggregate([("n_bigrams", "sum"), ("q_sum", "sum")])
        )
        yield g.rename_columns(["doc_id", "n_bigrams", "q_sum"])

    # a document is ONE parquet row -> per-doc grouping is block-local
    return docs.map_batches(score, batch_format="pyarrow")


DSIR_B = 32  # hashed-ngram feature buckets
DSIR_TARGET_LANG = "en"


def _feat_block(t: pa.Table, vocab: np.ndarray):
    """Hashed-ngram feature instances for one block: returns
    (row_idx, bucket) arrays — one entry per unigram and per adjacent
    bigram, bucket = splitmix64(feature) mod ``DSIR_B``.  Unigram
    feature = 1-based alphabetic token rank; bigram feature chains two
    splitmix stages (the minhash shingle rule, arity 2)."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
    )
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    ridx = np.repeat(np.arange(len(arr)), np.diff(offsets))
    vals = arr.values
    keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    terms = vals.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    ridx = ridx[keep]
    if len(terms) == 0:
        return np.array([], np.int64), np.array([], np.int64)
    tid = (np.searchsorted(vocab, terms) + 1).astype(np.uint64)
    bmod = np.uint64(DSIR_B)
    hu = splitmix64(tid) % bmod
    adj = ridx[:-1] == ridx[1:]
    hb = splitmix64(splitmix64(tid[:-1][adj]) ^ tid[1:][adj]) % bmod
    rows = np.concatenate([ridx, ridx[:-1][adj]])
    bkts = np.concatenate([hu, hb]).astype(np.int64)
    return rows, bkts


def dsir_weights(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, dsir_w) — DSIR importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling")
    for every non-target document with ≥1 feature.

    Rule (pinned): features are hashed unigrams + bigrams over the
    ``DSIR_B``-bucket space; the target domain is ``lang =
    DSIR_TARGET_LANG`` documents, the raw pool is everything else.
    Per-bucket quantized log-ratio with add-one smoothing::

        w_b = floor(ln((ct_b+1)/(T+B)) * 1e9)
            - floor(ln((cr_b+1)/(R+B)) * 1e9)

    (ct/cr = target/raw bucket totals, T/R their sums) and the
    per-document weight is the ORDER-FREE integer sum of ``w_b`` over
    the document's feature instances — the zipf_slope floor-ln rule,
    so the DuckDB oracle matches bit-identically.

    Scale shape: the bucket reduce is B-bounded (keyed_reagg partials,
    2·B rows cross the driver); the weight vector is B ints broadcast
    in the closure; scoring is one block-local pass (a document is one
    parquet row) — nothing corpus-sized materializes.
    """
    import math
    import os

    from .text import _sorted_vocab

    vocab = _sorted_vocab(sf_dir)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def pcounts(t: pa.Table):
        if len(t) == 0:
            return
        rows, bkts = _feat_block(t, vocab)
        if len(rows) == 0:
            return
        tgt = pc.equal(
            t.column("lang"), DSIR_TARGET_LANG
        ).to_numpy(zero_copy_only=False)[rows]
        g = (
            pa.table(
                {
                    "tgt": pa.array(tgt),
                    "bkt": pa.array(bkts),
                    "cnt": pa.array(np.ones(len(rows), np.int64)),
                }
            )
            .group_by(["tgt", "bkt"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["tgt", "bkt", "cnt"])

    crows = keyed_reagg(
        docs.map_batches(pcounts, batch_format="pyarrow"),
        ["tgt", "bkt"], [("cnt", "sum")], P,
    ).take_all()  # <= 2*DSIR_B rows
    ct = [0] * DSIR_B
    cr = [0] * DSIR_B
    for r in crows:
        (ct if r["tgt"] else cr)[int(r["bkt"])] += int(r["cnt"])
    tt, tr = sum(ct), sum(cr)
    wq = np.array(
        [
            math.floor(math.log((ct[b] + 1) / (tt + DSIR_B)) * _QSCALE)
            - math.floor(math.log((cr[b] + 1) / (tr + DSIR_B)) * _QSCALE)
            for b in range(DSIR_B)
        ],
        np.int64,
    )

    def score(t: pa.Table):
        if len(t) == 0:
            return
        raw = t.filter(
            pc.invert(pc.equal(t.column("lang"), DSIR_TARGET_LANG))
        )
        if raw.num_rows == 0:
            return
        rows, bkts = _feat_block(raw, vocab)
        if len(rows) == 0:
            return
        dids = raw.column("doc_id").to_numpy(zero_copy_only=False)[rows]
        g = (
            pa.table({"doc_id": pa.array(dids), "dsir_w": pa.array(wq[bkts])})
            .group_by(["doc_id"])
            .aggregate([("dsir_w", "sum")])
        )
        yield g.rename_columns(["doc_id", "dsir_w"])

    return docs.map_batches(score, batch_format="pyarrow")


KN_D = 0.75  # absolute discount — exactly representable in binary


def kn_bigram_score(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_scored, kn_q) — interpolated Kneser–Ney bigram
    scoring of heldout documents (Kneser & Ney 1995; Chen & Goodman
    1998 interpolated form), the standard upgrade over the add-one LM
    in :func:`bigram_lm_perplexity`::

        p(b|a) = (max(c(a,b) − D, 0) + D·N1+(a·)·(N1+(·b)/N1+(··)))
                 / ctx(a)

    with c the train bigram counts, ctx(a) = Σ_b c(a,b), N1+(a·) the
    distinct continuations of a, N1+(·b) the distinct left contexts of
    b, N1+(··) the distinct-bigram total.  Pinned skip rule: a heldout
    bigram scores iff ctx(a) > 0 AND N1+(·b) > 0 (c(a,b) > 0 implies
    the latter, so only heldout-novel continuations drop); ``kn_q =
    Σ floor(1e9·ln p)`` is order-free by the zipf_slope rule and the
    float chain is mirrored verbatim by the SQL oracle (same
    left-associated ops on the same exact ints).

    Scale shape: identical to bigram_lm_perplexity — the ONLY reduce
    is the vocab²-bounded bigram count table (everything else derives
    from it on the driver and broadcasts in the closure); scoring is
    one block-local pass over heldout docs."""

    def train_bigrams(t: pa.Table):
        t = _split_block(t, train=True)
        if len(t) == 0:
            return
        got = _bigrams_of_block(t)
        if got is None:
            return
        _, a, b = got
        g = (
            pa.table({"a": a, "b": b})
            .append_column("cnt", pa.array(np.ones(len(a), np.int64)))
            .group_by(["a", "b"])
            .aggregate([("cnt", "sum")])
        )
        yield g.rename_columns(["a", "b", "cnt"])

    docs = _read_docs(sf_dir)
    brows = keyed_reagg(
        docs.map_batches(train_bigrams, batch_format="pyarrow"),
        ["a", "b"], [("cnt", "sum")], P,
    ).take_all()  # bigram-vocab-bounded
    bdict = {(r["a"], r["b"]): int(r["cnt"]) for r in brows}
    ctx: dict[str, int] = {}
    nfw: dict[str, int] = {}
    nbw: dict[str, int] = {}
    for (a, b), c in bdict.items():
        ctx[a] = ctx.get(a, 0) + c
        nfw[a] = nfw.get(a, 0) + 1
        nbw[b] = nbw.get(b, 0) + 1
    nbig = float(len(bdict))

    def score(t: pa.Table):
        t = _split_block(t, train=False)
        if len(t) == 0:
            return
        got = _bigrams_of_block(t)
        if got is None:
            return
        dids, a, b = got
        al = a.to_pylist()
        bl = b.to_pylist()
        n = len(al)
        cab = np.fromiter(
            (bdict.get(p, 0) for p in zip(al, bl)), np.float64, n
        )
        cc = np.fromiter((ctx.get(x, 0) for x in al), np.float64, n)
        nf = np.fromiter((nfw.get(x, 0) for x in al), np.float64, n)
        nb = np.fromiter((nbw.get(x, 0) for x in bl), np.float64, n)
        keep = (cc > 0) & (nb > 0)
        if not keep.any():
            return
        dids, cab, cc, nf, nb = (
            dids[keep], cab[keep], cc[keep], nf[keep], nb[keep]
        )
        # ONE explicit float chain, mirrored verbatim in the SQL oracle
        p = (
            np.maximum(cab - KN_D, 0.0) + KN_D * nf * (nb / nbig)
        ) / cc
        q = np.floor(np.log(p) * _QSCALE).astype(np.int64)
        g = (
            pa.table(
                {
                    "doc_id": pa.array(dids),
                    "n_scored": pa.array(np.ones(len(q), np.int64)),
                    "kn_q": pa.array(q),
                }
            )
            .group_by(["doc_id"])
            .aggregate([("n_scored", "sum"), ("kn_q", "sum")])
        )
        yield g.rename_columns(["doc_id", "n_scored", "kn_q"])

    return docs.map_batches(score, batch_format="pyarrow")
