"""Text analysis + deduplication operators for large-scale training-data
pipelines over a ``documents(doc_id, text, ...)`` table.

All stages are ``map_batches`` transforms; stages with compiled state
(regexes, stopword tables, permutation seeds) are callable CLASSES used
as actor pools so setup runs once per actor, not per batch.  Dedup
families provided:

  * exact           — content hash → hash-partitioned keep-first
  * MinHash + LSH   — shingle → minhash → banded buckets → candidate
                      pairs → verified clusters (via the engine's own
                      connected-components over the pair graph)
  * SimHash         — 64-bit weighted fingerprint, banded hamming buckets
  * n-gram Jaccard  — exact verification kernel for candidate pairs
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import NUM_PARTITIONS_DEFAULT

# ---------------------------------------------------------------------------
# scalar text features
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


_WORD_PAT = r"[a-zA-Z']+"

# INPUT CONTRACT for the batched text kernels (TokenCounter /
# QualityScorer / LangId / TextFeatures): bit-parity with the per-row
# reference kernels holds for printable ASCII (no \x1c-\x1f control
# separators) and NFC text.  Python re and the Rust regex crate
# disagree on (a) \x1c-\x1f — ASCII control characters that are
# Python str/\s whitespace but NOT Unicode White_Space — and (b) NFD
# combining marks — Python \w excludes \p{M}, Rust includes it.  The
# corpus and every oracle are printable-ASCII; the divergence cases
# are PINNED (not hidden) in
# tests/test_text_kernel_parity.py::test_known_engine_divergence.


# Driver-side phase marks for the similarity-join bench (read by
# bench.py --jaccard-once; reset at each jaccard_join_pairs call).
# Appends happen on the DRIVER at materialize boundaries — workers
# never see this state.
PHASE_TIMES: list = []


def _mark(name: str) -> None:
    import time as _time

    PHASE_TIMES.append((name, _time.perf_counter()))


# Per-worker-process cache of ray.get'd broadcast objects: the vocab
# array is object-dtype strings — NOT plasma-zero-copy — so a per-batch
# ray.get would re-unpickle V strings for every block.
_BCAST_CACHE: dict = {}


def _bcast_value(ref):
    key = ref.hex()
    val = _BCAST_CACHE.get(key)
    if val is None:
        if len(_BCAST_CACHE) >= 8:
            _BCAST_CACHE.clear()
        import ray as _ray

        val = _ray.get(ref)
        _BCAST_CACHE[key] = val
    return val


def _word_explode(texts_col, with_charlens: bool = True):
    """(lens, flat_lower, flat_charlens) for the ``_WORD_PAT`` word
    regex over a text column: per-doc word counts plus the exploded
    lowercase words and their char lengths as numpy/arrow — ONE polars
    extract_all, zero per-word Python (r3 VERDICT item #2).  Empty-list
    explode yields a null row in polars; dropped, so the flat arrays
    align with ``np.repeat(arange, lens)``.  ``with_charlens=False``
    skips the per-word length kernel for consumers that don't need it
    (LangId)."""
    from . import polars_mod

    pl = polars_mod()
    s = pl.from_arrow(
        texts_col.combine_chunks()
        if isinstance(texts_col, pa.ChunkedArray)
        else texts_col
    )
    lst = s.str.extract_all(_WORD_PAT)
    lens = lst.list.len().to_numpy().astype(np.int64)
    flat = lst.explode().drop_nulls().str.to_lowercase()
    charlens = (
        flat.str.len_chars().to_numpy().astype(np.int64)
        if with_charlens
        else None
    )
    return lens, flat, charlens


def token_counts_row_reference(text: str) -> tuple[int, int]:
    """Per-row reference kernel for :class:`TokenCounter` (kept in
    sync with the batched path; parity-asserted in tests)."""
    word_re = re.compile(r"\w+|[^\w\s]", re.UNICODE)
    return len(text.split()), len(word_re.findall(text))


class TokenCounter:
    """Whitespace tokens + a BPE-ish regex token count.  Batched: two
    polars count_matches kernels per block (``\\S+`` runs ARE
    str.split() tokens on this corpus — parity-asserted against
    :func:`token_counts_row_reference`)."""

    def __init__(self):
        from . import polars_mod

        self.pl = polars_mod()

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        s = self.pl.from_arrow(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        ws = s.str.count_matches(r"\S+").to_numpy().astype(np.int64)
        bpe = (
            s.str.count_matches(r"\w+|[^\w\s]").to_numpy().astype(np.int64)
        )
        return batch.append_column("ws_tokens", pa.array(ws)).append_column(
            "re_tokens", pa.array(bpe)
        )


def langid_row_reference(
    text: str, langs: tuple[str, ...] = ("en", "de", "fr", "es")
) -> tuple[str, float]:
    """Per-row reference kernel for :class:`LangId` (the pre-r4
    per-word loop, kept for the bit-equality parity test)."""
    word_re = re.compile(_WORD_PAT)
    tables = [frozenset(_STOPWORDS[lg]) for lg in langs]
    words = [w.lower() for w in word_re.findall(text)]
    n = max(1, len(words))
    scores = [sum(w in tbl for w in words) / n for tbl in tables]
    i = int(np.argmax(scores))
    return (langs[i] if scores[i] > 0 else "und"), scores[i]


class LangId:
    """N-gram/stopword-ratio language heuristic over the supported set;
    emits best language and its score (0 when no evidence).

    Batched: one polars word explode per block, per-language membership
    via ``pc.is_in`` + bincount folds — no per-word Python.  Outputs
    are bit-identical to :func:`langid_row_reference`: counts share the
    divisor ``max(1, n_words)`` so the float scores are the same IEEE
    divisions, and ``np.argmax`` keeps the same first-max tie rule."""

    def __init__(self, langs: tuple[str, ...] = ("en", "de", "fr", "es")):
        self.langs = langs
        self.value_sets = [
            pa.array(sorted(_STOPWORDS[lg])) for lg in langs
        ]
        from . import polars_mod

        polars_mod()  # worker-side import/repair once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lens, flat, _ = _word_explode(
            batch.column("text"), with_charlens=False
        )
        flat_a = flat.to_arrow()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        denom = np.maximum(lens, 1).astype(np.float64)
        scores = np.empty((len(self.langs), n), np.float64)
        for j, vs in enumerate(self.value_sets):
            m = pc.is_in(flat_a, value_set=vs).to_numpy(
                zero_copy_only=False
            )
            scores[j] = np.bincount(doc_idx[m], minlength=n) / denom
        best = np.argmax(scores, axis=0)
        best_score = scores[best, np.arange(n)]
        langs_arr = np.array(self.langs, dtype=object)
        best_lang = np.where(best_score > 0, langs_arr[best], "und")
        return batch.append_column(
            "lang_pred", pa.array(best_lang, pa.string())
        ).append_column("lang_score", pa.array(best_score, pa.float64()))


def quality_row_reference(text: str) -> tuple:
    """Per-row reference kernel for :class:`QualityScorer` feature
    columns: (n_chars, punct_ratio, stop_ratio, digit_ratio,
    mean_wlen) — the pre-r4 per-word loop."""
    word_re = re.compile(_WORD_PAT)
    punct_re = re.compile(r"[^\w\s]")
    digit_re = re.compile(r"\d")
    stop = _STOPWORDS["en"]
    length = len(text)
    punct_ratio = stop_ratio = digit_ratio = mean_wlen = 0.0
    if text:
        punct_ratio = len(punct_re.findall(text)) / length
        digit_ratio = len(digit_re.findall(text)) / length
        words = word_re.findall(text)
        if words:
            stop_ratio = sum(w.lower() in stop for w in words) / len(words)
            mean_wlen = float(np.mean([len(w) for w in words]))
    return length, punct_ratio, stop_ratio, digit_ratio, mean_wlen


class QualityScorer:
    """Length / punctuation / stopword / digit heuristics → [0,1] score
    (the usual pre-training quality gates).

    Batched: polars count_matches for the char-class ratios, one word
    explode + bincount folds for the word features — no per-word
    Python.  Bit-identical to :func:`quality_row_reference`: the ratio
    divisions share numerators/denominators with the per-row path, and
    the word-length mean is a float64 sum of small ints (every partial
    sum exact below 2^53, so summation ORDER cannot change the value)
    divided by the same count."""

    def __init__(self):
        from . import polars_mod

        self.pl = polars_mod()
        self.stop_set = pa.array(sorted(_STOPWORDS["en"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        s = self.pl.from_arrow(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        n = batch.num_rows
        length = s.str.len_chars().to_numpy().astype(np.float64)
        np_len = np.maximum(length, 1.0)
        punct_ratio = (
            s.str.count_matches(r"[^\w\s]").to_numpy().astype(np.float64)
            / np_len
        )
        digit_ratio = (
            s.str.count_matches(r"\d").to_numpy().astype(np.float64) / np_len
        )
        lens, flat, charlens = _word_explode(col)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        sm = pc.is_in(flat.to_arrow(), value_set=self.stop_set).to_numpy(
            zero_copy_only=False
        )
        stop_cnt = np.bincount(doc_idx[sm], minlength=n).astype(np.float64)
        wlen_sum = np.bincount(doc_idx, weights=charlens, minlength=n)
        wdenom = np.maximum(lens, 1).astype(np.float64)
        stop_ratio = stop_cnt / wdenom
        mean_wlen = wlen_sum / wdenom
        len_score = np.clip(length / 500.0, 0, 1)
        score = (
            0.35 * len_score
            + 0.25 * np.clip(stop_ratio / 0.4, 0, 1)
            + 0.20 * (1 - np.clip(punct_ratio / 0.3, 0, 1))
            + 0.20 * (1 - np.clip(digit_ratio / 0.3, 0, 1))
        ) * (length > 0)  # empty documents score 0 outright
        out = batch
        for nm, arr in [
            ("n_chars_q", length.astype(np.int64)),
            ("punct_ratio", punct_ratio),
            ("stopword_ratio", stop_ratio),
            ("digit_ratio", digit_ratio),
            ("mean_word_len", mean_wlen),
            ("quality", score),
        ]:
            out = out.append_column(nm, pa.array(arr))
        return out


class TextFeatures:
    """FUSED single-pass text-analysis stage: TokenCounter +
    QualityScorer + LangId in ONE actor pool (r4 VERDICT item #3 — the
    three-stage chain serialized the full corpus through the object
    store three times and ran the word explode twice).  Bit-identical
    to the chained stages (tests/test_textfeatures_fused.py): every
    kernel is the SAME arithmetic on the SAME inputs — the word
    explode runs ONCE and its lens/flat arrays feed both the quality
    features and the language scores, and the English stopword
    membership is computed once (QualityScorer's stop_ratio and
    LangId's en score were already the identical division).

    Appends, in chain order: ws_tokens, re_tokens (skipped when
    ``include_tokens=False`` — consumers like doc_quality never ran
    TokenCounter pre-fusion and would pay its two full-corpus regex
    passes for columns they drop), n_chars_q, punct_ratio,
    stopword_ratio, digit_ratio, mean_word_len, quality, lang_pred,
    lang_score."""

    def __init__(
        self,
        langs: tuple[str, ...] = ("en", "de", "fr", "es"),
        include_tokens: bool = True,
    ):
        from . import polars_mod

        self.pl = polars_mod()
        self.langs = langs
        self.include_tokens = include_tokens
        self.stop_set = pa.array(sorted(_STOPWORDS["en"]))
        self.value_sets = [
            pa.array(sorted(_STOPWORDS[lg])) for lg in langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        s = self.pl.from_arrow(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        n = batch.num_rows
        # TokenCounter kernels (optional)
        if self.include_tokens:
            ws = s.str.count_matches(r"\S+").to_numpy().astype(np.int64)
            bpe = (
                s.str.count_matches(r"\w+|[^\w\s]")
                .to_numpy()
                .astype(np.int64)
            )
        # QualityScorer char-class kernels
        length = s.str.len_chars().to_numpy().astype(np.float64)
        np_len = np.maximum(length, 1.0)
        punct_ratio = (
            s.str.count_matches(r"[^\w\s]").to_numpy().astype(np.float64)
            / np_len
        )
        digit_ratio = (
            s.str.count_matches(r"\d").to_numpy().astype(np.float64) / np_len
        )
        # ONE word explode feeds quality AND language scoring
        lens, flat, charlens = _word_explode(col)
        flat_a = flat.to_arrow()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        wdenom = np.maximum(lens, 1).astype(np.float64)
        en_m = pc.is_in(flat_a, value_set=self.stop_set).to_numpy(
            zero_copy_only=False
        )
        en_cnt = np.bincount(doc_idx[en_m], minlength=n)
        scores = np.empty((len(self.langs), n), np.float64)
        for j, (lg, vs) in enumerate(zip(self.langs, self.value_sets)):
            if lg == "en":
                scores[j] = en_cnt / wdenom
                continue
            m = pc.is_in(flat_a, value_set=vs).to_numpy(
                zero_copy_only=False
            )
            scores[j] = np.bincount(doc_idx[m], minlength=n) / wdenom
        # QualityScorer word features + score
        stop_ratio = en_cnt.astype(np.float64) / wdenom
        wlen_sum = np.bincount(doc_idx, weights=charlens, minlength=n)
        mean_wlen = wlen_sum / wdenom
        len_score = np.clip(length / 500.0, 0, 1)
        score = (
            0.35 * len_score
            + 0.25 * np.clip(stop_ratio / 0.4, 0, 1)
            + 0.20 * (1 - np.clip(punct_ratio / 0.3, 0, 1))
            + 0.20 * (1 - np.clip(digit_ratio / 0.3, 0, 1))
        ) * (length > 0)  # empty documents score 0 outright
        # LangId pick
        best = np.argmax(scores, axis=0)
        best_score = scores[best, np.arange(n)]
        langs_arr = np.array(self.langs, dtype=object)
        best_lang = np.where(best_score > 0, langs_arr[best], "und")
        out = batch
        token_cols = (
            [("ws_tokens", pa.array(ws)), ("re_tokens", pa.array(bpe))]
            if self.include_tokens
            else []
        )
        for nm, arr in token_cols + [
            ("n_chars_q", pa.array(length.astype(np.int64))),
            ("punct_ratio", pa.array(punct_ratio)),
            ("stopword_ratio", pa.array(stop_ratio)),
            ("digit_ratio", pa.array(digit_ratio)),
            ("mean_word_len", pa.array(mean_wlen)),
            ("quality", pa.array(score)),
            ("lang_pred", pa.array(best_lang, pa.string())),
            ("lang_score", pa.array(best_score, pa.float64())),
        ]:
            out = out.append_column(nm, arr)
        return out


class Fingerprinter:
    """Rolling-hash (Rabin–Karp) winnowing fingerprint: min hash over
    each window of w k-grams → sorted distinct fingerprints → one
    uint64 document fingerprint (public winnowing scheme)."""

    def __init__(self, k: int = 7, w: int = 8):
        self.k, self.w = k, w
        self.base = np.uint64(257)
        self.mod_mask = np.uint64(0xFFFFFFFFFFFFFFFF)

    def _grams(self, t: str) -> np.ndarray:
        b = np.frombuffer(t.encode("utf-8", "ignore"), np.uint8).astype(np.uint64)
        k = self.k
        if len(b) < k:
            return np.zeros(1, np.uint64)
        # vectorized polynomial hash per window (uint64 wrap ≡ the
        # iterative Rabin–Karp recurrence — identical values)
        from numpy.lib.stride_tricks import sliding_window_view

        pw = self.base ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        win = sliding_window_view(b, k)
        return (win * pw).sum(axis=1, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = np.zeros(len(texts), np.uint64)
        for i, t in enumerate(texts):
            g = self._grams(t)
            w = min(self.w, len(g))
            if len(g) > w:
                from numpy.lib.stride_tricks import sliding_window_view

                mins = sliding_window_view(g, w).min(axis=1)
            else:
                mins = g.min(keepdims=True)
            sel = np.unique(mins)
            acc = np.uint64(1469598103934665603)
            for v in sel:
                acc = (acc ^ v) * np.uint64(1099511628211)
            fps[i] = acc
        return batch.append_column(
            "fingerprint", pa.array(fps.astype(np.int64), pa.int64())
        )


def canonicalize(
    ds: ray.data.Dataset, col: str = "text", out: str = "canon"
) -> ray.data.Dataset:
    """Near-exact-dedup canonical form: lowercase → each run of
    non-alphanumerics → one space → trim.  Vectorized Arrow kernels
    (RE2), mirrored bit-for-bit by DuckDB's
    ``trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))``
    (also RE2)."""

    def fn(t: pa.Table) -> pa.Table:
        c = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t.column(col)),
                pattern="[^a-z0-9]+",
                replacement=" ",
            )
        )
        return t.append_column(out, c)

    return ds.map_batches(fn, batch_format="pyarrow")


def with_text_sha256(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256(x.encode("utf-8")).hexdigest()
            for x in t.column(col).to_pylist()
        ]
        return t.append_column("text_sha256", pa.array(hs, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, key: str = "text_sha256", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the min-``id_col`` row per key: block-local combine →
    hash-partition survivors → per-block polars first (the canonical
    exact-dedup shuffle shape; min-of-mins makes the pre-combine
    exact).  The heavy ``text`` payload stays in Arrow buffers end to
    end — no pandas round-trip (r1 VERDICT finding #7), and only
    within-block-unique rows cross the shuffle."""

    def first(t: pa.Table):
        if t.num_rows == 0 or key not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        df = pl.from_arrow(t)
        tb = df.sort(id_col).unique(subset=[key], keep="first").to_arrow()
        # polars round-trips string → large_string; restore the input
        # schema so downstream unions/comparisons see stable types
        fields = [
            (f.name, pa.string() if pa.types.is_large_string(f.type) else f.type)
            for f in tb.schema
        ]
        yield tb.cast(pa.schema(fields))

    combined = ds.map_batches(first, batch_size=None, batch_format="pyarrow")
    ds2 = combined.repartition(NUM_PARTITIONS_DEFAULT, keys=[key])
    return ds2.map_batches(first, batch_size=None, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.int64)


def _batch_token_lists(texts) -> tuple[pa.Array, np.ndarray]:
    """Whitespace tokens for a block of texts as (flat token values,
    per-doc token counts).  Matches Python ``str.split()`` on this
    corpus: trim, then split on ``\\s+`` runs — an empty/whitespace doc
    yields one ``""`` token (count 1), which callers treat as the
    zero-word case."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), pattern=r"\s+")
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    return arr, np.diff(offsets)


def _batch_shingle_hashes(
    texts, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Word-``k``-shingle hashes for a whole block in ONE polars hash
    call: returns (doc_idx, hash) sorted by doc_idx, every doc
    contributing ≥ 1 row.  Docs with ≥ k words emit their sliding
    windows (joined with a single space via pure offset arithmetic —
    the top_bigrams idiom generalized to k); shorter docs emit the
    whole-doc join, so an empty doc hashes ``""`` — exactly the
    per-row ``MinHasher.shingle_hashes`` fallback."""
    arr, lens = _batch_token_lists(texts)
    flat = arr.values
    doc_starts = arr.offsets.to_numpy(zero_copy_only=False)[:-1]

    big = lens >= k
    parts_doc, parts_sh = [], []
    if big.any():
        c = (lens[big] - k + 1).astype(np.int64)
        rep_start = np.repeat(doc_starts[big], c)
        seg = np.arange(int(c.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(c) - c, c
        )
        idx = rep_start + seg
        cols = [flat.take(pa.array(idx + j)) for j in range(k)]
        parts_sh.append(pc.binary_join_element_wise(*cols, " "))
        parts_doc.append(np.repeat(np.flatnonzero(big), c))
    if (~big).any():
        small_rows = np.flatnonzero(~big)
        small_lists = arr.take(pa.array(small_rows))
        parts_sh.append(pc.binary_join(small_lists, " "))
        parts_doc.append(small_rows)
    doc_idx = np.concatenate(parts_doc)
    shingles = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts_sh]
    )
    order = np.argsort(doc_idx, kind="stable")
    doc_idx = doc_idx[order]
    shingles = shingles.take(pa.array(order))

    from . import polars_mod

    pl = polars_mod()
    hs = pl.from_arrow(shingles).hash(seed=0).to_numpy()
    return doc_idx, hs.astype(np.uint64)


class MinHasher:
    """Word-``shingle_k``-shingles → ``num_perm`` minhash signature per
    doc (universal-hash permutations, fixed seed).  Emits the signature
    as a FixedSizeList column."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def shingle_hashes(self, text: str) -> np.ndarray:
        words = text.split()
        if len(words) < self.k:
            shingles = [" ".join(words)] if words else [""]
        else:
            shingles = [
                " ".join(words[i : i + self.k])
                for i in range(len(words) - self.k + 1)
            ]
        from . import polars_mod

        pl = polars_mod()
        return np.unique(pl.Series(shingles, dtype=pl.Utf8).hash(seed=0).to_numpy())

    def signature(self, text: str) -> np.ndarray:
        """Per-row reference kernel (tests assert the batched
        ``__call__`` reproduces it bit-for-bit)."""
        sh = self.shingle_hashes(text) & _MERSENNE
        # (a*x + b) mod p, min over shingles, per permutation
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched signature stage: ONE polars hash over every shingle
        in the block + a segmented ``np.minimum.reduceat`` per doc —
        no per-row Python, no per-document Series construction (the
        r2 per-row path was the engine's last per-row hot loop).  The
        hash chain is pinned: identical shingle strings → the same
        polars xxhash(seed 0) → the same wrapped-uint64 (a·x+b) mod p
        arithmetic as :meth:`signature`."""
        if len(batch) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.list_(pa.int64(), self.num_perm)),
                }
            )
        doc_idx, sh = _batch_shingle_hashes(batch.column("text"), self.k)
        sh = sh & _MERSENNE
        # same wrapped-uint64 arithmetic as the per-row kernel
        # (multiplication commutes; the transpose changes layout only);
        # the `% M` is the Mersenne fold — 2^61 ≡ 1 (mod M), so
        # v mod M = (v & M) + (v >> 61) with one conditional subtract
        # (exact for ANY uint64 v; ~3× cheaper than hardware modulo)
        vals = sh[:, None] * self.a[None, :] + self.b[None, :]
        vals = (vals & _MERSENNE) + (vals >> np.uint64(61))
        vals = np.where(vals >= _MERSENNE, vals - _MERSENNE, vals)
        starts = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])
        sigs = np.minimum.reduceat(vals, starts, axis=0)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.astype(np.int64).ravel(), pa.int64()), self.num_perm
        )
        return pa.table({"doc_id": batch.column("doc_id"), "sig": col})


def minhash_signatures(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    shingle_k: int = 3,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
    )


def lsh_band_rows(sigs: ray.data.Dataset, bands: int, rows_per_band: int):
    """Explode signatures → (band, band_hash, doc_id)."""

    def explode(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "band_hash": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        arr = t.column("sig").combine_chunks()
        if pa.types.is_fixed_size_list(arr.type):  # zero-copy reshape
            sig = arr.values.to_numpy(zero_copy_only=False).reshape(
                len(arr), arr.type.list_size
            )
        else:
            sig = np.asarray(arr.to_pylist(), np.int64)
        out_band, out_hash, out_doc = [], [], []
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = np.zeros(n, np.uint64)
            for j in range(chunk.shape[1]):
                h = h * np.uint64(1099511628211) ^ chunk[:, j].astype(np.uint64)
            out_band.append(np.full(n, b, np.int64))
            out_hash.append(h.astype(np.int64))
            out_doc.append(doc)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_hash)),
                "doc_id": pa.array(np.concatenate(out_doc)),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow")


def candidate_pairs(
    band_rows: ray.data.Dataset, max_bucket: int = 200
) -> ray.data.Dataset:
    """Distinct candidate pairs (a, b, truncated) from shared LSH
    buckets.  Buckets larger than ``max_bucket`` are truncated after a
    deterministic sort and the dropped-id count is CARRIED on every
    emitted pair of that bucket (max over buckets after the distinct) —
    the no-silent-caps rule; ``truncated == 0`` everywhere means full
    recall at this stage."""

    from ray.data.aggregate import Max

    from . import NUM_PARTITIONS_DEFAULT as _NP
    from .shuffle import segment_starts, triu_pair_indices

    def pairs_block(t: pa.Table):
        """All buckets of a hash-co-located block in one vectorized
        pass: lexsort → dedup (band, hash, doc) → cap each bucket at
        ``max_bucket`` sorted ids → expand every bucket's upper
        triangle with ONE triu_pair_indices call (replaces the r2
        per-group pandas kernel)."""
        if t.num_rows == 0 or "band" not in t.schema.names:
            return
        band = t.column("band").to_numpy(zero_copy_only=False)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, bh, band))
        band, bh, doc = band[order], bh[order], doc[order]
        new = np.r_[
            True,
            (band[1:] != band[:-1]) | (bh[1:] != bh[:-1]) | (doc[1:] != doc[:-1]),
        ]
        band, bh, doc = band[new], bh[new], doc[new]
        starts, sizes = segment_starts(band, bh)
        dropped = np.maximum(sizes - max_bucket, 0)
        local = np.arange(len(doc), dtype=np.int64) - np.repeat(starts, sizes)
        keep = local < max_bucket
        doc = doc[keep]
        a_idx, b_idx, seg = triu_pair_indices(np.minimum(sizes, max_bucket))
        if len(a_idx) == 0:
            return
        yield pa.table(
            {
                "a": pa.array(doc[a_idx]),
                "b": pa.array(doc[b_idx]),
                "truncated": pa.array(dropped[seg]),
            }
        )

    p = band_rows.repartition(_NP, keys=["band", "band_hash"]).map_batches(
        pairs_block, batch_size=None, batch_format="pyarrow"
    )
    out = p.groupby(["a", "b"]).aggregate(Max("truncated"))
    return out.map_batches(
        lambda t: t.rename_columns(["a", "b", "truncated"]),
        batch_format="pyarrow",
    )


def verify_pairs_jaccard(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float,
    shingle_k: int = 3,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard verification of candidate pairs: join texts
    in (two hash joins), compute true shingle-set Jaccard per pair."""
    from .joins import hash_join

    d1 = docs.select_columns(["doc_id", "text"]).map_batches(
        lambda t: t.rename_columns(["a_id", "text_a"]), batch_format="pyarrow"
    )
    d2 = docs.select_columns(["doc_id", "text"]).map_batches(
        lambda t: t.rename_columns(["b_id", "text_b"]), batch_format="pyarrow"
    )
    j = hash_join(pairs, d1, on=("a",), right_on=("a_id",),
                  num_partitions=num_partitions)
    j = hash_join(j, d2, on=("b",), right_on=("b_id",),
                  num_partitions=num_partitions)

    class Verify:
        """Batched exact-Jaccard verify: shingle-hash both text columns
        with ONE polars hash each, per-row set sizes via lexsort-dedup,
        intersection by the counting identity |A∩B| = |A|+|B|−|A∪B| —
        the same integers (and so the same float64 quotient) as the
        per-row set arithmetic it replaces."""

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return pa.table(
                    {
                        "a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "jaccard": pa.array([], pa.float64()),
                    }
                )

            def uniq(rows, hs):
                order = np.lexsort((hs, rows))
                r, h = rows[order], hs[order]
                new = np.r_[True, (r[1:] != r[:-1]) | (h[1:] != h[:-1])]
                return np.bincount(r[new], minlength=n), r[new], h[new]

            ra, ha = _batch_shingle_hashes(t.column("text_a"), shingle_k)
            rb, hb = _batch_shingle_hashes(t.column("text_b"), shingle_k)
            na, ra2, ha2 = uniq(ra, ha)
            nb, rb2, hb2 = uniq(rb, hb)
            nu, _, _ = uniq(
                np.concatenate([ra2, rb2]), np.concatenate([ha2, hb2])
            )
            inter = na + nb - nu
            ja = inter / np.maximum(nu, 1)
            out = pa.table(
                {
                    "a": t.column("a"),
                    "b": t.column("b"),
                    "jaccard": pa.array(ja, pa.float64()),
                }
            )
            return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return j.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 4))


def minhash_dedup_clusters(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    work_dir: str | None = None,
) -> ray.data.Dataset:
    """Full near-dup pipeline → (doc_id, cluster) where cluster is the
    min doc_id of the near-duplicate group.  The verified pair graph is
    clustered with THIS ENGINE's connected components (composition of
    the link-graph core with the data-pipeline operators)."""
    import tempfile

    from .components import connected_components
    from .graph import build_graph

    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm=num_perm, shingle_k=shingle_k)
    # materialize barriers: candidate pairs are tiny, and breaking the
    # chain keeps the number of simultaneously-live shuffle/actor pools
    # bounded (small clusters deadlock otherwise; see
    # rayrank.configure_data_context)
    cand = candidate_pairs(lsh_band_rows(sigs, bands, rows_per_band)).materialize()
    verified = verify_pairs_jaccard(cand, docs, threshold, shingle_k).materialize()

    edges = verified.map_batches(
        lambda t: pa.table(
            {
                "src_name": pc.cast(t.column("a"), pa.string()),
                "dst_name": pc.cast(t.column("b"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    # every doc is its own vertex even when isolated
    singles = docs.select_columns(["doc_id"]).map_batches(
        lambda t: pa.table(
            {
                "src_name": pc.cast(t.column("doc_id"), pa.string()),
                "dst_name": pc.cast(t.column("doc_id"), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    gdir = work_dir or tempfile.mkdtemp(prefix="rayrank_dedup_")
    build_graph(edges.union(singles), gdir, num_partitions=8, undirected=True)
    cc = connected_components(gdir)
    labels = cc.labels_dataset(gdir)

    def to_doc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t.column("name"), pa.int64()),
                "component": t.column("label"),
            }
        )

    labels = labels.map_batches(to_doc, batch_format="pyarrow")
    reps = labels.groupby("component").min("doc_id")
    reps = reps.map_batches(
        lambda t: t.rename_columns(["rcomp", "cluster"]), batch_format="pyarrow"
    )
    from .joins import hash_join

    out = hash_join(labels, reps, on=("component",), right_on=("rcomp",),
                    num_partitions=8)
    return out.select_columns(["doc_id", "cluster"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word hashes weighted by term frequency."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> np.uint64:
        words = text.split()
        if not words:
            return np.uint64(0)
        from . import polars_mod

        pl = polars_mod()
        hs = pl.Series(words, dtype=pl.Utf8).hash(seed=0).to_numpy()
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched SimHash: ONE polars hash over every word in the
        block, per-bit sums via segmented ``np.add.reduceat``, then
        v_j = 2·Σbits_j − n_words per doc (the same integer as the
        per-row Σ(2b−1)).  Zero-word docs hash to 0, exactly as
        :meth:`simhash`."""
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "simhash": pa.array([], pa.int64()),
                }
            )
        arr, lens = _batch_token_lists(batch.column("text"))
        flat = arr.values
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_rep = doc_rep[keep]
        words = flat.filter(pa.array(keep))
        out = np.zeros(n, np.uint64)
        if len(doc_rep):
            from . import polars_mod

            pl = polars_mod()
            hs = pl.from_arrow(words).hash(seed=0).to_numpy().astype(np.uint64)
            shifts = np.arange(64, dtype=np.uint64)
            bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            # reduceat is only sound over non-empty segments: reduce the
            # docs that have words, scatter back by doc row
            starts = np.flatnonzero(np.r_[True, doc_rep[1:] != doc_rep[:-1]])
            sums = np.add.reduceat(bits, starts, axis=0)
            docs_with = doc_rep[starts]
            counts = np.diff(np.r_[starts, len(doc_rep)]).astype(np.int64)
            v = 2 * sums - counts[:, None]
            packed = ((v > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1)
            out[docs_with] = packed
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out.astype(np.int64), pa.int64()),
            }
        )


def simhash_candidates(
    docs: ray.data.Dataset, max_hamming: int = 3, max_bucket: int = 2000
) -> ray.data.Dataset:
    """Near-dup candidates: band the 64-bit simhash into 4×16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ one identical chunk), bucket by
    chunk, pair within buckets, verify hamming distance exactly.

    Buckets above ``max_bucket`` (e.g. boilerplate/empty docs sharing a
    chunk) are truncated after a deterministic sort and the dropped-id
    count is carried on every pair of that bucket via the ``truncated``
    column (no-silent-caps rule; bounds the in-bucket O(B²) pairing —
    r1 VERDICT finding #5)."""
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=(1, 4)
    )

    def explode(t: pa.Table) -> pa.Table:
        h = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        bands_, keys_, docs_, hs_ = [], [], [], []
        for b in range(4):
            chunk = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bands_.append(np.full(len(h), b, np.int64))
            keys_.append(chunk.astype(np.int64))
            docs_.append(doc)
            hs_.append(h.astype(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands_)),
                "key": pa.array(np.concatenate(keys_)),
                "doc_id": pa.array(np.concatenate(docs_)),
                "simhash": pa.array(np.concatenate(hs_)),
            }
        )

    rows = sigs.map_batches(explode, batch_format="pyarrow")

    from ray.data.aggregate import Max, Min

    from . import NUM_PARTITIONS_DEFAULT as _NP
    from .shuffle import segment_starts, triu_pair_indices

    def pairs_block(t: pa.Table):
        """Vectorized bucket pairing across every (band, key) bucket of
        a co-located block (the candidate_pairs kernel shape plus the
        bytewise-popcount hamming verify)."""
        if t.num_rows == 0 or "band" not in t.schema.names:
            return
        band = t.column("band").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        hsh = t.column("simhash").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, key, band))
        band, key, doc, hsh = band[order], key[order], doc[order], hsh[order]
        new = np.r_[
            True,
            (band[1:] != band[:-1]) | (key[1:] != key[:-1]) | (doc[1:] != doc[:-1]),
        ]
        band, key, doc, hsh = band[new], key[new], doc[new], hsh[new]
        starts, sizes = segment_starts(band, key)
        dropped = np.maximum(sizes - max_bucket, 0)
        local = np.arange(len(doc), dtype=np.int64) - np.repeat(starts, sizes)
        cap = local < max_bucket
        doc, hsh = doc[cap], hsh[cap]
        a_idx, b_idx, seg = triu_pair_indices(np.minimum(sizes, max_bucket))
        if len(a_idx) == 0:
            return
        # vectorized popcount of the XOR (bytewise table lookup)
        x = (hsh[a_idx].astype(np.uint64) ^ hsh[b_idx].astype(np.uint64))
        ham = np.zeros(len(x), np.int64)
        for shift in range(0, 64, 8):
            ham += _POPCNT8[(x >> np.uint64(shift)) & np.uint64(0xFF)]
        keep = ham <= max_hamming
        if not keep.any():
            return
        yield pa.table(
            {
                "a": pa.array(doc[a_idx][keep]),
                "b": pa.array(doc[b_idx][keep]),
                "hamming": pa.array(ham[keep]),
                "truncated": pa.array(dropped[seg][keep]),
            }
        )

    p = rows.repartition(_NP, keys=["band", "key"]).map_batches(
        pairs_block, batch_size=None, batch_format="pyarrow"
    )
    out = p.groupby(["a", "b"]).aggregate(Min("hamming"), Max("truncated"))
    return out.map_batches(
        lambda t: t.rename_columns(["a", "b", "hamming", "truncated"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# fuzzy pairing via deletion-neighborhood blocking (SymSpell/FastSS idea)
# ---------------------------------------------------------------------------


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check (the verify kernel — runs only on
    blocked candidates, never all-pairs)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_name_pairs(sf_dir: str) -> ray.data.Dataset:
    """Distinct part-name pairs within edit distance 1 — fuzzy (typo)
    dedup via deletion-neighborhood blocking: two strings are within
    one edit iff they share a key in {x} ∪ deletions₁(x), so each
    DISTINCT name emits |name|+1 keys, candidates pair only inside a
    key bucket, and the exact edit-distance kernel verifies (no false
    negatives by construction; blocking false positives are filtered).
    All-pairs never happens — neither over the corpus (the variant
    expansion runs on the REDUCED distinct-name table) nor inside a
    bucket (bucket size is bounded by alphabet × name length).
    SQL oracle: brute-force levenshtein over the distinct names."""
    from .relational import _read
    from .shuffle import keyed_reagg

    def block_distinct(t: pa.Table):
        if len(t) == 0:
            return
        yield t.select(["p_name"]).group_by(["p_name"]).aggregate([])

    names = keyed_reagg(
        _read(sf_dir, "part", ["p_name"]).map_batches(
            block_distinct, batch_format="pyarrow"
        ),
        ["p_name"], [], NUM_PARTITIONS_DEFAULT,
    )

    def variants(t: pa.Table):
        if t.num_rows == 0 or "p_name" not in t.schema.names:
            return
        ks, ns = [], []
        for nm in t.column("p_name").to_pylist():  # reduced vocab table
            ks.append(nm)
            ns.append(nm)
            for i in range(len(nm)):
                ks.append(nm[:i] + nm[i + 1:])
                ns.append(nm)
        yield pa.table({"variant": pa.array(ks), "nm": pa.array(ns)})

    co = names.map_batches(variants, batch_format="pyarrow").repartition(
        NUM_PARTITIONS_DEFAULT, keys=["variant"]
    )

    def bucket_pairs(t: pa.Table):
        if t.num_rows == 0 or "variant" not in t.schema.names:
            return
        var = np.asarray(t.column("variant").to_pylist(), dtype=object)
        nm = np.asarray(t.column("nm").to_pylist(), dtype=object)
        order = np.lexsort((nm, var))
        var, nm = var[order], nm[order]
        starts = np.flatnonzero(np.r_[True, var[1:] != var[:-1]])
        ends = np.r_[starts[1:], len(var)]
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            grp = nm[s:e]
            for i in range(len(grp)):
                for j in range(i + 1, len(grp)):
                    if grp[i] != grp[j]:
                        a_out.append(grp[i])
                        b_out.append(grp[j])
        if not a_out:
            return
        g = pa.table(
            {"name_a": pa.array(a_out), "name_b": pa.array(b_out)}
        ).group_by(["name_a", "name_b"]).aggregate([])
        yield g.rename_columns(["name_a", "name_b"])

    cand = keyed_reagg(
        co.map_batches(bucket_pairs, batch_size=None, batch_format="pyarrow"),
        ["name_a", "name_b"], [], NUM_PARTITIONS_DEFAULT,
    )

    def verify(t: pa.Table):
        if t.num_rows == 0 or "name_a" not in t.schema.names:
            return
        a = t.column("name_a").to_pylist()
        b = t.column("name_b").to_pylist()
        keep = [_ed_le1(x, y) for x, y in zip(a, b)]
        t = t.filter(pa.array(keep))
        if len(t):
            yield t

    return cand.map_batches(verify, batch_format="pyarrow")


FUZZY_NAME_PAIRS_SQL = """
WITH n AS (SELECT DISTINCT p_name AS nm FROM part)
SELECT a.nm AS name_a, b.nm AS name_b
FROM n a, n b
WHERE a.nm < b.nm AND levenshtein(a.nm, b.nm) <= 1
"""


# ---------------------------------------------------------------------------
# SQL-exact MinHash (splitmix64 over token-id shingles)
# ---------------------------------------------------------------------------

MINHASH_EXACT_PERMS = 8
MINHASH_EXACT_RPB = 4  # rows per LSH band -> 2 bands at 8 permutations


def minhash_exact_seeds(num_perm: int = MINHASH_EXACT_PERMS) -> np.ndarray:
    """Per-permutation salt: splitmix64(p + 1), p = 0..num_perm-1.
    Computed once host-side and inlined as literals into the SQL
    oracle, so both engines use the identical salt table."""
    from .sketch import splitmix64

    return splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))


def _sorted_vocab_ref(sf_dir: str):
    """ObjectRef of the ascending global distinct token array — the
    domain of the SQL side's ``DENSE_RANK() OVER (ORDER BY tok)``
    (tokens are ASCII, so numpy codepoint order == arrow binary sort
    order == DuckDB binary collation; same caveat as before).

    r5 (r4 VERDICT item #1): the r2–r4 path pulled every distinct
    token to the driver with take_all and ran an object-dtype np.sort
    there — a serial phase that scaled at 0.44 in the r4 jaccard phase
    table.  Now the sort is Ray's DISTRIBUTED range sort and the
    concat is ONE remote task over the sorted block refs; the driver
    never holds the array, and workers resolve the ref through the
    per-process :func:`_bcast_value` cache.  ``assemble`` RAISES if
    the concatenated array is ever not strictly ascending
    (no-silent-caps: correctness rests on Ray's sorted block order,
    so a violated assumption must fail loudly, not re-sort
    silently)."""
    import ray as _ray

    from .terms import _read_docs

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
        yield pa.table({"tok": pc.unique(vals)})

    ds = (
        _read_docs(sf_dir)
        .map_batches(uni, batch_format="pyarrow")
        .groupby("tok")
        .count()
        .sort("tok")
    )

    @_ray.remote
    def assemble(*tables) -> np.ndarray:
        parts = [
            t.column("tok").to_numpy(zero_copy_only=False)
            for t in tables
            if t.num_rows and "tok" in t.schema.names
        ]
        if not parts:
            return np.array([], dtype=object)
        out = np.concatenate(parts)
        if len(out) > 1 and (out[1:] <= out[:-1]).any():
            raise ValueError(
                "_sorted_vocab_ref: sorted block order violated — the "
                "range-sort output blocks are no longer globally "
                "ascending/distinct"
            )
        return out

    return assemble.remote(*ds.to_arrow_refs())


def _sorted_vocab(sf_dir: str) -> np.ndarray:
    """Driver-side materialization of :func:`_sorted_vocab_ref` (kept
    for the vocab-bounded driver consumers: lm.bigram_lm_perplexity,
    terms.doc_unigram_rarity — their scoring state is a driver-built
    broadcast either way)."""
    return ray.get(_sorted_vocab_ref(sf_dir))


def _block_exact_sigs(
    t: pa.Table, vocab: np.ndarray, seeds: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc exact-minhash matrix for one block: returns
    (doc_ids[ndoc], mins[ndoc, P] uint64).  A document is ONE parquet
    row, so every shingle of a doc lands in the same block and the
    per-doc minima are complete block-locally — zero shuffle.  min
    over the shingle multiset equals min over the set, so no distinct
    pass is needed.  Shingle key sm64(sm64(sm64(t0)^t1)^t2) over word
    3-grams of 1-based alphabetic token ranks; minhash_p =
    min sm64(shingle ^ seed_p)."""
    from .sketch import splitmix64

    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
    )
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
    vals = arr.values
    keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    terms = vals.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    didx = doc_idx[keep]
    empty = (np.array([], np.int64), np.zeros((0, len(seeds)), np.uint64))
    if len(terms) < 3:
        return empty
    tid = (np.searchsorted(vocab, terms) + 1).astype(np.uint64)
    m = (didx[:-2] == didx[1:-1]) & (didx[1:-1] == didx[2:])
    if not m.any():
        return empty
    sh = splitmix64(
        splitmix64(splitmix64(tid[:-2][m]) ^ tid[1:-1][m]) ^ tid[2:][m]
    )
    gdoc = didx[:-2][m]
    starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[gdoc[starts]]
    mins = np.empty((len(starts), len(seeds)), np.uint64)
    for p, seed in enumerate(seeds):
        mins[:, p] = np.minimum.reduceat(splitmix64(sh ^ seed), starts)
    return doc_ids.astype(np.int64), mins


def minhash_sigs_exact(
    sf_dir: str, num_perm: int = MINHASH_EXACT_PERMS
) -> ray.data.Dataset:
    """(doc_id, perm, minhash) — deterministic MinHash signature rows
    whose every bit is reproducible in ANSI SQL (unlike ``MinHasher``,
    whose shingle hash is polars xxhash).  The only global step is the
    vocab-bounded token-rank reduce; signatures are block-local."""
    from .terms import _read_docs

    vocab_ref = _sorted_vocab_ref(sf_dir)
    seeds = minhash_exact_seeds(num_perm)

    def sigs(t: pa.Table):
        if len(t) == 0:
            return
        doc_ids, mins = _block_exact_sigs(t, _bcast_value(vocab_ref), seeds)
        if len(doc_ids) == 0:
            return
        n, p = mins.shape
        yield pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, p)),
                "perm": pa.array(np.tile(np.arange(p, dtype=np.int64), n)),
                "minhash": pa.array(mins.ravel().view(np.int64)),
            }
        )

    return _read_docs(sf_dir).map_batches(sigs, batch_format="pyarrow")


def simhash_sigs_exact(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, simhash) — a 64-bit SimHash signature whose every bit
    is ANSI-SQL reproducible (unlike ``simhash_pairs``, whose token
    hash is polars xxhash): feature = whitespace token with
    multiplicity weight, feature hash = splitmix64(alphabetical token
    rank) — the minhash_sigs_exact vocab chain — and bit b is set iff
    ``2·Σ_{tok: bit_b(h)=1} cnt > Σ cnt`` (strict integer majority;
    exact halves → 0 identically on both sides, no float weights).

    Scale shape: the only global step is the vocab-bounded token-rank
    reduce (broadcast); signatures are block-local (a document is ONE
    parquet row) — zero shuffle.  Empty/token-less docs emit no row on
    either side."""
    from .sketch import splitmix64
    from .terms import _read_docs

    vocab_ref = _sorted_vocab_ref(sf_dir)

    def sigs(t: pa.Table):
        if len(t) == 0:
            return
        vocab = _bcast_value(vocab_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
        vals = arr.values
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        terms = vals.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
        didx = doc_idx[keep]
        if len(terms) == 0:
            return
        tid = (np.searchsorted(vocab, terms) + 1).astype(np.uint64)
        # (doc, tid) multiplicities via one lexsort + run-length
        o = np.lexsort((tid, didx))
        d_s, t_s = didx[o], tid[o]
        new = np.r_[True, (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(d_s)]).astype(np.int64)
        gdoc, utid = d_s[starts], t_s[starts]
        h = splitmix64(utid)
        dstarts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        tot = np.add.reduceat(cnt, dstarts)
        sig = np.zeros(len(dstarts), np.uint64)
        for b in range(64):
            sb = np.add.reduceat(
                cnt * ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64),
                dstarts,
            )
            sig |= (2 * sb > tot).astype(np.uint64) << np.uint64(b)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[
            gdoc[dstarts]
        ]
        yield pa.table(
            {
                "doc_id": pa.array(doc_ids.astype(np.int64)),
                "simhash": pa.array(sig.view(np.int64)),
            }
        )

    return _read_docs(sf_dir).map_batches(sigs, batch_format="pyarrow")


def lsh_band_keys(
    sf_dir: str,
    num_perm: int = MINHASH_EXACT_PERMS,
    rows_per_band: int = MINHASH_EXACT_RPB,
) -> ray.data.Dataset:
    """(doc_id, band, band_hash) — banded LSH bucket keys folded from
    the exact-minhash signature: acc = sm64(m0); acc = sm64(acc ^ m_j)
    for the remaining rows of the band.  Docs sharing a band_hash are
    LSH candidates; the fold is SQL-reproducible so the bucketing
    itself is oracle-checked, not just its row count."""
    from .sketch import splitmix64
    from .terms import _read_docs

    assert num_perm % rows_per_band == 0
    vocab_ref = _sorted_vocab_ref(sf_dir)
    seeds = minhash_exact_seeds(num_perm)
    bands = num_perm // rows_per_band

    def keys(t: pa.Table):
        if len(t) == 0:
            return
        doc_ids, mins = _block_exact_sigs(t, _bcast_value(vocab_ref), seeds)
        n = len(doc_ids)
        if n == 0:
            return
        hashes = np.empty((n, bands), np.uint64)
        for b in range(bands):
            acc = splitmix64(mins[:, b * rows_per_band])
            for j in range(1, rows_per_band):
                acc = splitmix64(acc ^ mins[:, b * rows_per_band + j])
            hashes[:, b] = acc
        yield pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids.astype(np.int64), bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_hash": pa.array(hashes.ravel().view(np.int64)),
            }
        )

    return _read_docs(sf_dir).map_batches(keys, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH candidate pairs + exact shingle-set Jaccard (the dedup-eval loop)
# ---------------------------------------------------------------------------

LSH_BUCKET_GUARD = 4096


def _block_shingle_rows(t: pa.Table, vocab: np.ndarray):
    """Per-doc DISTINCT shingle hashes for one block: (doc_ids, sh)
    row-aligned arrays.  Same shingle chain as ``_block_exact_sigs``;
    a document is ONE parquet row, so block-local distinct IS global
    distinct."""
    from .sketch import splitmix64

    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
    )
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(arr)), np.diff(offsets))
    vals = arr.values
    keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    terms = vals.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    didx = doc_idx[keep]
    empty = (np.array([], np.int64), np.array([], np.uint64))
    if len(terms) < 3:
        return empty
    tid = (np.searchsorted(vocab, terms) + 1).astype(np.uint64)
    m = (didx[:-2] == didx[1:-1]) & (didx[1:-1] == didx[2:])
    if not m.any():
        return empty
    sh = splitmix64(
        splitmix64(splitmix64(tid[:-2][m]) ^ tid[1:-1][m]) ^ tid[2:][m]
    )
    gdoc = didx[:-2][m]
    o = np.lexsort((sh, gdoc))
    gdoc, sh = gdoc[o], sh[o]
    uniq = np.r_[True, (gdoc[1:] != gdoc[:-1]) | (sh[1:] != sh[:-1])]
    gdoc, sh = gdoc[uniq], sh[uniq]
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[gdoc]
    return doc_ids.astype(np.int64), sh


JJ_CAND_ID_LIMIT = 2_000_000  # candidate doc-id broadcast guard (ids)


def _corpus_blob_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n, blob) — every document's sorted DISTINCT shingle
    hashes packed into ONE little-endian int64 binary blob, straight
    from the corpus scan, materialized ONCE (lineage cut).

    r5 restructure (r4 VERDICT item #1): the r3/r4 chain materialized
    a 32-byte-per-value (doc_id, shingle, n, rank) ranked table and
    re-derived doc-complete blocks with doc-boundary chunking; since a
    document is ONE parquet row, the per-doc sets are already complete
    in the scan block itself, so the blob rows are built right there —
    the materialized artifact drops to 8 bytes/value (~4x less plasma;
    the 4.3 GB ranked-table materialize scaled at 0.66 in the r4 phase
    table) and the chunking machinery has nothing left to guard.
    Every downstream view unpacks block-locally: the PPJoin prefix
    rows (rank < p(n)), per-doc sizes (the n column), and the verify
    lookup arrays (:func:`_blob_lookup_refs`).  A BINARY column is
    acero-joinable (list<> payloads are not — the repo's standing
    workaround), so the at-scale verify fallback joins it directly.
    Vocab ranks arrive via :func:`_sorted_vocab_ref` (distributed
    sort; the scan blocks on the assemble task, overlapping the read
    — the old serial driver-sort phase is gone)."""
    from .shuffle import materialize_cut, segment_starts
    from .terms import _read_docs

    vocab_ref = _sorted_vocab_ref(sf_dir)

    def blobs(t: pa.Table):
        if len(t) == 0:
            return
        doc_ids, sh = _block_shingle_rows(t, _bcast_value(vocab_ref))
        if len(doc_ids) == 0:
            return
        starts, sizes = segment_starts(doc_ids)
        offsets = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(sizes * 8, out=offsets[1:])
        blob = pa.Array.from_buffers(
            pa.large_binary(), len(starts),
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(sh.view(np.int64).astype("<i8").tobytes())],
        )
        yield pa.table(
            {
                "doc_id": pa.array(doc_ids[starts]),
                "n": pa.array(sizes.astype(np.int64)),
                "blob": blob,
            }
        )

    return materialize_cut(
        _read_docs(sf_dir).map_batches(blobs, batch_format="pyarrow")
    )


def _candidate_doc_ids(cand: ray.data.Dataset) -> np.ndarray | None:
    """Distinct doc ids of a MATERIALIZED (da, db) candidate-pair
    dataset, or None when 2*pairs exceeds JJ_CAND_ID_LIMIT — the
    driver pull is bounded by the guard, never O(corpus)."""
    if 2 * cand.count() > JJ_CAND_ID_LIMIT:
        return None
    parts = []
    for bt in cand.iter_batches(batch_format="pyarrow"):
        if bt.num_rows:
            parts.append(bt.column("da").to_numpy(zero_copy_only=False))
            parts.append(bt.column("db").to_numpy(zero_copy_only=False))
    if not parts:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(parts))


def _blob_values(col) -> tuple:
    """Decode a large_binary column of int64 blobs into (counts,
    values) — per-row element counts and the flat value array —
    zero-copy from the arrow buffers."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_buf, dat_buf = arr.buffers()[1], arr.buffers()[2]
    off = np.frombuffer(off_buf, np.int64)[
        arr.offset: arr.offset + len(arr) + 1
    ]
    vals = np.frombuffer(dat_buf, np.int64, count=len(dat_buf) // 8)
    return np.diff(off) // 8, vals[off[0] // 8: off[-1] // 8]


def _merge_inter_counts(
    n_pairs: int,
    cnt_a: np.ndarray,
    va: np.ndarray,
    cnt_b: np.ndarray,
    vb: np.ndarray,
) -> np.ndarray:
    """|A∩B| per pair from the two ragged value arrays: concat both
    sides tagged by pair index, ONE lexsort, count adjacent duplicates
    — each side's values are distinct, so cross-side duplicates ARE
    the intersection."""
    pid = np.concatenate(
        [
            np.repeat(np.arange(n_pairs, dtype=np.int64), cnt_a),
            np.repeat(np.arange(n_pairs, dtype=np.int64), cnt_b),
        ]
    )
    vv = np.concatenate([va, vb])
    o = np.lexsort((vv, pid))
    pid, vv = pid[o], vv[o]
    dup = (pid[1:] == pid[:-1]) & (vv[1:] == vv[:-1])
    return np.bincount(pid[1:][dup], minlength=n_pairs).astype(np.int64)


# Broadcast-regime guards for the verify lookup arrays.  r5 raise
# (was 4M docs / 256M values): the arrays are assembled in a REMOTE
# task and consumed via plasma zero-copy mmap — ONE copy per node,
# never a per-worker or driver-heap copy — so the bound is the
# per-node object store (≈38 GB on this box; 1B values = 8 GB flat),
# not driver memory.  The r4 limits were relics of the pre-r4
# driver-pull assembly and silently pushed the 5.12M-doc bench onto
# the join fallback, which ships a PER-PAIR blob copy through the
# pair-keyed shuffle (~28 GB at 30M candidates — measured 140 s of a
# 211 s wall).  Above these limits the fallback remains the genuine
# cluster-scale path (a corpus whose per-doc sets exceed a node's
# store cannot broadcast).
JJ_BLOB_BCAST_LIMIT = 16_000_000  # docs: sorted-lookup-array guard
JJ_BLOB_VALUES_LIMIT = 1_000_000_000  # Σ shingle values (8 GB flat int64)
JJ_BUILD_CHUNK_VALUES = 32_000_000  # reorder-gather chunk (build task)
JJ_VERIFY_CHUNK_VALUES = 8_000_000  # Σ(|A|+|B|) gathered per sub-batch (~64 MB)


def _blob_lookup_refs(blobs: ray.data.Dataset):
    """Driver-side sorted lookup arrays for a blob table within the
    broadcast guards: returns (refs, materialized_blobs) where refs is
    a 4-tuple of ray.put handles (doc_ids, sizes, value_starts,
    flat_values) or None above a guard — the caller reuses the
    materialized table for the join fallback either way.  TWO guards,
    because doc count alone does not bound the pull: docs ≤
    JJ_BLOB_BCAST_LIMIT AND total shingle values ≤
    JJ_BLOB_VALUES_LIMIT (the flat array is Σn × 8 B — a long-doc
    corpus can blow the driver at a doc count the first guard allows).
    Plasma holds ONE shared copy per node, so worker-side ray.get is
    zero-copy.  This replaces an acero broadcast join that would
    re-build a corpus-size hash table per batch — the per-doc set
    fetch is a unique-key LOOKUP, which searchsorted does in O(log n)
    per probe with no build cost."""
    import ray as _ray

    from .shuffle import materialize_cut

    m = materialize_cut(blobs)
    if m.count() > JJ_BLOB_BCAST_LIMIT:
        return None, m
    if (m.sum("n") or 0) > JJ_BLOB_VALUES_LIMIT:
        return None, m

    # assemble the sorted lookup arrays in ONE remote task straight
    # from the blob block refs (num_returns=4 → each array is its own
    # plasma object).  The pre-r4 driver-side iter_batches pull +
    # re-put measured 9.9 s SERIAL at 2.56M docs (1.07 GB round-trip)
    # — pure non-scaling wall on both legs of the scaling ratio.
    # chunk size resolved DRIVER-side and closed over (worker-side
    # module-global reads defeat test monkeypatches — the r4 lesson)
    chunk_vals = JJ_BUILD_CHUNK_VALUES

    @_ray.remote(num_returns=4)
    def build(*tables):
        ids, ns, vals = [], [], []
        for bt in tables:
            if bt.num_rows:
                ids.append(
                    bt.column("doc_id").to_numpy(zero_copy_only=False)
                )
                ns.append(bt.column("n").to_numpy(zero_copy_only=False))
                vals.append(_blob_values(bt.column("blob"))[1])
        if not ids:
            z = np.zeros(0, np.int64)
            return z, z, z, z
        doc = np.concatenate(ids)
        n = np.concatenate(ns)
        flat = np.concatenate(vals)
        starts = np.cumsum(n) - n
        o = np.argsort(doc, kind="stable")
        doc_s, n_s = doc[o], n[o]
        src_starts = starts[o]
        cum = np.cumsum(n_s)
        out_starts = cum - n_s
        # CHUNKED reorder gather (r5 review finding): a one-shot
        # `flat[take]` with its arange/repeat temporaries holds ~5
        # full-size int64 copies in this ONE worker heap — ~40 GB at
        # the 1B-value guard.  Chunking bounds the temporaries at
        # ~3 × 32M values (~0.8 GB) so peak ≈ flat + out + ε.
        total = int(cum[-1])
        out = np.empty(total, np.int64)
        lo = 0
        while lo < len(doc_s):
            hi = int(
                np.searchsorted(cum, out_starts[lo] + chunk_vals, "left")
            ) + 1
            hi = min(max(hi, lo + 1), len(doc_s))
            nseg = n_s[lo:hi]
            ccum = cum[lo:hi] - out_starts[lo]
            take = np.repeat(src_starts[lo:hi], nseg) + (
                np.arange(int(ccum[-1]), dtype=np.int64)
                - np.repeat(ccum - nseg, nseg)
            )
            out[out_starts[lo]: out_starts[lo] + int(ccum[-1])] = flat[
                take
            ]
            lo = hi
        return doc_s, n_s, out_starts, out

    return tuple(build.remote(*m.to_arrow_refs())), m


def _verify_candidate_pairs(
    cand: ray.data.Dataset,
    blobs: ray.data.Dataset,
    P: int,
) -> ray.data.Dataset:
    """Exact intersection/size columns for candidate pairs: returns
    (da, db, i, na, n) — |A∩B|, |A|, |B| — from a materialized
    candidate dataset and the :func:`_corpus_blob_table`.

    Scale shape: the per-doc shingle sets are a UNIQUE-KEY lookup, not
    a general join, so when the corpus fits JJ_BLOB_BCAST_LIMIT docs
    the sorted (doc_id, sizes, offsets, flat values) arrays broadcast
    ONCE via ray.put (plasma shared memory — one copy per node, zero
    per-worker copies) and the whole verify is a block-local
    searchsorted + segmented gather over candidate pairs with ZERO
    wide exchange.  Above the guard it degrades to two pair-keyed
    hash joins of the blob table (binary column — acero-joinable where
    list<> payloads are not) whose payload is one blob per row, never
    a Σ|A|-row expansion.  Intersection counts are one lexsort +
    adjacent-dup count per block (each side's values are distinct, so
    duplicates across the concatenated sides ARE the intersection).
    Pairs sharing no shingle come out with i = 0 naturally — no
    special casing for LSH's false-positive candidates.

    SUFFIX FILTER (r5, r4 VERDICT item #2 — PPJoin+ family, Xiao et
    al. WWW'08): when the candidate rows carry the positional stats
    (c, ra, rb) from the prefix-posting re-agg, the overlap decomposes
    EXACTLY as ``c + |A[ra+1:] ∩ B[rb+1:]|`` — every shared shingle at
    or below the largest shared prefix hash is in both prefixes (so
    counted in c), and every one above it has rank > ra / > rb on its
    side.  Before gathering anything, a k-quantile-probe partition
    bound on the two suffixes (rayrank.ragged.suffix_overlap_bound —
    soundness property-tested) prunes every pair that provably cannot
    reach i_min = ceil(tau·(na+nb)/(1+tau)); survivors gather and
    merge ONLY their suffixes.  Pruned pairs emit i = 0 — their true
    overlap is < i_min, so the caller's threshold filter drops them
    either way (result-invariance is pinned in
    tests/test_jaccard_suffix_filter.py)."""
    import ray as _ray

    from .joins import broadcast_semi_filter, join_auto
    from .ragged import suffix_overlap_bound

    refs, blobs = _blob_lookup_refs(blobs)
    # driver-resolved and closed over as a plain int — a worker-side
    # module-global read would defeat the test suite's monkeypatch
    # (cloudpickle ships module functions by reference; the r4 lesson)
    n_probes = JJ_SUFFIX_PROBES

    if refs is not None:
        kd_ref, kn_ref, kst_ref, kv_ref = refs

        def lookup_verify(t: pa.Table):
            if t.num_rows == 0 or "da" not in t.schema.names:
                return
            kd = _ray.get(kd_ref)
            kn = _ray.get(kn_ref)
            kst = _ray.get(kst_ref)
            kv = _ray.get(kv_ref)

            def idx_of(doc_col):
                d = doc_col.to_numpy(zero_copy_only=False)
                idx = np.searchsorted(kd, d)
                if not np.array_equal(kd[np.minimum(idx, len(kd) - 1)], d):
                    raise ValueError(
                        "verify lookup: candidate doc id missing from "
                        "the blob table"
                    )
                return idx

            def gather(starts, cnt):
                cum = np.cumsum(cnt)
                take = np.repeat(starts, cnt) + (
                    np.arange(int(cum[-1]) if len(cum) else 0, dtype=np.int64)
                    - np.repeat(cum - cnt, cnt)
                )
                return kv[take]

            def merge_chunked(out_i, rows, starts_a, len_a, starts_b, len_b):
                """Chunked gather + merge-count into out_i[rows]: peak
                gathered-value memory stays bounded by
                JJ_VERIFY_CHUNK_VALUES regardless of how many candidate
                pairs land in one block (batch_size=None means a hot
                candidate partition arrives as ONE table)."""
                ccum = np.cumsum(len_a + len_b)
                lo, base = 0, 0
                while lo < len(rows):
                    hi = int(
                        np.searchsorted(
                            ccum, base + JJ_VERIFY_CHUNK_VALUES, "right"
                        )
                    )
                    hi = min(max(hi, lo + 1), len(rows))
                    sl = slice(lo, hi)
                    va = gather(starts_a[sl], len_a[sl])
                    vb = gather(starts_b[sl], len_b[sl])
                    out_i[rows[sl]] = _merge_inter_counts(
                        hi - lo, len_a[sl], va, len_b[sl], vb
                    )
                    base = int(ccum[hi - 1])
                    lo = hi

            ia = idx_of(t.column("da"))
            ib = idx_of(t.column("db"))
            cnt_a, cnt_b = kn[ia], kn[ib]
            out_i = np.zeros(len(t), np.int64)
            if {"c", "ra", "rb"} <= set(t.schema.names):
                c = t.column("c").to_numpy(zero_copy_only=False)
                ra = t.column("ra").to_numpy(zero_copy_only=False)
                rb = t.column("rb").to_numpy(zero_copy_only=False)
                sa = kst[ia] + ra + 1
                la = cnt_a - ra - 1
                sb = kst[ib] + rb + 1
                lb = cnt_b - rb - 1
                # probe from the SHORTER suffix: finer quantile cuts
                # per probe; the bound is symmetric in the two sets
                swap = lb < la
                psa = np.where(swap, sb, sa)
                pla = np.where(swap, lb, la)
                psb = np.where(swap, sa, sb)
                plb = np.where(swap, la, lb)
                i_min = (
                    JJ_TAU_NUM * (cnt_a + cnt_b)
                    + JJ_TAU_NUM + JJ_TAU_DEN - 1
                ) // (JJ_TAU_NUM + JJ_TAU_DEN)
                bnd = c + suffix_overlap_bound(
                    kv.view(np.uint64), psa, pla, psb, plb, n_probes
                )
                live = np.flatnonzero(bnd >= i_min)
                merge_chunked(
                    out_i, live, sa[live], la[live], sb[live], lb[live]
                )
                out_i[live] += c[live]
            else:
                # no positional stats (LSH candidates): full-set merge
                rows = np.arange(len(t), dtype=np.int64)
                merge_chunked(
                    out_i, rows, kst[ia], cnt_a, kst[ib], cnt_b
                )
            yield pa.table(
                {
                    "da": t.column("da"),
                    "db": t.column("db"),
                    "i": pa.array(out_i),
                    "na": pa.array(cnt_a),
                    "n": pa.array(cnt_b),
                }
            )

        return cand.map_batches(
            lookup_verify, batch_size=None, batch_format="pyarrow"
        )

    # at-scale fallback: blob table too big to broadcast — candidate-
    # filter the ALREADY-MATERIALIZED blob rows when the id set fits
    # the guard (one cheap row filter; no repacking from the ranked
    # table), then two partitioned joins, one blob per row
    ids = _candidate_doc_ids(cand)
    if ids is not None:
        blobs = broadcast_semi_filter(blobs, ids, "doc_id", True)

    def as_a(t: pa.Table):
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return
        yield t.select(["doc_id", "n", "blob"]).rename_columns(
            ["doc_id", "na", "blob_a"]
        )

    def as_b(t: pa.Table):
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return
        yield t.select(["doc_id", "n", "blob"]).rename_columns(
            ["doc_id", "n", "blob_b"]
        )

    # LEFT joins so a candidate pair whose doc is missing from the
    # blob table surfaces as a null blob and RAISES below — the same
    # invariant violation raises ValueError on the broadcast-lookup
    # path, and the two regimes must fail identically on identical
    # corruption (an inner join would silently drop the pair)
    j1 = join_auto(
        cand, blobs.map_batches(as_a, batch_format="pyarrow"),
        on=("da",), right_on=("doc_id",), how="left_outer",
        num_partitions=P,
    )
    j2 = join_auto(
        j1, blobs.map_batches(as_b, batch_format="pyarrow"),
        on=("db",), right_on=("doc_id",), how="left_outer",
        num_partitions=P,
    )

    def count_inter(t: pa.Table):
        if t.num_rows == 0 or "blob_a" not in t.schema.names:
            return
        if (
            t.column("blob_a").null_count
            or t.column("blob_b").null_count
        ):
            raise ValueError(
                "verify lookup: candidate doc id missing from "
                "the blob table"
            )
        cnt_a, va = _blob_values(t.column("blob_a"))
        cnt_b, vb = _blob_values(t.column("blob_b"))
        i = _merge_inter_counts(len(t), cnt_a, va, cnt_b, vb)
        yield pa.table(
            {
                "da": t.column("da"),
                "db": t.column("db"),
                "i": pa.array(i),
                "na": t.column("na"),
                "n": t.column("n"),
            }
        )

    return j2.map_batches(count_inter, batch_format="pyarrow")


def _empty_jaccard_table() -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "inter_size": pa.array([], pa.int64()),
            "union_size": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )


def lsh_candidate_jaccard(sf_dir: str) -> ray.data.Dataset:
    """(doc_a, doc_b, inter_size, union_size, jaccard) — the complete
    near-dup evaluation loop, every stage oracle-checkable: exact
    minhash signatures → banded LSH bucket keys → in-bucket candidate
    pairs → EXACT shingle-set Jaccard per candidate.  This is the
    measurement that tells a pipeline owner whether their LSH band
    settings over- or under-merge before they commit to a dedup run.

    Scale shape: ONE (band, band_hash)-keyed repartition forms
    buckets; pair fan-out is bounded by the bucket-size guard
    (LSH_BUCKET_GUARD — raises rather than silently truncating, per
    the repo's no-silent-caps rule; production corpora with hot
    buckets should use the capped+flagged ``candidate_pairs`` path);
    the verify phase is the blob-broadcast merge-count
    (_verify_candidate_pairs — block-local lookup, zero wide
    exchange at this corpus scale).  The only float op is ONE double
    division of two exact int64s, restated identically in SQL."""
    from .shuffle import keyed_reagg, segment_starts, triu_pair_indices

    P = NUM_PARTITIONS_DEFAULT
    bands = lsh_band_keys(sf_dir)
    co = bands.repartition(P, keys=["band", "band_hash"])

    def pairs(t: pa.Table):
        if t.num_rows == 0 or "band_hash" not in t.schema.names:
            return
        b = t.column("band").to_numpy(zero_copy_only=False)
        h = t.column("band_hash").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        o = np.lexsort((d, h, b))
        b, h, d = b[o], h[o], d[o]
        _, sizes = segment_starts(b, h)
        if sizes.size and int(sizes.max()) > LSH_BUCKET_GUARD:
            raise ValueError(
                f"LSH bucket of size {int(sizes.max())} exceeds guard "
                f"{LSH_BUCKET_GUARD}; raise the guard or use the "
                "capped+flagged candidate_pairs path"
            )
        ii, jj, _ = triu_pair_indices(sizes)
        if len(ii) == 0:
            return
        # d ascending within each bucket ⇒ d[ii] < d[jj] already
        g = (
            pa.table({"da": pa.array(d[ii]), "db": pa.array(d[jj])})
            .group_by(["da", "db"])
            .aggregate([])
        )
        yield g.rename_columns(["da", "db"])

    cand = keyed_reagg(
        co.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        ["da", "db"], [], P,
    ).materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(_empty_jaccard_table())

    j2 = _verify_candidate_pairs(cand, _corpus_blob_table(sf_dir), P)

    def fin(t: pa.Table):
        if t.num_rows == 0 or "na" not in t.schema.names:
            return
        i = t.column("i").to_numpy(zero_copy_only=False)
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("n").to_numpy(zero_copy_only=False)
        un = na + nb - i
        yield pa.table(
            {
                "doc_a": t.column("da"),
                "doc_b": t.column("db"),
                "inter_size": pa.array(i),
                "union_size": pa.array(un),
                "jaccard": pa.array(
                    i.astype(np.float64) / un.astype(np.float64)
                ),
            }
        )

    return j2.map_batches(fin, batch_format="pyarrow")


def entity_clusters(sf_dir: str) -> ray.data.Dataset:
    """(name, entity) — entity resolution end to end: the fuzzy
    (edit-distance-1) candidate pairs become an undirected match
    graph, distributed connected components merge transitive matches
    (a~b, b~c ⇒ one entity even when a,c differ by 2 edits), and each
    name resolves to its component's min member NAME as the canonical
    entity id.  Names with no fuzzy match stay their own entity
    (anti-join + identity union — isolated vertices never enter the
    graph).  This is the cluster step every dedup/ER pipeline runs on
    top of pairwise matching; min-label canonicalization makes the SQL
    oracle's recursive min-label CTE produce identical ids."""
    import tempfile as _tf

    from .components import canonical_components, connected_components
    from .graph import build_graph
    from .joins import join_auto
    from .relational import _read
    from .shuffle import keyed_reagg

    pairs = fuzzy_name_pairs(sf_dir)

    def as_edges(t: pa.Table):
        if t.num_rows == 0 or "name_a" not in t.schema.names:
            return
        yield pa.table(
            {"src_name": t.column("name_a"), "dst_name": t.column("name_b")}
        )

    gdir = _tf.mkdtemp(prefix="rayrank_entity_")
    build_graph(
        pairs.map_batches(as_edges, batch_format="pyarrow"),
        gdir, num_partitions=NUM_PARTITIONS_DEFAULT, undirected=True,
    )
    labels = canonical_components(connected_components(gdir), gdir)

    def rn(t: pa.Table):
        if t.num_rows == 0 or "component" not in t.schema.names:
            return
        yield pa.table(
            {"name": t.column("name"), "entity": t.column("component")}
        )

    matched = labels.map_batches(rn, batch_format="pyarrow")

    def block_distinct(t: pa.Table):
        if len(t) == 0:
            return
        g = t.select(["p_name"]).group_by(["p_name"]).aggregate([])
        yield g.rename_columns(["name"])

    names = keyed_reagg(
        _read(sf_dir, "part", ["p_name"]).map_batches(
            block_distinct, batch_format="pyarrow"
        ),
        ["name"], [], NUM_PARTITIONS_DEFAULT,
    )
    single = join_auto(
        names, matched.select_columns(["name"]), on=("name",),
        right_on=("name",), how="anti",
        num_partitions=NUM_PARTITIONS_DEFAULT,
    )

    def ident(t: pa.Table):
        if t.num_rows == 0 or "name" not in t.schema.names:
            return
        yield pa.table({"name": t.column("name"), "entity": t.column("name")})

    return matched.union(single.map_batches(ident, batch_format="pyarrow"))


SIMHASH_EXACT_MAX_HAMMING = 3
SIMHASH_EXACT_BUCKET_GUARD = 4096  # raises, never truncates (no-silent-caps)


def simhash_exact_pairs(sf_dir: str) -> ray.data.Dataset:
    """(a, b, hamming, n_bands) — near-duplicate pairs over the
    SQL-exact SimHash signatures (:func:`simhash_sigs_exact`): band
    the 64-bit signature into 4×16-bit chunks (pigeonhole: hamming ≤ 3
    ⇒ at least one identical chunk), bucket by (band, chunk), pair
    within buckets, verify the exact Hamming distance, and dedup the
    pair across bands keeping the shared-band count.  Completes the
    exact chain simhash_sigs_exact started — unlike
    :func:`simhash_candidates`, every integer here is ANSI-SQL
    reproducible, so the pair list itself is oracle-checked.

    Scale shape: one (band, key)-keyed repartition (buckets are
    block-complete after it), vectorized in-bucket triu pairing
    (index arithmetic, bounded by bucket²), popcount-table Hamming,
    one (a, b)-keyed dedup re-agg.  A bucket above
    ``SIMHASH_EXACT_BUCKET_GUARD`` RAISES (boilerplate-heavy corpora
    need a cap decision, not silent truncation)."""
    from .shuffle import keyed_reagg

    sigs = simhash_sigs_exact(sf_dir)

    def explode(t: pa.Table):
        if t.num_rows == 0 or "simhash" not in t.schema.names:
            return
        h = t.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        bands, keys, docs_, hs = [], [], [], []
        for b in range(4):
            bands.append(np.full(len(h), b, np.int64))
            keys.append(
                ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            )
            docs_.append(doc)
            hs.append(h.view(np.int64))
        yield pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "key": pa.array(np.concatenate(keys)),
                "doc_id": pa.array(np.concatenate(docs_)),
                "sh": pa.array(np.concatenate(hs)),
            }
        )

    rows = sigs.map_batches(explode, batch_format="pyarrow").repartition(
        NUM_PARTITIONS_DEFAULT, keys=["band", "key"]
    )

    def pairs(t: pa.Table):
        if t.num_rows == 0 or "band" not in t.schema.names:
            return
        band = t.column("band").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        sh = t.column("sh").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((doc, key, band))
        band, key, doc, sh = band[order], key[order], doc[order], sh[order]
        starts = np.flatnonzero(
            np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
        )
        sizes = np.diff(np.r_[starts, len(band)])
        if sizes.max(initial=0) > SIMHASH_EXACT_BUCKET_GUARD:
            raise ValueError(
                "simhash_exact_pairs: bucket exceeds "
                f"{SIMHASH_EXACT_BUCKET_GUARD}; decide a cap policy"
            )
        local = np.arange(len(band)) - np.repeat(starts, sizes)
        cnt = np.repeat(sizes, sizes) - 1 - local
        first = np.repeat(np.arange(len(band)), cnt)
        cum = np.cumsum(cnt)
        off = np.arange(int(cnt.sum())) - np.repeat(cum - cnt, cnt)
        second = first + 1 + off
        if len(first) == 0:
            return
        x = sh[first] ^ sh[second]
        ham = np.zeros(len(x), np.int64)
        for shift in range(0, 64, 8):
            ham += _POPCNT8[(x >> np.uint64(shift)) & np.uint64(0xFF)]
        keep = ham <= SIMHASH_EXACT_MAX_HAMMING
        if not keep.any():
            return
        g = (
            pa.table(
                {
                    "a": pa.array(doc[first][keep]),
                    "b": pa.array(doc[second][keep]),
                    "hamming": pa.array(ham[keep]),
                    "n_bands": pa.array(np.ones(int(keep.sum()), np.int64)),
                }
            )
            .group_by(["a", "b"])
            .aggregate([("hamming", "min"), ("n_bands", "sum")])
        )
        yield g.rename_columns(["a", "b", "hamming", "n_bands"])

    return keyed_reagg(
        rows.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        ["a", "b"], [("hamming", "min"), ("n_bands", "sum")],
        NUM_PARTITIONS_DEFAULT,
    )


# --------------------------------------------------------------------------
# Prefix-filtered exact set-similarity self-join (PPJoin-style; Bayardo
# et al. WWW'07 / Chaudhuri et al. ICDE'06 — public algorithms)
# --------------------------------------------------------------------------

JJ_TAU_NUM = 4   # tau = 4/5 = 0.8
JJ_TAU_DEN = 5
JJ_POSTING_GUARD = 4096
JJ_SUFFIX_PROBES = 7  # quantile probes per candidate (suffix filter)


def jaccard_join_pairs(sf_dir: str) -> ray.data.Dataset:
    """(doc_a, doc_b, inter_size, union_size, jaccard) — ALL document
    pairs with exact 3-word-shingle Jaccard >= 4/5, found WITHOUT the
    all-pairs join: prefix filtering.  Each doc keeps only its
    p = n - ceil(tau*n) + 1 smallest shingle hashes (any global total
    order is sound; the hash order needs no df pass); a pair with
    J >= tau and passing the length filter (5*na >= 4*nb and
    5*nb >= 4*na) must co-occur in some prefix posting, so the prefix
    inverted index generates a complete candidate set that exact
    verification then filters.  The jaccard threshold is the integer
    test 5*i >= 4*u; the only float is one double division restated
    identically in SQL.

    Scale shape (r5 restructure): ONE corpus scan builds the
    materialized per-doc blob table (_corpus_blob_table — 8
    bytes/value); prefix rows (rank < p(n)) unpack from it
    block-locally; ONE shingle-keyed repartition forms prefix postings
    (guard raises at JJ_POSTING_GUARD per the no-silent-caps rule;
    pair expansion is the shared vectorized triu_pair_indices kernel,
    no per-posting Python); the candidate re-agg carries the PPJoin
    positional stats (c, ra, rb) through to verification, where the
    positional filter prunes provably-sub-threshold pairs, the
    PPJoin+ suffix filter (quantile probes, rayrank.ragged) prunes
    most of the rest BEFORE any gather, and survivors merge ONLY
    their suffixes — this is the path that avoids LSH's probabilistic
    misses AND the quadratic full-posting blowup."""
    from . import dyn_partitions
    from .shuffle import keyed_reagg, segment_starts, triu_pair_indices

    # Session-scaled: the reduce stages under-parallelize on big
    # sessions at a pinned count (round-2 jaccard_scaling_80k = 0.613
    # with P=16 on 32 CPUs).
    P = dyn_partitions()
    PHASE_TIMES.clear()
    _mark("start")
    blobs = _corpus_blob_table(sf_dir)
    _mark("blobs")

    def prefix(t: pa.Table):
        if t.num_rows == 0 or "blob" not in t.schema.names:
            return
        cnt, vals = _blob_values(t.column("blob"))
        if len(cnt) == 0:
            return
        n = cnt.astype(np.int64)
        # ceil(tau*n) = (NUM*n + DEN - 1) // DEN — DEN-1, not NUM-1:
        # correct for any tau, not only tau = (DEN-1)/DEN
        p = n - (JJ_TAU_NUM * n + JJ_TAU_DEN - 1) // JJ_TAU_DEN + 1
        starts = np.cumsum(n) - n
        cum = np.cumsum(p)
        rank = np.arange(int(cum[-1]), dtype=np.int64) - np.repeat(
            cum - p, p
        )
        take = np.repeat(starts, p) + rank
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "doc_id": pa.array(np.repeat(d, p)),
                "shingle": pa.array(vals[take]),
                "n": pa.array(np.repeat(n, p)),
                "rank": pa.array(rank),
            }
        )

    co = blobs.map_batches(prefix, batch_format="pyarrow").repartition(
        P, keys=["shingle"]
    )

    def pairs(t: pa.Table):
        if t.num_rows == 0 or "shingle" not in t.schema.names:
            return
        s = t.column("shingle").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        r = t.column("rank").to_numpy(zero_copy_only=False)
        o = np.lexsort((d, s))
        s, d, n, r = s[o], d[o], n[o], r[o]
        _, sizes = segment_starts(s)
        if sizes.size and int(sizes.max()) > JJ_POSTING_GUARD:
            raise ValueError(
                f"prefix posting of size {int(sizes.max())} exceeds "
                f"guard {JJ_POSTING_GUARD}; raise the guard or shorten "
                "prefixes (higher tau)"
            )
        ii, jj, _ = triu_pair_indices(sizes)
        if len(ii) == 0:
            return
        na, nb = n[ii], n[jj]
        ok = (JJ_TAU_DEN * na >= JJ_TAU_NUM * nb) & (
            JJ_TAU_DEN * nb >= JJ_TAU_NUM * na
        )
        if not ok.any():
            return
        ii, jj = ii[ok], jj[ok]
        # d ascending within each posting ⇒ d[ii] < d[jj]: canonical
        # already, and ra/rb stay side-aligned.  Per-block partial of
        # the PPJoin positional stats: c = shared-prefix count, ra/rb =
        # rank (position in the FULL sorted shingle list) of the
        # LARGEST shared prefix hash on each side.
        g = (
            pa.table(
                {
                    "da": pa.array(d[ii]),
                    "db": pa.array(d[jj]),
                    "c": pa.array(np.ones(len(ii), np.int64)),
                    "ra": pa.array(r[ii]),
                    "rb": pa.array(r[jj]),
                    "na": pa.array(n[ii]),
                    "nb": pa.array(n[jj]),
                }
            )
            .group_by(["da", "db"])
            .aggregate(
                [("c", "sum"), ("ra", "max"), ("rb", "max"),
                 ("na", "max"), ("nb", "max")]
            )
        )
        yield g.rename_columns(["da", "db", "c", "ra", "rb", "na", "nb"])

    stats = keyed_reagg(
        co.map_batches(pairs, batch_size=None, batch_format="pyarrow"),
        ["da", "db"],
        [("c", "sum"), ("ra", "max"), ("rb", "max"),
         ("na", "max"), ("nb", "max")],
        P,
    )

    def posfilter(t: pa.Table):
        """PPJoin positional filter (sound): every shared shingle
        smaller than the largest shared PREFIX hash is itself shared-
        in-both-prefixes (counted in c), so
        |A∩B| <= c + min(na−ra−1, nb−rb−1); prune when that bound
        cannot reach i_min = ceil(tau·(na+nb)/(1+tau)) — never drops a
        true pair because the bound dominates the true intersection."""
        if t.num_rows == 0 or "c" not in t.schema.names:
            return
        c = t.column("c").to_numpy(zero_copy_only=False)
        ra = t.column("ra").to_numpy(zero_copy_only=False)
        rb = t.column("rb").to_numpy(zero_copy_only=False)
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("nb").to_numpy(zero_copy_only=False)
        i_min = (
            JJ_TAU_NUM * (na + nb) + JJ_TAU_NUM + JJ_TAU_DEN - 1
        ) // (JJ_TAU_NUM + JJ_TAU_DEN)
        bound = c + np.minimum(na - ra - 1, nb - rb - 1)
        keep = bound >= i_min
        if not keep.any():
            return
        # (c, ra, rb) ride along to the verify phase: they anchor the
        # exact overlap decomposition i = c + |A[ra+1:] ∩ B[rb+1:]|
        # and the suffix-filter probe bound there
        yield t.select(["da", "db", "c", "ra", "rb"]).filter(
            pa.array(keep)
        )

    # materialize_cut, not bare materialize: a MaterializedDataset
    # retains its logical plan, and the returned (lazy) verify dataset
    # re-executed the WHOLE candidate chain on every consumption —
    # measured 33 s of a 75 s wall at 2.56M docs for a verify map
    # whose actual work is 0.1 s
    from .shuffle import materialize_cut as _mcut

    cand = _mcut(stats.map_batches(
        posfilter, batch_size=None, batch_format="pyarrow"
    ))
    if cand.count() == 0:
        _mark("candidates")
        _mark("return")
        return ray.data.from_arrow(_empty_jaccard_table())
    _mark("candidates")

    j2 = _verify_candidate_pairs(cand, blobs, P)

    def fin(t: pa.Table):
        if t.num_rows == 0 or "na" not in t.schema.names:
            return
        i = t.column("i").to_numpy(zero_copy_only=False)
        na = t.column("na").to_numpy(zero_copy_only=False)
        nb = t.column("n").to_numpy(zero_copy_only=False)
        un = na + nb - i
        keep = JJ_TAU_DEN * i >= JJ_TAU_NUM * un
        if not keep.any():
            return
        yield pa.table(
            {
                "doc_a": pa.array(
                    t.column("da").to_numpy(zero_copy_only=False)[keep]
                ),
                "doc_b": pa.array(
                    t.column("db").to_numpy(zero_copy_only=False)[keep]
                ),
                "inter_size": pa.array(i[keep]),
                "union_size": pa.array(un[keep]),
                "jaccard": pa.array(
                    i[keep].astype(np.float64) / un[keep].astype(np.float64)
                ),
            }
        )

    out = j2.map_batches(fin, batch_format="pyarrow")
    _mark("return")
    return out


def lsh_recall(sf_dir: str) -> ray.data.Dataset:
    """One row (n_true, n_cand, n_hit, recall_ppm, precision_ppm) —
    the LSH quality audit: of the TRUE J >= 4/5 pairs (exact
    prefix-filtered join, jaccard_join_pairs), how many does the
    banded-minhash candidate set (lsh_candidate_jaccard) reach, and
    how many candidates are true.  A candidate IS a hit iff its exact
    jaccard passes the same integer 5i >= 4u test, so every count is
    deterministic and the audit composes the two SQL-green chains.

    Scale shape: both inputs stream; only scalar count partials reach
    the driver (order-free integer sums)."""

    def cnt_true(t: pa.Table):
        if len(t) == 0 or "doc_a" not in t.schema.names:
            return
        yield pa.table({"n": pa.array([len(t)], pa.int64())})

    n_true = sum(
        r["n"]
        for r in jaccard_join_pairs(sf_dir)
        .map_batches(cnt_true, batch_format="pyarrow")
        .take_all()
    )

    def cnt_cand(t: pa.Table):
        if len(t) == 0 or "inter_size" not in t.schema.names:
            return
        i = t.column("inter_size").to_numpy(zero_copy_only=False)
        u = t.column("union_size").to_numpy(zero_copy_only=False)
        yield pa.table(
            {
                "n": pa.array([len(t)], pa.int64()),
                "h": pa.array(
                    [int((JJ_TAU_DEN * i >= JJ_TAU_NUM * u).sum())],
                    pa.int64(),
                ),
            }
        )

    n_cand = n_hit = 0
    for r in (
        lsh_candidate_jaccard(sf_dir)
        .map_batches(cnt_cand, batch_format="pyarrow")
        .take_all()
    ):
        n_cand += r["n"]
        n_hit += r["h"]
    return ray.data.from_arrow(
        pa.table(
            {
                "n_true": pa.array([n_true], pa.int64()),
                "n_cand": pa.array([n_cand], pa.int64()),
                "n_hit": pa.array([n_hit], pa.int64()),
                "recall_ppm": pa.array(
                    [n_hit * 10**6 // n_true if n_true else 0], pa.int64()
                ),
                "precision_ppm": pa.array(
                    [n_hit * 10**6 // n_cand if n_cand else 0], pa.int64()
                ),
            }
        )
    )


def simhash_recall(sf_dir: str) -> ray.data.Dataset:
    """One row (n_true, n_cand, n_hit, recall_ppm, precision_ppm) —
    the SimHash quality audit, completing the near-dup candidate-
    generator audit matrix (lsh_recall audits banded minhash; this
    audits hamming<=3 SimHash banding) against the same exact
    prefix-filtered J >= 4/5 truth.  All counts deterministic; the
    oracle composes the two SQL-green chains as parenthesized
    subqueries.

    Scale shape: both inputs stream; the hit count is ONE pair-keyed
    semi-join; only scalar count partials reach the driver."""
    from .joins import join_auto

    P = NUM_PARTITIONS_DEFAULT

    def cnt(col):
        def fn(t: pa.Table):
            if len(t) == 0 or col not in t.schema.names:
                return
            yield pa.table({"n": pa.array([len(t)], pa.int64())})

        return fn

    truth = jaccard_join_pairs(sf_dir).materialize()
    n_true = sum(
        r["n"]
        for r in truth.map_batches(
            cnt("doc_a"), batch_format="pyarrow"
        ).take_all()
    )
    cand = simhash_exact_pairs(sf_dir).materialize()
    n_cand = sum(
        r["n"]
        for r in cand.map_batches(cnt("a"), batch_format="pyarrow").take_all()
    )

    def keys_only(t: pa.Table):
        if len(t) == 0 or "a" not in t.schema.names:
            return
        yield t.select(["a", "b"])

    def tkeys(t: pa.Table):
        if len(t) == 0 or "doc_a" not in t.schema.names:
            return
        yield t.select(["doc_a", "doc_b"])

    hits_ds = join_auto(
        cand.map_batches(keys_only, batch_format="pyarrow"),
        truth.map_batches(tkeys, batch_format="pyarrow"),
        on=("a", "b"), right_on=("doc_a", "doc_b"), how="semi",
        num_partitions=P,
    )
    n_hit = sum(
        r["n"]
        for r in hits_ds.map_batches(
            cnt("a"), batch_format="pyarrow"
        ).take_all()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_true": pa.array([n_true], pa.int64()),
                "n_cand": pa.array([n_cand], pa.int64()),
                "n_hit": pa.array([n_hit], pa.int64()),
                "recall_ppm": pa.array(
                    [n_hit * 10**6 // n_true if n_true else 0], pa.int64()
                ),
                "precision_ppm": pa.array(
                    [n_hit * 10**6 // n_cand if n_cand else 0], pa.int64()
                ),
            }
        )
    )
