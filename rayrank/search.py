"""Query predicates, personalization vectors, score fusion, top-k
reporting (SURVEY.md §2.2 M4-M6, §2.6 T1; reference pagerank.py:81-97,
142-258).

The reference's GloVe model is replaced by a pluggable
:class:`EmbeddingModel` interface with a deterministic test double
(gensim/network downloads are unavailable here; ST1 in SURVEY.md).
Expansion happens ONCE per query on the driver — the reference calls
``most_similar`` per URL per word (pagerank.py:237-243 invoked per row
at :91/:185), an O(n·terms) model-call bug this engine does not copy.

Documented divergences from reference defects (SURVEY.md §3.4): empty
or out-of-vocabulary search queries yield a zero bonus instead of a
KeyError crash; the scorer uses its ``query`` argument, not a global.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


class EmbeddingModel:
    """Minimal interface of gensim KeyedVectors used by the reference."""

    def most_similar(self, word: str, topn: int = 10) -> list[tuple[str, float]]:
        raise NotImplementedError


class DictEmbedding(EmbeddingModel):
    """Deterministic test double: explicit neighbor lists."""

    def __init__(self, table: dict[str, list[tuple[str, float]]]):
        self.table = table

    def most_similar(self, word, topn=10):
        if word not in self.table:
            raise KeyError(word)
        return self.table[word][:topn]


class NullEmbedding(EmbeddingModel):
    """No expansion (every word is out-of-vocabulary)."""

    def most_similar(self, word, topn=10):
        raise KeyError(word)


def wrap_keyed_vectors(vectors) -> EmbeddingModel:
    """Adapter for any gensim-KeyedVectors-shaped object (anything with
    ``most_similar(word, topn=) -> [(word, sim), ...]`` raising
    ``KeyError`` on OOV).  Split from :func:`gensim_embedding` so the
    adapter contract is testable with an in-memory KeyedVectors on
    hosts that have gensim — no model download needed (guarded test in
    tests/test_real_model_contracts.py; skips cleanly here)."""

    class _G(EmbeddingModel):
        def most_similar(self, word, topn=10):
            return vectors.most_similar(word, topn=topn)

    return _G()


def gensim_embedding(name: str = "glove-wiki-gigaword-300") -> EmbeddingModel:
    """The reference's actual model (pagerank.py:14) — import-gated;
    unavailable in this sandbox."""
    import gensim.downloader  # pragma: no cover

    return wrap_keyed_vectors(gensim.downloader.load(name))  # pragma: no cover


def parse_terms(query: str) -> tuple[list[str], list[str]]:
    """(positive, negated) terms; ``-term`` negates (pagerank.py:190-207)."""
    pos, neg = [], []
    for term in query.split():
        if term.startswith("-"):
            neg.append(term[1:])
        else:
            pos.append(term)
    return pos, neg


def expand_query(query: str, model: EmbeddingModel, topn: int = 5) -> str:
    """Reference expansion (pagerank.py:234-243): every word WITHOUT a
    dash anywhere in it contributes its ``topn`` nearest neighbors as
    extra positive terms.  OOV words expand to nothing (divergence: the
    reference would raise)."""
    terms = query.split()
    for word in query.split():
        if "-" in word:
            continue
        try:
            terms.extend(w for w, _ in model.most_similar(word, topn=topn))
        except KeyError:
            pass
    return " ".join(terms)


def satisfies_mask(names: pa.ChunkedArray | pa.Array, query: str) -> np.ndarray:
    """Vectorized new_url_satisfies_query (pagerank.py:190-207): any
    positive term is a substring (no positive terms ⇒ True), and no
    negated term is a substring."""
    pos, neg = parse_terms(query)
    n = len(names)
    if pos:
        sat = np.zeros(n, bool)
        for term in pos:
            sat |= pc.match_substring(names, term).to_numpy(zero_copy_only=False)
    else:
        sat = np.ones(n, bool)
    for term in neg:
        sat &= ~pc.match_substring(names, term).to_numpy(zero_copy_only=False)
    return sat


def filter_by_query(
    ds: ray.data.Dataset,
    column: str,
    query: str,
    model: EmbeddingModel | None = None,
) -> ray.data.Dataset:
    """Rows whose ``column`` satisfies the (optionally expanded) query —
    a stateless vectorized filter; expansion happens once, here."""
    if model is not None:
        query = expand_query(query, model)

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(satisfies_mask(t.column(column), query)))

    return ds.map_batches(fn, batch_format="pyarrow")


@ray.remote
def _v_part(graph_dir: str, q: int, Q: int, size: int, query: str) -> np.ndarray:
    """Indicator personalization for one id partition, built from its
    own vertex file (no driver-side vertex scan — J3/ST2 scale path)."""
    import os

    import pyarrow.parquet as pq

    v = np.zeros(size, np.float64)
    part_dir = os.path.join(graph_dir, "vertices", f"q={q}")
    if not os.path.isdir(part_dir):
        return v
    t = pq.read_table(part_dir, columns=["vid", "name"])
    mask = satisfies_mask(t.column("name"), query)
    vids = t.column("vid").to_numpy()[mask]
    v[vids // Q] = 1.0
    return v


def personalization_vector(
    graph_dir: str, query: str, model: EmbeddingModel | None = None
) -> list:
    """Partitioned indicator v over vertices matching the expanded query
    (make_personalization_vector, pagerank.py:81-97).  Raises if no
    vertex matches (the reference asserts v_sum > 0)."""
    import os

    from .graph import GraphMeta

    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    if model is not None:
        query = expand_query(query, model)
    refs = [
        _v_part.remote(graph_dir, q, meta.Q, meta.part_sizes[q], query)
        for q in range(meta.Q)
    ]
    parts = ray.get(refs)
    total = sum(float(p.sum()) for p in parts)
    if total <= 0:
        raise ValueError(f"personalization query matched no vertex: {query!r}")
    return [ray.put(p) for p in parts]


def fuse_scores(
    scores: ray.data.Dataset,
    query: str,
    model: EmbeddingModel | None = None,
    sum_weight: float = 0.03,
    power: int = 30,
) -> ray.data.Dataset:
    """Score fusion (search(), pagerank.py:142-174): per name,
    ``number`` direct+neighbor hits and their ``weight`` (sum_weight for
    the direct hit, similarity**power per neighbor hit); fused score =
    pagerank + number·weight.  Neighbors = top-10 most_similar of the
    WHOLE query string, computed once; empty/OOV query ⇒ no bonus."""
    neighbors: list[tuple[str, float]] = []
    if model is not None and query:
        try:
            neighbors = model.most_similar(query, topn=10)
        except KeyError:
            neighbors = []

    def fn(t: pa.Table) -> pa.Table:
        names = t.column("name")
        number = satisfies_mask(names, query).astype(np.float64) if query else np.zeros(len(t))
        weight = number * sum_weight
        for w_word, sim in neighbors:
            m = satisfies_mask(names, w_word).astype(np.float64)
            number += m
            weight += m * (sim ** power)
        fused = t.column("score").to_numpy(zero_copy_only=False) + number * weight
        return t.append_column("fused", pa.array(fused, pa.float64()))

    return scores.map_batches(fn, batch_format="pyarrow")


def top_k(
    scores: ray.data.Dataset,
    query: str = "",
    model: EmbeddingModel | None = None,
    k: int = 10,
    sum_weight: float = 0.03,
    power: int = 30,
) -> ray.data.Dataset:
    """The reference's search report (pagerank.py:176-187): fuse, keep
    rows satisfying the expanded query, sort by fused score desc, top k
    (filter pushed before the sort — emission-time filtering in the
    reference selects the same set)."""
    fused = fuse_scores(scores, query, model, sum_weight, power)
    if query:
        fused = filter_by_query(fused, "name", query, model)
    # secondary key: exact score ties (common for zero-in-link vertices)
    # order deterministically by name across runs
    return fused.sort(["fused", "name"], descending=[True, False]).limit(k)
