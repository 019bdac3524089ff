"""Executable oracle: float64 numpy transliteration of the reference's
exact math (/root/reference/pagerank.py; SURVEY.md §5.3) plus networkx
oracles for components / triangles and a pinned label-propagation rule.

torch/gensim are unavailable in this sandbox, so this transliteration IS
the authoritative reference; its small.csv output is pinned in
FIXTURES.md §1 (17 iterations, node 4 top).
"""

from __future__ import annotations

import math
import re

import numpy as np

NONLEAF_RE = re.compile(r".*((/$)|(/.*/)).*")


def reference_graph(
    edges: list[tuple[str, str]],
    filter_ratio: float | None = None,
    apply_regex: bool = False,
    max_nnz: int | None = None,
):
    """First-seen id assignment + duplicate-summed transition weights,
    mirroring WebGraph.__init__ (pagerank.py:18-68) in scan order.

    Weights use mult/outdeg (equivalent to the reference's run-length
    pass on sorted input; the intended semantics for unsorted input).
    Returns (A, names) with A[s, t] = multiplicity/outdeg(s), float64.
    """
    url_dict: dict[str, int] = {}

    def uid(u: str) -> int:
        if u not in url_dict:
            url_dict[u] = len(url_dict)
        return url_dict[u]

    indices: list[tuple[int, int]] = []
    target_counts: dict[int, int] = {}
    for i, (s, t) in enumerate(edges):
        if max_nnz is not None and i > max_nnz:
            break
        if apply_regex and (NONLEAF_RE.match(s) or NONLEAF_RE.match(t)):
            continue
        si, ti = uid(s), uid(t)
        target_counts[ti] = target_counts.get(ti, 0) + 1
        indices.append((si, ti))

    n = len(url_dict)
    if filter_ratio is not None:
        indices = [
            (s, t) for s, t in indices if target_counts[t] < filter_ratio * n
        ]

    A = np.zeros((n, n), np.float64)
    outdeg = np.zeros(n, np.float64)
    for s, t in indices:
        outdeg[s] += 1
    for s, t in indices:
        A[s, t] += 1.0 / outdeg[s]
    names = [None] * n
    for u, i in url_dict.items():
        names[i] = u
    return A, names


def oracle_power_method(
    A: np.ndarray,
    v: np.ndarray | None = None,
    alpha: float = 0.85,
    epsilon: float = 1e-6,
    max_iterations: int = 1000,
):
    """pagerank.py:100-139 in float64.  Returns (x, iterations)."""
    n = A.shape[0]
    a = (A.sum(axis=1) == 0).astype(np.float64)
    if v is None:
        v = np.full(n, 1.0 / n)
    v = v / np.linalg.norm(v)
    x = np.full(n, 1.0 / math.sqrt(n))
    x = x / np.linalg.norm(x)
    it = 0
    for it in range(max_iterations):
        xprev = x
        q = (alpha * x @ a + (1 - alpha)) * v
        x = alpha * (A.T @ x) + q
        x = x / np.abs(x).sum()
        if np.linalg.norm(x - xprev) < epsilon:
            break
    return x, it + 1


def oracle_pagerank_by_name(
    edges, alpha=0.85, epsilon=1e-6, filter_ratio=None, apply_regex=False,
    v_indicator_names=None,
):
    A, names = reference_graph(edges, filter_ratio=filter_ratio, apply_regex=apply_regex)
    v = None
    if v_indicator_names is not None:
        v = np.array(
            [1.0 if nm in v_indicator_names else 0.0 for nm in names], np.float64
        )
        assert v.sum() > 0
        v = v / v.sum()
    x, iters = oracle_power_method(A, v=v, alpha=alpha, epsilon=epsilon)
    return dict(zip(names, x)), iters


def oracle_components(edges) -> list[set[str]]:
    """Undirected connected components as a partition of the name set."""
    import networkx as nx

    g = nx.Graph()
    for s, t in edges:
        g.add_node(s)
        g.add_node(t)
        if s != t:
            g.add_edge(s, t)
    return [set(c) for c in nx.connected_components(g)]


def oracle_triangles(edges):
    """(total, per-name) triangle counts on the undirected simple graph
    (self-loops dropped, duplicates collapsed)."""
    import networkx as nx

    g = nx.Graph()
    for s, t in edges:
        g.add_node(s)
        g.add_node(t)
        if s != t:
            g.add_edge(s, t)
    tri = nx.triangles(g)
    return sum(tri.values()) // 3, dict(tri)


def oracle_label_propagation(
    edges, vids: dict[str, int], max_iterations: int = 100
):
    """Pinned deterministic LP rule (FIXTURES.md §1): undirected
    multigraph WITHOUT self-loops; synchronous updates; new label =
    neighbor-label mode weighted by edge multiplicity (both directions),
    smallest label on ties; isolated vertices keep their label; stop on
    no change.  ``vids``: name → engine vid (labels live in vid space).
    Returns name → final label."""
    names = list(vids)
    lab = {nm: vids[nm] for nm in names}
    mult: dict[tuple[str, str], float] = {}
    for s, t in edges:
        if s == t:
            continue
        mult[(s, t)] = mult.get((s, t), 0.0) + 1.0
        mult[(t, s)] = mult.get((t, s), 0.0) + 1.0
    nbrs: dict[str, dict[str, float]] = {nm: {} for nm in names}
    for (s, t), m in mult.items():
        nbrs[s][t] = m
    for _ in range(max_iterations):
        new = {}
        changed = 0
        for nm in names:
            if not nbrs[nm]:
                new[nm] = lab[nm]
                continue
            counts: dict[int, float] = {}
            for u, m in nbrs[nm].items():
                counts[lab[u]] = counts.get(lab[u], 0.0) + m
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[nm] = best
            if best != lab[nm]:
                changed += 1
        lab = new
        if changed == 0:
            break
    return lab


def random_edge_list(seed: int, n: int, m: int) -> list[tuple[str, str]]:
    """FIXTURES.md §2 conformance graphs: duplicates + self-loops
    allowed; ~10% of vertices withheld from the source side (dangling)."""
    rng = np.random.default_rng(seed)
    n_dangling = max(1, n // 10)
    sources = np.arange(n - n_dangling)
    src = rng.choice(sources, size=m, replace=True)
    dst = rng.integers(0, n, size=m)
    return [(str(s), str(t)) for s, t in zip(src, dst)]
