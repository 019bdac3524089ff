"""Vectorized kernels over ragged sorted segments.

The verify phase of the PPJoin-style jaccard self-join
(rayrank/text.py) holds every candidate document's sorted shingle-hash
set as a slice of ONE broadcast flat uint64 array.  Pruning candidates
before the exact merge needs per-pair binary probes into those slices
— a per-pair ``np.searchsorted`` would be a Python loop over millions
of candidates, so :func:`batched_searchsorted` hand-rolls the binary
search as ~log2(max segment length) numpy passes that advance ALL
pairs' (lo, hi) brackets at once.

:func:`suffix_overlap_bound` uses it to implement the PPJoin+-family
suffix filter (Xiao et al., WWW'08 — public algorithm), generalized
from one median probe to k quantile probes: probe k evenly-ranked
values of the shorter suffix into the other suffix; the probes cut
both suffixes into aligned open intervals, and any shared element is
either a probe hit or lies in the SAME open interval on both sides, so

    |A_suf ∩ B_suf|  <=  Σ_j min(|A_j|, |B_j|)  +  Σ_j hit_j

is a sound upper bound (never below the true overlap — the
completeness property tests/test_ragged.py asserts on random sets).
"""

from __future__ import annotations

import numpy as np


def batched_searchsorted(
    values: np.ndarray,
    seg_start: np.ndarray,
    seg_len: np.ndarray,
    queries: np.ndarray,
) -> np.ndarray:
    """For each i: ``np.searchsorted(values[seg_start[i] :
    seg_start[i] + seg_len[i]], queries[i], side="left")`` — the local
    insertion position of ``queries[i]`` in its (ascending-sorted)
    segment — without a per-row Python loop.  ``values`` must be
    uint64 (shingle hashes compare in UNSIGNED order; an int64 view
    would invert the order for values >= 2^63 — the repo's standing
    order-preserving-map lesson).  All-numpy: ceil(log2(max_len + 1))
    passes over the query vector."""
    m = len(queries)
    if m == 0:
        return np.zeros(0, np.int64)
    if values.dtype != np.uint64 or queries.dtype != np.uint64:
        # hard raise, not assert (stripped under -O): an int64 view
        # compares in SIGNED order, silently inverting the search for
        # hashes >= 2^63 — which would make the suffix bound UNDERcount
        # and drop true pairs (the no-silent-caps failure mode)
        raise ValueError(
            "batched_searchsorted: values/queries must be uint64 "
            f"(got {values.dtype}/{queries.dtype})"
        )
    lo = np.asarray(seg_start, np.int64).copy()
    hi = lo + np.asarray(seg_len, np.int64)
    max_len = int(seg_len.max()) if len(seg_len) else 0
    n_iter = max_len.bit_length()  # ceil(log2(max_len + 1))
    guard = len(values) - 1
    for _ in range(n_iter):
        mid = (lo + hi) >> 1
        act = lo < hi
        mv = values[np.minimum(mid, guard)] if guard >= 0 else queries
        less = act & (mv < queries)
        lo = np.where(less, mid + 1, lo)
        hi = np.where(act & ~less, mid, hi)
    return lo - np.asarray(seg_start, np.int64)


def suffix_overlap_bound(
    values: np.ndarray,
    a_start: np.ndarray,
    a_len: np.ndarray,
    b_start: np.ndarray,
    b_len: np.ndarray,
    n_probes: int,
) -> np.ndarray:
    """Sound upper bound on ``|A_i ∩ B_i|`` for each pair of
    ascending-sorted distinct-value uint64 segments A_i =
    ``values[a_start[i] : a_start[i] + a_len[i]]`` (likewise B_i) of
    ONE flat array, via ``n_probes`` quanti­le probes of A into B.

    With 0 probes this degenerates to ``min(a_len, b_len)`` (the
    positional-filter bound); each added probe can only tighten it.
    The probe ranks are clamped strictly increasing; a rank clamped to
    the segment end becomes a virtual +∞ probe whose interval
    arithmetic stays exact (segments only coarsen, so the bound stays
    sound — never below the true overlap)."""
    m = len(a_len)
    if m == 0:
        return np.zeros(0, np.int64)
    a_start = np.asarray(a_start, np.int64)
    b_start = np.asarray(b_start, np.int64)
    la = np.asarray(a_len, np.int64)
    lb = np.asarray(b_len, np.int64)
    if n_probes <= 0:
        return np.minimum(la, lb)
    bound = np.zeros(m, np.int64)
    prev_t = np.full(m, -1, np.int64)  # last probe rank in A (−1 = none)
    prev_pr = np.zeros(m, np.int64)  # B elements consumed (≤ last probe)
    guard = len(values) - 1
    for j in range(n_probes):
        t_raw = ((j + 1) * la) // (n_probes + 1)
        tj = np.minimum(np.maximum(prev_t + 1, t_raw), la)
        virt = tj >= la
        # A elements strictly between the previous probe and this one
        c_a = np.maximum(tj - prev_t - 1, 0)
        v = values[np.minimum(a_start + tj, guard)]
        p = batched_searchsorted(values, b_start, lb, v)
        p = np.where(virt, lb, p)
        hit = (
            ~virt
            & (p < lb)
            & (values[np.minimum(b_start + np.minimum(p, lb - 1), guard)] == v)
        )
        c_b = p - prev_pr
        bound += np.minimum(c_a, c_b) + hit
        prev_pr = p + hit
        prev_t = tj
    # final open interval after the last probe
    bound += np.minimum(
        np.maximum(la - prev_t - 1, 0), np.maximum(lb - prev_pr, 0)
    )
    return bound
