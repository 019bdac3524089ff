"""Property tests for rayrank.ragged (no Ray needed).

batched_searchsorted must equal per-segment np.searchsorted exactly;
suffix_overlap_bound must NEVER undercount (soundness: bound >= true
overlap) — the completeness property the jaccard suffix filter's
exactness rests on (a bound below truth would silently drop a true
pair, breaking the oracle row set).
"""

import numpy as np

from rayrank.ragged import batched_searchsorted, suffix_overlap_bound


def _random_segments(rng, n_segs, max_len):
    """(flat_values, starts, lens) — ascending distinct uint64 runs."""
    lens = rng.integers(0, max_len + 1, n_segs)
    parts = []
    for ln in lens:
        vals = np.unique(rng.integers(0, 1 << 63, ln * 2, dtype=np.uint64))
        rng.shuffle(vals)
        parts.append(np.sort(vals[:ln].astype(np.uint64)))
    flat = (
        np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    )
    lens = np.array([len(p) for p in parts], np.int64)
    starts = np.cumsum(lens) - lens
    return flat, starts, lens


def test_batched_searchsorted_matches_numpy():
    rng = np.random.default_rng(7)
    flat, starts, lens = _random_segments(rng, 200, 37)
    # queries: mix of present values, absent values, extremes
    seg_of = np.repeat(np.arange(200), 5)
    q = rng.integers(0, 1 << 63, len(seg_of), dtype=np.uint64)
    # overwrite some queries with actual member values
    for i in range(0, len(seg_of), 3):
        s = seg_of[i]
        if lens[s]:
            q[i] = flat[starts[s] + int(rng.integers(0, lens[s]))]
    got = batched_searchsorted(flat, starts[seg_of], lens[seg_of], q)
    for i, s in enumerate(seg_of):
        seg = flat[starts[s]: starts[s] + lens[s]]
        assert got[i] == np.searchsorted(seg, q[i], side="left")


def test_batched_searchsorted_empty():
    assert len(
        batched_searchsorted(
            np.zeros(0, np.uint64),
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.uint64),
        )
    ) == 0


def _true_overlap(flat, sa, la, sb, lb):
    return len(
        np.intersect1d(flat[sa: sa + la], flat[sb: sb + lb])
    )


def test_suffix_bound_sound_and_probes_only_tighten():
    """bound >= true overlap for EVERY pair at every probe count, and
    the 0-probe bound equals min(len_a, len_b)."""
    rng = np.random.default_rng(11)
    # overlapping pairs: draw both sides from a small value universe so
    # intersections are common
    n_pairs = 300
    universe = np.unique(
        rng.integers(0, 4096, 2048, dtype=np.uint64)
    )
    parts, lens = [], []
    for _ in range(2 * n_pairs):
        ln = int(rng.integers(0, 40))
        pick = rng.choice(universe, size=min(ln, len(universe)), replace=False)
        parts.append(np.sort(pick.astype(np.uint64)))
        lens.append(len(pick))
    flat = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    lens = np.array(lens, np.int64)
    starts = np.cumsum(lens) - lens
    ia = np.arange(0, 2 * n_pairs, 2)
    ib = ia + 1
    truth = np.array(
        [
            _true_overlap(flat, starts[a], lens[a], starts[b], lens[b])
            for a, b in zip(ia, ib)
        ],
        np.int64,
    )
    b0 = suffix_overlap_bound(
        flat, starts[ia], lens[ia], starts[ib], lens[ib], 0
    )
    assert np.array_equal(b0, np.minimum(lens[ia], lens[ib]))
    for k in (1, 2, 3, 7, 16):
        bk = suffix_overlap_bound(
            flat, starts[ia], lens[ia], starts[ib], lens[ib], k
        )
        assert (bk >= truth).all(), f"unsound bound at k={k}"
        assert (bk <= b0).all() or k == 0


def test_suffix_bound_exact_on_identical_and_disjoint():
    flat = np.array(
        [1, 2, 3, 4, 1, 2, 3, 4, 10, 20, 30, 40], np.uint64
    )
    starts = np.array([0, 4, 8], np.int64)
    lens = np.array([4, 4, 4], np.int64)
    # identical sets: bound must allow the full overlap (== 4)
    b = suffix_overlap_bound(
        flat, starts[[0]], lens[[0]], starts[[1]], lens[[1]], 3
    )
    assert b[0] >= 4
    # disjoint sets: enough probes should prove near-zero overlap
    b = suffix_overlap_bound(
        flat, starts[[0]], lens[[0]], starts[[2]], lens[[2]], 3
    )
    assert b[0] < 4
