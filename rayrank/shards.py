"""Per-partition CSR shard actors (SURVEY.md §2.3 ST3, §2.4 J1).

The reference holds ONE in-memory sparse matrix and does dense matvecs
(/root/reference/pagerank.py:63-67, 126-132).  Here the edge set is
hash-partitioned by ``src % Q`` at build time (graph.py) and each
partition's CSR-like arrays live in a long-lived actor, built ONCE and
reused by every iteration of every algorithm — the gather side is
co-partitioned with the score vector (``vid % Q``), so the only
per-iteration communication is the contribution exchange: shard ``p``
returns Q pre-aggregated outputs (one per destination partition,
``num_returns=Q``) and reducer ``q`` combines the Q×1 column addressed
to it.  That is exactly a hash-shuffle with map-side combine, expressed
with raw actors because Ray Data's ``map_batches`` cannot keep actor
state pinned across separate per-iteration executions (SURVEY.md
§7.5.3); a pure-Dataset variant lives in pagerank.py for cross-check.

All kernels are vectorized numpy over float64; per-dst aggregation uses
``reduceat`` over a dst-sorted edge order computed once at init.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import ray


@ray.remote
class CsrShard:
    """Holds the edges with ``src % Q == p``; serves per-iteration
    message kernels for PageRank / CC / label propagation."""

    def __init__(self, graph_dir: str, p: int, Q: int, part_sizes: list[int]):
        self.p, self.Q = p, Q
        self.s_p = part_sizes[p]
        part_dir = os.path.join(graph_dir, "edges", f"part={p}")
        if os.path.isdir(part_dir):
            t = pq.read_table(part_dir, columns=["src", "dst", "mult", "w"])
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            w = t.column("w").to_numpy().astype(np.float64)
            mult = t.column("mult").to_numpy().astype(np.float64)
        else:  # partition with no out-edges at all
            src = dst = np.empty(0, np.int64)
            w = mult = np.empty(0, np.float64)

        order = np.argsort(dst, kind="stable")
        self.src_l = (src[order] // Q).astype(np.int64)  # local gather index
        self.dst_sorted = dst[order]
        self.w = w[order]
        self.mult = mult[order]
        if len(dst):
            seg_mask = np.empty(len(dst), bool)
            seg_mask[0] = True
            np.not_equal(self.dst_sorted[1:], self.dst_sorted[:-1], out=seg_mask[1:])
            self.seg = np.flatnonzero(seg_mask)
            self.uniq_dst = self.dst_sorted[self.seg]
        else:
            self.seg = np.empty(0, np.int64)
            self.uniq_dst = np.empty(0, np.int64)
        dq = self.uniq_dst % Q
        self.route = [np.flatnonzero(dq == q) for q in range(Q)]
        self.out_local = [(self.uniq_dst[r] // Q).astype(np.int64) for r in self.route]

        present = np.zeros(self.s_p, bool)
        if len(src):
            present[np.unique(src // Q)] = True
        self._src_present = present

    def ready(self) -> int:
        return len(self.dst_sorted)

    def dangling_mask(self) -> np.ndarray:
        """True for local vertices with out-degree 0 (pagerank.py:105-107)."""
        return ~self._src_present

    def spmv(self, x_part: np.ndarray):
        """Weighted contribution sums per destination, pre-aggregated
        map-side and routed per destination partition.

        Returns a Q-tuple of ``(local_dst_index, partial_sum)`` pairs
        (call with ``num_returns=Q`` so reducers fetch only their part).
        """
        if len(self.w) == 0:
            return tuple((self.out_local[q], np.empty(0)) for q in range(self.Q))
        contrib = self.w * x_part[self.src_l]
        sums = np.add.reduceat(contrib, self.seg)
        return tuple((self.out_local[q], sums[self.route[q]]) for q in range(self.Q))

    def min_msg(self, labels_part: np.ndarray):
        """Per-destination min of source labels (connected components)."""
        if len(self.w) == 0:
            return tuple(
                (self.out_local[q], np.empty(0, np.int64)) for q in range(self.Q)
            )
        lab = labels_part[self.src_l]
        mins = np.minimum.reduceat(lab, self.seg)
        return tuple((self.out_local[q], mins[self.route[q]]) for q in range(self.Q))

    def label_counts(self, labels_part: np.ndarray):
        """Per-(destination, label) multiplicity-weighted counts (label
        propagation).  Returns per-partition ``(dst_local, label, cnt)``
        triples, combined map-side before the reduce."""
        Q = self.Q
        if len(self.w) == 0:
            e = np.empty(0, np.int64)
            return tuple((e, e, np.empty(0, np.float64)) for _ in range(Q))
        lab = labels_part[self.src_l]
        order = np.lexsort((lab, self.dst_sorted))
        d, l, m = self.dst_sorted[order], lab[order], self.mult[order]
        seg_mask = np.empty(len(d), bool)
        seg_mask[0] = True
        np.logical_or(d[1:] != d[:-1], l[1:] != l[:-1], out=seg_mask[1:])
        seg = np.flatnonzero(seg_mask)
        cnt = np.add.reduceat(m, seg)
        du, lu = d[seg], l[seg]
        dq = du % Q
        out = []
        for q in range(Q):
            idx = np.flatnonzero(dq == q)
            out.append(((du[idx] // Q).astype(np.int64), lu[idx], cnt[idx]))
        return tuple(out)


def create_shards(graph_dir: str, meta) -> list:
    """One CsrShard per partition; blocks until all are built."""
    shards = [
        CsrShard.remote(graph_dir, p, meta.Q, meta.part_sizes) for p in range(meta.Q)
    ]
    ray.get([s.ready.remote() for s in shards])
    return shards
