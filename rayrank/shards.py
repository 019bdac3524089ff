"""Per-partition CSR shard actors (SURVEY.md §2.3 ST3, §2.4 J1).

The reference holds ONE in-memory sparse matrix and does dense matvecs
(/root/reference/pagerank.py:63-67, 126-132).  Here the edge set is
hash-partitioned by ``src % Q`` at build time (graph.py) and each
partition's CSR-like arrays live in a long-lived actor, built ONCE and
reused by every iteration of every algorithm.

Actor ``p`` also OWNS score/label partition ``p`` (ids from
rayrank.ids guarantee ``part(vid) = vid % Q``, so the gather side is
co-resident with the state it reads — zero-copy, zero-shuffle).  One
iteration is two actor-call rounds:

  round A  ``gather_*``  — map-side combined messages, ``num_returns=Q``
                           so reducer q fetches only its column;
  round B  ``reduce_*``  — runs ON the destination shard actor, folds
                           the Q message columns into the local state,
                           returns SCALARS only (L1/dangling/residual
                           parts, changed counts).

The driver moves O(Q) scalars per round; vector data never leaves the
object store.  PageRank residual is evaluated with a one-step lag
(reduce_pr of iteration t returns ‖x_t − x_{t−1}‖² parts) which fuses
the reference's separate normalize/residual passes into the reduce —
numerically the scale factor 1/‖x‖₁ is carried as a scalar and folded
into the next gather, identical to the reference's per-iteration
division up to ~1e-16 relative rounding (budget: allclose 1e-6).

All kernels are vectorized numpy float64; per-dst aggregation uses
``reduceat`` over a dst-sorted edge order computed once at init.
Raw actors (not a Dataset actor pool) because Ray Data cannot pin
actor state across separate per-iteration executions (SURVEY §7.5.3);
the pure-Dataset fallback lives in pagerank.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

# Unreached-vertex BFS distance sentinel: large enough to dominate any
# real hop count, small enough that INF_DIST + 1 cannot wrap int64.
INF_DIST = 1 << 62
WIDEST_SEED = 1 << 62  # widest-path seed capacity (above any edge weight)


@ray.remote
class CsrShard:
    """Edges with ``src % Q == p`` + resident state partition ``p``."""

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
        self.dangling = ~present

        # resident iterate state
        self.y = None        # current unnormalized iterate (x = c·y)
        self.y_prev = None
        self.v = None        # personalization partition
        self.labels = None
        self.hits_y = None   # HITS gather vector (hub on fwd, auth on rev)
        self.hits_in = None  # HITS reduce result (auth on fwd, hub on rev)

    # ------------------------------------------------------------------
    # common
    # ------------------------------------------------------------------

    def ready(self) -> int:
        return len(self.dst_sorted)

    def _unwrap1(self, outs: tuple):
        """``num_returns=Q`` degenerates at Q=1: Ray returns ONE ref to
        the whole tuple, so reducers would unpack a 1-tuple of messages
        as a message.  Return the bare per-partition message instead."""
        return outs[0] if self.Q == 1 else outs

    def dangling_count(self) -> int:
        return int(self.dangling.sum())

    # ------------------------------------------------------------------
    # PageRank (reference-exact math, scalar-folded normalization)
    # ------------------------------------------------------------------

    def set_v(self, v_part: np.ndarray) -> float:
        """Install an (unnormalized) personalization partition; returns
        the local sum of squares for the global L2 normalization."""
        self.v = np.asarray(v_part, np.float64)
        return float(np.dot(self.v, self.v))

    def scale_v(self, inv_norm: float) -> None:
        self.v = self.v * inv_norm

    def init_uniform_v(self, v_value: float) -> None:
        self.v = np.full(self.s_p, v_value, np.float64)

    def final_residual(self, c_cur: float, c_prev: float) -> float:
        """‖c_cur·y − c_prev·y_prev‖² part for the last update (used
        when the loop exhausts before the lagged check saw it)."""
        if self.y_prev is None:
            return 0.0
        d = c_cur * self.y - c_prev * self.y_prev
        return float(np.dot(d, d))

    def init_pr(self, x0_value: float, v_value: float | None) -> tuple[float, float]:
        """x0 = x0_value per entry (the reference's 1/√n, L2-normalized
        by construction).  Returns (dangling part of x0, L1 part)."""
        self.y = np.full(self.s_p, x0_value, np.float64)
        self.y_prev = None
        if v_value is not None:
            self.v = np.full(self.s_p, v_value, np.float64)
        return float(self.y[self.dangling].sum()), float(np.abs(self.y).sum())

    def set_scores(self, values: np.ndarray) -> tuple[float, float]:
        """Install a (normalized) iterate from a checkpoint (resume)."""
        self.y = np.asarray(values, np.float64)
        self.y_prev = None
        return float(self.y[self.dangling].sum()), float(np.abs(self.y).sum())

    def gather_pr(self):
        """Round A: per-destination partial sums of w·y (UNNORMALIZED
        current iterate; the 1/‖x‖₁ scalar is applied in reduce_pr)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple((self.out_local[q], np.empty(0)) for q in range(self.Q))
            )
        contrib = self.w * self.y[self.src_l]
        sums = np.add.reduceat(contrib, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], sums[self.route[q]]) for q in range(self.Q))
        )

    def reduce_pr(
        self, alpha_c: float, coeff: float, c_cur: float, c_prev: float, *parts
    ):
        """Round B: x_un_new = alpha_c·Σmsgs + coeff·v, where
        alpha_c = α·c_t folds the L1 normalization of the current
        iterate into the gather result.  Also returns the LAGGED
        residual part ‖c_t·y_t − c_prev·y_prev‖² (reference residual of
        the previous update, pagerank.py:134).

        Returns (l1_part, dangling_un_part, res_prev_sq_part, rows)."""
        y_new = np.zeros(self.s_p, np.float64)
        rows = 0
        for idx, vals in parts:
            if len(idx):
                y_new += np.bincount(idx, weights=vals, minlength=self.s_p)
            rows += len(idx)
        y_new *= alpha_c
        if coeff != 0.0 and self.v is not None:
            y_new += coeff * self.v
        res_sq = 0.0
        if self.y_prev is not None:
            d = c_cur * self.y - c_prev * self.y_prev
            res_sq = float(np.dot(d, d))
        self.y_prev = self.y
        self.y = y_new
        return (
            float(np.abs(y_new).sum()),
            float(y_new[self.dangling].sum()),
            res_sq,
            rows,
        )

    def scores(self, c: float, previous: bool) -> np.ndarray:
        """Normalized score partition: c · (y_prev if previous else y)."""
        arr = self.y_prev if previous else self.y
        return c * arr

    def write_scores(self, path: str, c: float, previous: bool) -> dict:
        vid = np.arange(self.s_p, dtype=np.int64) * self.Q + self.p
        vals = self.scores(c, previous)
        pq.write_table(pa.table({"vid": vid, "value": vals}), path)
        return {
            "part": self.p,
            "rows": int(self.s_p),
            "bytes": os.path.getsize(path),
            "path": path,
        }

    # ------------------------------------------------------------------
    # HITS (multiplicity-weighted adjacency, L2-normalized half-steps)
    # ------------------------------------------------------------------

    def init_hits(self, value: float) -> None:
        """Install a uniform gather vector (hub₀ on the forward set)."""
        self.hits_y = np.full(self.s_p, value, np.float64)
        self.hits_in = None

    def gather_hits(self):
        """Round A: per-destination partials of mult·y — Aᵀy on the
        forward shard set (auth update), A·y on the reversed set (hub
        update).  Same routing as gather_pr but ADJACENCY multiplicity
        weights, not the 1/outdeg PageRank weights."""
        if len(self.mult) == 0:
            return self._unwrap1(
                tuple((self.out_local[q], np.empty(0)) for q in range(self.Q))
            )
        contrib = self.mult * self.hits_y[self.src_l]
        sums = np.add.reduceat(contrib, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], sums[self.route[q]]) for q in range(self.Q))
        )

    def reduce_hits(self, *parts) -> float:
        """Round B: fold message columns into the resident result vector
        (unnormalized); returns the local Σx² so the driver can compute
        the global L2 scale — scalars only, like reduce_pr."""
        y_new = np.zeros(self.s_p, np.float64)
        for idx, vals in parts:
            if len(idx):
                y_new += np.bincount(idx, weights=vals, minlength=self.s_p)
        self.hits_in = y_new
        return float(np.dot(y_new, y_new))

    def hits_result(self, inv_norm: float) -> np.ndarray:
        """Normalized result partition for the partition-aligned handoff
        to the other shard set (and final extraction)."""
        return inv_norm * self.hits_in

    def katz_update(self, add: float) -> float:
        """Katz integer recurrence z ← Aᵀz + βᵗ on the HITS gather
        state (rayrank/katz.py): values are exact integers carried in
        float64, so the fold is order-free below 2^53.  Returns the
        partition max for the driver's exactness guard."""
        base = self.hits_in if self.hits_in is not None else np.zeros(self.s_p)
        self.hits_y = base + add
        return float(self.hits_y.max()) if self.s_p else 0.0

    def set_hits_y(self, arr: np.ndarray) -> None:
        self.hits_y = np.asarray(arr, np.float64)

    def get_hits_y(self) -> np.ndarray:
        return self.hits_y

    # ------------------------------------------------------------------
    # label algorithms (connected components / label propagation)
    # ------------------------------------------------------------------

    def init_labels(self) -> None:
        self.labels = np.arange(self.s_p, dtype=np.int64) * self.Q + self.p

    def set_labels(self, labels: np.ndarray) -> None:
        self.labels = np.asarray(labels, np.int64)

    def get_labels(self) -> np.ndarray:
        return self.labels

    def write_labels(self, path: str) -> dict:
        vid = np.arange(self.s_p, dtype=np.int64) * self.Q + self.p
        pq.write_table(pa.table({"vid": vid, "value": self.labels}), path)
        return {
            "part": self.p,
            "rows": int(self.s_p),
            "bytes": os.path.getsize(path),
            "path": path,
        }

    def init_dists(self, source_locals: np.ndarray) -> None:
        """BFS distance init: 0 at the given local indices, INF_DIST
        elsewhere.  Distances live in ``self.labels`` so the whole
        label machinery (gather_min, write_labels, zip_names) reuses."""
        self.labels = np.full(self.s_p, INF_DIST, np.int64)
        if len(source_locals):
            self.labels[np.asarray(source_locals, np.int64)] = 0

    def reduce_min_plus1(self, *parts) -> int:
        """BFS relaxation: dist[v] ← min(dist[v], min_in-nbr dist + 1).
        Unreached neighbors carry INF_DIST (< 2^63−1 after +1, no
        wrap); min keeps the resident INF so no spurious changes."""
        new = self.labels.copy()
        for idx, mins in parts:
            if len(idx):
                np.minimum.at(new, idx, mins + 1)
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    # ------------------------------------------------------------------
    # Maximal independent set (deterministic Luby-by-hash priority)
    # ------------------------------------------------------------------

    def init_mis(self) -> None:
        """MIS init: status lives in ``labels`` (0 undecided / 1 in /
        2 out); the tie-free priority ``splitmix64(vid)`` (bijective →
        unique) is resident actor-side.  Requires the undirected
        no-self-loop layout (derive_undirected drops loops) — a
        self-neighbor can never be a strict priority minimum and would
        deadlock undecided."""
        from .sketch import splitmix64

        vids = np.arange(self.s_p, dtype=np.int64) * self.Q + self.p
        self._mis_pri = splitmix64(vids)
        self.labels = np.zeros(self.s_p, np.int64)

    def init_mis_named(self, vert_dir: str) -> None:
        """MIS init with NAME-space priorities: ``splitmix64(int(name))``
        instead of ``splitmix64(vid)``.  Names are read from this
        shard's own vertex partition (``q={p}`` holds exactly the names
        of vids ≡ p mod Q — the zip_names layout), so the init is fully
        distributed: no driver vector, no cross-shard traffic.  Unlike
        the vid rule, the priority is independent of the polars-xxhash
        vid assignment, so the fixpoint is expressible in SQL (the
        driver's mis_vertices oracle unrolls the rounds in HUGEINT
        splitmix CTEs).  Raises on non-numeric names — the caller must
        know its vertex namespace is integral."""
        from .sketch import splitmix64

        self.labels = np.zeros(self.s_p, np.int64)
        if self.s_p == 0:
            self._mis_pri = np.empty(0, np.uint64)
            return
        d = os.path.join(vert_dir, f"q={self.p}")
        vt = pq.read_table(d, columns=["vid", "name"])
        if vt.num_rows != self.s_p:
            raise ValueError(
                f"init_mis_named: vertex partition {self.p} has "
                f"{vt.num_rows} rows, expected {self.s_p}"
            )
        order = np.argsort(vt.column("vid").to_numpy())
        ints = (
            pc.cast(vt.column("name"), pa.int64())  # raises on non-numeric
            .take(pa.array(order))
            .to_numpy(zero_copy_only=False)
        )
        self._mis_pri = splitmix64(ints)

    _MIS_NONE = np.uint64(0xFFFFFFFFFFFFFFFF)

    def gather_min_undecided_pri(self):
        """Per-destination MIN priority among UNDECIDED source
        neighbors (UINT64_MAX where none; shipped as the int64 view,
        viewed back in the reduce)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        pri = self._mis_pri[self.src_l].copy()
        pri[self.labels[self.src_l] != 0] = self._MIS_NONE
        mins = np.minimum.reduceat(pri, self.seg)
        return self._unwrap1(
            tuple(
                (self.out_local[q], mins[self.route[q]].view(np.int64))
                for q in range(self.Q)
            )
        )

    def reduce_mis_select(self, *parts) -> int:
        """Select round: an undecided vertex whose own priority is a
        STRICT minimum over its undecided neighbourhood enters the
        set.  Unique priorities make the strictness tie-free, so the
        fixpoint equals the sequential greedy MIS in priority order."""
        m = np.full(self.s_p, self._MIS_NONE, np.uint64)
        for idx, vals in parts:
            if len(idx):
                np.minimum.at(m, idx, np.asarray(vals, np.int64).view(np.uint64))
        newly = (self.labels == 0) & (self._mis_pri < m)
        self.labels[newly] = 1
        return int(np.count_nonzero(newly))

    def gather_has_in(self):
        """Per-destination max of (source status == IN)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        flag = (self.labels[self.src_l] == 1).astype(np.int64)
        maxs = np.maximum.reduceat(flag, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], maxs[self.route[q]]) for q in range(self.Q))
        )

    def reduce_mis_exclude(self, *parts) -> int:
        """Exclude round: undecided vertices adjacent to an IN vertex
        leave the race."""
        has = np.zeros(self.s_p, np.int64)
        for idx, vals in parts:
            if len(idx):
                np.maximum.at(has, idx, vals)
        newly = (self.labels == 0) & (has == 1)
        self.labels[newly] = 2
        return int(np.count_nonzero(newly))

    def undecided_count(self) -> int:
        return int(np.count_nonzero(self.labels == 0))

    # ------------------------------------------------------------------
    # Greedy coloring by iterated hash-MIS (Jones–Plassmann batched)
    # ------------------------------------------------------------------

    def init_coloring(self) -> None:
        """Coloring init: reuses the FULL MIS kernel set unchanged —
        labels carry the per-round MIS status (0 undecided / 1 in /
        2 out-or-already-colored; colored vertices are invisible to
        both gathers, exactly like MIS 'out'), colors are resident."""
        self.init_mis()
        self._colors = np.full(self.s_p, -1, np.int64)

    def init_coloring_named(self, vert_dir: str) -> None:
        """init_coloring with NAME-space priorities (init_mis_named) —
        the SQL-expressible rule; priorities persist across color
        classes (color_commit resets only the labels)."""
        self.init_mis_named(vert_dir)
        self._colors = np.full(self.s_p, -1, np.int64)

    def color_commit(self, c: int) -> int:
        """After a MIS fixpoint: set members take color ``c``; reset
        labels for the next round (colored → 2, rest back to 0).
        Returns the number of still-uncolored vertices."""
        self._colors[self.labels == 1] = c
        self.labels = np.where(self._colors >= 0, 2, 0).astype(np.int64)
        return int(np.count_nonzero(self.labels == 0))

    def finish_coloring(self) -> None:
        """Expose colors through the label machinery (get_labels /
        write_labels / zip_names)."""
        self.labels = self._colors

    def init_landmarks(self, source_locals: np.ndarray, seed_idx: np.ndarray, step: int) -> None:
        """Nearest-landmark init: label = ENCODED (dist, seed) pair
        ``dist·step + seed_idx`` (step = #seeds).  Seeds start at
        dist 0 → label = their seed index; INF_DIST elsewhere.  The
        min-plus relaxation with +step then propagates the
        LEXICOGRAPHIC (dist, seed_idx) minimum — same gather_min
        kernel as BFS, one int64 per vertex for K sources.  Margin:
        encoded values ≤ max_iter·step + step ≪ INF_DIST = 2^62."""
        self.labels = np.full(self.s_p, INF_DIST, np.int64)
        self._land_step = int(step)
        if len(source_locals):
            self.labels[np.asarray(source_locals, np.int64)] = np.asarray(
                seed_idx, np.int64
            )

    def reduce_min_plus_s(self, *parts) -> int:
        """Encoded nearest-landmark relaxation: label[v] ←
        min(label[v], min_in-nbr label + step).  INF stays dominant
        exactly as in reduce_min_plus1."""
        new = self.labels.copy()
        for idx, mins in parts:
            if len(idx):
                np.minimum.at(new, idx, mins + self._land_step)
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    def gather_min(self):
        """Per-destination min of source labels (CC round A)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        lab = self.labels[self.src_l]
        mins = np.minimum.reduceat(lab, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], mins[self.route[q]]) for q in range(self.Q))
        )

    # ------------------------------------------------------------------
    # shortest-path counts (σ, the Brandes forward pass)
    # ------------------------------------------------------------------

    def init_path_counts(self, source_locals: np.ndarray) -> None:
        """σ-counting init, run AFTER a BFS converged on these shards:
        the resident labels (exact hop distances) are stashed as the
        layer index, counts start at 1 on the seeds.  Layer-synchronous
        rounds then fill σ(v) = Σ σ(u) over in-neighbors one hop
        closer — the forward pass of Brandes' betweenness algorithm,
        riding the same CSR/message plumbing as gather_min."""
        self._pc_dist = self.labels.copy()
        self._pc_cnt = np.zeros(self.s_p, np.int64)
        if len(source_locals):
            self._pc_cnt[np.asarray(source_locals, np.int64)] = 1
        self._pc_round = 0

    def set_path_round(self, t: int) -> None:
        self._pc_round = int(t)

    def gather_paths(self):
        """Per-destination sum of σ over sources at layer round−1
        (sources at other layers contribute 0; collapsed CSR rows =
        simple-graph edges, matching the DISTINCT-pair oracle)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        at_prev = self._pc_dist[self.src_l] == self._pc_round - 1
        vals = np.where(at_prev, self._pc_cnt[self.src_l], 0)
        sums = np.add.reduceat(vals, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], sums[self.route[q]]) for q in range(self.Q))
        )

    def reduce_paths(self, *parts) -> int:
        """Assign σ to this partition's layer-round vertices.  Guard:
        raise (never wrap) past 2^62 — the close_wedges uint64-guard
        rule."""
        t = self._pc_round
        acc = np.zeros(self.s_p, np.int64)
        for idx, vals in parts:
            if len(idx):
                np.add.at(acc, idx, vals)
        mask = self._pc_dist == t
        if mask.any():
            mx = acc[mask].max()
            if mx > (1 << 62):
                raise OverflowError(
                    f"shortest-path counts exceed the int64 guard ({mx})"
                )
            self._pc_cnt[mask] = acc[mask]
        return int(mask.sum())

    def get_path_state(self):
        """(dist, σ) snapshot of this partition."""
        return self._pc_dist, self._pc_cnt

    def init_betweenness(self) -> None:
        """Dependency-accumulation init (run AFTER the σ pass): δ = 0
        everywhere; layers and σ stay resident from init_path_counts."""
        self._bw_delta = np.zeros(self.s_p, np.float64)

    def gather_delta(self):
        """Backward Brandes messages: per-destination Σ over sources
        at layer ``round`` of (1 + δ(w)) / σ(w).  The σ(v) factor is
        applied reduce-side where σ(v) is resident, so the message is
        one float per (source-layer vertex, destination)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.float64))
                    for q in range(self.Q)
                )
            )
        at_t = self._pc_dist[self.src_l] == self._pc_round
        sig = self._pc_cnt[self.src_l].astype(np.float64)
        contrib = np.where(
            at_t, (1.0 + self._bw_delta[self.src_l]) / np.maximum(sig, 1.0), 0.0
        )
        sums = np.add.reduceat(contrib, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], sums[self.route[q]]) for q in range(self.Q))
        )

    def reduce_delta(self, *parts) -> int:
        """δ(v) = σ(v) · Σ messages, assigned at layer round − 1."""
        t = self._pc_round
        acc = np.zeros(self.s_p, np.float64)
        for idx, vals in parts:
            if len(idx):
                np.add.at(acc, idx, vals)
        mask = self._pc_dist == t - 1
        if mask.any():
            self._bw_delta[mask] = self._pc_cnt[mask] * acc[mask]
        return int(mask.sum())

    def get_betweenness_state(self):
        """(dist, δ) snapshot of this partition."""
        return self._pc_dist, self._bw_delta

    def init_kcore(self, k: int) -> None:
        """k-core peel init: all vertices alive (labels=1), threshold
        stored actor-side so the generic reduce signature stays
        (*parts)."""
        self.labels = np.ones(self.s_p, np.int64)
        self._kcore_k = int(k)

    def gather_alive_count(self):
        """k-core gather: per-destination count of ALIVE neighbors
        (simple degree — the CSR rows are collapsed, one per distinct
        neighbor pair).  Pair with ``reduce_kcore``."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        alive = self.labels[self.src_l]
        sums = np.add.reduceat(alive, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], sums[self.route[q]]) for q in range(self.Q))
        )

    def reduce_kcore(self, *parts) -> int:
        """Synchronous peel round: alive ← alive ∧ (alive-degree ≥ k).
        The un-intersected rule {v : deg_alive(v) ≥ k} computes the
        same monotone sequence (degrees only shrink as the alive set
        shrinks), which is what the recursive-CTE oracle uses."""
        deg = np.zeros(self.s_p, np.int64)
        for idx, vals in parts:
            if len(idx):
                np.add.at(deg, idx, vals)
        new = self.labels & (deg >= self._kcore_k)
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    def gather_min_plus_w(self):
        """Weighted SSSP gather: per-destination min of (source
        distance + integer edge weight), weight = collapsed edge
        multiplicity (≥ 1).  Pair with ``reduce_min`` — the weight is
        added HERE, unlike the BFS ``gather_min``/``reduce_min_plus1``
        split.  INF_DIST sources yield INF+w > INF, which the resident
        INF wins against, so unreached neighbors cause no change."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        if not hasattr(self, "_wdist"):
            self._wdist = np.rint(self.mult).astype(np.int64)
        cost = self.labels[self.src_l] + self._wdist
        mins = np.minimum.reduceat(cost, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], mins[self.route[q]]) for q in range(self.Q))
        )

    def reduce_min(self, *parts) -> int:
        new = self.labels.copy()
        for idx, mins in parts:
            if len(idx):
                np.minimum.at(new, idx, mins)
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    # ------------------------------------------------------------------
    # masked CC (vertex-removal robustness without a graph rebuild)
    # ------------------------------------------------------------------

    def set_dead(self, hub_vids: np.ndarray) -> None:
        """Mark a (small, driver-broadcast) global vid set DEAD for the
        masked-CC rounds: dead vertices' labels are pinned at
        ``INF_DIST`` (min identity — they transmit nothing and are
        clamped back after every reduce, so they can never act as a
        conduit), which removes every incident edge semantically
        without touching the resident CSR arrays.  One graph build
        then serves a whole descending-k robustness sweep.  Also
        precomputes the ACTIVE set — alive vertices with ≥1 alive
        out-neighbor — which on the undirected layout (both directions
        present) is exactly 'has a surviving incident edge', the
        vertex census a fresh build over surviving edges would have."""
        hubs = np.asarray(hub_vids, np.int64)
        self._dead = np.zeros(self.s_p, bool)
        if len(hubs):
            mine = hubs[hubs % self.Q == self.p] // self.Q
            self._dead[mine] = True
        act = np.zeros(self.s_p, bool)
        if len(self.dst_sorted):
            ok = ~self._dead[self.src_l]
            if len(hubs):
                ok &= ~np.isin(self.dst_sorted, hubs)
            act[self.src_l[ok]] = True
        self._mask_active = act

    def init_labels_masked(self) -> None:
        self.init_labels()
        self.labels[self._dead] = INF_DIST

    def reduce_min_masked(self, *parts) -> int:
        """reduce_min with the dead clamp: in-edges from alive sources
        still exist in the CSR, so dead targets would otherwise absorb
        finite labels and count as 'changed' forever."""
        new = self.labels.copy()
        for idx, mins in parts:
            if len(idx):
                np.minimum.at(new, idx, mins)
        new[self._dead] = INF_DIST
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    def masked_label_census(self) -> pa.Table:
        """(label, n) over ACTIVE vertices only — matches the vertex
        set a fresh build over surviving edges would census (isolated
        survivors are not size-1 components)."""
        labs = self.labels[self._mask_active]
        u, c = np.unique(labs, return_counts=True)
        return pa.table({"label": u, "n": c.astype(np.int64)})

    # ------------------------------------------------------------------
    # per-edge tag overlay (bond-percolation edge masking — one build
    # serves the whole rate sweep, the r4 set_dead design's edge twin)
    # ------------------------------------------------------------------

    def load_edge_tags(self, tag_dir: str) -> int:
        """Align a (src, dst, etag) overlay partition (written by
        pipelines._write_edge_tags from the SAME named edge stream the
        graph was built from, hive-partitioned by part = src % Q) with
        the resident CSR arrays.  The alignment is verified key by key
        and RAISES on any mismatch — a silently partial overlay would
        mask the wrong edges (no-silent-caps)."""
        part_dir = os.path.join(tag_dir, f"part={self.p}")
        if os.path.isdir(part_dir):
            t = pq.read_table(part_dir, columns=["src", "dst", "etag"])
            es = t.column("src").to_numpy()
            ed = t.column("dst").to_numpy()
            tg = t.column("etag").to_numpy()
        else:
            es = ed = tg = np.empty(0, np.int64)
        gsrc = self.src_l * self.Q + self.p
        o1 = np.lexsort((gsrc, self.dst_sorted))
        o2 = np.lexsort((es, ed))
        if len(es) != len(gsrc) or not (
            np.array_equal(ed[o2], self.dst_sorted[o1])
            and np.array_equal(es[o2], gsrc[o1])
        ):
            raise ValueError(
                f"edge-tag overlay part={self.p} does not match the "
                "resident CSR edge set (stale overlay or wrong "
                "tag_dir)"
            )
        tags = np.empty(len(gsrc), np.int64)
        tags[o1] = tg[o2]
        self._etag = tags
        return len(tags)

    def set_edge_rate(self, rate: int) -> None:
        """Percolation mask: edge alive iff etag < rate.  The ACTIVE
        set (vertices with ≥ 1 alive incident edge — on the undirected
        layout the src side sees every incidence) is the per-rate
        census domain, matching 'endpoints of surviving edges'."""
        alive = self._etag < rate
        self._edge_alive = alive
        act = np.zeros(self.s_p, bool)
        if len(self.dst_sorted):
            act[self.src_l[alive]] = True
        self._rate_active = act

    def alive_edge_count(self) -> int:
        return int(self._edge_alive.sum())

    def gather_min_edge_masked(self):
        """gather_min with DEAD EDGES transmitting the min identity
        (INF_DIST): a fully-masked segment sends INF, which reduce_min
        folds as a no-op — edge removal without touching the CSR
        arrays or the segment structure."""
        if len(self.dst_sorted) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        lab = np.where(
            self._edge_alive, self.labels[self.src_l], INF_DIST
        )
        mins = np.minimum.reduceat(lab, self.seg)
        return self._unwrap1(
            tuple(
                (self.out_local[q], mins[self.route[q]])
                for q in range(self.Q)
            )
        )

    def rate_label_census(self) -> pa.Table:
        """(label, n) over rate-ACTIVE vertices only."""
        labs = self.labels[self._rate_active]
        u, c = np.unique(labs, return_counts=True)
        return pa.table({"label": u, "n": c.astype(np.int64)})

    # ------------------------------------------------------------------
    # max-min (widest / bottleneck path)
    # ------------------------------------------------------------------

    def init_widest(self, source_locals: np.ndarray) -> None:
        """Widest-path init: seed capacity = WIDEST_SEED (2^62, above
        any edge weight), 0 elsewhere."""
        self.labels = np.zeros(self.s_p, np.int64)
        if len(source_locals):
            self.labels[np.asarray(source_locals, np.int64)] = WIDEST_SEED

    def gather_maxmin_w(self):
        """Widest-path gather: per-destination MAX over in-edges of
        min(source width, integer edge weight = collapsed
        multiplicity).  Pair with ``reduce_max`` — the max-min
        bottleneck semiring (seventh gather/reduce instance).
        Zero-width sources yield min(0, w) = 0, which never raises a
        label, so unreached neighbors cause no change."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        if not hasattr(self, "_wdist"):
            self._wdist = np.rint(self.mult).astype(np.int64)
        cand = np.minimum(self.labels[self.src_l], self._wdist)
        maxs = np.maximum.reduceat(cand, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], maxs[self.route[q]]) for q in range(self.Q))
        )

    def reduce_max(self, *parts) -> int:
        new = self.labels.copy()
        for idx, maxs in parts:
            if len(idx):
                np.maximum.at(new, idx, maxs)
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    # ------------------------------------------------------------------
    # max-plus (DAG longest path / critical path)
    # ------------------------------------------------------------------

    def init_zero_labels(self) -> None:
        """Max-plus init: every vertex is a length-0 chain."""
        self.labels = np.zeros(self.s_p, np.int64)

    def gather_max(self):
        """Per-destination MAX of source labels — the dual of
        gather_min; with reduce_max_plus1 this is the max-plus
        relaxation ``L[v] ← max(L[v], max_in-nbr L + 1)`` whose
        fixpoint on a DAG layout is the longest-path (critical-path)
        length ending at each vertex."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        lab = self.labels[self.src_l]
        maxs = np.maximum.reduceat(lab, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], maxs[self.route[q]]) for q in range(self.Q))
        )

    def reduce_max_plus1(self, *parts) -> int:
        new = self.labels.copy()
        for idx, maxs in parts:
            if len(idx):
                np.maximum.at(new, idx, maxs + 1)
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    # ------------------------------------------------------------------
    # HyperANF (per-vertex HyperLogLog registers, Boldi-Vigna style)
    # ------------------------------------------------------------------
    # 16 registers × 4 bits packed into the resident int64 label, so
    # the whole label machinery (checkpoints, zip_names, part_refs)
    # reuses unchanged.  Rank caps at 15 — honest for per-register
    # cardinalities up to ~10^6·16 balls; widen the packing (2 words
    # per vertex) beyond that.  Merge = register-wise max, which the
    # gather/reduce pair computes nibble-wise on uint8 views.

    @staticmethod
    def _hll_nibbles(packed: np.ndarray):
        b = packed.view(np.uint8).reshape(-1, 8)
        return b >> 4, b & np.uint8(0xF)

    @staticmethod
    def _hll_pack(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        return (
            ((hi << 4) | lo).astype(np.uint8).copy().view(np.int64).ravel()
        )

    def init_hll(self) -> None:
        """Register init from splitmix64(vid): low 4 bits pick the
        register, rank = trailing-zero count of the remaining bits + 1
        (capped 15)."""
        from .sketch import splitmix64

        vid = (
            np.arange(self.s_p, dtype=np.int64) * self.Q + self.p
        ).astype(np.uint64)
        z = splitmix64(vid)
        j = (z & np.uint64(15)).astype(np.int64)
        rest = z >> np.uint64(4)
        with np.errstate(over="ignore"):
            lowbit = rest & (np.uint64(0) - rest)
        with np.errstate(divide="ignore"):
            tz = np.where(
                rest == 0, 60.0, np.log2(lowbit.astype(np.float64))
            )
        rho = np.minimum(tz.astype(np.int64) + 1, 15).astype(np.uint8)
        regs = np.zeros((self.s_p, 16), np.uint8)
        regs[np.arange(self.s_p), j] = rho
        hi, lo = regs[:, 1::2], regs[:, 0::2]  # byte k = regs 2k|2k+1
        self.labels = self._hll_pack(
            hi.astype(np.uint8), lo.astype(np.uint8)
        )

    def gather_bytemax(self):
        """Per-destination register-wise max of source HLL states."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        hi, lo = self._hll_nibbles(self.labels[self.src_l])
        n_seg = len(self.seg)
        mhi = np.empty((n_seg, 8), np.uint8)
        mlo = np.empty((n_seg, 8), np.uint8)
        for c in range(8):
            mhi[:, c] = np.maximum.reduceat(hi[:, c], self.seg)
            mlo[:, c] = np.maximum.reduceat(lo[:, c], self.seg)
        maxs = self._hll_pack(mhi, mlo)
        return self._unwrap1(
            tuple((self.out_local[q], maxs[self.route[q]]) for q in range(self.Q))
        )

    def reduce_bytemax(self, *parts) -> int:
        new = self.labels.copy()
        hi, lo = self._hll_nibbles(new)
        for idx, vals in parts:
            if len(idx):
                vhi, vlo = self._hll_nibbles(np.asarray(vals, np.int64))
                ii = np.asarray(idx, np.int64)
                np.maximum.at(hi, ii, vhi)
                np.maximum.at(lo, ii, vlo)
        new = self._hll_pack(hi, lo)
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    def hll_ball_sum(self) -> float:
        """Σ over resident vertices of the HLL ball-size estimate
        (α₁₆·m²/Σ2^(−r), small-range correction m·ln(m/V) when
        E ≤ 2.5m and zero registers exist) — one float per partition,
        folded in fixed q order on the driver."""
        hi, lo = self._hll_nibbles(self.labels)
        regs = np.empty((self.s_p, 16), np.uint8)
        regs[:, 1::2], regs[:, 0::2] = hi, lo
        denom = np.ldexp(1.0, -regs.astype(np.int64)).sum(axis=1)
        est = 0.673 * 256.0 / denom
        v0 = (regs == 0).sum(axis=1)
        small = (est <= 40.0) & (v0 > 0)
        est[small] = 16.0 * np.log(16.0 / v0[small])
        return float(est.sum())

    # ------------------------------------------------------------------
    # strongly connected components (trim + forward-label coloring peel)
    # ------------------------------------------------------------------

    def _scc_vids(self) -> np.ndarray:
        return np.arange(self.s_p, dtype=np.int64) * self.Q + self.p

    def init_scc(self) -> None:
        """State lives on the FORWARD shard set; the reversed set gets
        per-iteration snapshots via scc_set_state (the HITS fwd→rev
        ObjectRef handoff pattern, hits.py)."""
        self.scc_active = np.ones(self.s_p, bool)
        self.scc_id = np.full(self.s_p, -1, np.int64)
        self.scc_mark = np.zeros(self.s_p, bool)
        self.labels = np.full(self.s_p, INF_DIST, np.int64)

    def scc_get_state(self):
        return (self.scc_active, self.labels, self.scc_mark)

    def scc_set_state(self, state) -> None:
        self.scc_active, self.labels, self.scc_mark = state

    def scc_reset_labels(self) -> None:
        """F := own vid on active vertices, INF on settled ones."""
        self.labels = np.where(self.scc_active, self._scc_vids(), INF_DIST)

    def gather_min_active(self):
        """gather_min with settled senders masked to INF (they must
        neither seed nor relay labels through the residual graph)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        lab = np.where(
            self.scc_active[self.src_l], self.labels[self.src_l], INF_DIST
        )
        mins = np.minimum.reduceat(lab, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], mins[self.route[q]]) for q in range(self.Q))
        )

    def reduce_min_active(self, *parts) -> int:
        """reduce_min, then re-pin settled receivers to INF so they
        never look like region members again."""
        new = self.labels.copy()
        for idx, mins in parts:
            if len(idx):
                np.minimum.at(new, idx, mins)
        new[~self.scc_active] = INF_DIST
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed

    def gather_active_count(self):
        """Per-destination count of ACTIVE sources (collapsed edges, so
        this is the residual in-degree on the forward layout and the
        residual out-degree on the reversed one)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        vals = self.scc_active[self.src_l].astype(np.int64)
        sums = np.add.reduceat(vals, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], sums[self.route[q]]) for q in range(self.Q))
        )

    def scc_set_indeg(self, *parts) -> None:
        arr = np.zeros(self.s_p, np.int64)
        for idx, vals in parts:
            if len(idx):
                np.add.at(arr, idx, vals)
        self._scc_indeg = arr

    def scc_trim_outdeg(self, *parts) -> int:
        """Trim: an active vertex with residual in-degree 0 or residual
        out-degree 0 is a singleton SCC — settle it as its own id."""
        out = np.zeros(self.s_p, np.int64)
        for idx, vals in parts:
            if len(idx):
                np.add.at(out, idx, vals)
        t = self.scc_active & ((self._scc_indeg == 0) | (out == 0))
        if t.any():
            self.scc_id[t] = self._scc_vids()[t]
            self.scc_active &= ~t
        return int(t.sum())

    def scc_init_mark(self) -> int:
        """Region owners (F == own vid) seed the backward reach."""
        self.scc_mark = self.scc_active & (self.labels == self._scc_vids())
        return int(self.scc_mark.sum())

    def gather_mark_max(self):
        """Reversed-layout gather: per-destination max of (F if marked
        and active else −1) over sources — i.e. over the ORIGINAL
        graph's out-neighbours.  At the F fixpoint every out-neighbour
        has F(w) ≤ F(v), so max == F(v) ⟺ some marked out-neighbour
        shares v's region: v reaches its owner through region-internal
        vertices only (region-internality is what makes the backward
        pass sound — see rayrank/scc.py module docstring)."""
        if len(self.w) == 0:
            return self._unwrap1(
                tuple(
                    (self.out_local[q], np.empty(0, np.int64))
                    for q in range(self.Q)
                )
            )
        vals = np.where(
            self.scc_mark[self.src_l] & self.scc_active[self.src_l],
            self.labels[self.src_l],
            -1,
        )
        maxs = np.maximum.reduceat(vals, self.seg)
        return self._unwrap1(
            tuple((self.out_local[q], maxs[self.route[q]]) for q in range(self.Q))
        )

    def scc_reduce_mark(self, *parts) -> int:
        got = np.full(self.s_p, -1, np.int64)
        for idx, vals in parts:
            if len(idx):
                np.maximum.at(got, idx, vals)
        new = self.scc_mark | (
            self.scc_active & (self.labels != INF_DIST) & (got == self.labels)
        )
        changed = int(np.count_nonzero(new != self.scc_mark))
        self.scc_mark = new
        return changed

    def scc_commit(self) -> int:
        """Settle every marked vertex with scc_id = its region owner F;
        returns the remaining active count."""
        m = self.scc_mark
        if m.any():
            self.scc_id[m] = self.labels[m]
            self.scc_active &= ~m
            self.scc_mark = np.zeros(self.s_p, bool)
        return int(self.scc_active.sum())

    def scc_finish(self) -> None:
        """Expose scc ids through the label machinery (labels_dataset,
        write_labels, zip_names)."""
        self.labels = self.scc_id

    def gather_counts(self):
        """Per-(destination, label) multiplicity-weighted counts (LP
        round A), combined map-side."""
        Q = self.Q
        if len(self.w) == 0:
            e = np.empty(0, np.int64)
            return self._unwrap1(
                tuple((e, e, np.empty(0, np.float64)) for _ in range(Q))
            )
        lab = self.labels[self.src_l]
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
        return self._unwrap1(tuple(out))

    def reduce_counts(self, *parts) -> int:
        """Mode label with min-label tie-break (rule pinned in
        FIXTURES.md §1 / labelprop.py)."""
        idxs = [p[0] for p in parts if len(p[0])]
        if not idxs:
            return 0
        idx = np.concatenate(idxs)
        lab = np.concatenate([p[1] for p in parts if len(p[0])])
        cnt = np.concatenate([p[2] for p in parts if len(p[0])])

        order = np.lexsort((lab, idx))
        idx, lab, cnt = idx[order], lab[order], cnt[order]
        seg_mask = np.empty(len(idx), bool)
        seg_mask[0] = True
        np.logical_or(idx[1:] != idx[:-1], lab[1:] != lab[:-1], out=seg_mask[1:])
        seg = np.flatnonzero(seg_mask)
        idx_u, lab_u = idx[seg], lab[seg]
        cnt_u = np.add.reduceat(cnt, seg)

        order2 = np.lexsort((lab_u, -cnt_u, idx_u))
        idx_s, lab_s = idx_u[order2], lab_u[order2]
        first = np.empty(len(idx_s), bool)
        first[0] = True
        np.not_equal(idx_s[1:], idx_s[:-1], out=first[1:])

        new = self.labels.copy()
        new[idx_s[first]] = lab_s[first]
        changed = int(np.count_nonzero(new != self.labels))
        self.labels = new
        return changed


    # ------------------------------------------------------------------
    # triangle counting (oriented wedge join, actor-resident)
    # ------------------------------------------------------------------

    def local_degrees(self) -> np.ndarray:
        """Distinct-neighbor degree per local vertex (undirected layout:
        this shard holds the FULL adjacency of its vertices)."""
        if not hasattr(self, "_deg_local"):
            self._deg_local = np.bincount(
                self.src_l, minlength=self.s_p
            ).astype(np.int64)
        return self._deg_local

    def neighbor_requests(self):
        """Round T0: the unique neighbor vids this shard needs degrees
        for, routed by owner partition (these are exactly the
        ``out_local`` routing arrays precomputed at init) — the
        partitioned degree exchange; no shard ever receives a full
        degree vector (r1 VERDICT finding #3)."""
        return self._unwrap1(tuple(self.out_local[q] for q in range(self.Q)))

    def degrees_for(self, idx: np.ndarray) -> np.ndarray:
        """Round T1: answer a degree request with this shard's local
        (== global, full-adjacency layout) degrees."""
        return self.local_degrees()[np.asarray(idx, np.int64)]

    def make_wedges(self, *deg_answers):
        """Round T2: oriented wedges from this shard's adjacency.

        ``deg_answers[q]``: degrees aligned with ``out_local[q]`` (the
        responses to :meth:`neighbor_requests`).  Edges are oriented
        toward the (deg, vid)-larger endpoint; for each local vertex the
        rank-sorted oriented out-neighbors yield the wedge pairs (a, b)
        [rank(a) < rank(b)] with the center.  Returns per-partition
        (a_local, b, center) triples routed by ``a % Q`` — shard a%Q
        owns adj(a) and closes the wedge.  Wedge emission is fully
        vectorized (repeat/cumsum expansion — no per-center Python
        loop)."""
        Q = self.Q
        empty = (
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
        )
        if len(self.src_l) == 0:
            return self._unwrap1(tuple(empty for _ in range(Q)))
        # degree of each unique dst, reassembled from the exchange
        deg_uniq = np.empty(len(self.uniq_dst), np.int64)
        for q in range(Q):
            if len(self.route[q]):
                deg_uniq[self.route[q]] = np.asarray(deg_answers[q], np.int64)
        # per-edge neighbor degree via the edge → unique-dst index
        uniq_idx = np.cumsum(
            np.concatenate([[1], self.dst_sorted[1:] != self.dst_sorted[:-1]])
        ) - 1
        deg_n = deg_uniq[uniq_idx]

        v_glob = self.src_l * Q + self.p
        nbr = self.dst_sorted
        deg_v = self.local_degrees()[self.src_l]
        # keep (v → u) where rank(u) > rank(v), rank = (deg, vid)
        keep = (deg_n > deg_v) | ((deg_n == deg_v) & (nbr > v_glob))
        src_k = self.src_l[keep]
        nbr_k = nbr[keep]
        deg_k = deg_n[keep]
        # sort by (center, neighbor rank)
        order = np.lexsort((nbr_k, deg_k, src_k))
        src_k, nbr_k = src_k[order], nbr_k[order]
        # vectorized pair expansion: element at in-group position i
        # pairs with every LATER element of its group
        counts = np.bincount(src_k, minlength=self.s_p)
        n = len(src_k)
        if n == 0:
            return self._unwrap1(tuple(empty for _ in range(Q)))
        group_end = np.repeat(np.cumsum(counts), counts)  # per element
        rep = group_end - np.arange(n) - 1  # later-neighbor count
        total = int(rep.sum())
        if total == 0:
            return self._unwrap1(tuple(empty for _ in range(Q)))
        a_idx = np.repeat(np.arange(n), rep)
        run_starts = np.concatenate([[0], np.cumsum(rep)[:-1]])
        b_off = np.arange(total) - np.repeat(run_starts, rep) + 1
        b_idx = a_idx + b_off
        a = nbr_k[a_idx]
        b = nbr_k[b_idx]
        c = src_k[a_idx] * Q + self.p
        aq = a % Q
        out = []
        for qq in range(Q):
            m = aq == qq
            out.append(((a[m] // Q).astype(np.int64), b[m], c[m]))
        return self._unwrap1(tuple(out))

    def close_wedges(self, *parts):
        """Round T3: check wedge closure against this shard's adjacency
        (sorted combined uint64 key + searchsorted).  Returns
        ``(n_triangles, msg_0, …, msg_{Q-1})`` where ``msg_q`` is the
        (local_idx, count) pair of per-vertex triangle increments owned
        by partition q — routed like contributions, map-side combined;
        the driver never sees role vectors (r1 VERDICT finding #3).

        Key-width guard: needs ``dst vid < 2^40`` and local index
        < 2^24·…  — precisely ``src_l·2^40 + dst`` must fit uint64,
        i.e. ``s_p ≤ 2^24`` with 40-bit vids.  Out-of-range graphs must
        use the Dataset wedge join (triangles.triangle_rows), which has
        no such cap — enforced by an explicit ValueError here, never a
        silent wrap."""
        Q = self.Q
        key_base = np.uint64(1) << np.uint64(40)
        if len(self.src_l):
            if self.dst_sorted.max() >= np.int64(key_base) or self.s_p > (
                1 << 23
            ):
                raise ValueError(
                    "combined wedge key exceeds uint64: use the Dataset "
                    "triangle path (triangles.triangle_rows)"
                )
            adj_key = np.sort(
                self.src_l.astype(np.uint64) * key_base
                + self.dst_sorted.astype(np.uint64)
            )
        else:
            adj_key = np.empty(0, np.uint64)
        n_tri = 0
        members = []
        for a_local, b, center in parts:
            if len(a_local) == 0 or len(adj_key) == 0:
                continue
            qk = (
                np.asarray(a_local, np.uint64) * key_base
                + np.asarray(b, np.uint64)
            )
            idx = np.clip(np.searchsorted(adj_key, qk), 0, len(adj_key) - 1)
            hit = adj_key[idx] == qk
            if hit.any():
                n_tri += int(hit.sum())
                a_glob = a_local[hit] * Q + self.p
                members.append(np.concatenate([center[hit], a_glob, b[hit]]))
        out = [n_tri]
        mem = (
            np.concatenate(members) if members else np.empty(0, np.int64)
        )
        mq = mem % Q
        for q in range(Q):
            sel = mem[mq == q] // Q
            u, cnt = np.unique(sel, return_counts=True)
            out.append((u.astype(np.int64), cnt.astype(np.int64)))
        return tuple(out)

    def reduce_tri(self, *parts) -> int:
        """Round T4: fold routed triangle-count messages into the
        resident per-vertex counter; returns the local total (scalar)."""
        self.tri_counts = np.zeros(self.s_p, np.int64)
        for u, cnt in parts:
            if len(u):
                self.tri_counts[u] += cnt
        return int(self.tri_counts.sum())

    def get_tri_counts(self) -> np.ndarray:
        return self.tri_counts


@ray.remote
def zip_names(vert_dir: str, q: int, Q: int, vals, value_col: str) -> pa.Table:
    """(vid, name, value) for ONE state partition, assembled inside a
    task — vertex partition ``q`` holds exactly the names of vids ≡ q
    (mod Q), so attaching names needs no shuffle and the driver never
    sees a vector (r1 VERDICT finding #2: result extraction must not
    concatenate all partitions driver-side)."""
    vals = np.asarray(vals)
    vid = np.arange(len(vals), dtype=np.int64) * Q + q
    d = os.path.join(vert_dir, f"q={q}")
    if os.path.isdir(d):
        vt = pq.read_table(d, columns=["vid", "name"])
        v_vid = vt.column("vid").to_numpy()
        order = np.argsort(v_vid)
        # ranks are dense: sorted vertex vids == vid by construction
        names = vt.column("name").take(pa.array(order))
    else:
        names = pa.array([""] * len(vals), pa.string())
    return pa.table({"vid": vid, "name": names, value_col: vals})


@ray.remote
def unique_labels_part(vals) -> pa.Table:
    """Local distinct of one label partition (map-side combine for the
    distributed component count)."""
    return pa.table({"label": np.unique(np.asarray(vals, np.int64))})


@ray.remote
def zip_path_counts(vert_dir: str, q: int, Q: int, state) -> pa.Table:
    """(name, dist, paths) for ONE partition's reached vertices —
    names attached co-resident like zip_names, unreached rows
    filtered task-side."""
    dist, cnt = state
    d = np.asarray(dist, np.int64)
    c = np.asarray(cnt, np.int64)
    keep = d < INF_DIST
    vdir = os.path.join(vert_dir, f"q={q}")
    if not os.path.isdir(vdir):
        return pa.table(
            {
                "name": pa.array([], pa.string()),
                "dist": pa.array([], pa.int64()),
                "paths": pa.array([], pa.int64()),
            }
        )
    vt = pq.read_table(vdir, columns=["vid", "name"])
    order = np.argsort(vt.column("vid").to_numpy())
    names = vt.column("name").take(pa.array(order[np.flatnonzero(keep)]))
    return pa.table({"name": names, "dist": d[keep], "paths": c[keep]})


@ray.remote
def zip_delta(vert_dir: str, q: int, state) -> pa.Table:
    """(name, dependency) for ONE partition's reached vertices."""
    dist, delta = state
    d = np.asarray(dist, np.int64)
    x = np.asarray(delta, np.float64)
    keep = d < INF_DIST
    vdir = os.path.join(vert_dir, f"q={q}")
    if not os.path.isdir(vdir):
        return pa.table(
            {
                "name": pa.array([], pa.string()),
                "dependency": pa.array([], pa.float64()),
            }
        )
    vt = pq.read_table(vdir, columns=["vid", "name"])
    order = np.argsort(vt.column("vid").to_numpy())
    names = vt.column("name").take(pa.array(order[np.flatnonzero(keep)]))
    return pa.table({"name": names, "dependency": x[keep]})


@ray.remote
def reach_stats_part(vals) -> tuple:
    """(#reached, Σdist, max dist) of ONE distance partition — the
    per-partition partial for closeness / eccentricity folds; three
    scalars leave the task, never a vector (r1 VERDICT finding #2
    discipline)."""
    v = np.asarray(vals, np.int64)
    m = v < INF_DIST
    if not m.any():
        return 0, 0, -1
    d = v[m]
    return int(len(d)), int(d.sum()), int(d.max())


@ray.remote
def dist_hist_part(vals) -> tuple:
    """Finite-distance histogram (unique dists, counts) of ONE
    distance partition — the per-partition partial for per-seed
    distance-distribution folds.  Output is diameter-bounded (one row
    per distinct hop count), so Q partials leave the tasks as tiny
    int64 arrays, never a distance vector."""
    v = np.asarray(vals, np.int64)
    m = v < INF_DIST
    if not m.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d, c = np.unique(v[m], return_counts=True)
    return d.astype(np.int64), c.astype(np.int64)


@ray.remote
def far_vertex_part(vert_dir: str, q: int, vals) -> tuple:
    """(max finite dist, lexicographically-min name at that dist) of
    ONE distance partition — the per-partition partial for the
    farthest-vertex pick of the diameter double sweep.  Names come
    from the co-resident vertex partition (same no-shuffle layout as
    zip_names); (-1, "") when the partition has no reached vertex."""
    v = np.asarray(vals, np.int64)
    m = v < INF_DIST
    if not m.any():
        return -1, ""
    dmax = int(v[m].max())
    at = np.flatnonzero(v == dmax)
    d = os.path.join(vert_dir, f"q={q}")
    vt = pq.read_table(d, columns=["vid", "name"])
    order = np.argsort(vt.column("vid").to_numpy())
    names = vt.column("name").take(pa.array(order[at]))
    return dmax, pc.min(names).as_py()


def create_shards(graph_dir: str, meta) -> list:
    """One CsrShard per partition; blocks until all are built."""
    shards = [
        CsrShard.remote(graph_dir, p, meta.Q, meta.part_sizes) for p in range(meta.Q)
    ]
    ray.get([s.ready.remote() for s in shards])
    return shards


def gather_refs(shards: list, method: str):
    """Round A for all shards; returns msgs[p][q] ObjectRefs."""
    Q = len(shards)
    out = []
    for p in range(Q):
        refs = getattr(shards[p], method).options(num_returns=Q).remote()
        out.append(refs if Q > 1 else [refs])
    return out
