#!/usr/bin/env python3
"""Benchmark harness (BASELINE.md target metric).

Default mode: runs the headline pipelines at the scale factor implied
by ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32)
and prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": .., "num_cpus": N, "extra": {...}}

Headline = wall time of reference-exact PageRank to residual < 1e-6 on
the SF-scale synthetic code-repo edge table (BASELINE.json metric);
``extra.edges_per_sec_per_iter`` carries the throughput number.

``--scaling``: runs this script twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (N vs 4N evidence
protocol, BASELINE.md) and prints throughput at both + scaling
efficiency.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.1


def run_bench() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from rayrank import configure_data_context
    from rayrank.components import connected_components
    from rayrank.corpus import default_corpus_dir, generate_corpus
    from rayrank.graph import build_graph
    from rayrank.ingest import derive_edges, read_corpus
    from rayrank.labelprop import label_propagation
    from rayrank.pagerank import power_method
    from rayrank.triangles import triangle_count

    configure_data_context()
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # -- corpus (cached, deterministic) + page-cache warm read ----------
    cdir = generate_corpus(default_corpus_dir(sf), sf=sf)
    import pyarrow.parquet as pq

    pq.read_table(cdir)  # warm OS page cache (untimed)

    # -- ingest (edge derivation), materialized once for both builds ----
    t0 = time.perf_counter()
    edges = derive_edges(read_corpus(cdir), num_partitions=16).materialize()
    n_edges = edges.count()
    queries["ingest_derive"] = time.perf_counter() - t0

    # partition count scales with the DATA (identical at every
    # parallelism level → identical partitioning for the N-vs-4N runs);
    # ~50k edges per partition keeps per-round message count Q² sane
    Q = min(32, max(4, n_edges // 50_000))
    extra["Q"] = Q

    # -- directed graph build -------------------------------------------
    # join parallelism fixed at 32 (the hi cluster size) so the job is
    # identical at every CPU level
    gdir = tempfile.mkdtemp(prefix="rayrank_bench_g_")
    t0 = time.perf_counter()
    meta = build_graph(edges, gdir, num_partitions=Q, join_partitions=32)
    queries["graph_build"] = time.perf_counter() - t0
    extra["nnz"] = meta.nnz
    extra["edge_multiplicity_total"] = meta.edge_multiplicity_total
    extra["n_vertices"] = meta.n

    # -- headline: PageRank to 1e-6 ------------------------------------
    # shard state is built ONCE per graph and reused by every algorithm
    # (the actor-resident-CSR design's point); load time is reported as
    # its own line so the iteration metric measures iterations
    from rayrank.shards import create_shards

    t0 = time.perf_counter()
    dshards = create_shards(gdir, meta)
    queries["shard_load"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = power_method(gdir, shards=dshards, epsilon=1e-6)
    pr_sec = time.perf_counter() - t0
    queries["pagerank"] = pr_sec
    extra["pagerank_iterations"] = res.iterations
    extra["pagerank_converged"] = bool(res.converged)
    extra["ingest_plus_build_sec"] = round(queries["ingest_derive"] + queries["graph_build"], 3)
    extra["edges_per_sec_per_iter"] = (
        meta.edge_multiplicity_total * res.iterations / pr_sec
    )

    # -- undirected algorithms -----------------------------------------
    from rayrank.graph import derive_undirected

    udir = tempfile.mkdtemp(prefix="rayrank_bench_u_")
    t0 = time.perf_counter()
    umeta = derive_undirected(gdir, udir, join_partitions=32)
    queries["undirected_build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ushards = create_shards(udir, umeta)
    queries["shard_load_undirected"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cc = connected_components(udir, shards=ushards)
    queries["connected_components"] = time.perf_counter() - t0
    extra["cc_iterations"] = cc.iterations

    t0 = time.perf_counter()
    label_propagation(udir, shards=ushards, max_iterations=10)
    queries["label_propagation_10it"] = time.perf_counter() - t0

    from rayrank.triangles import triangle_count_shards

    t0 = time.perf_counter()
    tri = triangle_count_shards(udir, shards=ushards)[0]
    queries["triangle_count"] = time.perf_counter() - t0
    extra["triangles"] = tri

    # the resident CSR pools are done — release their CPU reservations
    # (2·Q default-1-CPU actors otherwise pin ~20/32 CPUs through the
    # whole data-ops section below and inflate every timing 2-5×)
    for s in dshards + ushards:
        ray.kill(s)
    del dshards, ushards

    # -- data ops over the testdata tables -----------------------------
    if os.path.isdir(sf_dir):
        import ray.data

        from rayrank.pipelines import ann_topk, docs_exact_dedup
        from rayrank.relational import pricing_summary, user_sessions

        t0 = time.perf_counter()
        docs_exact_dedup(sf_dir).count()
        queries["docs_exact_dedup"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ann_topk(sf_dir).count()
        queries["ann_topk"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pricing_summary(sf_dir).count()
        queries["pricing_summary"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        user_sessions(sf_dir).count()
        queries["user_sessions"] = time.perf_counter() - t0

        from rayrank.analytics import big_orders, user_running_totals
        from rayrank.pipelines import hits_2iter

        t0 = time.perf_counter()
        big_orders(sf_dir).count()
        queries["big_orders"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        user_running_totals(sf_dir).count()
        queries["user_running_totals"] = time.perf_counter() - t0

        # includes the directed lineitem-graph build + reversed derive
        t0 = time.perf_counter()
        hits_2iter(sf_dir).count()
        queries["hits_2iter"] = time.perf_counter() - t0

        from rayrank.decision import part_pairs_topk, volume_shipping

        t0 = time.perf_counter()
        volume_shipping(sf_dir).count()
        queries["volume_shipping"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        part_pairs_topk(sf_dir).count()
        queries["part_pairs_topk"] = time.perf_counter() - t0

        from rayrank.decision import adamic_adar_topk, urgent_year_revenue
        from rayrank.terms import inverted_index

        t0 = time.perf_counter()
        adamic_adar_topk(sf_dir).count()
        queries["adamic_adar_topk"] = time.perf_counter() - t0

        # bloom-prefiltered semi-join funnel (exact-join backstop)
        t0 = time.perf_counter()
        urgent_year_revenue(sf_dir).count()
        queries["urgent_year_revenue"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        inverted_index(sf_dir).count()
        queries["inverted_index"] = time.perf_counter() - t0

        from rayrank.pipelines import two_hop_neighbors
        from rayrank.reports import market_share

        # 5-table funnel with a big-big order join
        t0 = time.perf_counter()
        market_share(sf_dir).count()
        queries["market_share"] = time.perf_counter() - t0

        # deduped und self-join (the deg² expansion shape)
        t0 = time.perf_counter()
        two_hop_neighbors(sf_dir).count()
        queries["two_hop_neighbors"] = time.perf_counter() - t0

    out = {
        "metric": (
            "wall sec of reference-exact PageRank to eps=1e-6 on the "
            f"SF={sf} synthetic code-repo edge table (see extra.* for "
            "edges/s/iter)"
        ),
        "value": round(pr_sec, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf,
        "num_cpus": ncpu,
        "extra": {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in extra.items()
        },
    }
    ray.shutdown()
    return out



def _quiesce():
    """Between two fresh-cluster sub-runs: make sure the previous
    cluster's daemons are fully gone (their shutdown work otherwise
    overlaps and skews the next measurement — observed 2x noise)."""
    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    time.sleep(5)

def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        _quiesce()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    reps = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))

    def best_of(ncpu: int) -> dict:
        """Per-query MIN over repeats — the hypervisor on this box shows
        phantom load/steal (observed 2-4x stage noise); min is the
        honest estimate of what the hardware does."""
        runs = [run(ncpu) for _ in range(reps)]
        best = dict(runs[0])
        best["queries"] = {
            k: min(r["queries"][k] for r in runs) for k in runs[0]["queries"]
        }
        best["extra"] = dict(runs[0]["extra"])
        best["extra"]["edges_per_sec_per_iter"] = max(
            r["extra"]["edges_per_sec_per_iter"] for r in runs
        )
        best["extra"]["ingest_plus_build_sec"] = round(
            best["queries"]["ingest_derive"] + best["queries"]["graph_build"], 3
        )
        best["value"] = best["queries"]["pagerank"]
        return best

    r_lo = best_of(lo)
    r_hi = best_of(hi)
    thr_lo = r_lo["extra"]["edges_per_sec_per_iter"]
    thr_hi = r_hi["extra"]["edges_per_sec_per_iter"]
    eff_solve = (thr_hi / thr_lo) / (hi / lo)
    ib_lo = r_lo["extra"]["ingest_plus_build_sec"]
    ib_hi = r_hi["extra"]["ingest_plus_build_sec"]
    eff_ingest = (ib_lo / ib_hi) / (hi / lo)
    # full-pipeline efficiency over everything timed (the fair
    # same-job-two-sizes comparison: ingest + build + all algorithms)
    tot_lo = sum(r_lo["queries"].values())
    tot_hi = sum(r_hi["queries"].values())
    eff_total = (tot_lo / tot_hi) / (hi / lo)
    return {
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "pagerank_sec_lo": r_lo["value"],
        "pagerank_sec_hi": r_hi["value"],
        "edges_per_sec_per_iter_lo": round(thr_lo, 1),
        "edges_per_sec_per_iter_hi": round(thr_hi, 1),
        "scaling_efficiency_solve": round(eff_solve, 3),
        "ingest_build_sec_lo": ib_lo,
        "ingest_build_sec_hi": ib_hi,
        "scaling_efficiency_ingest_build": round(eff_ingest, 3),
        "total_sec_lo": round(tot_lo, 3),
        "total_sec_hi": round(tot_hi, 3),
        "scaling_efficiency_total_pipeline": round(eff_total, 3),
        "sf": r_lo["sf"],
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
    }


def build_only(out_dir: str) -> dict:
    """Ingest + build the SF graph into ``out_dir`` (fresh process)."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = _sf_of(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.corpus import default_corpus_dir, generate_corpus
    from rayrank.graph import build_graph
    from rayrank.ingest import derive_edges, read_corpus

    configure_data_context()
    cdir = generate_corpus(default_corpus_dir(sf), sf=sf)
    t0 = time.perf_counter()
    edges = derive_edges(read_corpus(cdir), num_partitions=32).materialize()
    n_edges = edges.count()
    Q = min(32, max(4, n_edges // 50_000))
    meta = build_graph(edges, out_dir, num_partitions=Q, join_partitions=32)
    ray.shutdown()
    return {"sf": sf, "Q": Q, "edges": meta.edge_multiplicity_total,
            "build_sec": round(time.perf_counter() - t0, 3)}


def solve_only(graph_dir: str, repeats: int = 3) -> dict:
    """PageRank solve on a prebuilt graph (fresh process, warm shards
    after the first repeat — report best of ``repeats``)."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.graph import GraphMeta
    from rayrank.pagerank import power_method
    from rayrank.shards import create_shards

    configure_data_context()
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    shards = create_shards(graph_dir, meta)
    best = None
    iters = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = power_method(graph_dir, shards=shards, epsilon=1e-6)
        dt = time.perf_counter() - t0
        iters = res.iterations
        best = dt if best is None else min(best, dt)
    thr = meta.edge_multiplicity_total * iters / best
    ray.shutdown()
    return {
        "num_cpus": ncpu,
        "pagerank_sec": round(best, 3),
        "iterations": iters,
        "edges": meta.edge_multiplicity_total,
        "edges_per_sec_per_iter": round(thr, 1),
    }


def run_solve_scaling() -> dict:
    """North-rule metric isolation: build ONCE (32 cpus), then run the
    identical solve on the identical graph at num_cpus=8 and 32 in
    fresh processes."""
    gdir = tempfile.mkdtemp(prefix="rayrank_solvescale_")

    def sub(args, ncpu):
        _quiesce()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    build = sub(["--build-only", gdir], 32)
    lo = sub(["--solve", gdir], 8)
    hi = sub(["--solve", gdir], 32)
    eff = (hi["edges_per_sec_per_iter"] / lo["edges_per_sec_per_iter"]) / 4
    return {
        "mode": "solve_scaling",
        "build": build,
        "solve_lo": lo,
        "solve_hi": hi,
        "scaling_efficiency_solve": round(eff, 3),
    }


def synth_partitioned_graph(
    out_dir: str, n_vertices: int, n_edges: int, Q: int = 32, seed: int = 9
) -> None:
    """Deterministic synthetic graph written DIRECTLY in the engine's
    partitioned layout (one parallel task per partition) — lets the
    solve be benchmarked at edge counts where per-iteration compute
    dominates round latency, without a 100×-scale corpus build.

    Semantics match the real layout: src local to its partition,
    w = 1/outdeg(src) per edge row (parallel edges sum in the CSR
    reduce, the reference's multi-edge rule)."""
    import ray

    @ray.remote
    def gen_part(p: int) -> int:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(seed * 1000 + p)
        s_p = n_vertices // Q
        m_p = n_edges // Q
        src_local = rng.integers(0, s_p, size=m_p)
        src = src_local * Q + p
        dst = rng.integers(0, n_vertices // Q, size=m_p) * Q + rng.integers(
            0, Q, size=m_p
        )
        outdeg = np.bincount(src_local, minlength=s_p)
        w = 1.0 / outdeg[src_local]
        d = os.path.join(out_dir, "edges", f"part={p}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                    "mult": pa.array(
                        __import__("numpy").ones(m_p, dtype="int64")
                    ),
                    "w": pa.array(w, pa.float64()),
                }
            ),
            os.path.join(d, "data.parquet"),
        )
        return m_p

    import json as _json

    counts = ray.get([gen_part.remote(p) for p in range(Q)])
    meta = {
        "n": n_vertices,
        "Q": Q,
        "part_sizes": [n_vertices // Q] * Q,
        "nnz": sum(counts),
        "edge_multiplicity_total": sum(counts),
        "filter_ratio": None,
        "undirected": False,
        "lineage": {"synthetic": True, "seed": seed},
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        _json.dump(meta, f)


def solve_fixed_iters(graph_dir: str, iters: int = 10, repeats: int = 3) -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.graph import GraphMeta
    from rayrank.pagerank import power_method
    from rayrank.shards import create_shards

    configure_data_context()
    meta = GraphMeta.load(os.path.join(graph_dir, "meta.json"))
    shards = create_shards(graph_dir, meta)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        power_method(graph_dir, shards=shards, max_iterations=iters,
                     epsilon=0.0)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    thr = meta.edge_multiplicity_total * iters / best
    ray.shutdown()
    return {
        "num_cpus": ncpu,
        "sec_for_iters": round(best, 3),
        "iterations": iters,
        "edges": meta.edge_multiplicity_total,
        "edges_per_sec_per_iter": round(thr, 1),
    }


def run_synthetic_scaling(n_edges: int = 200_000_000) -> dict:
    """Solve-throughput N-vs-4N evidence on a graph large enough that
    per-iteration compute dominates the round latency."""
    gdir = tempfile.mkdtemp(prefix="rayrank_synth_")

    def sub(args, ncpu):
        _quiesce()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    gen = sub(["--synth-gen", gdir, str(n_edges)], 32)
    lo = sub(["--solve-fixed", gdir], 8)
    hi = sub(["--solve-fixed", gdir], 32)
    eff = (hi["edges_per_sec_per_iter"] / lo["edges_per_sec_per_iter"]) / 4
    return {
        "mode": "synthetic_solve_scaling",
        "gen": gen,
        "solve_lo": lo,
        "solve_hi": hi,
        "scaling_efficiency_solve": round(eff, 3),
    }


def run_cores_sweep(n_edges: int = 200_000_000) -> dict:
    """Fixed memory traffic, 4/8/16/32 cores: if edges/s/iter flattens
    while cores double, the solve is DRAM-bandwidth-bound on this box
    (the honest single-node reading of the N-vs-4N criterion — real
    node scaling adds memory channels, which this sandbox cannot)."""
    gdir = tempfile.mkdtemp(prefix="rayrank_sweep_")

    def sub(args, ncpu):
        _quiesce()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    gen = sub(["--synth-gen", gdir, str(n_edges)], 32)
    points = {c: sub(["--solve-fixed", gdir], c) for c in (4, 8, 16, 32)}
    return {
        "mode": "cores_sweep",
        "gen": gen,
        "points": {
            str(c): {
                "edges_per_sec_per_iter": p["edges_per_sec_per_iter"],
                "sec_for_iters": p["sec_for_iters"],
            }
            for c, p in points.items()
        },
        "flatness_8_to_32": round(
            points[32]["edges_per_sec_per_iter"]
            / points[8]["edges_per_sec_per_iter"],
            3,
        ),
    }


def ingest_once() -> dict:
    """Edge derivation only (regex parse + resolution join + co-commit
    pairs) — the pipeline's CPU-bound stage."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = _sf_of(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.corpus import default_corpus_dir, generate_corpus
    from rayrank.ingest import derive_edges, read_corpus

    configure_data_context()
    cdir = generate_corpus(default_corpus_dir(sf), sf=sf)
    import pyarrow.parquet as pq

    pq.read_table(cdir, columns=["repo"])  # warm page cache
    t0 = time.perf_counter()
    n = derive_edges(read_corpus(cdir), num_partitions=64).count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "sf": sf, "edges": n,
            "ingest_sec": round(dt, 3),
            "edges_per_sec": round(n / dt, 1)}


def run_ingest_scaling() -> dict:
    def sub(ncpu):
        _quiesce()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--ingest-once"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = sub(8)
    hi = sub(32)
    eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / 4
    return {
        "mode": "ingest_scaling",
        "ingest_lo": lo,
        "ingest_hi": hi,
        "scaling_efficiency_ingest": round(eff, 3),
    }


_INVINDEX_REP = int(os.environ.get("INVINDEX_REP", "64"))
_INVINDEX_CORPUS = f"/tmp/rayrank_invindex_corpus_v2_{_INVINDEX_REP}"


def _invindex_corpus_dir() -> str:
    """Deterministic synthetic text corpus for the text-pipeline
    scaling runs: the testdata corpus has only 31 distinct tokens,
    which caps term-keyed reduces at 31-way parallelism; the
    per-replica namespace gives 31×REP terms with the same per-doc
    token counts (see _write_tiled_corpus)."""
    return _write_tiled_corpus(_INVINDEX_CORPUS, _INVINDEX_REP, None)


_SF1_DIR = "/tmp/rayrank_sf1"


def _sf1_dir() -> str:
    """SF≈1 relational fixture: sf0.1's customer/orders/lineitem/
    supplier tiled 10× with disjoint key offsets (join keys offset
    consistently per replica so every FK still resolves); nation and
    region are dimensions and stay as-is.  The r2 open item: SF=0.1
    timings for the wide relational queries are ~50 % fixed overhead —
    profile at SF≥1 before tuning."""
    import pyarrow.parquet as _pq

    done = os.path.join(_SF1_DIR, "_DONE")
    if os.path.exists(done):
        return _SF1_DIR
    os.makedirs(_SF1_DIR, exist_ok=True)
    src = "/root/testdata/sf0.1"
    import pyarrow as _pa
    import pyarrow.compute as _pc

    REP = 10
    OK, SK, CK = 10_000_000, 1_000_000, 1_000_000  # key strides
    offsets = {
        "l_orderkey": OK, "o_orderkey": OK,
        "l_suppkey": SK, "s_suppkey": SK,
        "o_custkey": CK, "c_custkey": CK,
    }
    for table in ("customer", "orders", "lineitem", "supplier"):
        base = _pq.read_table(f"{src}/{table}.parquet")
        # one FILE per replica ({table}.parquet is a directory):
        # ray.data.read_parquet parallelizes at file granularity, and a
        # single 6M-row file serializes the read into one task (the
        # first sf1 profile measured a 15 s single-task read)
        tdir = f"{_SF1_DIR}/{table}.parquet"
        os.makedirs(tdir, exist_ok=True)
        for r in range(REP):
            t = base
            for col, stride in offsets.items():
                if col in t.schema.names:
                    t = t.set_column(
                        t.schema.get_field_index(col), col,
                        _pc.add(t.column(col), r * stride),
                    )
            _pq.write_table(t, f"{tdir}/part-{r:03d}.parquet")
    for table in ("nation", "region", "part", "events", "documents",
                  "embeddings"):
        srcf = f"{src}/{table}.parquet"
        if os.path.exists(srcf):
            _pq.write_table(_pq.read_table(srcf),
                            f"{_SF1_DIR}/{table}.parquet")
    with open(done, "w") as f:
        f.write("ok")
    return _SF1_DIR


def sf1_profile() -> dict:
    """market_share + big_orders at the tiled SF≈1 (r2 VERDICT #7):
    wall time per query plus the per-operator ds.stats() breakdown
    (written to /tmp/rayrank_sf1_stats.txt)."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.analytics import big_orders
    from rayrank.reports import market_share

    configure_data_context()
    d = _sf1_dir()
    out = {"num_cpus": ncpu, "dir": d}
    with open("/tmp/rayrank_sf1_stats.txt", "w") as fh:
        for name, fn in (("market_share", market_share),
                         ("big_orders", big_orders)):
            t0 = time.perf_counter()
            ds = fn(d).materialize()
            out[f"{name}_sec"] = round(time.perf_counter() - t0, 3)
            out[f"{name}_rows"] = ds.count()
            fh.write(f"===== {name} =====\n{ds.stats()}\n")
    ray.shutdown()
    return out


def minhash_once() -> dict:
    """MinHash SIGNATURE-stage throughput over the tiled corpus — the
    r3 vectorized batched kernel vs (MINHASH_PER_ROW=1) a mirror of
    the r2 per-row path (list comprehension over
    ``MinHasher.signature``, the retained reference kernel), measured
    as the same actor-pool map_batches stage.  Evidence for the r2
    VERDICT #2 done-criterion."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    per_row = os.environ.get("MINHASH_PER_ROW", "") == "1"
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.text import MinHasher, minhash_signatures

    configure_data_context()
    cdir = _invindex_corpus_dir()
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    n_docs = _pq.read_table(cdir, columns=["doc_id"]).num_rows  # warm cache
    docs = ray.data.read_parquet(cdir)

    class PerRowHasher(MinHasher):
        """The r2 per-row __call__, kept runnable for the comparison."""

        def __call__(self, batch):
            texts = batch.column("text").to_pylist()
            sigs = (
                _np.stack([self.signature(t) for t in texts])
                if texts else _np.zeros((0, self.num_perm), _np.uint64)
            )
            col = _pa.FixedSizeListArray.from_arrays(
                _pa.array(sigs.astype(_np.int64).ravel(), _pa.int64()),
                self.num_perm,
            )
            return _pa.table({"doc_id": batch.column("doc_id"), "sig": col})

    t0 = time.perf_counter()
    if per_row:
        n = docs.select_columns(["doc_id", "text"]).map_batches(
            PerRowHasher, batch_format="pyarrow", concurrency=(1, max(2, ncpu // 2))
        ).count()
    else:
        n = minhash_signatures(
            docs, concurrency=(1, max(2, ncpu // 2))
        ).count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "docs": n_docs, "sigs": n,
            "per_row": per_row, "minhash_sec": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 1)}


def textstage_once() -> dict:
    """Text-analysis stage throughput (the doc_quality feature block)
    over the tiled 1.28M-doc corpus.  Default = the r5 FUSED single
    actor stage (rayrank.text.TextFeatures — the corpus crosses the
    object store once); TEXTSTAGE_FUSED=0 = the r4 three-stage chain
    (TokenCounter → QualityScorer → LangId, 3 plasma crossings);
    TEXTSTAGE_PER_ROW=1 = mirrors of the r3 per-word loops built from
    the retained row-reference kernels.  All three produce
    bit-identical rows (tests/test_text_kernel_parity.py,
    tests/test_textfeatures_fused.py)."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    per_row = os.environ.get("TEXTSTAGE_PER_ROW", "") == "1"
    fused = os.environ.get("TEXTSTAGE_FUSED", "1") == "1" and not per_row
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.text import (LangId, QualityScorer, TextFeatures,
                              TokenCounter, langid_row_reference,
                              quality_row_reference,
                              token_counts_row_reference)

    configure_data_context()
    cdir = _invindex_corpus_dir()
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    n_docs = _pq.read_table(cdir, columns=["doc_id"]).num_rows  # warm cache
    docs = ray.data.read_parquet(cdir).select_columns(["doc_id", "text"])
    conc = (1, max(2, ncpu // 2))

    class PerRowStage:
        """All three per-row reference kernels per doc, one pass."""

        def __call__(self, batch):
            texts = batch.column("text").to_pylist()
            rows = [
                token_counts_row_reference(t)
                + langid_row_reference(t)
                + quality_row_reference(t)
                for t in texts
            ]
            cols = list(zip(*rows)) if rows else [[]] * 9
            return _pa.table({
                "doc_id": batch.column("doc_id"),
                "ws_tokens": _pa.array(cols[0], _pa.int64()),
                "re_tokens": _pa.array(cols[1], _pa.int64()),
                "lang_pred": _pa.array(cols[2], _pa.string()),
                "lang_score": _pa.array(cols[3], _pa.float64()),
                "n_chars_q": _pa.array(cols[4], _pa.int64()),
                "punct_ratio": _pa.array(cols[5], _pa.float64()),
                "stopword_ratio": _pa.array(cols[6], _pa.float64()),
                "digit_ratio": _pa.array(cols[7], _pa.float64()),
                "mean_word_len": _pa.array(cols[8], _pa.float64()),
            })

    t0 = time.perf_counter()
    if per_row:
        n = docs.map_batches(
            PerRowStage, batch_format="pyarrow", concurrency=conc
        ).count()
    elif fused:
        # the fused stage IS the whole pipeline — give it the full
        # session width (the per-stage ncpu//2 cap assumed 3 pools)
        n = docs.map_batches(
            TextFeatures, batch_format="pyarrow",
            concurrency=(1, max(2, ncpu)),
        ).count()
    else:
        n = (
            docs.map_batches(TokenCounter, batch_format="pyarrow",
                             concurrency=conc)
            .map_batches(QualityScorer, batch_format="pyarrow",
                         concurrency=conc)
            .map_batches(LangId, batch_format="pyarrow", concurrency=conc)
            .count()
        )
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "docs": n_docs, "rows": n,
            "per_row": per_row, "fused": fused,
            "textstage_sec": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 1)}


def spandedup_once() -> dict:
    """Span-level dedup coverage (terms.span_dedup_stats) over the
    tiled corpus — two corpus scans, a gram-keyed df reduce, a
    position-stream semi join and a doc-keyed island kernel: the
    heaviest multi-shuffle text stage, measured end to end."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import tempfile

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.terms import span_dedup_stats

    configure_data_context()
    cdir = _invindex_corpus_dir()
    import pyarrow.parquet as pq

    pq.read_table(cdir, columns=["doc_id"])  # warm page cache
    tmp = tempfile.mkdtemp(prefix="rayrank_span_")
    os.symlink(cdir, os.path.join(tmp, "documents.parquet"))
    t0 = time.perf_counter()
    n = span_dedup_stats(tmp).count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "docs": n, "spandedup_sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 1)}


def run_spandedup_scaling(repeats: int = 2) -> dict:
    def sub(ncpu):
        best = None
        for _ in range(repeats):
            _quiesce()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--spandedup-once"],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["spandedup_sec"] < best["spandedup_sec"]:
                best = r
        return best

    lo = sub(8)
    hi = sub(32)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    return {
        "mode": "spandedup_scaling",
        "spandedup_lo": lo,
        "spandedup_hi": hi,
        "scaling_efficiency_spandedup": round(eff, 3),
    }


_JACC_REP = int(os.environ.get("JACC_REP", "16"))
_JACC_CORPUS = f"/tmp/rayrank_jacc_corpus_{_JACC_REP}"


def _write_tiled_corpus(out_root: str, rep: int, part_dir: str | None) -> str:
    """Shared tiled-corpus generator (invindex + jaccard scaling runs):
    the sf0.1 documents table replicated ``rep`` times with doc_id
    offsets and per-replica token namespaces (one vectorized RE2
    rewrite per replica — replicas share structure but not keys).
    ``part_dir`` = None writes flat part files (invindex layout);
    a name writes ``{root}/{part_dir}/part-*.parquet`` so ops taking
    an sf_dir read it unchanged (jaccard layout)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    done = os.path.join(out_root, "_DONE")
    if os.path.exists(done):
        return out_root
    ddir = os.path.join(out_root, part_dir) if part_dir else out_root
    os.makedirs(ddir, exist_ok=True)
    base = pq.read_table(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    )
    n = base.num_rows
    for r in range(rep):
        txt = pc.replace_substring_regex(
            base.column("text"), pattern=r"(\S+)", replacement=f"\\1_r{r:03d}"
        )
        t = pa.table(
            {"doc_id": pc.add(base.column("doc_id"), r * n), "text": txt}
        )
        pq.write_table(t, os.path.join(ddir, f"part-{r:03d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out_root


def _jacc_corpus_dir() -> str:
    """Tiled corpus for the similarity-join scaling run — near-dup
    structure repeats per replica while shingle postings stay
    namespace-local, so the prefix-filter join's work scales linearly
    with replicas."""
    return _write_tiled_corpus(_JACC_CORPUS, _JACC_REP, "documents.parquet")


def jaccard_once() -> dict:
    """Prefix-filtered exact similarity self-join
    (text.jaccard_join_pairs) over the tiled corpus — block-local
    prefix selection, ONE shingle-keyed repartition, candidate dedup,
    verify joins."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.text import jaccard_join_pairs

    configure_data_context()
    cdir = _jacc_corpus_dir()
    import pyarrow.parquet as pq

    n_docs = pq.read_table(
        os.path.join(cdir, "documents.parquet"), columns=["doc_id"]
    ).num_rows  # warm page cache + count
    t0 = time.perf_counter()
    n_pairs = jaccard_join_pairs(cdir).count()
    dt = time.perf_counter() - t0
    # driver-side phase marks recorded by jaccard_join_pairs at its
    # materialize boundaries (blobs / candidates / return); the verify
    # phase is everything after the function returned its lazy dataset
    import rayrank.text as _tx

    marks = dict(getattr(_tx, "PHASE_TIMES", []) or [])
    phases = {}
    if {"start", "blobs", "candidates", "return"} <= set(marks):
        phases = {
            "blobs_sec": round(marks["blobs"] - marks["start"], 3),
            "candidates_sec": round(
                marks["candidates"] - marks["blobs"], 3
            ),
            "verify_sec": round(
                dt - (marks["return"] - marks["start"]), 3
            ),
        }
    ray.shutdown()
    return {"num_cpus": ncpu, "docs": n_docs, "pairs": n_pairs,
            "jaccard_sec": round(dt, 3), **phases,
            "docs_per_sec": round(n_docs / dt, 1)}


def run_jaccard_scaling(repeats: int = 2) -> dict:
    def sub(ncpu):
        best = None
        for _ in range(repeats):  # noisy host: best-of-N
            _quiesce()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--jaccard-once"],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["jaccard_sec"] < best["jaccard_sec"]:
                best = r
        return best

    lo = sub(8)
    hi = sub(32)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    return {
        "mode": "jaccard_scaling",
        "jaccard_lo": lo,
        "jaccard_hi": hi,
        "scaling_efficiency_jaccard": round(eff, 3),
    }


def invindex_once() -> dict:
    """Inverted-index build over the tiled corpus — tokenize (regex
    split) + block dedup + ONE keyed shuffle + block-local build; the
    CPU-bound text-pipeline stage."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.terms import inverted_index_ds

    configure_data_context()
    cdir = _invindex_corpus_dir()
    import pyarrow.parquet as pq

    pq.read_table(cdir, columns=["doc_id"])  # warm page cache
    docs = ray.data.read_parquet(cdir)
    n_docs = docs.count()
    t0 = time.perf_counter()
    # session-scaled partitions/aggregators (dyn_partitions + the
    # ncpu aggregator cap) — the round-2 pinned 32 spun 32 aggregator
    # actors on the 8-CPU leg, the cause of the >1.0 scaling anomaly
    n = inverted_index_ds(docs).count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "docs": n_docs, "vocab_rows": n,
            "invindex_sec": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 1)}


def run_invindex_scaling(repeats: int = 2) -> dict:
    def sub(ncpu):
        best = None
        for _ in range(repeats):  # noisy host: best-of-N
            _quiesce()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--invindex-once"],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["invindex_sec"] < best["invindex_sec"]:
                best = r
        return best

    lo = sub(8)
    hi = sub(32)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    return {
        "mode": "invindex_scaling",
        "invindex_lo": lo,
        "invindex_hi": hi,
        "scaling_efficiency_invindex": round(eff, 3),
    }


def packing_once() -> dict:
    """Sequence packing (concat-and-chunk prefix sum) over the tiled
    corpus — scan/tokenize (CPU-bound) + one tiny bucket re-agg + one
    bucket-keyed int64 repartition."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.packing import pack_sequences_ds

    configure_data_context()
    cdir = _invindex_corpus_dir()
    import pyarrow.parquet as pq

    pq.read_table(cdir, columns=["doc_id"])  # warm page cache
    docs = ray.data.read_parquet(cdir)
    n_docs = docs.count()
    t0 = time.perf_counter()
    n = pack_sequences_ds(docs).count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "docs": n_docs, "packed_rows": n,
            "packing_sec": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 1)}


def run_packing_scaling(repeats: int = 2) -> dict:
    def sub(ncpu):
        best = None
        for _ in range(repeats):  # noisy host: best-of-N
            _quiesce()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--packing-once"],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["packing_sec"] < best["packing_sec"]:
                best = r
        return best

    lo = sub(8)
    hi = sub(32)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    return {
        "mode": "packing_scaling",
        "packing_lo": lo,
        "packing_hi": hi,
        "scaling_efficiency_packing": round(eff, 3),
    }


def delta_refresh() -> dict:
    """Incremental-update evidence: build the SF graph, converge cold,
    perturb ~1% of edges (deterministic hash-picked reversals — new
    links between existing vertices), rebuild, then solve the new graph
    cold vs warm-started from the old converged scores
    (pagerank.warm_start_parts).  Reports iterations and wall time for
    both paths; the warm path must reach the same fixpoint in far
    fewer iterations — the delta-refresh story at 100-TB scale, where
    re-converging from uniform after a small crawl delta wastes the
    cluster."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = _sf_of(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.corpus import default_corpus_dir, generate_corpus
    from rayrank.graph import build_graph
    from rayrank.ingest import derive_edges, read_corpus
    from rayrank.pagerank import power_method, warm_start_parts

    configure_data_context()
    cdir = generate_corpus(default_corpus_dir(sf), sf=sf)
    edges = derive_edges(read_corpus(cdir), num_partitions=32).materialize()
    n_edges = edges.count()
    Q = min(32, max(4, n_edges // 50_000))

    g1 = tempfile.mkdtemp(prefix="rayrank_delta_old_")
    build_graph(edges, g1, num_partitions=Q, join_partitions=32)
    t0 = time.perf_counter()
    res_old = power_method(g1, epsilon=1e-6)
    cold_old_sec = time.perf_counter() - t0

    def flips(t: pa.Table):
        if t.num_rows == 0 or "src_name" not in t.schema.names:
            return
        # deterministic ~1% pick: stable per-row content hash
        import zlib

        src = t.column("src_name").to_pylist()
        dst = t.column("dst_name").to_pylist()
        keep = [
            i for i, (a, b) in enumerate(zip(src, dst))
            if zlib.crc32(f"{a}\x00{b}".encode()) % 100 == 0
        ]
        if not keep:
            return
        yield pa.table(
            {
                "src_name": pa.array([dst[i] for i in keep], pa.string()),
                "dst_name": pa.array([src[i] for i in keep], pa.string()),
            }
        )

    extra = edges.map_batches(flips, batch_format="pyarrow")
    new_edges = edges.union(extra).materialize()
    n_extra = new_edges.count() - n_edges

    g2 = tempfile.mkdtemp(prefix="rayrank_delta_new_")
    build_graph(new_edges, g2, num_partitions=Q, join_partitions=32)
    t0 = time.perf_counter()
    res_cold = power_method(g2, epsilon=1e-6)
    cold_sec = time.perf_counter() - t0
    x0 = warm_start_parts(g1, res_old, g2)
    t0 = time.perf_counter()
    res_warm = power_method(g2, epsilon=1e-6, x0_parts=x0)
    warm_sec = time.perf_counter() - t0

    # same fixpoint check (max |Δ| over partitions)
    import ray as _r

    max_diff = max(
        float(np.abs(np.asarray(_r.get(a)) - np.asarray(_r.get(b))).max())
        for a, b in zip(res_cold.part_refs, res_warm.part_refs)
    )
    ray.shutdown()
    return {
        "mode": "delta_refresh",
        "sf": sf,
        "num_cpus": ncpu,
        "edges": n_edges,
        "delta_edges": n_extra,
        "iters_cold": res_cold.iterations,
        "iters_warm": res_warm.iterations,
        "solve_sec_cold": round(cold_sec, 3),
        "solve_sec_warm": round(warm_sec, 3),
        "solve_sec_cold_old_graph": round(cold_old_sec, 3),
        "max_abs_score_diff": max_diff,
        "iteration_savings": round(
            1 - res_warm.iterations / max(1, res_cold.iterations), 3
        ),
    }


def stage_stats(name: str) -> None:
    """Profiling loop the tuning workflow uses: run ONE queries() entry
    at $GRAFT_SF_DIR and print Ray Data's per-operator execution stats
    (ds.stats(): wall time, blocks, rows, memory per stage) — the
    evidence for where a pipeline's time actually goes before touching
    batch sizes or partition counts."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from rayrank import configure_data_context

    configure_data_context()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry

    t0 = time.perf_counter()
    res = entry.queries()[name](sf_dir)
    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        print(res.stats())
    else:
        print(f"(non-Dataset result: {type(res).__name__} — no stats)")
    print(f"total wall: {time.perf_counter() - t0:.3f} s")
    ray.shutdown()


if __name__ == "__main__":
    if "--delta-refresh" in sys.argv:
        print(json.dumps(delta_refresh()))
        sys.exit(0)
    if "--ingest-once" in sys.argv:
        print(json.dumps(ingest_once()))
        sys.exit(0)
    if "--ingest-scaling" in sys.argv:
        print(json.dumps(run_ingest_scaling()))
        sys.exit(0)
    if "--packing-once" in sys.argv:
        print(json.dumps(packing_once()))
        sys.exit(0)
    if "--packing-scaling" in sys.argv:
        print(json.dumps(run_packing_scaling()))
        sys.exit(0)
    if "--sf1-profile" in sys.argv:
        print(json.dumps(sf1_profile()))
        sys.exit(0)
    if "--minhash-once" in sys.argv:
        print(json.dumps(minhash_once()))
        sys.exit(0)
    if "--spandedup-once" in sys.argv:
        print(json.dumps(spandedup_once()))
        sys.exit(0)
    if "--spandedup-scaling" in sys.argv:
        print(json.dumps(run_spandedup_scaling()))
        sys.exit(0)
    if "--stats" in sys.argv:
        stage_stats(sys.argv[sys.argv.index("--stats") + 1])
        sys.exit(0)
    if "--textstage-once" in sys.argv:
        print(json.dumps(textstage_once()))
        sys.exit(0)
    if "--jaccard-once" in sys.argv:
        print(json.dumps(jaccard_once()))
        sys.exit(0)
    if "--jaccard-scaling" in sys.argv:
        print(json.dumps(run_jaccard_scaling()))
        sys.exit(0)
    if "--invindex-once" in sys.argv:
        print(json.dumps(invindex_once()))
        sys.exit(0)
    if "--invindex-scaling" in sys.argv:
        print(json.dumps(run_invindex_scaling()))
        sys.exit(0)
    if "--synth-gen" in sys.argv:
        i = sys.argv.index("--synth-gen")
        gdir, n_edges = sys.argv[i + 1], int(sys.argv[i + 2])
        import ray

        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
        t0 = time.perf_counter()
        synth_partitioned_graph(gdir, n_vertices=max(1_000_000, n_edges // 10),
                                n_edges=n_edges)
        ray.shutdown()
        print(json.dumps({"graph_dir": gdir, "n_edges": n_edges,
                          "gen_sec": round(time.perf_counter() - t0, 3)}))
        sys.exit(0)
    if "--solve-fixed" in sys.argv:
        print(json.dumps(
            solve_fixed_iters(sys.argv[sys.argv.index("--solve-fixed") + 1])
        ))
        sys.exit(0)
    if "--cores-sweep" in sys.argv:
        i = sys.argv.index("--cores-sweep")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 and sys.argv[
            i + 1].isdigit() else 200_000_000
        print(json.dumps(run_cores_sweep(n)))
        sys.exit(0)
    if "--synthetic-scaling" in sys.argv:
        i = sys.argv.index("--synthetic-scaling")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 and sys.argv[
            i + 1].isdigit() else 200_000_000
        print(json.dumps(run_synthetic_scaling(n)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--solve-scaling" in sys.argv:
        print(json.dumps(run_solve_scaling()))
    elif "--build-only" in sys.argv:
        print(json.dumps(build_only(sys.argv[sys.argv.index("--build-only") + 1])))
    elif "--solve" in sys.argv:
        print(json.dumps(solve_only(sys.argv[sys.argv.index("--solve") + 1])))
    else:
        print(json.dumps(run_bench()))
