"""rayrank — a Ray-Data-native link-graph analytics engine.

Built from scratch as a generalization of the reference educational
PageRank project (see /root/reference/pagerank.py): damped PageRank with
dangling-mass redistribution, connected components, label propagation
and triangle counting over an edge table derived from a Parquet corpus
of source-code repositories `(repo, path, commit, lang, content)`.

Design commitments (SURVEY.md §1.2/§7):
  * every table is a ``ray.data.Dataset`` of Arrow blocks;
  * per-batch UDFs are vectorized (`batch_format="pyarrow"` / numpy);
  * stateful stages are actor pools / long-lived shard actors;
  * wide steps (groupby / join / sort) are explicit and keyed so one
    partitioning (hash(name) % Q → vid = rank*Q + q) is reused across
    ingest, iteration and checkpointing;
  * iterations checkpoint to Parquet with per-partition lineage and
    metrics, and runs resume from the latest complete manifest.
"""

__version__ = "0.1.0"

NUM_PARTITIONS_DEFAULT = 16


def dyn_partitions(width: int = 2, lo: int = 8, hi: int = 128) -> int:
    """Session-scaled hash-partition count for keyed wide steps:
    ``width × CPUs`` clamped to [lo, hi].

    Why (round-2 scaling postmortem): a partition count pinned at
    testdata scale (8/16) under-parallelizes the reduce side of a
    multi-shuffle chain on a big session — at 32 CPUs a 16-partition
    exchange leaves half the cores idle through every aggregation —
    while the SAME pinned count over-spawns aggregator actors on a
    small session.  Resolved at CALL time (never at import) so each
    ``ray.init`` session gets a count matched to its size; combined
    with the ``max_hash_shuffle_aggregators = ncpu`` cap set by
    :func:`configure_data_context`, every exchange runs
    ``min(partitions, ncpu)`` aggregator actors with a constant
    partitions-per-aggregator ratio across cluster sizes."""
    import os as _os

    import ray as _ray

    override = _os.environ.get("RAYRANK_PARTITIONS")
    if override:
        # measurement knob (r5): pin the partition count across legs of
        # a scaling run to attribute ratio gaps to the 16-vs-64
        # partition-shape difference vs genuine compute scaling.
        # Validated at the knob so a stale/typo'd export fails HERE
        # with a clear message, not deep inside a repartition
        try:
            n = int(override)
        except ValueError:
            raise ValueError(
                f"RAYRANK_PARTITIONS={override!r} is not an integer"
            ) from None
        if not 1 <= n <= 4096:
            raise ValueError(
                f"RAYRANK_PARTITIONS={n} outside [1, 4096]"
            )
        return n
    if _ray.is_initialized():
        ncpu = int(_ray.cluster_resources().get("CPU", _os.cpu_count() or 8))
    else:
        ncpu = _os.cpu_count() or 8
    return max(lo, min(hi, width * ncpu))

_POLARS_VERIFIED = None  # per-process cache: a verified-healthy polars module


def polars_mod():
    """Import polars, repairing torn module state.

    A Ray worker task can be cancelled (backpressure/limit) while
    ``import polars`` is executing; the partially-initialized module
    stays in ``sys.modules`` for the worker's LIFETIME and every later
    task in that worker then crashes with e.g. ``module 'polars' has no
    attribute 'Series'`` (observed in-sandbox).  Reloading completes
    the initialization.  Every worker-side polars use in this package
    goes through here.

    Thread cap: each Ray map task is scheduled at 1 CPU, but polars
    sizes its global rayon pool to ALL machine cores at import — 32
    concurrent tasks × 32 threads thrashes the box (measured: the whole
    bench slowed 2-4×).  Cap to 1 thread per worker BEFORE the first
    import (the env var is only read then).

    Tearing can hit any of polars' ~100 lazily-imported submodules, not
    just the top-level namespace (observed: ``polars._reexport`` missing
    ``DataFrame`` at SF=10 while ``polars`` itself looked whole), so the
    health check is a functional probe of the hashing path and the
    repair purges every ``polars*`` entry from ``sys.modules`` before a
    fresh import (``importlib.reload`` of the top module does not re-run
    torn submodules)."""
    import os
    import sys

    global _POLARS_VERIFIED
    if _POLARS_VERIFIED is not None:
        return _POLARS_VERIFIED

    if "polars" not in sys.modules:
        os.environ.setdefault("POLARS_MAX_THREADS", "1")

    import polars as _pl

    def _healthy(pl) -> bool:
        try:
            pl.DataFrame({"a": ["x"]}).select(pl.col("a").hash(0))
            return True
        except Exception:
            return False

    if not _healthy(_pl):
        for name in [n for n in sys.modules if n.split(".")[0] == "polars"]:
            del sys.modules[name]
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as _pl  # noqa: F811 — fresh, fully-initialized import
        if not _healthy(_pl):
            raise ImportError(
                "polars module state is torn in this worker and a fresh "
                "re-import did not repair it"
            )
    _POLARS_VERIFIED = _pl
    return _pl


def configure_data_context() -> None:
    """Tune Ray Data execution for this engine (idempotent; call after
    or before ray.init — the context is process-global).

    Hash-shuffle aggregators are ACTORS that reserve CPUs for the whole
    execution; a pipeline chaining several shuffles + map actor pools
    can deadlock on a small cluster when the reservations exceed the
    CPU count (observed at num_cpus=4 with 2 pools + 3 shuffles).
    Dropping the per-partition CPU reservation to a nominal value lets
    the OS time-slice instead — correct for our small-partition,
    CPU-bursty aggregations at any cluster size."""
    from ray.data import DataContext

    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # default is a SORT-based shuffle — every groupby/map_groups pays an
    # O(n log n) range sort; this engine's wide steps are all hash-keyed,
    # so use the hash-shuffle implementation (also required for
    # repartition(keys=...))
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    # Ray's default is 200 shuffle partitions — every un-parameterized
    # groupby spawns that much aggregator work, which at test scale is
    # pure actor-spawn overhead (measured: ~50 s per join on 20k rows).
    # Size it to the session's CPUs; wide steps that need more pass
    # num_partitions explicitly.
    import os as _os

    import ray as _ray

    if _ray.is_initialized():
        ncpu = int(_ray.cluster_resources().get("CPU", _os.cpu_count() or 8))
    else:
        ncpu = _os.cpu_count() or 8
    ctx.default_hash_shuffle_parallelism = max(4, min(64, ncpu))
    # Scale the aggregator ACTOR pool with the session, not the
    # partition count: Ray spins min(num_partitions, this cap) actors
    # per exchange.  The round-2 default (64) meant a fixed-size spin-up
    # per exchange regardless of session CPUs — taxing small sessions
    # with more actors than cores (the >1.0 invindex scaling anomaly)
    # while adding nothing on large ones.  With the cap at ncpu, an
    # exchange whose partition count comes from dyn_partitions() keeps
    # a constant partitions-per-aggregator ratio at every session size.
    ctx.max_hash_shuffle_aggregators = max(4, ncpu)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
