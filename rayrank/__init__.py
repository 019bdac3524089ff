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

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
