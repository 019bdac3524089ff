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
