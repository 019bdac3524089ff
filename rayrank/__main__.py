"""Reference-parity CLI (pagerank.py:261-285 flag-for-flag).

    python -m rayrank --data Data/small.csv.gz [--filter_ratio 0.2]
        [--personalization_vector_query covid] [--search_query corona]
        [--alpha 0.85] [--max_iterations 1000] [--epsilon 1e-6]
        [--max_results 10] [--power 30] [--sum_weight 0.03] [--verbose]

Prints the reference's report lines (``rank=i pagerank=... url=...``).
Differences from the reference are the documented defect fixes
(SURVEY.md §3.4): no crash on empty/OOV queries, no global-variable
coupling, no sorted-input assumption.  GloVe expansion needs gensim
(absent here) — pass ``--embedding gensim`` to opt in, default is no
expansion.
"""

from __future__ import annotations

import argparse
import logging
import sys
import tempfile


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="rayrank")
    parser.add_argument("--data", required=True)
    parser.add_argument("--personalization_vector_query", default="")
    parser.add_argument("--search_query", default="")
    parser.add_argument("--filter_ratio", type=float, default=None)
    parser.add_argument("--alpha", type=float, default=0.85)
    parser.add_argument("--max_iterations", type=int, default=1000)
    parser.add_argument("--epsilon", type=float, default=1e-6)
    parser.add_argument("--max_results", type=int, default=10)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--power", type=int, default=30)
    parser.add_argument("--sum_weight", type=float, default=0.03)
    parser.add_argument("--max_nnz", type=int, default=None)
    parser.add_argument("--num_partitions", type=int, default=8)
    parser.add_argument(
        "--embedding", choices=["none", "gensim"], default="none",
        help="query-expansion model (gensim requires network/model files)",
    )
    parser.add_argument("--graph_dir", default=None,
                        help="reuse/persist the built graph layout")
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--scores_out", default=None,
                        help="write the full score vector as a resumable "
                        "partitioned parquet directory (part=NNNN/_SUCCESS "
                        "markers; a rerun skips finished partitions)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO,
                        format="%(message)s")
    log = logging.getLogger("rayrank")

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from rayrank import configure_data_context
    from rayrank.pagerank import power_method
    from rayrank.search import (
        NullEmbedding,
        gensim_embedding,
        personalization_vector,
        top_k,
    )
    from rayrank.webgraph import build_webgraph

    configure_data_context()
    model = gensim_embedding() if args.embedding == "gensim" else NullEmbedding()

    gdir = args.graph_dir or tempfile.mkdtemp(prefix="rayrank_cli_")
    meta = build_webgraph(
        args.data,
        gdir,
        num_partitions=args.num_partitions,
        filter_ratio=args.filter_ratio,
        max_nnz=args.max_nnz,
    )
    log.debug("graph: n=%d nnz=%d Q=%d", meta.n, meta.nnz, meta.Q)

    v_parts = None
    if args.personalization_vector_query:
        v_parts = personalization_vector(
            gdir, args.personalization_vector_query, model
        )

    res = power_method(
        gdir,
        alpha=args.alpha,
        epsilon=args.epsilon,
        max_iterations=args.max_iterations,
        v_parts=v_parts,
        ckpt_dir=args.ckpt_dir,
    )
    for h in res.history:
        log.debug(
            "i=%d residual=%s", h["iteration"], h["residual_l2_prev_update"]
        )

    scores = res.scores_dataset(gdir)
    if args.scores_out:
        from rayrank.sinks import resumable_write, with_part

        manifest = resumable_write(
            with_part(scores, "name", num_parts=args.num_partitions),
            args.scores_out, num_parts=args.num_partitions,
        )
        log.info(
            "scores_out: %d rows written, %d partitions skipped",
            manifest["rows_written"], len(manifest["skipped"]),
        )
    report = top_k(
        scores,
        query=args.search_query,
        model=model,
        k=args.max_results,
        sum_weight=args.sum_weight,
        power=args.power,
    )
    for i, row in enumerate(report.take_all()):
        # str(float) like the reference's 'pagerank='+str(pagerank)
        # (pagerank.py:186) — byte-identical report lines
        log.info("rank=%d pagerank=%s url=%s", i, str(row["fused"]), row["name"])
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
