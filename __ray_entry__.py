"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship corpus pipeline (synthetic code corpus →
sha256 ingest → import/co-commit edge derivation → partitioned graph →
reference-exact PageRank → top-k).  ``queries()`` exposes one callable
per implemented operator/pipeline from SURVEY.md §2 over the testdata
tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one (column names match exactly; float columns that
depend on distributed reduce order are rounded identically on both
sides).  Iterative/heuristic ops are rows-only here and verified against
numpy/networkx oracles by ``python -m pytest -x -q``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on the SF=0.001 synthetic corpus."""
    from rayrank.pipelines import corpus_flagship

    return corpus_flagship(sf=0.001, top_k=20)


def _terms():
    from rayrank import terms

    return terms


def _pl():
    from rayrank import pipelines

    return pipelines


def _an():
    from rayrank import analytics

    return analytics


def _dec():
    from rayrank import decision

    return decision


def _rep():
    from rayrank import reports

    return reports


def _tx():
    from rayrank import text

    return text


def _sk():
    from rayrank import sketch

    return sketch


def _qt():
    from rayrank import quantiles

    return quantiles


def _truss():
    from rayrank import truss

    return truss


def _salsa():
    from rayrank import hits

    return hits


def _mst_sql_wired() -> str:
    from rayrank.mst import boruvka_sql

    return boruvka_sql()


def _mm():
    from rayrank import multimodal

    return multimodal


def queries() -> dict[str, Callable[[str], Any]]:
    from rayrank import pipelines as pl
    from rayrank import relational as rel

    return {
        # TPC-H-shaped relational pipelines (fixed-point exact aggregates)
        "pricing_summary": rel.pricing_summary,
        "top_revenue_orders": rel.top_revenue_orders,
        "nation_revenue": rel.nation_revenue,
        "user_sessions": rel.user_sessions,
        "user_streaks": rel.user_streaks,
        "user_distinct_event_types": rel.user_distinct_event_types,
        "top_orders_per_customer": rel.top_orders_per_customer,
        "user_event_pivot": rel.user_event_pivot,
        "user_event_unpivot": rel.user_event_unpivot,
        "user_event_entropy": rel.user_event_entropy,
        "media_decode_features": _mm().media_decode_features,
        "media_frame_sizes": _mm().media_frame_sizes,
        "media_tile_fingerprints": _mm().media_tile_fingerprints,
        "table_profile": rel.table_profile,
        "benford_order_totals": rel.benford_order_totals,
        "hopping_distinct_users": pl.hopping_distinct_users,
        "part_pair_lift": _dec().part_pair_lift,
        "funnel_conversions": rel.funnel_conversions,
        "three_step_funnel": rel.three_step_funnel,
        "conversion_lag_histogram": rel.conversion_lag_histogram,
        "order_count_distribution": _an().order_count_distribution,
        "big_orders": _an().big_orders,
        "inactive_customers": _an().inactive_customers,
        "avg_yearly": _an().avg_yearly,
        "mode_event_type": _an().mode_event_type,
        "user_running_totals": _an().user_running_totals,
        "user_cumulative_distinct": _an().user_cumulative_distinct,
        "event_type_trigrams": _an().event_type_trigrams,
        "user_time_weighted_value": _an().user_time_weighted_value,
        "directed_triads": _truss().directed_triads,
        "butterfly_count": _truss().butterfly_count,
        "ivm_event_revenue": _an().ivm_event_revenue,
        "revenue_autocorr": _an().revenue_autocorr,
        "revenue_theil_sen": _an().revenue_theil_sen,
        "holt_daily_revenue": _an().holt_daily_revenue,
        "k_anonymity_audit": _an().k_anonymity_audit,
        "cusum_daily_revenue": _an().cusum_daily_revenue,
        "weekday_seasonality": _an().weekday_seasonality,
        "ivm_join_revenue": _an().ivm_join_revenue,
        "revenue_max_drawdown": _an().revenue_max_drawdown,
        "scd2_user_state": _an().scd2_user_state,
        "user_event_sequence": _an().user_event_sequence,
        "missing_order_days": _an().missing_order_days,
        "user_state_at_day": _an().user_state_at_day,
        "mixture_temperature_budgets": _an().mixture_temperature_budgets,
        "weighted_join_sample": _an().weighted_join_sample,
        "zorder_layout": _an().zorder_layout,
        "tokenizer_fertility": pl.tokenizer_fertility,
        "vocab_oov_rate": _terms().vocab_oov_rate,
        "bm25_topk": _terms().bm25_topk,
        "zipf_slope": _terms().zipf_slope,
        "vocab_coverage_curve": _terms().vocab_coverage_curve,
        "holdout_contamination": _packmod().holdout_contamination,
        "component_quotient_edges": pl.component_quotient_edges,
        "global_transitivity": pl.global_transitivity,
        "bowtie_profile": pl.bowtie_profile,          # SQL-checked (back-head closure)
        "densest_subgraph": _truss().densest_subgraph,
        "node2vec_walks": pl.node2vec_walks,
        "lp_modularity": pl.lp_modularity,            # rows-only (LP vid space)
        "hyperanf_nf": pl.hyperanf_nf,                # rows-only (probabilistic)
        "bfs_tree_parents": pl.bfs_tree_parents,
        "concurrent_orders": _an().concurrent_orders,
        "entity_clusters": _tx().entity_clusters,
        "mst_edges": pl.mst_edges,
        "edge_churn": _truss().edge_churn,
        "transitivity_estimate": _truss().transitivity_estimate,
        "percolation_sweep": pl.percolation_sweep,
        "temporal_reachability": pl.temporal_reachability,
        "dag_longest_path": pl.dag_longest_path,
        "ego_network_edges": pl.ego_network_edges,
        "nation_year_rollup": _an().nation_year_rollup,
        "nation_year_cube": _an().nation_year_cube,
        "event_value_stats": _an().event_value_stats,
        "event_value_histogram": _an().event_value_histogram,
        "event_value_winsorized": _an().event_value_winsorized,
        "event_gap_quantiles": _an().event_gap_quantiles,
        "revenue_by_price_decile": _an().revenue_by_price_decile,
        "customers_all_expedited": _an().customers_all_expedited,
        "nation_monthly_mom": _an().nation_monthly_mom,
        "trending_parts": _an().trending_parts,
        "gini_order_revenue": _an().gini_order_revenue,
        "pareto_revenue_point": _an().pareto_revenue_point,
        "open_orders_over_time": _an().open_orders_over_time,
        "fk_violations": _an().fk_violations,
        "stratified_event_sample": _an().stratified_event_sample,
        "price_quantiles_cont": pl.price_quantiles_cont,
        "parts_in_both_years": _an().parts_in_both_years,
        "parts_churned": _an().parts_churned,
        "part_qty_snapshot_diff": _an().part_qty_snapshot_diff,
        "clustering_coeff": pl.clustering_coeff,
        "two_hop_neighbors": pl.two_hop_neighbors,
        "common_neighbors": pl.common_neighbors,
        "neighbor_sample_2hop": pl.neighbor_sample_2hop,
        "square_count": pl.square_count,
        "bipartite_conflict": pl.bipartite_conflict,
        "ppr_push": _push().ppr_push,
        "simrank2_topk": _simrank().simrank2_topk,
        "hierarchy_rollup": _an().hierarchy_rollup,
        "zonemap_prune_stats": _an().zonemap_prune_stats,
        "adamic_adar": pl.adamic_adar,
        "disparity_backbone": pl.disparity_backbone,
        "degree_discount_seeds": pl.degree_discount_seeds,
        "node_features": pl.node_features,
        "hll_ball_registers": pl.hll_ball_registers,
        "subgraph_sample_curve": pl.subgraph_sample_curve,
        "frequent_triples": pl.frequent_triples,
        "seeded_label_spread": pl.seeded_label_spread,
        "rendezvous_shards": pl.rendezvous_shards,
        "attack_robustness": pl.attack_robustness,
        "random_failure_robustness": pl.random_failure_robustness,
        "joint_degree_matrix": pl.joint_degree_matrix,
        "widest_path_from_seed": pl.widest_path_from_seed,
        "host_quotient_edges": pl.host_quotient_edges,
        "host_pagerank_2iter": pl.host_pagerank_2iter,
        "random_walks": pl.random_walks,
        "walk_visit_counts": pl.walk_visit_counts,
        "edge_support": _truss().edge_support,
        "temporal_wedges": _truss().temporal_wedges,
        "graph_coarsen": _truss().graph_coarsen,
        "edge_jaccard": _truss().edge_jaccard,
        "rich_club": _truss().rich_club,
        "knn_degree_curve": _truss().knn_degree_curve,
        "degree_centralization": _truss().degree_centralization,
        "k_truss_edges": _truss().k_truss,
        "maximal_matching": _truss().maximal_matching,
        "copurchase_truss": _truss().copurchase_truss,
        "clique_census": _truss().clique_census,
        "truss_numbers": _truss().truss_numbers,
        "event_value_quantiles": _an().event_value_quantiles,
        "event_value_mad": _an().event_value_mad,
        "user_last_event": _an().user_last_event,
        "part_skyline": _an().part_skyline,
        "event_value_ntile": _an().event_value_ntile,
        "daily_event_spine": _an().daily_event_spine,
        "retention_cohorts": _an().retention_cohorts,
        "users_per_type_kmv": pl.users_per_type_kmv,
        "weighted_event_sample": _an().weighted_event_sample,
        "daily_click_purchase_matrix": _an().daily_click_purchase_matrix,
        "promo_revenue": _dec().promo_revenue,
        "priority_counts": _dec().priority_counts,
        "supplier_part_stats": _dec().supplier_part_stats,
        "volume_shipping": _dec().volume_shipping,
        "top_returned_customers": _dec().top_returned_customers,
        "props_k_stats": _dec().props_k_stats,
        "part_pairs_topk": _dec().part_pairs_topk,
        "decayed_part_popularity": _dec().decayed_part_popularity,
        "value_hour_corr": _dec().value_hour_corr,
        "event_value_regression": _dec().event_value_regression,
        "user_value_moving_avg": _dec().user_value_moving_avg,
        "customer_order_ranks": _dec().customer_order_ranks,
        "degree_assortativity": _dec().degree_assortativity,
        "part_jaccard_topk": _dec().part_jaccard_topk,
        "adamic_adar_topk": _dec().adamic_adar_topk,
        "urgent_year_revenue": _dec().urgent_year_revenue,
        "product_type_profit": _dec().product_type_profit,
        "linestatus_priority_counts": _dec().linestatus_priority_counts,
        # TPC-H Q2/Q11/Q15/Q19/Q20 shapes (reports.py)
        "important_parts": _rep().important_parts,
        "top_suppliers": _rep().top_suppliers,
        "disjunctive_revenue": _rep().disjunctive_revenue,
        "cheapest_supplier_per_part": _rep().cheapest_supplier_per_part,
        "dominant_suppliers": _rep().dominant_suppliers,
        "market_share": _rep().market_share,
        "top_brand_by_nation": _rep().top_brand_by_nation,
        "nation_supplier_hhi": _rep().nation_supplier_hhi,
        "median_order_gap": _rep().median_order_gap,
        "forecast_revenue": _rep().forecast_revenue,
        "event_value_p90": _an().event_value_p90,
        "event_value_outliers": _an().event_value_outliers,
        "event_value_percent_rank": _an().event_value_percent_rank,
        "sole_supplier_orders": _rep().sole_supplier_orders,
        "weighted_median_price": _rep().weighted_median_price,
        # degrees / weights / dangling / prune (SURVEY §2.5, §2.2 M3, §2.4 J4)
        "out_degree": pl.out_degree,
        "in_degree": pl.in_degree,
        "edge_weights": pl.edge_weights,
        "degree_histogram": pl.degree_histogram,
        "edge_reciprocity": pl.edge_reciprocity,
        "distinct_vertex_count": pl.distinct_vertex_count,
        "dangling_vertices": pl.dangling_vertices,
        "hot_targets": pl.hot_targets,
        "filter_ratio_kept_edges": pl.filter_ratio_kept_edges,
        # sorts / filters (SURVEY §2.6, §2.2 M1/M4)
        "top_customers": pl.top_customers,
        "regex_filter_docs": pl.regex_filter_docs,
        "query_filter_docs": pl.query_filter_docs,
        # text / dedup / events / ann
        "docs_exact_dedup": pl.docs_exact_dedup,
        "docs_normalized_dedup": pl.docs_normalized_dedup,
        "docs_redact": pl.docs_redact,
        "fuzzy_name_pairs": _tx().fuzzy_name_pairs,
        "docs_hash_sample": pl.docs_hash_sample,
        "term_doc_freq": _terms().term_doc_freq,
        "tfidf_top_terms": _terms().tfidf_top_terms,
        "inverted_index": _terms().inverted_index,
        "price_band_pairs": rel.price_band_pairs,
        "top_bigrams": _terms().top_bigrams,
        "windowed_cooccurrence": _terms().windowed_cooccurrence,
        "keyword_contexts": _terms().keyword_contexts,
        "bigram_pmi": _terms().bigram_pmi,
        "doc_unigram_rarity": _terms().doc_unigram_rarity,
        "duplicate_ngram_fraction": _terms().duplicate_ngram_fraction,
        "span_dedup_stats": _terms().span_dedup_stats,
        "ngram_novelty": _terms().ngram_novelty,
        "bpe_merges": _terms().bpe_merges,
        "doc_repetition": _terms().doc_repetition,
        "contamination_ngram": _terms().contamination_ngram,
        "cross_source_ngram_overlap": _terms().cross_source_ngram_overlap,
        "doc_char_entropy": _terms().doc_char_entropy,
        "source_unigram_kl": _terms().source_unigram_kl,
        "token_counts": pl.token_counts,
        "doc_stats": pl.doc_stats,                      # rows-only (fingerprint)
        "doc_quality": pl.doc_quality,
        "lang_confusion": pl.lang_confusion,
        "ngram_jaccard_pairs": pl.ngram_jaccard_pairs,
        "minhash_clusters": pl.minhash_clusters,        # rows-only (polars shingle hash)
        "minhash_cluster_labels": pl.minhash_cluster_labels,
        "dedup_keeper_quality": pl.dedup_keeper_quality,
        "source_quality_profile": pl.source_quality_profile,
        "source_dup_rates": pl.source_dup_rates,
        "minhash_sigs_exact": _tx().minhash_sigs_exact,
        "simhash_sigs_exact": _tx().simhash_sigs_exact,
        "simhash_exact_pairs": _tx().simhash_exact_pairs,
        "lsh_band_keys": _tx().lsh_band_keys,
        "lsh_candidate_jaccard": _tx().lsh_candidate_jaccard,
        "jaccard_join_pairs": _tx().jaccard_join_pairs,
        "lsh_recall": _tx().lsh_recall,
        "simhash_recall": _tx().simhash_recall,
        "simhash_pairs": pl.simhash_pairs,              # rows-only
        "event_transitions": pl.event_transitions,
        "purchase_signup_asof": pl.purchase_signup_asof,
        "purchase_click_window": pl.purchase_click_window,
        "event_window_counts": pl.event_window_counts,
        "events_prior_hour_counts": pl.events_prior_hour_counts,
        "hopping_event_counts": pl.hopping_event_counts,
        "watermark_late_events": pl.watermark_late_events,
        "price_quantiles": pl.price_quantiles,
        "frequent_event_types": pl.frequent_event_types,
        "kmv_distinct_parts": pl.kmv_distinct_parts,
        "bloom_prune_stats": _sk().bloom_prune_stats,
        "sample_quantile_error": _qt().sample_quantile_error,
        "parts_kmv_jaccard": pl.parts_kmv_jaccard,
        "hll_distinct_parts": pl.hll_distinct_parts,
        "cms_part_counts": pl.cms_part_counts,
        "cms_error_audit": pl.cms_error_audit,
        "distinct_sketch_audit": pl.distinct_sketch_audit,
        "ship_lag_histogram": rel.ship_lag_histogram,
        "nation_trade_matrix": rel.nation_trade_matrix,
        "order_lines_histogram": rel.order_lines_histogram,
        "part_reorder_gaps": rel.part_reorder_gaps,
        "ams_f2_parts": pl.ams_f2_parts,
        "embedding_near_dups": pl.embedding_near_dup_pairs,  # rows-only
        "ann_topk": pl.ann_topk,
        "filtered_ann_topk": pl.filtered_ann_topk,
        "hourly_anomalies": pl.hourly_anomalies,
        "embedding_quantize": _annmod().embedding_quantize,
        "mmr_rerank": _annmod().mmr_rerank,
        "kcenter_coreset": _annmod().kcenter_coreset,
        "kcenter_assign_inertia": _annmod().kcenter_assign_inertia,
        "hard_negative_mining": _annmod().hard_negative_mining,
        "bitq_hamming_topk": _annmod().bitq_hamming_topk,
        "pq_adc_topk": _annmod().pq_adc_topk,
        "lof_scores": _annmod().lof_scores,
        "pq_recall": _annmod().pq_recall,
        "epsilon_neighbors": _annmod().epsilon_neighbors,
        "hybrid_rrf_topk": _annmod().hybrid_rrf_topk,
        "centroid_classify": _annmod().centroid_classify,
        "centroid_confusion": _annmod().centroid_confusion,
        "mutual_knn_pairs": _annmod().mutual_knn_pairs,
        "knn_graph_components": pl.knn_graph_components,
        "lsh_ann_topk": pl.lsh_ann_topk,                # rows-only (approximate)
        "ivf_ann_topk": pl.ivf_ann_topk,                # rows-only (approximate)
        "ivf_recall": pl.ivf_recall,                    # rows-only (audit of the above)
        "semantic_dedup": pl.semantic_dedup,            # rows-only (k-means)
        "embedding_pca": _annmod().pca_top_component,   # rows-only (float fold order)
        # graph algorithms (north_rule §2.11)
        "pagerank_2iter": pl.pagerank_2iter,
        "pagerank_personalized_2iter": pl.pagerank_personalized_2iter,
        "spam_mass": pl.spam_mass,
        "hits_2iter": pl.hits_2iter,
        "eigenvector_2iter": pl.eigenvector_2iter,
        "salsa_authority": _salsa().salsa_authority,
        "katz_centrality": pl.katz_centrality_sf,
        "pagerank_converged": pl.pagerank_converged,
        "triangle_count": pl.triangle_count_sf,
        "connected_components": pl.connected_components_sf,
        "cc_delta_refresh": pl.cc_delta_refresh,
        "strongly_connected_components": pl.strongly_connected_components_sf,  # SQL-checked (back-head closure)
        "scc_condensation_edges": pl.scc_condensation_edges,
        "label_propagation": pl.label_propagation_sf,   # rows-only (labels ARE vids)
        "component_count": pl.component_count_sf,
        "component_size_histogram": pl.component_size_histogram,
        "bfs_depths": pl.bfs_depths_sf,
        "descendant_depths": pl.descendant_depths_sf,
        "shortest_path_counts": pl.shortest_path_counts_sf,
        "betweenness_contrib": pl.betweenness_contrib_sf,  # rows-only (float fold)
        "landmark_assignment": pl.landmark_assignment_sf,
        "sssp_dists": pl.sssp_dists_sf,
        "seed_closeness": pl.seed_closeness_sf,
        "harmonic_centrality": pl.harmonic_centrality_sf,
        "seed_distance_histogram": pl.seed_distance_histogram_sf,
        "graph_diameter": pl.graph_diameter_sf,
        "kcore_vertices": pl.kcore_vertices_sf,
        "core_numbers": pl.core_numbers_sf,
        "mis_vertices": pl.mis_vertices_sf,
        "graph_coloring": pl.graph_coloring_sf,  # SQL-checked (named priorities)
        # sequence packing (concat-and-chunk; distributed prefix sum)
        "pack_sequences": _packmod().pack_sequences,
        "length_curriculum": _packmod().length_curriculum,
        "packed_sequence_stats": _packmod().packed_sequence_stats,
        "shuffle_order": _packmod().shuffle_order,
        "mixture_sample": _packmod().mixture_sample,
        "dataset_split": _packmod().dataset_split,
        "corpus_prep_stats": pl.corpus_prep_stats,
        "doc_chunks": _packmod().doc_chunks,
        "bigram_lm_perplexity": _lmmod().bigram_lm_perplexity,
        "kn_bigram_score": _lmmod().kn_bigram_score,
        "dsir_weights": _lmmod().dsir_weights,
        "wl_refinement": _wlmod().wl_refinement,
        "shared_ngram_lengths": _terms().shared_ngram_lengths,
        "table_fingerprint": pl.table_fingerprint,
        "partition_profile": pl.partition_profile,
        "value_ecdf": _an().value_ecdf,
    }


def _wlmod():
    from rayrank import wl

    return wl


def _lmmod():
    from rayrank import lm

    return lm


def _packmod():
    from rayrank import packing

    return packing


def _push():
    from rayrank import push

    return push


def _simrank():
    from rayrank import simrank

    return simrank


def _annmod():
    from rayrank import ann

    return ann


_VERTS = (
    "SELECT DISTINCT v FROM (SELECT l_orderkey AS v FROM lineitem "
    "UNION ALL SELECT l_partkey FROM lineitem)"
)

_PAGERANK_2ITER_SQL = f"""
WITH raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
outdeg AS (SELECT s, COUNT(*) AS d FROM raw GROUP BY s),
e AS (SELECT s, t, COUNT(*) AS m FROM raw GROUP BY s, t),
w AS (SELECT e.s, e.t, CAST(e.m AS DOUBLE)/o.d AS w FROM e JOIN outdeg o ON e.s = o.s),
x0 AS (SELECT v.v, 1.0/sqrt(nn.n) AS x FROM verts v, nn),
dang AS (SELECT v.v FROM verts v LEFT JOIN outdeg o ON v.v = o.s WHERE o.s IS NULL),
am0 AS (SELECT COALESCE(SUM(x.x), 0.0) AS m FROM dang d JOIN x0 x ON d.v = x.v),
c0 AS (SELECT w.t AS v, SUM(w.w * x.x) AS c FROM w JOIN x0 x ON w.s = x.v GROUP BY w.t),
r1 AS (
  SELECT v.v,
         0.85*COALESCE(c0.c, 0.0)
         + (0.85*(SELECT m FROM am0) + 0.15) * (1.0/sqrt((SELECT n FROM nn))) AS x
  FROM verts v LEFT JOIN c0 ON v.v = c0.v
),
l1a AS (SELECT SUM(ABS(x)) AS s FROM r1),
x1 AS (SELECT v, x/(SELECT s FROM l1a) AS x FROM r1),
am1 AS (SELECT COALESCE(SUM(x.x), 0.0) AS m FROM dang d JOIN x1 x ON d.v = x.v),
c1 AS (SELECT w.t AS v, SUM(w.w * x.x) AS c FROM w JOIN x1 x ON w.s = x.v GROUP BY w.t),
r2 AS (
  SELECT v.v,
         0.85*COALESCE(c1.c, 0.0)
         + (0.85*(SELECT m FROM am1) + 0.15) * (1.0/sqrt((SELECT n FROM nn))) AS x
  FROM verts v LEFT JOIN c1 ON v.v = c1.v
),
l1b AS (SELECT SUM(ABS(x)) AS s FROM r2)
SELECT v AS name, ROUND(x/(SELECT s FROM l1b), 6) AS score FROM r2
"""

# Host-level PageRank: the identical unroll on the host-contracted
# directed multigraph (host = id // 100; contraction BEFORE the
# VARCHAR cast so COUNT(*) sums per-row multiplicity exactly as
# build_graph's collapse does).
_HOST_PAGERANK_2ITER_SQL = _PAGERANK_2ITER_SQL.replace(
    "SELECT CAST(l_orderkey AS VARCHAR) AS s, "
    "CAST(l_partkey AS VARCHAR) AS t",
    "SELECT CAST(l_orderkey // 100 AS VARCHAR) AS s, "
    "CAST(l_partkey // 100 AS VARCHAR) AS t",
)


# Personalized 2-iter PageRank: identical unroll to _PAGERANK_2ITER_SQL
# but the teleport/dangling coefficient multiplies a per-vertex v̂
# (indicator on names LIKE '1%', scaled by the reciprocal norm exactly
# as CsrShard.scale_v multiplies by 1/‖v‖₂) instead of uniform 1/√n.
# x0 stays uniform — power_method inits x0 = 1/√n regardless of v
# (pagerank.py:152-156).
_PAGERANK_PPR_2ITER_SQL = """
WITH raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
outdeg AS (SELECT s, COUNT(*) AS d FROM raw GROUP BY s),
e AS (SELECT s, t, COUNT(*) AS m FROM raw GROUP BY s, t),
w AS (SELECT e.s, e.t, CAST(e.m AS DOUBLE)/o.d AS w FROM e JOIN outdeg o ON e.s = o.s),
vsel AS (
  SELECT v, CASE WHEN v LIKE '1%' THEN 1.0 ELSE 0.0 END AS vi FROM verts
),
vinv AS (SELECT 1.0/sqrt(SUM(vi*vi)) AS inv FROM vsel),
vhat AS (SELECT v, vi * (SELECT inv FROM vinv) AS vh FROM vsel),
x0 AS (SELECT v.v, 1.0/sqrt(nn.n) AS x FROM verts v, nn),
dang AS (SELECT v.v FROM verts v LEFT JOIN outdeg o ON v.v = o.s WHERE o.s IS NULL),
am0 AS (SELECT COALESCE(SUM(x.x), 0.0) AS m FROM dang d JOIN x0 x ON d.v = x.v),
c0 AS (SELECT w.t AS v, SUM(w.w * x.x) AS c FROM w JOIN x0 x ON w.s = x.v GROUP BY w.t),
r1 AS (
  SELECT v.v,
         0.85*COALESCE(c0.c, 0.0)
         + (0.85*(SELECT m FROM am0) + (1.0 - 0.85)) * vh.vh AS x
  FROM verts v LEFT JOIN c0 ON v.v = c0.v JOIN vhat vh ON v.v = vh.v
),
l1a AS (SELECT SUM(ABS(x)) AS s FROM r1),
x1 AS (SELECT v, x/(SELECT s FROM l1a) AS x FROM r1),
am1 AS (SELECT COALESCE(SUM(x.x), 0.0) AS m FROM dang d JOIN x1 x ON d.v = x.v),
c1 AS (SELECT w.t AS v, SUM(w.w * x.x) AS c FROM w JOIN x1 x ON w.s = x.v GROUP BY w.t),
r2 AS (
  SELECT v.v,
         0.85*COALESCE(c1.c, 0.0)
         + (0.85*(SELECT m FROM am1) + (1.0 - 0.85)) * vh.vh AS x
  FROM verts v LEFT JOIN c1 ON v.v = c1.v JOIN vhat vh ON v.v = vh.v
),
l1b AS (SELECT SUM(ABS(x)) AS s FROM r2)
SELECT v AS name, ROUND(x/(SELECT s FROM l1b), 6) AS score FROM r2
"""


_PR_ITERS = 100  # recursion bound; convergence at sf0.01 is ~4 rounds

# Converged reference-exact PageRank as a recursive CTE: per step, the
# unnormalized update aggregates w·x per target (self rows with w=0
# carry every vertex), the dangling mass comes from a scalar subquery
# on the working table, and the L1 normalization is a window SUM over
# the step's own output.  The stop replicates the reference's lagged
# rule: t* = first t with ‖x_t − x_{t−1}‖₂ < ε, result x_{t*}.
# Verified exact (1e-9, same iteration count) vs the numpy reference
# oracle on random graphs in-sandbox.
_PAGERANK_CONV_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
outdeg AS (SELECT s, COUNT(*) AS d FROM raw GROUP BY s),
e AS (SELECT s, t, COUNT(*) AS m FROM raw GROUP BY s, t),
w AS (SELECT e.s, e.t, CAST(e.m AS DOUBLE)/o.d AS w FROM e JOIN outdeg o ON e.s = o.s),
wv AS (
  SELECT s AS a, t AS b, w FROM w
  UNION ALL SELECT v, v, 0.0 FROM verts
),
dang AS (SELECT v.v FROM verts v LEFT JOIN outdeg o ON v.v = o.s WHERE o.s IS NULL),
pr(it, v, x) AS (
  SELECT 0, v.v, 1.0/sqrt((SELECT n FROM nn)) FROM verts v
  UNION ALL
  SELECT it, v, xu / (SUM(ABS(xu)) OVER ()) FROM (
    SELECT pr.it + 1 AS it, e.b AS v,
      0.85 * SUM(e.w * pr.x)
      + (0.85 * (SELECT COALESCE(SUM(p2.x), 0.0) FROM pr p2 JOIN dang d ON p2.v = d.v)
         + 0.15) * (1.0/sqrt((SELECT n FROM nn))) AS xu
    FROM pr JOIN wv e ON pr.v = e.a
    WHERE pr.it < {_PR_ITERS}
    GROUP BY pr.it + 1, e.b
  ) step
),
res AS (
  SELECT a.it, SQRT(SUM((a.x - b.x)*(a.x - b.x))) AS r
  FROM pr a JOIN pr b ON a.v = b.v AND b.it = a.it - 1
  GROUP BY a.it
),
tstar AS (SELECT MIN(it) AS it FROM res WHERE r < 1e-6)
SELECT v AS name, ROUND(x, 6) AS score FROM pr WHERE it = (SELECT it FROM tstar)
"""

_CC_ITERS = 64  # ≥ graph diameter at oracle scale (6 rounds at SF=0.1)

_CC_LABELS_CTE = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
    UNION ALL SELECT v, v FROM verts
  )
),
lab(it, v, l) AS (
  SELECT 0, v, v FROM verts
  UNION ALL
  SELECT lab.it + 1, e.b, MIN(lab.l)
  FROM lab JOIN und e ON lab.v = e.a
  WHERE lab.it < {_CC_ITERS}
  GROUP BY lab.it + 1, e.b
)
"""

# synchronous min-label iteration (self-loop rows fold each vertex's own
# label into the MIN) — converged labels are the min member NAME of each
# component, exactly what canonical_components reports.  Verified exact
# vs networkx on random multi-component graphs in-sandbox.
_CC_SQL = (
    _CC_LABELS_CTE
    + f"SELECT v AS name, l AS component FROM lab WHERE it = {_CC_ITERS}"
)

# Bipartiteness census: the CC labels seed a multi-seed min-plus BFS
# (one recursive CTE may reference another — the b2<-f1<-b1 precedent);
# an edge conflicts when endpoint parities match.  Self-loop rows in
# `und` never relax (d+1 > d) and are excluded by a < b.  Mirrors
# rayrank.pipelines.bipartite_conflict.
_BIPARTITE_CONFLICT_SQL = (
    _CC_LABELS_CTE.rstrip()[:-1].rstrip()  # keep the WITH list open
    + f"""),
seeds AS (SELECT DISTINCT l AS v FROM lab WHERE it = {_CC_ITERS}),
bfs(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seeds
  UNION ALL
  SELECT bfs.it + 1, e.b, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b
),
dist AS (SELECT v, MIN(d) AS d FROM bfs GROUP BY v),
comp AS (SELECT v, MIN(l) AS l FROM lab WHERE it = {_CC_ITERS} GROUP BY v),
conf AS (
  SELECT e.a, e.b, c.l,
    CASE WHEN (da.d + db.d) % 2 = 0 THEN 1 ELSE 0 END AS bad
  FROM und e
  JOIN dist da ON da.v = e.a
  JOIN dist db ON db.v = e.b
  JOIN comp c ON c.v = e.a
  WHERE e.a < e.b
)
SELECT CAST(COUNT(*) AS BIGINT) AS edges,
       CAST(SUM(bad) AS BIGINT) AS conflict_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM seeds) AS components,
       CAST(COUNT(DISTINCT CASE WHEN bad = 1 THEN l END) AS BIGINT)
         AS odd_components
FROM conf
""")

_COMPONENT_SIZE_HIST_SQL = (
    _CC_LABELS_CTE
    + f"""
SELECT size, CAST(COUNT(*) AS BIGINT) AS num_components
FROM (
  SELECT l, CAST(COUNT(*) AS BIGINT) AS size
  FROM lab WHERE it = {_CC_ITERS} GROUP BY l
) GROUP BY size
"""
)

# BFS hop distance from the min-name vertex on the same undirected
# graph.  Each recursive row (it, v, d) is the length of SOME walk
# seed→v, so d ≥ dist(v) always and the shortest-path walk appears at
# it = dist(v); MIN(d) over all iterations is therefore the exact BFS
# depth once it-bound ≥ diameter (6 at SF=0.1; bound 32).  Mirrors
# rayrank.bfs min-plus relaxation on the CsrShard actors.
# BFS tree extraction: depths from the min-name seed (the _BFS_SQL
# recursion), parent = MIN name among neighbors one hop closer —
# a total order, so the tree is unique (pipelines.bfs_tree_parents).
# Entity resolution: edit-distance-1 match graph -> min-label CC ->
# canonical entity ids; unmatched names stay themselves via the n
# self-loops (text.entity_clusters).
_ENTITY_CLUSTERS_SQL = f"""
WITH RECURSIVE
n AS (SELECT DISTINCT p_name AS nm FROM part),
pr AS (
  SELECT a.nm AS x, b.nm AS y FROM n a, n b
  WHERE a.nm < b.nm AND levenshtein(a.nm, b.nm) <= 1
),
und AS (
  SELECT x AS a, y AS b FROM pr
  UNION ALL SELECT y, x FROM pr
  UNION ALL SELECT nm, nm FROM n
),
lab(it, v, l) AS (
  SELECT 0, nm, nm FROM n
  UNION ALL
  SELECT lab.it + 1, e.b, MIN(lab.l)
  FROM lab JOIN und e ON lab.v = e.a
  WHERE lab.it < {_CC_ITERS}
  GROUP BY lab.it + 1, e.b
)
SELECT v AS name, l AS entity FROM lab WHERE it = {_CC_ITERS}
"""

_BFS_TREE_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seed AS (SELECT MIN(v) AS v FROM verts),
bfs(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seed
  UNION ALL
  SELECT bfs.it + 1, e.b, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b
),
dist AS (SELECT v AS name, MIN(d) AS depth FROM bfs GROUP BY v)
SELECT e.b AS name, dv.depth, MIN(e.a) AS parent
FROM und e
JOIN dist du ON du.name = e.a
JOIN dist dv ON dv.name = e.b
WHERE du.depth = dv.depth - 1
GROUP BY e.b, dv.depth
"""

_BFS_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seed AS (SELECT MIN(v) AS v FROM verts),
bfs(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seed
  UNION ALL
  SELECT bfs.it + 1, e.b, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b
)
SELECT v AS name, MIN(d) AS depth FROM bfs GROUP BY v
"""

# Directed reachability depths from the min-name vertex: the _BFS_SQL
# bounded min-plus recursion over the STORED edge direction only (no
# reversed union).  Self-loops never relax (d+1 > d), so DISTINCT
# pairs suffice.  Mirrors rayrank.pipelines.descendant_depths_sf.
_DESCENDANT_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
dir AS (SELECT DISTINCT s AS a, t AS b FROM raw WHERE s <> t),
seed AS (SELECT MIN(v) AS v FROM verts),
bfs(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seed
  UNION ALL
  SELECT bfs.it + 1, e.b, MIN(bfs.d) + 1
  FROM bfs JOIN dir e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b
)
SELECT v AS name, MIN(d) AS depth FROM bfs GROUP BY v
"""

# σ shortest-path counts from the min-name vertex: exact distances via
# the bounded min-plus recursion, then a LAYERED second recursion that
# extends only along dist→dist+1 edges — every extension of a shortest
# path by a shortest edge is a shortest path, so SUM(c) per layer is
# exactly σ (Brandes' forward pass; mirrors
# rayrank.bfs.shortest_path_counts).
_PATH_COUNTS_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seed AS (SELECT MIN(v) AS v FROM verts),
bfs(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seed
  UNION ALL
  SELECT bfs.it + 1, e.b, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b
),
dst AS (SELECT v, MIN(d) AS d FROM bfs GROUP BY v),
pc(it, v, c) AS (
  SELECT 0, v, CAST(1 AS BIGINT) FROM seed
  UNION ALL
  SELECT pc.it + 1, e.b, SUM(pc.c)
  FROM pc JOIN und e ON pc.v = e.a
  JOIN dst du ON du.v = pc.v
  JOIN dst dv ON dv.v = e.b
  WHERE du.d = pc.it AND dv.d = pc.it + 1 AND pc.it < {_CC_ITERS}
  GROUP BY pc.it + 1, e.b
)
SELECT dst.v AS name, dst.d AS dist, pc.c AS paths
FROM dst JOIN pc ON pc.v = dst.v AND pc.it = dst.d
"""

# Nearest-landmark assignment from the 4 smallest vertex names: the
# _BFS_SQL bounded min-plus recursion carrying the seed rank, then a
# per-vertex lexicographic (dist, seed-rank) pick — exactly the
# encoded-label minimum rayrank.bfs.landmarks propagates (label =
# dist·K + rank, relaxed by min(+K) on the unchanged gather_min
# kernel: K-landmark assignment costs ONE BFS, not K).
_LANDMARK_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seeds AS (
  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS BIGINT) AS si
  FROM (SELECT v FROM verts ORDER BY v LIMIT 4)
),
bfs(it, v, si, d) AS (
  SELECT 0, v, si, CAST(0 AS BIGINT) FROM seeds
  UNION ALL
  SELECT bfs.it + 1, e.b, bfs.si, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b, bfs.si
),
dist AS (SELECT v, si, MIN(d) AS d FROM bfs GROUP BY v, si),
pick AS (
  SELECT v, si, d,
    ROW_NUMBER() OVER (PARTITION BY v ORDER BY d, si) AS rn
  FROM dist
)
SELECT p.v AS name, p.d AS dist, s.v AS landmark
FROM pick p JOIN seeds s ON p.si = s.si WHERE p.rn = 1
"""

# Closeness centrality of the 4 smallest vertex names: the
# _LANDMARK_SQL per-seed bounded min-plus recursion, re-aggregated per
# SEED instead of per vertex.  n_reached / total_dist are exact BIGINT
# folds; closeness is ONE double division of those two integers —
# computed identically by rayrank.bfs.seed_closeness, so the hash
# match is float-algorithm-independent.
_SEED_CLOSENESS_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seeds AS (
  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS BIGINT) AS si
  FROM (SELECT v FROM verts ORDER BY v LIMIT 4)
),
bfs(it, v, si, d) AS (
  SELECT 0, v, si, CAST(0 AS BIGINT) FROM seeds
  UNION ALL
  SELECT bfs.it + 1, e.b, bfs.si, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b, bfs.si
),
dist AS (SELECT v, si, MIN(d) AS d FROM bfs GROUP BY v, si)
SELECT s.v AS seed,
  CAST(COUNT(*) AS BIGINT) AS n_reached,
  CAST(SUM(d.d) AS BIGINT) AS total_dist,
  CAST(COUNT(*) - 1 AS DOUBLE) / CAST(SUM(d.d) AS DOUBLE) AS closeness
FROM dist d JOIN seeds s ON d.si = s.si
GROUP BY s.v
"""

# SCC oracle WITHOUT a quadratic all-pairs closure: in the order↔part
# scc_edges graph every cycle must traverse a p→o back edge, so every
# nontrivial SCC contains a back-edge HEAD.  Reachability is therefore
# computed only FROM the (small) back-head set — forward (r1) and
# backward (r2) — and SCC(v) = {u mutual with some back-head o}, label
# = min member; vertices mutual with no back-head are singletons
# (COALESCE to their own name).  Closure size is |backheads|·reach,
# not V² (the reason the r11 sitting deemed this inexpressible).
_SCC_CTES = """
fwd AS (
  SELECT 'o'||CAST(l_orderkey AS VARCHAR) AS s, 'p'||CAST(l_partkey AS VARCHAR) AS t FROM lineitem
  UNION ALL
  SELECT 'p'||CAST(l_partkey AS VARCHAR), 'o'||CAST(l_orderkey AS VARCHAR) FROM lineitem
  WHERE l_returnflag='R' AND l_linenumber=1 AND l_quantity >= 40
),
edges AS (SELECT DISTINCT s, t FROM fwd),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM edges UNION ALL SELECT t FROM edges)),
backheads AS (
  SELECT DISTINCT 'o'||CAST(l_orderkey AS VARCHAR) AS o FROM lineitem
  WHERE l_returnflag='R' AND l_linenumber=1 AND l_quantity >= 40
),
r1(o, v) AS (
  SELECT o, o FROM backheads
  UNION
  SELECT r1.o, e.t FROM r1 JOIN edges e ON r1.v = e.s
),
r2(o, v) AS (
  SELECT o, o FROM backheads
  UNION
  SELECT r2.o, e.s FROM r2 JOIN edges e ON r2.v = e.t
),
mutual AS (SELECT r1.o, r1.v FROM r1 JOIN r2 ON r1.o = r2.o AND r1.v = r2.v),
lab AS (SELECT o, MIN(v) AS m FROM mutual GROUP BY o),
cand AS (SELECT mu.v, MIN(l.m) AS comp FROM mutual mu JOIN lab l ON mu.o = l.o GROUP BY mu.v),
comp AS (
  SELECT vt.v AS name, COALESCE(c.comp, vt.v) AS component
  FROM verts vt LEFT JOIN cand c ON vt.v = c.v
)"""

_SCC_SQL = f"""
WITH RECURSIVE
{_SCC_CTES}
SELECT name, component FROM comp
"""

# Bow-tie census from the same closure: the giant SCC is unique at
# both oracle SFs (30 vs 11 members at sf0.001, 193 vs 19 at sf0.01),
# so the size-desc pick cannot hit the engine's vid-space tie-break.
# OUT = forward reach from the giant's members minus the giant,
# IN = backward reach minus the giant (disjoint: a vertex in both
# would be in the giant), OTHER = the rest.
_BOWTIE_SQL = f"""
WITH RECURSIVE
{_SCC_CTES},
giant AS (
  SELECT component FROM comp GROUP BY component
  ORDER BY COUNT(*) DESC, component LIMIT 1
),
mem AS (SELECT name AS v FROM comp WHERE component = (SELECT component FROM giant)),
fr(v) AS (
  SELECT v FROM mem
  UNION
  SELECT e.t FROM fr JOIN edges e ON fr.v = e.s
),
rr(v) AS (
  SELECT v FROM mem
  UNION
  SELECT e.s FROM rr JOIN edges e ON rr.v = e.t
),
nums AS (
  SELECT (SELECT COUNT(*) FROM mem) AS n_scc,
         (SELECT COUNT(*) FROM rr WHERE v NOT IN (SELECT v FROM mem)) AS n_in,
         (SELECT COUNT(*) FROM fr WHERE v NOT IN (SELECT v FROM mem)) AS n_out,
         (SELECT COUNT(*) FROM verts) AS n_all
)
SELECT 'scc' AS region, CAST(n_scc AS BIGINT) AS n FROM nums
UNION ALL SELECT 'in', CAST(n_in AS BIGINT) FROM nums
UNION ALL SELECT 'out', CAST(n_out AS BIGINT) FROM nums
UNION ALL SELECT 'other', CAST(n_all - n_scc - n_in - n_out AS BIGINT) FROM nums
"""

# Condensation DAG from the same closure: distinct directed edges
# relabeled by SCC, intra-SCC edges dropped, counted per supernode
# pair.
_SCC_CONDENSATION_SQL = f"""
WITH RECURSIVE
{_SCC_CTES},
rel AS (
  SELECT cs.component AS comp_s, ct.component AS comp_t
  FROM edges e
  JOIN comp cs ON e.s = cs.name
  JOIN comp ct ON e.t = ct.name
  WHERE cs.component <> ct.component
)
SELECT comp_s, comp_t, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM rel GROUP BY 1, 2
"""

# The seed-BFS recursion shared by harmonic centrality and the
# per-seed distance histogram — identical to _SEED_CLOSENESS_SQL up to
# the final aggregation.
_SEED_DIST_CTES = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seeds AS (
  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS BIGINT) AS si
  FROM (SELECT v FROM verts ORDER BY v LIMIT 4)
),
bfs(it, v, si, d) AS (
  SELECT 0, v, si, CAST(0 AS BIGINT) FROM seeds
  UNION ALL
  SELECT bfs.it + 1, e.b, bfs.si, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {_CC_ITERS}
  GROUP BY bfs.it + 1, e.b, bfs.si
),
dist AS (SELECT v, si, MIN(d) AS d FROM bfs GROUP BY v, si)
"""

# Harmonic centrality with the repo's fixed-point-sum rule: each
# reciprocal is the floored integer quantum 2^40 // d (DuckDB `//` ==
# Python floor-div on positive ints), summed exactly (HUGEINT inside
# SUM, CAST errors rather than wraps), ONE double division by the
# power-of-two scale at the end — bit-identical to
# rayrank.bfs.seed_harmonic by construction.
_HARMONIC_SQL = f"""{_SEED_DIST_CTES}
SELECT s.v AS seed,
  CAST(COUNT(*) AS BIGINT) AS n_reached,
  CAST(MAX(d.d) AS BIGINT) AS max_dist,
  CAST(SUM(CASE WHEN d.d > 0 THEN 1099511627776 // d.d ELSE 0 END) AS BIGINT) AS harmonic_q,
  CAST(SUM(CASE WHEN d.d > 0 THEN 1099511627776 // d.d ELSE 0 END) AS DOUBLE)
    / 1099511627776.0 AS harmonic
FROM dist d JOIN seeds s ON d.si = s.si
GROUP BY s.v
"""

# Exact per-seed neighborhood function (distance distribution):
# pure-integer counts per (seed, hop) — the oracle for
# rayrank.bfs.seed_distance_histogram.
_SEED_DIST_HIST_SQL = f"""{_SEED_DIST_CTES}
SELECT s.v AS seed, CAST(d.d AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
FROM dist d JOIN seeds s ON d.si = s.si
GROUP BY 1, 2
"""

# Double-sweep diameter lower bound: BFS from the min-name vertex,
# pick the farthest vertex (max depth, ties → min name — the same
# scalar fold rayrank.shards.far_vertex_part does), BFS again from it.
# Two bounded min-plus recursions; the second's seed row references
# the first's pick.
_GRAPH_DIAMETER_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seed AS (SELECT MIN(v) AS v FROM verts),
b1(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seed
  UNION ALL
  SELECT b1.it + 1, e.b, MIN(b1.d) + 1
  FROM b1 JOIN und e ON b1.v = e.a
  WHERE b1.it < {_CC_ITERS}
  GROUP BY b1.it + 1, e.b
),
d1 AS (SELECT v, MIN(d) AS d FROM b1 GROUP BY v),
f1 AS (SELECT v, d FROM d1 ORDER BY d DESC, v LIMIT 1),
b2(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM f1
  UNION ALL
  SELECT b2.it + 1, e.b, MIN(b2.d) + 1
  FROM b2 JOIN und e ON b2.v = e.a
  WHERE b2.it < {_CC_ITERS}
  GROUP BY b2.it + 1, e.b
),
d2 AS (SELECT v, MIN(d) AS d FROM b2 GROUP BY v),
f2 AS (SELECT v, d FROM d2 ORDER BY d DESC, v LIMIT 1)
SELECT seed.v AS start, f1.v AS far1, f1.d AS ecc_start,
       f2.v AS far2, f2.d AS diameter_lb
FROM seed, f1, f2
"""

# Weighted SSSP from the min-name vertex: same bounded min-plus
# recursion as _BFS_SQL but relaxing d + m (m = undirected collapsed
# multiplicity: directed ∪ reversed counts summed, self-loops dropped
# — graph.derive_undirected semantics).  MIN(d) over iterations is the
# exact distance once the bound exceeds the max hop count of a
# min-cost path; weights ≥ 1 give hops ≤ cost ≤ diameter·max-mult,
# far under the 64 bound at oracle scale.  Mirrors rayrank.bfs.sssp
# (gather_min_plus_w / reduce_min Bellman-Ford on the CsrShard loop).
_SSSP_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT a, b, CAST(SUM(m) AS BIGINT) AS m FROM (
    SELECT s AS a, t AS b, COUNT(*) AS m FROM raw WHERE s <> t GROUP BY 1, 2
    UNION ALL
    SELECT t AS a, s AS b, COUNT(*) AS m FROM raw WHERE s <> t GROUP BY 1, 2
  ) GROUP BY a, b
),
seed AS (SELECT MIN(v) AS v FROM verts),
sp(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seed
  UNION ALL
  SELECT sp.it + 1, e.b, MIN(sp.d + e.m)
  FROM sp JOIN und e ON sp.v = e.a
  WHERE sp.it < {_CC_ITERS}
  GROUP BY sp.it + 1, e.b
)
SELECT v AS name, MIN(d) AS dist FROM sp GROUP BY v
"""

# k-core (k=3) as a single-reference recursive CTE: the alive set
# shrinks monotonically, so the UN-intersected peel rule
# alive(it+1) = {v : #alive(it)-neighbors(v) ≥ k} equals classic
# peeling (no second reference to the recursive table needed) and is
# constant once converged — selecting it = bound is the fixpoint.
# Mirrors rayrank.kcore (gather_alive_count / reduce_kcore on the
# CsrShard loop).  Simple-graph degree: DISTINCT undirected pairs,
# self-loops dropped, matching graph.derive_undirected's collapsed CSR.
_KCORE_K = 3

_KCORE_SQL = f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
core(it, v) AS (
  SELECT 0, v FROM verts
  UNION ALL
  SELECT c.it + 1, e.b
  FROM core c JOIN und e ON c.v = e.a
  WHERE c.it < {_CC_ITERS}
  GROUP BY c.it + 1, e.b
  HAVING COUNT(*) >= {_KCORE_K}
)
SELECT v AS name FROM core WHERE it = {_CC_ITERS}
"""

_COMPONENT_COUNT_SQL = (
    _CC_LABELS_CTE
    + "SELECT CAST(COUNT(DISTINCT l) AS BIGINT) AS components "
    + f"FROM lab WHERE it = {_CC_ITERS}"
)


def _core_numbers_sql(k_max: int = 4) -> str:
    """Bounded core decomposition: one single-reference recursive peel
    CTE per k (the _KCORE_SQL monotone rule), core = #surviving peels
    per vertex (alive sets are nested).  Mirrors
    rayrank.kcore.core_numbers."""
    cores = ",\n".join(
        f"""c{k}(it, v) AS (
  SELECT 0, v FROM verts
  UNION ALL
  SELECT c.it + 1, e.b
  FROM c{k} c JOIN und e ON c.v = e.a
  WHERE c.it < {_CC_ITERS}
  GROUP BY c.it + 1, e.b
  HAVING COUNT(*) >= {k}
)"""
        for k in range(1, k_max + 1)
    )
    unions = " UNION ALL ".join(
        f"SELECT v FROM c{k} WHERE it = {_CC_ITERS}"
        for k in range(1, k_max + 1)
    )
    return f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
{cores},
u AS ({unions})
SELECT verts.v AS name, CAST(COUNT(u.v) AS BIGINT) AS core
FROM verts LEFT JOIN u ON verts.v = u.v GROUP BY verts.v
"""


def _doc_quality_sql() -> str:
    """Quality/language heuristics as DuckDB SQL — built from the SAME
    stopword tables as the Ray scorer (rayrank.text._STOPWORDS), raw
    doubles bit-identical to the numpy path (verified in-sandbox; both
    sides use correctly-rounded IEEE double ops in the same order)."""
    from rayrank.text import _STOPWORDS

    def stop_expr(lang: str) -> str:
        lst = ",".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))
        return (
            "len(list_filter(words, x -> "
            f"list_contains([{lst}], lower(x))))"
        )

    return f"""
WITH base AS (
  SELECT doc_id, length(text) AS n,
    len(regexp_extract_all(text, '[^\\w\\s]')) AS npunct,
    len(regexp_extract_all(text, '\\d')) AS ndig,
    regexp_extract_all(text, '[a-zA-Z'']+') AS words
  FROM documents
),
w AS (
  SELECT doc_id, n, npunct, ndig, len(words) AS nw,
    {stop_expr('en')} AS st_en, {stop_expr('de')} AS st_de,
    {stop_expr('fr')} AS st_fr, {stop_expr('es')} AS st_es
  FROM base
),
sc AS (
  SELECT doc_id, n, nw,
    CASE WHEN n=0 THEN 0.0 ELSE npunct*1.0/n END AS punct_ratio,
    CASE WHEN n=0 THEN 0.0 ELSE ndig*1.0/n END AS digit_ratio,
    CASE WHEN nw=0 THEN 0.0 ELSE st_en*1.0/nw END AS stopword_ratio,
    st_en*1.0/GREATEST(nw,1) AS s_en, st_de*1.0/GREATEST(nw,1) AS s_de,
    st_fr*1.0/GREATEST(nw,1) AS s_fr, st_es*1.0/GREATEST(nw,1) AS s_es
  FROM w
)
SELECT doc_id,
  CASE WHEN n=0 THEN 0.0 ELSE
    0.35*LEAST(n/500.0, 1.0)
    + 0.25*LEAST(stopword_ratio/0.4, 1.0)
    + 0.20*(1.0 - LEAST(punct_ratio/0.3, 1.0))
    + 0.20*(1.0 - LEAST(digit_ratio/0.3, 1.0)) END AS quality,
  stopword_ratio, punct_ratio, digit_ratio,
  CASE
    WHEN GREATEST(s_en, s_de, s_fr, s_es) <= 0.0 THEN 'und'
    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
    WHEN s_fr >= s_es THEN 'fr'
    ELSE 'es' END AS lang_pred
FROM sc
"""


_NGRAM_JACCARD_SQL = r"""
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS ws
  FROM documents
),
sh AS (
  -- 3-word shingles, Python " ".join(words[i:i+3]) semantics; short
  -- docs collapse to one whole-text shingle, empty docs to ['']
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      ELSE list_transform(generate_series(1, len(ws) - 2),
           i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) END) AS s
  FROM w
)
SELECT sa.doc_id AS a, sb.doc_id AS b,
  len(list_intersect(sa.s, sb.s)) * 1.0
    / GREATEST(len(list_distinct(list_concat(sa.s, sb.s))), 1) AS jaccard
FROM sh sa JOIN sh sb ON sb.doc_id = sa.doc_id + 1
WHERE sa.doc_id % 2 = 0
"""


_M64 = 18446744073709551616  # 2^64
_B32 = 4294967296  # 2^32


def _sm64_mul(a: str, b: int) -> str:
    """a*b mod 2^64 in HUGEINT without int128 overflow (split at 2^32)."""
    return (
        f"(((({a}) // {_B32}) * {b} % {_B32}) * {_B32}"
        f" + (({a}) % {_B32}) * {b}) % {_M64}"
    )


def _sm64_cte(src: str) -> str:
    """CTE chain hashing column x of `src` with splitmix64 -> hh(z).

    Mirrors rayrank.sketch.splitmix64 bit-for-bit: wrapping uint64 ops
    become HUGEINT mod-2^64; >> n becomes // 2^n (values nonnegative).
    """
    return f"""
sk0 AS (SELECT CAST(x AS HUGEINT) AS x FROM {src}),
sk1 AS (SELECT (x + 11400714819323198485) % {_M64} AS z FROM sk0),
sk2 AS (SELECT {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1),
sk3 AS (SELECT {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2),
hh AS (SELECT xor(z, z // 2147483648) AS z FROM sk3)"""


def _sm64_id_cte(src: str) -> str:
    """Like ``_sm64_cte`` but carries an ``id`` column through:
    ``src`` must provide (id, x); yields hh(id, z)."""
    return f"""
sk0 AS (SELECT id, CAST(x AS HUGEINT) AS x FROM {src}),
sk1 AS (SELECT id, (x + 11400714819323198485) % {_M64} AS z FROM sk0),
sk2 AS (SELECT id, {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1),
sk3 AS (SELECT id, {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2),
hh AS (SELECT id, xor(z, z // 2147483648) AS z FROM sk3)"""


def _weighted_join_sample_sql() -> str:
    """Pre-join weighted Bernoulli sample (analytics
    .weighted_join_sample): identical pure-integer threshold chain,
    then the orders join over the sample only."""
    from rayrank.analytics import WJS_T

    return f"""
WITH lk AS (
  SELECT l_orderkey AS k,
    CAST(ROUND(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev,
    l_orderkey * 8 + l_linenumber AS x
  FROM lineitem),
{_sm64_carry_cte('lk', ['k', 'rev'], '_w')},
smp AS (SELECT k, rev FROM hh_w
        WHERE z < CAST(rev AS HUGEINT) * {WJS_T})
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_sampled,
  CAST(SUM(rev) AS BIGINT) AS sum_rev_i
FROM smp JOIN orders o ON o.o_orderkey = smp.k
GROUP BY 1
"""


def _ivm_join_sql() -> str:
    """Full-recompute oracle for the IVM-maintained join view
    (analytics.ivm_join_revenue): surviving orders are those whose
    splitmix64(o_orderkey) % 10 != 1 (delete stream); lineitem deltas
    are inserts, so every lineitem row counts."""
    return f"""
WITH ok AS (SELECT o_orderkey AS id, o_orderpriority AS prio,
            o_orderkey AS x FROM orders),
{_sm64_carry_cte('ok', ['id', 'prio'], '_o')},
liv AS (SELECT id, prio FROM hh_o WHERE z % 10 <> 1),
lrev AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev
  FROM lineitem GROUP BY l_orderkey
)
SELECT prio AS o_orderpriority, CAST(SUM(n) AS BIGINT) AS n,
  CAST(SUM(rev) AS BIGINT) AS sum_revi
FROM liv JOIN lrev ON lrev.l_orderkey = liv.id
GROUP BY prio
"""


def _scd2_sql() -> str:
    """SCD2 interval oracle (analytics.scd2_user_state): change rows
    via LAG over (ts, event_id); valid_to via LEAD over the change
    rows with the same tiebreak; open rows get the 2^62 sentinel."""
    from rayrank.analytics import SCD2_OPEN_US

    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           event_type AS state FROM events),
lg AS (SELECT user_id, ts_us, event_id, state,
       LAG(state) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         AS prev FROM e),
chg AS (SELECT user_id, ts_us, event_id, state FROM lg
        WHERE prev IS NULL OR prev <> state)
SELECT user_id, state, CAST(ts_us AS BIGINT) AS valid_from_us,
  CAST(COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id
       ORDER BY ts_us, event_id), {SCD2_OPEN_US}) AS BIGINT)
    AS valid_to_us
FROM chg
"""


def _sample_qerr_sql() -> str:
    """Sampling-accuracy audit oracle (quantiles.sample_quantile_error):
    quantile_disc over the hash sample (dyadic q — rank rule matches
    exact_quantiles bit-for-bit), rank error counted on the full
    table."""
    return f"""
WITH ev AS (SELECT event_id, CAST(ROUND(value*100) AS BIGINT) AS vc
            FROM events),
evx AS (SELECT vc, event_id AS x FROM ev),
{_sm64_carry_cte('evx', ['vc'], '_s')},
smp AS (SELECT vc FROM hh_s WHERE z < 4611686018427387904),
est AS (SELECT unnest([125, 250, 500, 750, 875]) AS qpm,
        unnest(quantile_disc(vc, [0.125, 0.25, 0.5, 0.75, 0.875]))
          AS est_cents
        FROM smp),
nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
cnts AS (SELECT e.qpm, e.est_cents, CAST(COUNT(*) AS BIGINT) AS n_le
         FROM est e JOIN ev ON ev.vc <= e.est_cents GROUP BY 1, 2)
SELECT CAST(qpm AS BIGINT) AS qpm, CAST(est_cents AS BIGINT) AS est_cents,
  n_le, CAST(ABS(n_le * 1000000 // nf.n - qpm * 1000) AS BIGINT) AS err_ppm
FROM cnts, nf ORDER BY qpm
"""


def _bloom_prune_sql() -> str:
    """Bloom semi-join pruning audit (sketch.bloom_prune_stats): both
    bit positions derive from ONE splitmix64 per key (low 13 bits and
    bits 20..32), so filter contents and false-positive counts are
    deterministic.  Wide counts stay in HUGEINT until the final cast."""
    from rayrank.sketch import BLOOM_M, BLOOM_SHIFT

    shift = 1 << BLOOM_SHIFT
    return f"""
WITH
bk AS (SELECT o_orderkey AS k, o_orderkey AS x FROM orders
       WHERE o_orderpriority = '1-URGENT'),
{_sm64_carry_cte('bk', ['k'], '_b')},
bits AS (SELECT DISTINCT b FROM (
  SELECT z % {BLOOM_M} AS b FROM hh_b
  UNION ALL SELECT (z // {shift}) % {BLOOM_M} AS b FROM hh_b)),
pk AS (SELECT l_orderkey AS k, l_orderkey AS x FROM lineitem),
{_sm64_carry_cte('pk', ['k'], '_p')},
flags AS (
  SELECT k,
    CASE WHEN (z % {BLOOM_M}) IN (SELECT b FROM bits)
          AND ((z // {shift}) % {BLOOM_M}) IN (SELECT b FROM bits)
         THEN 1 ELSE 0 END AS pass,
    CASE WHEN k IN (SELECT k FROM bk) THEN 1 ELSE 0 END AS istrue
  FROM hh_p),
agg AS (SELECT COUNT(*) AS n_probe, SUM(pass) AS n_pass,
               SUM(istrue) AS n_true FROM flags),
nb AS (SELECT COUNT(*) AS n_build FROM bk)
SELECT CAST(nb.n_build AS BIGINT) AS n_build,
  CAST(n_probe AS BIGINT) AS n_probe, CAST(n_pass AS BIGINT) AS n_pass,
  CAST(n_true AS BIGINT) AS n_true,
  CAST(n_pass - n_true AS BIGINT) AS n_false_pos,
  CAST(CASE WHEN n_probe > n_true
       THEN (n_pass - n_true) * 1000000 // (n_probe - n_true)
       ELSE 0 END AS BIGINT) AS fp_ppm
FROM agg, nb
"""


def _sm64_suffixed_cte(src: str, sfx: str) -> str:
    """_sm64_cte with suffixed CTE names so two hash chains coexist in
    one WITH list; yields hh{sfx}(z)."""
    return f"""
sk0{sfx} AS (SELECT CAST(x AS HUGEINT) AS x FROM {src}),
sk1{sfx} AS (SELECT (x + 11400714819323198485) % {_M64} AS z FROM sk0{sfx}),
sk2{sfx} AS (SELECT {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1{sfx}),
sk3{sfx} AS (SELECT {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2{sfx}),
hh{sfx} AS (SELECT xor(z, z // 2147483648) AS z FROM sk3{sfx})"""


def _sm64_carry_cte(src: str, carry: list[str], sfx: str) -> str:
    """_sm64_cte with suffixed names AND arbitrary carried key columns
    so splitmix64 applications can be CHAINED (shingle combining, band
    folds): ``src`` must provide (*carry, x); yields hh{sfx}(*carry, z).
    CTE staging keeps each z referenced twice per stage without the
    exponential blowup a nested-expression expansion would cause."""
    cols = ", ".join(carry)
    pre = f"{cols}, " if carry else ""
    return f"""
sk0{sfx} AS (SELECT {pre}CAST(x AS HUGEINT) AS x FROM {src}),
sk1{sfx} AS (SELECT {pre}(x + 11400714819323198485) % {_M64} AS z FROM sk0{sfx}),
sk2{sfx} AS (SELECT {pre}{_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1{sfx}),
sk3{sfx} AS (SELECT {pre}{_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2{sfx}),
hh{sfx} AS (SELECT {pre}xor(z, z // 2147483648) AS z FROM sk3{sfx})"""


def _node2vec_sql() -> str:
    """Unrolled biased second-order walks: per step, candidate weights
    by CASE (return / distance-1 / distance-2), windowed cumulative
    weight, threshold = splitmix64(cur*16+step) mod total via the
    carry CTE, first rank past the threshold wins
    (rayrank.pipelines.node2vec_walks)."""
    from rayrank.pipelines import (
        N2V_STEPS,
        N2V_W_COMMON,
        N2V_W_FAR,
        N2V_W_RET,
    )

    parts = [
        """raw AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
adj AS (
  SELECT a, ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) - 1 AS rn, b
  FROM und
),
w0 AS (SELECT DISTINCT a AS seed, a AS prev, a AS cur FROM und)"""
    ]
    sel = ["SELECT seed, CAST(0 AS BIGINT) AS step, cur AS vertex FROM w0"]
    for st in range(1, N2V_STEPS + 1):
        parts.append(
            f"""cand{st} AS (
  SELECT w.seed, w.cur AS pn, ad.rn, ad.b AS nxt,
    CASE WHEN ad.b = w.prev THEN {N2V_W_RET}
         WHEN m.a IS NOT NULL THEN {N2V_W_COMMON}
         ELSE {N2V_W_FAR} END AS wt
  FROM w{st - 1} w
  JOIN adj ad ON ad.a = w.cur
  LEFT JOIN und m ON m.a = ad.b AND m.b = w.prev
),
cum{st} AS (
  SELECT seed, pn, rn, nxt, wt,
    SUM(wt) OVER (PARTITION BY seed ORDER BY rn) AS cw,
    SUM(wt) OVER (PARTITION BY seed) AS tw
  FROM cand{st}
),{_sm64_carry_cte(f"(SELECT seed, cur * 16 + {st} AS x FROM w{st - 1})", ["seed"], f"n{st}")},
w{st} AS (
  SELECT seed, pn AS prev, nxt AS cur FROM (
    SELECT c.seed, c.pn, c.nxt,
      ROW_NUMBER() OVER (PARTITION BY c.seed ORDER BY c.rn) AS k
    FROM cum{st} c JOIN hhn{st} h ON h.seed = c.seed
    WHERE CAST(c.cw AS HUGEINT) > h.z % CAST(c.tw AS HUGEINT)
  ) WHERE k = 1
)"""
        )
        sel.append(
            f"SELECT seed, CAST({st} AS BIGINT) AS step, cur AS vertex FROM w{st}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sel)


def _percolation_sweep_sql() -> str:
    """Bond-percolation sweep: ONE splitmix chain over the packed
    canonical pair, a filter + min-label CC CTE per rate, giant = max
    component size (rayrank.pipelines.percolation_sweep)."""
    from rayrank.pipelines import PERC_RATES

    head = f"""
WITH RECURSIVE
rawi AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v
  FROM rawi WHERE s <> t
),{_sm64_carry_cte('(SELECT u, v, u * 2147483648 + v AS x FROM und)', ['u', 'v'], 'pc')}"""
    parts, sels = [], []
    for r in PERC_RATES:
        parts.append(f"""e{r} AS (
  SELECT CAST(u AS VARCHAR) AS a, CAST(v AS VARCHAR) AS b
  FROM hhpc WHERE z % 100 < {r}
),
v{r} AS (SELECT DISTINCT x FROM (SELECT a AS x FROM e{r} UNION ALL SELECT b FROM e{r})),
u{r} AS (
  SELECT a, b FROM e{r} UNION ALL SELECT b, a FROM e{r}
  UNION ALL SELECT x, x FROM v{r}
),
lab{r}(it, v, l) AS (
  SELECT 0, x, x FROM v{r}
  UNION ALL
  SELECT lab{r}.it + 1, e.b, MIN(lab{r}.l)
  FROM lab{r} JOIN u{r} e ON lab{r}.v = e.a
  WHERE lab{r}.it < {_CC_ITERS}
  GROUP BY lab{r}.it + 1, e.b
)""")
        sels.append(
            f"SELECT CAST({r} AS BIGINT) AS rate_pct, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges, "
            f"(SELECT CAST(MAX(c) AS BIGINT) FROM ("
            f"SELECT COUNT(*) AS c FROM lab{r} WHERE it = {_CC_ITERS} "
            f"GROUP BY l)) AS giant_size"
        )
    return head + ",\n" + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _cc_delta_sql() -> str:
    """Full-recompute oracle for the INCREMENTAL CC refresh
    (rayrank.pipelines.cc_delta_refresh): min-label CTE over the
    union (ship-year ≤ CCD_Y_NEW) edge set — proving the quotient-
    merge path equals a full rebuild."""
    from rayrank.pipelines import CCD_Y_NEW

    return f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem WHERE year(l_shipdate) <= {CCD_Y_NEW}
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
    UNION ALL SELECT v, v FROM verts
  )
),
lab(it, v, l) AS (
  SELECT 0, v, v FROM verts
  UNION ALL
  SELECT lab.it + 1, e.b, MIN(lab.l)
  FROM lab JOIN und e ON lab.v = e.a
  WHERE lab.it < {_CC_ITERS}
  GROUP BY lab.it + 1, e.b
)
SELECT v AS name, l AS component FROM lab WHERE it = {_CC_ITERS}
"""


def _sm64_inline(e: str) -> str:
    """splitmix64 as ONE nested scalar expression (for use inside a
    recursive CTE, where a chain of staging CTEs is unavailable).  The
    input expression is textually duplicated 32× — only use with a
    short column reference."""
    a = f"((({e}) + 11400714819323198485) % {_M64})"
    b = f"({_sm64_mul(f'xor({a}, {a} // 1073741824)', 0xBF58476D1CE4E5B9)})"
    c = f"({_sm64_mul(f'xor({b}, {b} // 134217728)', 0x94D049BB133111EB)})"
    return f"xor({c}, {c} // 2147483648)"


def _shared_ngram_sql() -> str:
    """Duplicated n-gram length profile (terms.shared_ngram_lengths):
    ONE recursive CTE over gram LENGTH extends every start position's
    chain hash by the next token (splitmix64 inlined — staging CTEs
    can't live inside the recursion); min(doc)<max(doc) per (n, hash)
    marks cross-document grams."""
    from rayrank.terms import SHARED_NGRAM_NMAX as NM

    return f"""
WITH RECURSIVE
nsbase AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS lst
  FROM documents
),
nstok AS (
  SELECT doc_id, UNNEST(lst) AS tok, UNNEST(range(len(lst))) AS pos FROM nsbase
),
nsvocab AS (
  SELECT tok, DENSE_RANK() OVER (ORDER BY tok) AS tid
  FROM (SELECT DISTINCT tok FROM nstok)
),
nstid AS MATERIALIZED (
  SELECT t.doc_id, t.pos, CAST(v.tid AS HUGEINT) AS tid
  FROM nstok t JOIN nsvocab v USING (tok)
),
gr(n, doc_id, pos, z) AS (
  SELECT 1, doc_id, pos, tid FROM nstid
  UNION ALL
  SELECT g.n + 1, g.doc_id, g.pos, xor({_sm64_inline("g.z")}, t.tid)
  FROM gr g JOIN nstid t ON t.doc_id = g.doc_id AND t.pos = g.pos + g.n
  WHERE g.n < {NM}
),
fin AS (SELECT n, doc_id, {_sm64_inline("z")} AS h FROM gr),
agg AS (SELECT n, h, MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM fin GROUP BY n, h),
cnt AS (SELECT n, COUNT(*) AS c FROM agg WHERE mn < mx GROUP BY n),
dom AS (SELECT UNNEST(range(1, {NM} + 1)) AS n)
SELECT CAST(dom.n AS BIGINT) AS n, COALESCE(c, 0) AS dup_grams
FROM dom LEFT JOIN cnt ON dom.n = cnt.n
"""


def _table_fpr_sql() -> str:
    """Order-free per-table checksums (pipelines.table_fingerprint):
    the identical chained splitmix per row, HUGEINT Σ mod 2^64."""
    from rayrank.pipelines import _FPR_CENTS, _FPR_SPECS

    chains, sels = [], []
    for i, tbl in enumerate(sorted(_FPR_SPECS)):
        cols = _FPR_SPECS[tbl]

        def cexp(c):
            if c in _FPR_CENTS:
                return f"CAST(ROUND({c} * 100) AS HUGEINT)"
            return f"CAST({c} AS HUGEINT)"

        carries = [f"c{k}" for k in range(1, len(cols))]
        first = ", ".join(
            [f"{cexp(c)} AS c{k}" for k, c in enumerate(cols) if k > 0]
            + [f"{cexp(cols[0])} AS x"]
        )
        chains.append(
            _sm64_carry_cte(f"(SELECT {first} FROM {tbl})", carries, f"fp{i}a")
        )
        prev = f"hhfp{i}a"
        for k in range(1, len(cols)):
            rest = [f"c{j}" for j in range(k + 1, len(cols))]
            sel = ", ".join(rest + [f"xor(z, c{k}) AS x"])
            sfx = f"fp{i}{'abcdef'[k]}"
            chains.append(_sm64_carry_cte(f"(SELECT {sel} FROM {prev})", rest, sfx))
            prev = f"hh{sfx}"
        sels.append(
            f"SELECT '{tbl}' AS tbl, COUNT(*) AS n_rows,"
            f" CAST(SUM(z) % {_M64} AS VARCHAR) AS checksum FROM {prev}"
        )
    return "WITH " + ",\n".join(chains) + "\n" + "\nUNION ALL ".join(sels)


_VALUE_ECDF_SQL = """
WITH ec AS (SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
h AS (SELECT vc, COUNT(*) AS c FROM ec GROUP BY vc),
cum AS (SELECT vc, SUM(c) OVER (ORDER BY vc) AS cl FROM h)
SELECT e.event_id AS event_id, e.vc AS value_cents, CAST(c2.cl AS BIGINT) AS n_le
FROM ec e JOIN cum c2 ON e.vc = c2.vc
"""


def _partition_profile_sql() -> str:
    """Hash-partition quality profile (pipelines.partition_profile):
    part = splitmix64(id) mod PARTQ for both endpoints, per-part vertex
    and source-edge loads + cut edges over the distinct edge set."""
    from rayrank.pipelines import PARTQ

    return f"""
WITH
pedges AS (SELECT DISTINCT l_orderkey AS s, l_partkey AS d FROM lineitem),
pverts AS (
  SELECT DISTINCT v FROM (SELECT s AS v FROM pedges UNION ALL SELECT d FROM pedges)
),
{_sm64_carry_cte("(SELECT v, CAST(v AS HUGEINT) AS x FROM pverts)", ["v"], "pv")},
vp AS MATERIALIZED (SELECT v, CAST(z % {PARTQ} AS BIGINT) AS part FROM hhpv),
vmet AS (SELECT part, COUNT(*) AS n_vertices FROM vp GROUP BY part),
emet AS (
  SELECT a.part AS part, COUNT(*) AS n_src_edges,
         SUM(CASE WHEN a.part <> b.part THEN 1 ELSE 0 END) AS n_cut_edges
  FROM pedges e JOIN vp a ON e.s = a.v JOIN vp b ON e.d = b.v
  GROUP BY a.part
)
SELECT v.part AS part, v.n_vertices AS n_vertices,
       CAST(COALESCE(e.n_src_edges, 0) AS BIGINT) AS n_src_edges,
       CAST(COALESCE(e.n_cut_edges, 0) AS BIGINT) AS n_cut_edges
FROM vmet v LEFT JOIN emet e ON v.part = e.part
"""


def _wl_sql() -> str:
    """Unrolled Weisfeiler–Leman refinement (rayrank.wl.wl_refinement):
    per round, one splitmix chain over the colors (g = z mod 2^40), a
    keyed HUGEINT sum of neighbor hashes, and a second chain folding
    own color + message.  lab{r} is AS MATERIALIZED — each round
    references its hash chain twice (message join + own-color fold),
    the exponential-inlining trap from the degree_discount lesson."""
    from rayrank.wl import WL_ROUNDS

    mod = 1 << 40
    head = """
raw AS MATERIALIZED (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
lab0 AS MATERIALIZED (SELECT v, CAST(1 AS HUGEINT) AS l FROM verts)"""
    parts = []
    for r in range(1, WL_ROUNDS + 1):
        parts.append(
            _sm64_carry_cte(f"(SELECT v, l AS x FROM lab{r - 1})", ["v"], f"wg{r}")
        )
        parts.append(f"""
gh{r} AS MATERIALIZED (SELECT v, z % {mod} AS g FROM hhwg{r}),
msg{r} AS (
  SELECT e.b AS v, SUM(g.g) AS m
  FROM gh{r} g JOIN und e ON g.v = e.a
  GROUP BY e.b
)""")
        parts.append(
            _sm64_carry_cte(
                f"(SELECT g.v, g.g + COALESCE(m.m, 0) AS x"
                f" FROM gh{r} g LEFT JOIN msg{r} m ON g.v = m.v)",
                ["v"],
                f"wc{r}",
            )
        )
        parts.append(
            f"lab{r} AS MATERIALIZED (SELECT v, z % {mod} AS l FROM hhwc{r})"
        )
    return (
        "WITH "
        + head
        + ",\n"
        + ",\n".join(parts)
        + f"\nSELECT v AS name, CAST(l AS BIGINT) AS wl_color FROM lab{WL_ROUNDS}"
    )


def _dsir_sql() -> str:
    """DSIR hashed-ngram importance weights (rayrank.lm.dsir_weights):
    unigram + chained-bigram splitmix buckets mod DSIR_B, per-bucket
    target/raw totals over the full range(B) domain, the floor(ln·1e9)
    quantized log-ratio, then an order-free integer sum per raw doc."""
    from rayrank.lm import DSIR_B, DSIR_TARGET_LANG

    return f"""
WITH
dsbase AS (
  SELECT doc_id, lang,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS lst
  FROM documents
),
dstok AS (
  SELECT doc_id, lang, UNNEST(lst) AS tok, UNNEST(range(len(lst))) AS pos
  FROM dsbase
),
dsvocab AS (
  SELECT tok, DENSE_RANK() OVER (ORDER BY tok) AS tid
  FROM (SELECT DISTINCT tok FROM dstok)
),
dstid AS MATERIALIZED (
  SELECT t.doc_id, t.lang, t.pos, CAST(v.tid AS HUGEINT) AS tid
  FROM dstok t JOIN dsvocab v USING (tok)
),
{_sm64_carry_cte("(SELECT doc_id, lang, tid AS x FROM dstid)", ["doc_id", "lang"], "du")},
dsbg AS (
  SELECT a.doc_id, a.lang, a.tid AS t0, b.tid AS t1
  FROM dstid a JOIN dstid b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
{_sm64_carry_cte("(SELECT doc_id, lang, t1, t0 AS x FROM dsbg)", ["doc_id", "lang", "t1"], "db1")},
{_sm64_carry_cte("(SELECT doc_id, lang, xor(z, t1) AS x FROM hhdb1)", ["doc_id", "lang"], "db2")},
dsfeat AS MATERIALIZED (
  SELECT doc_id, (lang = '{DSIR_TARGET_LANG}') AS tgt, z % {DSIR_B} AS bkt FROM hhdu
  UNION ALL
  SELECT doc_id, (lang = '{DSIR_TARGET_LANG}') AS tgt, z % {DSIR_B} AS bkt FROM hhdb2
),
dsbc AS (
  SELECT bkt,
    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
    SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
  FROM dsfeat GROUP BY bkt
),
dsdom AS (SELECT UNNEST(range({DSIR_B})) AS bkt),
dsbca AS (
  SELECT dsdom.bkt, COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
  FROM dsdom LEFT JOIN dsbc ON dsdom.bkt = dsbc.bkt
),
dstot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM dsbca),
dswq AS (
  SELECT bkt,
    CAST(FLOOR(ln((ct + 1) / (tt + {DSIR_B})) * 1000000000.0) AS BIGINT)
    - CAST(FLOOR(ln((cr + 1) / (tr + {DSIR_B})) * 1000000000.0) AS BIGINT) AS w
  FROM dsbca, dstot
)
SELECT f.doc_id, CAST(SUM(w.w) AS BIGINT) AS dsir_w
FROM dsfeat f JOIN dswq w ON f.bkt = w.bkt
WHERE NOT f.tgt
GROUP BY f.doc_id
"""


def _watermark_late_sql() -> str:
    """Late-data accounting under bounded planted disorder: arrival
    key = event_time_us + splitmix64(event_id) mod the jitter bound;
    watermark = window MAX of event time over strictly-earlier
    arrivals (rayrank.pipelines.watermark_late_events — the engine's
    two-level bucket scan computes the identical exclusive running
    max).  All integers."""
    from rayrank.pipelines import WM_JITTER_US, WM_LATE_US

    return f"""
WITH {_sm64_id_cte('(SELECT event_id AS id, event_id AS x FROM events)')},
arr AS (
  SELECT e.event_type, CAST(epoch_us(e.ts) AS BIGINT) AS tus,
    CAST(epoch_us(e.ts) AS BIGINT) + CAST(h.z % {WM_JITTER_US} AS BIGINT)
      AS ak,
    e.event_id
  FROM events e JOIN hh h ON h.id = e.event_id
),
wm AS (
  SELECT event_type, tus,
    MAX(tus) OVER (ORDER BY ak, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS w
  FROM arr
),
fl AS (
  SELECT event_type,
    CASE WHEN w IS NOT NULL AND tus < w - {WM_LATE_US} THEN 1 ELSE 0 END
      AS late,
    CASE WHEN w IS NOT NULL AND tus < w - {WM_LATE_US}
         THEN (w - {WM_LATE_US}) - tus ELSE 0 END AS lat
  FROM wm
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(late) AS BIGINT) AS n_late,
  CAST(MAX(lat) AS BIGINT) AS max_lateness_us
FROM fl GROUP BY event_type
"""


def _spam_mass_sql() -> str:
    """Compose the two unrolled 2-iter PageRank bodies as derived
    tables and apply the identical (pr − tr)/pr chain on the
    6dp-rounded scores (rayrank.pipelines.spam_mass)."""
    return f"""
SELECT a.name, a.score AS pr, b.score AS tr,
  (a.score - b.score) / a.score AS spam_mass
FROM ({_PAGERANK_2ITER_SQL}) a JOIN ({_PAGERANK_PPR_2ITER_SQL}) b
  ON a.name = b.name
"""


def _mis_sql() -> str:
    """Maximal independent set, splitmix64(int(name)) priorities,
    Luby rounds UNROLLED as materialized CTEs (a recursive CTE cannot
    reference the recursive table twice per round; the round count is
    bounded — 3 at both test SFs — so unrolling is exact; trailing
    rounds are no-ops on an empty alive set).  Mirrors
    rayrank.mis.mis(named_priority=True) on the undirected lineitem
    graph: select = alive vertex whose priority is a STRICT minimum
    over its alive neighbourhood (priorities unique: splitmix64 is a
    bijection over distinct ids), exclude = alive neighbours of
    selected.  Isolated vertices (self-loop-only endpoints survive in
    the vertex set) have no alive neighbour and enter in round 0."""
    from rayrank.pipelines import MIS_SQL_ROUNDS

    head = f"""
WITH raw AS (SELECT l_orderkey AS a, l_partkey AS b FROM lineitem),
{_sm64_id_cte('(SELECT x AS id, x FROM (SELECT DISTINCT a AS x FROM raw UNION SELECT b FROM raw))')},
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS s, v AS t FROM und UNION ALL SELECT v, u FROM und),
alive0 AS (SELECT id AS v, z AS h FROM hh)"""
    parts, sels = [], []
    for r in range(MIS_SQL_ROUNDS):
        parts.append(f"""mn{r} AS MATERIALIZED (
  SELECT adj.s AS v, MIN(nb.h) AS mh
  FROM adj
  JOIN alive{r} nb ON nb.v = adj.t
  JOIN alive{r} me ON me.v = adj.s
  GROUP BY adj.s
),
sel{r} AS MATERIALIZED (
  SELECT al.v FROM alive{r} al LEFT JOIN mn{r} m ON m.v = al.v
  WHERE m.v IS NULL OR al.h < m.mh
),
alive{r + 1} AS MATERIALIZED (
  SELECT al.v, al.h FROM alive{r} al
  WHERE al.v NOT IN (SELECT v FROM sel{r})
    AND al.v NOT IN (SELECT adj.s FROM adj JOIN sel{r} s ON s.v = adj.t)
)""")
        sels.append(f"SELECT CAST(v AS VARCHAR) AS name FROM sel{r}")
    return head + ",\n" + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _coloring_sql() -> str:
    """Iterated-MIS greedy coloring (pipelines.graph_coloring_sf with
    named priorities): ``COLORING_SQL_CLASSES`` classes, each an
    unrolled ``COLORING_SQL_ROUNDS``-round Luby MIS over the residual
    alive set (the _mis_sql block, indexed per class); the next
    class's alive set is the previous class's MINUS its color class
    (excluded vertices return — residual-graph rule).  Extra classes
    and rounds are no-ops, so the unroll sizes only need to be ≥ the
    measured fixpoint."""
    from rayrank.pipelines import COLORING_SQL_CLASSES, COLORING_SQL_ROUNDS

    head = f"""
WITH raw AS (SELECT l_orderkey AS a, l_partkey AS b FROM lineitem),
{_sm64_id_cte('(SELECT x AS id, x FROM (SELECT DISTINCT a AS x FROM raw UNION SELECT b FROM raw))')},
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS MATERIALIZED (SELECT u AS s, v AS t FROM und UNION ALL SELECT v, u FROM und),
av0x0 AS MATERIALIZED (SELECT id AS v, z AS h FROM hh)"""
    parts, sels = [], []
    for c in range(COLORING_SQL_CLASSES):
        for r in range(COLORING_SQL_ROUNDS):
            parts.append(f"""mn{c}x{r} AS MATERIALIZED (
  SELECT adj.s AS v, MIN(nb.h) AS mh
  FROM adj
  JOIN av{c}x{r} nb ON nb.v = adj.t
  JOIN av{c}x{r} me ON me.v = adj.s
  GROUP BY adj.s
),
sel{c}x{r} AS MATERIALIZED (
  SELECT al.v FROM av{c}x{r} al LEFT JOIN mn{c}x{r} m ON m.v = al.v
  WHERE m.v IS NULL OR al.h < m.mh
),
av{c}x{r + 1} AS MATERIALIZED (
  SELECT al.v, al.h FROM av{c}x{r} al
  WHERE al.v NOT IN (SELECT v FROM sel{c}x{r})
    AND al.v NOT IN (SELECT adj.s FROM adj JOIN sel{c}x{r} s ON s.v = adj.t)
)""")
        un = " UNION ALL ".join(
            f"SELECT v FROM sel{c}x{r}" for r in range(COLORING_SQL_ROUNDS)
        )
        parts.append(f"col{c} AS MATERIALIZED ({un})")
        parts.append(f"""av{c + 1}x0 AS MATERIALIZED (
  SELECT al.v, al.h FROM av{c}x0 al
  WHERE al.v NOT IN (SELECT v FROM col{c})
)""")
        sels.append(
            f"SELECT CAST(v AS VARCHAR) AS name,"
            f" CAST({c} AS BIGINT) AS color FROM col{c}"
        )
    return head + ",\n" + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _maximal_matching_sql() -> str:
    """Greedy maximal matching by edge-Luby, rounds UNROLLED (same
    bounded-iteration argument as _mis_sql; 6 rounds at sf0.01).
    Mirrors rayrank.truss.maximal_matching: edge priority =
    splitmix64(u·2³² + v) over the canonical (u < v) distinct edge set
    of the triangle-bearing graph; a round selects every alive edge
    whose priority is the minimum at BOTH endpoints (unique priorities
    — injective key — so equality-with-min IS the strict rule), then
    drops all edges touching a matched vertex.  The engine's
    order-preserving uint64→int64 view is order-isomorphic to the
    HUGEINT z here, so MIN agrees."""
    from rayrank.truss import MM_SQL_ROUNDS

    head = f"""
WITH rawt AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM rawt WHERE a <> b
),{_sm64_carry_cte('(SELECT u, v, u * 4294967296 + v AS x FROM und)', ['u', 'v'], 'mm')},
a0 AS (SELECT u, v, z AS h FROM hhmm)"""
    parts, sels = [], []
    for r in range(MM_SQL_ROUNDS):
        parts.append(f"""mh{r} AS MATERIALIZED (
  SELECT x, MIN(h) AS mh FROM (
    SELECT u AS x, h FROM a{r} UNION ALL SELECT v, h FROM a{r}
  ) GROUP BY x
),
s{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM a{r} e
  JOIN mh{r} mu ON mu.x = e.u
  JOIN mh{r} mv ON mv.x = e.v
  WHERE e.h = mu.mh AND e.h = mv.mh
),
mv{r} AS (SELECT u AS x FROM s{r} UNION ALL SELECT v FROM s{r}),
a{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v, e.h FROM a{r} e
  WHERE e.u NOT IN (SELECT x FROM mv{r})
    AND e.v NOT IN (SELECT x FROM mv{r})
)""")
        sels.append(f"SELECT u, v FROM s{r}")
    return head + ",\n" + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _graph_coarsen_sql() -> str:
    """Matching-contraction coarsening: the unrolled matching chain as
    a parenthesized subquery (inner WITH scopes cleanly — the
    hybrid_rrf rule), then min-endpoint relabel joins + coarse-edge
    weight counts (rayrank.truss.graph_coarsen)."""
    return f"""
WITH m AS ({_maximal_matching_sql()}),
rep AS (SELECT u AS x, u AS r FROM m UNION ALL SELECT v, u FROM m),
crawt AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
cund AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM crawt WHERE a <> b
),
ce AS (
  SELECT LEAST(COALESCE(ru.r, e.u), COALESCE(rv.r, e.v)) AS cu,
         GREATEST(COALESCE(ru.r, e.u), COALESCE(rv.r, e.v)) AS cv
  FROM cund e
  LEFT JOIN rep ru ON ru.x = e.u
  LEFT JOIN rep rv ON rv.x = e.v
)
SELECT cu, cv, CAST(COUNT(*) AS BIGINT) AS w
FROM ce WHERE cu <> cv GROUP BY 1, 2
"""


def _attack_robustness_sql() -> str:
    """Targeted-attack robustness: hub top-k by (deg desc, id), edge
    filter per k, the percolation min-label CC CTE per k, giant = max
    component size (rayrank.pipelines.attack_robustness)."""
    from rayrank.pipelines import ATTACK_KS

    head = """
WITH RECURSIVE
rawi AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v
  FROM rawi WHERE s <> t
),
degq AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM und UNION ALL SELECT v FROM und
  ) GROUP BY x
),
rkq AS (SELECT x, ROW_NUMBER() OVER (ORDER BY d DESC, x) AS rn FROM degq)"""
    parts, sels = [], []
    for k in ATTACK_KS:
        parts.append(f"""h{k} AS (SELECT x FROM rkq WHERE rn <= {k}),
e{k} AS (
  SELECT CAST(u AS VARCHAR) AS a, CAST(v AS VARCHAR) AS b FROM und
  WHERE u NOT IN (SELECT x FROM h{k})
    AND v NOT IN (SELECT x FROM h{k})
),
v{k} AS (SELECT DISTINCT x FROM (SELECT a AS x FROM e{k} UNION ALL SELECT b FROM e{k})),
u{k} AS (
  SELECT a, b FROM e{k} UNION ALL SELECT b, a FROM e{k}
  UNION ALL SELECT x, x FROM v{k}
),
lab{k}(it, v, l) AS (
  SELECT 0, x, x FROM v{k}
  UNION ALL
  SELECT lab{k}.it + 1, e.b, MIN(lab{k}.l)
  FROM lab{k} JOIN u{k} e ON lab{k}.v = e.a
  WHERE lab{k}.it < {_CC_ITERS}
  GROUP BY lab{k}.it + 1, e.b
)""")
        sels.append(
            f"SELECT CAST({k} AS BIGINT) AS k_removed, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM e{k}) AS n_edges, "
            f"(SELECT CAST(MAX(c) AS BIGINT) FROM ("
            f"SELECT COUNT(*) AS c FROM lab{k} WHERE it = {_CC_ITERS} "
            f"GROUP BY l)) AS giant_size"
        )
    return head + ",\n" + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _widest_path_sql(rounds: int | None = None) -> str:
    """Unrolled max-min relaxation (pipelines.widest_path_from_seed):
    W[v] <- max(W[v], max over und edges of LEAST(W[u], m)).  Each
    round references the previous label table twice, so every round
    CTE is AS MATERIALIZED (the degree_discount inlining rule).
    Monotone: rounds beyond convergence are no-ops, so a fixed unroll
    >= the engine's measured round count matches the fixpoint.  The
    unroll count is the shared WIDEST_PATH_SQL_ROUNDS constant; the
    engine asserts its measured round count <= it, so a deeper fixture
    fails loudly instead of producing a silently-wrong oracle."""
    if rounds is None:
        from rayrank.pipelines import WIDEST_PATH_SQL_ROUNDS

        rounds = WIDEST_PATH_SQL_ROUNDS
    parts = ["""rawi AS (SELECT CAST(l_orderkey AS VARCHAR) AS s,
  CAST(l_partkey AS VARCHAR) AS t,
  l_orderkey AS si, l_partkey AS ti FROM lineitem)""",
"""verts AS (SELECT DISTINCT v FROM
  (SELECT s AS v FROM rawi UNION ALL SELECT t FROM rawi))""",
"""seed AS (SELECT CAST(MIN(LEAST(si, ti)) AS VARCHAR) AS v FROM rawi)""",
"""e AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS m FROM (
  SELECT s AS a, t AS b FROM rawi WHERE s <> t
  UNION ALL SELECT t, s FROM rawi WHERE s <> t) GROUP BY a, b)""",
f"""w0 AS MATERIALIZED (SELECT v.v,
  CASE WHEN v.v = seed.v THEN CAST({1 << 62} AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS x
  FROM verts v, seed)"""]
    for r in range(rounds):
        parts.append(f"""w{r + 1} AS MATERIALIZED (
  SELECT p.v, GREATEST(p.x, COALESCE(mx.c, 0)) AS x
  FROM w{r} p LEFT JOIN (
    SELECT e.b AS v, MAX(LEAST(q.x, e.m)) AS c
    FROM e JOIN w{r} q ON q.v = e.a GROUP BY e.b
  ) mx ON mx.v = p.v)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT v AS name, x AS width FROM w{rounds}"
    )


_HOST_QUOTIENT_SQL = """
WITH rawi AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v
  FROM rawi WHERE s <> t
)
SELECT LEAST(u // 100, v // 100) AS host_a,
  GREATEST(u // 100, v // 100) AS host_b,
  CAST(COUNT(*) AS BIGINT) AS n_edges
FROM und GROUP BY 1, 2
"""


_JOINT_DEGREE_SQL = """
WITH rawi AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v
  FROM rawi WHERE s <> t
),
degq AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM und UNION ALL SELECT v FROM und
  ) GROUP BY x
)
SELECT LEAST(da.d, db.d) AS du, GREATEST(da.d, db.d) AS dv,
  CAST(COUNT(*) AS BIGINT) AS n_edges
FROM und JOIN degq da ON da.x = und.u JOIN degq db ON db.x = und.v
GROUP BY 1, 2
"""


def _random_failure_sql() -> str:
    """Random-failure robustness (pipelines.random_failure_robustness):
    vertex alive iff splitmix64(x) >= f*2^64 (exact dyadic
    thresholds); per-level edge filter + the min-label CC CTE."""
    from rayrank.pipelines import FAIL_PMLS

    head = f"""
WITH RECURSIVE
rawi AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v
  FROM rawi WHERE s <> t
),
vtx AS (SELECT DISTINCT x FROM (SELECT u AS x FROM und UNION ALL SELECT v FROM und)),
vxx AS (SELECT x, x AS xx FROM vtx),
sk0 AS (SELECT x, CAST(xx AS HUGEINT) AS z FROM vxx),
sk1 AS (SELECT x, (z + 11400714819323198485) % {_M64} AS z FROM sk0),
sk2 AS (SELECT x, {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1),
sk3 AS (SELECT x, {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2),
vz AS (SELECT x, xor(z, z // 2147483648) AS z FROM sk3)"""
    parts, sels = [], []
    for pml in FAIL_PMLS:
        thr = ((1 << 64) * pml) // 1000
        parts.append(f"""e{pml} AS (
  SELECT CAST(u AS VARCHAR) AS a, CAST(v AS VARCHAR) AS b FROM und
  JOIN vz za ON za.x = und.u JOIN vz zb ON zb.x = und.v
  WHERE za.z >= {thr} AND zb.z >= {thr}
),
v{pml} AS (SELECT DISTINCT x FROM (SELECT a AS x FROM e{pml} UNION ALL SELECT b FROM e{pml})),
u{pml} AS (
  SELECT a, b FROM e{pml} UNION ALL SELECT b, a FROM e{pml}
  UNION ALL SELECT x, x FROM v{pml}
),
lab{pml}(it, v, l) AS (
  SELECT 0, x, x FROM v{pml}
  UNION ALL
  SELECT lab{pml}.it + 1, e.b, MIN(lab{pml}.l)
  FROM lab{pml} JOIN u{pml} e ON lab{pml}.v = e.a
  WHERE lab{pml}.it < {_CC_ITERS}
  GROUP BY lab{pml}.it + 1, e.b
)""")
        sels.append(
            f"SELECT CAST({pml} AS BIGINT) AS fail_pml, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM e{pml}) AS n_edges, "
            f"(SELECT CAST(MAX(c) AS BIGINT) FROM ("
            f"SELECT COUNT(*) AS c FROM lab{pml} WHERE it = {_CC_ITERS} "
            f"GROUP BY l)) AS giant_size"
        )
    return head + ",\n" + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sels)


def _transitivity_estimate_sql() -> str:
    """Deterministic 1/MOD wedge sample: packed (center, n1, n2) key
    through the splitmix chain, closure via the canonical edge join
    (rayrank.truss.transitivity_estimate)."""
    from rayrank.truss import WEDGE_SAMPLE_MOD

    src = (
        "(SELECT c * 4398046511104 + n1 * 2097152 + n2 AS x, n1, n2 "
        "FROM w)"
    )
    return f"""
WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM raw WHERE a <> b
),
adjq AS (SELECT u AS c, v AS n FROM und UNION ALL SELECT v, u FROM und),
w AS (
  SELECT a1.c, a1.n AS n1, a2.n AS n2
  FROM adjq a1 JOIN adjq a2 ON a1.c = a2.c AND a1.n < a2.n
),{_sm64_carry_cte(src, ["n1", "n2"], "wg")},
s AS (
  SELECT n1, n2 FROM hhwg WHERE z % {WEDGE_SAMPLE_MOD} = 0
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS sampled,
    CAST(SUM(CASE WHEN e.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS closed
  FROM s LEFT JOIN und e ON e.u = s.n1 AND e.v = s.n2
)
SELECT sampled, closed,
  CASE WHEN sampled = 0 THEN 0.0
       ELSE CAST(closed AS DOUBLE) / CAST(sampled AS DOUBLE) END AS est
FROM agg
"""


def _ego_network_sql() -> str:
    """Radius-EGO_RADIUS induced subgraph of the EGO_SEEDS_K smallest
    vertex names: bounded multi-seed min-plus BFS CTE, then the
    distinct canonical edge set semi-joined into the ball on both
    endpoints (rayrank.pipelines.ego_network_edges)."""
    from rayrank.pipelines import EGO_RADIUS, EGO_SEEDS_K

    return f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
seed AS (SELECT v FROM verts ORDER BY v LIMIT {EGO_SEEDS_K}),
bfs(it, v, d) AS (
  SELECT 0, v, CAST(0 AS BIGINT) FROM seed
  UNION ALL
  SELECT bfs.it + 1, e.b, MIN(bfs.d) + 1
  FROM bfs JOIN und e ON bfs.v = e.a
  WHERE bfs.it < {EGO_RADIUS}
  GROUP BY bfs.it + 1, e.b
),
ball AS (SELECT v FROM bfs GROUP BY v HAVING MIN(d) <= {EGO_RADIUS}),
fe AS (
  SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b
  FROM raw WHERE s <> t
)
SELECT fe.a, fe.b
FROM fe JOIN ball b1 ON b1.v = fe.a JOIN ball b2 ON b2.v = fe.b
"""


def _component_quotient_sql() -> str:
    """Quotient graph of the strong-tie contraction: min-label CC over
    the mult>=QUOTIENT_MIN_MULT undirected subgraph (self-loops keep
    singletons labeled by their own name), then every distinct full
    und edge re-keyed to (comp_a, comp_b) supernode pairs and counted
    (rayrank.pipelines.component_quotient_edges)."""
    from rayrank.pipelines import QUOTIENT_MIN_MULT

    return f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
fe AS (
  SELECT LEAST(s, t) AS u, GREATEST(s, t) AS v, COUNT(*) AS n
  FROM raw WHERE s <> t GROUP BY 1, 2
),
und2 AS (
  SELECT u AS a, v AS b FROM fe WHERE n >= {QUOTIENT_MIN_MULT}
  UNION ALL SELECT v, u FROM fe WHERE n >= {QUOTIENT_MIN_MULT}
  UNION ALL SELECT v, v FROM verts
),
lab(it, v, l) AS (
  SELECT 0, v, v FROM verts
  UNION ALL
  SELECT lab.it + 1, e.b, MIN(lab.l)
  FROM lab JOIN und2 e ON lab.v = e.a
  WHERE lab.it < {_CC_ITERS}
  GROUP BY lab.it + 1, e.b
),
fin AS (SELECT v, l FROM lab WHERE it = {_CC_ITERS}),
q AS (
  SELECT LEAST(lu.l, lv.l) AS ca, GREATEST(lu.l, lv.l) AS cb
  FROM fe JOIN fin lu ON lu.v = fe.u JOIN fin lv ON lv.v = fe.v
  WHERE lu.l <> lv.l
)
SELECT ca AS comp_a, cb AS comp_b, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM q GROUP BY 1, 2
"""


def _holdout_contamination_sql() -> str:
    """Exact-match decontamination audit: test-split docs (splitmix64
    hash range) whose RE2 canonical form appears among train-split
    docs (rayrank.packing.holdout_contamination)."""
    from rayrank.packing import SPLIT_TRAIN_T, SPLIT_VAL_T

    return f"""
WITH {_sm64_id_cte('(SELECT doc_id AS id, doc_id AS x FROM documents)')},
d AS (
  SELECT doc_id, source,
    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS canon
  FROM documents
),
dz AS (SELECT d.*, hh.z FROM d JOIN hh ON hh.id = d.doc_id),
te AS (SELECT source, canon FROM dz WHERE z >= {SPLIT_VAL_T}),
tr AS (SELECT DISTINCT canon FROM dz WHERE z < {SPLIT_TRAIN_T})
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_test,
  CAST(SUM(CASE WHEN tr.canon IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_contaminated
FROM te LEFT JOIN tr USING (canon) GROUP BY source
"""


def _ivm_event_revenue_sql() -> str:
    """Full recompute equivalent of the incrementally-maintained
    aggregate: base rows (pre-cutoff) minus the splitmix64-picked CDC
    deletes, plus the post-cutoff inserts (rayrank.analytics
    ivm_event_revenue constants)."""
    from rayrank.analytics import IVM_CUTOFF_US, IVM_DEL_MOD

    return f"""
WITH {_sm64_id_cte('(SELECT event_id AS id, event_id AS x FROM events)')},
ev AS (
  SELECT event_id, event_type, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
live AS (
  SELECT ev.event_type, ev.vc
  FROM ev JOIN hh ON hh.id = ev.event_id
  WHERE ev.us >= {IVM_CUTOFF_US} OR hh.z % {IVM_DEL_MOD} <> 0
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vc) AS BIGINT) AS sum_cents
FROM live GROUP BY event_type
"""


_I64_WRAP = (
    "CAST(CASE WHEN z >= 9223372036854775808 THEN z - 18446744073709551616 "
    "ELSE z END AS BIGINT)"
)


def _minhash_shingle_ctes() -> str:
    """Shared CTE prefix: tokenize documents, rank tokens alphabetically
    (1-based — numpy codepoint order == DuckDB binary collation on the
    ASCII corpus), form positional word 3-grams, and chain three
    splitmix64 stages into the shingle hash hhg3(doc_id, z).  Mirrors
    rayrank.text._block_exact_sigs bit-for-bit."""
    return f"""
mhbase AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS lst
  FROM documents
),
mhtok AS (
  SELECT doc_id, UNNEST(lst) AS tok, UNNEST(range(len(lst))) AS pos FROM mhbase
),
mhvocab AS (
  SELECT tok, DENSE_RANK() OVER (ORDER BY tok) AS tid
  FROM (SELECT DISTINCT tok FROM mhtok)
),
mhtid AS (
  SELECT t.doc_id, t.pos, CAST(v.tid AS HUGEINT) AS tid
  FROM mhtok t JOIN mhvocab v USING (tok)
),
mhtri AS (
  SELECT a.doc_id, a.tid AS t0, b.tid AS t1, c.tid AS t2
  FROM mhtid a
  JOIN mhtid b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN mhtid c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
{_sm64_carry_cte('(SELECT doc_id, t1, t2, t0 AS x FROM mhtri)', ['doc_id', 't1', 't2'], 'g1')},
{_sm64_carry_cte('(SELECT doc_id, t2, xor(z, t1) AS x FROM hhg1)', ['doc_id', 't2'], 'g2')},
{_sm64_carry_cte('(SELECT doc_id, xor(z, t2) AS x FROM hhg2)', ['doc_id'], 'g3')}"""


def _simhash_sigs_exact_sql() -> str:
    """SQL-exact SimHash (rayrank.text.simhash_sigs_exact): per-doc
    token multiplicities over the alphabetical-rank vocab, one
    splitmix chain per distinct token, strict-majority bit votes in
    HUGEINT, signature assembled as Σ bit·2^b and wrapped to int64."""
    pows = ", ".join(f"CAST('{1 << b}' AS HUGEINT)" for b in range(64))
    return f"""
WITH
mhbase AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS lst
  FROM documents
),
mhtok AS (SELECT doc_id, UNNEST(lst) AS tok FROM mhbase),
mhvocab AS (
  SELECT tok, DENSE_RANK() OVER (ORDER BY tok) AS tid
  FROM (SELECT DISTINCT tok FROM mhtok)
),
cnts AS (
  SELECT t.doc_id, CAST(v.tid AS HUGEINT) AS tid,
         CAST(COUNT(*) AS HUGEINT) AS cnt
  FROM mhtok t JOIN mhvocab v USING (tok)
  GROUP BY 1, 2
),
{_sm64_carry_cte('(SELECT doc_id, cnt, tid AS x FROM cnts)', ['doc_id', 'cnt'], 's1')},
bitpow AS (SELECT UNNEST([{pows}]) AS p),
sums AS (
  SELECT h.doc_id, b.p,
    SUM(h.cnt * ((h.z // b.p) % 2)) AS s, SUM(h.cnt) AS tot
  FROM hhs1 h CROSS JOIN bitpow b
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
    SUM(CASE WHEN 2 * s > tot THEN p ELSE CAST(0 AS HUGEINT) END) AS z
  FROM sums GROUP BY doc_id
)
SELECT doc_id, {_I64_WRAP} AS simhash FROM sig
"""


def _simhash_exact_pairs_sql() -> str:
    """Banded near-dup pairs over the SQL-exact SimHash signatures
    (rayrank.text.simhash_exact_pairs): 4×16-bit chunk buckets,
    in-bucket a < b pairs, Hamming via per-chunk bit_count on the
    XOR, deduped per pair with the shared-band count."""
    sig = _simhash_sigs_exact_sql()
    from rayrank.text import SIMHASH_EXACT_MAX_HAMMING

    chunk_pows = [1, 65536, 4294967296, 281474976710656]
    ham = " + ".join(
        f"bit_count(xor(CAST((x.z // CAST({p} AS HUGEINT)) % 65536 AS BIGINT),"
        f" CAST((y.z // CAST({p} AS HUGEINT)) % 65536 AS BIGINT)))"
        for p in chunk_pows
    )
    return f"""
WITH sigs AS ({sig}),
uz AS (
  SELECT doc_id, (CAST(simhash AS HUGEINT) + {_M64}) % {_M64} AS z FROM sigs
),
bnd AS (
  SELECT doc_id, z, t.b AS band,
    CAST((z // CAST(POWER(2, 16 * t.b) AS HUGEINT)) % 65536 AS BIGINT) AS key
  FROM uz CROSS JOIN (SELECT UNNEST(range(4)) AS b) t
),
pr AS (
  SELECT x.band, x.doc_id AS a, y.doc_id AS b, {ham} AS hamming
  FROM bnd x JOIN bnd y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT a, b, CAST(MIN(hamming) AS BIGINT) AS hamming,
  CAST(COUNT(*) AS BIGINT) AS n_bands
FROM pr WHERE hamming <= {SIMHASH_EXACT_MAX_HAMMING}
GROUP BY a, b
"""


def _minhash_mh_ctes(num_perm: int) -> str:
    """Extends the shingle prefix with the per-permutation salt cross
    join + fourth chain + per-doc minimum: mh(doc_id, perm, z)."""
    from rayrank.text import minhash_exact_seeds

    lits = ", ".join(
        f"CAST('{int(s)}' AS HUGEINT)" for s in minhash_exact_seeds(num_perm)
    )
    return f"""{_minhash_shingle_ctes()},
mhperms AS (SELECT UNNEST(range({num_perm})) AS perm, UNNEST([{lits}]) AS seed),
{_sm64_carry_cte(
    '(SELECT s.doc_id, p.perm, xor(s.z, p.seed) AS x '
    'FROM hhg3 s CROSS JOIN mhperms p)',
    ['doc_id', 'perm'], 'g4')},
mh AS (SELECT doc_id, perm, MIN(z) AS z FROM hhg4 GROUP BY doc_id, perm)"""


def _minhash_sigs_exact_sql(num_perm: int = 8) -> str:
    return f"""
WITH {_minhash_mh_ctes(num_perm)}
SELECT doc_id, CAST(perm AS BIGINT) AS perm, {_I64_WRAP} AS minhash FROM mh"""


def _lsh_band_ctes(num_perm: int = 8, rpb: int = 4) -> str:
    """CTE chain from documents to banded LSH keys hhb4(doc_id, band, z)
    — shared by the band-keys oracle and the candidate-Jaccard oracle."""
    assert rpb == 4, "band pivot below is written for rows_per_band=4"
    return f"""{_minhash_mh_ctes(num_perm)},
mhbm AS (
  SELECT doc_id, CAST(perm // {rpb} AS BIGINT) AS band,
    MAX(CASE WHEN perm % {rpb} = 0 THEN z END) AS m0,
    MAX(CASE WHEN perm % {rpb} = 1 THEN z END) AS m1,
    MAX(CASE WHEN perm % {rpb} = 2 THEN z END) AS m2,
    MAX(CASE WHEN perm % {rpb} = 3 THEN z END) AS m3
  FROM mh GROUP BY doc_id, perm // {rpb}
),
{_sm64_carry_cte(
    '(SELECT doc_id, band, m1, m2, m3, m0 AS x FROM mhbm)',
    ['doc_id', 'band', 'm1', 'm2', 'm3'], 'b1')},
{_sm64_carry_cte(
    '(SELECT doc_id, band, m2, m3, xor(z, m1) AS x FROM hhb1)',
    ['doc_id', 'band', 'm2', 'm3'], 'b2')},
{_sm64_carry_cte(
    '(SELECT doc_id, band, m3, xor(z, m2) AS x FROM hhb2)',
    ['doc_id', 'band', 'm3'], 'b3')},
{_sm64_carry_cte(
    '(SELECT doc_id, band, xor(z, m3) AS x FROM hhb3)',
    ['doc_id', 'band'], 'b4')}"""


def _lsh_band_keys_sql(num_perm: int = 8, rpb: int = 4) -> str:
    return f"""
WITH {_lsh_band_ctes(num_perm, rpb)}
SELECT doc_id, band, {_I64_WRAP} AS band_hash FROM hhb4"""


def _lsh_candidate_jaccard_sql(num_perm: int = 8, rpb: int = 4) -> str:
    """Candidate pairs from shared LSH buckets, then EXACT shingle-set
    Jaccard per pair — hhg3 is the per-doc shingle multiset from the
    shared minhash prefix; DISTINCT makes it the set."""
    return f"""
WITH {_lsh_band_ctes(num_perm, rpb)},
bk AS (SELECT doc_id, band, z FROM hhb4),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bk a JOIN bk b ON a.band = b.band AND a.z = b.z
    AND a.doc_id < b.doc_id
),
shs AS (SELECT DISTINCT doc_id, z FROM hhg3),
shsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shs GROUP BY doc_id),
shint AS (
  SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS i
  FROM cand c
  JOIN shs sa ON sa.doc_id = c.da
  JOIN shs sb ON sb.doc_id = c.db AND sb.z = sa.z
  GROUP BY c.da, c.db
)
SELECT c.da AS doc_a, c.db AS doc_b,
  COALESCE(i.i, CAST(0 AS BIGINT)) AS inter_size,
  za.n + zb.n - COALESCE(i.i, CAST(0 AS BIGINT)) AS union_size,
  CAST(COALESCE(i.i, CAST(0 AS BIGINT)) AS DOUBLE)
    / CAST(za.n + zb.n - COALESCE(i.i, CAST(0 AS BIGINT)) AS DOUBLE)
    AS jaccard
FROM cand c
JOIN shsz za ON za.doc_id = c.da
JOIN shsz zb ON zb.doc_id = c.db
LEFT JOIN shint i ON i.da = c.da AND i.db = c.db"""


def _jaccard_join_sql() -> str:
    """Exact J >= 4/5 self-join (text.jaccard_join_pairs): full
    shingle-hash self-join in SQL — the prefix filter is engine-side
    optimization only, provably complete, so outputs coincide.  Shares
    the hhg3 shingle chain with the LSH oracle (bit-identical hash
    space, no string/collision caveat)."""
    return f"""
WITH {_lsh_band_ctes()},
shs AS (SELECT DISTINCT doc_id, z FROM hhg3),
shsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shs
         GROUP BY doc_id),
shint AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS i
  FROM shs a JOIN shs b ON b.z = a.z AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b, i AS inter_size,
  za.n + zb.n - i AS union_size,
  CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) AS jaccard
FROM shint JOIN shsz za ON za.doc_id = da JOIN shsz zb ON zb.doc_id = db
WHERE 5 * i >= 4 * (za.n + zb.n - i)
"""


def _simhash_recall_sql() -> str:
    """SimHash quality audit (text.simhash_recall): composes the
    simhash-pair chain and the exact-join truth chain as
    parenthesized subqueries."""
    return f"""
WITH cand AS (SELECT a, b FROM ({_simhash_exact_pairs_sql()})),
truth AS (SELECT doc_a, doc_b FROM ({_jaccard_join_sql()})),
hits AS (SELECT COUNT(*) AS h FROM cand c
         JOIN truth t ON t.doc_a = c.a AND t.doc_b = c.b),
nt AS (SELECT COUNT(*) AS n FROM truth),
nc AS (SELECT COUNT(*) AS n FROM cand)
SELECT CAST(nt.n AS BIGINT) AS n_true, CAST(nc.n AS BIGINT) AS n_cand,
  CAST(h AS BIGINT) AS n_hit,
  CAST(CASE WHEN nt.n > 0 THEN h * 1000000 // nt.n ELSE 0 END
       AS BIGINT) AS recall_ppm,
  CAST(CASE WHEN nc.n > 0 THEN h * 1000000 // nc.n ELSE 0 END
       AS BIGINT) AS precision_ppm
FROM hits, nt, nc
"""


def _lsh_recall_sql() -> str:
    """LSH quality audit (text.lsh_recall): composes the banded-LSH
    candidate chain and the exact-join truth chain over one shared
    shingle-hash CTE list."""
    return f"""
WITH {_lsh_band_ctes()},
bk AS (SELECT doc_id, band, z FROM hhb4),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bk a JOIN bk b ON a.band = b.band AND a.z = b.z
    AND a.doc_id < b.doc_id),
shs AS (SELECT DISTINCT doc_id, z FROM hhg3),
shsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shs
         GROUP BY doc_id),
shint AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS i
  FROM shs a JOIN shs b ON b.z = a.z AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS (
  SELECT da, db FROM shint
  JOIN shsz za ON za.doc_id = da JOIN shsz zb ON zb.doc_id = db
  WHERE 5 * i >= 4 * (za.n + zb.n - i)),
hits AS (SELECT COUNT(*) AS h FROM cand c
         JOIN truth t ON t.da = c.da AND t.db = c.db),
nt AS (SELECT COUNT(*) AS n FROM truth),
nc AS (SELECT COUNT(*) AS n FROM cand)
SELECT CAST(nt.n AS BIGINT) AS n_true, CAST(nc.n AS BIGINT) AS n_cand,
  CAST(h AS BIGINT) AS n_hit,
  CAST(CASE WHEN nt.n > 0 THEN h * 1000000 // nt.n ELSE 0 END
       AS BIGINT) AS recall_ppm,
  CAST(CASE WHEN nc.n > 0 THEN h * 1000000 // nc.n ELSE 0 END
       AS BIGINT) AS precision_ppm
FROM hits, nt, nc
"""


def _kmv_jaccard_sql(k: int = 64) -> str:
    from rayrank.analytics import SETOP_YEAR_A, SETOP_YEAR_B

    src_a = (
        f"(SELECT DISTINCT l_partkey AS x FROM lineitem "
        f"WHERE year(l_shipdate) = {SETOP_YEAR_A})"
    )
    src_b = (
        f"(SELECT DISTINCT l_partkey AS x FROM lineitem "
        f"WHERE year(l_shipdate) = {SETOP_YEAR_B})"
    )
    return f"""
WITH {_sm64_suffixed_cte(src_a, "a")},
{_sm64_suffixed_cte(src_b, "b")},
ha AS (
  SELECT z FROM (
    SELECT z, ROW_NUMBER() OVER (ORDER BY z) AS rn
    FROM (SELECT DISTINCT z FROM hha)
  ) WHERE rn <= {k}
),
hb AS (
  SELECT z FROM (
    SELECT z, ROW_NUMBER() OVER (ORDER BY z) AS rn
    FROM (SELECT DISTINCT z FROM hhb)
  ) WHERE rn <= {k}
),
u AS (
  SELECT z FROM (
    SELECT z, ROW_NUMBER() OVER (ORDER BY z) AS rn
    FROM (SELECT z FROM ha UNION SELECT z FROM hb)
  ) WHERE rn <= {k}
),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM u
  WHERE z IN (SELECT z FROM ha) AND z IN (SELECT z FROM hb)
),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u)
SELECT CAST({k} AS BIGINT) AS k, kk.n AS union_k, c.c AS inter_k,
  CAST(c.c AS DOUBLE) / CAST(kk.n AS DOUBLE) AS jaccard_est
FROM c, kk"""


def _shuffle_order_sql() -> str:
    return f"""
WITH {_sm64_id_cte('(SELECT doc_id AS id, doc_id AS x FROM documents)')}
SELECT id AS doc_id,
  CAST(ROW_NUMBER() OVER (ORDER BY z) - 1 AS BIGINT) AS pos
FROM hh"""


def _mixture_sample_sql() -> str:
    return f"""
WITH {_sm64_id_cte('(SELECT doc_id AS id, doc_id AS x FROM documents)')},
tok AS (
  SELECT doc_id, source, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
    array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
    AS n_tokens
  FROM documents
),
t2 AS (SELECT * FROM tok WHERE n_tokens > 0),
j AS (
  SELECT t.doc_id, t.source, t.n_tokens, h.z
  FROM t2 t JOIN hh h ON t.doc_id = h.id
),
bud AS (SELECT source, SUM(n_tokens) // 2 AS b FROM t2 GROUP BY source),
c AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY z) AS cum
  FROM j
)
SELECT c.doc_id, c.source, c.n_tokens
FROM c JOIN bud ON c.source = bud.source WHERE c.cum <= bud.b"""


def _dataset_split_sql() -> str:
    from rayrank.packing import SPLIT_TRAIN_T, SPLIT_VAL_T

    return f"""
WITH {_sm64_id_cte('(SELECT doc_id AS id, doc_id AS x FROM documents)')},
tok AS (
  SELECT doc_id, source, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
    array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
    AS n_tokens
  FROM documents
),
j AS (
  SELECT t.source, t.n_tokens, h.z
  FROM tok t JOIN hh h ON t.doc_id = h.id WHERE t.n_tokens > 0
)
SELECT source,
  CASE WHEN z < {SPLIT_TRAIN_T} THEN 'train'
       WHEN z < {SPLIT_VAL_T} THEN 'val' ELSE 'test' END AS split,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM j GROUP BY 1, 2"""


def _kn_bigram_sql() -> str:
    """Interpolated Kneser–Ney bigram heldout scoring (rayrank/lm.py
    kn_bigram_score): counts/contexts/continuation-counts from the
    train split, the pinned skip rule (ctx seen AND N1+(·b) > 0), and
    the float chain written with the SAME left association as the
    numpy side so floor(1e9·ln p) matches bit-identically."""
    from rayrank.lm import KN_D
    from rayrank.packing import SPLIT_TRAIN_T

    return rf"""
WITH {_sm64_id_cte("(SELECT doc_id AS id, doc_id AS x FROM documents)")},
tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
),
tr AS (SELECT t.doc_id, lst FROM tok t JOIN hh h ON t.doc_id = h.id
       WHERE h.z < {SPLIT_TRAIN_T}),
he AS (SELECT t.doc_id, lst FROM tok t JOIN hh h ON t.doc_id = h.id
       WHERE h.z >= {SPLIT_TRAIN_T}),
tb AS (
  SELECT u[1] AS a, u[2] AS b
  FROM tr, UNNEST(list_zip(lst[1:-1], lst[2:])) AS zz(u)
  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL
),
bcnt AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM tb GROUP BY a, b),
cx AS (SELECT a, CAST(SUM(c) AS BIGINT) AS cc,
              CAST(COUNT(*) AS BIGINT) AS nf
       FROM bcnt GROUP BY a),
nbk AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM bcnt GROUP BY b),
nbt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbig FROM bcnt),
hp AS (
  SELECT doc_id, u[1] AS a, u[2] AS b
  FROM he, UNNEST(list_zip(lst[1:-1], lst[2:])) AS zz(u)
  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL
),
q AS (
  SELECT hp.doc_id,
    CAST(FLOOR(LN(
      (GREATEST(CAST(COALESCE(bc.c, 0) AS DOUBLE) - {KN_D}, 0.0)
       + ({KN_D} * CAST(cx.nf AS DOUBLE))
         * (CAST(nbk.nb AS DOUBLE) / CAST(nbt.nbig AS DOUBLE)))
      / CAST(cx.cc AS DOUBLE)) * 1000000000.0) AS BIGINT) AS q
  FROM hp
  LEFT JOIN bcnt bc ON hp.a = bc.a AND hp.b = bc.b
  JOIN cx ON hp.a = cx.a
  JOIN nbk ON hp.b = nbk.b, nbt
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
  CAST(SUM(q) AS BIGINT) AS kn_q
FROM q GROUP BY doc_id"""


def _bigram_lm_sql() -> str:
    """Add-one bigram LM heldout scoring: the train split via the
    exact splitmix threshold, counts/context/vocab from train, each
    heldout bigram's logprob quantized with the zipf_slope
    floor(ln·1e9) rule so per-doc sums are order-free (rayrank/lm.py
    mirrors the float chain verbatim)."""
    from rayrank.packing import SPLIT_TRAIN_T

    return rf"""
WITH {_sm64_id_cte("(SELECT doc_id AS id, doc_id AS x FROM documents)")},
tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS lst
  FROM documents
),
tr AS (SELECT t.doc_id, lst FROM tok t JOIN hh h ON t.doc_id = h.id
       WHERE h.z < {SPLIT_TRAIN_T}),
he AS (SELECT t.doc_id, lst FROM tok t JOIN hh h ON t.doc_id = h.id
       WHERE h.z >= {SPLIT_TRAIN_T}),
tb AS (
  SELECT u[1] AS a, u[2] AS b
  FROM tr, UNNEST(list_zip(lst[1:-1], lst[2:])) AS zz(u)
  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL
),
bcnt AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM tb GROUP BY a, b),
cx AS (SELECT a, CAST(SUM(c) AS BIGINT) AS cc FROM bcnt GROUP BY a),
voc AS (SELECT CAST(COUNT(DISTINCT tkn) AS BIGINT) AS v
        FROM (SELECT unnest(lst) AS tkn FROM tr)),
hp AS (
  SELECT doc_id, u[1] AS a, u[2] AS b
  FROM he, UNNEST(list_zip(lst[1:-1], lst[2:])) AS zz(u)
  WHERE u[1] IS NOT NULL AND u[2] IS NOT NULL
),
q AS (
  SELECT hp.doc_id,
    CAST(FLOOR(LN(CAST(COALESCE(bc.c, 0) + 1 AS DOUBLE)
                  / CAST(COALESCE(cx.cc, 0) + voc.v AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS q
  FROM hp
  LEFT JOIN bcnt bc ON hp.a = bc.a AND hp.b = bc.b
  LEFT JOIN cx ON hp.a = cx.a, voc
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(q) AS BIGINT) AS q_sum
FROM q GROUP BY doc_id"""


def _corpus_prep_sql() -> str:
    from rayrank.packing import SPLIT_TRAIN_T, SPLIT_VAL_T
    from rayrank.pipelines import PREP_MIN_TOKENS

    return f"""
WITH base AS (
  SELECT doc_id, text,
    CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
      array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
      AS n
  FROM documents
),
d1 AS (
  SELECT * FROM base
  WHERE doc_id IN (SELECT MIN(doc_id) FROM base GROUP BY text)
),
d2 AS (
  SELECT * FROM d1
  WHERE doc_id IN (
    SELECT MIN(doc_id) FROM d1
    GROUP BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
  )
),
g AS (SELECT * FROM d2 WHERE n >= {PREP_MIN_TOKENS}),
{_sm64_id_cte("(SELECT doc_id AS id, doc_id AS x FROM g)")}
SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n) AS BIGINT) AS n_tokens FROM base
UNION ALL
SELECT '1_exact_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT) FROM d1
UNION ALL
SELECT '2_normalized_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT) FROM d2
UNION ALL
SELECT '3_quality_gate', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT) FROM g
UNION ALL
SELECT CASE WHEN h.z < {SPLIT_TRAIN_T} THEN '4_train'
            WHEN h.z < {SPLIT_VAL_T} THEN '4_val' ELSE '4_test' END,
  CAST(COUNT(*) AS BIGINT), CAST(SUM(g.n) AS BIGINT)
FROM g JOIN hh h ON g.doc_id = h.id GROUP BY 1"""


def _knn_cc_sql() -> str:
    """Mutual-kNN pairs (the MUTUAL_KNN_SQL CTEs) fed into the bounded
    min-label CC recursion (_CC_LABELS_CTE pattern) over the pair
    members — mirrors rayrank.pipelines.knn_graph_components."""
    from rayrank.pipelines import KNN_CC_K

    return f"""
WITH RECURSIVE
s AS (
  SELECT q.vec_id AS qid, e.vec_id AS vid,
    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS cos
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id <> e.vec_id
),
r AS (
  SELECT qid, vid,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn
  FROM s
),
t AS (SELECT qid, vid FROM r WHERE rn <= {KNN_CC_K}),
m AS (
  SELECT LEAST(qid, vid) AS a, GREATEST(qid, vid) AS b, COUNT(*) AS c
  FROM t GROUP BY 1, 2
),
pairs AS (
  SELECT CAST(a AS VARCHAR) AS s, CAST(b AS VARCHAR) AS t FROM m WHERE c = 2
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM pairs UNION ALL SELECT t FROM pairs)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM pairs WHERE s <> t
    UNION ALL SELECT t, s FROM pairs WHERE s <> t
    UNION ALL SELECT v, v FROM verts
  )
),
lab(it, v, l) AS (
  SELECT 0, v, v FROM verts
  UNION ALL
  SELECT lab.it + 1, e.b, MIN(lab.l)
  FROM lab JOIN und e ON lab.v = e.a
  WHERE lab.it < {_CC_ITERS}
  GROUP BY lab.it + 1, e.b
)
SELECT v AS name, l AS component FROM lab WHERE it = {_CC_ITERS}
"""


def _minhash_cluster_sql() -> str:
    """The full lsh_candidate_jaccard oracle as a subquery, pairs kept
    by the integer jaccard-≥-0.8 rule, fed into the bounded min-label
    CC recursion — mirrors rayrank.pipelines.minhash_cluster_labels."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT DISTINCT CAST(doc_a AS VARCHAR) AS s, CAST(doc_b AS VARCHAR) AS t
  FROM ({_lsh_candidate_jaccard_sql()})
  WHERE inter_size * 10 >= union_size * 8
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM pairs UNION ALL SELECT t FROM pairs)),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM pairs WHERE s <> t
    UNION ALL SELECT t, s FROM pairs WHERE s <> t
    UNION ALL SELECT v, v FROM verts
  )
),
lab(it, v, l) AS (
  SELECT 0, v, v FROM verts
  UNION ALL
  SELECT lab.it + 1, e.b, MIN(lab.l)
  FROM lab JOIN und e ON lab.v = e.a
  WHERE lab.it < {_CC_ITERS}
  GROUP BY lab.it + 1, e.b
)
SELECT v AS name, l AS component FROM lab WHERE it = {_CC_ITERS}
"""


_SOURCE_DUP_RATES_SQL = """
WITH s AS (
  SELECT source, sha256(text) AS sha FROM documents
),
a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(COUNT(DISTINCT sha) AS BIGINT) AS n_distinct
  FROM s GROUP BY source
)
SELECT source, n_docs, n_distinct,
  CAST((n_docs - n_distinct) * 1000000 // n_docs AS BIGINT) AS dup_ppm
FROM a
"""


def _source_quality_sql() -> str:
    """Per-source quality profile (pipelines.source_quality_profile):
    per-doc floor(1e9*quality) BEFORE the sum so the aggregate is
    order-free integer."""
    return f"""
WITH q AS (SELECT * FROM ({_doc_quality_sql()})),
d AS (SELECT doc_id, source FROM documents)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CAST(FLOOR(1000000000.0 * q.quality) AS BIGINT)) AS BIGINT)
    AS sum_quality_q,
  CAST(SUM(CASE WHEN q.lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_en_pred
FROM q JOIN d ON d.doc_id = q.doc_id
GROUP BY d.source
"""


def _dedup_keeper_sql() -> str:
    """Quality-aware keeper per near-dup cluster: composes the cluster
    oracle and the quality oracle as parenthesized subqueries (inner
    WITH RECURSIVE scopes cleanly)."""
    return f"""
WITH mc AS (SELECT * FROM ({_minhash_cluster_sql()})),
qual AS (SELECT doc_id, quality FROM ({_doc_quality_sql()})),
j AS (
  SELECT CAST(mc.name AS BIGINT) AS doc_id,
    CAST(mc.component AS BIGINT) AS component, q.quality
  FROM mc JOIN qual q ON q.doc_id = CAST(mc.name AS BIGINT)
),
rk AS (
  SELECT component, doc_id, quality,
    ROW_NUMBER() OVER (PARTITION BY component
                       ORDER BY quality DESC, doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY component) AS nm
  FROM j)
SELECT component, doc_id AS keeper_doc_id, CAST(nm AS BIGINT) AS n_members,
  quality
FROM rk WHERE rn = 1
"""


def _neighbor_sample_sql() -> str:
    """GraphSAGE fixed-fanout sampling oracle (pipelines
    .neighbor_sample_2hop): the per-node neighbor cache is
    ROW_NUMBER() over (splitmix64(a*2^32 + b), b) per vertex — the
    same chain as the numpy kernel (HUGEINT holds a*2^32+b exactly;
    the sm64 chain reduces mod 2^64 itself)."""
    from rayrank.pipelines import NS_F1, NS_F2, NS_SEEDS

    return f"""
WITH raw AS (SELECT l_orderkey AS s, l_partkey AS t FROM lineitem),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
pr AS (SELECT a, b, CAST(a AS HUGEINT) * 4294967296 + b AS x FROM und),
{_sm64_carry_cte('pr', ['a', 'b'], '_ns')},
rk AS (
  SELECT a, b,
    CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY z, b) - 1
         AS BIGINT) AS hrn
  FROM hh_ns
),
seeds AS (SELECT DISTINCT a FROM und ORDER BY a LIMIT {NS_SEEDS}),
h1 AS (SELECT rk.a AS seed, rk.a AS src, rk.b AS dst
       FROM rk JOIN seeds ON seeds.a = rk.a WHERE hrn < {NS_F1}),
h2 AS (SELECT h1.seed, h1.dst AS src, rk.b AS dst
       FROM h1 JOIN rk ON rk.a = h1.dst WHERE rk.hrn < {NS_F2})
SELECT seed, CAST(1 AS BIGINT) AS hop, src, dst FROM h1
UNION ALL
SELECT seed, CAST(2 AS BIGINT) AS hop, src, dst FROM h2
"""


def _random_walks_sql(steps: int) -> str:
    """Unrolled deterministic-walk oracle (rayrank.pipelines
    .random_walks): per step, the splitmix64 chain over
    (cur·8 + s) mod 2^64 in HUGEINT picks the rank-(z % deg) neighbor
    in ascending order — bit-for-bit the numpy kernel."""
    ctes = []
    selects = ["SELECT seed, CAST(0 AS BIGINT) AS step, cur AS vertex FROM w0"]
    for s in range(steps):
        ctes.append(f"""
w{s}k0 AS (SELECT seed, cur,
  (CAST(cur AS HUGEINT) * 8 + {s}) % {_M64} AS x FROM w{s}),
w{s}k1 AS (SELECT seed, cur,
  (x + 11400714819323198485) % {_M64} AS z FROM w{s}k0),
w{s}k2 AS (SELECT seed, cur,
  {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM w{s}k1),
w{s}k3 AS (SELECT seed, cur,
  {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM w{s}k2),
w{s}h AS (SELECT seed, cur, xor(z, z // 2147483648) AS z FROM w{s}k3),
w{s + 1} AS (
  SELECT h.seed, adj.b AS cur
  FROM w{s}h h
  JOIN deg ON deg.a = h.cur
  JOIN adj ON adj.a = h.cur AND adj.rn = CAST(h.z % deg.d AS BIGINT)
)""")
        selects.append(
            f"SELECT seed, CAST({s + 1} AS BIGINT) AS step, cur AS vertex"
            f" FROM w{s + 1}"
        )
    return f"""
WITH raw AS (
  SELECT l_orderkey AS s, l_partkey AS t FROM lineitem
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT s AS a, t AS b FROM raw WHERE s <> t
    UNION ALL SELECT t, s FROM raw WHERE s <> t
  )
),
adj AS (
  SELECT a, b,
    CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) - 1 AS BIGINT) AS rn
  FROM und
),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY a),
w0 AS (SELECT a AS seed, a AS cur FROM deg),{",".join(ctes)}
{" UNION ALL ".join(selects)}"""


# HITS, two unrolled iterations (pinned rule in rayrank.hits): A is the
# multiplicity-weighted adjacency over the lineitem string graph,
# hub0 = 1/sqrt(n), auth = normalize2(A^T hub), hub = normalize2(A auth).
def _hits_half(prev: str, out: str, src_col: str, dst_col: str) -> str:
    """One L2-normalized half-step CTE pair: out_u (unnormalized, all
    vertices via LEFT JOIN + COALESCE 0) and out (divided by its own
    L2 norm)."""
    return f"""
{out}u AS (
  SELECT v.v, COALESCE(su.c, 0.0) AS x FROM verts v LEFT JOIN (
    SELECT e.{dst_col} AS v, SUM(e.m * p.x) AS c
    FROM e JOIN {prev} p ON e.{src_col} = p.v GROUP BY e.{dst_col}
  ) su ON v.v = su.v
),
{out} AS (
  SELECT v, x / sqrt((SELECT SUM(x*x) FROM {out}u)) AS x FROM {out}u
)"""


# Katz centrality, 3 unrolled iterations of the INTEGER z-recurrence
# z0 = 1, z_{t+1} = Aᵀz_t + 16^{t+1}, katz = z3/16³ (rayrank/katz.py).
# Every CTE value is an exact integer carried in DOUBLE (< 2^53), so
# the fold order can't matter; the single division is written the same
# on both sides — bit-identical match, no ROUND.
_KATZ_SQL = """
WITH raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
e AS (SELECT s, t, CAST(COUNT(*) AS DOUBLE) AS m FROM raw GROUP BY s, t),
z0 AS (SELECT v, 1.0 AS z FROM verts),
s1 AS (SELECT e.t AS v, SUM(e.m * z.z) AS c FROM e JOIN z0 z ON e.s = z.v GROUP BY e.t),
z1 AS (SELECT v.v, 16.0 + COALESCE(s1.c, 0.0) AS z FROM verts v LEFT JOIN s1 ON v.v = s1.v),
s2 AS (SELECT e.t AS v, SUM(e.m * z.z) AS c FROM e JOIN z1 z ON e.s = z.v GROUP BY e.t),
z2 AS (SELECT v.v, 256.0 + COALESCE(s2.c, 0.0) AS z FROM verts v LEFT JOIN s2 ON v.v = s2.v),
s3 AS (SELECT e.t AS v, SUM(e.m * z.z) AS c FROM e JOIN z2 z ON e.s = z.v GROUP BY e.t),
z3 AS (SELECT v.v, 4096.0 + COALESCE(s3.c, 0.0) AS z FROM verts v LEFT JOIN s3 ON v.v = s3.v)
SELECT v AS name, z / 4096.0 AS katz FROM z3
"""


_HITS_2ITER_SQL = f"""
WITH raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
e AS (SELECT s, t, CAST(COUNT(*) AS DOUBLE) AS m FROM raw GROUP BY s, t),
h0 AS (SELECT v.v, 1.0/sqrt(nn.n) AS x FROM verts v, nn),
{_hits_half('h0', 'a1', 's', 't')},
{_hits_half('a1', 'h1', 't', 's')},
{_hits_half('h1', 'a2', 's', 't')},
{_hits_half('a2', 'h2', 't', 's')}
SELECT a2.v AS name, ROUND(a2.x, 6) AS auth, ROUND(h2.x, 6) AS hub
FROM a2 JOIN h2 ON a2.v = h2.v
"""


_EIGENVECTOR_2ITER_SQL = f"""
WITH raw AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS s, CAST(l_partkey AS VARCHAR) AS t
  FROM lineitem
),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM raw UNION ALL SELECT t FROM raw)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
und AS (
  SELECT s, t FROM raw WHERE s <> t
  UNION ALL SELECT t, s FROM raw WHERE s <> t
),
e AS (SELECT s, t, CAST(COUNT(*) AS DOUBLE) AS m FROM und GROUP BY s, t),
h0 AS (SELECT v.v, 1.0/sqrt(nn.n) AS x FROM verts v, nn),
{_hits_half('h0', 'a1', 's', 't')},
{_hits_half('a1', 'h1', 's', 't')},
{_hits_half('h1', 'a2', 's', 't')},
{_hits_half('a2', 'h2', 's', 't')}
SELECT h2.v AS name, ROUND(h2.x, 6) AS score FROM h2
"""


# Local clustering coefficient on the triangle-bearing undirected graph
# (same edge definition as the triangle_count oracle): coeff =
# 2T/(d·(d−1)) — one double division, identical expression to
# pipelines.clustering_coeff, so no rounding is needed.  Vertices whose
# only edges were self-loops have no simple edges and are excluded on
# both sides (the engine joins triangles against the edge-derived
# degree table).
_CLUSTERING_COEFF_SQL = """
WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem),
und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
        FROM raw WHERE a <> b),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM und e1 JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
tcnt AS (
  SELECT w AS vid, CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT x AS w FROM tri UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY w
),
deg AS (
  SELECT w AS vid, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS w FROM und UNION ALL SELECT v FROM und
  ) GROUP BY w
)
SELECT CAST(deg.vid AS VARCHAR) AS name,
  COALESCE(t.t, 0) AS triangles, deg.d AS degree,
  CASE WHEN deg.d >= 2
       THEN CAST(2*COALESCE(t.t, 0) AS DOUBLE)/(deg.d*(deg.d-1))
       ELSE 0.0 END AS coeff
FROM deg LEFT JOIN tcnt t ON deg.vid = t.vid
"""


def _interp_quantiles_sql() -> str:
    """quantile_cont oracle with EXPLICIT two-rank interpolation —
    identical float64 expressions to quantiles.interp_quantiles, so the
    match does not depend on DuckDB's internal quantile_cont formula."""
    return """
WITH v AS (SELECT l_extendedprice AS x FROM lineitem),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
o AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS r FROM v),
qs AS (SELECT CAST(unnest([0.125, 0.25, 0.5, 0.75, 0.875]) AS DOUBLE) AS q),
p AS (SELECT q, q*((SELECT n FROM n)-1) AS pos FROM qs),
p2 AS (SELECT q, pos, CAST(FLOOR(pos) AS BIGINT)+1 AS lor,
              pos - FLOOR(pos) AS frac FROM p),
p3 AS (SELECT q, lor, frac,
              LEAST(lor + CASE WHEN frac <> 0 THEN 1 ELSE 0 END,
                    (SELECT n FROM n)) AS hir FROM p2)
SELECT p3.q, lo.x + p3.frac*(hi.x - lo.x) AS value
FROM p3 JOIN o lo ON lo.r = p3.lor JOIN o hi ON hi.r = p3.hir
"""


def _stratified_sample_sql(target: int = 120) -> str:
    """Per-stratum splitmix64 threshold replay: f_t = min(1,
    target/count_t), thr_t = floor(f_t·2^64) — identical to the numpy
    uint64 path in analytics.stratified_event_sample."""
    return f"""
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type
),
t AS (
  SELECT event_type,
    CAST(FLOOR(LEAST(1.0, CAST({target} AS DOUBLE)/cnt)
               * 18446744073709551616.0) AS HUGEINT) AS thr
  FROM c
),
sk0 AS (SELECT event_id, event_type, CAST(event_id AS HUGEINT) AS x FROM events),
sk1 AS (SELECT event_id, event_type, (x + 11400714819323198485) % {_M64} AS z FROM sk0),
sk2 AS (SELECT event_id, event_type, {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1),
sk3 AS (SELECT event_id, event_type, {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2),
hh AS (SELECT event_id, event_type, xor(z, z // 2147483648) AS z FROM sk3)
SELECT h.event_id, h.event_type FROM hh h
JOIN t ON h.event_type = t.event_type WHERE h.z < t.thr
"""


def _kmv_by_sql(k: int = 64) -> str:
    """Per-group KMV replay: distinct hashes per event_type, k-th
    minimum via ROW_NUMBER, identical branch/doubles to
    sketch.kmv_distinct_by."""
    return f"""
WITH
sk0 AS (SELECT event_type, CAST(user_id AS HUGEINT) AS x FROM events),
sk1 AS (SELECT event_type, (x + 11400714819323198485) % {_M64} AS z FROM sk0),
sk2 AS (SELECT event_type, {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1),
sk3 AS (SELECT event_type, {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2),
hh AS (SELECT event_type, xor(z, z // 2147483648) AS z FROM sk3),
u AS (SELECT DISTINCT event_type, z FROM hh),
o AS (SELECT event_type, z,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY z) AS rn
      FROM u),
st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu,
         MAX(CASE WHEN rn = {k} THEN z END) AS hk
       FROM o GROUP BY event_type)
SELECT event_type,
  CAST(CASE WHEN nu < {k} THEN nu
    ELSE FLOOR(({k} - 1) * 18446744073709551616.0 / CAST(hk AS DOUBLE))
    END AS BIGINT) AS est_distinct,
  CAST({k} AS BIGINT) AS k
FROM st
"""


def _weighted_sample_sql() -> str:
    """Pure-integer weighted-Bernoulli replay of
    analytics.weighted_event_sample (no float thresholds)."""
    from rayrank.analytics import WEIGHTED_T

    return f"""
WITH
sk0 AS (SELECT event_id, value, CAST(event_id AS HUGEINT) AS x FROM events),
sk1 AS (SELECT event_id, value, (x + 11400714819323198485) % {_M64} AS z FROM sk0),
sk2 AS (SELECT event_id, value, {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1),
sk3 AS (SELECT event_id, value, {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2),
hh AS (SELECT event_id, value, xor(z, z // 2147483648) AS z FROM sk3)
SELECT event_id, value FROM hh
WHERE z < CAST(ROUND(value*100) AS HUGEINT) * {WEIGHTED_T}
"""


def _hash_sample_sql(frac: float = 0.25) -> str:
    """splitmix64-threshold Bernoulli sample, id carried through the
    hash chain.  Threshold must be exactly representable: frac=0.25
    gives 2^62 — identical to the numpy uint64 path."""
    thresh = int(frac * float(1 << 64))
    return f"""
WITH
sk0 AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS x FROM documents),
sk1 AS (SELECT doc_id, (x + 11400714819323198485) % {_M64} AS z FROM sk0),
sk2 AS (SELECT doc_id, {_sm64_mul('xor(z, z // 1073741824)', 0xBF58476D1CE4E5B9)} AS z FROM sk1),
sk3 AS (SELECT doc_id, {_sm64_mul('xor(z, z // 134217728)', 0x94D049BB133111EB)} AS z FROM sk2),
hh AS (SELECT doc_id, xor(z, z // 2147483648) AS z FROM sk3)
SELECT doc_id FROM hh WHERE z < {thresh}
"""


def _kmv_sql(col: str, table: str, k: int) -> str:
    return f"""
WITH {_sm64_cte(f'(SELECT DISTINCT {col} AS x FROM {table})')},
u AS (SELECT DISTINCT z FROM hh),
o AS (SELECT z, ROW_NUMBER() OVER (ORDER BY z) AS rn FROM u),
st AS (SELECT (SELECT COUNT(*) FROM u) AS nu,
              (SELECT z FROM o WHERE rn = {k}) AS hk)
SELECT CAST(CASE WHEN nu < {k} THEN nu
  ELSE FLOOR(({k} - 1) * 18446744073709551616.0 / CAST(hk AS DOUBLE))
  END AS BIGINT) AS est_distinct,
  CAST({k} AS BIGINT) AS k
FROM st"""


def _cms_sql(col: str, table: str, width: int, depth: int) -> str:
    """Count-min sketch rebuilt in SQL: the same splitmix64(k·depth+d)
    % width buckets (one carry CTE chain), exact integer counters,
    MIN over depth rows per distinct key — matches rayrank.sketch.
    cms_sketch/cms_estimates bit-for-bit."""
    ds = ", ".join(str(d) for d in range(depth))
    src = (
        f"(SELECT {col} AS k, d, CAST({col}*{depth} + d AS HUGEINT) AS x "
        f"FROM {table} CROSS JOIN (SELECT UNNEST([{ds}]) AS d) dd)"
    )
    return f"""
WITH {_sm64_carry_cte(src, ["k", "d"], "")},
counters AS (SELECT d, z % {width} AS bucket, COUNT(*) AS c FROM hh GROUP BY 1, 2),
kb AS (SELECT DISTINCT k, d, z % {width} AS bucket FROM hh),
est AS (
  SELECT kb.k, MIN(c.c) AS e
  FROM kb JOIN counters c ON c.d = kb.d AND c.bucket = kb.bucket
  GROUP BY kb.k
)
SELECT k AS {col}, CAST(e AS BIGINT) AS est_count FROM est"""


def _distinct_sketch_audit_sql() -> str:
    """KMV + HLL distinct-estimate audit vs exact (pipelines
    .distinct_sketch_audit); ABS before the floor division so the
    negative-floor-div divergence (the Theil-Sen lesson) can't
    arise."""
    return f"""
WITH kmvq AS (SELECT est_distinct FROM ({_kmv_sql("l_partkey", "lineitem", 64)})),
hllq AS (SELECT est_distinct FROM ({_hll_sql("l_partkey", "lineitem", 12)})),
ex AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n FROM lineitem)
SELECT 'hll' AS sketch,
  CAST(FLOOR(1000.0 * hllq.est_distinct) AS BIGINT) AS est_milli,
  ex.n AS exact_distinct,
  CAST(ABS(CAST(FLOOR(1000.0 * hllq.est_distinct) AS BIGINT) - 1000*ex.n)
       * 1000 // ex.n AS BIGINT) AS abs_err_ppm
FROM hllq, ex
UNION ALL
SELECT 'kmv', CAST(1000 * kmvq.est_distinct AS BIGINT), ex.n,
  CAST(ABS(1000 * kmvq.est_distinct - 1000 * ex.n) * 1000 // ex.n
       AS BIGINT)
FROM kmvq, ex
"""


def _cms_audit_sql() -> str:
    """CMS accuracy audit (pipelines.cms_error_audit): composes the
    exact-grid CMS oracle with true counts for the top-20 keys."""
    from rayrank.pipelines import CMS_AUDIT_K

    return f"""
WITH cms AS (SELECT * FROM ({_cms_sql("l_partkey", "lineitem", 256, 4)})),
ex AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_count
       FROM lineitem GROUP BY 1),
top AS (SELECT * FROM ex QUALIFY ROW_NUMBER() OVER
        (ORDER BY exact_count DESC, l_partkey) <= {CMS_AUDIT_K})
SELECT t.l_partkey, t.exact_count, c.est_count,
  c.est_count - t.exact_count AS overcount,
  CAST((c.est_count - t.exact_count) * 1000000 // t.exact_count
       AS BIGINT) AS err_ppm
FROM top t JOIN cms c ON c.l_partkey = t.l_partkey
"""


def _ams_f2_sql(col: str, table: str, r: int = 16) -> str:
    """AMS tug-of-war F2 sketch rebuilt in SQL: sign_j(key) = ±1 from
    the low bit of splitmix64(key·r + j) (the cms hash-chain rule),
    Z_j exact integer sums, pure-integer median-of-means over r//4
    groups of 4 (floor divisions on non-negatives — DuckDB ``//`` ==
    Python ``//``), next to the exact Σf².  Matches
    rayrank.sketch.ams_f2 bit-for-bit."""
    ng = r // 4
    src = (
        f"(SELECT j, CAST({col}*{r} + j AS HUGEINT) AS x "
        f"FROM {table} CROSS JOIN (SELECT UNNEST(range({r})) AS j) jj)"
    )
    return f"""
WITH {_sm64_carry_cte(src, ["j"], "")},
zz AS (
  SELECT j, SUM(CASE WHEN z % 2 = 1 THEN 1 ELSE -1 END) AS zj
  FROM hh GROUP BY j
),
xs AS (SELECT j // 4 AS g, CAST(zj AS HUGEINT) * zj AS x FROM zz),
ms AS (SELECT g, SUM(x) // 4 AS m FROM xs GROUP BY g),
rk AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM ms),
med AS (SELECT SUM(m) // 2 AS est FROM rk WHERE rn IN ({ng // 2}, {ng // 2 + 1})),
ex AS (
  SELECT SUM(CAST(c AS HUGEINT) * c) AS f2
  FROM (SELECT COUNT(*) AS c FROM {table} GROUP BY {col})
)
SELECT CAST({r} AS BIGINT) AS r_estimators,
  CAST(med.est AS BIGINT) AS est_f2,
  CAST(ex.f2 AS BIGINT) AS exact_f2
FROM med, ex"""


def _hll_sql(col: str, table: str, p: int) -> str:
    m = 1 << p
    wmask = (1 << (64 - p)) - 1
    return f"""
WITH {_sm64_cte(f'(SELECT {col} AS x FROM {table})')},
rr AS (
  SELECT CAST(z // {1 << (64 - p)} AS BIGINT) AS idx,
    {64 - p} + 1
      - length(ltrim(bin(CAST(z % {wmask + 1} AS BIGINT)), '0')) AS rho
  FROM hh
),
regs AS (SELECT idx, MAX(rho) AS r FROM rr GROUP BY idx),
st AS (
  -- exact integer register sum scaled by 2^60: rho here is in 1..53,
  -- so each term fits BIGINT and SUM promotes to HUGEINT; registers
  -- absent from rr are zero -> each adds 2^60 and one zero to v
  SELECT SUM(CAST(1 AS BIGINT) << (60 - r))
           + ({m} - COUNT(*)) * CAST({1 << 60} AS HUGEINT) AS s,
         CAST({m} - COUNT(*) AS BIGINT) AS v
  FROM regs
),
est AS (
  SELECT (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m} * 1152921504606846976.0
           / CAST(s AS DOUBLE) AS e, v
  FROM st
)
SELECT ROUND(CASE WHEN e <= 2.5 * {m} AND v > 0
  THEN {m} * ln(CAST({m} AS DOUBLE) / v) ELSE e END, 4) AS est_distinct,
  CAST({p} AS BIGINT) AS p
FROM est"""




_DAG_LONGEST_PATH_SQL = r"""
WITH RECURSIVE
und AS (
  SELECT DISTINCT LEAST(l_orderkey, l_partkey) AS u,
                  GREATEST(l_orderkey, l_partkey) AS v
  FROM lineitem WHERE l_orderkey <> l_partkey
),
vs AS (SELECT DISTINCT x FROM
       (SELECT u AS x FROM und UNION ALL SELECT v FROM und)),
lp(it, v, l) AS (
  SELECT 0, x, CAST(0 AS BIGINT) FROM vs
  UNION ALL
  SELECT lp.it + 1, e.v, MAX(lp.l + 1)
  FROM lp JOIN und e ON lp.v = e.u
  WHERE lp.it < 64
  GROUP BY lp.it + 1, e.v
)
SELECT CAST(v AS BIGINT) AS vertex, CAST(MAX(l) AS BIGINT) AS chain
FROM lp GROUP BY v
"""

_TEMPORAL_REACHABILITY_SQL = r"""
WITH RECURSIVE
ed AS (
  SELECT l_orderkey AS u, l_partkey AS v,
    CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS t
  FROM lineitem
),
e3 AS (
  SELECT DISTINCT u, v, t FROM
    (SELECT u, v, t FROM ed UNION ALL SELECT v, u, t FROM ed)
),
seed AS (SELECT MIN(u) AS s FROM e3),
arr(it, v, a) AS (
  SELECT 0, (SELECT s FROM seed), CAST(0 AS BIGINT)
  UNION ALL
  SELECT arr.it + 1, e.v, MIN(e.t)
  FROM arr JOIN e3 e ON arr.v = e.u AND e.t >= arr.a
  WHERE arr.it < 48
  GROUP BY arr.it + 1, e.v
)
SELECT CAST(v AS BIGINT) AS vertex, CAST(MIN(a) AS BIGINT) AS arrival
FROM arr GROUP BY v
"""


def _hll_ball_registers_sql() -> str:
    from rayrank.pipelines import _hll_ball_sql

    return _hll_ball_sql().replace(
        "{SM}", _sm64_id_cte("(SELECT v AS id, v AS x FROM verts)")
    )


def _subgraph_sample_sql_wired() -> str:
    from rayrank.pipelines import _subgraph_sample_sql

    return _subgraph_sample_sql().replace(
        "{SM}", _sm64_id_cte("(SELECT v AS id, v AS x FROM verts)")
    )


def _rendezvous_sql_wired() -> str:
    from rayrank.pipelines import _rendezvous_sql

    return _rendezvous_sql().replace(
        "{SM}", _sm64_id_cte("(SELECT key AS id, key AS x FROM vj)")
    )


def oracle_sql() -> dict[str, str]:
    from rayrank import relational as rel

    return {
        "pricing_summary": rel.PRICING_SUMMARY_SQL,
        "price_band_pairs": rel.PRICE_BAND_PAIRS_SQL,
        "top_revenue_orders": rel.TOP_REVENUE_ORDERS_SQL,
        "nation_revenue": rel.NATION_REVENUE_SQL,
        "user_sessions": rel.USER_SESSIONS_SQL,
        "user_streaks": rel.USER_STREAKS_SQL,
        "user_distinct_event_types": rel.USER_DISTINCT_EVENT_TYPES_SQL,
        "top_orders_per_customer": rel.TOP_ORDERS_PER_CUSTOMER_SQL,
        "user_event_pivot": rel.USER_EVENT_PIVOT_SQL,
        "user_event_unpivot": rel.USER_EVENT_UNPIVOT_SQL,
        "user_event_entropy": rel.USER_EVENT_ENTROPY_SQL,
        "media_decode_features": _mm().MEDIA_DECODE_FEATURES_SQL,
        "media_frame_sizes": _mm().MEDIA_FRAME_SIZES_SQL,
        "media_tile_fingerprints": _mm().MEDIA_TILE_FINGERPRINTS_SQL,
        "table_profile": rel.TABLE_PROFILE_SQL,
        "benford_order_totals": rel.BENFORD_ORDER_TOTALS_SQL,
        "hopping_distinct_users": _pl().HOPPING_DISTINCT_USERS_SQL,
        "part_pair_lift": _dec().PART_PAIR_LIFT_SQL,
        "funnel_conversions": rel.FUNNEL_CONVERSIONS_SQL,
        "three_step_funnel": rel.THREE_STEP_FUNNEL_SQL,
        "conversion_lag_histogram": rel.CONVERSION_LAG_SQL,
        "order_count_distribution": _an().ORDER_COUNT_DISTRIBUTION_SQL,
        "big_orders": _an().BIG_ORDERS_SQL,
        "inactive_customers": _an().INACTIVE_CUSTOMERS_SQL,
        "avg_yearly": _an().AVG_YEARLY_SQL,
        "mode_event_type": _an().MODE_EVENT_TYPE_SQL,
        "user_running_totals": _an().USER_RUNNING_TOTALS_SQL,
        "user_cumulative_distinct": _an().USER_CUMULATIVE_DISTINCT_SQL,
        "event_type_trigrams": _an().EVENT_TYPE_TRIGRAMS_SQL,
        "user_time_weighted_value": _an().USER_TIME_WEIGHTED_VALUE_SQL,
        "directed_triads": _truss().DIRECTED_TRIADS_SQL,
        "butterfly_count": _truss().BUTTERFLY_COUNT_SQL,
        "ivm_event_revenue": _ivm_event_revenue_sql(),
        "revenue_autocorr": _an().REVENUE_AUTOCORR_SQL,
        "revenue_theil_sen": _an().REVENUE_THEIL_SEN_SQL,
        "holt_daily_revenue": _an().HOLT_DAILY_REVENUE_SQL,
        "k_anonymity_audit": _an().K_ANONYMITY_AUDIT_SQL,
        "cusum_daily_revenue": _an().CUSUM_DAILY_REVENUE_SQL,
        "weekday_seasonality": _an().WEEKDAY_SEASONALITY_SQL,
        "ivm_join_revenue": _ivm_join_sql(),
        "revenue_max_drawdown": _an().REVENUE_MAX_DRAWDOWN_SQL,
        "scd2_user_state": _scd2_sql(),
        "user_event_sequence": _an().USER_EVENT_SEQUENCE_SQL,
        "missing_order_days": _an().MISSING_ORDER_DAYS_SQL,
        "user_state_at_day": _an().USER_STATE_AT_DAY_SQL,
        "mixture_temperature_budgets": _an().MIXTURE_TEMPERATURE_SQL,
        "weighted_join_sample": _weighted_join_sample_sql(),
        "zorder_layout": _an().ZORDER_LAYOUT_SQL,
        "tokenizer_fertility": _pl().TOKENIZER_FERTILITY_SQL,
        "vocab_oov_rate": _terms().VOCAB_OOV_RATE_SQL,
        "bm25_topk": _terms().BM25_TOPK_SQL,
        "zipf_slope": _terms().ZIPF_SLOPE_SQL,
        "vocab_coverage_curve": _terms().VOCAB_COVERAGE_SQL,
        "holdout_contamination": _holdout_contamination_sql(),
        "component_quotient_edges": _component_quotient_sql(),
        "global_transitivity": _pl().GLOBAL_TRANSITIVITY_SQL,
        "ego_network_edges": _ego_network_sql(),
        "node2vec_walks": _node2vec_sql(),
        "bfs_tree_parents": _BFS_TREE_SQL,
        "concurrent_orders": _an().CONCURRENT_ORDERS_SQL,
        "edge_churn": _truss().EDGE_CHURN_SQL,
        "transitivity_estimate": _transitivity_estimate_sql(),
        "percolation_sweep": _percolation_sweep_sql(),
        "temporal_reachability": _TEMPORAL_REACHABILITY_SQL,
        "dag_longest_path": _DAG_LONGEST_PATH_SQL,
        "entity_clusters": _ENTITY_CLUSTERS_SQL,
        "nation_year_rollup": _an().NATION_YEAR_ROLLUP_SQL,
        "nation_year_cube": _an().NATION_YEAR_CUBE_SQL,
        "event_value_stats": _an().EVENT_VALUE_STATS_SQL,
        "event_value_histogram": _an().EVENT_VALUE_HISTOGRAM_SQL,
        "event_value_winsorized": _an().EVENT_VALUE_WINSORIZED_SQL,
        "event_gap_quantiles": _an().EVENT_GAP_QUANTILES_SQL,
        "revenue_by_price_decile": _an().REVENUE_BY_PRICE_DECILE_SQL,
        "customers_all_expedited": _an().CUSTOMERS_ALL_EXPEDITED_SQL,
        "nation_monthly_mom": _an().NATION_MONTHLY_MOM_SQL,
        "trending_parts": _an().TRENDING_PARTS_SQL,
        "gini_order_revenue": _an().GINI_ORDER_REVENUE_SQL,
        "pareto_revenue_point": _an().PARETO_REVENUE_POINT_SQL,
        "open_orders_over_time": _an().OPEN_ORDERS_SQL,
        "fk_violations": _an().FK_VIOLATIONS_SQL,
        "stratified_event_sample": _stratified_sample_sql(),
        "price_quantiles_cont": _interp_quantiles_sql(),
        "parts_in_both_years": _an().PARTS_IN_BOTH_YEARS_SQL,
        "parts_churned": _an().PARTS_CHURNED_SQL,
        "part_qty_snapshot_diff": _an().PART_QTY_SNAPSHOT_DIFF_SQL,
        "clustering_coeff": _CLUSTERING_COEFF_SQL,
        "event_value_quantiles": _an().EVENT_VALUE_QUANTILES_SQL,
        "event_value_mad": _an().EVENT_VALUE_MAD_SQL,
        "user_last_event": _an().USER_LAST_EVENT_SQL,
        "part_skyline": _an().PART_SKYLINE_SQL,
        "event_value_ntile": _an().EVENT_VALUE_NTILE_SQL,
        "daily_event_spine": _an().DAILY_EVENT_SPINE_SQL,
        "retention_cohorts": _an().RETENTION_COHORTS_SQL,
        "users_per_type_kmv": _kmv_by_sql(),
        "weighted_event_sample": _weighted_sample_sql(),
        "daily_click_purchase_matrix": _an().DAILY_CLICK_PURCHASE_MATRIX_SQL,
        "promo_revenue": _dec().PROMO_REVENUE_SQL,
        "priority_counts": _dec().PRIORITY_COUNTS_SQL,
        "supplier_part_stats": _dec().SUPPLIER_PART_STATS_SQL,
        "volume_shipping": _dec().VOLUME_SHIPPING_SQL,
        "top_returned_customers": _dec().TOP_RETURNED_CUSTOMERS_SQL,
        "props_k_stats": _dec().PROPS_K_STATS_SQL,
        "product_type_profit": _dec().PRODUCT_TYPE_PROFIT_SQL,
        "linestatus_priority_counts": _dec().LINESTATUS_PRIORITY_COUNTS_SQL,
        "part_pairs_topk": _dec().PART_PAIRS_TOPK_SQL,
        "decayed_part_popularity": _dec().DECAYED_PART_POPULARITY_SQL,
        "value_hour_corr": _dec().VALUE_HOUR_CORR_SQL,
        "event_value_regression": _dec().EVENT_VALUE_REGRESSION_SQL,
        "user_value_moving_avg": _dec().USER_VALUE_MOVING_AVG_SQL,
        "customer_order_ranks": _dec().CUSTOMER_ORDER_RANKS_SQL,
        "degree_assortativity": _dec().DEGREE_ASSORTATIVITY_SQL,
        "part_jaccard_topk": _dec().PART_JACCARD_TOPK_SQL,
        "adamic_adar_topk": _dec().ADAMIC_ADAR_TOPK_SQL,
        "urgent_year_revenue": _dec().URGENT_YEAR_REVENUE_SQL,
        "important_parts": _rep().IMPORTANT_PARTS_SQL,
        "top_suppliers": _rep().TOP_SUPPLIERS_SQL,
        "disjunctive_revenue": _rep().DISJUNCTIVE_REVENUE_SQL,
        "cheapest_supplier_per_part": _rep().CHEAPEST_SUPPLIER_PER_PART_SQL,
        "dominant_suppliers": _rep().DOMINANT_SUPPLIERS_SQL,
        "market_share": _rep().MARKET_SHARE_SQL,
        "top_brand_by_nation": _rep().TOP_BRAND_BY_NATION_SQL,
        "nation_supplier_hhi": _rep().NATION_SUPPLIER_HHI_SQL,
        "median_order_gap": _rep().MEDIAN_ORDER_GAP_SQL,
        "forecast_revenue": _rep().FORECAST_REVENUE_SQL,
        "event_value_p90": _an().EVENT_VALUE_P90_SQL,
        "event_value_outliers": _an().EVENT_VALUE_OUTLIERS_SQL,
        "event_value_percent_rank": _an().EVENT_VALUE_PERCENT_RANK_SQL,
        "sole_supplier_orders": _rep().SOLE_SUPPLIER_ORDERS_SQL,
        "weighted_median_price": _rep().WEIGHTED_MEDIAN_PRICE_SQL,
        "out_degree": (
            "SELECT l_orderkey AS src, COUNT(*) AS outdeg "
            "FROM lineitem GROUP BY l_orderkey"
        ),
        "in_degree": (
            "SELECT l_partkey AS dst, COUNT(*) AS indeg "
            "FROM lineitem GROUP BY l_partkey"
        ),
        "edge_weights": (
            "WITH e AS (SELECT l_orderkey AS src, l_partkey AS dst, "
            "COUNT(*) AS mult FROM lineitem GROUP BY 1, 2), "
            "d AS (SELECT src, CAST(SUM(mult) AS BIGINT) AS outdeg FROM e GROUP BY src) "
            "SELECT e.src, e.dst, e.mult, CAST(e.mult AS DOUBLE)/d.outdeg AS w "
            "FROM e JOIN d ON e.src = d.src"
        ),
        "degree_histogram": (
            "WITH d AS (SELECT l_orderkey AS src, COUNT(*) AS outdeg "
            "FROM lineitem GROUP BY 1) "
            "SELECT outdeg, CAST(COUNT(*) AS BIGINT) AS n_vertices "
            "FROM d GROUP BY outdeg"
        ),
        "edge_reciprocity": _pl().EDGE_RECIPROCITY_SQL,
        "two_hop_neighbors": _pl().TWO_HOP_NEIGHBORS_SQL,
        "common_neighbors": _pl().COMMON_NEIGHBORS_SQL,
        "neighbor_sample_2hop": _neighbor_sample_sql(),
        "square_count": _pl().SQUARE_COUNT_SQL,
        "bipartite_conflict": _BIPARTITE_CONFLICT_SQL,
        "ppr_push": _push().PPR_PUSH_SQL,
        "simrank2_topk": _simrank().SIMRANK2_TOPK_SQL,
        "hierarchy_rollup": _an().HIERARCHY_ROLLUP_SQL,
        "zonemap_prune_stats": _an().ZONEMAP_PRUNE_SQL,
        "adamic_adar": _pl().ADAMIC_ADAR_SQL,
        "disparity_backbone": _pl().DISPARITY_BACKBONE_SQL,
        "degree_discount_seeds": _pl().DEGREE_DISCOUNT_SQL,
        "node_features": _pl().NODE_FEATURES_SQL,
        "hll_ball_registers": _hll_ball_registers_sql(),
        "subgraph_sample_curve": _subgraph_sample_sql_wired(),
        "frequent_triples": _pl().FREQUENT_TRIPLES_SQL,
        "seeded_label_spread": _pl().SEEDED_LABEL_SQL,
        "rendezvous_shards": _rendezvous_sql_wired(),
        "attack_robustness": _attack_robustness_sql(),
        "random_failure_robustness": _random_failure_sql(),
        "joint_degree_matrix": _JOINT_DEGREE_SQL,
        "widest_path_from_seed": _widest_path_sql(),
        "host_quotient_edges": _HOST_QUOTIENT_SQL,
        "host_pagerank_2iter": _HOST_PAGERANK_2ITER_SQL,
        "mis_vertices": _mis_sql(),
        "graph_coloring": _coloring_sql(),
        "maximal_matching": _maximal_matching_sql(),
        "copurchase_truss": _truss().copurchase_truss_sql(),
        "k_truss_edges": _truss().k_truss_sql(),
        "clique_census": _truss().CLIQUE_CENSUS_SQL,
        "densest_subgraph": _truss().densest_subgraph_sql(),
        "truss_numbers": _truss().truss_numbers_sql(),
        "mst_edges": _mst_sql_wired(),
        "random_walks": _random_walks_sql(_pl().RW_STEPS),
        "walk_visit_counts": (
            f"SELECT vertex, CAST(COUNT(*) AS BIGINT) AS visits "
            f"FROM ({_random_walks_sql(_pl().RW_STEPS)}) GROUP BY vertex"
        ),
        "edge_support": _truss().EDGE_SUPPORT_SQL,
        "temporal_wedges": _truss().TEMPORAL_WEDGES_SQL,
        "graph_coarsen": _graph_coarsen_sql(),
        "edge_jaccard": _truss().EDGE_JACCARD_SQL,
        "rich_club": _truss().RICH_CLUB_SQL,
        "knn_degree_curve": _truss().KNN_DEGREE_CURVE_SQL,
        "degree_centralization": _truss().DEGREE_CENTRALIZATION_SQL,
        # k_truss_edges: fixpoint peel — not single-SQL-expressible; rows-only
        # (exact networkx parity in tests/test_truss.py)
        "fuzzy_name_pairs": _tx().FUZZY_NAME_PAIRS_SQL,
        "distinct_vertex_count": (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ({_VERTS})"
        ),
        "dangling_vertices": (
            f"WITH v AS ({_VERTS}), "
            "s AS (SELECT DISTINCT l_orderkey AS src FROM lineitem) "
            "SELECT v.v FROM v LEFT JOIN s ON v.v = s.src WHERE s.src IS NULL"
        ),
        "hot_targets": (
            "SELECT l_partkey AS dst, COUNT(*) AS indeg FROM lineitem "
            "GROUP BY l_partkey HAVING COUNT(*) >= 40"
        ),
        "filter_ratio_kept_edges": (
            "WITH ind AS (SELECT l_partkey AS dst, COUNT(*) AS indeg "
            "FROM lineitem GROUP BY 1), "
            f"n AS (SELECT COUNT(*) AS n FROM ({_VERTS})) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS kept_edges FROM lineitem l "
            "JOIN ind ON l.l_partkey = ind.dst "
            "WHERE ind.indeg < 0.002 * (SELECT n FROM n)"
        ),
        "top_customers": (
            "SELECT c_custkey, c_name, c_acctbal FROM customer "
            "ORDER BY c_acctbal DESC, c_custkey LIMIT 10"
        ),
        "regex_filter_docs": (
            "SELECT doc_id FROM documents "
            "WHERE NOT regexp_matches(text, '.*((/$)|(/.*/)).*')"
        ),
        "query_filter_docs": (
            "SELECT doc_id FROM documents "
            "WHERE contains(text, 'scan') AND NOT contains(text, 'join')"
        ),
        "docs_exact_dedup": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "docs_normalized_dedup": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY "
            "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
        ),
        "docs_redact": _pl().DOCS_REDACT_SQL,
        "docs_hash_sample": _hash_sample_sql(),
        "term_doc_freq": _terms().TERM_DOC_FREQ_SQL,
        "tfidf_top_terms": _terms().TFIDF_TOP_TERMS_SQL,
        "inverted_index": _terms().INVERTED_INDEX_SQL,
        "top_bigrams": _terms().TOP_BIGRAMS_SQL,
        "windowed_cooccurrence": _terms().WINDOWED_COOCCURRENCE_SQL,
        "keyword_contexts": _terms().KEYWORD_CONTEXTS_SQL,
        "bigram_pmi": _terms().BIGRAM_PMI_SQL,
        "doc_unigram_rarity": _terms().DOC_UNIGRAM_RARITY_SQL,
        "duplicate_ngram_fraction": _terms().DUPLICATE_NGRAM_FRACTION_SQL,
        "span_dedup_stats": _terms().SPAN_DEDUP_STATS_SQL,
        "ngram_novelty": _terms().NGRAM_NOVELTY_SQL,
        "bpe_merges": _terms().BPE_MERGES_SQL,
        "doc_repetition": _terms().DOC_REPETITION_SQL,
        "doc_char_entropy": _terms().DOC_CHAR_ENTROPY_SQL,
        "source_unigram_kl": _terms().SOURCE_UNIGRAM_KL_SQL,
        "contamination_ngram": _terms().CONTAMINATION_NGRAM_SQL,
        "cross_source_ngram_overlap": _terms().CROSS_SOURCE_NGRAM_OVERLAP_SQL,
        "doc_quality": _doc_quality_sql(),
        "lang_confusion": (
            f"WITH q AS ({_doc_quality_sql()})\n"
            "SELECT d.lang, q.lang_pred, CAST(COUNT(*) AS BIGINT) AS n\n"
            "FROM documents d JOIN q USING (doc_id) GROUP BY 1, 2"
        ),
        "ngram_jaccard_pairs": _NGRAM_JACCARD_SQL,
        "purchase_signup_asof": (
            "WITH p AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase'), "
            "s AS (SELECT user_id, ts, max(event_id) AS signup_event_id "
            "FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) "
            "SELECT p.event_id, p.user_id, s.signup_event_id, "
            "CAST(date_diff('microsecond', s.ts, p.ts) AS BIGINT) AS gap_us "
            "FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts"
        ),
        "purchase_click_window": (
            "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us "
            "FROM events WHERE event_type = 'purchase'), "
            "c AS (SELECT event_id AS click_event_id, user_id, "
            "epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') "
            "SELECT p.event_id, p.user_id, c.click_event_id, "
            "CAST(p.ts_us - c.ts_us AS BIGINT) AS gap_us "
            "FROM p JOIN c ON p.user_id = c.user_id "
            "AND c.ts_us BETWEEN p.ts_us - 86400000000 AND p.ts_us"
        ),
        "token_counts": (
            "SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT) "
            "AS ws_tokens FROM documents"
        ),
        "event_transitions": (
            "WITH o AS (SELECT user_id, event_type, "
            "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS next_type FROM events) "
            "SELECT user_id, event_type AS from_type, next_type AS to_type, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM o "
            "WHERE next_type IS NOT NULL GROUP BY 1, 2, 3"
        ),
        "event_window_counts": (
            "SELECT date_trunc('day', ts) AS win, event_type, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2"
        ),
        "events_prior_hour_counts": (
            "SELECT a.event_id, a.user_id, CAST(COUNT(*) AS BIGINT) AS prior_cnt "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND epoch_us(b.ts) >= epoch_us(a.ts) - 3600000000 "
            "AND epoch_us(b.ts) < epoch_us(a.ts) "
            "GROUP BY 1, 2"
        ),
        "hopping_event_counts": _pl().HOPPING_EVENT_COUNTS_SQL,
        "watermark_late_events": _watermark_late_sql(),
        "frequent_event_types": (
            "SELECT event_type AS value, COUNT(*) AS cnt FROM events "
            "GROUP BY 1 HAVING COUNT(*) >= CEIL(0.125 * "
            "(SELECT COUNT(*) FROM events))"
        ),
        "price_quantiles": (
            "WITH a AS (SELECT quantile_disc(l_extendedprice, "
            "[0.125, 0.25, 0.5, 0.75, 0.875]) AS v FROM lineitem) "
            "SELECT unnest([0.125, 0.25, 0.5, 0.75, 0.875]) AS q, "
            "CAST(unnest(v) AS DOUBLE) AS value FROM a"
        ),
        "kmv_distinct_parts": _kmv_sql("l_partkey", "lineitem", 64),
        "bloom_prune_stats": _bloom_prune_sql(),
        "sample_quantile_error": _sample_qerr_sql(),
        "parts_kmv_jaccard": _kmv_jaccard_sql(),
        "hll_distinct_parts": _hll_sql("l_partkey", "lineitem", 12),
        "cms_part_counts": _cms_sql("l_partkey", "lineitem", 256, 4),
        "cms_error_audit": _cms_audit_sql(),
        "distinct_sketch_audit": _distinct_sketch_audit_sql(),
        "ship_lag_histogram": rel.SHIP_LAG_HISTOGRAM_SQL,
        "nation_trade_matrix": rel.NATION_TRADE_MATRIX_SQL,
        "order_lines_histogram": rel.ORDER_LINES_HISTOGRAM_SQL,
        "part_reorder_gaps": rel.PART_REORDER_GAPS_SQL,
        "ams_f2_parts": _ams_f2_sql("l_partkey", "lineitem", 16),
        "embedding_quantize": _annmod().EMBEDDING_QUANTIZE_SQL,
        "mmr_rerank": _annmod().MMR_RERANK_SQL,
        "kcenter_coreset": _annmod().KCENTER_CORESET_SQL,
        "kcenter_assign_inertia": _annmod().KCENTER_ASSIGN_SQL,
        "hard_negative_mining": _annmod().HARD_NEG_SQL,
        "bitq_hamming_topk": _annmod().BITQ_HAMMING_SQL,
        "pq_adc_topk": _annmod().PQ_ADC_SQL,
        "lof_scores": _annmod().LOF_SCORES_SQL,
        "pq_recall": _annmod().PQ_RECALL_SQL,
        "epsilon_neighbors": _annmod().EPSN_SQL,
        "hybrid_rrf_topk": _annmod()._hybrid_rrf_sql(),
        "centroid_classify": _annmod().CENTROID_CLASSIFY_SQL,
        "centroid_confusion": _annmod().CENTROID_CONFUSION_SQL,
        "mutual_knn_pairs": _annmod().MUTUAL_KNN_SQL,
        "knn_graph_components": _knn_cc_sql(),
        "minhash_cluster_labels": _minhash_cluster_sql(),
        "dedup_keeper_quality": _dedup_keeper_sql(),
        "source_quality_profile": _source_quality_sql(),
        "source_dup_rates": _SOURCE_DUP_RATES_SQL,
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            "FROM embeddings WHERE vec_id < 3), "
            "s AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(q.qe AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS cos "
            "FROM q CROSS JOIN embeddings e), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY cos DESC, vec_id) AS rn FROM s) "
            "SELECT query_id, vec_id, ROUND(cos, 4) AS cosine FROM r WHERE rn <= 5"
        ),
        "filtered_ann_topk": (
            "WITH q AS (SELECT vec_id AS query_id, label AS ql, embedding AS qe "
            "FROM embeddings WHERE vec_id < 3), "
            "s AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(q.qe AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS cos "
            "FROM q JOIN embeddings e ON e.label = q.ql), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY cos DESC, vec_id) AS rn FROM s) "
            "SELECT query_id, vec_id, ROUND(cos, 4) AS cosine FROM r WHERE rn <= 5"
        ),
        "hourly_anomalies": """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS tot,
         CAST(SUM(cnt * cnt) AS BIGINT) AS ss
  FROM h
)
SELECT h.hour, h.cnt,
  CAST(CASE WHEN (h.cnt * s.n - s.tot) * (h.cnt * s.n - s.tot)
            > 4 * (s.n * s.ss - s.tot * s.tot)
       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM h, s
""",
        "minhash_sigs_exact": _minhash_sigs_exact_sql(),
        "simhash_sigs_exact": _simhash_sigs_exact_sql(),
        "simhash_exact_pairs": _simhash_exact_pairs_sql(),
        "lsh_band_keys": _lsh_band_keys_sql(),
        "lsh_candidate_jaccard": _lsh_candidate_jaccard_sql(),
        "jaccard_join_pairs": _jaccard_join_sql(),
        "lsh_recall": _lsh_recall_sql(),
        "simhash_recall": _simhash_recall_sql(),
        "pagerank_2iter": _PAGERANK_2ITER_SQL,
        "pagerank_personalized_2iter": _PAGERANK_PPR_2ITER_SQL,
        "spam_mass": _spam_mass_sql(),
        "hits_2iter": _HITS_2ITER_SQL,
        "eigenvector_2iter": _EIGENVECTOR_2ITER_SQL,
        "salsa_authority": _salsa().SALSA_AUTH_SQL,
        "katz_centrality": _KATZ_SQL,
        "pagerank_converged": _PAGERANK_CONV_SQL,
        "connected_components": _CC_SQL,
        "cc_delta_refresh": _cc_delta_sql(),
        "wl_refinement": _wl_sql(),
        "dsir_weights": _dsir_sql(),
        "shared_ngram_lengths": _shared_ngram_sql(),
        "table_fingerprint": _table_fpr_sql(),
        "partition_profile": _partition_profile_sql(),
        "value_ecdf": _VALUE_ECDF_SQL,
        "component_count": _COMPONENT_COUNT_SQL,
        "component_size_histogram": _COMPONENT_SIZE_HIST_SQL,
        "bfs_depths": _BFS_SQL,
        "descendant_depths": _DESCENDANT_SQL,
        "shortest_path_counts": _PATH_COUNTS_SQL,
        "landmark_assignment": _LANDMARK_SQL,
        "sssp_dists": _SSSP_SQL,
        "strongly_connected_components": _SCC_SQL,
        "bowtie_profile": _BOWTIE_SQL,
        "scc_condensation_edges": _SCC_CONDENSATION_SQL,
        "seed_closeness": _SEED_CLOSENESS_SQL,
        "harmonic_centrality": _HARMONIC_SQL,
        "seed_distance_histogram": _SEED_DIST_HIST_SQL,
        "graph_diameter": _GRAPH_DIAMETER_SQL,
        "kcore_vertices": _KCORE_SQL,
        "core_numbers": _core_numbers_sql(),
        "pack_sequences": _packmod().PACK_SEQUENCES_SQL,
        "length_curriculum": _packmod().LENGTH_CURRICULUM_SQL,
        "packed_sequence_stats": _packmod().PACKED_SEQUENCE_STATS_SQL,
        "shuffle_order": _shuffle_order_sql(),
        "mixture_sample": _mixture_sample_sql(),
        "dataset_split": _dataset_split_sql(),
        "corpus_prep_stats": _corpus_prep_sql(),
        "doc_chunks": _packmod().DOC_CHUNKS_SQL,
        "bigram_lm_perplexity": _bigram_lm_sql(),
        "kn_bigram_score": _kn_bigram_sql(),
        "triangle_count": (
            "WITH raw AS (SELECT l_suppkey AS a, l_partkey % 100 AS b FROM lineitem), "
            "und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v "
            "FROM raw WHERE a <> b) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS triangles "
            "FROM und e1 JOIN und e2 ON e2.u = e1.v "
            "JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v"
        ),
    }
