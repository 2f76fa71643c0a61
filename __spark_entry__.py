"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY §2 operator pack for
the DuckDB-oracle correctness gate (see
bohemia_kenya_data_pipeline_spark/queries.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bohemia_kenya_data_pipeline_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the goals-cascade warehouse build
    (00.store_se_goals.R shape — skeleton cross-join + fill-down +
    anti-joins + distinct rollup). Defaults to sf0.001 per the smoke
    contract; honors SPARK_GRAFT_SF_DIR."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return QUERIES["goals_cascade"](spark, sf_dir)


# Every name the driver's 50-entry panel has already verified
# (CORRECTNESS_r01..r10 all sampled the first 50 registrations).
# Rotating the iteration order below puts NOT-YET-DRIVER-CHECKED
# entries at the front, so each round's panel verifies a fresh slice
# of the 275-entry oracled surface (VERDICT r10 "driver panel
# breadth") — the full surface stays gate-checked in-repo either way.
_PANEL_SEEN = frozenset({
    "asof_weekly_snapshots", "case_when_chain", "collect_array_sorted",
    "conditional_count_distinct", "count_distinct_approx",
    "count_distinct_exact", "cross_join_scaffold", "distinct_pairs",
    "exact_duplicates", "explode_uncount", "filter_project",
    "freq_table_grand_total", "group_count", "group_window_count_filter",
    "grouped_bool_all", "join_anti_unmatched", "join_full_outer_merge",
    "join_inner_fact_dim", "join_left_broadcast_dim", "join_multi_key",
    "join_right_keep_dim", "join_self_pairs", "join_semi_matched",
    "json_extract_props", "latest_order_per_customer", "melt_unpivot",
    "minhash_lsh_pairs", "minhash_lsh_pairs_capped", "minhash_signatures",
    "neardup_components", "ngram_jaccard_verify", "pivot_status_by_month",
    "pricing_summary", "ratio_post_agg", "scalar_date_pack",
    "scalar_math_pack", "scalar_string_pack", "sessionize_events",
    "sort_limit_topk", "split_explode_multiselect", "streaming_sessionize",
    "streaming_window_counts", "string_agg_sorted", "summarise_all_numeric",
    "union_ragged", "window_cumsum", "window_fill_down", "window_lag_delta",
    "window_row_number", "window_top_n_per_group",
    # r11 panel (CORRECTNESS_r11.json): the 49 green rows; the one red
    # row (bm25_search_topk) is deliberately NOT seen — it re-leads the
    # r12 panel as a retried entry after its rank-only contract fix
    "ann_index_delete_compact", "ann_ivfpq_rerank_fixedq",
    "anomalies_pk_pack", "bitmap_user_overlap", "bloom_pruned_join",
    "cdc_log_compaction", "chisq_segment_region", "detect_language",
    "drop_na_keys", "dsir_importance_sample", "duplicate_spans",
    "embedding_drift_by_label", "fuzzy_pairs_edit1", "goals_cascade",
    "grouped_mode", "incremental_dedup", "incremental_minhash_dedup",
    "ivf_ann_fixedq_arrow", "ivm_join_view", "k_anonymity_audit",
    "kfold_assign", "length_bucketed_batches", "line_dedup_corpus",
    "lsh_topk", "numeric_profile", "pack_sequences",
    "pagerank_trade_graph", "price_histogram", "quality_classifier_score",
    "quantized_fixedq_arrow", "retention_cohorts", "safety_status_matrix",
    "salted_group_agg", "scd2_as_of", "sequence_pattern_match",
    "snapshot_diff_customers", "spatial_nearest_hf_bucketed",
    "substring_dedup_apply", "token_budget_take", "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts", "tpch_q19_disjunctive_revenue",
    "tpch_q5_local_supplier_volume", "tpch_q9_product_profit",
    "trailing_window_7d", "unigram_logprob", "vocabulary_top",
    "weighted_median_price", "zorder_manifest_scan",
    # r12 panel (CORRECTNESS_r12.json): the 49 green rows; the one red
    # row (orc_roundtrip_docs) is deliberately NOT seen — it re-leads
    # the r13 panel as a retried entry after the scratch-dir lifecycle
    # fix (unique-per-build dirs + eager pin, queries._fresh_tmp_path)
    "ann_index_stats", "ann_ivfpq_fixedq", "anomalies_summary",
    "audio_spectral_features", "bitmap_distinct_rollup", "bm25_search_topk",
    "budget_allocation_largest_remainder", "corr_covar_rollup",
    "cosine_topk", "curation_release_e2e", "data_dictionary_customer",
    "embedding_centroids", "ento_species_unpivot",
    "goals_cascade_deep", "hard_negatives_composed", "image_pixel_stats",
    "ivf_ann_fixedq", "jsd_lang_drift", "lab_reconciliation_asof",
    "lead_time_sla", "minhash_index_band_stats", "mmr_rerank_fixedq",
    "nearest_centroid_confusion", "percent_rank_price",
    "perplexity_buckets", "pii_scrub", "pq_topk",
    "quantile_gate_by_source", "resize_pixel_stats",
    "resolution_delete_set", "resolution_expand", "revenue_gini",
    "rfm_segments_scalable", "salted_join_agg", "scd2_merge",
    "seasonality_dow_profile", "semantic_dedup_capped",
    "spatial_cluster_assign", "streaming_interval_join_left",
    "tfidf_top_terms", "time_weighted_avg", "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_customer", "train_test_split",
    "weighted_sample_docs", "zorder_fold_scan",
    # r13 panel (CORRECTNESS_r13.json): the 49 green rows; the one red
    # row (orc_roundtrip_docs) is deliberately NOT seen — it re-leads
    # the r14 panel as a retried entry after its HUGEINT oracle fix
    # (uncast DuckDB SUM materializes as float64 at the driver vs
    # Spark BIGINT; now CAST(... AS BIGINT) — the actual root cause)
    "ab_test_proportions", "activity_streaks",
    "anomalies_inconsistent_group", "argmax_order_per_priority",
    "array_hof_pack", "chunk_documents", "cms_user_counts",
    "corr_covar_rollup", "cube_sales_matrix", "dedup_within_gap",
    "embedding_quantize_error", "event_disorder_profile",
    "group_ols_trend", "hierarchy_closure", "icf_verification_metrics",
    "incremental_ivfpq_ann", "incremental_manifest_extend",
    "interval_union_time", "kaplan_meier_churn", "mad_outlier_filter",
    "manifest_skip_scan", "multimodal_features", "ngram_contamination",
    "ntile_price_quartiles", "pagerank_trade_graph",
    "pharmacy_ledger_reconciliation", "pk_visit_matrix", "pretrain_mix",
    "pretrain_mix_spans", "prevalence_incidence_report",
    "price_percentiles", "quantile_sketch_prices", "rdt_incidence_rates",
    "rdt_irr", "rdt_state_machine", "resample_audio_stats",
    "rolling_distinct_users", "semantic_decontamination",
    "spatial_cluster_assign_bucketed", "streaming_dedup_pairs",
    "streaming_enrich_join", "streaming_interval_join",
    "streaming_session_window", "temperature_mix_sample", "token_counts",
    "tpch_q12_late_shipments", "tpch_q20_part_promotion_suppliers",
    "triangle_count_trade", "winsorize_prices",
    # r14 panel (CORRECTNESS_r14.json): all 50 rows green, including
    # the three retried HUGEINT-cast fixes (orc/jsonl roundtrips,
    # hybrid_rank_fusion) — verified, so they rotate out of the front
    "ann_index_delete_probe", "ann_index_retrain", "anomalies_detection",
    "anomalies_efficacy_pack", "anomalies_safetynew_pack",
    "anomalies_v0_pack", "corpus_curation", "coverage_vs_target",
    "dau_mau_stickiness", "dense_rank_ties", "domain_cap_sample",
    "efficacy_status_matrix", "embedding_neardup",
    "embedding_validation_gate", "expectations_orders",
    "gopher_quality_gate", "grouping_sets_sales",
    "household_size_distribution", "hybrid_rank_fusion",
    "incremental_zorder_scan", "ivf_topk", "jsonl_roundtrip_docs",
    "khop_trade_reach", "ntile_price_quartiles_scalable",
    "orc_roundtrip_docs", "pharmacy_stock_unpivot", "pit_feature_join",
    "psi_price_drift", "psi_price_drift_quantile",
    "quantile_sketch_by_priority", "quantized_cosine_topk",
    "quantized_fixedq", "quarantine_ingest", "repetition_features",
    "resolution_repeat_cascade", "rfm_segments", "semantic_dedup_pairs",
    "simhash_neardup_capped", "split_no_leakage",
    "table_checksum_reconcile", "text_normalize",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q13_order_count_distribution", "tpch_q22_global_sales_opportunity",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "zipf_vocabulary_fit",
})
_ROTATION_SALT = "r15"  # bump per round to rotate the fresh slice

#: entries whose hashed contract (or execution lifecycle) CHANGED this
#: round — pinned to the very front of the panel so the driver
#: re-verifies them rather than trusting rows recorded against behavior
#: that no longer exists. Each pin takes one of the 50 panel slots from
#: the fresh rotation, so keep the set small.
_PANEL_RETRY = frozenset({
    # r15 (optimization round 2): execution-lifecycle changes only —
    # values proven identical by the local gate, pinned here so the
    # driver re-verifies them under the new plans. The r14 HUGEINT
    # retries (orc/jsonl roundtrips, hybrid_rank_fusion) verified green
    # in CORRECTNESS_r14.json and rotated into _PANEL_SEEN.
    "spatial_nearest_hf_bucketed",  # per-level leftover pinning
    "lakehouse_cdc_e2e",            # batch-chain op fusion
    "semantic_dedup_pairs",         # conditional probe-side spread
})


def _panel_order(name: str) -> tuple:
    import hashlib

    # retried fixes first, then fresh oracled entries (deterministically
    # shuffled by the round salt), already-verified and rows-only after.
    # Cost note (VERDICT r11 ask 7): one md5 per registered name, run
    # once when queries() sorts at driver startup — ~300 hashes of
    # ~30-byte strings, microseconds total; not worth caching.
    return (
        name not in _PANEL_RETRY,
        name in _PANEL_SEEN or name not in ORACLES,
        hashlib.md5(f"{name}|{_ROTATION_SALT}".encode()).hexdigest(),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, fresh
    not-yet-driver-checked entries leading (see ``_panel_order``)."""
    return {n: QUERIES[n] for n in sorted(QUERIES, key=_panel_order)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(ORACLES)
