"""Query registry: every operator from SURVEY.md §2 as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string over the same
parquet tables. The driver harness (``__spark_entry__.py``) runs both and
compares row count + schema + order-insensitive value hash, so:

- alias every computed column identically in both,
- aggregate doubles through decimal (functions.numeric) for order
  independence,
- never emit a value that depends on non-deterministic order (bare
  first/last, ties in window ORDER BY, limits without a total order).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

REGISTRY: "dict[str, Query]" = {}

_MODULES = (
    "relational",
    "tpch",
    "aggregates",
    "windows",
    "setops",
    "scalar_funcs",
    "llm_text",
    "llm_dedup",
    "llm_vectors",
    "llm_multimodal",
    "llm_sampling",
    "llm_curation",
    "llm_scoring",
    "engine4",
    "udfs",
    "streaming_batch",
    "replication_pipeline",
    "sources_sinks",
    "analytics_ext",
    "analytics_ext2",
    "analytics_ext3",
    "analytics_ext4",
    "analytics_ext5",
)

# Presentation order for the registry. The external correctness harness samples
# a fixed-size (50-row) prefix of the registry each round, so the prefix rotates
# each round to the oracle-bearing queries that have never received a harness
# CORRECTNESS row. ``_DRIVER_SAMPLED`` is the union of the keys of
# CORRECTNESS_r01..r10.json (309 names): every oracle-bearing query in the
# registry except ``vec_ann_recall_verified`` has a green driver row.
#
# r11 STATE (the final rotation): CORRECTNESS_r10.json landed 50/50 green
# (rows+schema+hash), closing out the five r9 twins plus
# text_bpe_encode_verified; those six keys are folded in below and both r10
# "defer-sample" tags are dropped. The r11 window therefore leads with
# vec_ann_recall_verified — the registry's LAST never-sampled oracle-bearing
# query — followed by 49 re-samples in family order. A green r11 row on it
# means every oracle-bearing query in the registry (307/307) is
# driver-green, the project's stated end state. Queries added in r11 or
# later must arrive "defer-sample"-tagged so they cannot displace a pending
# window.
_DRIVER_SAMPLED = frozenset((
    "agg_approx_count_distinct", "agg_arg_minmax", "agg_collect_sorted",
    "agg_conditional", "agg_corr", "agg_count_distinct", "agg_cube",
    "agg_distinct_rows", "agg_grouping_id", "agg_grouping_sets", "agg_minmax",
    "agg_moment_stats", "agg_percentiles", "agg_pivot", "agg_pricing_summary",
    "agg_rollup", "agg_skew_kurtosis", "agg_unpivot", "conditional_expressions",
    "dedup_clusters", "dedup_embedding_cosine", "dedup_exact",
    "dedup_exact_keep_first", "dedup_ngram_jaccard", "dedup_simhash",
    "events_funnel_conversion", "filter_predicates", "flagship_revenue_by_nation",
    "fn_datetime", "fn_explode_posexplode", "fn_hash",
    "fn_hash_spark_native", "fn_json",
    # (fn_array / fn_json_from_json / fn_map / fn_math were held out of the
    #  r1-r8 blocks for the r9 re-enqueue; they are listed in the r9 block
    #  below with their green rows.)
    "fn_string_basic", "fn_string_regex_split", "join_anti", "join_asof_click_view",
    "join_bucketed_colocated", "join_cross", "join_full_outer", "join_left_outer",
    "join_range_bands", "join_right_outer", "join_salted_skew", "join_semi",
    "join_shuffle_hash", "join_theta_ship_after_order", "mm_binary_metadata",
    "mm_decode_features", "mm_frame_sample", "mm_resize_batch",
    "pipeline_corpus_curation", "proj_computed_columns",
    "replication_batch_roundtrip", "replication_evolved_consumer",
    "sample_hash_fraction", "sample_stratified_rates", "setop_except",
    "setop_except_all", "setop_intersect", "setop_intersect_all", "setop_union_all",
    "setop_union_distinct", "sink_parquet_clustered", "sink_parquet_partitioned",
    "sink_upsert_merge", "sort_partition_local", "sort_topk_global",
    "source_binaryfile", "source_csv_roundtrip", "source_json_roundtrip",
    "source_orc_roundtrip", "source_text_lines", "split_train_val_test",
    "sql_cte_text_entry", "sql_exists_subquery", "sql_lateral_topn",
    "sql_scalar_subquery", "stream_dedup_keyed", "stream_session_window",
    "stream_sliding_window", "stream_tumbling_window", "text_bpe_token_count",
    "text_fingerprint", "text_lang_id", "text_langid_eval", "text_pii_redaction",
    "text_quality_score", "text_shingle_stats", "text_tfidf", "text_tokenize_stats",
    "tpch_q10_returned_items", "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer", "tpch_q19_discounted_revenue",
    "tpch_q22_idle_customers", "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "ts_resample_gapfill", "ts_rollup_hierarchy", "udf_apply_in_pandas",
    "udf_grouped_agg_pandas", "udf_pandas_cosine", "udf_scalar_python",
    "udf_udtf_words", "vec_cosine_pairs_exact", "vec_knn_query", "vec_norms",
    "win_distribution", "win_first_last_value", "win_lag_lead", "win_moving_avg",
    "win_range_frame", "win_rank_customers", "win_running_sum", "win_topk_per_group",
    # --- CORRECTNESS_r06.json (50 keys, all green) ---
    "agg_boolean_median", "agg_entropy", "agg_histogram_buckets",
    "agg_histogram_equidepth", "agg_observe_metrics", "agg_regression",
    "agg_winsorized_mean", "dedup_contamination_check", "dedup_incremental_batch",
    "dedup_span_rewrite", "events_activity_streaks", "events_cohort_retention",
    "events_markov_transitions", "events_rfm_segmentation", "events_time_to_convert",
    "fn_collation_lcase", "fn_lateral_column_alias", "fn_variant_json",
    "join_runtime_bloom_filter", "mm_audio_downsample", "mm_audio_features",
    "mm_frame_dedup", "mm_video_frame_stats", "pack_sequences_chunks",
    "pipeline_filter_funnel", "pipeline_pretraining_batch",
    "replication_stream_roundtrip", "sample_language_temperature",
    "sample_token_budget", "shuffle_shard_assign", "sort_global_range",
    "sql_group_by_all_offset", "sql_language_udf", "sql_parameterized_identifier",
    "sql_pipe_syntax", "sql_recursive_month_series", "sql_session_variables",
    "text_boilerplate_coverage", "text_lm_perplexity", "text_repetition_metrics",
    "tpch_q11_important_stock", "tpch_q16_part_supplier_relationship",
    "tpch_q20_potential_promotion", "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier", "tpch_q9_product_type_profit",
    "udf_udtf_table_arg", "vec_label_centroid_classify", "vec_random_projection",
    "win_nth_value",
    # --- CORRECTNESS_r07.json (50 keys, all green) ---
    "agg_bitmap_distinct", "agg_mode_deterministic", "dedup_cluster_representatives",
    "dedup_line_rewrite", "dedup_url_canonical", "events_attribution_last_touch",
    "events_dau_wau_mau", "events_pattern_regex", "events_sessionize_batch",
    "fn_aes_roundtrip", "fn_array_setops", "fn_bitwise", "fn_datetime_extra",
    "fn_datetime_make", "fn_encode_decode", "fn_json_tuple", "fn_map_explode",
    "fn_map_higher_order", "fn_null_semantics", "fn_string_extra", "fn_struct_ops",
    "fn_to_json", "fn_try_arithmetic", "fn_url_parse", "graph_clustering_coefficient",
    "graph_degree_stats", "graph_triangle_count", "join_fuzzy_name_match",
    "rag_chunk_overlap", "replication_dlq_routing", "sample_domain_mixture",
    "sample_reservoir_per_group", "sink_scd2_dimension", "sink_zorder_layout",
    "source_parquet_merge_schema", "source_python_datasource", "source_xml_roundtrip",
    "stat_crosstab", "text_char_entropy", "text_collocations_pmi",
    "text_gopher_quality_gate", "text_rare_token_ratio", "ts_ewma_per_user",
    "ts_zscore_anomaly", "udf_apply_in_arrow", "udf_map_in_arrow", "vec_lsh_pairs",
    "vec_matryoshka_recall", "vec_quantize_int8", "vec_two_stage_rerank",
    # --- CORRECTNESS_r08.json (50 keys, all green) ---
    "agg_approx_top_k", "agg_generalized_means", "agg_incremental_refresh",
    "agg_listagg_top_names", "agg_multiple_regression", "agg_weighted_median",
    "events_ab_test_lift", "events_cumulative_users", "events_dow_hour_heatmap",
    "events_funnel_windowed", "events_inter_arrival_stats", "events_top_paths",
    "graph_bipartite_copurchase", "graph_common_neighbors",
    "join_asof_tolerance", "join_interval_overlap", "join_null_safe_eq",
    "join_scd2_point_in_time", "mm_image_phash_dedup", "sample_weighted_priority",
    "setop_union_by_name", "source_avro_container", "sql_cache_table",
    "sql_distribute_sort_by", "sql_not_in_null_aware", "sql_order_by_all",
    "sql_pivot_clause", "sql_unpivot_clause", "stat_bootstrap_poisson_ci",
    "stat_chi2_independence", "stat_ks_test", "stat_welch_ttest",
    "stream_dynamic_session_window", "text_keyword_topk", "text_length_gini",
    "text_ngram_topk", "text_readability", "text_zipf_fit", "ts_autocorrelation",
    "ts_cusum_drift", "ts_hampel_outliers", "ts_holt_linear",
    "ts_linear_interpolate", "ts_mad_anomaly", "ts_max_drawdown",
    "ts_rolling_median", "ts_seasonal_baseline", "vec_hamming_topk",
    "vec_pair_distance_histogram", "win_time_range_frame",
    # --- CORRECTNESS_r09.json (50 keys, all green) ---
    "cdc_snapshot_diff", "dedup_minhash_banded", "dq_expectations",
    "dq_k_anonymity", "events_survival_km", "fn_array", "fn_json_from_json",
    "fn_map", "fn_math", "graph_kcore_peel_rounds",
    "graph_labelprop_min_rounds", "graph_pagerank_fixed_point",
    "mba_association_rules", "mm_audio_vad_segments",
    "mm_image_histogram_dedup", "pareto_frontier_parts",
    "profile_table_columns", "sample_weighted_reservoir",
    "sketch_bottomk_verified", "sketch_cms_verified", "sketch_hll_verified",
    "source_time_travel", "stat_benford_law", "stat_cuped_adjusted",
    "stat_diff_in_diff", "stat_mannwhitney_u", "stat_psi_drift",
    "stat_qq_deciles", "stat_theil_sen_trend", "ts_snaive_backtest",
    # (The other 20 r9 keys — dedup_contamination_check,
    #  dedup_incremental_batch, dedup_span_rewrite, dedup_url_canonical,
    #  pack_sequences_chunks, pipeline_filter_funnel,
    #  pipeline_pretraining_batch, replication_* ×4, sample_language_
    #  temperature, sample_token_budget, shuffle_shard_assign,
    #  sql_recursive_month_series, text_boilerplate_coverage,
    #  text_lm_perplexity, text_repetition_metrics,
    #  vec_label_centroid_classify, vec_random_projection — were re-sample
    #  slack already present in the r6-r8 blocks above.)
    # --- CORRECTNESS_r10.json (50 keys, all green; the 6 first-sampled) ---
    "ml_als_fixed_point", "ml_kmeans_fixed_point", "text_bpe_encode_verified",
    "vec_ivf_verified", "vec_mmr_fixed_steps", "vec_pq_adc_verified",
    # (the other 44 r10 keys were re-samples already present above.)
))
_FAMILY_ORDER = (
    "replication_pipeline",
    "llm_curation",
    "llm_scoring",
    "engine4",
    "streaming_batch",
    "tpch",
    "llm_multimodal",
    "aggregates",
    "windows",
    "scalar_funcs",
    "sources_sinks",
    "llm_text",
    "llm_dedup",
    "llm_vectors",
    "llm_sampling",
    "udfs",
    "relational",
    "setops",
)

_loaded = False


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if isinstance(tags, str):
            # tags=("stats") is a parenthesized str, not a 1-tuple; tuple()
            # would silently explode it into character tags.
            raise TypeError(f"{name}: tags must be a tuple, got str {tags!r}")
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> "dict[str, Query]":
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(f"{__name__}.{mod}")
        _ordered = _presentation_order(REGISTRY)
        REGISTRY.clear()
        REGISTRY.update(_ordered)
        _loaded = True
    return REGISTRY


def _presentation_order(registry: "dict[str, Query]") -> "dict[str, Query]":
    reg_index = {name: i for i, name in enumerate(registry)}
    prefix = f"{__name__}."
    family_rank = {m: i for i, m in enumerate(_FAMILY_ORDER)}

    def key(item: "tuple[str, Query]"):
        name, q = item
        family = q.fn.__module__.removeprefix(prefix)
        return (
            q.oracle is None,  # oracle-bearing first
            # Backlog first: oracle queries that already have a driver
            # CORRECTNESS row (union r1-r6) sort after the never-sampled
            # set, as do brand-new additions tagged "defer-sample"
            # (they must not displace the backlog from the 50-row window).
            name in _DRIVER_SAMPLED or "defer-sample" in q.tags,
            family_rank.get(family, len(family_rank)),
            reg_index[name],
        )

    return dict(sorted(registry.items(), key=key))
