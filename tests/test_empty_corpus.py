"""Empty-input robustness: curation operators on a zero-row corpus.

ADVICE r4 found a latent empty-payload bug (mm_frame_sample dropped
empty docs instead of emitting zero counts). This suite pins the whole
class: every scalar/aggregation-shaped LLM operator must execute on an
EMPTY documents/embeddings corpus and return an empty (or all-zero)
result — never raise. Iterative model-fitting operators (k-means, BPE,
LogisticRegression) are intentionally excluded: fitting a model on zero
rows is a caller error, and their docstrings say so.
"""

from __future__ import annotations

import os

import pytest

from avro_topic_replication_spark.queries import all_queries

QS = all_queries()

# Operators whose semantics are well-defined on an empty corpus.
EMPTY_SAFE = [
    "text_tokenize_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_shingle_stats",
    "text_tfidf",
    "text_pii_redaction",
    "text_bpe_token_count",
    "text_repetition_metrics",
    "text_rare_token_ratio",
    "text_boilerplate_coverage",
    "text_lm_perplexity",
    "dedup_exact",
    "dedup_exact_keep_first",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_incremental_batch",
    "dedup_contamination_check",
    "dedup_span_rewrite",
    "sample_hash_fraction",
    "sample_stratified_rates",
    "split_train_val_test",
    "sample_token_budget",
    "pack_sequences_chunks",
    "shuffle_shard_assign",
    "sample_language_temperature",
    "pipeline_corpus_curation",
    "pipeline_filter_funnel",
    "vec_norms",
    "vec_random_projection",
    "vec_quantize_int8",
    "vec_cosine_pairs_exact",
    "events_cohort_retention",
    "events_markov_transitions",
    "events_time_to_convert",
    "events_rfm_segmentation",
    "events_funnel_conversion",
    "agg_entropy",
    "agg_regression",
    "text_langid_eval",
    "fn_try_arithmetic",
    "graph_pagerank_suppliers",
    "agg_winsorized_mean",
    "events_activity_streaks",
    "sql_session_variables",
    # r6 extension (VERDICT item 6): the vector + multimodal legs and the
    # MinHash band path. k-means-fitted ANN ops (vec_ivf_search,
    # vec_kmeans, vec_ann_recall, dedup_semantic_prune) stay excluded —
    # fitting centroids on zero vectors is a caller error by docstring.
    "vec_knn_query",
    "vec_two_stage_rerank",
    "vec_label_centroid_classify",
    "vec_lsh_pairs",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ml_minhash_join",
    "dedup_clusters",
    "dedup_cluster_representatives",
    "mm_binary_metadata",
    "mm_decode_features",
    "mm_resize_batch",
    "mm_frame_sample",
    "mm_audio_features",
    "mm_audio_downsample",
    "mm_video_frame_stats",
    "mm_frame_dedup",
    # r6 additions (vec_pq_adc_search excluded: codebook fitting on zero
    # vectors is a caller error, like the other fitted operators)
    "events_sessionize_batch",
    "sample_domain_mixture",
    "dedup_line_rewrite",
    "dedup_url_canonical",
    "fn_url_parse",
    "fn_aes_roundtrip",
    "agg_bitmap_distinct",
    "text_collocations_pmi",
    "agg_mode_deterministic",
    "fn_datetime_make",
    "events_pattern_regex",
    "events_attribution_last_touch",
    "events_dau_wau_mau",
    # r6 analytics_ext family: graph metrics on an edgeless graph, folds
    # over zero series, gates/chunkers over zero docs, overlap join over
    # zero orders. (stat_crosstab excluded: its result schema is derived
    # from the data's value domain, so a zero-row input legitimately
    # yields a schema-less 1-column frame.)
    "graph_degree_stats",
    "graph_triangle_count",
    "graph_clustering_coefficient",
    "ts_ewma_per_user",
    "ts_holt_linear",
    "ts_zscore_anomaly",
    "ts_mad_anomaly",
    "text_gopher_quality_gate",
    "rag_chunk_overlap",
    "join_interval_overlap",
    "sample_weighted_priority",
    "graph_label_propagation",
    "ts_cusum_drift",
    "ts_seasonal_baseline",
    "events_ab_test_lift",
    "ts_autocorrelation",
    "sql_pivot_clause",
    "sql_distribute_sort_by",
    "text_keyword_topk",
    "vec_mmr_diversify",
    "ts_max_drawdown",
    "graph_kcore",
    "replication_dlq_routing",
    "agg_approx_top_k",
    "agg_multiple_regression",
    "join_asof_tolerance",
    # r6 analytics_ext2 family: hamming ANN with no query row, listagg /
    # null-safe join / union over zero dims, interpolation and path
    # mining over zero events.
    "vec_hamming_topk",
    "agg_listagg_top_names",
    "join_null_safe_eq",
    "setop_union_by_name",
    "ts_linear_interpolate",
    "events_top_paths",
    # (stat_chi2_independence excluded like stat_crosstab: dof is derived
    # from the data's value domain, so an empty input yields dof=(0-1)² —
    # a caller-error input, not a zero row.)
    "events_inter_arrival_stats",
    "vec_matryoshka_recall",
    "source_parquet_merge_schema",
    "stream_dynamic_session_window",
    "text_char_entropy",
    "agg_incremental_refresh",
    "sql_cache_table",
    # r6 analytics_ext3 family: statistical tests / power means over zero
    # rows (1-row null result), medians and n-gram tops over zero
    # docs/events (0 rows), graph projections over an edgeless bipartite
    # graph, the OCF source over a zero-file export, and the pair-distance
    # profile over zero vectors.
    "stat_welch_ttest",
    "agg_generalized_means",
    "agg_weighted_median",
    "ts_rolling_median",
    "text_ngram_topk",
    "text_zipf_fit",
    "graph_bipartite_copurchase",
    "graph_common_neighbors",
    "source_avro_container",
    "sql_order_by_all",
    "vec_pair_distance_histogram",
    "stat_ks_test",
    "text_readability",
    "text_length_gini",
    "stat_bootstrap_poisson_ci",
    "events_cumulative_users",
    "ts_hampel_outliers",
    "sql_unpivot_clause",
    "events_dow_hour_heatmap",
    "mm_image_phash_dedup",
    "stat_benford_law",
    "cdc_snapshot_diff",
    "mba_association_rules",
    "profile_table_columns",
    "dq_expectations",
    "pareto_frontier_parts",
    "stat_mannwhitney_u",
    "stat_psi_drift",
    "dq_k_anonymity",
    "sample_weighted_reservoir",
    "stat_theil_sen_trend",
    "events_survival_km",
    "stat_diff_in_diff",
    "stat_qq_deciles",
    "source_time_travel",
    "mm_audio_vad_segments",
    "mm_image_histogram_dedup",
    "stat_cuped_adjusted",
    "ts_snaive_backtest",
    # r8 oracle-checked twins of the engine-native graph/LSH families
    "dedup_minhash_banded",
    "graph_pagerank_fixed_point",
    "graph_labelprop_min_rounds",
    "graph_kcore_peel_rounds",
    "sketch_cms_verified",
    "sketch_bottomk_verified",
    "sketch_hll_verified",
    # r9/r10 oracle twins: unlike the k-means-FITTED production searchers
    # excluded above, the twins seed from hash ranks over the data itself
    # (empty data → no seeds → no probes → empty result, well-defined in
    # both engines), so zero rows is a legitimate input, not a caller
    # error. Their fuzz strategies generate >= 1 row, so this suite is
    # the only zero-row coverage they get.
    "ml_als_fixed_point",
    "ml_kmeans_fixed_point",
    "vec_pq_adc_verified",
    "vec_mmr_fixed_steps",
    "vec_ivf_verified",
    "text_bpe_encode_verified",
    "vec_ann_recall_verified",
]


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    """A testdata dir with the real schemas (taken from the suite's
    sf_dir, so SPARK_GRAFT_TEST_SF_DIR overrides work) and ZERO rows."""
    base = str(tmp_path_factory.mktemp("empty_sf"))
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        spark.read.parquet(src).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"{t}.parquet"))
    return base


# Report-shaped queries emit a fixed spine (e.g. the funnel's stage rows)
# whose identifier columns are non-zero by design; only their COUNT
# columns must be zero/NULL on an empty corpus.
_IDENTIFIER_COLS = {
    "stage", "stage_name", "disposition", "n_replicates",
    # profiler / expectation spines: column and check names are fixed,
    # and every check trivially PASSES (True) on a zero-row table
    "col_name", "check_name", "passed",
    # the Q-Q grid always emits its 9 decile rows; quantiles are NULL
    # on an empty corpus
    "decile",
    # k-core peel accounting always emits its 3 round rows
    "round",
}


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_runs_empty(name, spark, empty_dir):
    df = QS[name].fn(spark, empty_dir)
    rows = df.collect()
    # empty corpus → empty result (or all-zero accounting rows)
    for r in rows:
        d = {k: v for k, v in r.asDict().items() if k not in _IDENTIFIER_COLS}
        assert all(
            v is None or v == 0 or v == 0.0 or v == "" or v == [] or v is False
            for v in d.values()
        ), (name, d)
