"""Operator registrations (SURVEY §2). Importing this package registers
every implemented query + oracle into the registry, then applies the
driver-window rotation via ``registry.promote``.

THE ROTATION IS AN EXPLICIT KEY LIST, NOT IMPORT ORDER: the driver's
correctness harness samples the FIRST 50 keys in ``queries()`` order
each round. Rounds 1-9 drove 370 unique keys to driver-recorded
green with zero failures; the promote() call below front-loads the
round-10 window: R12_NEW — the 30 late-round-9 keys that are the
only ones with no driver CORRECTNESS row — plus R13_NEW (round-10
additions) filling the 20 spare slots. tests/test_inventory.py
enforces window freshness mechanically from the recorded
CORRECTNESS_r*.json files.
"""

from etl_ch_destination_spark import registry
from etl_ch_destination_spark.queries import (  # noqa: F401
    aggregations,
    aggregations_ch,
    behavior,
    graph,
    joins,
    joins_extra,
    llm_corpus,
    llm_dedup_extra,
    llm_filters,
    llm_text,
    llm_training,
    llm_vectors,  # must precede reports_behavior (rpt_dedup_audit composes its oracle)
    projection,
    reports,
    reports_behavior,
    reports_supply,
    scalars_binary,
    scalars_complex,
    scalars_date,
    scalars_math,
    scalars_string,
    scd,
    setops,
    sorts,
    sources_sinks,
    streaming_batch,
    timeseries,
    timeseries_extra,
    udfs,
    windows,
    windows_extra,
)

# Round-6 driver window: 50 keys with no row in CORRECTNESS_r01..r05.
# 47 carry full hash oracles; llm_sim_topk_ann / llm_sim_topk_ivf /
# agg_heavy_hitters_cms are rows-only by design (recall/bound pytest
# gates instead).
R6_WINDOW = [
    "join_interval_bins", "subq_correlated", "join_null_safe",
    "dict_get_lookup",
    "agg_uniq_upto", "agg_topk_weighted", "agg_delta_sum", "agg_linreg",
    "agg_bounding_ratio", "agg_entropy_gini", "agg_avg_weighted",
    "agg_max_intersections", "agg_sequence_count", "agg_top_bottom_k",
    "agg_cramers_v", "agg_group_bit", "agg_interval_length_sum",
    "agg_minmax_map", "agg_bitmap_ops", "agg_quantiles_weighted",
    "agg_skew_kurt", "agg_group_array_moving", "agg_rank_corr",
    "agg_if_combinators", "agg_welch_ttest", "agg_mannwhitney_u",
    "agg_with_totals", "agg_covar_exact", "agg_histogram_log2",
    "agg_student_ttest", "agg_ks_test", "agg_corr_matrix",
    "agg_heavy_hitters_cms",
    "llm_sim_topk_exact", "llm_sim_topk_ann", "llm_sim_topk_ivf",
    "llm_dedup_near", "llm_multimodal_ingest", "llm_multimodal_resize",
    "llm_multimodal_frames",
    "rpt_cohort_retention", "rpt_dedup_audit", "seq_next_node",
    "rpt_peak_concurrency", "rpt_conversion_lag", "rpt_user_paths",
    "rpt_active_users", "rpt_brand_affinity",
    "arr_fill_compact", "ts_ema_dyadic",
]

# Round-7 pre-staged window: the remaining 50 never-driver-sampled keys
# that carry full hash oracles (ts_downsample_lttb was the one rows-only
# key here until round 12 promoted it to a full recursive-CTE hash
# oracle). Rotation for round 7 = move R6_WINDOW behind this block.
R7_WINDOW = [
    "ts_anomaly_mad", "date_business_days", "date_iso_week",
    "ts_autocorr", "date_time_slots", "ts_seasonality_profile",
    "ts_cusum_changepoint", "gen_date_spine", "date_fiscal_calendar",
    "ts_downsample_lttb",
    "llm_word_rarity", "llm_unigram_logprob", "llm_cross_dedup",
    "llm_embedding_quantize", "llm_length_buckets", "llm_eval_split",
    "rpt_training_mixture", "llm_line_dedup", "job_corpus_curate",
    "llm_bigram_lm", "llm_bigram_surprisal", "llm_embedding_outliers",
    "llm_ngram_novelty", "llm_template_detect", "llm_code_detect",
    "llm_vocab_prune",
    "llm_quality_score", "llm_pii_scrub", "llm_dedup_incremental",
    "llm_decontaminate", "llm_sequence_pack", "llm_mixture_sample",
    "llm_repetition_filter", "llm_chunk_overlap",
    "llm_dedup_containment", "llm_fingerprint_winnow",
    "json_struct_ops", "arr_zip_explode", "arr_enumerate_ranks",
    "arr_set_ops", "str_ngram_distance", "arr_sort_by_key",
    "arr_cumsum_scan", "str_multi_search", "set_bag_ops",
    "sort_with_fill", "sample_weighted_hash", "agg_window_funnel_strict",
    "win_ntile", "win_ignore_nulls",
]

# Round-8 tail: the last 5 never-driver-sampled keys of the original
# 275, all rows-only by design (sketch / RNG / replay-gated).
R8_TAIL = [
    "agg_quantile_kll", "llm_bpe_learn", "llm_bpe_encode",
    "llm_compression_ratio", "sample_stratified",
]

# Keys ADDED in round 7 (all fully hash-oracled) — they join R8_TAIL in
# round 8's driver-sample window, so the whole registry reaches
# driver-recorded with a round to spare: 5 + 27 = 32 of the 50 slots.
R8_NEW = [
    "llm_context_window_stats", "llm_source_cap",
    "llm_tokenizer_fertility", "llm_bigram_kneser_ney",
    "llm_char_ngram_entropy", "llm_span_corruption_mask",
    "join_asof_tolerance", "ts_rolling_corr", "rpt_dedup_cluster_sizes",
    "llm_ngram_coverage", "join_asof_strict", "dict_get_range",
    "agg_sparkbar", "win_moving_regression", "llm_textrank_words",
    "agg_theils_u", "agg_cramers_v_bc", "agg_contingency_coef",
    "agg_group_sample", "win_time_range_sum",
    "stream_windowed_topk", "stream_cdc_upsert", "scan_binary_files",
    "math_round_modes", "date_tz_convert",
    "llm_dedup_prefix", "llm_mixture_rebalance",
]

# Keys ADDED in round 8 — staged directly into the window's 18 spare
# slots (50 - 32) so they earn driver rows the same round they land.
# Overflow beyond 18 sits immediately behind as the round-9 window.
R9_NEW = [
    "graph_triangle_count", "graph_degree_stats",
    "llm_contamination_pairs", "llm_keyword_tag", "llm_lang_confusion",
    "rpt_filter_funnel",
    "agg_group_array_sorted", "agg_group_uniq_array", "agg_meanztest",
    "agg_quantile_interp_exact",
    "join_lateral_topn", "subq_any_all", "filter_qualify",
    "win_percent_of_total", "str_readable_timedelta",
    "llm_mattr_diversity", "num_radix_conv", "scan_text_lines",
]

# Keys ADDED later in round 8 — the round-9 driver window (behind
# R9_NEW's 18 in-window keys; promoted to the front next round).
R10_NEW = [
    "join_ip_cidr", "dict_get_hierarchy", "sink_zorder_layout",
    "rpt_monthly_yoy", "ts_time_decayed_sum", "llm_temperature_mixture",
    "url_hierarchy", "llm_perplexity_buckets", "llm_dedup_normalized",
    "win_streaks", "agg_bool_aggs", "agg_mode_exact",
    "date_us_precision", "ts_vwap", "str_char_ngrams",
    "rpt_column_profile", "rpt_fk_integrity", "rpt_attribution",
    "sink_parquet_bloom", "rpt_event_transitions", "llm_dedup_substring",
    "rpt_rfm_segmentation", "rpt_table_diff", "gen_calendar_dim",
    "str_slugify",
    "udf_apply_in_pandas", "udf_map_in_pandas", "win_merge_intervals",
    "win_reset_cumsum",
    "win_skyline_2d", "rpt_new_returning", "str_printf_int",
    "date_add_business", "join_fuzzy_levenshtein", "json_nested_explode",
    "scan_csv_quoted", "sink_jsonl_gzip",
]

# Keys ADDED in round 9 — staged directly into the window's 13 spare
# slots (50 - 37) so they earn driver rows the same round they land.
R11_NEW: list[str] = [
    "rpt_basket_pairs", "rpt_activity_heatmap", "rpt_abc_classification",
    "win_bollinger_bands", "win_minmax_scaler", "ts_outlier_iqr",
    "agg_group_array_insert_at", "agg_categorical_woe",
    "llm_feature_hashing", "llm_bm25_score", "llm_pmi_collocations",
    "graph_pagerank", "sink_manifest_snapshot",
]

# Keys ADDED later in round 9 — the round-10 driver window (behind
# R11_NEW's 13 in-window keys; promoted to the front next round).
R12_NEW: list[str] = [
    "agg_quantile_timing", "geo_point_in_polygon",
    "win_cumulative_distinct", "set_union_by_name", "scan_dpp_join",
    "stream_outer_join_watermark", "agg_argmax_tuple",
    "sink_dynamic_partition_overwrite", "llm_prompt_completion_split",
    "str_normalize_nfc", "math_gcd_lcm", "llm_shard_assign",
    "llm_interleave_sources", "scan_nested_pruning",
    "rpt_supplier_scorecard", "win_weighted_moving_avg",
    "agg_uniq_combined",
    "enc_aes_roundtrip", "ts_peak_detect", "rpt_cohort_ltv",
    "rpt_join_skew_profile", "job_incremental_etl",
    "llm_dedup_url", "str_html_strip", "llm_dedup_substring_exact",
    "llm_ranking_eval", "graph_kcore", "llm_multimodal_audio",
    "scan_csv_locale", "llm_audio_resample",
]

# Keys ADDED in round 10 — staged directly into the window's 20 spare
# slots (50 - 30) so they earn driver rows the same round they land.
R13_NEW: list[str] = [
    "llm_semdedup", "geo_haversine_join",
    "geo_geohash_encode", "join_paste_positional", "scan_json_multiline",
    "scan_xml_roundtrip", "llm_rouge_overlap", "llm_dpo_pairs",
    "graph_bfs_distance", "llm_curriculum_order",
    "llm_hard_negatives", "agg_proportions_ztest",
    "llm_image_dedup_phash", "scan_csv_multichar_delim",
    "llm_audio_vad_segments", "json_variant_type",
    "agg_group_array_intersect", "dict_get_composite",
    "arr_topk_partial", "llm_stopword_strip",
]

# Keys ADDED late in round 10 — the round-11 driver window (behind
# R13_NEW's in-window keys; promoted to the front next round).
R14_NEW: list[str] = [
    "graph_jaccard_linkpred", "rpt_order_cycle_time",
    "scan_fixed_width", "scan_clf_log_parse", "str_extract_all_groups",
]

# The round whose rotation is currently applied. CORRECTNESS files
# recorded at or after this round cover THIS window by construction;
# freshness/staleness derivations use only earlier (completed) rounds.
ROTATION_ROUND = 12

# Keys ADDED in round 11 — staged at the very front of the window so
# they earn driver rows the same round they land.
R15_NEW: list[str] = [
    "graph_triangle_approx",
    "llm_sim_topk_ivfpq",
    "graph_connected_components",
    "graph_clustering_coeff",
    "llm_vocab_growth",
    "llm_zipf_slope",
    "scan_parquet_footer_stats",
    "str_soundex",
    "date_week_modes",
    "agg_anova_oneway",
    "agg_kruskal_wallis",
]

# Round-11 regression cohort (VERDICT r10 #2): with every registry key
# now driver-sampled at least once, the window's spare slots carry a
# DETERMINISTIC rotating re-sample of the STALEST already-sampled keys
# — sort by (latest round with a driver CORRECTNESS row ASCENDING,
# md5(key)) and take 45. Keys last checked in r1 have had ten rounds
# of refactors since, guarded only by builder-side sweeps; this gets
# every key a fresh driver row every ~8 rounds. GENERATED by
# ``python tools/rotation.py --slots 45`` and re-derived/asserted by
# tests/test_inventory.py::test_regression_cohort_is_derived.
R11_REGRESSION: list[str] = [
    "cast_types",  # last driver row: r1
    "case_when",  # last driver row: r1
    "filter_between_in",  # last driver row: r1
    "set_union_all",  # last driver row: r1
    "filter_compare",  # last driver row: r1
    "derive_column",  # last driver row: r1
    "filter_null_logic",  # last driver row: r1
    "project_rename",  # last driver row: r1
    "null_funcs",  # last driver row: r1
    "set_except",  # last driver row: r1
    "distinct_rows",  # last driver row: r1
    "dedup_by_key_latest",  # last driver row: r1
    "sample_fraction",  # last driver row: r1 (rows-only by design)
    "topk_global",  # last driver row: r1
    "set_union_distinct",  # last driver row: r1
    "sort_multikey",  # last driver row: r1
    "filter_like_regex",  # last driver row: r1
    "set_intersect",  # last driver row: r1
    "llm_dedup_exact",  # last driver row: r2
    "llm_tfidf_terms",  # last driver row: r2
    "agg_summing_merge",  # last driver row: r3
    "join_asof_nearest",  # last driver row: r3
    "agg_collapsing_merge",  # last driver row: r3
    "agg_topk_freq",  # last driver row: r3
    "join_anti",  # last driver row: r3
    "llm_text_stats",  # last driver row: r3
    "agg_quantile_state",  # last driver row: r3
    "agg_count_distinct",  # last driver row: r3
    "agg_distinct_windowed",  # last driver row: r3
    "llm_dedup_ngram_jaccard",  # last driver row: r3
    "agg_unpivot",  # last driver row: r3
    "agg_grouping_sets",  # last driver row: r3
    "join_skew_salted",  # last driver row: r3
    "join_semi",  # last driver row: r3
    "llm_token_count",  # last driver row: r3
    "agg_having",  # last driver row: r3
    "agg_argmax",  # last driver row: r3
    "agg_sequence_match",  # last driver row: r3
    "llm_fingerprint_rolling",  # last driver row: r3
    "agg_sum_map",  # last driver row: r3
    "join_asof_forward",  # last driver row: r3
    "agg_state_merge",  # last driver row: r3
    "agg_retention",  # last driver row: r3
    "agg_cube",  # last driver row: r3
    "agg_global",  # last driver row: r3
]

# Keys ADDED in round 12 — staged at the very front of the window so
# they earn driver rows the same round they land (they displace the
# regression-cohort tail automatically; the window is the first 50).
R16_NEW: list[str] = [
    "win_drawdown",
    "ts_sma_crossover",
]

# Round-12 regression cohort (VERDICT r11 #1+#2): derived from the
# COMPLETED rounds r01..r11 only — ``tools/rotation.py --max-round 11
# --slots 50`` — so the later-landing CORRECTNESS_r12.json cannot
# retroactively change it (driver_rows filters the FILE list by round
# before taking the per-key max). Re-derived and asserted byte-for-byte
# by tests/test_inventory.py::test_regression_cohort_is_derived.
R12_REGRESSION: list[str] = [
    "llm_token_count",  # last driver row: r3
    "agg_having",  # last driver row: r3
    "agg_argmax",  # last driver row: r3
    "agg_sequence_match",  # last driver row: r3
    "llm_fingerprint_rolling",  # last driver row: r3
    "agg_sum_map",  # last driver row: r3
    "join_asof_forward",  # last driver row: r3
    "agg_state_merge",  # last driver row: r3
    "agg_retention",  # last driver row: r3
    "agg_cube",  # last driver row: r3
    "agg_global",  # last driver row: r3
    "join_left_right_full",  # last driver row: r3
    "join_cross",  # last driver row: r3
    "agg_histogram",  # last driver row: r3
    "join_asof",  # last driver row: r3
    "agg_mad_robust",  # last driver row: r3
    "join_inner_equi",  # last driver row: r3
    "agg_sketch_state",  # last driver row: r3 (rows-only by design)
    "llm_lang_id",  # last driver row: r3
    "agg_rollup",  # last driver row: r3
    "agg_window_funnel",  # last driver row: r3
    "agg_groupby_multi",  # last driver row: r3
    "agg_approx_distinct",  # last driver row: r3 (rows-only by design)
    "agg_quantiles",  # last driver row: r3
    "join_theta_range",  # last driver row: r3
    "llm_lang_filter_quality",  # last driver row: r3
    "agg_weighted_median",  # last driver row: r3
    "agg_count_if_any",  # last driver row: r3
    "join_broadcast_dim",  # last driver row: r3
    "agg_collect",  # last driver row: r3
    "agg_pivot",  # last driver row: r3
    "agg_stats",  # last driver row: r3
    "agg_corr_exact",  # last driver row: r3
    "llm_dedup_embedding",  # last driver row: r3
    "llm_dedup_simhash",  # last driver row: r3
    "llm_dedup_clusters",  # last driver row: r3
    "str_regex",  # last driver row: r4
    "json_extract_props",  # last driver row: r4
    "rpt_promo_revenue_share",  # last driver row: r4
    "hash_funcs",  # last driver row: r4
    "rpt_min_cost_supplier",  # last driver row: r4
    "rpt_shipping_priority",  # last driver row: r4
    "arr_construct",  # last driver row: r4
    "rpt_order_priority_check",  # last driver row: r4
    "date_trunc_bucket",  # last driver row: r4
    "rpt_nation_trade_flow",  # last driver row: r4
    "map_funcs",  # last driver row: r4
    "rpt_customer_order_distribution",  # last driver row: r4
    "win_running_rows",  # last driver row: r4
    "rpt_market_share",  # last driver row: r4
]

# Round-12 rotation (VERDICT r11 #2): the R15_NEW/R14_NEW keys all
# earned r11 driver rows and rotate out; the next-stalest cohort
# (derived from completed rounds r01..r11) fills the 50-key window,
# behind any R16_NEW additions. Previously-sampled blocks pad the
# tail in their historical order.
_front = [*R16_NEW, *R12_REGRESSION]
_hist = [*R15_NEW, *R14_NEW, *R11_REGRESSION, *R12_NEW, *R13_NEW,
         *R11_NEW, *R10_NEW, *R9_NEW, *R8_NEW, *R8_TAIL, *R7_WINDOW,
         *R6_WINDOW]
ROTATION = [*_front, *[k for k in _hist if k not in set(_front)]]
registry.promote(ROTATION)
