"""Query/oracle registry — the single source of truth for the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``).

Each operator declared in SURVEY.md §2 registers exactly one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when SQL-expressible,
one DuckDB oracle SQL string over the same parquet tables. Registration
happens at import time of ``chess_ratings_spark.plans``.

Determinism rules every registered query must follow (the driver hash
compare is exact):
- alias every computed column identically in Spark and SQL;
- round order-dependent float aggregates (sum/avg over many rows) to a
  fixed scale on BOTH sides — per-row IEEE arithmetic is bit-exact across
  engines, but reduction order is not;
- DuckDB type quirks: ``sum(INTEGER)`` is HUGEINT (cast to BIGINT),
  ``count`` is BIGINT on both; avoid returning raw TIMESTAMP where a
  formatted string or epoch integer works.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

#: Driver-facing emission order. The driver oracle-checks exactly the
#: FIRST 50 names in ``queries()`` iteration order (a fixed 50, not
#: proportional — established rounds 8-9).
#:
#: Rotation-freshness policy v2 (v1 adopted round 9, v2 round 14;
#: enforced by tests/test_contract.py::test_survey2_evidence_freshness):
#: no SURVEY §2 operator's latest driver CORRECTNESS row may be older
#: than 5 rounds, and no OTHER registered query's older than 10 — every
#: query now has a deadline (latest row + floor + 1 = the round it must
#: re-enter the window by). Each round's window fronts the queries whose
#: deadline arrives, and spare slots go to new registrations, re-checks
#: of operators whose behavior changed, then earliest-deadline-first
#: pre-emptions (two-round feasibility enforced by
#: test_next_round_cohort_fits_window).
#:
#: Why the v2 floors: the round-13 verdict asked for a non-§2 floor of
#: ~8 on top of the §2 floor of 4. That combination is over capacity —
#: steady-state §2 demand at floor 4 is 214/5 ≈ 42.8 of the ~48 usable
#: slots/round, leaving ~5.2 for 94 depth queries (needs floor ≥ 17,
#: and even 17/18 die on the 50-wide r13 §2 cohort transient; EDF
#: simulations in DESIGN.md's round-14 log). Trading §2 to floor 5
#: (214/6 ≈ 35.7) funds non-§2 at floor 10 (94/11 ≈ 8.5): ≈ 44 of 48,
#: feasible through round 29 by simulation — the uniform-coverage
#: outcome the verdict item actually wanted.
#:
#: ================= ROUND-14 WINDOW (slots 1-50) =================
#:   1-40  the r9 cohort: the 40 §2 operators whose latest driver row
#:         is r9 (the exact list the round-13
#:         test_survey2_evidence_freshness failure named), in
#:         alphabetical order — deadline 15 under the v2 §2 floor,
#:         i.e. round 15's mandatory cohort pre-empted per policy.
#:    41  round-14 NEW registration: stream_state_ttl (per-key state
#:         TTL with silent eviction — transformWithState's
#:         ValueState-TTL semantics on applyInPandasWithState, final
#:         state read via the statestore reader; round-13 verdict #5,
#:         closing the Spark-4 state surface). ONE new registration
#:         (capacity schedule said favor pre-empts over >2).
#:  42-48  the 7 non-§2 r8 leftovers (src_csv/json/orc_roundtrip,
#:         text_fingerprint/langid/quality_score/token_count) —
#:         round-13 verdict #2's named list, fronted ahead of their
#:         new floor-10 deadlines (r19).
#:  49-50  two names PRE-EMPTED from the r10x42 §2 cohort
#:         (alphabetical: agg_approx_distinct, agg_benford_deviation)
#:         — the round-13 verdict's ≥2-r10-pre-empts ask; deadline 16
#:         under the v2 floor, within the 2-round pre-empt horizon.
#: Round-15+ deadlines at r14 HEAD (v2 floors): r15 mandatory = the
#: 13 r4-evidence TPC-H depth queries plus 0 §2; r16 = the r10x42 §2 cohort minus the 2
#: pre-empted (40) + r5 depth backlog as spare allows; the 50-wide
#: r13 §2 cohort lands r19. Feasible through round 29 by the EDF
#: simulation; test_next_round_cohort_fits_window re-verifies the
#: two-round horizon at every HEAD.
DRIVER_ORDER: tuple[str, ...] = (
    "agg_autocorr",
    "agg_bitmap_distinct",
    "agg_entropy_gini",
    "agg_ks_test",
    "agg_weighted_percentile",
    "dedup_semdedup",
    "fn_interval_arith",
    "fn_tz_convert",
    "fn_xml_parse",
    "graph_jaccard_neighbors",
    "join_asof_nearest",
    "join_lateral_topk",
    "lake_bloom_prune",
    "lake_branch_wap",
    "lake_constraints_enforce",
    "lake_manifest_shard",
    "lake_restore_version",
    "lake_table_history",
    "ml_normal_equations",
    "plan_cache_reuse",
    "sample_epoch_reshuffle",
    "scan_pyds_pushdown",
    "sink_overwrite_dynamic",
    "sql_analyze_cbo",
    "sql_ctas_insert",
    "sql_exec_immediate",
    "sql_merge_evolution",
    "sql_session_variables",
    "sql_udf_create_function",
    "src_binaryfile",
    "src_tablelog_format",
    "stream_stateful_rocksdb",
    "stream_static_join",
    "text_bpe_encode",
    "train_collate_batches",
    "train_pack_sequences",
    "ts_gapfill_interpolate",
    "udf_arrow_scalar",
    "win_cumulative_distinct",
    "win_median_rolling",
    "stream_state_ttl",
    "src_csv_roundtrip",
    "src_json_roundtrip",
    "src_orc_roundtrip",
    "text_fingerprint",
    "text_langid",
    "text_quality_score",
    "text_token_count",
    "agg_approx_distinct",
    "agg_benford_deviation",
    "agg_distinct",
    "agg_hash_group",
    "agg_percentiles",
    "agg_pivot",
    "agg_rollup_cube",
    "agg_unique_check",
    "dedup_exact",
    "dedup_near_minhash",
    "fn_array_ops",
    "fn_cast_datetime_year",
    "fn_date_range",
    "fn_math_std",
    "fn_regex_match",
    "fn_replace_null",
    "join_broadcast",
    "join_cross_params",
    "join_equi_inner",
    "join_outer",
    "join_semi_anti",
    "join_similarity",
    "join_theta_range",
    "lake_changes_between",
    "lake_merge_cdf",
    "limit_topk_global",
    "mm_embedding_col",
    "scan_metadata_columns",
    "set_except",
    "set_intersect",
    "set_union",
    "sim_join_threshold",
    "sim_topk_cosine",
    "sort_order",
    "src_parquet_scan",
    "src_url_gen",
    "text_tokenize_stats",
    "win_ntile_rank",
    "win_rank_topk",
    "win_running",
    "stream_state_reader_join",
    "sink_pyds_streamwriter",
    "agg_theta_setops",
    "agg_kll_quantile_merge",
    "stream_state_changefeed",
    "udf_map_in_arrow",
    "join_aqe_skew",
    "ml_gd_classifier",
    "sink_pyds_twophase",
    "stream_cdf_source",
    "stream_replicate_tablelog",
    "stream_ivm_groupby",
    "agg_countmin_heavyhitters",
    "fn_collation",
    "fn_try_arith",
    "fn_variant_json",
    "graph_label_propagation",
    "join_asof_forward",
    "lake_delete_mor",
    "lake_optimize_commit",
    "lake_partition_evolution",
    "lake_stats_prune",
    "lake_time_travel",
    "lake_vacuum_retention",
    "lake_zorder_locality",
    "lakehouse_lifecycle",
    "mm_audio_energy",
    "mm_video_scene_stats",
    "pipeline_cdc_apply",
    "scan_csv_permissive",
    "scd2_history",
    "sim_containment_join",
    "sink_manifest_atomic",
    "sql_pipe_syntax",
    "sql_recursive_cte",
    "stream_progress_metrics",
    "stream_sink_tablelog",
    "stream_stateful_tws",
    "text_bpe_merges",
    "text_perplexity_filter",
    "text_repetition_stats",
    "udtf_doc_chunks",
    "lake_merge_full",
    "stream_state_reader",
    "agg_approx_topk",
    "udtf_analyze_polymorphic",
    "ts_holt_linear",
    "q3_shipping_priority",
    "dedup_exact_hash",
    "lake_clone_shallow",
    "agg_distribution_shape",
    "agg_hll_setops",
    "fn_recode_map",
    "fn_month_code",
    "fn_format_string",
    "q1_pricing_summary",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_items",
    "q11_important_values",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_share",
    "agg_histogram_2d",
    "agg_mad_outliers",
    "corpus_prepare_v2",
    "dedup_cc_twostar",
    "dedup_incremental_digest",
    "dedup_keep_representatives",
    "dedup_lines_corpus",
    "dedup_substring_spans",
    "dedup_url_canonical",
    "filter_pred",
    "graph_pagerank",
    "graph_triangle_count",
    "join_fuzzy_editdistance",
    "join_interval_binned",
    "ml_linear_trend_exact",
    "mm_scalar_quantize",
    "pipeline_incremental",
    "quality_classifier_score",
    "sample_balanced_classes",
    "sample_global_shuffle",
    "sample_poisson_bootstrap",
    "sample_quality_buckets",
    "scan_schema_evolution",
    "sim_maxsim_multivector",
    "sink_parquet_partitioned",
    "src_http_zip_xml",
    "text_keywords_tfidf",
    "val_constraints",
    "val_distribution_drift",
    "win_event_pattern",
    "win_gap_islands",
    "ts_ewma_forecast",
    "lake_update_cow",
    "geo_grid_join",
    "dedup_incremental_minhash",
    "stream_sink_optimize",
    "lake_merge_mor",
    "lake_optimize_sharded",
    "join_skew_salted",
    "udf_vector_norm",
    "merge_upsert",
    "sample_stratified",
    "text_pii_scrub",
    "doc_pack_tokens",
    "sample_hash_split",
    "contamination_ngram",
    "text_normalize",
    "doc_chunk_split",
    "geo_knn_join",
    "lake_update_mor",
    "graph_kcore",
    "ts_seasonal_decompose",
    "sim_pq_adc",
    "ts_changepoint",
    "ml_kmedians_embed",
    "sql_scripting",
    "mm_phash_near_dup",
    "stream_semi_join",
    "win_skyline_2d",
    "fn_hash_suite",
    "ts_downsample_ltob",
    "agg_markov_transitions",
    "ml_pca_power",
    "graph_bfs_layers",
    "ts_max_drawdown",
    "agg_gini_concentration",
    "lake_checkpoint",
    "stream_tumbling_live",
    "stream_dedup",
    "stream_watermark_late",
    "stream_session_live",
    "stream_sliding_live",
    "stream_interval_join",
    "stream_interval_join_outer",
    "stream_join_then_window",
    "stream_state_timeout",
    "ts_resample_ohlc",
    "agg_decayed_counts",
    "agg_retention_cohorts",
    "fn_json_get",
    "join_asof",
    "sample_weighted_mix",
    "sink_parquet",
    "src_listing",
    "stream_session",
    "stream_sliding",
    "stream_stateful",
    "stream_tumbling",
    "text_ngram_topk",
    "win_lag_delta",
    "proj_rename",
    "proj_add_missing",
    "proj_lit",
    "select_project",
    "text_idf_topk",
    "sim_ann_ivf",
    "agg_stats",
    "win_percent_cume",
    "agg_collect_list",
    "fn_conditional",
    "fn_date_arith",
    "fn_map_ops",
    "fn_struct_array",
    "agg_grouping_sets",
    "unpivot_stack",
    "scalar_subquery",
    "win_range_frame",
    "fn_string_suite",
    "join_full_outer",
    "win_first_last",
    "profile_table",
    "funnel_sessionized",
    "filter_gopher_rules",
    "corpus_prepare",
    "agg_sketch_quantiles",
    "tier_r_preprocess",
    "dedup_connected_components",
    "dedup_embedding_cosine",
    "pipeline_backfill",
    "udf_grouped_trend",
    "agg_mode",
    "agg_corr_cov",
    "agg_hll_merge",
    "agg_histogram",
    "anomaly_zscore",
    "fn_bitwise_ops",
    "fn_edit_distance",
    "fn_url_parse",
    "mm_image_resize",
    "observe_metrics",
    "sample_bottomk",
    "sql_cte_surface",
    "win_time_rolling",
    "scan_partition_pruning",
    "join_dynamic_pruning",
    "join_runtime_bloom",
    "join_bucketed",
    "stream_checkpoint",
    "stream_foreach_merge",
    "compact_small_files",
    "q2_min_cost_supplier",
    "mm_binary_decode",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "mm_frame_sample",
    "q15_top_supplier",
    "q16_parts_supplier_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
)


def _ordered() -> list[Query]:
    missing = [n for n in DRIVER_ORDER if n not in REGISTRY]
    if missing:
        raise ValueError(f"DRIVER_ORDER names not registered: {missing}")
    head = [REGISTRY[n] for n in DRIVER_ORDER]
    seen = set(DRIVER_ORDER)
    return head + [q for q in REGISTRY.values() if q.name not in seen]


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a driver-facing query under SURVEY §2's ID."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
