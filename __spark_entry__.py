"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``etl_cortex_spark.queries`` — one
(Spark builder, DuckDB oracle SQL) pair per SURVEY.md §2 row.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_cortex_spark.queries import ORACLE, QUERIES  # noqa: E402

# Names already recorded green in CORRECTNESS_r01.json.  The driver samples
# the first N registry entries per round, so rotate: entries it has NOT yet
# recorded go first, the round-1-verified tail last (VERDICT.md next-round #1).
_R1_RECORDED = frozenset(
    [
        "flagship_events_medallion",
        "a04_drop_all_null_cols", "a05_drop_all_null_rows", "a06_norm_cols",
        "a07_ts_parse_coerce", "a08_norm_title_status", "a09_extract_first_ipv4",
        "a10_extract_first_ipv6", "a11_union_missing_cols", "a13_dedup_keep_latest",
        "a14_full_row_distinct", "a15_value_counts", "a16_keyword_flag_filter",
        "a19_row_count", "a21_head_n", "a18_unify_gold_sheets", "a01_xlsx_scan",
        "b01_csv_scan", "b02_bronze_passthrough", "b03_trim_all_strings",
        "b07_null_filter", "b08_date_range_filter", "b11_sql_passthrough",
        "b12_histogram", "b13_timeseries_daily", "b14_category_counts",
        "c03_json_scan", "c01_parquet_scan_pushdown", "c02_csv_scan_inferred",
        "c04_inmemory_registration", "c06_projection_computed", "c07_predicate_zoo",
        "c08_case_when_3vl", "c09_cast_try_cast", "c40_explain",
        "b04_string_to_datetime", "b05_column_selection", "b06_drop_duplicates",
        "c10_join_inner_agg", "c11_join_left_outer", "c11_join_full_outer",
        "c12_join_semi", "c12_join_anti", "c13_cross_join", "c14_theta_range_join",
        "c15_broadcast_join", "c16_asof_join", "c17_tpch_q1", "c18_count_distinct",
        "c19_approx_count_distinct",
    ]
)


# Round-2 third-wave additions — newest first: never seen by driver OR judge.
_R2_WAVE3 = (
    "c60_grouping_sets",
    "c61_percentile_disc",
    "b27_rolling_wau",
    "b25_heatmap_2d",
    "b26_rfm_segments",
    "c59_referential_integrity",
    "d34_winsorize_audit",
    "d33_udtf_sentences",
    "d31_entity_clusters",
    "d29_frame_sample_plan",
    "d30_audio_chunk_plan",
    "c56_set_ops_all",
    "c58_try_arithmetic",
    "b23_cdc_diff",
    "b24_experiment_report",
    "b22_incremental_agg",
    "d28_tfidf_knn",
    "d24_centroid_assign",
    "d24_kmeans_sizes",
    "d25_semantic_dedup",
    "d26_fuzzy_entity_match",
    "d27_pagerank_trade",
    "stream_stream_join",
    "scale_zorder_key",
    "b18_funnel_steps",
    "b19_cohort_retention",
    "b20_anomaly_zscore",
    "b21_transition_matrix",
    "b13c_resample_interpolate",
    "c52_quality_checks",
    "c53_rolling_time_window",
    "c54_corr_matrix",
    "c55_grouped_trend",
)

# Round-2 second-wave additions — never seen by driver OR judge.
_R2_WAVE2 = (
    "d18_chunk_overlap",
    "d19_bm25_topk",
    "d20_dup_ngram_flags",
    "d23_vocab_coverage",
    "b17_merge_upsert",
    "c49_column_profile",
    "c50_lateral_topk",
    "c51_approx_quantiles",
    "stream_static_join",
)

# Round-2 additions — never verified by ANY official run yet, so they
# outrank the round-1 entries the judge already re-verified manually.
_R2_NEW = (
    "d02_near_dedup_survivors",
    "d02_near_dedup_minhash",
    "d10_pii_redaction",
    "d10_training_prep_pipeline",
    "d11_stratified_sample",
    "d12_contamination_check",
    "d13_pack_sequences",
    "b13b_resample_gapfill_locf",
    "b15_scd2_history",
    "b16_batch_sessionization",
    "d14_gopher_quality_flags",
    "d15_line_dedup_boilerplate",
    "d16_embedding_quantize_int8",
    "d17_trigram_lm_score",
    "stream_tws_user_stats",  # registers only where protobuf imports
    "scale_binned_range_join",
    "sink_orc_roundtrip",
    "sink_json_roundtrip",
    "sink_text_gzip_roundtrip",
    "tpch_q17_small_quantity_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q12_priority_by_returnflag",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q19_discounted_revenue",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    "c19_approx_count_distinct",  # newly oracle-paired (epsilon bound)
)


def _rotated(d: dict) -> dict:
    new = {k: d[k] for k in (*_R2_WAVE3, *_R2_WAVE2, *_R2_NEW) if k in d}
    unrecorded = {
        k: v for k, v in d.items() if k not in _R1_RECORDED and k not in new
    }
    recorded = {
        k: v for k, v in d.items() if k in _R1_RECORDED and k not in new
    }
    return {**new, **unrecorded, **recorded}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_events_medallion"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted keys get rows-only checks."""
    return _rotated(ORACLE)
