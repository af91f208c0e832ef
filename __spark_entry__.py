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

# Names already officially recorded green by the driver (CORRECTNESS_r01 +
# CORRECTNESS_r02; 50 entries each, zero failures).  The driver samples the
# first N registry entries per round, so keep rotating: entries with NO
# official record yet go first, recorded ones last (VERDICT.md round-1
# next-round #1 — continued each round until the whole registry has
# appeared in a CORRECTNESS file).
_RECORDED = frozenset(
    [
    "a01_xlsx_scan", "a04_drop_all_null_cols", "a05_drop_all_null_rows",
    "a06_norm_cols", "a07_ts_parse_coerce", "a08_norm_title_status",
    "a09_extract_first_ipv4", "a10_extract_first_ipv6",
    "a11_union_missing_cols", "a13_dedup_keep_latest",
    "a14_full_row_distinct", "a15_value_counts", "a16_keyword_flag_filter",
    "a18_unify_gold_sheets", "a19_row_count", "a21_head_n", "b01_csv_scan",
    "b02_bronze_passthrough", "b03_trim_all_strings",
    "b04_string_to_datetime", "b05_column_selection",
    "b06_drop_duplicates", "b07_null_filter", "b08_date_range_filter",
    "b11_sql_passthrough", "b12_histogram", "b13_timeseries_daily",
    "b14_category_counts", "c01_parquet_scan_pushdown",
    "c02_csv_scan_inferred", "c03_json_scan", "c04_inmemory_registration",
    "c06_projection_computed", "c07_predicate_zoo", "c08_case_when_3vl",
    "c09_cast_try_cast", "c10_join_inner_agg", "c11_join_full_outer",
    "c11_join_left_outer", "c12_join_anti", "c12_join_semi",
    "c13_cross_join", "c14_theta_range_join", "c15_broadcast_join",
    "c16_asof_join", "c17_tpch_q1", "c18_count_distinct",
    "c19_approx_count_distinct", "c40_explain",
    "flagship_events_medallion",

    "b13b_resample_gapfill_locf", "b13c_resample_interpolate",
    "b17_merge_upsert", "b18_funnel_steps", "b19_cohort_retention",
    "b20_anomaly_zscore", "b21_transition_matrix", "b22_incremental_agg",
    "b23_cdc_diff", "b24_experiment_report", "b25_heatmap_2d",
    "b26_rfm_segments", "b27_rolling_wau", "c49_column_profile",
    "c50_lateral_topk", "c51_approx_quantiles", "c52_quality_checks",
    "c53_rolling_time_window", "c54_corr_matrix", "c55_grouped_trend",
    "c56_set_ops_all", "c58_try_arithmetic", "c59_referential_integrity",
    "c60_grouping_sets", "c61_percentile_disc", "d02_near_dedup_minhash",
    "d02_near_dedup_survivors", "d10_pii_redaction",
    "d10_training_prep_pipeline", "d11_stratified_sample",
    "d12_contamination_check", "d13_pack_sequences", "d18_chunk_overlap",
    "d19_bm25_topk", "d20_dup_ngram_flags", "d23_vocab_coverage",
    "d24_centroid_assign", "d24_kmeans_sizes", "d25_semantic_dedup",
    "d26_fuzzy_entity_match", "d27_pagerank_trade", "d28_tfidf_knn",
    "d29_frame_sample_plan", "d30_audio_chunk_plan", "d31_entity_clusters",
    "d33_udtf_sentences", "d34_winsorize_audit", "scale_zorder_key",
    "stream_static_join", "stream_stream_join"
    ]
)

# Round-3 additions — never seen by driver or judge; top priority.
_R3_NEW: tuple[str, ...] = ()

# Round-2 additions the round-2 driver run did not reach — never verified
# by ANY official run (the round-1 judge re-verified only the round-1
# tail), so they outrank everything else already in the registry.
_NEVER_VERIFIED = (
    "b15_scd2_history",
    "b16_batch_sessionization",
    "d14_gopher_quality_flags",
    "d15_line_dedup_boilerplate",
    "d16_embedding_quantize_int8",
    "d17_trigram_lm_score",
    "scale_binned_range_join",
    "sink_orc_roundtrip",
    "sink_json_roundtrip",
    "sink_text_gzip_roundtrip",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q12_priority_by_returnflag",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpch_q22_global_sales_opportunity",
)


def _rotated(d: dict) -> dict:
    """Priority order: round-3 new → round-2 never-verified → the
    round-1 judge-verified-but-driver-unrecorded tail (registry order)
    → officially recorded entries."""
    front = {k: d[k] for k in (*_R3_NEW, *_NEVER_VERIFIED) if k in d}
    unrecorded = {
        k: v for k, v in d.items() if k not in _RECORDED and k not in front
    }
    recorded = {k: v for k, v in d.items() if k in _RECORDED and k not in front}
    return {**front, **unrecorded, **recorded}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_events_medallion"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted keys get rows-only checks."""
    return _rotated(ORACLE)
