"""Declared-query registry: one entry per implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions.

Each spec pairs
  * ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation, and
  * ``sql`` — the equivalent ANSI SQL the DuckDB oracle runs on the same
    parquet tables (None for genuinely non-SQL-expressible ops; the driver
    then records a weaker rows-only check).

Float determinism contract (the driver hash-compares values):
  * money/quantity sums go through exact DECIMAL accumulation and are cast
    to DOUBLE at the end — identical bits in both engines regardless of
    partial-aggregation order;
  * averages are computed as exact-decimal-sum / count in double;
  * similarity scores are rounded to 6 decimals in both engines;
  * every computed column carries the same alias in both engines.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check
    doc: str = ""
    headline: bool = False  # included in bench.py


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None, doc: str = "", headline: bool = False):
    """Decorator registering a declared query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc, headline=headline)
        return fn

    return wrap


# The driver's CORRECTNESS run samples the FIRST 50 of the declared queries
# in dict order per round, so this list holds EXACTLY 50 names. Round-7
# front, exactly as the r6 verdict instructed ("Next round" item 1):
# (a) the 33 r3-stale rows (no driver row since round 3), alphabetical;
# (b) 17 of the 18 round-6-late queries that have never had a driver row
# (pytest-oracle-green only). ivm_join_view is the named carry-over that
# falls off the 50-row window; it MUST lead the round-8 front, followed by
# every query added or materially changed in round 7
# (delta_export_merge_upsert, events_resample_locf, segment_distinct_kmv,
# kmv_sketch_incremental, event_type_value_cusum, winsorized_price_stats,
# hopping_event_stats, hybrid_search_rrf, leakage_safe_split,
# annotator_agreement_kappa, mad_outlier_flags,
# source_quantile_normalization, part_affinity_lift,
# user_rolling_features, delta_interop_column_pruning,
# delta_export_replace_where, stream_hopping_event_counts,
# token_budget_waterfill, delta_export_txn_idempotence,
# user_activity_streaks, weekly_cohort_retention, event_transition_probs,
# time_decayed_user_value, benford_price_audit, pareto_efficient_orders,
# pmi_bigram_collocations, kmv_jaccard_event_types,
# delta_export_cdf_lifecycle, delta_interop_cdf_read,
# delta_cdf_materialized_view, bloom_prejoin_revenue,
# cms_user_frequencies, supplier_geohash_cells,
# chi2_token_selection, supplier_geo_neighbor_pairs,
# stream_cdf_delta_mirror, video_header_info, walk_forward_folds,
# delta_export_check_constraints,
# plus the round-7 second-session additions:
# target_encode_kfold, rfm_customer_segments, feature_hashing_signed,
# seasonal_anomaly_events, ldiversity_audit, vocab_coverage_prune,
# bpe_top_pairs, stream_stream_left_outer, delta_interop_ict_read,
# sorted_neighborhood_pairs, kaplan_meier_churn,
# delta_interop_generated_partition_read, pysource_batch_results,
# observed_quality_metrics, bucketed_join_no_shuffle,
# stream_pysource_ingest, delta_export_v2_checkpoint_roundtrip,
# hard_negative_mining, delta_export_schema_evolution,
# stream_dedup_within_watermark, dynamic_gap_sessions, rake_keyphrases,
# grouping_sets_priority_status, aqe_runtime_broadcast_join,
# lineitem_correlation_matrix, ks_two_sample_price,
# cramers_v_status_priority, and any after
# them —
# note doc_minhash_signatures/doc_exact_dedup/doc_dedup_clusters etc.
# re-prove the round-7 total-shingle-expression fix THIS round since
# they sit in the round-7 front;
# delta_interop_tail_read gained a post-delete append commit but is
# driver-tested THIS round), then the oldest r4 rows (alphabetical:
# csv_export_roundtrip,
# customer_ltv_quartiles, customers_without_recent_orders, ...).
_VERIFY_FIRST: list[str] = [
    # (a) the 33 r3-stale rows
    "customer_triples",
    "deferred_extraction_results",
    "deferred_retry_state",
    "doc_chunks_token_aware",
    "doc_dedup_clusters",
    "doc_exact_dedup",
    "doc_minhash_signatures",
    "doc_ngram_jaccard_capped",
    "doc_ngram_jaccard_pairs",
    "doc_simhash",
    "doc_tfidf_topk",
    "events_followup_counts",
    "first_ship_per_flag",
    "forecast_revenue_change",
    "mapping_validation",
    "multimodal_features",
    "multimodal_frame_sample",
    "order_price_analytics",
    "order_status_rollup",
    "price_percentiles",
    "returnflag_pivot",
    "segment_correction_fold",
    "stratified_split",
    "stream_dedup_first_seen",
    "stream_deferred_extraction",
    "stream_enriched_counts",
    "stream_hourly_event_counts",
    "stream_user_sessions",
    "supplier_wkt_points",
    "token_budget_guard",
    "user_session_counts",
    "user_sessions_gap",
    "version_drift_entities",
    # (b) round-6-late queries, never driver-tested
    "ann_topk_pq",
    "ann_topk_pq_rerank",
    "ann_topk_ivf_pq",
    "delta_export_cow_delete",
    "delta_export_optimize_tail",
    "delta_export_vacuum_lifecycle",
    "delta_export_zorder_skipping",
    "delta_interop_tail_read",
    "delta_interop_timestamp_read",
    "delta_interop_stats_skipping",
    "stream_foreign_delta_ingest",
    "doc_boilerplate_removal",
    "event_props_json_shred",
    "audio_header_info",
    "events_asof_orders_nearest",
    "kanonymity_generalization_audit",
    "weighted_median_price",
]


def _ordered() -> list[str]:
    first = [n for n in _VERIFY_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(first)]
    return first + rest


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: QUERIES[name].fn for name in _ordered()}


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: QUERIES[name].sql for name in _ordered() if QUERIES[name].sql is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import the modules that populate QUERIES (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import data_etl_pipeline_spark.plans.advanced  # noqa: F401
    import data_etl_pipeline_spark.plans.behavior  # noqa: F401
    import data_etl_pipeline_spark.plans.etl  # noqa: F401
    import data_etl_pipeline_spark.plans.extensions  # noqa: F401
    import data_etl_pipeline_spark.plans.insights  # noqa: F401
    import data_etl_pipeline_spark.plans.mlfeat  # noqa: F401
    import data_etl_pipeline_spark.plans.pipeline  # noqa: F401
    import data_etl_pipeline_spark.plans.reconcile  # noqa: F401
    import data_etl_pipeline_spark.plans.relational  # noqa: F401

    _LOADED = True
