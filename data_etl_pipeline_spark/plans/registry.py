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
# in dict order per round, so this list holds EXACTLY 50 names. Round-6
# front, exactly as the r5 verdict instructed: (a) the one query never
# driver-tested (events_asof_orders_bounded, added late in r5); (b) the
# twelve queries added THIS round (file-based DV + mode-'id' +
# V2-checkpoint + timestampNtz interop, BM25 postings GC, LSH index GC,
# triples integrity audit, incremental export, TPC-H Q4/Q7/Q14/Q19
# shapes); (c) queries whose
# implementation changed this round and need re-proof —
# doc_global_quality_rank and corpus_curation_v3 (global_rank rewritten
# to literal-boundary range partitioning, no localCheckpoint retention)
# and quantile_sketch_incremental (micro-quantile integer rank); (d) ALL
# 24 r2-only rows (verbatim from the r5 verdict/registry comment); (e)
# the oldest r3 rows, alphabetical, as many as fit (10:
# ann_topk_bruteforce .. customer_order_gaps). The round-7 front MUST
# take the remaining 33 r3 rows (customer_triples,
# deferred_extraction_results, deferred_retry_state,
# doc_chunks_token_aware, doc_dedup_clusters, doc_exact_dedup,
# doc_minhash_signatures, doc_ngram_jaccard_capped,
# doc_ngram_jaccard_pairs, doc_simhash, doc_tfidf_topk,
# events_followup_counts, first_ship_per_flag, forecast_revenue_change,
# mapping_validation, multimodal_features, multimodal_frame_sample,
# order_price_analytics, order_status_rollup, price_percentiles,
# returnflag_pivot, segment_correction_fold, stratified_split,
# stream_dedup_first_seen, stream_deferred_extraction,
# stream_enriched_counts, stream_hourly_event_counts,
# stream_user_sessions, supplier_wkt_points, token_budget_guard,
# user_session_counts, user_sessions_gap, version_drift_entities), plus
# the round-6 LATE additions without rows (ann_topk_pq,
# ann_topk_pq_rerank, delta_export_cow_delete, delta_interop_tail_read,
# doc_boilerplate_removal, delta_export_optimize_tail,
# delta_interop_timestamp_read, delta_export_vacuum_lifecycle,
# ann_topk_ivf_pq, events_asof_orders_nearest, delta_interop_stats_skipping,
# stream_foreign_delta_ingest, event_props_json_shred, audio_header_info,
# delta_export_zorder_skipping, kanonymity_generalization_audit,
# weighted_median_price, ivm_join_view,
# and any added after them this round), then the oldest r4 rows.
_VERIFY_FIRST: list[str] = [
    # (a) never driver-tested
    "events_asof_orders_bounded",
    # (b) added this round
    "delta_interop_dv_file_read",           # NEW: sidecar 'u' DVs, one-branch plan
    "delta_interop_column_mapping_id_read",  # NEW: parquet field-id matching
    "delta_interop_v2_checkpoint_read",      # NEW: UUID manifest + _sidecars
    "bm25_postings_gc_search",               # NEW: CDF-driven postings GC
    "triples_integrity_audit",               # NEW: URI/dup-label/cycle audit
    "ann_lsh_gc_topk",                       # NEW: LSH index GC after DV delete
    "delta_interop_timestamp_ntz_read",      # NEW: timestampNtz reader feature
    "delta_export_incremental",              # NEW: append + checkpoint + trim
    "order_priority_exists",                 # NEW: TPC-H Q4 shape
    "nation_pair_trade_volume",              # NEW: TPC-H Q7 shape
    "promo_revenue_share",                   # NEW: TPC-H Q14 shape
    "disjunctive_band_revenue",              # NEW: TPC-H Q19 shape
    # (c) implementation changed this round
    "doc_global_quality_rank",       # global_rank: literal-boundary rewrite
    "corpus_curation_v3",            # composes the rewritten global_rank
    "quantile_sketch_incremental",   # micro-quantile integer rank
    # (d) the 24 r2-only rows
    "doc_pii_redaction",
    "doc_quality_scores",
    "doc_repetition_filter",
    "doc_simhash_pairs",
    "doc_token_counts",
    "embedding_kmeans_centroids",
    "event_props_json_stats",
    "event_type_user_buckets",
    "hourly_event_stats",
    "mixture_rebalance",
    "nation_segment_rollup",
    "newest_open_orders",
    "order_key_lookup",
    "orderkey_set_ops",
    "part_prefix_agg",
    "quantity_band_stats",
    "returnflag_priority_counts",
    "revenue_by_nation",
    "rich_customers_projection",
    "running_value_per_user",
    "segment_with_override",
    "sole_returned_suppliers",
    "supplier_host_etld1",
    "top3_orders_per_customer",
    # (e) oldest r3 rows, alphabetical
    "ann_topk_bruteforce",
    "batch_schedule_plan",
    "batch_schedule_two_ticks",
    "blocks_dedup_first_wins",
    "blocks_header_depth",
    "concept_ancestor_closure",
    "csv_roundtrip_agg",
    "customer_emails",
    "customer_hash_sample",
    "customer_order_gaps",
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
    import data_etl_pipeline_spark.plans.etl  # noqa: F401
    import data_etl_pipeline_spark.plans.extensions  # noqa: F401
    import data_etl_pipeline_spark.plans.pipeline  # noqa: F401
    import data_etl_pipeline_spark.plans.reconcile  # noqa: F401
    import data_etl_pipeline_spark.plans.relational  # noqa: F401

    _LOADED = True
