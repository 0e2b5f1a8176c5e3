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


# The driver's CORRECTNESS run processes queries() in dict order and covered
# exactly 50 entries in round 1, leaving 32 declared queries without a driver
# row. Emit this round's must-verify queries FIRST: the 32 unchecked, the 2
# round-1 hash mismatches (now fixed), the former rows-only queries (now
# oracle-checked), and queries added this round. Already-green queries fill
# the remaining slots so they are re-confirmed only after every query has
# earned a row at least once across rounds.
_VERIFY_FIRST: list[str] = [
    # round-1 hash mismatches, fixed this round
    "returnflag_priority_counts",
    "doc_minhash_lsh_pairs",
    # unchecked in round 1 (no CORRECTNESS_r01 row)
    "pricing_summary",
    "revenue_by_nation",
    "two_phase_concept_extraction",
    "ann_topk_ivf",
    "hourly_event_stats",
    "newest_open_orders",
    "rich_customers_projection",
    "quantity_band_stats",
    "customers_with_urgent_orders",
    "customers_without_orders",
    "part_prefix_agg",
    "order_key_lookup",
    "segment_with_override",
    "distinct_segment_nation",
    "orderkey_set_ops",
    "top3_orders_per_customer",
    "running_value_per_user",
    "nation_segment_rollup",
    "event_type_user_buckets",
    "event_props_json_stats",
    "user_session_counts",
    "doc_lang_id",
    "doc_quality_scores",
    "doc_token_counts",
    "doc_fingerprints",
    "vocab_word_match",
    "vocab_phrase_regex_match",
    "vocab_match_compiled",
    "vocab_match_aho_corasick",
    "doc_chunks_even",
    "doc_chunks_token_aware",
    "address_merge",
    # rows-only in round 1; oracle-checked this round
    "approx_distinct_scales",
    # new queries this round
    "supplier_host_etld1",
    "doc_chunks_hard_limit",
    "versioned_merge_time_travel",
    "doc_dedup_clusters",
    "corpus_curation",
    "embedding_kmeans_centroids",
    "doc_pii_redaction",
    "doc_repetition_filter",
    "doc_simhash_pairs",
    "benchmark_contamination",
    "sequence_packing",
    "mixture_rebalance",
    "customer_order_distribution",
    "sole_returned_suppliers",
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
