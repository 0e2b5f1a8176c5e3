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
# in dict order per round, so this list holds EXACTLY 50 names. Round-5
# front, exactly as the r4 verdict instructed: (a) the 8 queries that have
# NEVER had a driver row (all added in r4); (b) the three r4 guard-only
# deferrals; (c) queries changed or added THIS round —
# embedding_random_projection (output reshaped to scalar rows, the one
# red r4 row), trigram_heavy_hitters (rational oracle threshold + MG
# summary materialization), jsonl_roundtrip_agg (byte-accurate
# octet_length cap), the two new Delta interop queries and the composed
# quality gate; (d) versioned_merge_time_travel (deferred from r4); then
# (e) the oldest r2-only rows — the five the verdict named, the vocab
# trio, and the head of the remaining r2 list in alphabetical order. The
# round-6 front MUST take the 24 r2-only rows that did not fit
# (recomputed from CORRECTNESS_r0*.json against this list — exactly):
# doc_pii_redaction, doc_quality_scores, doc_repetition_filter, doc_simhash_pairs, doc_token_counts, embedding_kmeans_centroids, event_props_json_stats, event_type_user_buckets, hourly_event_stats, mixture_rebalance,
# nation_segment_rollup, newest_open_orders, order_key_lookup,
# orderkey_set_ops, part_prefix_agg, quantity_band_stats,
# returnflag_priority_counts, revenue_by_nation,
# rich_customers_projection, running_value_per_user,
# segment_with_override, sole_returned_suppliers, supplier_host_etld1,
# top3_orders_per_customer, plus any round-5 additions without rows,
# then the oldest r3 rows (48 of them, ann_topk_bruteforce first).
_VERIFY_FIRST: list[str] = [
    # (a) never driver-tested (added r4)
    "orders_profile",
    "orders_quality_checks",
    "per_source_quality_gate",
    "supplier_pagerank",
    "supplier_balance_distribution",
    "orc_roundtrip_agg",
    "json_roundtrip_agg",
    "versioned_metadata_tables",
    # (b) r4 guard-only deferrals
    "jsonl_split_chunks",
    "sequence_packing",
    "embedding_cosine_pairs",
    # (c) changed or added this round
    "embedding_random_projection",  # reshaped to scalar (vec_id, pos, val)
    "trigram_heavy_hitters",        # rational threshold mirrored in oracle
    "jsonl_roundtrip_agg",          # octet_length byte cap
    "delta_interop_checkpoint_read",  # NEW: checkpointed+vacuumed log replay
    "delta_interop_dv_read",          # NEW: inline deletion-vector read
    "delta_interop_column_mapping_read",  # NEW: mode-'name' renamed-table read
    "quality_gated_merge",            # NEW: profile->checks->gated MERGE
    "quantile_sketch_incremental",    # NEW: MERGE-persisted quantile state
    "delta_export_roundtrip",         # NEW: Delta-format snapshot export
    "doc_global_quality_rank",        # NEW: two-phase distributed total order
    "doc_bm25_search",                # NEW: inverted-index BM25 search
    "stream_table_to_table_cdf",      # NEW: exactly-once CDF consumer
    "image_header_dims",              # NEW: codec-free header decode
    "corpus_curation_v3",             # NEW: composed round-5 funnel
    "events_pit_dimension_join",      # NEW: SCD2 point-in-time join
    "bm25_persisted_index_search",    # NEW: MERGE-maintained postings index
    "versioned_lifecycle_maintenance",  # NEW: OPTIMIZE+VACUUM under the gate
    # (d) deferred from r4
    "versioned_merge_time_travel",
    # (e) oldest r2-only rows
    "pricing_summary",
    "events_asof_orders",
    "two_phase_concept_extraction",
    "doc_minhash_lsh_pairs",
    "vocab_word_match",
    "vocab_match_compiled",
    "vocab_match_aho_corasick",
    "vocab_phrase_regex_match",
    "address_merge",
    "ann_topk_ivf",
    "approx_distinct_scales",
    "benchmark_contamination",
    "corpus_curation",
    "customer_order_distribution",
    "customers_with_urgent_orders",
    "customers_without_orders",
    "distinct_segment_nation",
    "doc_chunks_even",
    "doc_chunks_hard_limit",
    "doc_fingerprints",
    "doc_lang_id",
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
