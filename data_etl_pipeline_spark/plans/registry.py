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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}


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
