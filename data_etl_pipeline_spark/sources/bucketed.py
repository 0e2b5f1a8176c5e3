"""Bucketed-table co-location: the shuffle-elimination path for repeated
fact-fact joins.

The reference's analog is its Mongo indexes + custom_id prefix ranges
(SURVEY X1/X3): data laid out so the expensive operation never rescans or
reshuffles. Spark-first translation: persist both fact tables bucketed by
the join key — every subsequent join/groupBy on that key reads co-located
buckets and plans WITHOUT an Exchange. At 100 TB this turns the per-query
orderkey shuffle (the single largest network cost in the star schema)
into a one-time write-side cost.

Bucket-count discipline: both sides must use the same count (or an exact
multiple with bucket coalescing); pick counts so one bucket of the BIG
side fits an executor (e.g. 100 TB lineitem / 4096 buckets ~ 25 GB raw,
~5 GB compressed columnar per bucket task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) table; pass
    ``path`` for an external table outside the warehouse dir.

    Sorting within buckets additionally removes the Sort from sort-merge
    joins and enables min/max skipping on the sort key.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key is not None:
        writer = writer.sortBy(sort_key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
