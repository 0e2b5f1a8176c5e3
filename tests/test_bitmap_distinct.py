"""Bitmap exact-distinct aggregates (bitmap_distinct_customers).

Pins the two properties the query's scale story leans on:
  * MERGEABILITY — bitmaps built from ANY disjoint split of the input
    OR-merge to the same per-group distinct as a single pass (the
    incremental-batch contract);
  * BUCKET-BOUNDARY correctness — keys straddling the 32768-key bucket
    edges land in distinct buckets and are still counted exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _bitmap_distinct(df, group_col: str, key_col: str):
    """Two-level bitmap distinct: per-(group, bucket) construct, OR-merge,
    sum of bitmap_count — the same shape the declared query uses."""
    return (
        df.groupBy(group_col, F.bitmap_bucket_number(key_col).alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(key_col)).alias("bm"))
        .groupBy(group_col)
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
    )


def test_bucket_boundary_keys_count_exactly_once(spark):
    # keys straddling the first three bucket edges, plus duplicates
    edge = 32768
    keys = [1, edge - 1, edge, edge + 1, 2 * edge, 2 * edge + 1, 3 * edge - 1]
    rows = [("g", k) for k in keys] + [("g", k) for k in keys]  # all duplicated
    df = spark.createDataFrame(rows, "g string, k long")
    got = _bitmap_distinct(df, "g", "k").collect()
    assert [(r["g"], r["n"]) for r in got] == [("g", len(keys))]
    # the edge keys really do span multiple buckets (else the test is vacuous)
    n_buckets = (
        df.select(F.bitmap_bucket_number("k").alias("b")).distinct().count()
    )
    assert n_buckets >= 3


def test_arbitrary_disjoint_splits_merge_to_single_pass_answer(spark, sf_dir):
    from data_etl_pipeline_spark.tables import load

    orders = load(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    single = {
        r["o_orderpriority"]: r["n"]
        for r in _bitmap_distinct(orders, "o_orderpriority", "o_custkey").collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert single == exact
    # three-way split on a hash unrelated to the group or bucket keys
    parts = [
        orders.where(F.crc32(F.col("o_custkey").cast("string")) % 3 == i)
        for i in range(3)
    ]
    partials = None
    for p in parts:
        pb = p.groupBy(
            "o_orderpriority", F.bitmap_bucket_number("o_custkey").alias("bucket")
        ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm"))
        partials = pb if partials is None else partials.unionByName(pb)
    merged = (
        partials.groupBy("o_orderpriority", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("o_orderpriority")
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
    )
    assert {r["o_orderpriority"]: r["n"] for r in merged.collect()} == exact
