"""Two-phase distributed total order vs the single-reducer window."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.globalsort import global_rank
from data_etl_pipeline_spark.plans.planassert import executed_plan, formatted_plan


def test_matches_global_window_semantics(spark):
    df = (
        spark.range(10_000)
        .select(
            F.col("id"),
            F.pmod(F.col("id") * 2654435761, F.lit(100_000)).alias("score"),
        )
        .repartition(13)  # scrambled input partitioning
    )
    got = global_rank(df, order_by=["score", "id"], n_partitions=8)
    want = df.withColumn(
        "global_rank", F.row_number().over(W.orderBy("score", "id")).cast("long")
    )
    assert got.count() == 10_000
    diffs = (
        got.alias("g")
        .join(want.alias("w"), "id")
        .where(F.col("g.global_rank") != F.col("w.global_rank"))
        .count()
    )
    assert diffs == 0


def test_rank_is_dense_and_unique(spark):
    df = spark.range(5_000).select(
        F.col("id"), (F.col("id") % 7).alias("score")  # heavy ties
    )
    ranks = [
        r["global_rank"]
        for r in global_rank(df, order_by=["score", "id"], n_partitions=6)
        .select("global_rank")
        .collect()
    ]
    assert sorted(ranks) == list(range(1, 5_001))


def test_no_single_partition_exchange(spark):
    df = spark.range(1_000).select(F.col("id"), (F.col("id") * 7 % 997).alias("score"))
    out = global_rank(df, order_by=["score", "id"], n_partitions=8)
    plan = formatted_plan(out)
    # the killer this operator exists to avoid: a global window's
    # Exchange SinglePartition
    assert "SinglePartition" not in plan
    # and no Window node at all — ranks came from the streaming numbering
    assert "Window" not in plan


def test_string_sort_keys(spark):
    from pyspark.sql import functions as F

    rows = [(i, f"name-{(i * 37) % 100:02d}") for i in range(2_000)]
    df = spark.createDataFrame(rows, "id long, name string").repartition(7)
    got = {
        (r["id"]): r["global_rank"]
        for r in global_rank(df, order_by=["name", "id"], n_partitions=6).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy("name", "id")).cast("long")
        ).collect()
    }
    assert got == want
