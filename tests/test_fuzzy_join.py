"""Edit-distance similarity join: blocked plan must equal the quadratic
baseline (lossless q-gram count filtering + short bucket)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.fuzzy import fuzzy_match_pairs
from data_etl_pipeline_spark.plans.planassert import executed_plan, formatted_plan


def _quadratic(spark, left, right, max_dist):
    return (
        left.select(F.col("id").alias("left_id"), F.col("s").alias("ls"))
        .crossJoin(right.select(F.col("id").alias("right_id"), F.col("s").alias("rs")))
        .withColumn("dist", F.levenshtein("ls", "rs").cast("long"))
        .where(F.col("dist") <= max_dist)
        .select("left_id", "right_id", "dist")
    )


CORPUS = [
    "warehouse pipeline engine", "warehouse pipeline engnie", "warehouse pipelines engine",
    "spark", "spar", "spork", "sprk", "s", "", "ab", "cd", "abc", "acb",
    "aaaaaaaaaa", "aaaabaaaaa", "aaaa", "bbbb",
    "the quick brown fox", "the quick brown fix", "a quick brown fox!",
    "0123456789", "0123456789x", "x123456789",
]


@pytest.mark.parametrize("max_dist", [1, 2])
def test_blocked_join_equals_quadratic(spark, max_dist):
    left = spark.createDataFrame(list(enumerate(CORPUS)), "id long, s string")
    right = spark.createDataFrame(
        [(i + 1000, s) for i, s in enumerate(CORPUS + ["entirely unrelated string"])],
        "id long, s string",
    )
    got = sorted(map(tuple, fuzzy_match_pairs(left, right, max_dist=max_dist).collect()))
    want = sorted(map(tuple, _quadratic(spark, left, right, max_dist).collect()))
    assert got == want
    assert len(want) > len(CORPUS)  # exact matches + real near-miss pairs


def test_blocked_join_plan_has_no_unbounded_cross_join(spark):
    """The long x long path must be gram-equi-join + count filter; the only
    cross joins are the broadcast short buckets (bounded by construction)."""
    left = spark.createDataFrame(list(enumerate(CORPUS)), "id long, s string")
    pairs = fuzzy_match_pairs(left, left, max_dist=2)
    plan = formatted_plan(pairs)
    # every nested-loop join in the plan is a broadcast one (short bucket)
    assert "CartesianProduct" not in plan
