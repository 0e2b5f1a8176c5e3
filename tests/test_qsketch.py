"""Deterministic quantile sketch: error bound, mergeability, bounded size."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.qsketch import (
    merge_sketches,
    quantile_sketch,
    quantiles_from_sketch,
)
from data_etl_pipeline_spark.tables import load
from data_etl_pipeline_spark.plans.planassert import formatted_plan


def test_estimates_within_decade_relative_error(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    sk = quantile_sketch(li, "l_extendedprice")
    est = {r["q"]: r["est"] for r in quantiles_from_sketch(sk, [0.5, 0.95]).collect()}
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    ).first()
    # bucket width / lo <= 1/10 -> estimate within ~10% of the true value
    assert abs(est[0.5] - exact["p50"]) / exact["p50"] <= 0.10
    assert abs(est[0.95] - exact["p95"]) / exact["p95"] <= 0.10


def test_merge_equals_whole(spark, sf_dir):
    # the mergeability law: sketch(A) + sketch(B) == sketch(A ∪ B)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    a = quantile_sketch(li.where("l_orderkey % 2 = 0"), "l_extendedprice")
    b = quantile_sketch(li.where("l_orderkey % 2 = 1"), "l_extendedprice")
    merged = {
        (r["lo"], r["width"]): r["cnt"] for r in merge_sketches(a, b).collect()
    }
    whole = {
        (r["lo"], r["width"]): r["cnt"]
        for r in quantile_sketch(li, "l_extendedprice").collect()
    }
    assert merged == whole


def test_bucket_count_bounded_and_zero_negative_handling(spark):
    # 90 buckets/decade bound, plus the dedicated <=0 bucket
    rows = [(float(v),) for v in range(-5, 0)] + [(0.0,)] + [
        (v / 100.0,) for v in range(1, 5000, 7)
    ] + [(10.0**k,) for k in range(1, 9)]
    df = spark.createDataFrame(rows, "x double")
    sk = quantile_sketch(df, "x").collect()
    n_rows = len(rows)
    assert sum(r["cnt"] for r in sk) == n_rows
    assert len(sk) < 900
    zero_bucket = [r for r in sk if r["digits"] == 0]
    assert len(zero_bucket) == 1 and zero_bucket[0]["cnt"] == 6  # -5..0


def test_sketch_plan_is_single_shuffle(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plan = formatted_plan(quantile_sketch(li, "l_extendedprice"))
    assert plan.count("Exchange (") == 1  # one groupBy on < 900 keys
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fine_quantiles_exact_not_snapped(spark):
    # p99.9 must NOT silently snap to p100 (the round(q*100) trap): on
    # 1..1000 every value is its own bucket below 10 and bucketed above,
    # so p99.9 and p100 land in different buckets
    df = spark.createDataFrame([(float(i),) for i in range(1, 1001)], "v double")
    sk = quantile_sketch(df, "v")
    est = {r["q"]: r["est"] for r in quantiles_from_sketch(sk, [0.999, 1.0]).collect()}
    assert est[0.999] < est[1.0]

    import pytest

    with pytest.raises(ValueError, match="6 decimal"):
        quantiles_from_sketch(sk, [0.1234567])
