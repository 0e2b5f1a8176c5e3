"""Bounded-shuffle grouped top-k: equivalence with the window form,
tie determinism, ascending mode, and the pre-reduce volume bound."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.topk import grouped_topk


def _data(spark, n_rows=500, n_groups=7):
    return spark.range(n_rows).select(
        (F.col("id") % n_groups).alias("g"),
        # duplicated order values force tie resolution
        (F.col("id") * 37 % 101).alias("v"),
        F.col("id").alias("row_id"),
    ).repartition(8)


class TestGroupedTopk:
    def test_matches_window_form(self, spark):
        df = _data(spark)
        got = {
            (r["g"], r["row_id"], r["rank"])
            for r in grouped_topk(df, ["g"], "v", k=5, tiebreak="row_id").collect()
        }
        w = W.partitionBy("g").orderBy(F.desc("v"), F.asc("row_id"))
        want = {
            (r["g"], r["row_id"], r["rn"])
            for r in df.withColumn("rn", F.row_number().over(w).cast("int"))
            .where(F.col("rn") <= 5)
            .collect()
        }
        assert got == want

    def test_ascending_bottom_k(self, spark):
        df = _data(spark)
        got = grouped_topk(df, ["g"], "v", k=2, ascending=True, tiebreak="row_id")
        for r in got.collect():
            assert r["rank"] <= 2
        mins = {r["g"]: r["v"] for r in got.where("rank = 1").collect()}
        want = {r["g"]: r["m"] for r in df.groupBy("g").agg(F.min("v").alias("m")).collect()}
        assert mins == want

    def test_pre_reduce_bounds_rows(self, spark):
        df = _data(spark, n_rows=2000, n_groups=3)
        # peek at the pre-reduced intermediate: k rows per group per task max
        reduced_count = (
            df.mapInPandas(  # replicate the operator's local pass
                _local_pass(["g"], "v", 4, "row_id"), schema=df.schema
            ).count()
        )
        n_parts = df.rdd.getNumPartitions()
        assert reduced_count <= 4 * 3 * n_parts
        assert reduced_count < 2000  # actually reduced

    def test_k_validation(self, spark):
        with pytest.raises(ValueError, match="k must"):
            grouped_topk(_data(spark), ["g"], "v", k=0)


def _local_pass(key_cols, order_col, k, tiebreak):
    import pandas as pd

    sort_cols = [order_col, tiebreak]

    def f(batches):
        held = None
        for pdf in batches:
            both = pdf if held is None else pd.concat([held, pdf], ignore_index=True)
            held = (
                both.sort_values(sort_cols, ascending=[False, True], kind="mergesort")
                .groupby(key_cols, sort=False)
                .head(k)
            )
        yield held if held is not None else pd.DataFrame(columns=["g", "v", "row_id"])

    return f
