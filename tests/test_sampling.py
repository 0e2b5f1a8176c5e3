"""Weighted sampling: statistical bias and bounded-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.mixture import weighted_sample_topk
from data_etl_pipeline_spark.tables import load


def test_weighted_sample_is_biased_toward_heavy_rows(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    sample = weighted_sample_topk(docs, weight_col="n_chars", k=100).collect()
    assert len(sample) == 100
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    # inclusion probability is proportional to weight, so the sample's
    # mean weight must exceed the corpus mean (size-biased sampling)
    assert sample_mean > corpus_mean


def test_weighted_sample_plan_is_partial_topk_not_global_sort(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    plan = weighted_sample_topk(docs, weight_col="n_chars", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # a global Sort + Exchange would be the 100 TB anti-pattern
    assert "Sort " not in plan
