"""Weighted sampling: statistical bias and bounded-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.mixture import weighted_sample_topk
from data_etl_pipeline_spark.tables import load
from data_etl_pipeline_spark.plans.planassert import executed_plan


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
    plan = executed_plan(weighted_sample_topk(docs, weight_col="n_chars", k=10))
    assert "TakeOrderedAndProject" in plan
    # a global Sort + Exchange would be the 100 TB anti-pattern
    assert "Sort " not in plan


def test_temperature_mix_flattens_toward_small_sources(spark, sf_dir):
    import pytest

    from data_etl_pipeline_spark.operators.mixture import temperature_mix_weights

    rows = temperature_mix_weights(load(spark, sf_dir, "documents")).collect()
    assert len(rows) >= 2
    # weights and shares each normalize to 1 (to rounding)
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-4
    # alpha < 1 up-samples the smallest source and down-samples the largest
    by_tokens = sorted(rows, key=lambda r: r.source_tokens)
    assert by_tokens[0].boost >= 1.0
    assert by_tokens[-1].boost <= 1.0
    # sqrt is the only supported temperature
    with pytest.raises(ValueError, match="alpha=1/2"):
        temperature_mix_weights(load(spark, sf_dir, "documents"), 1, 4)
