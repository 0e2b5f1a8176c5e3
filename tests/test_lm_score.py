"""Semantic invariants of the bigram-LM quality scorer."""

from __future__ import annotations

from data_etl_pipeline_spark.plans import all_queries


def test_lm_nll_invariants(spark, sf_dir):
    rows = all_queries()["doc_lm_nll"](spark, sf_dir).collect()
    assert rows, "corpus should yield scored documents"
    for r in rows:
        # Laplace smoothing bounds: 0 < p < 1 so nll strictly positive,
        # and every scored doc has at least one bigram
        assert r["nll"] > 0
        assert r["n_bigrams"] >= 1

    # a doc with < 2 tokens can produce no bigram rows: verify exclusion
    # semantics rather than a null score
    from data_etl_pipeline_spark.tables import load
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    short = docs.where(
        F.size(F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)")) < 2
    ).count()
    assert len(rows) == docs.count() - short
