"""The in-engine NB classifier must genuinely learn, not emit a constant."""

from __future__ import annotations

from data_etl_pipeline_spark.operators.nbayes import train_score_nb
from data_etl_pipeline_spark.tables import load


def test_nb_learns_the_label(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rows = train_score_nb(docs, label_word="scan", test_mod=5).collect()
    assert len(rows) > 0
    acc = sum(r.correct for r in rows) / len(rows)
    hi_share = sum(r.actual_hi for r in rows) / len(rows)
    majority = max(hi_share, 1 - hi_share)
    # the label word is in-vocabulary, so a trained model must beat the
    # majority-class baseline by a clear margin
    assert acc >= majority + 0.05, (acc, majority)
    preds = {r.predicted_hi for r in rows}
    assert preds == {True, False}  # not a constant classifier


def test_nb_scores_are_integral_and_signed(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rows = train_score_nb(docs, label_word="scan", test_mod=5).collect()
    assert all(isinstance(r.score_micro, int) for r in rows)
    assert any(r.score_micro > 0 for r in rows)
    assert any(r.score_micro < 0 for r in rows)
