"""In-engine trained multinomial Naive Bayes text classifier.

Large-corpus pipelines gate documents with a LEARNED quality filter (the
GPT-3 / CCNet recipe: train a cheap linear classifier on weak labels, score
every document, keep the high side).  The reference calls an external LLM
for per-document judgments; the engine-native form is: train the model AS A
QUERY (token counts are grouped aggregates), broadcast the resulting
weight table, and score the corpus in a second pass — no external service,
no driver-side learning loop.

Determinism contract (the DuckDB oracle replays training bit-for-bit):
log-likelihood ratios are computed from exact integer counts, scaled to
integer micro-units via round(x * 1e6) half-away-from-zero, and per-doc
scores are exact BIGINT sums of those units — no floating accumulation
order anywhere.  The only cross-engine wobble is a final-ulp difference in
ln() flipping a .5 rounding boundary (~1e-9 per distinct token), the same
exposure as the repo-wide round(x, 6) contract.

Scale notes: training is one groupBy over (label, token) with map-side
combine; the model is ~vocabulary-sized and broadcast for scoring, so the
corpus is scanned exactly twice (train pass, score pass) and nothing ever
shuffles wider than the token-count table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _micro(x: float) -> int:
    """round(x * 1e6) half-away-from-zero (Python round() is banker's)."""
    scaled = abs(x) * 1_000_000.0
    return int(math.floor(scaled + 0.5)) * (1 if x >= 0 else -1)


def train_score_nb(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_word: str = "scan",
    test_mod: int = 5,
) -> DataFrame:
    """Train multinomial NB on the hash-held-out training split (label =
    document contains ``label_word``) and score the test split.

    Returns one row per test doc: (doc_id, score_micro, predicted_hi,
    actual_hi, correct).  ``predicted_hi`` is score > 0 — ties break to lo
    deterministically.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("w"),
    ).select(
        "doc_id",
        "w",
        F.array_contains("w", label_word).alias("hi"),
        (F.pmod(F.col("doc_id"), F.lit(test_mod)) == 0).alias("is_test"),
    )
    train_tok = base.where(~F.col("is_test")).select(
        "doc_id", "hi", F.explode("w").alias("word")
    )

    # model-sized scalars (a handful of longs — the same driver surface as
    # collecting k-means centroids); doc priors ride the SAME token scan
    # as distinct doc ids per class, so training needs one scalar job
    t_hi, t_lo, v, n_hi, n_lo = train_tok.agg(
        F.sum(F.when(F.col("hi"), 1).otherwise(0)),
        F.sum(F.when(~F.col("hi"), 1).otherwise(0)),
        F.countDistinct("word"),
        F.countDistinct(F.when(F.col("hi"), F.col("doc_id"))),
        F.countDistinct(F.when(~F.col("hi"), F.col("doc_id"))),
    ).first()
    if not n_hi or not n_lo:
        raise ValueError(
            f"degenerate training split (n_hi={n_hi}, n_lo={n_lo}): both "
            f"classes need examples — check label_word={label_word!r} and "
            "that the training split is non-empty"
        )
    n_train = n_hi + n_lo
    prior_micro = _micro(math.log(n_hi / n_train) - math.log(n_lo / n_train))
    oov_micro = _micro(math.log(1.0 / (t_hi + v)) - math.log(1.0 / (t_lo + v)))

    model = (
        train_tok.select("hi", "word").groupBy("word")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0)).alias("c_hi"),
            F.sum(F.when(~F.col("hi"), 1).otherwise(0)).alias("c_lo"),
        )
        .select(
            "word",
            F.round(
                (
                    F.log((F.col("c_hi") + 1).cast("double") / F.lit(float(t_hi + v)))
                    - F.log((F.col("c_lo") + 1).cast("double") / F.lit(float(t_lo + v)))
                )
                * 1_000_000.0,
                0,
            )
            .cast("long")
            .alias("llr"),
        )
    )

    test_tok = base.where(F.col("is_test")).select(
        "doc_id", F.col("hi").alias("actual_hi"), F.explode("w").alias("word")
    )
    scored = (
        test_tok.join(F.broadcast(model), "word", "left")
        .groupBy("doc_id", "actual_hi")
        .agg(F.sum(F.coalesce("llr", F.lit(oov_micro))).alias("tok_sum"))
    )
    score = F.col("tok_sum") + F.lit(prior_micro)
    return scored.select(
        "doc_id",
        score.cast("long").alias("score_micro"),
        (score > 0).alias("predicted_hi"),
        "actual_hi",
        ((score > 0) == F.col("actual_hi")).alias("correct"),
    )
