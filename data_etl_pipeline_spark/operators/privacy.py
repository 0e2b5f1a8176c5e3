"""Privacy governance over training/customer data: k-anonymity auditing
with a generalization ladder.

A release is k-anonymous over a quasi-identifier (QI) tuple when every
present combination covers at least k records — smaller groups re-identify
individuals by join with outside data. The audit is a pure hash
aggregation (one shuffle on the QI tuple, map-side combined); the fix is
GENERALIZATION: coarsen a QI column through a provided mapping (e.g.
nation -> region, age -> decade) and re-audit, repeating up the ladder
until the release passes or the ladder is exhausted (then the residual
violators must be suppressed, which the audit output identifies exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kanonymity_audit(df: DataFrame, qi_cols: list[str], k: int) -> DataFrame:
    """Per-QI-group audit: (qi..., group_size, is_violation). One hash
    aggregation; NULL QI values form their own group (a NULL tuple is
    just as joinable against outside data as any other)."""
    if k < 2:
        raise ValueError("k-anonymity needs k >= 2")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("group_size")
    ).withColumn("is_violation", F.col("group_size") < k)


def kanonymity_generalize(
    df: DataFrame, col: str, mapping: DataFrame, out_col: str | None = None
) -> DataFrame:
    """One ladder step: replace ``col`` through a (value -> general)
    broadcast mapping; values absent from the mapping generalize to NULL
    (the conservative direction — an unmapped value joins nothing).
    ``mapping`` has columns (value, general)."""
    out_col = out_col or col
    m = mapping.select(
        F.col("value").alias("__from"), F.col("general").alias("__to")
    )
    return (
        df.join(F.broadcast(m), df[col] == F.col("__from"), "left")
        .drop("__from")
        .withColumn(out_col, F.col("__to"))
        .drop("__to")
    )
