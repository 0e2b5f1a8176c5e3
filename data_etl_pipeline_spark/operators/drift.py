"""Change-point / drift detection: one-sided CUSUM as a WINDOW plan.

The CUSUM recurrence S_i = max(0, S_{i-1} + d_i) looks inherently
sequential (and most implementations run it row-at-a-time), but it has a
closed form over prefix sums:

    P_i = d_1 + ... + d_i,   P_0 = 0
    S_i = P_i - min(P_0, P_1, ..., P_i)

(the max-drawdown identity: resetting at zero is the same as measuring
height above the running minimum). That makes it TWO running windows
over ONE exchange — a running sum and a running min of that sum, both on
the same (key, order) partitioning — instead of a per-key Python loop.
At 100 TB this is the difference between a distributed sorted pass and
an un-parallelizable scan.

Determinism contract: ``dev_col`` must be EXACT (decimal or integer —
callers scale away divisions, e.g. deviation-from-mean times 10n) and
``order_cols`` must be a total order per key (include a tiebreaker).
Then every engine computes identical prefix sums in identical order and
the scores are bit-identical — CUSUM passes a value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def cusum_scores(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    dev_col: str,
    out_col: str = "cusum",
) -> DataFrame:
    """Append the one-sided upper CUSUM of ``dev_col`` per key as
    ``out_col``: S_i = (prefix sum) - min(0, running min of prefix sums).
    One exchange on the key, two Window passes sharing it."""
    w = (
        W.partitionBy(*key_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_p = df.withColumn("__p", F.sum(dev_col).over(w))
    # P_0 = 0 rides in via least(min, 0): a series that only rises keeps
    # its zero baseline instead of subtracting its own first prefix
    return with_p.withColumn(
        out_col, F.col("__p") - F.least(F.min("__p").over(w), F.lit(0))
    ).drop("__p")
