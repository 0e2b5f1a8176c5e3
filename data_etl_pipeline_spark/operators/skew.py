"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in session.py) covers joins; this
module covers the other hot spot: set-collecting rollups onto a few huge
keys (SURVEY A1 — per-manufacturer result union — where one manufacturer
can own millions of chunk rows at 100 TB). A plain
``groupBy(key).agg(collect_set(...))`` funnels every row of a hot key
through one task; the salted two-phase form bounds any single task's
input to ~1/n_salt of the hottest key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_set_rollup(
    df: DataFrame, key: str, value: str, n_salt: int = 16, out_col: str = "values"
) -> DataFrame:
    """Two-phase distinct-set rollup: salt -> partial collect_set ->
    final flatten+distinct. Identical result to the direct rollup (the
    sets are order-normalized with array_sort), but the first shuffle
    spreads each key over ``n_salt`` reducers.

    The salt derives from the VALUE hash so identical values of a key
    land on the same salt partition and partial sets already dedup them.
    """
    if n_salt < 1:
        raise ValueError(
            f"n_salt must be >= 1, got {n_salt} (pmod by 0 is NULL, which "
            "would silently funnel every key through one salt group again)"
        )
    partial = (
        df.withColumn("_salt", F.pmod(F.hash(F.col(value)), F.lit(n_salt)))
        .groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_partial")))).alias(out_col)
    )
