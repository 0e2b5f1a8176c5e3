"""Grouped top-k with bounded shuffle (partial top-k pre-reduce).

The window form — row_number() over (partition by k order by v) <= k —
shuffles EVERY row of every group to its reducer before discarding all
but k. At 100 TB with millions of rows per hot group that shuffle is the
job. The classic fix mirrors partial aggregation: each map task keeps
only its local top-k per group (correct because a row in the global
top-k of its group is necessarily in the top-k of whatever partition it
sits in — fewer than k partition rows can beat it), so the exchange
carries at most k rows per group per map task instead of the raw stream;
one ordinary window pass over that pre-reduced set finishes the job.

Same result as the window form by construction; the pre-reduce is a
pure volume optimization, exactly like map-side combine for sum().
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact top-``k`` rows per ``key_cols`` group by ``order_col``
    (descending by default), with ``rank`` (1-based). Ties resolve by
    ``tiebreak`` ascending (required for a deterministic result when
    ``order_col`` has duplicates within a group; must be non-null — NULL
    tiebreaks under pandas' single na_position could divert the local
    pre-reduce from the window order on exact order-value ties).

    Scale shape: mapInPandas local top-k per group (state: k rows per
    group per task) -> single window over the pre-reduced rows.

    NULL handling matches the window form exactly: asc = NULLS FIRST,
    desc = NULLS LAST (Spark defaults), and NULL KEY groups are ranked
    like any other group (pandas groupby keeps them via dropna=False).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])
    sort_asc = [ascending] + ([True] if tiebreak else [])
    # mirror Spark's null ordering so the local head keeps exactly the
    # rows the global window would rank: asc -> nulls first, desc -> last
    na_pos = "first" if ascending else "last"

    out_cols = list(df.columns)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        held: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if held is None else pd.concat([held, pdf], ignore_index=True)
            held = (
                both.sort_values(
                    sort_cols, ascending=sort_asc, kind="mergesort", na_position=na_pos
                )
                # dropna=False: a NULL key is a group like any other — the
                # default silently deletes those rows from the result
                .groupby(key_cols, sort=False, dropna=False)
                .head(k)
            )
        yield held if held is not None else pd.DataFrame(columns=out_cols)

    reduced = df.mapInPandas(local_topk, schema=df.schema)
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    by = [order] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = W.partitionBy(*key_cols).orderBy(*by)
    return reduced.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
