"""Distributed TOTAL ORDER without a single-reducer window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole dataset through ONE task — the canonical 100 TB killer. The
TeraSort-shape fix is two-phase: range-partition on the sort key (each
partition owns a disjoint key range, in partition-index order), sort
within partitions, then add per-partition row-count OFFSETS so a row's
global rank = its local rank + the total rows in all earlier partitions.

The offsets come from one tiny per-partition count (n_partitions rows to
the driver — bounded by the partition count, never the data), and the
local ranks are computed inside ``mapInPandas`` as the partition streams
by IN ITS SORTED ORDER — no second shuffle, no window exchange.

Correctness does not depend on where the sampled range boundaries land:
the sort key is made TOTAL by appending the tiebreak column, so any
boundary placement yields the same global order; boundaries only balance
the load. (Equal sort-key runs can straddle a boundary — with a total
key, ranks still come out identical.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[str],
    n_partitions: int = 16,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Append ``rank_col`` = the row's 1-based position in the total order
    of ``order_by`` (which MUST be a total order — include a unique
    tiebreak column last, or equal rows get an arbitrary but still
    consistent order within their range partition).

    Cost: one range exchange (the unavoidable cost of any global order),
    one local sort, one bounded count job, zero window exchanges.
    """
    cols = list(df.columns)
    parts = df.repartitionByRange(n_partitions, *[F.col(c) for c in order_by])
    parts = parts.sortWithinPartitions(*order_by)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(parts.schema.fields)
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_lrank", T.LongType())]
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pid"] = pid
            pdf["_lrank"] = range(seen + 1, seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    numbered = parts.mapInPandas(number, schema=out_schema)
    # one bounded job: rows per partition -> cumulative offsets. The
    # numbered frame is checkpointed so the count and the result read the
    # SAME partitioning (a recompute that re-sampled range boundaries
    # differently would pair local ranks with stale offsets).
    numbered = numbered.localCheckpoint(eager=True)
    sizes = {
        r["_pid"]: r["n"]
        for r in numbered.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not sizes:
        # empty input: create_map() with zero entries types as
        # map<void,void> and fails analysis — return the (empty) frame
        # with the declared schema instead
        return numbered.select(*cols, F.lit(0).cast("long").alias(rank_col))
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return numbered.select(
        *cols, (F.col("_lrank") + off_expr[F.col("_pid")]).alias(rank_col)
    )
