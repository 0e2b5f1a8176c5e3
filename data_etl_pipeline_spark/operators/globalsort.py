"""Distributed TOTAL ORDER without a single-reducer window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole dataset through ONE task — the canonical 100 TB killer. The
TeraSort-shape fix is two-phase: range-partition on the sort key (each
partition owns a disjoint key range), sort within partitions, then add
per-range row-count OFFSETS so a row's global rank = its local rank +
the total rows in all earlier ranges.

The range boundaries are computed EXPLICITLY from a seeded sample and
baked into the plan as struct literals (``pid = sum of [key >= b_i]``).
That makes the whole lineage DETERMINISTIC under recomputation — unlike
``repartitionByRange``, whose internal boundary sampling can re-draw on
a recompute and silently pair local ranks with stale offsets. The
previous design pinned the numbered frame with an eager
``localCheckpoint`` to freeze the sampled boundaries, which retained a
full copy of the input in executor storage for the session lifetime;
literal boundaries need no retention at all.

Correctness does not depend on where the sampled boundaries land: the
sort key is made TOTAL by appending the tiebreak column, and
``sum([key >= b_i])`` is monotone along the sort order for ANY boundary
set (nulls sort first and compare to pid 0, matching Spark's
nulls-first ascending order) — boundaries only balance the load.

The offsets come from one tiny per-range count (at most ``n_partitions``
rows to the driver — bounded by the partition count, never the data),
and the local ranks are computed inside ``mapInPandas`` as each range
streams by IN ITS SORTED ORDER — no window exchange anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SAMPLE_SEED = 8827
_SAMPLES_PER_PARTITION = 100


def _sample_boundaries(
    df: DataFrame, order_by: list[str], n_partitions: int
) -> list[tuple]:
    """n_partitions-1 (or fewer) boundary key tuples from a seeded sample
    — collected size is ~n_partitions * 100 keys in expectation, bounded
    by the sample fraction, never the data."""
    n = df.count()
    if n == 0:
        return []
    fraction = min(1.0, (n_partitions * _SAMPLES_PER_PARTITION) / n)
    keys = [
        tuple(r)
        for r in df.select(*order_by)
        .sample(withReplacement=False, fraction=fraction, seed=_SAMPLE_SEED)
        .collect()
    ]
    if not keys:  # tiny fraction can draw nothing: fall back to one range
        return []
    # nulls-first sort matching Spark's ascending order; the (flag, value)
    # pairs keep None comparable without ever comparing None to None
    keys.sort(key=lambda t: tuple((0, 0) if v is None else (1, v) for v in t))
    bounds = []
    for i in range(1, n_partitions):
        bounds.append(keys[(i * len(keys)) // n_partitions])
    return sorted(set(bounds), key=lambda t: tuple(
        (0, 0) if v is None else (1, v) for v in t
    ))


def global_rank(
    df: DataFrame,
    order_by: list[str],
    n_partitions: int = 16,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Append ``rank_col`` = the row's 1-based position in the total order
    of ``order_by`` (which MUST be a total order — include a unique
    tiebreak column last, or equal rows get an arbitrary but still
    consistent order within their range).

    Cost: one bounded sample job, one hash exchange on the computed range
    id (the unavoidable cost of any global order), one local sort, one
    bounded count job, zero window exchanges, zero retained storage.
    """
    cols = list(df.columns)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    bounds = _sample_boundaries(df, order_by, n_partitions)
    key = F.struct(*[F.col(c) for c in order_by])
    pid = F.lit(0)
    for b in bounds:
        lit_b = F.struct(
            *[F.lit(v).cast(dtypes[c]).alias(c) for c, v in zip(order_by, b)]
        )
        pid = pid + F.when(key >= lit_b, 1).otherwise(0)
    with_pid = df.withColumn("_pid", pid.cast("int"))
    parts = with_pid.repartition(max(len(bounds) + 1, 1), "_pid")
    parts = parts.sortWithinPartitions("_pid", *order_by)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(parts.schema.fields) + [T.StructField("_lrank", T.LongType())]
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # hash partitioning may co-locate several range ids in one task;
        # ranks restart per range id, in the (already sorted) stream order
        seen: dict[int, int] = {}
        for pdf in batches:
            pdf = pdf.copy()
            lranks = []
            for p in pdf["_pid"]:
                seen[p] = seen.get(p, 0) + 1
                lranks.append(seen[p])
            pdf["_lrank"] = pd.Series(lranks, index=pdf.index, dtype="int64")
            yield pdf

    numbered = parts.mapInPandas(number, schema=out_schema)
    # one bounded job: rows per range -> cumulative offsets. The lineage
    # is deterministic (literal boundaries, hash exchange, total-order
    # sort), so the count job and the result can recompute independently
    # and still agree — nothing needs to be pinned.
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
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]
    off_expr = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    return numbered.select(
        *cols, (F.col("_lrank") + off_expr[F.col("_pid")]).alias(rank_col)
    )
