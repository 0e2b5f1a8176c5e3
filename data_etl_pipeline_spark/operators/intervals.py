"""Distributed interval (range-containment) join via time bucketing.

"Which points fall inside which intervals" with NO equi-key is the one
join shape Catalyst has no hash strategy for: ``p.ts BETWEEN i.start AND
i.end`` alone plans as BroadcastNestedLoopJoin (fine only while the
interval side broadcasts) or a cartesian product. The reference engine
never grew this shape either — but a 100 TB event pipeline needs it
constantly (incident windows, maintenance windows, session boundaries,
ad-campaign flights).

Spark-first design — bucketize the time axis so the range join becomes an
equi-join:

    intervals: explode to one row per ``bucket_width``-sized bucket the
               interval overlaps (sequence(floor(start/W), floor(end/W)))
    points:    bucket = floor(ts/W)  (exactly one bucket per point)
    join on bucket (shuffle hash / sort-merge — scales out), then keep
    the exact containment predicate as a post-filter.

Each (point, interval) pair can meet in at most ONE bucket — the point
lives in exactly one — so no dedup pass is needed and the join output is
exact. Cost model: the interval side fans out by ceil(len/W)+1 rows and
each bucket holds the intervals overlapping it, so candidates per point
~= avg concurrent intervals. Pick ``bucket_width`` near the typical
interval length: W too small inflates the exploded index, W too large
piles unrelated intervals into each bucket. Both sides shuffle on the
bucket key, which is time-uniform — no hot key unless wall-clock load is
itself skewed (then AQE skew-split applies). This is the standard
bucketed range-join strategy (Databricks' range-join hints and
GeoSpark-style grids use the same trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int,
    closed: str = "left",
) -> DataFrame:
    """Join each point row to every interval row whose
    [``start_col``, ``end_col``) contains ``point_ts`` (timestamp cols).

    ``closed`` picks the boundary rule: ``"left"`` = start <= ts < end,
    ``"both"`` = start <= ts <= end. Column sets of the two inputs must be
    disjoint; the result carries all columns of both.
    """
    if bucket_width_s < 1:
        raise ValueError(
            f"bucket_width_s must be >= 1, got {bucket_width_s} (div 0 would "
            "NULL every bucket and the join would silently return nothing)"
        )
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    # unix_micros only accepts TIMESTAMP; the cast is a no-op for LTZ and a
    # fixed session-timezone shift for NTZ — fine for an internal join key
    # computed identically on both sides.
    width_us = int(bucket_width_s) * 1_000_000  # Python-side: no int32 overflow

    # integer `div`, not floor(x / w): stays in long arithmetic (codegen
    # integer op, no double rounding to reason about). div truncates toward
    # zero while floor rounds down, but any monotone non-decreasing bucket
    # function is correct here — bucket(start) <= bucket(ts) <= bucket(end)
    # whenever start <= ts <= end, so the point's bucket is always in the
    # interval's exploded range.
    def _bucket(col: str):
        return F.expr(f"unix_micros(cast(`{col}` as timestamp)) div {width_us}")

    p = points.withColumn("_ib", _bucket(point_ts))
    i = intervals.withColumn(
        "_ib", F.explode(F.sequence(_bucket(start_col), _bucket(end_col)))
    )
    upper = (
        F.col(point_ts) < F.col(end_col)
        if closed == "left"
        else F.col(point_ts) <= F.col(end_col)
    )
    return (
        p.join(i, "_ib")
        .where((F.col(start_col) <= F.col(point_ts)) & upper)
        .drop("_ib")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width_s: int,
) -> DataFrame:
    """Join every LEFT interval to every RIGHT interval it OVERLAPS
    (half-open: ``l_start < r_end AND r_start < l_end``) — the
    interval×interval sibling of :func:`interval_join`.

    Same bucketization, one extra wrinkle: an overlapping pair shares
    every bucket its intersection spans, so a plain bucket equi-join
    would emit duplicates. Instead of a distinct pass (a second shuffle
    over the pair blow-up), each pair is CLAIMED by exactly one bucket —
    the one containing ``greatest(l_start, r_start)``: both sides'
    exploded ranges always cover that bucket (it lies inside both
    intervals' spans whenever they overlap), so the pair appears there
    and the ``bucket == bucket(greatest(starts))`` post-filter keeps
    exactly one copy with no dedup shuffle.

    Scale: both sides fan out by ceil(len/W)+1 and shuffle on the
    time-uniform bucket key; candidates per bucket ~= concurrent
    intervals on each side. W near the typical interval length, as for
    interval_join.
    """
    if bucket_width_s < 1:
        raise ValueError(f"bucket_width_s must be >= 1, got {bucket_width_s}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    width_us = int(bucket_width_s) * 1_000_000

    def _bucket(col):
        return F.expr(f"unix_micros(cast({col} as timestamp)) div {width_us}")

    def _explode(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn("_ob", F.explode(F.sequence(_bucket(f"`{s}`"), _bucket(f"`{e}`"))))

    pairs = _explode(left, l_start, l_end).join(
        _explode(right, r_start, r_end).withColumnRenamed("_ob", "_ob_r"),
        F.col("_ob") == F.col("_ob_r"),
    )
    claim = _bucket(f"greatest(`{l_start}`, `{r_start}`)")
    return (
        pairs.where(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("_ob") == claim)
        )
        .drop("_ob", "_ob_r")
    )
