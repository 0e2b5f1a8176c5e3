"""UDTF TABLE(...) PARTITION BY ... ORDER BY (udtf_partitioned_sessions).

The declared query's oracle is lag/cumsum SQL; these tests pin the
boundary semantics the oracle comparison could mask:
  * a gap of EXACTLY the threshold stays in the same session (strict >),
  * equal-timestamp ties are broken by event_id identically to the
    window formulation,
  * terminate() fires once per PARTITION BY key (one output row per
    user, even for single-event users).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_etl_pipeline_spark.plans.behavior import _session_counter_udtf

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _run_udtf(spark, rows):
    spark.udtf.register("session_counter_udtf_t", _session_counter_udtf())
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    ).createOrReplaceTempView("udtf_args_t")
    return {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in spark.sql(
            """
            SELECT * FROM session_counter_udtf_t(
                TABLE(udtf_args_t)
                PARTITION BY user_id ORDER BY (ts, event_id))
            """
        ).collect()
    }


def test_exact_gap_is_same_session_and_boundaries(spark):
    gap = dt.timedelta(minutes=90)
    eps = dt.timedelta(seconds=1)
    rows = [
        # user 1: second event exactly at the 90-min boundary -> SAME session
        (1, T0, 1),
        (1, T0 + gap, 2),
        # ... third event one second past the boundary -> NEW session
        (1, T0 + gap + gap + eps, 3),
        # user 2: single event -> one session, one row
        (2, T0, 4),
    ]
    got = _run_udtf(spark, rows)
    assert got == {1: (3, 2), 2: (1, 1)}


def test_ties_and_ordering_match_window_formulation(spark):
    # adversarial frame: duplicate timestamps, reversed event_id arrival,
    # gaps alternating around the threshold
    rows = []
    eid = 0
    for u in range(1, 6):
        t = T0
        for i in range(20):
            eid += 1
            rows.append((u, t, eid))
            if i % 4 == 3:
                rows.append((u, t, eid + 1000))  # same-ts tie
            t += dt.timedelta(minutes=(100 if i % 3 == 0 else 80))
    got = _run_udtf(spark, rows)

    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    want_df = (
        df.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("long") - F.col("prev").cast("long")
                    > 90 * 60
                )
            ).cast("long"),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("new_s").alias("s"))
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in want_df.collect()}
    assert got == want and len(got) == 5
