"""Structured Streaming over the events table (SURVEY §2.9).

The reference's streaming is queue-driven micro-batching (SQS poll ->
process -> delete, at-least-once, idempotent upserts). Spark-first mapping:

  * the queue is a file/rate/Kafka source — here the events parquet read
    as a stream with maxFilesPerTrigger to force real micro-batches;
  * windowed aggregation replaces the hand-rolled stats counters;
  * foreachBatch + idempotent keyed writes reproduce ST2's
    at-least-once + upsert contract;
  * stream-static joins reproduce J11 (each queue item enriched from the
    Manufacturer table before processing).

Streams run to completion with processAllAvailable() so batch-vs-stream
equivalence is testable hermetically.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_pipeline_spark.tables import load


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    batch = load(spark, sf_dir, "events")  # sets nanosAsLong + ts conversion
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source requires a directory: stream the sf dir with a
    # glob filter selecting only the events file
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    _ = batch
    return stream


def run_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts computed BY A STREAMING QUERY, returned as a
    batch DataFrame once the stream drains. Matches the batch plan
    hourly_event_stats (same grouping) — the equivalence the tests assert.
    """
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization: gap-based session windows with a
    watermark, computed by a streaming query and returned once the stream
    drains. Session merging is Spark's native session_window state store
    path — the streaming twin of the batch ``user_sessions_gap`` query
    (same 6-hour gap, same aggregates), which the oracle checks.

    Scale note: state is partitioned by user key; the watermark bounds
    state retention so a 100 TB/day stream evicts closed sessions instead
    of accumulating them.
    """
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "6 hours").alias("sw"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 stream-static join: each streamed event enriched against the
    static customer dimension (user_id -> c_custkey), then counted per
    market segment via foreachBatch into an idempotent keyed sink."""
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = _events_stream(spark, sf_dir).join(F.broadcast(customer), "user_id", "inner")

    sink_name = f"enriched_{uuid.uuid4().hex[:8]}"
    acc: dict[tuple, int] = {}

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        # idempotent keyed merge (ST2): re-delivery of a micro-batch
        # overwrites the same keys rather than double counting
        for row in batch_df.groupBy("c_mktsegment", "event_type").agg(F.count(F.lit(1)).alias("n")).collect():
            key = (row["c_mktsegment"], row["event_type"], epoch_id)
            acc[key] = row["n"]

    q = enriched.writeStream.foreachBatch(upsert).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = [(seg, et, int(n)) for (seg, et, _), n in sorted(acc.items())]
    out = spark.createDataFrame(rows, "c_mktsegment string, event_type string, n long")
    out.createOrReplaceTempView(sink_name)
    return out.groupBy("c_mktsegment", "event_type").agg(F.sum("n").alias("n"))
