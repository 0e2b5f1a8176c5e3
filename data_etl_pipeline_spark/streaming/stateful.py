"""Custom stateful streaming operator: cross-batch first-occurrence dedup
via applyInPandasWithState.

Reproduces ST2/W4 semantics (at-least-once queue + first-occurrence-wins
dedup, dedup_util.py:273-307 / gpt_batch_request_service.py:521-716 in
the reference) as a Structured Streaming operator with explicit per-key
state: the state for each user is the set of event_types already seen, so
re-delivered rows and later duplicates are dropped no matter which
micro-batch they arrive in. This is the pattern the engine uses wherever
the reference relied on Mongo's unique-index upserts.

Scale notes: state is partitioned by the group key across the state
store; its size is bounded by (keys x distinct types), not by the stream
length. Rows within a batch group are sorted by (ts, event_id) so output
is deterministic and oracle-checkable.
"""

from __future__ import annotations

import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

# per-key state: the list of event_types already emitted for this user
STATE_SCHEMA = StructType([StructField("seen_types", StringType())])

_SEP = "\x1f"


def _dedup_first_seen(key, pdf_iter, state: GroupState):
    seen: set[str] = set()
    if state.exists:
        (joined,) = state.get
        if joined:
            seen = set(joined.split(_SEP))
    batch = pd.concat(list(pdf_iter), ignore_index=True)
    # a NULL event_type would put None in the seen set and crash
    # sorted()/join() — dedup it under an unambiguous sentinel instead
    # (\x1e cannot appear in a real type; \x1f is the set separator)
    batch["event_type"] = batch["event_type"].fillna("\x1enull")
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    fresh = batch[~batch["event_type"].isin(seen)]
    first = fresh.drop_duplicates(subset=["event_type"], keep="first")
    seen.update(first["event_type"].tolist())
    state.update((_SEP.join(sorted(seen)),))
    yield first[["user_id", "event_type", "event_id", "ts"]]


def run_stream_dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table and emit only the first (by ts, event_id)
    event of each (user_id, event_type), with the seen-set carried in
    keyed state across micro-batches."""
    from data_etl_pipeline_spark.streaming.windows import _events_stream

    name = f"dedup_{uuid.uuid4().hex[:8]}"
    deduped = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_first_seen,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = deduped.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
