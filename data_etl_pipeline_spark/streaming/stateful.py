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


def _encode_set(seen: set[str]) -> str:
    """JSON-encode a string set for a StringType state slot: unlike a
    separator-joined string, this round-trips the empty string and values
    containing ANY separator byte, and encodes the empty SET as '[]' —
    distinct from a never-written slot."""
    import json

    return json.dumps(sorted(seen))


def _decode_set(joined: str | None) -> set[str]:
    """Decode a state slot written by :func:`_encode_set`. Falls back to
    the pre-JSON on-disk format (\\x1f-joined values) so a streaming query
    resumed from a checkpoint written by the older codec keeps its state
    instead of crashing in ``json.loads``; every state.update() rewrites
    the slot in JSON, so old-format slots age out on first touch."""
    import json

    if joined is None:
        return set()
    try:
        return set(json.loads(joined))
    except (json.JSONDecodeError, ValueError):
        return set(joined.split("\x1f")) if joined else set()


def _dedup_first_seen(key, pdf_iter, state: GroupState):
    seen: set[str] = set()
    if state.exists:
        (joined,) = state.get
        seen = _decode_set(joined)
    batch = pd.concat(list(pdf_iter), ignore_index=True)
    # a NULL event_type would put None in the seen set and crash
    # sorted() — dedup it under an unambiguous sentinel instead
    # (\x1e cannot appear in a real type)
    batch["event_type"] = batch["event_type"].fillna("\x1enull")
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    fresh = batch[~batch["event_type"].isin(seen)]
    first = fresh.drop_duplicates(subset=["event_type"], keep="first")
    seen.update(first["event_type"].tolist())
    state.update((_encode_set(seen),))
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


def _ts_ordered_batch_dir(
    spark: SparkSession, sf_dir: str, n_batches: int, prefix: str
) -> str:
    """Write events into ``n_batches`` ts-range parquet files whose mtimes
    follow ts order, so ``maxFilesPerTrigger=1`` replays the table as
    ts-ordered micro-batches — the arrival order the profile operators'
    monotone-emission contract assumes."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from data_etl_pipeline_spark.tables import load

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    src = tempfile.mkdtemp(prefix=prefix)
    ev.repartitionByRange(n_batches, "ts").write.mode("overwrite").parquet(src)
    parts = []
    for f in sorted(os.listdir(src)):
        p = os.path.join(src, f)
        if not f.endswith(".parquet"):
            os.remove(p)
            continue
        vals = pq.read_table(p, columns=["ts"])["ts"].to_pylist()
        if not vals:
            os.remove(p)
            continue
        parts.append((min(vals), p))
    for i, (_, p) in enumerate(sorted(parts)):
        os.utime(p, (1_600_000_000 + i * 10,) * 2)
    return src


# ---------------------------------------------------------------------------
# Per-user profile on applyInPandasWithState — the SAME operator the
# transformWithState variant below implements, on the arbitrary-stateful
# API this container CAN execute (applyInPandasWithState predates the
# protobuf StateMessage worker protocol that blocks transformWithState
# here). Reference semantics: ST4's stateful progression
# (extraction_node.py:127-159) — a per-key profile that accretes across
# arrivals. State per user is one tuple (n_events, distinct-type set
# JSON-encoded, last_ts); every emitted field is monotone nondecreasing
# per user, so max-per-user over the drained update-mode emissions
# reconstructs the final state exactly and the batch oracle checks it as
# COUNT(*) / COUNT(DISTINCT event_type) / MAX(ts) per user.
#
# Scale notes: state is one short tuple per user in the state store
# (RocksDB-capable, see windows.py:288), bounded by (users x distinct
# types), not stream length; each micro-batch touches only the keys it
# contains. The HDFS heap provider suffices here — unlike
# transformWithState there are no typed-state column families.
# ---------------------------------------------------------------------------

PROFILE_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("seen_types", StringType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _profile_accrete(key, pdf_iter, state: GroupState):
    n, seen, last = 0, set(), None
    if state.exists:
        n, joined, last = state.get
        seen = _decode_set(joined)
    batch = pd.concat(list(pdf_iter), ignore_index=True)
    n += len(batch)
    # NaN stays out of the distinct-type set (COUNT(DISTINCT) semantics)
    seen.update(batch["event_type"].dropna().tolist())
    mx = batch["ts"].max().to_pydatetime()
    if last is None or last < mx:
        last = mx
    state.update((n, _encode_set(seen), last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_types": [len(seen)],
            "last_ts": [last],
        }
    )


def run_stream_user_profile_apws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile via ``applyInPandasWithState`` over three
    ts-ordered micro-batches; drained update-mode emissions rolled up by
    max-per-user (every field monotone) to the final state."""
    from data_etl_pipeline_spark.streaming.windows import _align_ts_cols

    from pyspark.sql import functions as F

    src = _ts_ordered_batch_dir(spark, sf_dir, n_batches=3, prefix="apws_src_")
    name = f"apws_{uuid.uuid4().hex[:8]}"
    profiles = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("user_id")
        .applyInPandasWithState(
            _profile_accrete,
            outputStructType=TW_OUTPUT_SCHEMA,
            stateStructType=PROFILE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = profiles.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # the operator's point is CROSS-batch state: prove the stream
        # actually ran as multiple micro-batches, not one collapsed batch
        n_batches = q.lastProgress["batchId"] + 1
        assert n_batches >= 3, q.lastProgress
    finally:
        q.stop()
    drained = spark.table(name).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("n_types").alias("n_types"),
        F.max("last_ts").alias("last_ts"),
    )
    return _align_ts_cols(spark, sf_dir, drained, ["last_ts"])


# ---------------------------------------------------------------------------
# transformWithState (Spark 4): the successor API to applyInPandasWithState
# above — typed state variables (ValueState / ListState / MapState, each
# independently readable and TTL-able) instead of one opaque state tuple,
# plus processing/event-time timers. This operator maintains a per-user
# profile (event count, distinct event-type map, latest ts) across
# micro-batches and emits the updated profile on every batch the user
# appears in; each field is MONOTONE, so the drained max-per-user equals
# the final state and the batch oracle can check it exactly.
# ---------------------------------------------------------------------------

TW_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_types", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _make_processor():
    # StatefulProcessor subclass is resolved lazily: importing
    # pyspark.sql.streaming.stateful_processor at module import time
    # would make this module unimportable on Spark <4
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            # three INDEPENDENT typed state variables — the API's point:
            # each is read/updated separately in the state store instead
            # of round-tripping one monolithic tuple per key per batch
            self._n = handle.getValueState("n_events", "n BIGINT")
            self._types = handle.getMapState("types", "k STRING", "c BIGINT")
            self._last = handle.getValueState("last_ts", "ts TIMESTAMP")

        def handleInputRows(self, key, rows, timer_values):
            batch = pd.concat(list(rows), ignore_index=True)
            got = self._n.get()
            n = (got[0] if got else 0) + len(batch)
            self._n.update((n,))
            # NULLs stay out of the distinct-type map (matches
            # COUNT(DISTINCT) semantics); value_counts drops NaN
            for t, c in batch["event_type"].value_counts().items():
                prev = self._types.getValue((t,)) if self._types.containsKey((t,)) else None
                self._types.updateValue((t,), (int(c) + (prev[0] if prev else 0),))
            mx = batch["ts"].max().to_pydatetime()
            got_last = self._last.get()
            if got_last is None or got_last[0] < mx:
                self._last.update((mx,))
            n_types = sum(1 for _ in self._types.keys())
            last = self._last.get()[0]
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [n_types],
                    "last_ts": [last],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def run_stream_user_profile_twstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile via ``transformWithStateInPandas`` over three
    ts-ordered micro-batches. transformWithState REQUIRES the RocksDB
    state store provider (typed state variables are column families —
    the HDFS heap store has no such concept), so the provider conf is
    scoped around the stream like E178's. Every emitted field is
    monotone nondecreasing per user, so max-per-user over the drained
    emissions reconstructs the final state exactly — which the oracle
    checks as COUNT(*) / COUNT(DISTINCT event_type) / MAX(ts) per user.

    ENVIRONMENT SEAM: the transformWithState Python worker deserializes
    its state protocol with the `protobuf` runtime
    (pyspark/sql/streaming/proto/StateMessage_pb2). This container does
    not ship protobuf and installs are disallowed, so this operator is
    exercised by a skip-gated test (tests/test_stateful_twstate.py)
    rather than a declared driver query; on any standard cluster image
    (protobuf is a pyspark[connect] dependency) it runs as-is.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf runtime for its "
            "state-protocol messages; not available in this environment"
        ) from e
    src = _ts_ordered_batch_dir(spark, sf_dir, n_batches=3, prefix="twstate_src_")

    name = f"twstate_{uuid.uuid4().hex[:8]}"
    knob = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(knob, None)
    try:
        spark.conf.set(
            knob,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        profiles = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_make_processor(),
                outputStructType=TW_OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
        )
        q = profiles.writeStream.outputMode("append").format("memory").queryName(
            name
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if saved is None:
            spark.conf.unset(knob)
        else:
            spark.conf.set(knob, saved)
    # the memory sink table is already materialized in-session; the
    # post-drain rollup is a plain batch plan needing no special confs
    drained = spark.table(name).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("n_types").alias("n_types"),
        F.max("last_ts").alias("last_ts"),
    )
    from data_etl_pipeline_spark.streaming.windows import _align_ts_cols

    return _align_ts_cols(spark, sf_dir, drained, ["last_ts"])
