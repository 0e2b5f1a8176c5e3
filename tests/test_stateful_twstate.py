"""transformWithStateInPandas user-profile operator (streaming/stateful.py).

The operator's Python worker needs the `protobuf` runtime (pyspark's
transform_with_state_driver_worker imports generated StateMessage_pb2
modules), which this container does not ship — so the real-execution
test SKIPS here and runs on any standard cluster image. The seam test
below always runs: it proves the operator fails loudly with the
documented NotImplementedError instead of crashing the stream worker
with an opaque ImportError.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not _has_protobuf(), reason="protobuf runtime not installed")
def test_twstate_profile_matches_batch_rollup(spark):
    from data_etl_pipeline_spark.streaming.stateful import (
        run_stream_user_profile_twstate,
    )
    from data_etl_pipeline_spark.tables import load

    got = run_stream_user_profile_twstate(spark, SF)
    want = (
        load(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.max("ts").alias("last_ts"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.skipif(_has_protobuf(), reason="protobuf present: operator runs")
def test_twstate_refuses_loudly_without_protobuf(spark):
    from data_etl_pipeline_spark.streaming.stateful import (
        run_stream_user_profile_twstate,
    )

    with pytest.raises(NotImplementedError, match="protobuf runtime"):
        run_stream_user_profile_twstate(spark, SF)


def test_episode_ttl_matches_native_session_window(spark, sf_dir):
    """Engine-vs-engine: the EventTimeTimeout episode operator must agree
    row-for-row with Spark's native session_window at the same 24h gap —
    two independent engine paths, no oracle in the loop. Also proves the
    timeout path fired (closed_by surviving rows carry the assert inside
    the runner)."""
    from pyspark.sql import functions as F

    from data_etl_pipeline_spark.streaming.stateful import run_stream_episodes_ttl
    from data_etl_pipeline_spark.tables import load

    got = {
        (r["user_id"], r["episode_start"], r["episode_end"], r["n_events"], r["n_types"])
        for r in run_stream_episodes_ttl(spark, sf_dir, ttl_hours=24).collect()
    }
    want = {
        (r["user_id"], r["episode_start"], r["episode_end"], r["n_events"], r["n_types"])
        for r in (
            load(spark, sf_dir, "events")
            .groupBy("user_id", F.session_window(F.col("ts").cast("timestamp"), "24 hours"))
            .agg(
                F.min("ts").alias("episode_start"),
                F.max("ts").alias("episode_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("event_type").alias("n_types"),
            )
            .select("user_id", "episode_start", "episode_end", "n_events", "n_types")
            .collect()
        )
    }
    assert got == want
