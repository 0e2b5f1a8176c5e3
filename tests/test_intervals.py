"""Bucketed interval-join semantics: exactness vs a naive theta join,
boundary rules, bucket-width invariance, and the gap-fill query's axis."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.intervals import interval_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _points(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),
            (2, _ts("2024-01-01 00:05:00")),
            (3, _ts("2024-01-01 00:10:00")),  # exactly at i10's end
            (4, _ts("2024-01-01 03:00:00")),
            (5, _ts("2024-01-02 00:00:01")),
        ],
        "p_id long, p_ts timestamp",
    )


def _intervals(spark):
    return spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:10:00")),
            (11, _ts("2024-01-01 00:04:00"), _ts("2024-01-01 00:06:00")),
            (12, _ts("2024-01-01 02:59:00"), _ts("2024-01-01 03:01:00")),
            (13, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00")),  # spans many buckets
        ],
        "i_id long, start timestamp, end timestamp",
    )


def _pairs(df):
    return {(r["p_id"], r["i_id"]) for r in df.select("p_id", "i_id").collect()}


class TestIntervalJoin:
    def test_matches_naive_theta_join(self, spark):
        p, i = _points(spark), _intervals(spark)
        got = _pairs(interval_join(p, i, "p_ts", "start", "end", bucket_width_s=600))
        naive = _pairs(
            p.join(i, (F.col("start") <= F.col("p_ts")) & (F.col("p_ts") < F.col("end")))
        )
        assert got == naive
        # point 3 sits exactly at i10's end -> excluded under closed="left"
        assert (3, 10) not in got
        assert (1, 10) in got and (2, 11) in got and (4, 12) in got

    def test_closed_both_includes_end(self, spark):
        got = _pairs(
            interval_join(
                _points(spark), _intervals(spark), "p_ts", "start", "end",
                bucket_width_s=600, closed="both",
            )
        )
        assert (3, 10) in got and (3, 13) in got

    @pytest.mark.parametrize("width", [1, 60, 3600, 86400])
    def test_bucket_width_invariance(self, spark, width):
        # the bucket size is a performance knob, never a semantics knob
        got = _pairs(
            interval_join(
                _points(spark), _intervals(spark), "p_ts", "start", "end",
                bucket_width_s=width,
            )
        )
        assert got == _pairs(
            interval_join(
                _points(spark), _intervals(spark), "p_ts", "start", "end",
                bucket_width_s=600,
            )
        )

    def test_no_duplicate_pairs_across_buckets(self, spark):
        # interval 13 spans 145 ten-minute buckets; each contained point
        # must still appear exactly once
        out = interval_join(
            _points(spark), _intervals(spark), "p_ts", "start", "end", bucket_width_s=600
        ).where(F.col("i_id") == 13)
        rows = [r["p_id"] for r in out.collect()]
        assert sorted(rows) == [1, 2, 3, 4]  # 3 is inside; 5 is past the end

    def test_column_collision_rejected(self, spark):
        p = _points(spark).withColumnRenamed("p_ts", "start")
        with pytest.raises(ValueError, match="collision"):
            interval_join(p, _intervals(spark), "start", "start", "end", 600)

    def test_bad_closed_rejected(self, spark):
        with pytest.raises(ValueError, match="closed"):
            interval_join(
                _points(spark), _intervals(spark), "p_ts", "start", "end", 600,
                closed="right",
            )


class TestGapFill:
    def test_axis_dense_and_ffill_total(self, spark, sf_dir):
        from data_etl_pipeline_spark.plans import all_queries

        out = all_queries()["event_type_hourly_gap_fill"](spark, sf_dir).collect()
        by_type: dict[str, list] = {}
        for r in out:
            by_type.setdefault(r["event_type"], []).append(r)
        for rows in by_type.values():
            rows.sort(key=lambda r: r["hr"])
            # dense hourly axis: consecutive rows are exactly 1h apart
            for a, b in zip(rows, rows[1:]):
                assert (b["hr"] - a["hr"]).total_seconds() == 3600
            # first row of each key is a data hour; ffill never null after it
            assert rows[0]["n_events"] > 0
            assert all(r["ffill_avg_value"] is not None for r in rows)
            # zero-filled hours carry no fresh average
            assert all(
                (r["n_events"] == 0) == (r["hr_avg_value"] is None) for r in rows
            )


def test_interval_join_falls_back_to_shuffled_join_past_broadcast(spark):
    """The designed scale path: when the interval side outgrows the
    broadcast threshold the bucket equi-join becomes a shuffled
    SortMergeJoin — never a nested loop."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = interval_join(
            _points(spark), _intervals(spark), "p_ts", "start", "end", 600
        )
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
        # semantics unchanged under the shuffled strategy
        assert _pairs(out) == _pairs(
            _points(spark).join(
                _intervals(spark),
                (F.col("start") <= F.col("p_ts")) & (F.col("p_ts") < F.col("end")),
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
