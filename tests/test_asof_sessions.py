"""As-of join edge cases and sessionization gap-boundary semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.asof import asof_join
from data_etl_pipeline_spark.plans.planassert import formatted_plan


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        left = spark.createDataFrame(left_rows, "k long, ts timestamp, ev string")
        right = spark.createDataFrame(right_rows, "k long, rts timestamp, rid long, tag string")
        return {
            (r["k"], r["ev"]): (r["rid"], r["tag"])
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                payload_cols=["rid", "tag"], tiebreak="rid",
            ).collect()
        }

    def test_picks_latest_at_or_before(self, spark):
        out = self._run(
            spark,
            [(1, _ts("2024-01-10 00:00:00"), "e1")],
            [
                (1, _ts("2024-01-01 00:00:00"), 10, "old"),
                (1, _ts("2024-01-09 00:00:00"), 11, "latest"),
                (1, _ts("2024-01-11 00:00:00"), 12, "future"),
            ],
        )
        assert out[(1, "e1")] == (11, "latest")

    def test_exact_timestamp_match_is_visible(self, spark):
        out = self._run(
            spark,
            [(1, _ts("2024-01-09 00:00:00"), "e1")],
            [(1, _ts("2024-01-09 00:00:00"), 11, "same-instant")],
        )
        assert out[(1, "e1")] == (11, "same-instant")

    def test_timestamp_tie_resolves_to_max_tiebreak(self, spark):
        out = self._run(
            spark,
            [(1, _ts("2024-01-10 00:00:00"), "e1")],
            [
                (1, _ts("2024-01-09 00:00:00"), 11, "low"),
                (1, _ts("2024-01-09 00:00:00"), 13, "high"),
                (1, _ts("2024-01-09 00:00:00"), 12, "mid"),
            ],
        )
        assert out[(1, "e1")] == (13, "high")

    def test_no_prior_row_yields_nulls(self, spark):
        out = self._run(
            spark,
            [(1, _ts("2024-01-01 00:00:00"), "e1"), (2, _ts("2024-01-01 00:00:00"), "e2")],
            [(1, _ts("2024-01-02 00:00:00"), 11, "after")],
        )
        assert out[(1, "e1")] == (None, None)
        assert out[(2, "e2")] == (None, None)

    def test_keys_do_not_leak_across_groups(self, spark):
        out = self._run(
            spark,
            [(1, _ts("2024-01-10 00:00:00"), "e1"), (2, _ts("2024-01-10 00:00:00"), "e2")],
            [
                (1, _ts("2024-01-05 00:00:00"), 11, "k1"),
                (2, _ts("2024-01-06 00:00:00"), 21, "k2"),
            ],
        )
        assert out[(1, "e1")] == (11, "k1")
        assert out[(2, "e2")] == (21, "k2")


class TestSessionGapBoundary:
    def _sessions(self, spark, rows, gap="10 minutes"):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        return sorted(
            (r["session_start"], r["n_events"])
            for r in df.groupBy("user_id", F.session_window("ts", gap))
            .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
            .collect()
        )

    def test_event_within_gap_extends_session(self, spark):
        rows = [
            (1, _ts("2024-01-01 00:00:00"), 1.0),
            (1, _ts("2024-01-01 00:09:59"), 1.0),
            (1, _ts("2024-01-01 00:19:58"), 1.0),  # chained extension
        ]
        assert self._sessions(spark, rows) == [(_ts("2024-01-01 00:00:00"), 3)]

    def test_event_at_exact_gap_extends_session(self, spark):
        # Spark merges an event at exactly last + gap into the running
        # session (new session only when the gap is strictly exceeded).
        # The oracle SQL in plans/advanced.py encodes the same `> gap`
        # rule — this test pins the boundary so both stay in sync.
        rows = [
            (1, _ts("2024-01-01 00:00:00"), 1.0),
            (1, _ts("2024-01-01 00:10:00"), 1.0),
        ]
        assert self._sessions(spark, rows) == [(_ts("2024-01-01 00:00:00"), 2)]

    def test_just_past_gap_starts_new_session(self, spark):
        rows = [
            (1, _ts("2024-01-01 00:00:00"), 1.0),
            (1, _ts("2024-01-01 00:10:00.000001"), 1.0),
        ]
        assert self._sessions(spark, rows) == [
            (_ts("2024-01-01 00:00:00"), 1),
            (_ts("2024-01-01 00:10:00.000001"), 1),
        ]

    def test_users_sessionize_independently(self, spark):
        rows = [
            (1, _ts("2024-01-01 00:00:00"), 1.0),
            (2, _ts("2024-01-01 00:05:00"), 1.0),
        ]
        assert self._sessions(spark, rows) == [
            (_ts("2024-01-01 00:00:00"), 1),
            (_ts("2024-01-01 00:05:00"), 1),
        ]


class TestAsofVariants:
    def test_forward_direction(self, spark):
        left = spark.createDataFrame(
            [(1, 10.0), (2, 50.0), (3, 100.0)], "lid long, t double"
        )
        right = spark.createDataFrame(
            [(1, 20.0, "a"), (1, 60.0, "b"), (3, 90.0, "c")],
            "lid long, t double, v string",
        )
        from data_etl_pipeline_spark.operators.asof import asof_join

        out = {r["lid"]: r["v"] for r in asof_join(
            left.withColumnRenamed("lid", "k"),
            right.withColumnRenamed("lid", "k"),
            on="k", left_ts="t", right_ts="t",
            payload_cols=["v"], tiebreak="v", direction="forward",
        ).withColumnRenamed("k", "lid").collect()}
        assert out[1] == "a"   # earliest right at/after t=10 is t=20
        assert out[2] is None  # key 2: no right rows at all
        assert out[3] is None  # key 3: right at 90 < 100, none forward

    def test_tolerance_reverts_stale_match(self, spark):
        left = spark.createDataFrame([(1, 100.0), (1, 200.0)], "k long, t double")
        right = spark.createDataFrame([(1, 95.0, "r")], "k long, t double, v string")
        from data_etl_pipeline_spark.operators.asof import asof_join

        out = sorted(
            (r["t"], r["v"])
            for r in asof_join(
                left, right, on="k", left_ts="t", right_ts="t",
                payload_cols=["v"], tiebreak="v", tolerance_seconds=10,
            ).collect()
        )
        assert out == [(100.0, "r"), (200.0, None)]  # 105s back > 10s bound

    def test_direction_validation(self, spark):
        from data_etl_pipeline_spark.operators.asof import asof_join

        df = spark.createDataFrame([(1, 1.0)], "k long, t double")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="direction"):
            asof_join(df, df, on="k", left_ts="t", right_ts="t",
                      payload_cols=["t"], tiebreak="t", direction="sideways")

    def test_nearest_matches_pandas_semantics(self, spark):
        from data_etl_pipeline_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, 10.0, "a"), (1, 14.0, "b"), (1, 25.0, "c"), (2, 5.0, "d")],
            "k long, t double, tag string",
        )
        right = spark.createDataFrame(
            [(1, 8.0, 100), (1, 18.0, 200), (1, 18.0, 201), (3, 1.0, 900)],
            "k long, t double, val int",
        )
        out = {
            r["tag"]: r["val"]
            for r in asof_join(
                left, right, on="k", left_ts="t", right_ts="t",
                payload_cols=["val"], tiebreak="val", direction="nearest",
            ).collect()
        }
        assert out["a"] == 100   # gap 2 back vs 8 fwd
        # 'b' at 14: gap 6 back (8.0) vs 4 fwd (18.0) -> forward; among the
        # two rows at 18.0 the greatest tiebreak wins
        assert out["b"] == 201
        assert out["c"] == 201   # only backward exists; greatest tiebreak
        assert out["d"] is None  # key 2 has no right rows at all

    def test_nearest_tie_goes_backward_and_tolerance_applies(self, spark):
        from data_etl_pipeline_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10.0, "x"), (1, 50.0, "y")], "k long, t double, tag string")
        right = spark.createDataFrame(
            [(1, 7.0, 1), (1, 13.0, 2)], "k long, t double, val int"
        )
        out = {
            r["tag"]: r["val"]
            for r in asof_join(
                left, right, on="k", left_ts="t", right_ts="t",
                payload_cols=["val"], tiebreak="val", direction="nearest",
                tolerance_seconds=5.0,
            ).collect()
        }
        assert out["x"] == 1      # equal gaps (3) -> backward candidate
        assert out["y"] is None   # nearest is 37 away, beyond tolerance

    def test_nearest_plan_has_one_exchange(self, spark):
        from data_etl_pipeline_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10.0)], "k long, t double")
        right = spark.createDataFrame([(1, 8.0, 5)], "k long, t double, val int")
        df = asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            payload_cols=["val"], tiebreak="val", direction="nearest",
        )
        plan = formatted_plan(df)
        # both running matches share the one exchange on _k: the detail
        # section lists exactly one Exchange node and two Window nodes
        # (two in-partition sort orders, one shuffle)
        import re as _re

        assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1
        assert len(_re.findall(r"\(\d+\) Window", plan)) == 2


class TestResampleLocf:
    """resample_locf: fixed-step grid per key, LOCF fill, no NULL holes.
    Round-7 ADVICE fix: the grid starts at the bucket CEILING of the first
    observation — a floor start preceded every observation whenever the
    first one was off-boundary, yielding a NULL first grid point."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k string, ts timestamp, v double, tb long")

    def test_unaligned_first_timestamp_has_no_null_hole(self, spark):
        from data_etl_pipeline_spark.operators.asof import resample_locf

        rows = [
            # first obs at 00:10 — NOT on the 1h grid; grid starts 01:00
            ("a", datetime(2024, 1, 1, 0, 10), 1.0, 1),
            ("a", datetime(2024, 1, 1, 2, 30), 2.0, 2),
            ("a", datetime(2024, 1, 1, 4, 0), 3.0, 3),
        ]
        out = resample_locf(
            self._df(spark, rows), "k", "ts", "v", "tb", step_seconds=3600
        ).collect()
        got = {r["grid_ts"]: r["v"] for r in out}
        assert got == {
            datetime(2024, 1, 1, 1): 1.0,
            datetime(2024, 1, 1, 2): 1.0,
            datetime(2024, 1, 1, 3): 2.0,
            datetime(2024, 1, 1, 4): 3.0,
        }
        assert all(r["v"] is not None for r in out)

    def test_aligned_first_timestamp_keeps_its_grid_point(self, spark):
        from data_etl_pipeline_spark.operators.asof import resample_locf

        rows = [
            ("a", datetime(2024, 1, 1, 1, 0), 5.0, 1),
            ("a", datetime(2024, 1, 1, 3, 0), 7.0, 2),
        ]
        out = resample_locf(
            self._df(spark, rows), "k", "ts", "v", "tb", step_seconds=3600
        ).collect()
        got = {r["grid_ts"]: r["v"] for r in out}
        assert got == {
            datetime(2024, 1, 1, 1): 5.0,
            datetime(2024, 1, 1, 2): 5.0,
            datetime(2024, 1, 1, 3): 7.0,
        }

    def test_key_within_single_step_emits_no_rows(self, spark):
        from data_etl_pipeline_spark.operators.asof import resample_locf

        # both observations strictly inside (01:00, 02:00) — no grid point
        # lands within the observed span
        rows = [
            ("a", datetime(2024, 1, 1, 1, 10), 1.0, 1),
            ("a", datetime(2024, 1, 1, 1, 50), 2.0, 2),
        ]
        out = resample_locf(
            self._df(spark, rows), "k", "ts", "v", "tb", step_seconds=3600
        ).collect()
        assert out == []

    def test_timestamp_tie_takes_greatest_tiebreak(self, spark):
        from data_etl_pipeline_spark.operators.asof import resample_locf

        rows = [
            ("a", datetime(2024, 1, 1, 1, 0), 1.0, 1),
            ("a", datetime(2024, 1, 1, 1, 0), 9.0, 2),
            ("a", datetime(2024, 1, 1, 2, 0), 3.0, 3),
        ]
        out = resample_locf(
            self._df(spark, rows), "k", "ts", "v", "tb", step_seconds=3600
        ).collect()
        got = {r["grid_ts"]: r["v"] for r in out}
        assert got[datetime(2024, 1, 1, 1)] == 9.0
