"""CUSUM via the max-drawdown identity: equivalence to the sequential
recurrence, detection of an injected mean shift, and the one-exchange/
two-window plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.drift import cusum_scores
from data_etl_pipeline_spark.plans.planassert import executed_plan, formatted_plan


def _recurrence(devs):
    s, out = 0, []
    for d in devs:
        s = max(0, s + d)
        out.append(s)
    return out


def test_matches_sequential_recurrence_on_random_series(spark):
    rng = random.Random(7)
    rows = []
    truth = {}
    for key in ("a", "b", "c"):
        devs = [rng.randint(-50, 50) for _ in range(200)]
        truth[key] = _recurrence(devs)
        rows += [(key, i, d) for i, d in enumerate(devs)]
    df = spark.createDataFrame(rows, "k string, i long, d long")
    got = cusum_scores(df, ["k"], ["i"], "d").collect()
    for r in got:
        assert r["cusum"] == truth[r["k"]][r["i"]], (r["k"], r["i"])


def test_all_negative_series_pins_at_zero(spark):
    df = spark.createDataFrame([("a", i, -5) for i in range(10)], "k string, i long, d long")
    assert all(r["cusum"] == 0 for r in cusum_scores(df, ["k"], ["i"], "d").collect())


def test_injected_mean_shift_raises_score_after_shift_only(spark):
    # flat series at the mean (d=0), then a sustained +10 shift
    rows = [("a", i, 0 if i < 50 else 10) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, i long, d long")
    got = {r["i"]: r["cusum"] for r in cusum_scores(df, ["k"], ["i"], "d").collect()}
    assert all(got[i] == 0 for i in range(50))
    assert got[99] == 500  # accumulates linearly after the change point


def test_plan_is_one_exchange_two_windows(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, i long, d long")
    out = cusum_scores(df, ["k"], ["i"], "d")
    plan = formatted_plan(out)
    tree = plan.split("\n\n")[0]  # operator tree only (detail repeats nodes)
    assert tree.count("Exchange") == 1
    assert tree.count("Window") == 2
