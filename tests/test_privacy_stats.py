"""k-anonymity ladder + weighted median: laws and edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.privacy import (
    kanonymity_audit,
    kanonymity_generalize,
)
from data_etl_pipeline_spark.operators.profile import weighted_median


def test_audit_counts_and_null_groups(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), (None, 3), (None, 3)],
        "qi string, x int",
    )
    got = {r["qi"]: r for r in kanonymity_audit(df, ["qi"], k=3).collect()}
    assert got["a"]["group_size"] == 3 and got["a"]["is_violation"] is False
    assert got["b"]["is_violation"] is True
    # NULL is a QI value like any other — it forms its own auditable group
    assert got[None]["group_size"] == 2 and got[None]["is_violation"] is True
    with pytest.raises(ValueError, match="k >= 2"):
        kanonymity_audit(df, ["qi"], k=1)


def test_generalize_maps_and_unmapped_to_null(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (9, "z")], "code int, p string")
    mapping = spark.createDataFrame([(1, 10), (2, 10)], "value int, general int")
    out = {r["p"]: r["code"] for r in kanonymity_generalize(df, "code", mapping).collect()}
    assert out["x"] == 10 and out["y"] == 10
    assert out["z"] is None  # unmapped generalizes to NULL, never leaks raw


def test_generalization_never_increases_violations(spark):
    import random

    rnd = random.Random(7)
    rows = [(rnd.randrange(40), rnd.randrange(3)) for _ in range(300)]
    df = spark.createDataFrame(rows, "fine int, seg int")
    mapping = spark.createDataFrame(
        [(i, i // 8) for i in range(40)], "value int, general int"
    )
    n_before = (
        kanonymity_audit(df, ["fine", "seg"], k=4).where("is_violation").count()
    )
    gen = kanonymity_generalize(df, "fine", mapping, out_col="coarse")
    n_after = (
        kanonymity_audit(gen.select("coarse", "seg"), ["coarse", "seg"], k=4)
        .where("is_violation")
        .count()
    )
    assert n_after <= n_before


def test_weighted_median_hand_cases(spark):
    df = spark.createDataFrame(
        [
            # group g1: values 1,2,3 weights 1,1,10 -> median 3
            ("g1", 1.0, 1.0), ("g1", 2.0, 1.0), ("g1", 3.0, 10.0),
            # group g2: symmetric weights -> lower middle (cum rule: first
            # value where cum*2 >= tot is 2)
            ("g2", 1.0, 1.0), ("g2", 2.0, 1.0), ("g2", 3.0, 1.0), ("g2", 4.0, 1.0),
            # group g3: tie values at the boundary accumulate TOGETHER
            ("g3", 5.0, 1.0), ("g3", 5.0, 1.0), ("g3", 9.0, 1.0),
        ],
        "g string, v double, w double",
    )
    got = {r["g"]: r["weighted_median"] for r in weighted_median(df, ["g"], "v", "w").collect()}
    assert got["g1"] == 3.0
    assert got["g2"] == 2.0
    assert got["g3"] == 5.0


def test_weighted_median_equals_plain_median_under_unit_weights(spark):
    df = spark.createDataFrame(
        [("a", float(v), 1.0) for v in range(1, 102)], "g string, v double, w double"
    )
    got = weighted_median(df, ["g"], "v", "w").collect()[0]["weighted_median"]
    assert got == 51.0


def test_weighted_median_sub_cent_weights_not_zeroed(spark):
    # round-7 ADVICE fix: decimal(18,2) weights rounded 0.004 -> 0.00,
    # erasing sub-cent weights from both sums and shifting the median.
    # With 0.004 weights live, v=2 carries 10.0 of ~10.012 total weight.
    df = spark.createDataFrame(
        [("a", 1.0, 0.004), ("a", 2.0, 10.0), ("a", 3.0, 0.008)],
        "g string, v double, w double",
    )
    got = weighted_median(df, ["g"], "v", "w").collect()[0]["weighted_median"]
    assert got == 2.0
    # all-fractional group: with scale-2 rounding every weight is 0 and the
    # where-clause degenerates (0*2 >= 0 everywhere -> min value always)
    df2 = spark.createDataFrame(
        [("a", 1.0, 0.001), ("a", 2.0, 0.001), ("a", 3.0, 0.005)],
        "g string, v double, w double",
    )
    got2 = weighted_median(df2, ["g"], "v", "w").collect()[0]["weighted_median"]
    assert got2 == 3.0


def test_weighted_median_rejects_negative_weights(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, -1.0)], "g string, v double, w double"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        weighted_median(df, ["g"], "v", "w").collect()


def test_weighted_median_keeps_full_scale_10_at_the_boundary(spark):
    # round-7 review fix: __cum * 2 used to overflow precision 38 and
    # Spark silently REDUCED the scale to 6 — weights below 1e-6 were
    # rounded away exactly at the cum*2 >= tot boundary test
    df = spark.createDataFrame(
        [("a", 1.0, 4e-7), ("a", 2.0, 1e-7), ("a", 3.0, 4e-7)],
        "g string, v double, w double",
    )
    # cum(1.0)=4e-7, tot=9e-7: 2*4e-7 < 9e-7 so v=1 must NOT qualify;
    # with scale-6 rounding both sides collapse to 0 and v=1 wins wrongly
    got = weighted_median(df, ["g"], "v", "w").collect()[0]["weighted_median"]
    assert got == 2.0


def test_weighted_median_null_weights_are_skipped_not_fatal(spark):
    df = spark.createDataFrame(
        [("a", 1.0, None), ("a", 2.0, 1.0), ("a", 3.0, 2.0)],
        "g string, v double, w double",
    )
    got = weighted_median(df, ["g"], "v", "w").collect()[0]["weighted_median"]
    assert got == 3.0  # weights 1,2 -> cum at v=3 reaches half of 3
