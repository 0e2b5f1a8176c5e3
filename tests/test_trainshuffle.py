"""Deterministic training shuffle (operators/trainshuffle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.trainshuffle import (
    deterministic_shard_shuffle,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).selectExpr("id AS k")


def test_positions_equal_naive_window(spark, keys):
    """The two-phase bucket+offset ranks must equal the naive
    ROW_NUMBER-per-shard ranks exactly (the seam-closing property)."""
    got = deterministic_shard_shuffle(keys, "k", seed="s1", n_shards=4)
    h = "cast(conv(substr(md5(concat('s1:{t}:', k)), 1, 15), 16, 10) as bigint)"
    naive = (
        keys.select(
            "k",
            F.expr(h.format(t="s") + " % 4").alias("shard"),
            F.expr(h.format(t="o")).alias("ok"),
        )
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("shard").orderBy("ok", "k")).cast("long"),
        )
        .select("k", "shard", "pos")
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_deterministic_and_epoch_sensitive(keys):
    a = deterministic_shard_shuffle(keys, "k", seed="ep0", n_shards=8)
    b = deterministic_shard_shuffle(keys, "k", seed="ep0", n_shards=8)
    assert a.exceptAll(b).count() == 0  # reproducible
    c = deterministic_shard_shuffle(keys, "k", seed="ep1", n_shards=8)
    # a different epoch seed re-orders (at least one rank moves)
    assert a.exceptAll(c).count() > 0


def test_positions_are_dense_per_shard(keys):
    out = deterministic_shard_shuffle(keys, "k", seed="z", n_shards=4)
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"),
        F.max("pos").alias("hi"), F.countDistinct("pos").alias("d"),
    )
    for r in per.collect():
        assert (r["lo"], r["hi"], r["d"]) == (1, r["n"], r["n"])
    assert out.count() == 2000


def test_bucket_count_validation(keys):
    with pytest.raises(ValueError, match="power of two"):
        deterministic_shard_shuffle(keys, "k", seed="s", n_shards=4, order_buckets=12)
