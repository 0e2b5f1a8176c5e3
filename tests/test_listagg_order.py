"""listagg WITHIN GROUP (nation_top_customer_roster): the emitted string
must follow the WITHIN GROUP order key, never partition/arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_listagg_ignores_arrival_order(spark):
    rows = [("g", i, name) for i, name in [(3, "c"), (1, "a"), (2, "b"), (4, "d")]]
    # scatter across partitions so arrival order is adversarial
    df = spark.createDataFrame(rows, "g string, rk int, name string").repartition(4)
    got = df.groupBy("g").agg(
        F.expr("listagg(name, ',') WITHIN GROUP (ORDER BY rk)").alias("s")
    ).collect()
    assert got[0]["s"] == "a,b,c,d"
