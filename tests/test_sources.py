"""S12 CSV source/sink round-trip and F9 WKT point tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_pipeline_spark.functions.text import wkt_point_col


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    # S12: the reference drives work from CSV etld1 lists and writes orphan
    # reports back out (batch_request_orchestrator.py:329-355)
    out = str(tmp_path / "csv")
    src = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name", "c_acctbal")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).schema("c_custkey long, c_name string, c_acctbal double").csv(out)
    assert back.count() == src.count()
    a = {(r["c_custkey"], r["c_name"], r["c_acctbal"]) for r in src.collect()}
    b = {(r["c_custkey"], r["c_name"], r["c_acctbal"]) for r in back.collect()}
    assert a == b


def test_wkt_point_bounds(spark):
    df = spark.createDataFrame(
        [(1, -122.4, 37.8), (2, -200.0, 37.8), (3, 10.0, 95.0), (4, 0.0, 0.0)],
        "id long, lng double, lat double",
    )
    out = {r["id"]: r["wkt"] for r in df.select("id", wkt_point_col("lng", "lat").alias("wkt")).collect()}
    assert out[1] == "POINT(-122.4 37.8)"
    assert out[2] is None  # lng out of bounds
    assert out[3] is None  # lat out of bounds
    assert out[4] == "POINT(0.0 0.0)"
