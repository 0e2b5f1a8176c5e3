"""Versioned-table layer (MERGE / DELETE WHERE / replaceWhere / time
travel) — the sandbox stand-in for Delta/Iceberg semantics mapped in
SURVEY §1.4 (S4 version lineage, ST2 idempotent upsert, S13 prefix
delete)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_pipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, tag string, val double"
    )
    t.write(base)
    return t


def _state(t, version=None):
    return sorted(tuple(r) for r in t.read(version).collect())


def test_write_creates_version_zero(table):
    assert table.latest_version() == 0
    assert len(_state(table)) == 3
    assert table.history()[0]["op"] == "write"


def test_merge_updates_and_inserts(table, spark):
    updates = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "id long, tag string, val double"
    )
    v = table.merge(updates, keys=["id"])
    assert v == 1
    assert _state(table) == [(1, "a", 10.0), (2, "B", 22.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_merge_is_idempotent(table, spark):
    updates = spark.createDataFrame([(2, "B", 22.0)], "id long, tag string, val double")
    table.merge(updates, keys=["id"])
    first = _state(table)
    table.merge(updates, keys=["id"])  # at-least-once re-delivery
    assert _state(table) == first


def test_time_travel_reads_old_versions(table, spark):
    updates = spark.createDataFrame([(1, "A", 11.0)], "id long, tag string, val double")
    table.merge(updates, keys=["id"])
    assert _state(table, version=0) == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
    assert (1, "A", 11.0) in _state(table, version=1)
    ops = [h["op"] for h in table.history()]
    assert ops == ["write", "merge"]


def test_delete_where_keeps_null_predicate_rows(table, spark):
    extra = spark.createDataFrame([(9, None, 90.0)], "id long, tag string, val double")
    table.merge(extra, keys=["id"])
    table.delete_where(F.col("tag") < "c")  # NULL tag -> predicate NULL -> kept
    tags = {r[1] for r in _state(table)}
    assert tags == {"c", None}


def test_replace_where_swaps_partition(table, spark):
    repl = spark.createDataFrame([(3, "c", 33.0), (5, "c", 55.0)], "id long, tag string, val double")
    table.replace_where(repl, F.col("tag") == "c")
    assert _state(table) == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 33.0), (5, "c", 55.0)]


def test_read_missing_version_raises(table):
    with pytest.raises(ValueError):
        table.read(version=7)
