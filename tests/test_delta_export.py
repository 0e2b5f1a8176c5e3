"""Delta snapshot export: protocol shape, partition layout, refusal."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_etl_pipeline_spark.sources.delta_export import DeltaExportError, export_delta
from data_etl_pipeline_spark.sources.delta_reader import DeltaLogReader


def test_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", "x y"), (3, "c", "z")],
        "id long, val string, day string",
    )
    dest = str(tmp_path / "t")
    acct = export_delta(df, dest, partition_by=["day"])
    assert acct["n_files"] >= 2  # one file per partition minimum
    back = DeltaLogReader(spark, dest).read()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    # partition dirs exist; data files do NOT carry the partition column
    part_dirs = [d for d in os.listdir(dest) if d.startswith("day=")]
    assert len(part_dirs) == 2
    sample = next(
        os.path.join(dest, part_dirs[0], f)
        for f in os.listdir(os.path.join(dest, part_dirs[0]))
        if f.endswith(".parquet")
    )
    assert "day" not in spark.read.parquet(sample).columns


def test_log_shape_is_protocol_correct(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    dest = str(tmp_path / "t2")
    export_delta(df, dest)
    commit = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(line) for line in open(commit)]
    assert "protocol" in actions[0] and actions[0]["protocol"]["minReaderVersion"] == 1
    assert "metaData" in actions[1]
    meta = actions[1]["metaData"]
    assert meta["partitionColumns"] == []
    assert json.loads(meta["schemaString"])["type"] == "struct"
    adds = [a["add"] for a in actions[2:]]
    assert adds
    for a in adds:
        full = os.path.join(dest, a["path"])
        assert os.path.getsize(full) == a["size"]  # real sizes, not stubs


def test_refuses_existing_delta_table(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    dest = str(tmp_path / "t3")
    export_delta(df, dest)
    with pytest.raises(DeltaExportError, match="existing Delta table"):
        export_delta(df, dest)


def test_encoded_partition_values_roundtrip(spark, tmp_path):
    # a partition value with a space must percent-encode in add.path and
    # decode back to the same literal
    df = spark.createDataFrame([(1, "two words"), (2, "plain")], "id long, p string")
    dest = str(tmp_path / "t4")
    export_delta(df, dest, partition_by=["p"])
    back = DeltaLogReader(spark, dest).read()
    assert {r["p"] for r in back.collect()} == {"two words", "plain"}
    commit = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    raw = open(commit).read()
    assert "two%20words" in raw


def test_empty_snapshot_exports_readable_empty_table(spark, tmp_path):
    # an empty DataFrame must still produce a protocol-valid table (log
    # with protocol+metaData, zero adds) that reads back as zero rows
    # with the declared schema
    df = spark.createDataFrame([], "id long, val string")
    dest = str(tmp_path / "tempty")
    acct = export_delta(df, dest)
    assert acct["n_files"] >= 0
    back = DeltaLogReader(spark, dest).read()
    assert back.count() == 0
    assert back.columns == ["id", "val"]


def test_export_then_reexport_roundtrip_preserves_values(spark, tmp_path):
    # export -> read -> export again -> read: double roundtrip keeps
    # values and schema bit-stable (no accumulation of partition/URI
    # artifacts)
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "id long, s string, v double"
    )
    d1 = str(tmp_path / "t1")
    d2 = str(tmp_path / "t2")
    export_delta(df, d1)
    mid = DeltaLogReader(spark, d1).read()
    export_delta(mid, d2)
    final = DeltaLogReader(spark, d2).read()
    assert {tuple(r) for r in final.collect()} == {tuple(r) for r in df.collect()}


class TestIncrementalExport:
    def _mk(self, spark, tmp_path, name="inc"):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")
        dest = str(tmp_path / name)
        export_delta(df, dest)
        return dest

    def test_append_and_checkpoint_trim_roundtrip(self, spark, tmp_path):
        from data_etl_pipeline_spark.sources.delta_export import (
            checkpoint_export,
            export_delta_append,
        )

        dest = self._mk(spark, tmp_path)
        export_delta_append(
            spark.createDataFrame([(3, "c")], "id long, val string"), dest
        )
        export_delta_append(
            spark.createDataFrame([(4, "d")], "id long, val string"), dest
        )
        v = checkpoint_export(spark, dest, trim=True)
        assert v == 2
        log = os.listdir(os.path.join(dest, "_delta_log"))
        assert f"{2:020d}.checkpoint.parquet" in log
        assert "_last_checkpoint" in log
        assert f"{0:020d}.json" not in log and f"{1:020d}.json" not in log
        lc = json.load(open(os.path.join(dest, "_delta_log", "_last_checkpoint")))
        assert lc["version"] == 2
        back = DeltaLogReader(spark, dest).read()
        assert sorted(r.id for r in back.collect()) == [1, 2, 3, 4]

    def test_append_refuses_foreign_table(self, spark, tmp_path):
        from data_etl_pipeline_spark.sources.delta_export import export_delta_append

        dest = self._mk(spark, tmp_path, "foreign")
        # rewrite the log to look like another writer's table
        commit = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(ln) for ln in open(commit)]
        for a in lines:
            if "metaData" in a:
                a["metaData"]["id"] = "some-other-writer"
        with open(commit, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(DeltaExportError, match="not created by this exporter"):
            export_delta_append(
                spark.createDataFrame([(9, "z")], "id long, val string"), dest
            )

    def test_append_refuses_foreign_protocol(self, spark, tmp_path):
        from data_etl_pipeline_spark.sources.delta_export import export_delta_append

        dest = self._mk(spark, tmp_path, "fproto")
        commit = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(ln) for ln in open(commit)]
        for a in lines:
            if "protocol" in a:
                a["protocol"] = {"minReaderVersion": 3, "minWriterVersion": 7}
        with open(commit, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(DeltaExportError, match="protocol"):
            export_delta_append(
                spark.createDataFrame([(9, "z")], "id long, val string"), dest
            )

    def test_append_after_checkpoint_refuses(self, spark, tmp_path):
        from data_etl_pipeline_spark.sources.delta_export import (
            checkpoint_export,
            export_delta_append,
        )

        dest = self._mk(spark, tmp_path, "postcp")
        checkpoint_export(spark, dest, trim=False)
        with pytest.raises(DeltaExportError, match="checkpointed"):
            export_delta_append(
                spark.createDataFrame([(9, "z")], "id long, val string"), dest
            )
