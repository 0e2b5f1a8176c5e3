"""Delta log reader: protocol-correct replay of hand-written commits."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from data_etl_pipeline_spark.sources.delta_reader import (
    DeltaLogReader,
    DeltaProtocolError,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
    ]
)


def _write_part(spark, tbl, name, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    tmp = os.path.join(tbl, "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(tbl, name))
    import shutil

    shutil.rmtree(tmp)


def _log(tbl, version, actions):
    os.makedirs(os.path.join(tbl, "_delta_log"), exist_ok=True)
    with open(os.path.join(tbl, "_delta_log", f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(part_cols=()):
    return {
        "metaData": {
            "id": "test-table",
            "schemaString": SCHEMA.json() if not part_cols else _part_schema().json(),
            "partitionColumns": list(part_cols),
            "format": {"provider": "parquet"},
        }
    }


def _part_schema():
    return T.StructType(SCHEMA.fields + [T.StructField("day", T.StringType())])


def _add(path, pv=None):
    return {"add": {"path": path, "partitionValues": pv or {}, "size": 1, "dataChange": True}}


@pytest.fixture()
def delta_table(spark, tmp_path):
    tbl = str(tmp_path / "dl")
    os.makedirs(tbl)
    _write_part(spark, tbl, "f0.parquet", [(1, "a"), (2, "b")])
    _write_part(spark, tbl, "f1.parquet", [(3, "c")])
    _write_part(spark, tbl, "f2.parquet", [(3, "C2"), (4, "d")])
    _log(tbl, 0, [{"protocol": {"minReaderVersion": 1}}, _meta(), _add("f0.parquet"), _add("f1.parquet")])
    # v1: rewrite f1 -> f2 (an update commit)
    _log(tbl, 1, [{"remove": {"path": "f1.parquet", "dataChange": True}}, _add("f2.parquet")])
    return tbl


def test_snapshot_replay_and_time_travel(spark, delta_table):
    r = DeltaLogReader(spark, delta_table)
    assert r.versions() == [0, 1]
    v0 = {x.id: x.val for x in r.read(0).collect()}
    assert v0 == {1: "a", 2: "b", 3: "c"}
    latest = {x.id: x.val for x in r.read().collect()}
    assert latest == {1: "a", 2: "b", 3: "C2", 4: "d"}


def test_partition_values_reattach_as_columns(spark, tmp_path):
    tbl = str(tmp_path / "dlp")
    os.makedirs(tbl)
    _write_part(spark, tbl, "p0.parquet", [(1, "a")])
    _write_part(spark, tbl, "p1.parquet", [(2, "b")])
    _log(
        tbl,
        0,
        [
            _meta(part_cols=["day"]),
            _add("p0.parquet", {"day": "2024-01-01"}),
            _add("p1.parquet", {"day": "2024-01-02"}),
        ],
    )
    rows = {r.id: r.day for r in DeltaLogReader(spark, tbl).read().collect()}
    assert rows == {1: "2024-01-01", 2: "2024-01-02"}


def test_unsupported_protocol_features_fail_loudly(spark, tmp_path):
    tbl = str(tmp_path / "dldv")
    os.makedirs(tbl)
    _write_part(spark, tbl, "f.parquet", [(1, "a")])
    _log(
        tbl,
        0,
        [
            _meta(),
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "dataChange": True,
                    "deletionVector": {"storageType": "u", "pathOrInlineDv": "x"},
                }
            },
        ],
    )
    with pytest.raises(DeltaProtocolError, match="deletion vectors"):
        DeltaLogReader(spark, tbl).read()

    # checkpoint present -> refuse rather than replay an incomplete log
    tbl2 = str(tmp_path / "dlck")
    os.makedirs(os.path.join(tbl2, "_delta_log"))
    open(os.path.join(tbl2, "_delta_log", "00000000000000000010.checkpoint.parquet"), "w").close()
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        DeltaLogReader(spark, tbl2).versions()


def test_reader_refuses_protocol_v2_and_decodes_paths(spark, tmp_path):
    # minReaderVersion 2 (e.g. column mapping) must refuse, not read NULLs
    tbl = str(tmp_path / "dlv2")
    os.makedirs(tbl)
    _write_part(spark, tbl, "f.parquet", [(1, "a")])
    _log(tbl, 0, [{"protocol": {"minReaderVersion": 2}}, _meta(), _add("f.parquet")])
    with pytest.raises(DeltaProtocolError, match="minReaderVersion"):
        DeltaLogReader(spark, tbl).read()

    # add.path is RFC 2396 percent-encoded: a file with a space must resolve
    tbl2 = str(tmp_path / "dlenc")
    os.makedirs(tbl2)
    _write_part(spark, tbl2, "part one.parquet", [(1, "a")])
    _log(tbl2, 0, [_meta(), _add("part%20one.parquet")])
    assert [r.id for r in DeltaLogReader(spark, tbl2).read().collect()] == [1]
