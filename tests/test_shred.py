"""JSON shredding: schema inference lattice, bounds, reuse, plan purity."""

from __future__ import annotations

import pytest

from data_etl_pipeline_spark.operators.shred import infer_json_schema, json_shred
from data_etl_pipeline_spark.plans.planassert import executed_plan, formatted_plan


def test_inference_lattice(spark):
    df = spark.createDataFrame(
        [
            (0, '{"a": 1, "b": 1.5, "c": true, "d": "x", "e": 2}'),
            (1, '{"a": 2, "b": 3, "c": false, "d": 7, "e": 2.5}'),
            (2, '{"a": -3, "b": 2e3, "c": true, "d": null}'),
        ],
        "id long, doc string",
    )
    # a: all integral -> long; b: numeric mix -> double; c: bool;
    # d: string+number mix -> string; e: long+double -> double
    assert infer_json_schema(df, "doc") == [
        ("a", "long"), ("b", "double"), ("c", "boolean"),
        ("d", "string"), ("e", "double"),
    ]
    rows = {r["id"]: r for r in json_shred(df, "doc", ["id"]).collect()}
    assert rows[0]["a"] == 1 and rows[0]["b"] == 1.5 and rows[0]["c"] is True
    assert rows[1]["d"] == "7"          # stringly column keeps JSON text
    assert rows[2]["b"] == 2000.0
    assert rows[2]["d"] is None         # JSON null -> NULL
    assert rows[2]["e"] is None         # absent key -> NULL


def test_nested_values_stay_json_text(spark):
    df = spark.createDataFrame(
        [(0, '{"o": {"x": 1}, "arr": [1, 2]}'), (1, '{"o": {"x": 2}}')],
        "id long, doc string",
    )
    schema = dict(infer_json_schema(df, "doc"))
    assert schema["o"] == "string" and schema["arr"] == "string"
    rows = {r["id"]: r for r in json_shred(df, "doc", ["id"]).collect()}
    assert '"x"' in rows[0]["o"] and rows[1]["arr"] is None


def test_max_keys_refuses_kv_data(spark):
    df = spark.createDataFrame(
        [(i, '{"key%d": 1}' % i) for i in range(20)], "id long, doc string"
    )
    with pytest.raises(ValueError, match="distinct JSON keys"):
        infer_json_schema(df, "doc", max_keys=10)


def test_schema_reuse_across_batches(spark):
    # incremental ingest: batch 2 shreds under batch 1's schema even when
    # its own values would have inferred differently
    b1 = spark.createDataFrame([(0, '{"a": 1}')], "id long, doc string")
    b2 = spark.createDataFrame([(1, '{"a": "oops", "b": 2}')], "id long, doc string")
    schema = infer_json_schema(b1, "doc")
    out = json_shred(b2, "doc", ["id"], schema=schema).collect()[0]
    assert out["a"] is None             # 'oops' cannot cast to long -> NULL
    assert "b" not in out.asDict()      # unseen keys stay unshredded


def test_plan_has_no_udf_and_one_inference_shuffle(spark):
    df = spark.createDataFrame([(0, '{"a": 1}')], "id long, doc string")
    shredded = json_shred(df, "doc", ["id"])
    plan = formatted_plan(shredded)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
