"""Merkle-style table diff: the bucket-checksum pruning must be lossless.

The DuckDB oracle mirrors the two-phase (checksum -> drill) formulation,
so a pruning bug that drops a divergent bucket could in principle be
mirrored on both engines and slip the hash gate. This test compares the
declared query against a BRUTE-FORCE full-outer diff with no bucket
pruning at all — an independent formulation that cannot share the bug.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded
from data_etl_pipeline_spark.tables import load

KH = "cast(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 15), 16, 10) as bigint)"
ROW = (
    "concat_ws('|', CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING), "
    "o_orderstatus, o_orderpriority)"
)
RH = f"cast(conv(substr(md5({ROW}), 1, 15), 16, 10) as bigint)"


def _sides(spark, sf_dir):
    """The same deterministic left/right replica pair the query builds."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 3000)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
            F.expr(KH).alias("kh"),
        )
    )
    left = src.select("o_orderkey", F.expr(RH).alias("rh"))
    drifted = src.where(F.col("kh") % 131 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.when(F.col("kh") % 97 == 0, F.lit("9-DRIFT"))
        .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
    )
    inserted = src.where(F.col("kh") % 151 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", F.lit("0-NEW").alias("o_orderpriority"),
    )
    right = drifted.unionByName(inserted).select(
        "o_orderkey", F.expr(RH).alias("rh")
    )
    return left, right


def test_bucket_pruned_diff_equals_brute_force(spark, sf_dir):
    _ensure_loaded()
    got = {
        (r["o_orderkey"], r["change"])
        for r in QUERIES["table_diff_bucket_checksums"].fn(spark, sf_dir).collect()
    }

    left, right = _sides(spark, sf_dir)
    brute = (
        left.alias("l")
        .join(right.alias("r"), F.col("l.o_orderkey") == F.col("r.o_orderkey"),
              "full_outer")
        .where(
            F.col("l.o_orderkey").isNull()
            | F.col("r.o_orderkey").isNull()
            | (F.col("l.rh") != F.col("r.rh"))
        )
        .select(
            F.coalesce(F.col("l.o_orderkey"), F.col("r.o_orderkey")).alias("k"),
            F.when(F.col("r.o_orderkey").isNull(), F.lit("deleted"))
            .when(F.col("l.o_orderkey").isNull(), F.lit("inserted"))
            .otherwise(F.lit("changed")).alias("change"),
        )
    )
    want = {(r["k"], r["change"]) for r in brute.collect()}

    assert got == want
    # the fixture exercises every divergence class
    assert {c for _, c in want} == {"changed", "deleted", "inserted"}


def test_changed_rows_stay_in_their_bucket(spark, sf_dir):
    """An in-place UPDATE moves neither side's row to another bucket (the
    bucket key hashes the PRIMARY KEY, not the row content) — the property
    that makes per-bucket checksum comparison sound for updates."""
    _ensure_loaded()
    rows = QUERIES["table_diff_bucket_checksums"].fn(spark, sf_dir).collect()
    changed = [r for r in rows if r["change"] == "changed"]
    assert changed  # the fixture guarantees in-place updates exist
    for r in changed:
        # recompute the key-hash bucket independently, in pure Python —
        # md5 of the DECIMAL-STRING key, first 15 hex digits, mod 64
        # (one hashlib call per row, not one Spark job per row)
        want = int(hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:15], 16) % 64
        assert r["bucket"] == want
