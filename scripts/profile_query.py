#!/usr/bin/env python
"""Matched-condition profile of one declared query.

The driver bench showed two consecutive rounds of upward drift on
``doc_ngram_jaccard_pairs`` (3.43 -> 3.77 -> 5.03 s) with the query's
code unchanged; this script settles "load noise or regression?" with
data: N repeats in a single quiet UI-enabled session under the exact
bench confs, reporting per-run wall, warm spread, and the query's OWN
stage-level shuffle write/read + scan input bytes (diffed around one
run), so any future drift separates compute from scan from shuffle.

Usage: python scripts/profile_query.py <name> [sf_dir] [repeats]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded


def _stage_totals(ui: str, app_id: str) -> tuple[int, int, int]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    inp = sum(s.get("inputBytes", 0) for s in stages)
    return w, rd, inp


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    _ensure_loaded()
    spec = QUERIES[name]

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4098")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    runs: list[float] = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))

    # shuffle/scan bytes for ONE further run, diffed around it
    w0, r0, i0 = _stage_totals(ui, app_id)
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    w1, r1, i1 = _stage_totals(ui, app_id)

    warm = runs[1:] if len(runs) > 1 else runs
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs_sec": runs,
                "cold_sec": runs[0],
                "warm_min_sec": min(warm),
                "warm_median_sec": sorted(warm)[len(warm) // 2],
                "warm_spread_sec": round(max(warm) - min(warm), 3),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
                "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
                "scan_input_mb": round((i1 - i0) / 1e6, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
