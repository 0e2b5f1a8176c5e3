#!/usr/bin/env python
"""Job-level breakdown of one declared query: run it once (noop sink)
in a UI-enabled session and print every Spark job it submitted with
duration, description, and task count — the view that shows where a
multi-job lifecycle query (Delta/Iceberg export + merge + read) spends
its wall, which stage totals cannot.

Usage: python scripts/profile_jobs.py <name> [sf_dir] [warmups]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    warmups = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    _ensure_loaded()
    spec = QUERIES[name]

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-jobs")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    for _ in range(warmups):
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        before_ids = {j["jobId"] for j in json.load(r)}

    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        jobs = [j for j in json.load(r) if j["jobId"] not in before_ids]

    jobs.sort(key=lambda j: j["jobId"])
    total_job = 0.0
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = []
    prev_end = None
    for j in jobs:
        dur = ts(j["completionTime"]) - ts(j["submissionTime"])
        gap = ts(j["submissionTime"]) - prev_end if prev_end is not None else 0.0
        prev_end = ts(j["completionTime"])
        total_job += dur
        rows.append(
            {
                "job": j["jobId"],
                "sec": round(dur, 3),
                "gap_before_sec": round(gap, 3),
                "tasks": j["numTasks"],
                "desc": (j.get("description") or j.get("name") or "")[:110],
            }
        )
    print(json.dumps({"query": name, "wall_sec": round(wall, 3),
                      "sum_job_sec": round(total_job, 3),
                      "driver_gap_sec": round(wall - total_job, 3),
                      "n_jobs": len(rows)}))
    for r_ in rows:
        print(json.dumps(r_))
    spark.stop()


if __name__ == "__main__":
    main()
