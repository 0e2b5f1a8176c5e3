#!/usr/bin/env python
"""Benchmark the headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded
from data_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    _ensure_loaded()
    spark = get_spark("bench")
    headline = [s for s in QUERIES.values() if s.headline]

    # warm the JVM + parquet footers so per-query numbers measure the plans
    for spec in headline[:1]:
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-N per query: a shared local[32] sandbox adds seconds of noise
    # to any single run (the r2 bench file recorded a phantom 1.73x
    # "regression" that a quiet re-run erased), and the minimum is the
    # standard noise-robust estimator for wall-clock benchmarks
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    for spec in headline:
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[spec.name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
