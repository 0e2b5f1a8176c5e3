#!/usr/bin/env python
"""Time EVERY declared query once (noop sink) in one session — the
measure-first sweep for optimization rounds: the bench covers the 16
headline/tier-2 queries, but the driver executes the FULL registry, so a
slow outlier anywhere in the 300+ declared queries is wall the bench
never shows. Prints one JSON line per query (streamed, so an interrupt
still leaves a usable partial) plus a sorted summary at the end.

Usage: python scripts/time_all_queries.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded
from data_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/query_sweep.json"
    _ensure_loaded()
    spark = get_spark("time-all-queries")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in QUERIES.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep sweeping; report at the end
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        print(
            json.dumps({"q": name, "sec": timings.get(name), "err": errors.get(name)}),
            flush=True,
        )
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    summary = {
        "sf_dir": sf_dir,
        "n": len(timings),
        "total_sec": round(sum(timings.values()), 3),
        "errors": errors,
        "slowest_25": ranked[:25],
    }
    with open(out_path, "w") as f:
        json.dump({"timings": timings, **summary}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
