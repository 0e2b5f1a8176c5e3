#!/usr/bin/env python
"""Run the local oracle-parity sweep (mirrors the driver's correctness gate).

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_pipeline_spark.oracle import compare_all
from data_etl_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = get_spark("parity-check")
    results = compare_all(spark, sf_dir, names)
    n_ok = sum(1 for r in results if r["ok"])
    for r in results:
        flag = "PASS" if r["ok"] else "FAIL"
        print(f"{flag} {r['name']}: {r['status']}" + ("" if r["ok"] else f" {json.dumps({k: v for k, v in r.items() if k not in ('name', 'ok', 'status')}, default=str)[:400]}"))
    print(f"\n{n_ok}/{len(results)} queries match")
    spark.stop()
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
