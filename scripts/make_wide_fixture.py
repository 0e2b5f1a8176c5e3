#!/usr/bin/env python
"""Build a wider-corpus measurement fixture for the jaccard dict-encode A/B
(VERDICT r12 item 2: "measure at sf0.1 AND a wider-corpus fixture").

Takes the sf0.1 documents table and writes /tmp/sfwide/documents.parquet
with COPIES disjoint copies: copy i prefixes every word with "c<i>x" and
offsets doc_id by i*1_000_000, so no shingle is shared across copies —
postings, vocabulary and pair counts all scale linearly with COPIES (the
posting-shuffle regime of a larger corpus) without any cross-copy pair
explosion. Deterministic, computed from the parquet input at build time.

Usage: python /tmp/r13_make_wide.py [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_etl_pipeline_spark.session import get_spark
from data_etl_pipeline_spark.tables import load


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("make-wide")
    docs = load(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    parts = []
    for i in range(copies):
        prefix = f"c{i}x"
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                F.regexp_replace(
                    F.concat(F.lit(" "), F.col("text")), " ", " " + prefix
                ).substr(2, 1 << 30).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet("/tmp/sfwide/documents.parquet")
    n = spark.read.parquet("/tmp/sfwide/documents.parquet").count()
    print({"copies": copies, "rows": n})
    spark.stop()


if __name__ == "__main__":
    main()
