#!/usr/bin/env python
"""R13 experiment: dictionary-encode the doc_ngram_jaccard_pairs posting
shuffle (VERDICT r12 item 2).

Variant: word -> injective bigint id via a deterministic bucketed
row_number over the distinct vocabulary; shingles become array<bigint>
of n word ids; the posting shuffle then carries fixed-width int arrays
instead of strings. Exact (bijective encoding), no collisions.

Measures, in one quiet session: result equality vs the committed
implementation, warm timings for both, and per-variant shuffle bytes.

Usage: python /tmp/r13_jacc_dict.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_etl_pipeline_spark.tables import load, spread


def ngram_jaccard_pairs_dict(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    base = (
        spread(df.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", F.split(F.col(text_col), " ").alias("w"))
        .where(F.size("w") >= n)
    )
    words = base.select("doc_id", F.posexplode("w").alias("pos", "word"))
    vocab = words.select("word").distinct()
    B = 1 << 10
    win = W.partitionBy("b").orderBy("word")
    vocab_ids = (
        vocab.withColumn("b", F.pmod(F.xxhash64("word"), F.lit(B)))
        .withColumn(
            "wid", F.col("b") * F.lit(1 << 40) + F.row_number().over(win)
        )
        .select("word", "wid")
    )
    enc = words.join(vocab_ids, "word").select("doc_id", "pos", "wid")
    docs_int = enc.groupBy("doc_id").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, wid))), x -> x.wid)").alias(
            "iw"
        )
    )
    sh = docs_int.select(
        "doc_id",
        F.array_distinct(
            F.expr(f"transform(sequence(0, size(iw) - {n}), i -> slice(iw, i + 1, {n}))")
        ).alias("sh"),
    )
    postings = sh.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    grouped = postings.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds")
    )
    combos = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x, y))))"
    )
    pair_rows = (
        grouped.where(F.size("ds") > 1)
        .select(F.explode(F.expr(combos)).alias("p"))
        .select(
            F.col("p.x.doc_id").alias("doc_a"),
            F.col("p.y.doc_id").alias("doc_b"),
            F.col("p.x.n_sh").alias("size_a"),
            F.col("p.y.n_sh").alias("size_b"),
        )
    )
    jacc = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        pair_rows.groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn("jaccard", F.round(jacc, 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from data_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jacc-dict-ab")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    docs = load(spark, sf_dir, "documents")

    # equality check (skippable for big fixtures via SKIP_EQ=1)
    if os.environ.get("SKIP_EQ"):
        same, a = "skipped", []
    else:
        a = ngram_jaccard_pairs(docs, threshold=0.8).orderBy("doc_a", "doc_b").collect()
        b = ngram_jaccard_pairs_dict(docs, threshold=0.8).orderBy("doc_a", "doc_b").collect()
        same = [tuple(r) for r in a] == [tuple(r) for r in b]

    out = {"sf_dir": sf_dir, "equal": same, "n_pairs": len(a)}
    for label, fn in [
        ("string", lambda: ngram_jaccard_pairs(docs, threshold=0.8)),
        ("dict", lambda: ngram_jaccard_pairs_dict(docs, threshold=0.8)),
    ]:
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        w0, r0, i0 = _stage_totals(ui, app_id)
        fn().write.format("noop").mode("overwrite").save()
        w1, r1, i1 = _stage_totals(ui, app_id)
        warm = runs[1:]
        out[label] = {
            "runs": runs,
            "warm_min": min(warm),
            "warm_median": sorted(warm)[len(warm) // 2],
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            "scan_mb": round((i1 - i0) / 1e6, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
