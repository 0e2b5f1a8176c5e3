"""Deterministic corpus shuffle into training shards.

Every large-scale training run needs the corpus in a REPRODUCIBLE
pseudo-random order, split into N shard files, such that re-running the
pipeline (or re-materializing one lost shard) yields byte-identical
output — ``df.orderBy(rand())`` fails both requirements (rand() is
seed-per-task, and a global sort on a random key is one giant exchange).

The deterministic recipe: shard and order are both pure functions of the
document key and an epoch seed —

    shard(d)  = md5(seed || ':s:' || key) mod n_shards
    order(d)  = md5(seed || ':o:' || key)   (ties broken by key)
    pos(d)    = rank of d within its shard under order()

so any engine (here: Spark AND the DuckDB oracle) derives the identical
(shard, pos) for every document, any epoch re-shuffles by changing the
seed, and a single shard can be rebuilt in isolation.

Scale shape — the naive form is ``ROW_NUMBER() OVER (PARTITION BY shard
ORDER BY ok)``, which at 100 TB sorts each shard inside ONE task
(n_shards ~ hundreds, rows-per-shard ~ billions: straight to spill).
This operator computes the same positions with bounded partitions:

  1. bucket each row by the high bits of its order hash
     (``bucket = ok >> (60 - log2 B)``) — buckets are ORDER-ALIGNED
     (every hash in bucket b sorts before every hash in b+1), so
     (shard, bucket) partitions the shard's order into B contiguous
     runs;
  2. count rows per (shard, bucket) — a tiny aggregate
     (n_shards x B rows) — and turn it into per-bucket START OFFSETS
     with a window over the counts, not the data;
  3. broadcast-join the offsets back and number rows with ROW_NUMBER
     partitioned by (shard, bucket): max partition size shrinks by B,
     parallelism is n_shards x B tasks, and no row moves twice.

The hash is the engine-portable md5-prefix idiom used by the sampling
operators (conv/substr on the Spark side, ::BIGINT-from-hex in the
oracle), NOT xxhash64 — xxhash64 is Spark-only, and a shuffle order the
oracle cannot independently derive is untestable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit keyspace: md5 prefix of 15 hex chars, identical on both engines
_HASH_BITS = 60


def _h60(tag_expr: str) -> F.Column:
    return F.expr(
        f"cast(conv(substr(md5({tag_expr}), 1, 15), 16, 10) as bigint)"
    )


def deterministic_shard_shuffle(
    df: DataFrame,
    key_col: str,
    seed: str,
    n_shards: int,
    order_buckets: int = 16,
) -> DataFrame:
    """(shard, pos, key) for every row of ``df`` under the deterministic
    shuffle recipe above. ``order_buckets`` (a power of two) bounds the
    largest sorted partition at rows/(n_shards*order_buckets); positions
    are EXACT global ranks within each shard regardless of bucketing
    (offsets close the seams). Output: key_col, shard (bigint),
    pos (bigint, 1-based)."""
    if order_buckets < 1 or order_buckets & (order_buckets - 1):
        raise ValueError(f"order_buckets must be a power of two, got {order_buckets}")
    shift = _HASH_BITS - order_buckets.bit_length() + 1
    base = df.select(
        key_col,
        (_h60(f"concat('{seed}:s:', {key_col})") % n_shards).alias("shard"),
        _h60(f"concat('{seed}:o:', {key_col})").alias("__ok"),
    ).withColumn("__bkt", F.shiftright("__ok", shift))
    # per-(shard, bucket) start offsets: aggregate is n_shards*B rows, the
    # window runs over THAT, never over the data
    counts = base.groupBy("shard", "__bkt").agg(F.count(F.lit(1)).alias("__n"))
    off_w = (
        Window.partitionBy("shard")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "shard", "__bkt", F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off")
    )
    rn = F.row_number().over(
        Window.partitionBy("shard", "__bkt").orderBy("__ok", key_col)
    )
    return (
        base.join(F.broadcast(offsets), ["shard", "__bkt"])
        .select(
            key_col,
            "shard",
            (F.col("__off") + rn.cast("long")).alias("pos"),
        )
    )
