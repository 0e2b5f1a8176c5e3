"""Sequence packing: greedy first-fit-in-order assignment of documents to
fixed-capacity context windows ("bins"), per source.

Training pipelines pack tokenized documents into fixed-length training
sequences to avoid padding waste; the packing decision is inherently
sequential (bin state depends on every earlier document), so it cannot be a
pure window expression. The parallel unit is the group, and the group key is
(source, shard) — NOT the source alone: greedy first-fit is sequential per
group, so a source holding 30% of a 100 TB corpus would otherwise land on a
single executor as one giant Arrow batch. The shard is a deterministic
function of the doc id (``doc_id % n_shards``), so both engines (and any
re-run) agree on the assignment, and packing happens independently per
shard — exactly how multi-worker packers behave.

Cross-shard fragmentation bound: each (source, shard) stream ends with at
most one partially-filled bin, so sharding wastes at most ``n_shards - 1``
extra partial bins per source versus the unsharded packing — bounded by
``(n_shards - 1) * capacity`` tokens per source, independent of corpus
size. The same trade the JSONL bin-packing sink documents for its
size-capped batch files (sources/jsonl.py).

Bin ids are made globally unique per source without any cross-shard
coordination: ``bin = local_bin * n_shards + shard``.

Scale shape at 100 TB: one Arrow batch per (source, shard) carrying three
narrow columns. Token counting happens JVM-side and the text NEVER
shuffles.

Reference parity: the reference packs JSONL requests into size-capped batch
files (data_etl_app bin-packing sink, SURVEY S9); this is the token-level
equivalent for training sequences.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_shards: int = 8,
) -> DataFrame:
    """Greedy first-fit packing in ``id_col`` order within (group, shard).

    A document that does not fit in the current bin closes it and opens the
    next one; a document longer than ``capacity`` occupies a bin alone.
    ``n_shards=1`` reproduces classic per-group first-fit exactly; larger
    values trade bounded fragmentation (≤ one partial bin per extra shard)
    for parallelism within heavy groups. Returns (group, doc_id, n_tokens,
    bin) with bin ids unique per group (``local_bin * n_shards + shard``).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sized = df.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        # NULL text -> size() is NULL -> NaN in the Arrow batch -> int()
        # crash inside pack(); an empty doc packs as 0 tokens instead
        F.coalesce(F.size(F.split(F.col(text_col), " ")), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        # pmod, not %: Spark's % is sign-preserving, so a negative doc id
        # would yield a negative shard and break the injectivity of
        # bin = local_bin * n_shards + shard (bins from different shards
        # could collide and a merged bin could exceed capacity)
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins: list[int] = []
        fill, b = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                b += 1
                fill = 0
            fill += t
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    packed = sized.groupBy("source", "shard").applyInPandas(
        pack, "source string, doc_id long, n_tokens long, shard long, bin long"
    )
    return packed.select(
        "source",
        "doc_id",
        "n_tokens",
        (F.col("bin") * F.lit(n_shards) + F.col("shard")).cast("long").alias("bin"),
    )


def packing_state(packed: DataFrame, n_shards: int = 8) -> DataFrame:
    """Per-(source, shard) packer state — (last_bin, last_fill) of the
    stream's final, possibly partial bin — recovered from a
    ``pack_sequences`` output. O(|bins|) work: one shard-key window to
    find each stream's last local bin, one aggregate for its fill.
    """
    local = (F.col("bin") / n_shards).cast("long")
    shard = F.pmod(F.col("bin"), F.lit(n_shards)).cast("long")
    from pyspark.sql import Window as W

    g = packed.select(
        "source", shard.alias("shard"), local.alias("local_bin"), "n_tokens"
    )
    w = W.partitionBy("source", "shard")
    return (
        g.withColumn("last_bin", F.max("local_bin").over(w))
        .where(F.col("local_bin") == F.col("last_bin"))
        .groupBy("source", "shard", "last_bin")
        .agg(F.sum("n_tokens").alias("last_fill"))
    )


def pack_sequences_incremental(
    df_new: DataFrame,
    state: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_shards: int = 8,
) -> DataFrame:
    """Pack a NEW batch continuing each (source, shard) stream from its
    persisted ``packing_state`` — the first new document tops up the
    stream's partial final bin if it fits; streams absent from the state
    start at bin 0. Because greedy first-fit is PREFIX-STABLE (packer
    state after a prefix is exactly the mid-stream state), incremental
    packing of id-ordered batches reproduces the full re-pack
    bit-for-bit — proven by the oracle of the composed query, which
    packs the whole corpus in one recursive pass. At 100 TB this is the
    difference between re-packing the corpus per ingest tick and packing
    O(batch) with an O(|streams|) state join.

    Requires every id in ``df_new`` to sort after the already-packed ids
    within its stream (append-only ingest); out-of-order ids would pack
    validly but no longer match a full re-pack.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sized = df_new.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.size(F.split(F.col(text_col), " ")), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
    )
    st = state.select(
        "source",
        "shard",
        F.col("last_bin").cast("long").alias("state_bin"),
        F.col("last_fill").cast("long").alias("state_fill"),
    )
    joined = sized.join(st, ["source", "shard"], "left").na.fill(
        {"state_bin": 0, "state_fill": 0}
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        b = int(pdf["state_bin"].iloc[0])
        fill = int(pdf["state_fill"].iloc[0])
        bins: list[int] = []
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                b += 1
                fill = 0
            fill += t
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf.drop(columns=["state_bin", "state_fill"])

    packed = joined.groupBy("source", "shard").applyInPandas(
        pack, "source string, doc_id long, n_tokens long, shard long, bin long"
    )
    return packed.select(
        "source",
        "doc_id",
        "n_tokens",
        (F.col("bin") * F.lit(n_shards) + F.col("shard")).cast("long").alias("bin"),
    )
