"""Sequence packing: greedy first-fit-in-order assignment of documents to
fixed-capacity context windows ("bins"), per source.

Training pipelines pack tokenized documents into fixed-length training
sequences to avoid padding waste; the packing decision is inherently
sequential (bin state depends on every earlier document), so it cannot be a
pure window expression. The parallel unit is the group: each source packs
independently, so the operator is a groupBy(source).applyInPandas over the
tiny (source, doc_id, n_tokens) projection — token counting happens JVM-side
and the text NEVER shuffles.

Scale shape at 100 TB: one Arrow batch per source carrying three narrow
columns. A pathologically large single source is pre-sharded by
(source, hash(doc_id) % k) first — packing then happens per shard, which is
exactly how multi-worker packers behave; the shard column rides along as
part of the group key.

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
) -> DataFrame:
    """Greedy first-fit packing in ``id_col`` order within each group.

    A document that does not fit in the current bin closes it and opens the
    next one; a document longer than ``capacity`` occupies a bin alone.
    Returns (group, doc_id, n_tokens, bin) — bin ids restart at 0 per group.
    """
    sized = df.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
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

    return sized.groupBy("source").applyInPandas(
        pack, "source string, doc_id long, n_tokens long, bin long"
    )
