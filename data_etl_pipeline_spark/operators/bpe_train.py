"""Distributed BPE merge-table training (Sennrich et al. 2016), the
cluster-scale counterpart of scripts/train_bpe_merges.py.

The reference's tokenizer rides a PRE-TRAINED merge table
(open_ai_key_app/src/open_ai_key_app/utils/token_util.py:6-8 loads
tiktoken's GPT-2 table); building such a table over a 100 TB corpus is
itself a pipeline job, and this module is that job expressed Spark-first:

  1. ONE corpus-sized pass aggregates pre-tokens to a (word, freq)
     vocabulary — after this, training never touches the corpus again.
     This is the same corpus->vocab collapse every real tokenizer trainer
     (HuggingFace, SentencePiece) performs, and it is what makes the loop
     tractable: each merge round is VOCAB-sized, not corpus-sized.
  2. Each round: adjacent-pair counts via a slice/zip explode (pure
     Catalyst, map-side combinable since identical words were already
     collapsed), a one-row argmax collect (count desc, pair asc — the
     deterministic tie-break the offline trainer uses), and a left-fold
     `aggregate(...)` over each word's symbol array that applies the
     winning merge greedily left-to-right (canonical BPE: "aaa" with
     merge (a,a) becomes [aa, a]).
  3. Rounds stop at `rounds` or when the best pair drops below
     `min_count` — the same saturation rule as the offline trainer.

The driver holds O(rounds) state (the learned merges); every per-round
decision is a single-row collect, which keeps this in the same
driver-side-control class as the batch scheduler (SURVEY ST6), not a
data-path collect. Symbol arrays are localCheckpoint-free: lineage grows
one projection per round and `persist()` caps recomputation; callers
running hundreds of rounds should pass `checkpoint_every`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["vocab_from_documents", "pair_counts", "train_bpe_merges_distributed"]


def vocab_from_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq) vocabulary, one scan, map-side combinable.

    Tokenization matches the corpus queries' established idiom (lowercase
    alnum runs, length >= 2) so trained merges describe the same token
    stream the other operators consume.
    """
    return (
        docs.select(
            F.explode(
                F.expr(
                    f"filter(split(lower({text_col}), '[^a-z0-9]+'),"
                    " x -> length(x) >= 2)"
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _with_symbols(vocab: DataFrame) -> DataFrame:
    return vocab.withColumn("syms", F.expr("split(word, '')"))


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency.

    One explode + one hash aggregate over the vocabulary; output is
    (a, b, cnt) with cardinality bounded by |alphabet U learned symbols|^2
    in theory and by observed adjacency in practice.
    """
    pairs = vocab_syms.select(
        F.col("freq"),
        F.explode(
            F.arrays_zip(
                F.expr("slice(syms, 1, size(syms) - 1)").alias("a"),
                F.expr("slice(syms, 2, size(syms) - 1)").alias("b"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("freq").alias("cnt"))


def _apply_merge(df: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (a, b) in every symbol array
    — a pure-Catalyst left fold, no Python in the loop."""
    a_l, b_l = a.replace("'", "\\'"), b.replace("'", "\\'")
    merged = (
        "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a_l}' "
        f"AND x = '{b_l}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{a_l}{b_l}')) "
        "ELSE concat(acc, array(x)) END)"
    )
    return df.withColumn("syms", F.expr(merged))


def train_bpe_merges_distributed(
    docs_or_vocab: DataFrame,
    rounds: int,
    *,
    min_count: int = 2,
    is_vocab: bool = False,
    checkpoint_every: int = 0,
) -> list[tuple[str, str, int]]:
    """Learn up to ``rounds`` BPE merges; returns [(a, b, count), ...] in
    merge order — merges.txt order, loadable by operators/bpe.load_merges.
    """
    vocab = docs_or_vocab if is_vocab else vocab_from_documents(docs_or_vocab)
    df = _with_symbols(vocab).persist()
    df.count()  # materialize once; rounds re-read the cached vocab
    merges: list[tuple[str, str, int]] = []
    try:
        for i in range(rounds):
            top = (
                pair_counts(df)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0].cnt < min_count:
                break
            a, b, cnt = top[0].a, top[0].b, int(top[0].cnt)
            merges.append((a, b, cnt))
            nxt = _apply_merge(df, a, b).persist()
            nxt.count()
            df.unpersist()
            df = nxt
            if checkpoint_every and (i + 1) % checkpoint_every == 0:
                df = df.localCheckpoint(eager=True)
    finally:
        df.unpersist()
    return merges
