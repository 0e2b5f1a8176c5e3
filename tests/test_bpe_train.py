"""Distributed BPE training (operators/bpe_train.py) must reproduce the
offline trainer's merges exactly — same greedy left-to-right merge, same
(count desc, pair asc) tie-break, same min_count saturation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.bpe_train import (
    pair_counts,
    train_bpe_merges_distributed,
    vocab_from_documents,
)
from data_etl_pipeline_spark.tables import load


def _reference_train(freqs: dict[str, int], rounds: int, min_count: int = 2):
    """The offline algorithm (scripts/train_bpe_merges.py), restated
    minimally: argmax adjacent pair, greedy left-to-right merge."""
    words = {w: list(w) for w in freqs}
    merges = []
    for _ in range(rounds):
        pc: Counter = Counter()
        for w, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += freqs[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _corpus_freqs(spark, sf_dir) -> dict[str, int]:
    rows = (
        load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr(
                    "filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .collect()
    )
    return {r.w: r.f for r in rows}


def test_distributed_matches_reference_trainer(spark, sf_dir):
    freqs = _corpus_freqs(spark, sf_dir)
    want = _reference_train(freqs, rounds=8)
    docs = load(spark, sf_dir, "documents")
    got = train_bpe_merges_distributed(docs, rounds=8)
    assert got == want
    # merges are genuinely multi-round: later merges may build on earlier
    # merged symbols, and counts are non-increasing is NOT guaranteed by
    # BPE, but at least one merge must exist on this corpus
    assert len(got) >= 1


def test_greedy_fold_handles_overlapping_runs(spark):
    """'aaa' with merge (a,a) must become [aa, a] — canonical BPE."""
    vocab = spark.createDataFrame([("aaaa", 3), ("aaa", 2)], "word string, freq long")
    got = train_bpe_merges_distributed(vocab, rounds=1, is_vocab=True)
    assert got == [("a", "a", 3 * 3 + 2 * 2)]
    # second round: [aa, aa] / [aa, a] adjacency
    got2 = train_bpe_merges_distributed(vocab, rounds=2, is_vocab=True)
    assert got2[1] == ("aa", "a", 2) or got2[1] == ("aa", "aa", 3)


def test_pair_counts_weighting(spark):
    vocab = spark.createDataFrame([("ab", 5), ("ba", 7)], "word string, freq long")
    syms = vocab.withColumn("syms", F.expr("split(word, '')"))
    got = {(r.a, r.b): r.cnt for r in pair_counts(syms).collect()}
    assert got == {("a", "b"): 5, ("b", "a"): 7}


def test_min_count_saturation(spark):
    vocab = spark.createDataFrame([("xy", 1)], "word string, freq long")
    assert train_bpe_merges_distributed(vocab, rounds=5, is_vocab=True) == []


def test_vocab_collapses_corpus(spark, sf_dir):
    """Identical words appear once in the vocab with summed frequency."""
    docs = load(spark, sf_dir, "documents")
    v = vocab_from_documents(docs)
    assert v.groupBy("word").count().where("count > 1").take(1) == []
    assert v.where(F.col("freq") > 1).take(1), "corpus should repeat words"
