"""Deduplication operators for large-scale text corpora.

The reference dedups scraped page blocks with SHA-256 body hashes and
first-occurrence-wins ordering (scraper_app/src/scraper_app/utils/
dedup_util.py:51-64, 273-307 — SURVEY W4). At 100 TB we additionally need
near-duplicate detection; this module provides the standard ladder:

  exact_dedup          - hash-groupBy, first occurrence wins
  shingles             - word n-gram set per document (UDTF-shaped explode)
  ngram_jaccard_pairs  - inverted-index self-join, exact Jaccard
  minhash_signatures   - k-permutation MinHash over the shingle set
  lsh_candidate_pairs  - banded LSH bucket join over the signatures

All hash arithmetic uses the md5-derived portable hash
(functions/hashing.py) so the DuckDB oracle reproduces results bit-for-bit.

Scale design: every step is an explode + hash-partitioned groupBy/join —
no driver-side state, no cross join. The LSH band join touches only
bucket-colliding pairs, which is what makes MinHash viable at 100 TB where
the exact pairwise join is O(n^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from data_etl_pipeline_spark.functions.hashing import (
    MERSENNE_31,
    MINHASH_A,
    MINHASH_B,
    NUM_MINHASH,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """First-occurrence-wins exact dedup (SURVEY W4).

    Returns one row per distinct content hash with the surviving id and the
    number of copies folded away. Window over the content hash mirrors
    dedup_util.py:273-307 (first block keeps body, later duplicates dropped).
    """
    w = W.partitionBy("content_hash").orderBy(id_col)
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(W.partitionBy("content_hash")))
        .where(F.col("rn") == 1)
        .select(F.col("content_hash"), F.col(id_col).alias("keep_id"), F.col("n_copies"))
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) rows.

    UDTF-shaped one-row-to-many explode (SURVEY U3). Stays entirely in
    whole-stage codegen: split / transform / explode are JVM built-ins.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
            f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))"
        )
    )
    return (
        df.where(F.size(w) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via inverted-index self-join.

    Join on shared shingle (not a cross join): only pairs with at least one
    common shingle are materialized. At 100 TB the hot shingles are the skew
    risk — AQE skew-join handles moderate skew; stopword-like shingles should
    be df-filtered upstream for extreme corpora.
    """
    sh = shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    jacc = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jacc, 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def _minhash_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(doc_id, i, minhash_i) rows: min over shingles of (A[i]*h + B[i]) % p."""
    sh = shingles(df, text_col, id_col, n)
    h = F.expr(f"cast(conv(substr(md5(shingle), 1, 15), 16, 10) as bigint) % {MERSENNE_31}")
    a_arr = "array(" + ",".join(f"{v}L" for v in MINHASH_A) + ")"
    b_arr = "array(" + ",".join(f"{v}L" for v in MINHASH_B) + ")"
    return (
        sh.withColumn("h", h)
        .select("doc_id", "h", F.explode(F.expr(f"sequence(0, {NUM_MINHASH - 1})")).alias("i"))
        .withColumn(
            "perm",
            F.expr(f"(element_at({a_arr}, i + 1) * h + element_at({b_arr}, i + 1)) % {MERSENNE_31}"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("perm").alias("m"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-document MinHash signature as an ordered array<bigint>.

    Partial aggregation (map-side min) keeps the shuffle small: the shuffle
    carries at most docs x NUM_MINHASH rows regardless of corpus size.
    """
    rows = _minhash_rows(df, text_col, id_col, n)
    # collect_list order is nondeterministic; sort by the (i, m) struct to fix it.
    sig = F.expr("transform(array_sort(collect_list(struct(i, m))), x -> x.m)")
    return rows.groupBy("doc_id").agg(sig.alias("signature"))


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 4,
    min_est: float = 0.5,
) -> DataFrame:
    """Banded-LSH near-dup candidates + estimated similarity.

    Signatures are cut into ``bands`` bands; documents sharing any band
    become candidates (join on the band hash — a plain shuffle join on a
    high-cardinality key, the scalable core of MinHash dedup). Estimated
    similarity = fraction of equal signature positions.
    """
    rows_per_band = NUM_MINHASH // bands
    sig = minhash_signatures(df, text_col, id_col, n)
    banded = sig.select(
        "doc_id",
        "signature",
        F.explode(F.expr(f"sequence(0, {bands - 1})")).alias("band"),
    ).withColumn(
        "band_key",
        F.md5(
            F.concat_ws(
                ",",
                F.expr(f"transform(slice(signature, band * {rows_per_band} + 1, {rows_per_band}), x -> cast(x as string))"),
            )
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.expr(f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), z -> z)) / {NUM_MINHASH}.0")
    return (
        cand.withColumn("est_similarity", est)
        .where(F.col("est_similarity") >= min_est)
        .select("doc_a", "doc_b", "est_similarity")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """60-bit SimHash over the distinct word set of each document.

    Implemented as pure higher-order expressions (no UDF): for bit j the
    vote is sum over word hashes of +-1 on bit j; the bit is set when the
    vote is positive. 60 bits keeps the value positive in a signed int64.

    At production scale the equivalent vectorized pandas_udf computing all
    bits in one numpy pass is the faster path; this expression form is the
    oracle-checkable single-pass one (one row in, one row out, no shuffle).
    """
    words_hashes = (
        f"transform(array_distinct(split({text_col}, ' ')), "
        f"x -> cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint) % {MERSENNE_31})"
    )
    sim = (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, j) -> acc + "
        f"IF(aggregate({words_hashes}, cast(0 as bigint), "
        f"(v, h) -> v + IF((shiftright(h, j) & 1) = 1, 1, -1)) > 0, shiftleft(cast(1 as bigint), j), cast(0 as bigint)))"
    )
    return df.select(F.col(id_col).alias("doc_id"), F.expr(sim).alias("simhash"))
