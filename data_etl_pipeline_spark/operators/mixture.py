"""Domain-mixture resampling: downsample over-represented sources so the
corpus token mixture approaches a target share per source.

Training pipelines control the mixture of domains/sources feeding a run
(uniform, or DoReMi-style learned weights). This operator computes each
source's token mass, derives the per-source keep probability

    p_s = min(1, target_tokens_per_source / source_tokens)

and keeps a document iff its deterministic hash bucket falls under p_s.
The keep decision uses INTEGER arithmetic only —

    bucket * source_tokens * n_sources < total_tokens * 1_000_000

— so the Spark plan and the DuckDB oracle agree bit-for-bit with no float
threshold at the boundary. (Overflow bound: the left product stays in
int64 while source_tokens * n_sources < 9.2e12, i.e. corpora to ~10^12
tokens per source group; beyond that, divide through first.)

Scale shape: one aggregate over the narrow (source, n_tokens) projection
produces a per-source dim of |sources| rows, broadcast back onto the
corpus scan; the sampling filter is a row-local hash compare. No shuffle
of document text, ONE wide scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_etl_pipeline_spark.functions.hashing import md5_int60

BUCKETS = 1_000_000


def rebalance_to_uniform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Uniform-target mixture resample. Returns the kept documents as
    (source, doc_id, n_tokens, bucket, sample_rate) — sample_rate is the
    rounded keep probability, for mixture accounting downstream.
    """
    sized = df.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    per_source = sized.groupBy("source").agg(F.sum("n_tokens").alias("source_tokens"))
    totals = per_source.agg(
        F.sum("source_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    dims = per_source.crossJoin(F.broadcast(totals))  # |sources| x 1 rows
    bucket = md5_int60("cast(doc_id as string)") % BUCKETS
    return (
        sized.join(F.broadcast(dims), "source")
        .withColumn("bucket", bucket)
        .where(
            F.col("bucket") * F.col("source_tokens") * F.col("n_sources")
            < F.col("total_tokens") * F.lit(BUCKETS)
        )
        .select(
            "source",
            "doc_id",
            "n_tokens",
            "bucket",
            F.expr(
                "round(least(1.0, (cast(total_tokens as double) / n_sources) "
                "/ source_tokens), 6)"
            ).alias("sample_rate"),
        )
    )


def temperature_mix_weights(
    df: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 2,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Temperature-based source mixing weights, the multilingual/multi-
    domain pretraining staple (mT5/XLM-R style): sample source s with

        w_s = n_s^alpha / sum_t n_t^alpha,   alpha = alpha_num/alpha_den

    alpha < 1 flattens the mix (up-samples small sources), alpha = 1 is
    natural, alpha = 0 uniform. Returns one row per source: token mass,
    natural share, temperature weight, and the resulting up/down-sampling
    boost (weight / natural share).

    Only alpha = 1/2 (sqrt) is supported — IEEE-754 sqrt is correctly
    rounded, so sqrt(bigint) is BIT-IDENTICAL across engines, while
    pow(x, 0.25) etc. is not so guaranteed. Oracle determinism: each
    sqrt is rounded to 6 decimals and accumulated as DECIMAL(28,6), so
    the denominator is order-free exact; the final ratios divide one
    exact decimal by another in double and round to 6.

    Scale shape: ONE map-side-combinable aggregate collapses the corpus
    to |sources| rows; every window below runs on that bounded frame.
    """
    if (alpha_num, alpha_den) != (1, 2):
        raise ValueError(
            "temperature_mix_weights supports alpha=1/2 only (IEEE sqrt "
            "is the one fractional power with a bit-exact cross-engine "
            "contract)"
        )
    from pyspark.sql import Window as W

    per_source = (
        df.select(
            F.col(group_col).alias("source"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("source_tokens"))
    )
    q = F.round(F.sqrt(F.col("source_tokens").cast("double")), 6).cast(
        "decimal(28,6)"
    )
    wall = W.partitionBy()  # O(sources) rows — bounded pre-aggregated frame
    scored = per_source.select(
        "source",
        "source_tokens",
        q.alias("q"),
        F.sum("source_tokens").over(wall).alias("total_tokens"),
        F.sum(q).over(wall).alias("total_q"),
    )
    natural = F.col("source_tokens").cast("double") / F.col("total_tokens").cast(
        "double"
    )
    weight = F.col("q").cast("double") / F.col("total_q").cast("double")
    return scored.select(
        "source",
        "source_tokens",
        F.round(natural, 6).alias("natural_share"),
        F.round(weight, 6).alias("mix_weight"),
        F.round(weight / natural, 6).alias("boost"),
    ).orderBy("source")


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement as one distributed top-k
    (Efraimidis-Spirakis A-ES, exponential-key form): each row draws a
    deterministic pseudo-uniform u from its id hash and sorts by

        sample_key = -ln(u) / weight

    — the k smallest keys are exactly a weight-proportional sample without
    replacement.  This is how a 100 TB pipeline selects a quality- or
    length-weighted document subset in ONE pass: the Spark plan is
    TakeOrderedAndProject (per-partition partial top-k, driver merges
    k rows per task — never a global sort shuffle).

    Determinism: u = (md5-hash mod 2^40 + 1) / (2^40 + 1) is the portable
    integer construction both engines share; the key is rounded to 9
    decimals and tied on id so the oracle selects the identical k rows.
    """
    two40 = 1_099_511_627_776
    u = (F.pmod(md5_int60(f"cast({id_col} as string)"), F.lit(two40)) + 1).cast(
        "double"
    ) / F.lit(float(two40 + 1))
    # NULL keys sort FIRST under asc() and negative weights flip the key
    # sign — either would silently hijack the whole sample, so a bad
    # weight fails the job instead (codegen branch, no extra pass)
    safe_w = F.expr(
        f"IF({weight_col} IS NULL OR {weight_col} <= 0, "
        f"cast(raise_error(concat('weighted_sample_topk: non-positive or null "
        f"weight for id ', cast({id_col} as string))) as double), "
        f"cast({weight_col} as double))"
    )
    keyed = df.withColumn(
        "sample_key",
        F.round(-F.log(u) / safe_w, 9),
    )
    return keyed.orderBy(F.asc("sample_key"), F.asc(id_col)).limit(k)


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``q`` fraction of rows per group by score (the
    FineWeb-style per-source quality percentile cut): rank-based, so the
    cut is EXACT and engine-replayable — no quantile-sketch interpolation
    to disagree over.  Ties break on the id, making membership
    deterministic.  One window over the group partitioning; at 100 TB the
    per-group sort is bounded by the largest source, the same partitioning
    every other per-source stage reuses."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .where(F.col("_pr") <= q)
        .drop("_pr")
    )
