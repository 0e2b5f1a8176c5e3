"""ML feature-preparation query shapes: leakage-safe encodings, quantile
scoring, and the hashing trick.

The reference's corpus consumers feed curated tables into model training
(SURVEY §2.11 extension family); these are the standard tabular
feature-engineering passes a training-data pipeline runs at scale, each
expressed so the expensive part is one map-side-combinable aggregate and
the "model" part is arithmetic over a group-count-sized frame:

- K-fold out-of-fold target encoding (the leakage-safe mean encoding used
  for high-cardinality categoricals): fold membership by portable hash,
  encodings from complement sums — no row ever sees its own fold's target.
- RFM scoring via percentile BOUNDARIES instead of a global NTILE: the
  quantile frame is one row, broadcast back — no global sort, no
  single-partition window, ties broken identically in both engines.
- Feature hashing (Weinberger et al.'s hashing trick): token -> signed
  bucket with a portable md5-derived hash; the output dimensionality is
  fixed (64) regardless of vocabulary size, which is the whole point at
  100 TB — no vocabulary build, no dictionary shuffle, one corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_etl_pipeline_spark.plans.registry import query
from data_etl_pipeline_spark.tables import load

# Portable 60-bit hash: identical in Spark and DuckDB (md5 hex prefix as
# integer; the same idiom plans/etl.py's hash sample established).
_H60_SQL = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def _h60(col: str) -> F.Column:
    return F.expr(f"cast(conv(substr(md5({col}), 1, 15), 16, 10) as bigint)")


# ---------------------------------------------------------------------------
# K-fold out-of-fold target encoding. Folds are assigned by portable
# hash of the order key (reproducible across engines and reruns, unlike
# rand()). Per (segment, fold) partial sums roll up once; each fold's
# encoding uses the OTHER folds' sums plus an m=20 prior toward the
# global mean — the standard smoothing that keeps rare categories from
# memorizing their own targets. The fact scan is the only big pass; the
# window arithmetic runs on a |segments| x |folds| frame (25 rows here,
# bounded by category cardinality at any scale). Sums accumulate in
# DECIMAL so partial-aggregation order cannot change the double result.
# ---------------------------------------------------------------------------
@query(
    "target_encode_kfold",
    sql=f"""
    WITH f AS (
        SELECT c_mktsegment AS segment,
               ({_H60_SQL.format(x="CAST(o_orderkey AS VARCHAR)")} % 5) AS fold,
               CAST(o_totalprice AS DECIMAL(18,2)) AS p
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    g AS (SELECT segment, fold, SUM(p) AS s, COUNT(*) AS c FROM f GROUP BY 1, 2)
    SELECT segment, fold, c AS n,
           ROUND((CAST(SUM(s) OVER (PARTITION BY segment) - s AS DOUBLE)
                  + 20 * (CAST(SUM(s) OVER () AS DOUBLE)
                          / CAST(SUM(c) OVER () AS DOUBLE)))
                 / (CAST(SUM(c) OVER (PARTITION BY segment) - c AS DOUBLE) + 20),
                 6) AS encoded
    FROM g
    """,
    doc="Leakage-safe K-fold target encoding of market segment against "
    "order price: portable-hash folds, per-(segment,fold) DECIMAL partial "
    "sums, out-of-fold complement means smoothed toward the global prior "
    "(m=20). One fact-scan aggregate; all encoding arithmetic on a "
    "25-row frame.",
)
def target_encode_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    f = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (_h60("cast(o_orderkey as string)") % 5).alias("fold"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    g = f.groupBy("segment", "fold").agg(
        F.sum("p").alias("s"), F.count(F.lit(1)).alias("c")
    )
    seg = W.partitionBy("segment")
    allw = W.partitionBy()
    prior = F.sum("s").over(allw).cast("double") / F.sum("c").over(allw).cast(
        "double"
    )
    enc = (
        (F.sum("s").over(seg) - F.col("s")).cast("double") + 20 * prior
    ) / ((F.sum("c").over(seg) - F.col("c")).cast("double") + 20)
    return g.select(
        "segment", "fold", F.col("c").alias("n"), F.round(enc, 6).alias("encoded")
    )


# ---------------------------------------------------------------------------
# RFM (recency / frequency / monetary) scoring. The classic formulation
# ranks every customer with NTILE over a GLOBAL sort — a single-reducer
# window at scale. This plan scores against exact percentile BOUNDARIES
# instead: per-customer aggregates (one shuffle, map-side combinable),
# a one-row quantile frame (exact interpolated percentiles — identical
# arithmetic in both engines), broadcast back for the score compare.
# Recency is integer days since epoch (NTZ-safe, no timezone in play);
# monetary accumulates in DECIMAL. Output is the 4x4x4 score-cell
# distribution, bounded regardless of customer count.
# ---------------------------------------------------------------------------
@query(
    "rfm_customer_segments",
    sql="""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', DATE '1970-01-01', CAST(MAX(o_orderdate) AS DATE))
                   AS rec,
               COUNT(*) AS freq,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
        FROM orders GROUP BY 1
    ),
    q AS (
        SELECT quantile_cont(CAST(rec AS DOUBLE), [0.25, 0.5, 0.75]) AS rq,
               quantile_cont(CAST(freq AS DOUBLE), [0.25, 0.5, 0.75]) AS fq,
               quantile_cont(CAST(mon AS DOUBLE), [0.25, 0.5, 0.75]) AS mq
        FROM per_cust
    ),
    scored AS (
        SELECT
            1 + CAST(rec >= rq[1] AS INT) + CAST(rec >= rq[2] AS INT)
              + CAST(rec >= rq[3] AS INT) AS r_score,
            1 + CAST(freq >= fq[1] AS INT) + CAST(freq >= fq[2] AS INT)
              + CAST(freq >= fq[3] AS INT) AS f_score,
            1 + CAST(CAST(mon AS DOUBLE) >= mq[1] AS INT)
              + CAST(CAST(mon AS DOUBLE) >= mq[2] AS INT)
              + CAST(CAST(mon AS DOUBLE) >= mq[3] AS INT) AS m_score,
            mon
        FROM per_cust, q
    )
    SELECT r_score, f_score, m_score, COUNT(*) AS n,
           CAST(SUM(mon) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
    doc="RFM customer scoring against exact percentile boundaries (no "
    "global NTILE sort): per-customer aggregate, one-row broadcast "
    "quantile frame, boundary-compare scores, 4x4x4 cell distribution.",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "datediff(cast(max(o_orderdate) as date), date'1970-01-01')"
            ).alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon"),
        )
    )
    q = per_cust.agg(
        F.expr("percentile(cast(rec as double), array(0.25, 0.5, 0.75))").alias(
            "rq"
        ),
        F.expr("percentile(cast(freq as double), array(0.25, 0.5, 0.75))").alias(
            "fq"
        ),
        F.expr("percentile(cast(mon as double), array(0.25, 0.5, 0.75))").alias(
            "mq"
        ),
    )

    def score(col: str, bounds: str) -> F.Column:
        c = F.col(col).cast("double")
        return (
            F.lit(1)
            + (c >= F.col(bounds)[0]).cast("int")
            + (c >= F.col(bounds)[1]).cast("int")
            + (c >= F.col(bounds)[2]).cast("int")
        )

    scored = per_cust.crossJoin(F.broadcast(q)).select(
        score("rec", "rq").alias("r_score"),
        score("freq", "fq").alias("f_score"),
        score("mon", "mq").alias("m_score"),
        "mon",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mon").cast("double").alias("total_monetary"),
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick): every token maps to one of 64
# buckets by portable hash, with a sign bit from the next hash bit so
# collisions cancel in expectation (Weinberger et al. 2009). There is
# deliberately NO vocabulary dictionary: the corpus scan aggregates
# straight to (token, count) -> (bucket, signed mass), so the output
# width is fixed at 64 no matter how large the vocabulary grows — the
# property that makes this the 100 TB featurizer when a vocab build
# (and its dictionary broadcast) would not fit.
# ---------------------------------------------------------------------------
@query(
    "feature_hashing_signed",
    sql=f"""
    WITH tok AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> length(x) >= 2)) AS tok
        FROM documents
    ),
    tc AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY 1),
    h AS (
        SELECT {_H60_SQL.format(x="tok")} AS hv, tok, cnt FROM tc
    )
    SELECT (hv % 64) AS bucket,
           CAST(SUM(CASE WHEN (hv % 128) = (hv % 64) THEN cnt ELSE -cnt END)
                AS BIGINT) AS signed_mass,
           COUNT(*) AS n_tokens,
           CAST(SUM(cnt) AS BIGINT) AS total_count
    FROM h GROUP BY 1
    """,
    doc="Hashing-trick featurizer: tokens -> 64 signed buckets via "
    "portable md5 hash (sign bit 6 cancels collisions in expectation); "
    "no vocabulary dictionary is ever built — fixed output width at any "
    "corpus size. One corpus scan, one vocab-sized combine, 64-row output.",
)
def feature_hashing_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load(spark, sf_dir, "documents").select(
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)")
        ).alias("tok")
    )
    tc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    h = tc.select(_h60("tok").alias("hv"), "tok", "cnt")
    # sign bit = bit 6 of the hash, read with pure modulo arithmetic
    # (integer division via doubles would lose exactness above 2^53)
    sign = F.when(
        F.col("hv") % 128 == F.col("hv") % 64, F.col("cnt")
    ).otherwise(-F.col("cnt"))
    return h.groupBy((F.col("hv") % 64).alias("bucket")).agg(
        F.sum(sign).cast("bigint").alias("signed_mass"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("cnt").cast("bigint").alias("total_count"),
    )


# ---------------------------------------------------------------------------
# Seasonal anomaly detection on the event stream: an hour-of-week
# baseline (the 168-slot seasonal profile every ops dashboard uses),
# robust center/spread per (event_type, slot) via exact median and MAD,
# then a 3-sigma-equivalent robust z flag (1.4826 * MAD estimates sigma
# under normality). Two grouped exact-percentile passes over slot-sized
# groups — the per-slot state is O(event_types x 168) however large the
# stream; no global sort, no per-row window. Day-of-week is normalized
# to Sunday=0 in both engines (Spark's dayofweek is 1-based).
# ---------------------------------------------------------------------------
@query(
    "seasonal_anomaly_events",
    sql="""
    WITH slotted AS (
        SELECT event_type,
               (dayofweek(ts) * 24 + CAST(extract(hour FROM ts) AS INT)) AS slot,
               value
        FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type, slot, quantile_cont(value, 0.5) AS med
        FROM slotted GROUP BY 1, 2
    ),
    mad AS (
        SELECT s.event_type, s.slot, m.med,
               quantile_cont(abs(s.value - m.med), 0.5) AS mad
        FROM slotted s JOIN med m USING (event_type, slot)
        GROUP BY 1, 2, 3
    ),
    flagged AS (
        SELECT s.event_type,
               CASE WHEN abs(s.value - d.med) > 3 * 1.4826 * d.mad
                    THEN 1 ELSE 0 END AS is_anom
        FROM slotted s JOIN mad d USING (event_type, slot)
    )
    SELECT event_type, CAST(SUM(is_anom) AS BIGINT) AS n_anomalies,
           COUNT(*) AS n,
           ROUND(CAST(SUM(is_anom) AS DOUBLE) / COUNT(*), 6) AS anomaly_rate
    FROM flagged GROUP BY 1
    """,
    doc="Hour-of-week seasonal anomaly flags: per (event_type, slot) "
    "exact median + MAD baseline, robust |z| > 3 via the 1.4826 normal "
    "consistency factor. Baseline state is O(types x 168) at any stream "
    "size; two grouped percentile passes, no global sort.",
)
def seasonal_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    slotted = ev.select(
        "event_type",
        ((F.dayofweek("ts") - 1) * 24 + F.hour("ts")).alias("slot"),
        "value",
    )
    med = slotted.groupBy("event_type", "slot").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        slotted.join(med, ["event_type", "slot"])
        .groupBy("event_type", "slot", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    flagged = slotted.join(mad, ["event_type", "slot"]).select(
        "event_type",
        F.when(
            F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"), 1
        )
        .otherwise(0)
        .alias("is_anom"),
    )
    return flagged.groupBy("event_type").agg(
        F.sum("is_anom").cast("bigint").alias("n_anomalies"),
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("is_anom").cast("double") / F.count(F.lit(1)), 6
        ).alias("anomaly_rate"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit — the companion check to the k-anonymity ladder
# (plans/advanced.py): a quasi-identifier group can be k-large and STILL
# leak if every member shares the same sensitive value. Groups are
# (nation, account-balance band); the sensitive attribute is the market
# segment; a group fails l=3 when it carries fewer than 3 distinct
# sensitive values. One hash aggregate with countDistinct — the audit
# output is O(groups), and the flag arithmetic never touches rows.
# ---------------------------------------------------------------------------
@query(
    "ldiversity_audit",
    sql="""
    SELECT c_nationkey AS nation,
           CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
           COUNT(*) AS group_size,
           COUNT(DISTINCT c_mktsegment) AS l_distinct,
           CASE WHEN COUNT(DISTINCT c_mktsegment) < 3 THEN 1 ELSE 0 END
               AS violates_l3
    FROM customer
    GROUP BY 1, 2
    """,
    doc="l-diversity audit over (nation, balance-band) quasi-identifier "
    "groups with market segment as the sensitive attribute: groups with "
    "< 3 distinct sensitive values are flagged even when k-large. One "
    "hash aggregate, O(groups) output — the privacy companion to "
    "kanonymity_generalization_audit.",
)
def ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.floor(F.col("c_acctbal") / 2000.0).cast("bigint").alias("bal_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("c_mktsegment").alias("l_distinct"),
            F.when(F.countDistinct("c_mktsegment") < 3, 1)
            .otherwise(0)
            .alias("violates_l3"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage pruning (the WordPiece/SentencePiece vocab-size
# decision): find the smallest vocabulary prefix — ordered by frequency
# desc, token asc — whose cumulative mass reaches 95% of all token
# occurrences. The naive plan ranks every distinct token with a GLOBAL
# sort; this plan never ranks tokens at all. It aggregates to FREQUENCY
# LEVELS (distinct counts — a few hundred rows under any Zipfian
# corpus, bounded by max document frequency), takes the level-wise
# cumulative sum on that tiny frame, and solves for how many tokens of
# the boundary level are needed in closed form. The only corpus-sized
# work is the (token, count) combine.
# ---------------------------------------------------------------------------
@query(
    "vocab_coverage_prune",
    sql="""
    WITH tc AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> length(x) >= 2)) AS tok
        FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS f FROM tc GROUP BY 1),
    levels AS (SELECT f, COUNT(*) AS n_toks, f * COUNT(*) AS mass
               FROM freq GROUP BY 1),
    cum AS (
        SELECT f, n_toks, mass,
               SUM(mass) OVER (ORDER BY f DESC) AS cum_mass,
               SUM(n_toks) OVER (ORDER BY f DESC) AS cum_toks,
               SUM(mass) OVER () AS total_mass,
               SUM(n_toks) OVER () AS total_vocab
        FROM levels
    ),
    boundary AS (
        -- integer-exact 95% target: 20*cum >= 19*total avoids the
        -- double product 0.95*total whose last ulp could pick a
        -- different boundary level than the oracle
        SELECT * FROM cum
        WHERE 20 * cum_mass >= 19 * total_mass
          AND 20 * (cum_mass - mass) < 19 * total_mass
    )
    SELECT CAST(total_vocab AS BIGINT) AS total_vocab,
           CAST(total_mass AS BIGINT) AS total_mass,
           CAST(f AS BIGINT) AS f_star,
           CAST((cum_toks - n_toks)
                + (19 * total_mass - 20 * (cum_mass - mass) + 20 * f - 1)
                  // (20 * f) AS BIGINT) AS vocab_kept,
           ROUND(CAST((cum_mass - mass)
                      + f * ((19 * total_mass - 20 * (cum_mass - mass)
                              + 20 * f - 1) // (20 * f))
                      AS DOUBLE) / total_mass, 6) AS coverage
    FROM boundary
    """,
    doc="Vocabulary pruning to 95% token-mass coverage WITHOUT ranking "
    "tokens: aggregate to frequency levels (Zipf-bounded, a few hundred "
    "rows), level-wise cumulative window on that frame only, boundary "
    "level solved in closed form. Corpus-sized work is one (token, "
    "count) combine; the global window touches O(levels) rows.",
)
def vocab_coverage_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load(spark, sf_dir, "documents").select(
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)")
        ).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    levels = freq.groupBy("f").agg(F.count(F.lit(1)).alias("n_toks")).select(
        "f", "n_toks", (F.col("f") * F.col("n_toks")).alias("mass")
    )
    wcum = W.orderBy(F.desc("f")).rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    cum = levels.select(
        "f",
        "n_toks",
        "mass",
        F.sum("mass").over(wcum).alias("cum_mass"),
        F.sum("n_toks").over(wcum).alias("cum_toks"),
        F.sum("mass").over(wall).alias("total_mass"),
        F.sum("n_toks").over(wall).alias("total_vocab"),
    )
    # Integer-exact 95% target (20*cum >= 19*total) and integer ceiling
    # division for the boundary-level token count — no double product
    # rides the comparison on either engine, so the selected boundary
    # frequency level is bit-identical to the oracle's by construction.
    boundary = cum.where(
        (F.lit(20) * F.col("cum_mass") >= F.lit(19) * F.col("total_mass"))
        & (
            F.lit(20) * (F.col("cum_mass") - F.col("mass"))
            < F.lit(19) * F.col("total_mass")
        )
    )
    need = F.expr(
        "(19 * total_mass - 20 * (cum_mass - mass) + 20 * f - 1) div (20 * f)"
    ).cast("bigint")
    return boundary.select(
        F.col("total_vocab").cast("bigint").alias("total_vocab"),
        F.col("total_mass").cast("bigint").alias("total_mass"),
        F.col("f").cast("bigint").alias("f_star"),
        ((F.col("cum_toks") - F.col("n_toks")) + need)
        .cast("bigint")
        .alias("vocab_kept"),
        F.round(
            ((F.col("cum_mass") - F.col("mass")) + F.col("f") * need).cast("double")
            / F.col("total_mass"),
            6,
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# The hot inner loop of distributed BPE tokenizer training
# (operators/bpe_train.py): adjacent-symbol pair counts over the
# vocabulary, weighted by word frequency. The corpus collapses to
# (word, freq) FIRST — identical words never recount — so this, the
# per-round shuffle, is vocab-sized at any corpus size. The oracle
# recomputes the round-0 pair counts positionally (symbols are single
# characters before any merge, so pairs are 2-char substrings).
# ---------------------------------------------------------------------------
@query(
    "bpe_top_pairs",
    sql="""
    WITH w AS (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> length(x) >= 2)) AS word
        FROM documents
    ),
    v AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY 1),
    p AS (
        SELECT substr(word, CAST(i AS INT), 1) AS a,
               substr(word, CAST(i AS INT) + 1, 1) AS b,
               freq
        FROM v, unnest(generate_series(1, length(word) - 1)) AS t(i)
    ),
    c AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM p GROUP BY 1, 2)
    SELECT a, b, cnt FROM c ORDER BY cnt DESC, a ASC, b ASC LIMIT 20
    """,
    doc="Round-0 of distributed BPE training: top-20 adjacent-symbol "
    "pairs over the (word, freq) vocabulary — the per-round shuffle is "
    "vocab-sized because the corpus collapsed to word counts first. "
    "Deterministic (count, pair) ordering; the multi-round trainer "
    "(operators/bpe_train.py) is proven against the offline trainer in "
    "tests.",
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.operators.bpe_train import (
        pair_counts,
        vocab_from_documents,
    )

    vocab = vocab_from_documents(load(spark, sf_dir, "documents"))
    syms = vocab.withColumn("syms", F.expr("split(word, '')"))
    return (
        pair_counts(syms)
        .select("a", "b", F.col("cnt").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernandez & Stolfo) — the OTHER classic
# candidate generator for entity resolution, complementing the blocked
# edit-distance join (fuzzy_name_match): sort records by a key, compare
# each record only to its w nearest neighbors in sort order. Distributed
# form: the sort key's PREFIX is the block (so the window never crosses
# executors' hash partitions), row_number within block, self-join on
# rank offset 1..w — candidate volume is exactly w*n, never quadratic,
# and the final Levenshtein gate runs only on candidates.
# ---------------------------------------------------------------------------
@query(
    "sorted_neighborhood_pairs",
    sql="""
    WITH r AS (
        SELECT p_partkey, p_name,
               substr(p_name, 1, 2) AS blk,
               ROW_NUMBER() OVER (PARTITION BY substr(p_name, 1, 2)
                                  ORDER BY p_name, p_partkey) AS rn
        FROM part
    ),
    cand AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM r a JOIN r b
          ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 3
    )
    SELECT name_a, name_b, dist, COUNT(*) AS n_pairs
    FROM cand WHERE dist <= 4
    GROUP BY 1, 2, 3
    """,
    doc="Sorted-neighborhood entity-resolution blocking: sort-key-prefix "
    "blocks, row_number ranks, rank-offset self-join (candidate volume "
    "exactly w*n, never quadratic), Levenshtein gate on candidates only.",
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    r = part.select(
        "p_partkey",
        "p_name",
        F.substring("p_name", 1, 2).alias("blk"),
        F.row_number()
        .over(W.partitionBy(F.substring("p_name", 1, 2)).orderBy("p_name", "p_partkey"))
        .alias("rn"),
    )
    a = r.select(
        F.col("blk"), F.col("rn"), F.col("p_name").alias("name_a")
    )
    b = r.select(
        F.col("blk").alias("blk_b"),
        F.col("rn").alias("rn_b"),
        F.col("p_name").alias("name_b"),
    )
    cand = a.join(
        b,
        (F.col("blk") == F.col("blk_b"))
        & (F.col("rn_b") - F.col("rn") >= 1)
        & (F.col("rn_b") - F.col("rn") <= 3),
    ).select(
        "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
    )
    return (
        cand.where(F.col("dist") <= 4)
        .groupBy("name_a", "name_b", "dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier time-to-conversion over the event stream: for every
# 'view', hours until the SAME user's next 'purchase' — right-censored
# at the corpus horizon for views never followed by one (the views near
# the horizon are genuinely censored, which is the whole reason KM
# exists instead of a plain mean). The per-view duration comes from ONE
# user-key window pass (min following purchase ts); the estimator
# S(t) = prod(1 - d_i/n_i) is then computed WITHOUT any per-subject
# iteration: duration-level counts (one aggregate), at-risk sets n(t)
# as a descending cumulative sum over the duration-level frame, and the
# product as exp of a cumulative log sum — every window after the event
# scan runs on O(distinct durations) rows however many views exist.
# Log-sum order is pinned by the window sort so the doubles agree
# bit-for-bit across engines.
# ---------------------------------------------------------------------------
@query(
    "kaplan_meier_churn",
    sql="""
    WITH nxt AS (
        SELECT event_type, floor(epoch(ts))::BIGINT AS sec,
               (SELECT floor(epoch(MAX(ts)))::BIGINT FROM events) AS h,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN floor(epoch(ts))::BIGINT END)
                   OVER (PARTITION BY user_id
                         ORDER BY floor(epoch(ts))::BIGINT, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS p_sec
        FROM events
    ),
    views AS (
        SELECT CASE WHEN p_sec IS NOT NULL THEN (p_sec - sec) // 3600
                    ELSE (h - sec) // 3600 END AS dur,
               CASE WHEN p_sec IS NOT NULL THEN 1 ELSE 0 END AS converted
        FROM nxt WHERE event_type = 'view'
    ),
    lev AS (
        SELECT dur, COUNT(*) AS n_all,
               CAST(SUM(converted) AS BIGINT) AS d
        FROM views GROUP BY 1
    ),
    risk AS (
        SELECT dur, d,
               SUM(n_all) OVER (ORDER BY dur DESC) AS n_risk
        FROM lev
    )
    SELECT dur AS t, d AS n_converted, CAST(n_risk AS BIGINT) AS n_at_risk,
           ROUND(exp(SUM(ln(1 - CAST(d AS DOUBLE) / n_risk))
                     OVER (ORDER BY dur ASC)), 6) AS survival
    FROM risk WHERE d > 0 AND d < n_risk
    """,
    doc="Kaplan-Meier time-to-conversion (view -> next purchase, hours, "
    "horizon right-censoring): one user-key window for durations, then "
    "duration-level aggregate, descending-cumsum at-risk sets, and the "
    "product-limit via pinned-order log cumsum — all survival windows "
    "on O(distinct durations) rows.",
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    horizon = ev.agg(F.max("sec").alias("h"))
    wfwd = W.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    p_sec = F.min(
        F.when(F.col("event_type") == "purchase", F.col("sec"))
    ).over(wfwd)
    views = (
        ev.withColumn("p_sec", p_sec)
        .where(F.col("event_type") == "view")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("p_sec").isNotNull(),
                F.floor((F.col("p_sec") - F.col("sec")) / 3600),
            )
            .otherwise(F.floor((F.col("h") - F.col("sec")) / 3600))
            .alias("dur"),
            F.col("p_sec").isNotNull().cast("int").alias("converted"),
        )
    )
    lev = views.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("converted").cast("bigint").alias("d"),
    )
    wdesc = W.orderBy(F.desc("dur")).rowsBetween(W.unboundedPreceding, W.currentRow)
    wasc = W.orderBy(F.asc("dur")).rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = lev.select(
        "dur", "d", F.sum("n_all").over(wdesc).alias("n_risk")
    )
    surv = F.round(
        F.exp(
            F.sum(
                F.log(1 - F.col("d").cast("double") / F.col("n_risk"))
            ).over(wasc)
        ),
        6,
    )
    return (
        risk.where((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
        .select(
            F.col("dur").alias("t"),
            F.col("d").alias("n_converted"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            surv.alias("survival"),
        )
    )


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction (Rose et al. 2010) — multi-word keyphrases,
# complementing the single-term TF-IDF ranking and the PMI bigram
# collocations: candidate phrases are maximal stopword-free token runs
# (length <= 4); each word's degree accumulates the lengths of the
# phrases it appears in, its frequency counts its phrase occurrences;
# the phrase score is the sum of member word deg/freq ratios. All
# scoring is INTEGER micro-units (round(1e6 * deg / freq) summed as
# BIGINT), so double-summation order cannot move a rank in either
# engine. Distributed shape: one corpus scan -> token stream with a
# per-doc running stopword count as the phrase id (one doc-key window)
# -> two vocabulary-sized aggregates. No UDFs anywhere.
# ---------------------------------------------------------------------------
_RAKE_STOPS = (
    "the,a,an,and,or,of,to,in,on,for,with,is,are,was,were,be,as,at,by,it,"
    "this,that,from,but,not,have,has,had,they,their,there,which,will,would"
)


@query(
    "rake_keyphrases",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, u.pos, u.tok,
               CASE WHEN list_contains(string_split('{_RAKE_STOPS}', ','), u.tok)
                    THEN 1 ELSE 0 END AS stop
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS l
            FROM documents
        ), LATERAL (
            SELECT unnest([{{'tok': l[i], 'pos': i}}
                           for i in range(1, len(l) + 1)], recursive := true)
        ) AS u
    ),
    marked AS (
        -- window BEFORE the stopword filter (WHERE in the same SELECT
        -- would run first and zero out every stop count)
        SELECT doc_id, pos, tok, stop,
               SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
        FROM toks
    ),
    nonstop AS (SELECT doc_id, pos, tok, pid FROM marked WHERE stop = 0),
    phrases AS (
        SELECT doc_id, pid,
               string_agg(tok, ' ' ORDER BY pos) AS phrase,
               COUNT(*) AS plen
        FROM nonstop GROUP BY 1, 2
    ),
    keep AS (SELECT * FROM phrases WHERE plen <= 4),
    members AS (
        SELECT phrase, plen, unnest(string_split(phrase, ' ')) AS w FROM keep
    ),
    wstats AS (
        SELECT w, CAST(SUM(plen) AS BIGINT) AS deg, COUNT(*) AS freq
        FROM members GROUP BY 1
    ),
    wscore AS (
        SELECT w, CAST(round(1000000.0 * deg / freq) AS BIGINT) AS mu
        FROM wstats
    ),
    pdistinct AS (
        SELECT phrase, COUNT(*) AS n_occurrences FROM keep GROUP BY 1
    ),
    pscore AS (
        SELECT p.phrase, p.n_occurrences,
               CAST(SUM(ws.mu) AS BIGINT) AS score_micro
        FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w
              FROM (SELECT DISTINCT phrase FROM keep)) pw
        JOIN wscore ws ON ws.w = pw.w
        JOIN pdistinct p ON p.phrase = pw.phrase
        GROUP BY 1, 2
    )
    SELECT phrase, n_occurrences, score_micro FROM pscore
    ORDER BY score_micro DESC, phrase ASC LIMIT 10
    """,
    doc="RAKE keyphrase extraction: maximal stopword-free runs (<=4 "
    "tokens) as candidates, word degree/frequency stats from two "
    "vocabulary-sized aggregates, phrase scores as order-free integer "
    "micro-unit sums; top-10 deterministic ranking.",
)
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    stops = _RAKE_STOPS.split(",")
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
        ).alias("pos", "tok"),
    ).withColumn(
        "stop", F.col("tok").isin(stops).cast("int")
    )
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    marked = toks.withColumn("pid", F.sum("stop").over(wdoc)).where(
        F.col("stop") == 0
    )
    phrases = (
        marked.groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(
                " ", F.expr("transform(sort_array(collect_list(struct(pos, tok))), s -> s.tok)")
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .where(F.col("plen") <= 4)
    )
    members = phrases.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    wscore = (
        members.groupBy("w")
        .agg(
            F.sum("plen").cast("bigint").alias("deg"),
            F.count(F.lit(1)).alias("freq"),
        )
        .select(
            "w",
            F.round(1000000.0 * F.col("deg") / F.col("freq"))
            .cast("bigint")
            .alias("mu"),
        )
    )
    pdistinct = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    pw = (
        phrases.select("phrase")
        .distinct()
        .select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
    )
    pscore = (
        pw.join(wscore, "w")
        .groupBy("phrase")
        .agg(F.sum("mu").cast("bigint").alias("score_micro"))
        .join(pdistinct, "phrase")
    )
    return (
        pscore.select("phrase", "n_occurrences", "score_micro")
        .orderBy(F.desc("score_micro"), F.asc("phrase"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Stratified holdout split with EXACT per-stratum allocation: every source
# contributes exactly floor(n/5) validation docs (rank * 5 <= n), chosen
# by a deterministic content-independent hash order — rerunning on the
# same corpus reproduces the identical split, and adding documents to one
# source never perturbs another source's assignment. This is the split
# discipline a training pipeline needs that df.sampleBy() cannot give:
# sampleBy is Bernoulli per row (allocation only IN EXPECTATION, and
# seed/partitioning-dependent), while this is exact, portable, and
# oracle-checkable. One shuffle (the per-source window); the per-source
# sort is bounded by the largest stratum.
# ---------------------------------------------------------------------------
@query(
    "stratified_holdout_split",
    sql="""
    WITH ranked AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                          doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents)
    SELECT doc_id, source,
           CASE WHEN rn * 5 <= n THEN 'val' ELSE 'train' END AS split,
           n_tokens
    FROM ranked
    """,
    doc="Deterministic stratified holdout split, exact floor(n/5) "
    "validation docs per source via md5-rank windows (doc-level "
    "assignment hash-pinned, not just the aggregate); the exact-"
    "allocation, reproducible alternative to Bernoulli sampleBy.",
    round_added=10,
)
def stratified_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.functions.hashing import md5_int60

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        md5_int60("cast(doc_id as string)").alias("h"),
    )
    w = W.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_tokens",
        F.row_number().over(w.orderBy("h", "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "source",
        F.when(F.col("rn") * 5 <= F.col("n"), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
        "n_tokens",
    )


# ---------------------------------------------------------------------------
# Int8 scalar quantization (round 11): the storage form embedding
# corpora actually ship at 100 TB scale (4x smaller than float32, and
# the ANN index probes decode it on the fly). Per-vector symmetric
# quantization: scale = max|x| / 127, q_i = floor(x_i/scale + 0.5) —
# written as the explicit floor(+0.5) so Spark and DuckDB share one
# rounding rule — and the reconstruction report (max abs error,
# saturation count) is what a quantization QA gate monitors. All
# element math runs in DOUBLE inside codegen higher-order functions
# (transform/aggregate), all reported stats are order-free (max/count),
# so the result is bit-stable across partitionings. Zero shuffles: pure
# row-local map. Reference parity: extends the embedding feature family
# (SURVEY §2.11 E190 norms) with the compression-QA operator.
# ---------------------------------------------------------------------------
@query(
    "embedding_int8_quantization",
    sql="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
        FROM embeddings
    ), s AS (
        SELECT vec_id, xs,
               list_max(list_transform(xs, x -> ABS(x))) / 127.0 AS scale
        FROM v
    )
    SELECT vec_id,
           LEN(xs) AS dim,
           ROUND(scale, 6) AS scale,
           ROUND(CASE WHEN scale = 0 THEN 0.0 ELSE
               list_max(list_transform(xs,
                   x -> ABS(x - FLOOR(x / scale + 0.5) * scale)))
           END, 6) AS max_abs_err,
           CASE WHEN scale = 0 THEN 0 ELSE
               LEN(list_filter(xs,
                   x -> ABS(FLOOR(x / scale + 0.5)) >= 127))
           END AS n_saturated
    FROM s
    """,
    doc="Per-vector symmetric int8 quantization QA: scale = max|x|/127, "
    "round-half-up written as floor(+0.5) in both engines, max "
    "reconstruction error and saturation count per vector; pure "
    "codegen higher-order functions, zero shuffles.",
    round_added=11,
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.tables import load

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("xs"),
    )
    s = v.withColumn(
        "scale", F.expr("array_max(transform(xs, x -> abs(x))) / 127.0D")
    )
    return s.select(
        "vec_id",
        F.size("xs").cast("long").alias("dim"),
        F.round("scale", 6).alias("scale"),
        F.round(
            F.expr(
                """CASE WHEN scale = 0D THEN 0D ELSE
                     array_max(transform(xs,
                         x -> abs(x - floor(x / scale + 0.5D) * scale)))
                   END"""
            ),
            6,
        ).alias("max_abs_err"),
        F.expr(
            """CASE WHEN scale = 0D THEN 0L ELSE
                 cast(size(filter(xs,
                     x -> abs(floor(x / scale + 0.5D)) >= 127D)) as long)
               END"""
        ).alias("n_saturated"),
    )
