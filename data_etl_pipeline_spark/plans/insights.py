"""Statistical-insight query shapes: distribution audits, skylines,
collocations, and sketch-based set overlap.

Four more warehouse-scale analysis shapes the reference's corpus/ledger
consumers run (SURVEY §2.4 aggregate family, §2.11 sketch family), each
expressed as a declarative plan with oracle-exact arithmetic:

- Benford first-digit audit (fraud/quality screening of a value ledger),
- Pareto-efficient frontier (2-D skyline) with a bucketed pre-skyline so
  the global pass sees only local survivors,
- PMI bigram collocations over the document corpus,
- KMV-sketch Jaccard / intersection estimates between key sets — the
  mergeable, oracle-exact alternative to exact set overlap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_etl_pipeline_spark.plans.registry import query
from data_etl_pipeline_spark.tables import load


# ---------------------------------------------------------------------------
# Benford's-law first-digit audit of the order ledger. The first
# significant digit comes from the decimal string of floor(price) —
# no log10-of-price boundary hazard (log10(1000.0) may round below 3).
# One scan, one 9-row aggregate; expected shares are closed-form.
# ---------------------------------------------------------------------------
@query(
    "benford_price_audit",
    sql="""
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT digit, n,
           ROUND(n / CAST(SUM(n) OVER () AS DOUBLE), 6) AS obs_p,
           ROUND(log10(1 + 1.0 / digit), 6) AS benford_p,
           ROUND(ABS(n / CAST(SUM(n) OVER () AS DOUBLE)
                     - log10(1 + 1.0 / digit)), 6) AS abs_dev
    FROM c
    """,
    doc="Benford first-digit distribution of o_totalprice vs the "
    "log10(1+1/d) expectation: digit from the integer's decimal string "
    "(immune to log10 rounding at exact powers of ten), shares over a "
    "9-row window. One scan, audit output is O(1).",
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(W.partitionBy())
    benford = F.log10(1 + 1.0 / F.col("digit"))
    obs = F.col("n") / tot.cast("double")
    return c.select(
        "digit",
        "n",
        F.round(obs, 6).alias("obs_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(F.abs(obs - benford), 6).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (2-D skyline): orders no other order beats on BOTH
# lower price and later date. Distributed shape: (1) per-price max-date
# aggregate (parallel, collapses equal-price rows so every later window
# walks unique prices); (2) bucketed LOCAL skyline — dominance within a
# price bucket implies global dominance, so locally-dominated rows drop
# in parallel; (3) global cummax pass over the surviving fraction only;
# (4) broadcast join back to emit the winning order rows.
# ---------------------------------------------------------------------------
@query(
    "pareto_efficient_orders",
    sql="""
    WITH pd AS (SELECT o_totalprice AS price, MAX(o_orderdate) AS d
                FROM orders GROUP BY 1),
    s AS (SELECT price, d,
                 MAX(d) OVER (ORDER BY price
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS mb
          FROM pd)
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN s ON o.o_totalprice = s.price AND o.o_orderdate = s.d
    WHERE s.mb IS NULL OR s.d > s.mb
    """,
    doc="Pareto-efficient orders (min price, max date skyline): per-price "
    "max-date aggregate, bucketed local skyline (parallel dominance "
    "pruning — safe because a same-bucket dominator is a global "
    "dominator), then the global cummax over local survivors only; "
    "skyline points broadcast back onto the fact table. The oracle runs "
    "the unbucketed single-window formulation — identical output proves "
    "the pruning is lossless.",
)
def pareto_efficient_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    pd_ = orders.groupBy(F.col("o_totalprice").alias("price")).agg(
        F.max("o_orderdate").alias("d")
    )
    # Local skyline within coarse price buckets: prices are unique after
    # the groupBy, so a strictly-preceding row is strictly cheaper.
    bkt = pd_.withColumn("bkt", F.floor(F.col("price") / F.lit(50000.0)))
    wloc = (
        W.partitionBy("bkt").orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    )
    loc = (
        bkt.withColumn("mb", F.max("d").over(wloc))
        .where(F.col("mb").isNull() | (F.col("d") > F.col("mb")))
        .drop("mb", "bkt")
    )
    wg = W.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    sky = (
        loc.withColumn("mb", F.max("d").over(wg))
        .where(F.col("mb").isNull() | (F.col("d") > F.col("mb")))
        .drop("mb")
    )
    return orders.join(
        F.broadcast(sky),
        (orders["o_totalprice"] == sky["price"])
        & (orders["o_orderdate"] == sky["d"]),
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


# ---------------------------------------------------------------------------
# PMI bigram collocations — the corpus-curation signal for multi-word
# expressions ("new york" vs chance co-occurrence). House tokenizer
# (lowercase alnum runs, len>=2); PMI in one arithmetic shape so both
# engines round identical doubles: log2(n12 * Nuni * Nuni / (Nbig * c1 * c2)).
# Scale: two grouped counts (bigram, unigram) + two joins on the word
# key; totals are 1-row broadcasts. Vocabulary-bound, not corpus-bound.
# ---------------------------------------------------------------------------
@query(
    "pmi_bigram_collocations",
    sql="""
    WITH toks AS (
        SELECT doc_id, generate_subscripts(arr, 1) AS i, unnest(arr) AS tok
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> length(x) >= 2) AS arr
              FROM documents)
    ),
    uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
    nuni AS (SELECT COUNT(*) AS nu FROM toks),
    big AS (
        SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS n12
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        GROUP BY 1, 2
    ),
    nbig AS (SELECT CAST(SUM(n12) AS BIGINT) AS nb FROM big)
    SELECT w1 || ' ' || w2 AS bigram, n12, u1.c AS c1, u2.c AS c2,
           ROUND(log2((CAST(n12 AS DOUBLE) * nu * nu)
                      / (CAST(nb AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
    FROM big JOIN uni u1 ON big.w1 = u1.tok
             JOIN uni u2 ON big.w2 = u2.tok, nuni, nbig
    WHERE n12 >= 5
    ORDER BY pmi DESC, bigram ASC LIMIT 40
    """,
    doc="Top-40 PMI bigram collocations (min support 5): bigram and "
    "unigram grouped counts, two word-key joins, 1-row total broadcasts. "
    "PMI evaluated as ONE left-associative double expression in both "
    "engines so the round(6) cannot split; deterministic (pmi, bigram) "
    "ordering.",
)
def pmi_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)"
        ).alias("arr")
    )
    toks = docs.select(F.explode("arr").alias("tok"), F.lit(1).alias("one"))
    # Bigrams key-locally: clamp the sequence bound so sub-2-token docs
    # yield an empty array even under eager generator evaluation
    # (InferFiltersFromGenerate — see SCALE.md round-7 note).
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(arr) - 1, 0)), "
                "          i -> struct(arr[i-1] AS w1, arr[i] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    nu = toks.agg(F.count(F.lit(1)).alias("nu"))
    nb = big.agg(F.sum("n12").cast("bigint").alias("nb"))
    j = (
        big.where(F.col("n12") >= 5)
        .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
    )
    pmi = F.log2(
        (F.col("n12").cast("double") * F.col("nu") * F.col("nu"))
        / (F.col("nb").cast("double") * F.col("c1") * F.col("c2"))
    )
    return (
        j.select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "n12",
            "c1",
            "c2",
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(40)
    )


# ---------------------------------------------------------------------------
# KMV set-overlap estimation between event-type audiences: Jaccard,
# intersection, and union estimates for every type pair from k=64
# sketches — Beyer et al.'s rho = |M ∩ S_A ∩ S_B| / |M| on the k
# smallest hashes M of the sketch union. md5-based, so the oracle
# reproduces every sketch row and estimate bit-for-bit; all arithmetic
# on the saturated path is integer. Scale: sketches are k rows per
# type regardless of corpus size; the pairwise stage touches only
# |types|^2 * k rows.
# ---------------------------------------------------------------------------
@query(
    "kmv_jaccard_event_types",
    sql="""
    WITH s AS (
        SELECT event_type, hx FROM (
            SELECT event_type, hx,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hx) AS rn
            FROM (SELECT DISTINCT event_type,
                         md5(CAST(user_id AS VARCHAR)) AS hx FROM events)
        ) WHERE rn <= 64
    ),
    ty AS (SELECT DISTINCT event_type FROM events),
    p AS (SELECT a.event_type AS ta, b.event_type AS tb
          FROM ty a JOIN ty b ON a.event_type < b.event_type),
    u AS (
        SELECT ta, tb, hx, COUNT(*) AS c FROM (
            SELECT p.ta, p.tb, s.hx FROM p JOIN s ON s.event_type = p.ta
            UNION ALL
            SELECT p.ta, p.tb, s.hx FROM p JOIN s ON s.event_type = p.tb
        ) GROUP BY 1, 2, 3
    ),
    m AS (SELECT ta, tb, hx, c,
                 ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hx) AS rn
          FROM u),
    agg AS (
        SELECT ta, tb, COUNT(*) AS mm,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ov,
               MAX(('0x' || substr(hx, 1, 12))::BIGINT) AS vk
        FROM m WHERE rn <= 64 GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b, ov AS overlap_k,
           CAST(CASE WHEN mm < 64 THEN mm
                ELSE (63 * 281474976710656) // GREATEST(vk, 1) END
                AS BIGINT) AS union_est,
           CAST((ov * (CASE WHEN mm < 64 THEN mm
                       ELSE (63 * 281474976710656) // GREATEST(vk, 1) END)) // mm
                AS BIGINT) AS inter_est,
           ROUND(ov / CAST(mm AS DOUBLE), 6) AS jaccard_est
    FROM agg
    """,
    doc="Pairwise audience overlap from k=64 KMV sketches (Beyer et al. "
    "set-op estimator): M = k smallest hashes of the pair union, "
    "jaccard = |M in both| / |M|, intersection = jaccard * KMV union "
    "estimate — integer-exact on the saturated path, EXACT sets on the "
    "unsaturated path. Sketch size is k per type however large the log; "
    "oracle rebuilds identical sketches from md5.",
)
def kmv_jaccard_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.operators import kmv as kv

    k = 64
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    s = kv.kmv_sketch(ev, "user_id", k=k, group_cols=["event_type"])
    ty = ev.select("event_type").distinct()
    pairs = (
        ty.alias("a")
        .join(ty.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
    )
    ua = F.broadcast(pairs).join(s, F.col("ta") == s["event_type"]).select(
        "ta", "tb", "hx"
    )
    ub = F.broadcast(pairs).join(s, F.col("tb") == s["event_type"]).select(
        "ta", "tb", "hx"
    )
    u = ua.unionByName(ub).groupBy("ta", "tb", "hx").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("ta", "tb").orderBy("hx")
    m = u.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    num = (k - 1) * (1 << 48)
    agg = m.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("mm"),
        F.sum((F.col("c") == 2).cast("bigint")).alias("ov"),
        F.max(F.conv(F.substring("hx", 1, 12), 16, 10).cast("bigint")).alias("vk"),
    )
    union_est = F.when(F.col("mm") < k, F.col("mm").cast("bigint")).otherwise(
        F.expr(f"cast({num}L div greatest(vk, 1L) as bigint)")
    )
    return (
        agg.withColumn("union_est", union_est)
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("ov").alias("overlap_k"),
            "union_est",
            F.expr("cast((ov * union_est) div mm as bigint)").alias("inter_est"),
            F.round(F.col("ov") / F.col("mm").cast("double"), 6).alias(
                "jaccard_est"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch frequency estimation (operators/cms.py): per-user
# event counts estimated from a 4x512 mergeable counter sketch next to
# the exact counts — n_est >= n_true always, equal when the user's
# counters are collision-free. The oracle rebuilds the identical sketch
# from md5 positions, so this is an approximate algorithm under an
# exact value-hash gate.
# ---------------------------------------------------------------------------
@query(
    "cms_user_frequencies",
    sql="""
    WITH r AS (SELECT unnest([0, 1, 2, 3]) AS i),
    sk AS (
        SELECT r.i,
               (('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#' ||
                                    CAST(r.i AS VARCHAR)), 1, 12))::BIGINT
                % 512) AS pos,
               COUNT(*) AS c
        FROM events, r GROUP BY 1, 2
    ),
    k AS (SELECT user_id, COUNT(*) AS n_true FROM events GROUP BY 1)
    SELECT k.user_id, k.n_true, CAST(MIN(sk.c) AS BIGINT) AS n_est
    FROM k CROSS JOIN r
    JOIN sk ON sk.i = r.i
           AND sk.pos = (('0x' || substr(md5(CAST(k.user_id AS VARCHAR) || '#' ||
                                             CAST(r.i AS VARCHAR)), 1, 12))::BIGINT
                         % 512)
    GROUP BY 1, 2
    """,
    doc="Count-min sketch (4 rows x 512 md5-hashed counters) next to "
    "exact per-user counts: build is one hash aggregate over a d-way "
    "row-local fan-out, state is <= 2048 rows however large the log, "
    "estimates broadcast-join the sketch and take the min counter. "
    "Oracle rebuilds the identical sketch.",
)
def cms_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.operators import cms

    ev = load(spark, sf_dir, "events").select("user_id")
    sketch = cms.cms_sketch(ev, "user_id", d=4, w=512)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_true"))
    est = cms.cms_estimate(sketch, truth.select("user_id"), "user_id", d=4, w=512)
    return truth.join(est, "user_id").select("user_id", "n_true", "n_est")


# ---------------------------------------------------------------------------
# Geohash spatial bucketing (operators/geo.py): the supplier fleet's
# deterministic lat/lng (same derivation as supplier_wkt_points) encoded
# to precision-5 cells plus the nesting precision-2 prefix — pure
# integer shifts in whole-stage codegen, zero shuffle for the encode,
# one hash exchange for the cell rollup. Both dialects are emitted from
# ONE bit-plan loop, so the engines cannot drift.
# ---------------------------------------------------------------------------
def _geohash_oracle_sql() -> str:
    from data_etl_pipeline_spark.operators.geo import geohash_duckdb

    gh = geohash_duckdb("lat", "lng", 5)
    return f"""
    WITH pts AS (
        SELECT s_suppkey,
               CAST(((s_suppkey * 7) % 181) - 90 AS DOUBLE)
                   * (CASE WHEN s_suppkey % 5 = 0 THEN 3 ELSE 1 END) AS lat,
               CAST(((s_suppkey * 13) % 361) - 180 AS DOUBLE) AS lng
        FROM supplier
    ),
    g AS (SELECT s_suppkey, lat, lng, {gh} AS gh5
          FROM pts WHERE lat BETWEEN -90 AND 90 AND lng BETWEEN -180 AND 180)
    SELECT gh5, substr(gh5, 1, 2) AS cell2, s_suppkey, lat, lng FROM g
    """


@query(
    "supplier_geohash_cells",
    sql=_geohash_oracle_sql(),
    doc="Geohash encode (precision 5) of the supplier fleet as closed-"
    "form integer bit interleaving — codegen only, no UDF; prefix "
    "truncation gives the nesting coarse cell for free. Encoder "
    "verified against the canonical bisection algorithm including the "
    "±90/±180 edges (tests/test_r7_insights.py).",
)
def supplier_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.operators.geo import geohash_col

    pts = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (
            (((F.col("s_suppkey") * 7) % 181) - 90).cast("double")
            * F.when(F.col("s_suppkey") % 5 == 0, F.lit(3)).otherwise(F.lit(1))
        ).alias("lat"),
        ((((F.col("s_suppkey") * 13) % 361)) - 180).cast("double").alias("lng"),
    ).where(
        (F.col("lat") >= -90) & (F.col("lat") <= 90)
        & (F.col("lng") >= -180) & (F.col("lng") <= 180)
    )
    g = pts.withColumn("gh5", geohash_col("lat", "lng", 5))
    return g.select(
        "gh5", F.substring("gh5", 1, 2).alias("cell2"), "s_suppkey", "lat", "lng"
    )


# ---------------------------------------------------------------------------
# Chi-square feature selection — the token-level discriminativeness
# ranking a classifier pipeline (operators/nbayes.py) runs before
# training: for each (token, language) the 2x2 presence contingency
# (a = lang docs with token, b = other docs with token, c/d = without)
# scored chi2 = N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)). Counts are exact
# integers from ONE distinct (doc, lang, token) aggregate (vocabulary-
# bound, not corpus-bound); the score is one left-associative double
# expression in both engines. Top-5 tokens per language.
# ---------------------------------------------------------------------------
@query(
    "chi2_token_selection",
    sql="""
    WITH dt AS (
        SELECT DISTINCT doc_id, lang, unnest(
            list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                        x -> length(x) >= 2)) AS tok
        FROM documents
    ),
    n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    lang_docs AS (SELECT lang, COUNT(DISTINCT doc_id) AS nl FROM documents GROUP BY 1),
    tl AS (SELECT tok, lang, COUNT(*) AS a FROM dt GROUP BY 1, 2),
    tok_docs AS (SELECT tok, CAST(SUM(a) AS BIGINT) AS nt FROM tl GROUP BY 1),
    x AS (
        SELECT tl.tok, tl.lang, tl.a,
               tok_docs.nt - tl.a AS b,
               lang_docs.nl - tl.a AS c,
               n_docs.n - tok_docs.nt - (lang_docs.nl - tl.a) AS d,
               n_docs.n AS n
        FROM tl JOIN tok_docs USING (tok) JOIN lang_docs USING (lang), n_docs
    ),
    scored AS (
        SELECT tok, lang, a, b, c, d,
               ROUND((CAST(n AS DOUBLE) * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                      * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c))
                     / ((CAST(a + b AS DOUBLE)) * (c + d) * (a + c) * (b + d)), 6)
                   AS chi2
        FROM x WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY chi2 DESC, tok ASC) AS rn
        FROM scored
    )
    SELECT lang, tok, a, b, c, d, chi2 FROM ranked WHERE rn <= 5
    """,
    doc="Chi-square token selection per language: presence contingency "
    "from one distinct (doc, lang, token) aggregate, joins bounded by "
    "vocabulary x languages, the statistic evaluated in one arithmetic "
    "shape in both engines; deterministic (chi2, token) ranking, top-5 "
    "per language.",
)
def chi2_token_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)")
        ).alias("tok"),
    ).distinct()
    n_docs = docs.select(F.countDistinct("doc_id").alias("n"))
    lang_docs = docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("nl"))
    tl = dt.groupBy("tok", "lang").agg(F.count(F.lit(1)).alias("a"))
    tok_docs = tl.groupBy("tok").agg(F.sum("a").cast("bigint").alias("nt"))
    x = (
        tl.join(tok_docs, "tok")
        .join(F.broadcast(lang_docs), "lang")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            "lang",
            "a",
            (F.col("nt") - F.col("a")).alias("b"),
            (F.col("nl") - F.col("a")).alias("c"),
            (F.col("n") - F.col("nt") - (F.col("nl") - F.col("a"))).alias("d"),
            "n",
        )
    )
    ad_bc = F.col("a").cast("double") * F.col("d") - F.col("b").cast("double") * F.col("c")
    chi2 = F.round(
        (F.col("n").cast("double") * ad_bc * ad_bc)
        / (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("d"))
        ),
        6,
    )
    scored = x.where(
        ((F.col("a") + F.col("b")) > 0)
        & ((F.col("c") + F.col("d")) > 0)
        & ((F.col("a") + F.col("c")) > 0)
        & ((F.col("b") + F.col("d")) > 0)
    ).select("tok", "lang", "a", "b", "c", "d", chi2.alias("chi2"))
    w = W.partitionBy("lang").orderBy(F.desc("chi2"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "tok", "a", "b", "c", "d", "chi2")
    )


# ---------------------------------------------------------------------------
# Spatial neighbor self-join via geohash grid bucketing: all supplier
# pairs within 20 degrees (euclidean degree metric), found by equi-
# joining each point's 3x3 cell NEIGHBORHOOD (precision-1 cells span 45
# degrees > the radius, so the neighborhood provably covers every
# qualifying pair) against each point's own cell — the classic
# grid-bucketed range join that replaces the O(n^2) cross join with a
# hash exchange. Neighbor cells come from x±1/y±1 on the QUANTIZED
# integers before interleaving (clamped at the poles/dateline, exactly
# matching the non-wrapping degree metric); the oracle brute-forces all
# pairs, so a missed neighborhood breaks the count, not just values.
# ---------------------------------------------------------------------------
@query(
    "supplier_geo_neighbor_pairs",
    sql="""
    WITH p AS (
        SELECT s_suppkey,
               CAST(((s_suppkey * 7) % 181) - 90 AS DOUBLE)
                   * (CASE WHEN s_suppkey % 5 = 0 THEN 3 ELSE 1 END) AS lat,
               CAST(((s_suppkey * 13) % 361) - 180 AS DOUBLE) AS lng
        FROM supplier
    ),
    g AS (SELECT * FROM p
          WHERE lat BETWEEN -90 AND 90 AND lng BETWEEN -180 AND 180)
    SELECT a.s_suppkey AS s_a, b.s_suppkey AS s_b,
           ROUND(sqrt((a.lat - b.lat) * (a.lat - b.lat)
                      + (a.lng - b.lng) * (a.lng - b.lng)), 6) AS dist_deg
    FROM g a JOIN g b ON a.s_suppkey < b.s_suppkey
    WHERE sqrt((a.lat - b.lat) * (a.lat - b.lat)
               + (a.lng - b.lng) * (a.lng - b.lng)) <= 20.0
    """,
    doc="Grid-bucketed spatial range join: 3x3 geohash-cell neighborhood "
    "(precision 1, 45-degree cells > 20-degree radius) equi-joined "
    "against own cells, exact distance filter after — a hash join where "
    "the naive formulation is a cross join. Oracle brute-forces every "
    "pair, proving neighborhood completeness.",
)
def supplier_geo_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.operators.geo import (
        _bit_plan,
        _spark_shift,
        geohash_from_ints_sql,
        quant_sql,
    )

    prec = 1
    _total, lng_bits, lat_bits = _bit_plan(prec)
    pts = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (
            (((F.col("s_suppkey") * 7) % 181) - 90).cast("double")
            * F.when(F.col("s_suppkey") % 5 == 0, F.lit(3)).otherwise(F.lit(1))
        ).alias("lat"),
        ((((F.col("s_suppkey") * 13) % 361)) - 180).cast("double").alias("lng"),
    ).where(
        (F.col("lat") >= -90) & (F.col("lat") <= 90)
        & (F.col("lng") >= -180) & (F.col("lng") <= 180)
    ).select(
        "s_suppkey", "lat", "lng",
        F.expr(quant_sql("lng", "lng", prec)).alias("x"),
        F.expr(quant_sql("lat", "lat", prec)).alias("y"),
    )
    cell = geohash_from_ints_sql("__nx", "__ny", prec, _spark_shift)
    left = (
        pts.select(
            F.col("s_suppkey").alias("s_a"),
            F.col("lat").alias("lat_a"),
            F.col("lng").alias("lng_a"),
            F.explode(
                F.expr(
                    "array(" + ",".join(
                        f"struct(least(greatest(x + {dx}, 0L), {(1 << lng_bits) - 1}L) AS nx, "
                        f"least(greatest(y + {dy}, 0L), {(1 << lat_bits) - 1}L) AS ny)"
                        for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1)
                    ) + ")"
                )
            ).alias("nb"),
        )
        .select(
            "s_a", "lat_a", "lng_a",
            F.expr(cell.replace("__nx", "nb.nx").replace("__ny", "nb.ny")).alias(
                "cell"
            ),
        )
        .distinct()  # pole/dateline clamps can duplicate a neighbor cell
    )
    right = pts.select(
        F.col("s_suppkey").alias("s_b"),
        F.col("lat").alias("lat_b"),
        F.col("lng").alias("lng_b"),
        F.expr(cell.replace("__nx", "x").replace("__ny", "y")).alias("cell"),
    )
    d2 = (
        (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b"))
        + (F.col("lng_a") - F.col("lng_b")) * (F.col("lng_a") - F.col("lng_b"))
    )
    return (
        left.join(right, "cell")
        .where(F.col("s_a") < F.col("s_b"))
        .where(F.sqrt(d2) <= 20.0)
        .select("s_a", "s_b", F.round(F.sqrt(d2), 6).alias("dist_deg"))
    )


# ---------------------------------------------------------------------------
# Pearson correlation matrix over lineitem's numeric columns — the
# profiling pass before any feature selection. Neither engine's builtin
# corr() is used: their streaming accumulations differ in the last
# bits, so both sides compute the SAME closed form from exact DECIMAL
# power sums (sum x, sum y, sum xy, sum x^2, sum y^2 — one map-side-
# combinable aggregate, order-free by exactness), then evaluate
# r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) once per
# pair in doubles. One scan, one one-row frame, 3 output rows.
# ---------------------------------------------------------------------------
@query(
    "lineitem_correlation_matrix",
    sql="""
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
               SUM(CAST(l_discount AS DECIMAL(18,4))) AS sd,
               SUM(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
               SUM(CAST(l_discount AS DECIMAL(18,4))
                   * CAST(l_discount AS DECIMAL(18,4))) AS sdd,
               SUM(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp,
               SUM(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,4))) AS sqd,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,4))) AS spd
        FROM lineitem
    )
    SELECT p.col_a, p.col_b,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
    FROM s, LATERAL (VALUES
        ('quantity', 'extendedprice', CAST(sq AS DOUBLE), CAST(sp AS DOUBLE),
         CAST(sqp AS DOUBLE), CAST(sqq AS DOUBLE), CAST(spp AS DOUBLE)),
        ('quantity', 'discount', CAST(sq AS DOUBLE), CAST(sd AS DOUBLE),
         CAST(sqd AS DOUBLE), CAST(sqq AS DOUBLE), CAST(sdd AS DOUBLE)),
        ('extendedprice', 'discount', CAST(sp AS DOUBLE), CAST(sd AS DOUBLE),
         CAST(spd AS DOUBLE), CAST(spp AS DOUBLE), CAST(sdd AS DOUBLE))
    ) AS p(col_a, col_b, sx, sy, sxy, sxx, syy)
    """,
    doc="Pearson correlation matrix from exact DECIMAL power sums (one "
    "map-side-combinable aggregate; engine-builtin corr() deliberately "
    "avoided - streaming accumulations differ in the last bits); closed "
    "form evaluated once per pair on a one-row frame.",
)
def lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,4)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"),
        F.sum(p * p).alias("spp"),
        F.sum(d * d).alias("sdd"),
        F.sum(q * p).alias("sqp"),
        F.sum(q * d).alias("sqd"),
        F.sum(p * d).alias("spd"),
    )
    pairs = [
        ("quantity", "extendedprice", "sq", "sp", "sqp", "sqq", "spp"),
        ("quantity", "discount", "sq", "sd", "sqd", "sqq", "sdd"),
        ("extendedprice", "discount", "sp", "sd", "spd", "spp", "sdd"),
    ]

    def r_of(sx: str, sy: str, sxy: str, sxx: str, syy: str) -> F.Column:
        n = F.col("n").cast("double")
        x, y = F.col(sx).cast("double"), F.col(sy).cast("double")
        xy = F.col(sxy).cast("double")
        xx, yy = F.col(sxx).cast("double"), F.col(syy).cast("double")
        return F.round(
            (n * xy - x * y) / F.sqrt((n * xx - x * x) * (n * yy - y * y)), 6
        )

    # ONE explode over the one-row power-sum frame — a union of selects
    # would re-execute the aggregate (and the scan) once per pair
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                r_of(sx, sy, sxy, sxx, syy).alias("r"),
            )
            for a, b, sx, sy, sxy, sxx, syy in pairs
        ]
    )
    return s.select(F.explode(structs).alias("p")).select(
        "p.col_a", "p.col_b", "p.r"
    )


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test between customer segments' order
# prices — the robust "did this source's distribution drift?" check
# (sibling of source_token_kl, which needs a binned model; KS needs
# none). Distributed form follows the level-frame discipline: prices
# quantize to 1000-unit levels (bounded level count at any row count),
# per-(level, segment) counts roll up once, the two CDFs are cumulative
# sums over the LEVEL frame, and D = max |cdf_a - cdf_b| — max is
# order-free, so no double-summation hazard exists anywhere.
# ---------------------------------------------------------------------------
@query(
    "ks_two_sample_price",
    sql="""
    WITH j AS (
        SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS lev,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 'a' ELSE 'b' END AS grp
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    lv AS (
        SELECT lev,
               COUNT(CASE WHEN grp = 'a' THEN 1 END) AS na,
               COUNT(CASE WHEN grp = 'b' THEN 1 END) AS nb
        FROM j GROUP BY 1
    ),
    c AS (
        SELECT SUM(na) OVER (ORDER BY lev) AS ca,
               SUM(nb) OVER (ORDER BY lev) AS cb,
               SUM(na) OVER () AS ta, SUM(nb) OVER () AS tb
        FROM lv
    )
    SELECT CAST(MAX(ta) AS BIGINT) AS n_a, CAST(MAX(tb) AS BIGINT) AS n_b,
           ROUND(MAX(abs(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)),
                 6) AS d_stat
    FROM c
    """,
    doc="Two-sample Kolmogorov-Smirnov D between segments' price "
    "distributions: 1000-unit price levels (bounded level frame), one "
    "grouped count, CDFs as level-frame cumsums, D as an order-free "
    "max of |cdf diffs|.",
)
def ks_two_sample_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("lev"),
        F.when(F.col("c_mktsegment") == "BUILDING", "a").otherwise("b").alias("grp"),
    )
    lv = j.groupBy("lev").agg(
        F.count(F.when(F.col("grp") == "a", 1)).alias("na"),
        F.count(F.when(F.col("grp") == "b", 1)).alias("nb"),
    )
    wcum = W.orderBy("lev").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    c = lv.select(
        F.sum("na").over(wcum).alias("ca"),
        F.sum("nb").over(wcum).alias("cb"),
        F.sum("na").over(wall).alias("ta"),
        F.sum("nb").over(wall).alias("tb"),
    )
    diff = F.abs(
        F.col("ca").cast("double") / F.col("ta")
        - F.col("cb").cast("double") / F.col("tb")
    )
    return c.agg(
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
        F.round(F.max(diff), 6).alias("d_stat"),
    )


# ---------------------------------------------------------------------------
# Cramér's V association between order status and priority — the
# categorical counterpart of the correlation matrix. Chi-square from
# one contingency aggregate; every per-cell term is computed in DOUBLE
# with the identical expression shape in both engines, ROUNDED to 6
# decimals, and accumulated as exact DECIMAL — the rounding step is
# what makes the 15-term sum order-free. Expected counts ride the
# row/column marginal windows on the 15-row contingency frame.
# ---------------------------------------------------------------------------
@query(
    "cramers_v_status_priority",
    sql="""
    WITH ct AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS o
        FROM orders GROUP BY 1, 2
    ),
    m AS (
        SELECT s, p, o,
               SUM(o) OVER (PARTITION BY s) AS rs,
               SUM(o) OVER (PARTITION BY p) AS cs,
               SUM(o) OVER () AS n
        FROM ct
    ),
    terms AS (
        SELECT n,
               CAST(ROUND(
                   pow(CAST(o AS DOUBLE) - CAST(rs AS DOUBLE) * cs / n, 2)
                   / (CAST(rs AS DOUBLE) * cs / n), 6) AS DECIMAL(18,6))
                   AS t,
               (SELECT COUNT(DISTINCT s) FROM ct) AS nr,
               (SELECT COUNT(DISTINCT p) FROM ct) AS nc
        FROM m
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2,
           ROUND(sqrt(CAST(SUM(t) AS DOUBLE)
                      / (MAX(n) * least(MAX(nr) - 1, MAX(nc) - 1))), 6) AS v
    FROM terms
    """,
    doc="Cramér's V between status and priority: one contingency "
    "aggregate, marginals as windows on the 15-row frame, per-cell "
    "chi-square terms rounded to 6dp then DECIMAL-summed so the "
    "accumulation is order-free in both engines.",
)
def cramers_v_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ct = load(spark, sf_dir, "orders").groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = ct.select(
        "s",
        "p",
        "o",
        F.sum("o").over(W.partitionBy("s")).alias("rs"),
        F.sum("o").over(W.partitionBy("p")).alias("cs"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("rs").cast("double") * F.col("cs") / F.col("n")
    t = F.round(F.pow(F.col("o").cast("double") - e, 2) / e, 6).cast(
        "decimal(18,6)"
    )
    nr = ct.select(F.countDistinct("s")).first()[0]
    nc = ct.select(F.countDistinct("p")).first()[0]
    chi2 = F.sum("t").cast("double")
    return (
        m.withColumn("t", t)
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(chi2, 6).alias("chi2"),
            F.round(
                F.sqrt(chi2 / (F.max("n") * min(nr - 1, nc - 1))), 6
            ).alias("v"),
        )
    )


# ---------------------------------------------------------------------------
# Population Stability Index — the industry-standard drift score between
# a reference period and a current period, complementing KS (E170): KS
# takes the single worst CDF gap, PSI weights EVERY decile's shift by
# its log-ratio, catching broad reshaping that one crossing point hides.
# Bins are the REFERENCE deciles via exact interpolated percentiles (the
# E146 boundary pattern — no global NTILE sort; one aggregate to a
# one-row boundary frame broadcast back), bin assignment is 9 boundary
# compares in codegen, and counts get add-one smoothing so an empty
# current-period bin contributes a large-but-finite term instead of an
# infinity. Each term is ONE left-associative double expression rounded
# to 6 decimals (the E133 PMI contract — ln is not correctly-rounded
# cross-engine, round(6) absorbs the ulps), and the total is an
# order-free DECIMAL sum of the rounded terms (the E171 pattern).
# ---------------------------------------------------------------------------
@query(
    "psi_price_drift",
    sql="""
    WITH src AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS p,
               o_orderdate >= TIMESTAMP '1999-01-01' AS is_cur
        FROM orders
    ),
    q AS (
        SELECT quantile_cont(p, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS b
        FROM src WHERE NOT is_cur
    ),
    binned AS (
        SELECT is_cur,
               CAST(p >= b[1] AS INT) + CAST(p >= b[2] AS INT)
             + CAST(p >= b[3] AS INT) + CAST(p >= b[4] AS INT)
             + CAST(p >= b[5] AS INT) + CAST(p >= b[6] AS INT)
             + CAST(p >= b[7] AS INT) + CAST(p >= b[8] AS INT)
             + CAST(p >= b[9] AS INT) AS bin
        FROM src, q
    ),
    counts AS (
        SELECT bin,
               COUNT(CASE WHEN NOT is_cur THEN 1 END) AS n_ref,
               COUNT(CASE WHEN is_cur THEN 1 END) AS n_cur
        FROM binned GROUP BY 1
    ),
    filled AS (
        SELECT t.bin,
               CAST(COALESCE(c.n_ref, 0) AS BIGINT) AS n_ref,
               CAST(COALESCE(c.n_cur, 0) AS BIGINT) AS n_cur,
               SUM(COALESCE(c.n_ref, 0)) OVER () AS t_ref,
               SUM(COALESCE(c.n_cur, 0)) OVER () AS t_cur
        FROM (SELECT unnest(range(0, 10)) AS bin) t
        LEFT JOIN counts c ON t.bin = c.bin
    ),
    terms AS (
        SELECT bin, n_ref, n_cur,
               ROUND((CAST(n_cur + 1 AS DOUBLE) / (t_cur + 10)
                      - CAST(n_ref + 1 AS DOUBLE) / (t_ref + 10))
                     * ln((CAST(n_cur + 1 AS DOUBLE) / (t_cur + 10))
                          / (CAST(n_ref + 1 AS DOUBLE) / (t_ref + 10))),
                     6) AS psi_term
        FROM filled
    )
    SELECT bin, n_ref, n_cur, psi_term,
           CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE)
               AS psi_total
    FROM terms ORDER BY bin
    """,
    doc="Population Stability Index between pre/post-1999 price "
    "distributions: reference-decile bins from exact percentiles (one "
    "boundary frame broadcast, no global sort), add-one smoothing for "
    "empty bins, per-bin terms rounded to 6 then DECIMAL-summed "
    "order-free; 10-row output with the total on every row.",
    round_added=8,
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("p"),
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")).alias(
            "is_cur"
        ),
    )
    q = src.where(~F.col("is_cur")).agg(
        F.expr(
            "percentile(p, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))"
        ).alias("b")
    )
    bin_expr = sum(
        (F.col("p") >= F.col("b")[i]).cast("int") for i in range(9)
    )
    binned = src.crossJoin(F.broadcast(q)).select(
        "is_cur", bin_expr.alias("bin")
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(~F.col("is_cur"), 1)).alias("n_ref"),
        F.count(F.when(F.col("is_cur"), 1)).alias("n_cur"),
    )
    bins = F.broadcast(
        spark.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    )
    wall = W.partitionBy()  # 10-row frame
    filled = (
        bins.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
        )
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.sum("n_ref").over(wall).alias("t_ref"),
            F.sum("n_cur").over(wall).alias("t_cur"),
        )
    )
    pc = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + 10)
    pr = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + 10)
    term = F.round((pc - pr) * F.log(pc / pr), 6)
    terms = filled.select("bin", "n_ref", "n_cur", term.alias("psi_term"))
    return terms.select(
        "bin",
        "n_ref",
        "n_cur",
        "psi_term",
        F.sum(F.col("psi_term").cast("decimal(18,6)"))
        .over(wall)
        .cast("double")
        .alias("psi_total"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# STREAMING twin of E176: online drift monitoring — daily PSI of the
# event-value distribution against a static week-1 reference, computed
# by a Structured Streaming query (stream-side: 4 codegen boundary
# compares + a watermark-bounded (day, bin) count; PSI math on the
# drained O(days x 5) frame). The reference boundaries are one bounded
# 4-scalar collect — the baseline pin every monitoring system makes.
# Oracle recomputes the same daily PSI from the raw table, which a
# fully drained complete-mode stream must equal.
# ---------------------------------------------------------------------------
@query(
    "stream_psi_drift",
    sql="""
    WITH ref AS (
        SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE ts < TIMESTAMP '2024-01-08'
    ),
    q AS (SELECT quantile_cont(v, [0.2, 0.4, 0.6, 0.8]) AS b FROM ref),
    rbin AS (
        SELECT CAST(v >= b[1] AS INT) + CAST(v >= b[2] AS INT)
             + CAST(v >= b[3] AS INT) + CAST(v >= b[4] AS INT) AS bin
        FROM ref, q
    ),
    rc AS (SELECT bin, COUNT(*) AS r FROM rbin GROUP BY 1),
    nref AS (SELECT COUNT(*) AS nr FROM ref),
    cur AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(CAST(value AS DOUBLE) >= b[1] AS INT)
             + CAST(CAST(value AS DOUBLE) >= b[2] AS INT)
             + CAST(CAST(value AS DOUBLE) >= b[3] AS INT)
             + CAST(CAST(value AS DOUBLE) >= b[4] AS INT) AS bin
        FROM events, q WHERE ts >= TIMESTAMP '2024-01-08'
    ),
    cc AS (SELECT day, bin, COUNT(*) AS c FROM cur GROUP BY 1, 2),
    grid AS (
        SELECT d.day, b.bin
        FROM (SELECT DISTINCT day FROM cc) d
        CROSS JOIN (SELECT unnest(range(0, 5)) AS bin) b
    ),
    filled AS (
        SELECT g.day, g.bin, COALESCE(cc.c, 0) AS c,
               SUM(COALESCE(cc.c, 0)) OVER (PARTITION BY g.day) AS n_day
        FROM grid g LEFT JOIN cc ON g.day = cc.day AND g.bin = cc.bin
    ),
    terms AS (
        SELECT day, n_day,
               ROUND((CAST(c + 1 AS DOUBLE) / (n_day + 5)
                      - CAST(COALESCE(rc.r, 0) + 1 AS DOUBLE) / (nr + 5))
                     * ln((CAST(c + 1 AS DOUBLE) / (n_day + 5))
                          / (CAST(COALESCE(rc.r, 0) + 1 AS DOUBLE) / (nr + 5))),
                     6) AS t
        FROM filled LEFT JOIN rc USING (bin), nref
    )
    SELECT day, CAST(MAX(n_day) AS BIGINT) AS n_events,
           CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE) AS psi
    FROM terms GROUP BY 1 ORDER BY 1
    """,
    doc="Daily PSI drift of event values vs a static week-1 reference "
    "over Structured Streaming: boundary compares + watermark-bounded "
    "(day, bin) counts stream-side, smoothed log-ratio terms rounded(6) "
    "and DECIMAL-summed on the drained frame; drained stream == batch "
    "oracle.",
    round_added=8,
)
def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.streaming.windows import run_stream_psi_drift

    return run_stream_psi_drift(spark, sf_dir)


# ---------------------------------------------------------------------------
# approx_top_k (round 11): Spark 4's sketch-based frequent-items
# aggregate — the one-pass, mergeable heavy-hitters path that replaces
# a full groupBy at 100 TB when only the head matters. On a bounded
# domain with maxItemsTracked >= the distinct count the sketch is EXACT
# (nothing evicts), which is what makes it oracle-checkable here: the
# in-query assert compares the sketch output against the engine's own
# exact groupBy before returning. Complements the CMS + Misra-Gries
# operators (trigram_heavy_hitters) with the native SQL surface.
# ---------------------------------------------------------------------------
@query(
    "approx_top_k_event_types",
    sql="""
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY 1
    """,
    doc="Native approx_top_k sketch aggregate, run un-saturated "
    "(maxItemsTracked >> distinct event types) so it is provably exact: "
    "asserted in-query against the exact groupBy, oracle-checked "
    "against DuckDB's.",
    round_added=11,
)
def approx_top_k_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_etl_pipeline_spark.tables import load

    ev = load(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    sketched = (
        ev.agg(F.expr("approx_top_k(event_type, 100, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("event_type"), F.col("e.count").alias("cnt"))
    )
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    got = {(r["event_type"], r["cnt"]) for r in sketched.collect()}  # bounded: k<=100
    want = {(r["event_type"], r["cnt"]) for r in exact.collect()}
    # un-saturated sketch == exact counts; a mismatch means the domain
    # outgrew maxItemsTracked and this query's exactness claim is void
    assert got == want, (got ^ want)
    return sketched
