"""Property tests for the ML feature-prep queries (plans/mlfeat.py) —
invariants the oracle hash can't express: leakage exclusion, score
monotonicity, hashing-mass conservation, coverage tightness."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded
from data_etl_pipeline_spark.tables import load

_ensure_loaded()


def _run(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_target_encoding_excludes_own_fold(spark, sf_dir):
    """The encoding for (segment, fold) must equal the smoothed mean of
    every OTHER fold's rows — recomputed independently row-by-row."""
    rows = _run("target_encode_kfold", spark, sf_dir).collect()
    assert rows and {r.fold for r in rows} <= set(range(5))

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    f = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (
            F.expr(
                "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 15), 16, 10)"
                " as bigint)"
            )
            % 5
        ).alias("fold"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    g = {
        (r.segment, r.fold): (float(r.s), r.c)
        for r in f.groupBy("segment", "fold")
        .agg(F.sum("p").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    total_s = sum(s for s, _ in g.values())
    total_c = sum(c for _, c in g.values())
    prior = total_s / total_c
    for r in rows:
        oof_s = sum(s for (seg, fo), (s, _) in g.items() if seg == r.segment and fo != r.fold)
        oof_c = sum(c for (seg, fo), (_, c) in g.items() if seg == r.segment and fo != r.fold)
        want = (oof_s + 20 * prior) / (oof_c + 20)
        assert abs(r.encoded - want) < 1e-5, (r, want)


def test_rfm_scores_monotone_in_monetary(spark, sf_dir):
    """Cells exist, scores are in 1..4, and the average monetary value is
    non-decreasing in m_score (quartile boundaries order the metric)."""
    rows = _run("rfm_customer_segments", spark, sf_dir).collect()
    assert rows
    by_m: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
        by_m.setdefault(r.m_score, []).append(r)
    avg = {
        m: sum(r.total_monetary for r in rs) / sum(r.n for r in rs)
        for m, rs in by_m.items()
    }
    ms = sorted(avg)
    assert all(avg[a] <= avg[b] for a, b in zip(ms, ms[1:]))


def test_feature_hashing_mass_conserved(spark, sf_dir):
    """Bucketed total_count must equal the corpus token count, buckets lie
    in [0, 64), and |signed_mass| <= total_count per bucket."""
    rows = _run("feature_hashing_signed", spark, sf_dir).collect()
    assert rows
    corpus_tokens = (
        load(spark, sf_dir, "documents")
        .select(
            F.size(
                F.expr(
                    "filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)"
                )
            ).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(r.total_count for r in rows) == corpus_tokens
    for r in rows:
        assert 0 <= r.bucket < 64
        assert abs(r.signed_mass) <= r.total_count


def test_seasonal_anomaly_rate_bounded(spark, sf_dir):
    """MAD-flagging can never mark the majority of a slot anomalous: the
    global anomaly rate per type stays well under 50%."""
    rows = _run("seasonal_anomaly_events", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_anomalies <= r.n
        assert r.anomaly_rate < 0.5


def test_ldiversity_flag_consistency(spark, sf_dir):
    rows = _run("ldiversity_audit", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.l_distinct <= min(r.group_size, 5)  # only 5 segments exist
        assert r.violates_l3 == (1 if r.l_distinct < 3 else 0)


def test_vocab_coverage_tight(spark, sf_dir):
    """vocab_kept is the MINIMAL prefix: coverage >= 0.95, and dropping one
    boundary-level token falls below 0.95."""
    row = _run("vocab_coverage_prune", spark, sf_dir).first()
    assert row.coverage >= 0.95
    assert row.vocab_kept <= row.total_vocab
    covered = row.coverage * row.total_mass
    assert (covered - row.f_star) / row.total_mass < 0.95


def test_sorted_neighborhood_candidate_volume_linear(spark, sf_dir):
    """Candidate generation is <= w*n (w=3) — the whole point of SN
    blocking — and every emitted pair respects the distance gate."""
    from data_etl_pipeline_spark.tables import load as _load

    rows = _run("sorted_neighborhood_pairs", spark, sf_dir).collect()
    assert rows
    n = _load(spark, sf_dir, "part").count()
    assert sum(r.n_pairs for r in rows) <= 3 * n
    for r in rows:
        assert r.dist <= 4
        assert r.name_a[:2] == r.name_b[:2]  # same block


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        _run("kaplan_meier_churn", spark, sf_dir).collect(), key=lambda r: r.t
    )
    assert rows
    prev_s, prev_risk = 1.0, None
    for r in rows:
        assert 0 < r.survival <= prev_s + 1e-9, "survival must be non-increasing"
        assert 0 < r.n_converted < r.n_at_risk
        if prev_risk is not None:
            assert r.n_at_risk <= prev_risk, "risk set shrinks over time"
        prev_s, prev_risk = r.survival, r.n_at_risk


def test_kaplan_meier_censoring_present(spark, sf_dir):
    """The horizon must right-censor SOME views (otherwise KM reduces to
    a plain CDF and the estimator isn't being exercised): at-risk count
    at the first event time exceeds total conversions."""
    rows = _run("kaplan_meier_churn", spark, sf_dir).collect()
    total_converted = sum(r.n_converted for r in rows)
    max_risk = max(r.n_at_risk for r in rows)
    assert max_risk > total_converted, "no censored subjects reached the estimator"


def test_hard_negatives_exclude_own_label(spark, sf_dir):
    """Every mined negative has a different label than its query, ranks
    are dense 1..k, and similarity is non-increasing within a query."""
    rows = _run("hard_negative_mining", spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.q_label != r.neg_label
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cosine_sim for r in rs]
        assert all(a >= b for a, b in zip(sims, sims[1:]))


def test_rake_phrases_are_stopword_free_runs(spark, sf_dir):
    rows = _run("rake_keyphrases", spark, sf_dir).collect()
    assert len(rows) == 10
    stops = set(
        "the,a,an,and,or,of,to,in,on,for,with,is,are,was,were,be,as,at,by,it,"
        "this,that,from,but,not,have,has,had,they,their,there,which,will,would".split(",")
    )
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= 4
        assert not (set(words) & stops), r.phrase
        assert r.n_occurrences >= 1 and r.score_micro > 0
    # deterministic ranking: strictly ordered by (score desc, phrase asc)
    key = [(-r.score_micro, r.phrase) for r in rows]
    assert key == sorted(key)


def test_dynamic_gap_sessions_bounds(spark, sf_dir):
    """Per user: sessions <= events; a 2h-purchase-gap merge can never
    produce MORE sessions than the fixed 30m formulation."""
    from pyspark.sql import functions as F
    from data_etl_pipeline_spark.tables import load as _load

    rows = _run("dynamic_gap_sessions", spark, sf_dir).collect()
    assert rows
    got = {r.user_id: r for r in rows}
    ev = _load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    fixed = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .count()
    )
    for r in fixed.collect():
        g = got[r.user_id]
        assert g.n_sessions <= r["count"], (r.user_id, g.n_sessions, r["count"])
        assert g.max_session_events <= g.n_events
        assert g.n_sessions <= g.n_events
