"""Property tests for the round-7 behavioral/insight queries — invariants
the oracle hash can't express (dominance, probability mass, exactness of
unsaturated sketches)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded
from data_etl_pipeline_spark.tables import load

_ensure_loaded()


def _run(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_streaks_bounds(spark, sf_dir):
    rows = _run("user_activity_streaks", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_streak <= r.n_active_days
        assert r.n_streaks >= 1
        # streaks partition the active days
        assert r.longest_streak + (r.n_streaks - 1) <= r.n_active_days


def test_cohort_offset0_is_cohort_size(spark, sf_dir):
    out = _run("weekly_cohort_retention", spark, sf_dir)
    rows = out.collect()
    assert all(r.week_offset >= 0 for r in rows)
    # offset-0 count per cohort == number of users whose first week is that week
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = {
        r.cohort_week: r.n
        for r in first.groupBy("cohort_week").agg(F.count("*").alias("n")).collect()
    }
    zero = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    assert zero == sizes


def test_transition_probability_mass(spark, sf_dir):
    rows = _run("event_transition_probs", spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4  # round(6) per row, <=5 rows per group


def test_decayed_value_bounded_by_plain_sum(spark, sf_dir):
    out = {r.user_id: r for r in _run("time_decayed_user_value", spark, sf_dir).collect()}
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    for r in ev:
        got = out[r.user_id]
        assert got.n_events == r.n
        # every weight is in (0, 1]
        assert got.decayed_value <= r.s + 1e-6
        assert got.decayed_value > 0 or r.s <= 0


def test_benford_is_a_distribution(spark, sf_dir):
    rows = _run("benford_price_audit", spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_p for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.benford_p - math.log10(1 + 1 / r.digit)) < 1e-6


def test_pareto_no_dominated_survivor_and_none_missed(spark, sf_dir):
    out = _run("pareto_efficient_orders", spark, sf_dir).collect()
    allrows = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    )
    sky = {(r.o_totalprice, r.o_orderdate) for r in out}
    assert out

    def dominated(p, d):
        return any(
            (q.o_totalprice <= p and q.o_orderdate >= d)
            and (q.o_totalprice < p or q.o_orderdate > d)
            for q in allrows
        )

    for r in out:
        assert not dominated(r.o_totalprice, r.o_orderdate), r
    for q in allrows:
        if not dominated(q.o_totalprice, q.o_orderdate):
            assert (q.o_totalprice, q.o_orderdate) in sky, q


def test_pmi_support_and_order(spark, sf_dir):
    rows = _run("pmi_bigram_collocations", spark, sf_dir).collect()
    assert rows
    assert all(r.n12 >= 5 for r in rows)
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True) or all(
        pmis[i] > pmis[i + 1]
        or (pmis[i] == pmis[i + 1] and rows[i].bigram < rows[i + 1].bigram)
        for i in range(len(rows) - 1)
    )


def test_kmv_unsaturated_pairs_are_exact(spark, sf_dir):
    """sf0.001 has 15 users (< k=64): every sketch is the exact set, so
    the 'estimates' must equal exact Jaccard/intersection/union."""
    rows = _run("kmv_jaccard_event_types", spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sets: dict[str, set] = {}
    for r in ev.collect():
        sets.setdefault(r.event_type, set()).add(r.user_id)
    assert rows
    for r in rows:
        a, b = sets[r.type_a], sets[r.type_b]
        assert r.union_est == len(a | b)
        assert r.inter_est == len(a & b)
        assert abs(r.jaccard_est - len(a & b) / len(a | b)) < 1e-6


def test_cms_overestimates_never_under(spark, sf_dir):
    rows = _run("cms_user_frequencies", spark, sf_dir).collect()
    assert rows
    assert all(r.n_est >= r.n_true for r in rows)


def test_cms_merge_equals_full_sketch(spark, sf_dir):
    from data_etl_pipeline_spark.operators import cms

    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    full = {
        (r.r, r.pos): r.c for r in cms.cms_sketch(ev, "user_id").collect()
    }
    merged = {
        (r.r, r.pos): r.c
        for r in cms.cms_merge(
            cms.cms_sketch(a, "user_id"), cms.cms_sketch(b, "user_id")
        ).collect()
    }
    assert merged == full


def test_cms_unknown_key_estimates_from_collisions_only(spark, sf_dir):
    from data_etl_pipeline_spark.operators import cms

    ev = load(spark, sf_dir, "events").select("user_id")
    sketch = cms.cms_sketch(ev, "user_id")
    ghost = spark.createDataFrame([(999999999,)], "user_id bigint")
    est = cms.cms_estimate(sketch, ghost, "user_id").collect()[0].n_est
    assert est >= 0  # 0 unless all 4 counters collide


def test_bloom_prejoin_no_false_negatives(spark, sf_dir):
    """The bloom-filtered join output must equal the plain join."""
    got = {
        (r.nation, r.n_orders)
        for r in _run("bloom_prejoin_revenue", spark, sf_dir).collect()
    }
    cust = load(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7000)
    )
    plain = (
        load(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            load(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )
    want = {(r.n_name, r.n) for r in plain.collect()}
    assert got == want


def _ref_geohash(lat, lng, p):
    """Canonical bisection geohash (public algorithm) as the test oracle."""
    B = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_r, lng_r, bits, even = [-90.0, 90.0], [-180.0, 180.0], [], True
    while len(bits) < 5 * p:
        rng, v = (lng_r, lng) if even else (lat_r, lat)
        mid = (rng[0] + rng[1]) / 2
        bits.append(1 if v >= mid else 0)
        rng[0 if v >= mid else 1] = mid
        even = not even
    return "".join(
        B[int("".join(map(str, bits[i : i + 5])), 2)] for i in range(0, 5 * p, 5)
    )


def test_geohash_matches_bisection_reference(spark, sf_dir):
    from data_etl_pipeline_spark.operators.geo import geohash_decode_bounds

    rows = _run("supplier_geohash_cells", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.gh5 == _ref_geohash(r.lat, r.lng, 5), r
        assert r.cell2 == r.gh5[:2]
        lat_lo, lat_hi, lng_lo, lng_hi = geohash_decode_bounds(r.gh5)
        if r.lat < 90.0:
            assert lat_lo <= r.lat < lat_hi
        if r.lng < 180.0:
            assert lng_lo <= r.lng < lng_hi
