"""ST6/ST7 scheduler + versioned-reprocessing tests."""

from __future__ import annotations

from data_etl_pipeline_spark.etl.scheduler import (
    FAILURE_COOLDOWN_S,
    SUCCESS_COOLDOWN_S,
    KeyBundle,
    complete_batch,
    detect_version_drift,
    plan_tick,
)


def test_plan_respects_quota():
    bundles = [KeyBundle("k1", token_quota=100)]
    pending = [("a", 40), ("b", 40), ("c", 40)]
    plan = plan_tick(bundles, pending, now=0.0)
    assert plan == {"k1": ["a", "b"]}  # third item would exceed the quota


def test_oversized_item_still_ships_alone():
    bundles = [KeyBundle("k1", token_quota=10)]
    plan = plan_tick(bundles, [("big", 500)], now=0.0)
    assert plan == {"k1": ["big"]}  # per-item atomicity like the JSONL writer


def test_busy_and_cooling_keys_skipped():
    bundles = [
        KeyBundle("k1", 100, in_flight_batch="b1"),
        KeyBundle("k2", 100, available_at=999.0),
        KeyBundle("k3", 100),
    ]
    plan = plan_tick(bundles, [("a", 10)], now=0.0)
    assert plan == {"k3": ["a"]}


def test_cooldowns():
    b = KeyBundle("k1", 100, in_flight_batch="b1", tokens_in_use=80)
    ok = complete_batch(b, now=1000.0, success=True)
    assert ok.in_flight_batch is None and ok.tokens_in_use == 0
    assert ok.available_at == 1000.0 + SUCCESS_COOLDOWN_S
    bad = complete_batch(b, now=1000.0, success=False)
    assert bad.available_at == 1000.0 + FAILURE_COOLDOWN_S


def test_work_split_across_keys():
    bundles = [KeyBundle("k1", 50), KeyBundle("k2", 50)]
    pending = [("a", 30), ("b", 30), ("c", 30)]
    plan = plan_tick(bundles, pending, now=0.0)
    assert plan == {"k1": ["a"], "k2": ["b"]}  # one batch per key per tick


def test_version_drift_detection(spark):
    current = spark.createDataFrame(
        [("e1", "v2"), ("e2", "v1"), ("e3", "v1")], "entity string, version_id string"
    )
    processed = spark.createDataFrame(
        [("e1", "v1"), ("e2", "v1")], "entity string, version_id string"
    )
    drift = {r["entity"] for r in detect_version_drift(current, processed).collect()}
    assert drift == {"e1", "e3"}  # e1 re-scraped (new version), e3 never processed
