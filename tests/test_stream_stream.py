"""Stream-stream join: the state machinery must genuinely cross batches."""

from __future__ import annotations

from data_etl_pipeline_spark.streaming.ss_join import split_events_by_ts


def test_split_files_are_ts_ordered_and_disjoint(spark, sf_dir):
    _, bounds = split_events_by_ts(spark, sf_dir, n_files=3)
    assert len(bounds) == 3
    for (lo, hi), (lo2, _) in zip(bounds, bounds[1:]):
        assert lo <= hi <= lo2  # ranges ascend and never interleave


def test_cross_batch_pairs_survive_state(spark, tmp_path):
    """A view buffered in micro-batch 1 must join a purchase arriving in
    micro-batch 3 — proving StreamingSymmetricHashJoin keeps keyed state
    across batches — while a pair outside the 60-minute window must not
    appear even though the user matches."""
    import os

    from data_etl_pipeline_spark.streaming.ss_join import join_streams_over_dir

    src = str(tmp_path / "batches")
    rows_per_file = [
        # batch 1: two views (user 1 in-window, user 2 out-of-window)
        [(101, "2024-01-01 10:00:00", 1, "view"),
         (102, "2024-01-01 08:00:00", 2, "view")],
        # batch 2: unrelated traffic advances the watermark only slightly
        [(201, "2024-01-01 10:10:00", 3, "view")],
        # batch 3: purchases — user 1 within 60 min of its view, user 2 not
        [(301, "2024-01-01 10:45:00", 1, "purchase"),
         (302, "2024-01-01 10:45:00", 2, "purchase")],
    ]
    os.makedirs(src)
    for i, rows in enumerate(rows_per_file):
        df = spark.createDataFrame(
            [(e, __import__("datetime").datetime.fromisoformat(t), u, k) for e, t, u, k in rows],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        path = f"{src}/f{i}"
        df.coalesce(1).write.parquet(path)
        for f in os.listdir(path):
            full = os.path.join(path, f)
            os.utime(full, (1_600_000_000 + i * 10, 1_600_000_000 + i * 10))

    pairs = join_streams_over_dir(spark, f"{src}/f*", window_minutes=60).collect()
    got = {(r.v_id, r.p_id) for r in pairs}
    assert (101, 301) in got  # view from batch 1 joined purchase from batch 3
    assert (102, 302) not in got  # 2h45m gap: outside the window
