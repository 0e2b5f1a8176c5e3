"""Tests for the deferred state machine (idempotence, retry), the JSONL
bin-packing sink, record merge/fold operators, and streaming equivalence."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_etl_pipeline_spark.etl import deferred
from data_etl_pipeline_spark.operators import records
from data_etl_pipeline_spark.operators.chunker import chunk_even_chars
from data_etl_pipeline_spark.sources import jsonl


def _chunks(spark, sf_dir, n_docs=10):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < n_docs)
    return chunk_even_chars(docs)


class TestDeferredStateMachine:
    def test_second_pass_creates_no_new_requests(self, spark, sf_dir):
        chunks = _chunks(spark, sf_dir)
        first = deferred.run_extraction_pass(chunks)
        wanted = deferred.build_requests(chunks)
        todo_after = deferred.missing_requests(wanted, first["state"])
        assert todo_after.count() == 0  # X4: incremental — nothing missing

    def test_retry_loop_converges_after_lost_responses(self, spark):
        # ST5 end-to-end: a batch loses half its responses -> those
        # requests are unpaired and answered by the NEXT pass; after the
        # retry the state is complete and a further pass creates nothing.
        from pyspark.sql import functions as F

        chunks = spark.createDataFrame(
            [(i, "0:9", f"alpha beta gamma delta w{i}") for i in range(8)],
            "doc_id long, chunk_bounds string, chunk_text string",
        )
        wanted = deferred.build_requests(chunks)
        state = wanted.withColumn("batch_id", F.lit("b1")).withColumn(
            "response", F.lit(None).cast("string")
        )
        # the result file only contains answers for even entities
        results = deferred.llm_stub_responses(wanted.where(F.col("entity").cast("long") % 2 == 0))
        state = deferred.unpair_missing(deferred.harvest(state, results), results)
        lost = state.where(F.col("batch_id").isNull() & F.col("response").isNull())
        assert lost.count() == wanted.count() / 2
        # retry pass: answer exactly the unpaired pending requests
        retry = deferred.llm_stub_responses(lost)
        state = deferred.harvest(state, retry)
        assert state.where(F.col("response").isNull()).count() == 0
        assert deferred.missing_requests(wanted, state).count() == 0  # converged

    def test_dead_letters_capture_unparseable_responses(self, spark):
        completed = spark.createDataFrame(
            [
                ("1>products>llm_search>chunk>0:9", "1", "products", '["ok"]'),
                ("2>products>llm_search>chunk>0:9", "2", "products", "```json\n[\"ok\"]\n```"),
                ("3>products>llm_search>chunk>0:9", "3", "products", "not json at all {"),
            ],
            "custom_id string, entity string, field string, response string",
        )
        errs = deferred.dead_letters(completed).collect()
        # repaired fenced payload parses; only the truly broken row lands
        assert [(e["entity"], e["error"]) for e in errs] == [("3", "json_parse_error")]
        # and the pass surfaces the same rows under the "errors" key
        assert "errors" in deferred.run_extraction_pass(
            spark.createDataFrame(
                [(1, "0:9", "alpha beta")], "doc_id long, chunk_bounds string, chunk_text string"
            )
        )

    def test_unpair_missing_resets_batch_id(self, spark):
        state = spark.createDataFrame(
            [("a", "b1"), ("b", "b1"), ("c", None)], "custom_id string, batch_id string"
        )
        results = spark.createDataFrame([("a",)], "custom_id string")
        out = {r["custom_id"]: r["batch_id"] for r in deferred.unpair_missing(state, results).collect()}
        assert out == {"a": "b1", "b": None, "c": None}

    def test_harvest_is_idempotent(self, spark, sf_dir):
        chunks = _chunks(spark, sf_dir)
        out1 = deferred.run_extraction_pass(chunks)
        # harvest the same responses again — results unchanged
        responses = deferred.llm_stub_responses(deferred.build_requests(chunks))
        state2 = deferred.harvest(out1["state"], responses)
        r1 = sorted(tuple(r) for r in deferred.reconcile(out1["state"].where(F.col("response").isNotNull())).collect())
        r2 = sorted(tuple(r) for r in deferred.reconcile(state2.where(F.col("response").isNotNull())).collect())
        assert r1 == r2

    def test_dirty_responses_are_repaired(self, spark, sf_dir):
        chunks = _chunks(spark, sf_dir, n_docs=50)
        reqs = deferred.build_requests(chunks)
        resp = deferred.llm_stub_responses(reqs)
        n_dirty = resp.where(F.col("response").startswith("```")).count()
        assert n_dirty > 0  # fixture exercises the repair path
        state = deferred.harvest(reqs.withColumn("response", F.lit(None).cast("string")), resp)
        rec = deferred.reconcile(state.where(F.col("response").isNotNull()))
        assert rec.where(F.col("results").isNull()).count() == 0


class TestJsonlPacking:
    def test_caps_respected(self, spark, sf_dir):
        reqs = deferred.build_requests(_chunks(spark, sf_dir, n_docs=30))
        packed = jsonl.assign_files(reqs, max_requests=10, max_tokens=10**9, n_partitions=2)
        sizes = packed.groupBy("file_id").agg(F.count(F.lit(1)).alias("n")).collect()
        assert all(r["n"] <= 10 for r in sizes)
        assert packed.count() == reqs.count()  # every request assigned exactly once

    def test_token_cap(self, spark, sf_dir):
        reqs = deferred.build_requests(_chunks(spark, sf_dir, n_docs=30))
        packed = reqs.join(jsonl.assign_files(reqs, max_requests=10**9, max_tokens=120, n_partitions=2), "custom_id")
        tok = packed.groupBy("file_id").agg(F.sum("num_tokens").alias("t"), F.count(F.lit(1)).alias("n")).collect()
        for r in tok:
            assert r["t"] <= 120 or r["n"] == 1  # single oversized item gets its own file

    def test_write_and_read_roundtrip(self, spark, sf_dir, tmp_path):
        reqs = deferred.build_requests(_chunks(spark, sf_dir, n_docs=5))
        out = str(tmp_path / "jsonl")
        jsonl.write_request_files(reqs, out, max_requests=20, n_partitions=1)
        back = spark.read.json(f"{out}/file_id=*/")
        assert back.count() == reqs.count()
        assert "custom_id" in back.columns

    def test_missing_ids(self, spark):
        req = spark.createDataFrame([("a",), ("b",), ("c",)], "custom_id string")
        res = spark.createDataFrame([("a",), ("c",)], "custom_id string")
        assert [r["custom_id"] for r in jsonl.missing_ids(req, res).collect()] == ["b"]

    def test_byte_cap_charged_in_bytes_not_chars(self, spark, tmp_path):
        # multibyte UTF-8 content: a char-counted cap would under-charge
        # ~3x for CJK text and let a file packed "to the cap" exceed it on
        # disk; the cap must be charged via octet_length of the exact line
        rows = [(f"id{i:03d}", 5, "東京都" * 30) for i in range(40)]
        reqs = spark.createDataFrame(rows, "custom_id string, num_tokens int, context string")
        cap = 2000
        packed = jsonl.assign_files(
            reqs, max_requests=10**9, max_tokens=10**9, max_bytes=cap, n_partitions=1
        )
        out = str(tmp_path / "jl")
        jsonl.write_request_files(
            reqs, out, max_requests=10**9, max_tokens=10**9, max_bytes=cap, n_partitions=1
        )
        import glob
        import os as _os

        per_file = {}
        for p in glob.glob(f"{out}/file_id=*/part-*"):
            fid = p.split("file_id=")[1].split("/")[0]
            per_file[fid] = per_file.get(fid, 0) + _os.path.getsize(p)
        assert per_file  # wrote something
        n_per_file = {r["file_id"]: r["n"] for r in
                      packed.groupBy("file_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        for fid, size in per_file.items():
            # on-disk bytes respect the cap unless the file is a single
            # oversized request (per-item atomicity)
            assert size <= cap or n_per_file.get(fid, 0) == 1, (fid, size)

    def test_byte_splitter_line_exact(self):
        data = b"".join(f"line{i}\n".encode() for i in range(100))
        chunks = jsonl.split_bytes_on_lines(data, max_chunk=64)
        assert b"".join(chunks) == data
        for c in chunks[:-1]:
            assert c.endswith(b"\n")
            assert len(c) <= 64


class TestRecordOps:
    def test_merge_addresses(self, spark):
        rows = [
            ("e1", "Springfield", "IL", "US", "62701", ["111"]),
            ("e1", "Springfield", "IL", "US", None, ["222"]),  # merges: null postal
            ("e1", "Springfield", "IL", "US", "62702", None),  # conflicting postal -> separate...
            ("e1", "Portland", "OR", "US", None, ["333"]),
        ]
        df = spark.createDataFrame(
            rows, "entity string, city string, state string, country string, postal_code string, phones array<string>"
        )
        out = records.merge_addresses(df).collect()
        springfield = [r for r in out if r["city"] == "Springfield"]
        portland = [r for r in out if r["city"] == "Portland"]
        assert len(portland) == 1
        # two distinct non-null postals -> null-postal row joins its code group;
        # the reference's can_merge splits incompatible codes
        assert len(springfield) == 2
        assert {r["postal_code"] for r in springfield} == {"62701", "62702"}

    def test_correction_fold_all(self, spark):
        df = spark.createDataFrame(
            [("e1", ["a", "b", "c"])], "entity string, base_results array<string>"
        ).withColumn(
            "logs",
            F.expr(
                "array(named_struct('seq', 1, 'add', array('d'), 'remove', array('a')),"
                " named_struct('seq', 2, 'add', array('a'), 'remove', array('d')))"
            ),
        )
        out = records.correction_fold(df, mode="fold_all").collect()[0]
        assert out["final_results"] == ["a", "b", "c"]

    def test_correction_fold_last_log(self, spark):
        df = spark.createDataFrame(
            [("e1", ["a", "b"])], "entity string, base_results array<string>"
        ).withColumn(
            "logs",
            F.expr(
                "array(named_struct('seq', 1, 'add', array('x'), 'remove', array('a')),"
                " named_struct('seq', 2, 'add', array('z'), 'remove', array('b')))"
            ),
        )
        out = records.correction_fold(df, mode="last_log").collect()[0]
        assert out["final_results"] == ["a", "z"]  # only seq 2 applies


class TestStreaming:
    def test_stream_matches_batch(self, spark, sf_dir):
        from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded
        from data_etl_pipeline_spark.streaming.windows import run_stream_hourly_counts

        _ensure_loaded()
        streamed = {
            (r["window_start"], r["event_type"]): r["n"] for r in run_stream_hourly_counts(spark, sf_dir).collect()
        }
        batch = QUERIES["hourly_event_stats"].fn(spark, sf_dir)
        batched = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
        assert streamed == batched

    def test_stream_static_join(self, spark, sf_dir):
        from data_etl_pipeline_spark.streaming.windows import run_stream_enriched_counts

        out = run_stream_enriched_counts(spark, sf_dir)
        rows = out.collect()
        assert rows  # events joined to customer segments
        assert {c for c in out.columns} == {"c_mktsegment", "event_type", "n"}


def test_byte_splitter_cuts_mid_line_only_when_no_newline_in_backscan():
    """An over-cap line with no newline in the backscan window is cut at
    the raw byte cap (the reference's behavior) — the jsonl_split_chunks
    oracle deliberately does NOT model this, which is safe because its
    blob is built from short lines (documented precondition)."""
    from data_etl_pipeline_spark.sources.jsonl import split_bytes_on_lines

    data = b"a" * 100 + b"\n" + b"b" * 300 + b"\n"
    chunks = split_bytes_on_lines(data, max_chunk=120, backscan=30)
    assert b"".join(chunks) == data
    # first cut lands at the newline (byte 100, inside the 30-byte
    # backscan window of byte 120)...
    assert chunks[0] == b"a" * 100 + b"\n"
    # ...but the long b-line exceeds the cap with no newline inside the
    # backscan window, so it is cut mid-line at exactly max_chunk bytes
    assert len(chunks[1]) == 120 and not chunks[1].endswith(b"\n")
    # and with a backscan too short to reach the newline, even the first
    # cut is mid-line at the raw cap (the reference's bounded look-back)
    short = split_bytes_on_lines(data, max_chunk=120, backscan=10)
    assert len(short[0]) == 120 and not short[0].endswith(b"\n")


def test_stream_merge_versioned_matches_batch(spark, sf_dir, tmp_path):
    """The streaming MERGE sink (foreachBatch -> versioned-table upsert
    keyed on epoch) must equal the static join, and re-merging an epoch's
    partials must not double count (at-least-once contract)."""
    from pyspark.sql import functions as F

    from data_etl_pipeline_spark.sources.versioned import VersionedTable
    from data_etl_pipeline_spark.streaming.windows import run_stream_merge_versioned
    from data_etl_pipeline_spark.tables import load

    path = str(tmp_path / "stream_tbl")
    out = run_stream_merge_versioned(spark, sf_dir, table_path=path)
    got = {(r["c_mktsegment"], r["event_type"]): r["n"] for r in out.collect()}
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    expect = {
        (r["c_mktsegment"], r["event_type"]): r["n"]
        for r in load(spark, sf_dir, "events")
        .join(customer, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect

    # at-least-once redelivery: re-merge one epoch's exact rows -> no change
    tbl = VersionedTable(spark, path)
    epochs = [r["epoch"] for r in tbl.read().select("epoch").distinct().collect()]
    redelivered = tbl.read().where(F.col("epoch") == epochs[0])
    tbl.merge(redelivered, keys=["epoch", "c_mktsegment", "event_type"])
    again = {
        (r["c_mktsegment"], r["event_type"]): r["n"]
        for r in tbl.read().groupBy("c_mktsegment", "event_type").agg(F.sum("n").alias("n")).collect()
    }
    assert again == expect
    # the ingestion history is time-travelable: version count grew per epoch
    assert len(tbl.history()) >= 2


def test_stream_window_merge_converges_under_out_of_order_arrival(spark, sf_dir, tmp_path):
    """Update-mode windowed MERGE: hours are spread across 3 source files
    so every micro-batch delivers LATE events for windows earlier batches
    already wrote — each re-emission must replace its window row, and the
    final table must equal the batch groupBy exactly."""
    from pyspark.sql import functions as F

    from data_etl_pipeline_spark.sources.versioned import VersionedTable
    from data_etl_pipeline_spark.streaming.windows import run_stream_update_merge_windows
    from data_etl_pipeline_spark.tables import load

    ev = load(spark, sf_dir, "events")
    src = str(tmp_path / "shuffled_events")
    # 3 files, each containing events from ALL hours (hash split)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw.repartition(3, F.pmod(F.col("event_id"), F.lit(3))).write.parquet(src)

    out = run_stream_update_merge_windows(
        spark, sf_dir, table_path=str(tmp_path / "win_tbl"), source_dir=src,
        watermark="720 hours",  # cover the artificial multi-day disorder
    )
    got = {(r["window_start"], r["event_type"]): r["n"] for r in out.collect()}
    expect = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expect

    # multi-batch really happened: one merge commit per micro-batch + v0
    tbl = VersionedTable(spark, str(tmp_path / "win_tbl"))
    assert len(tbl.history()) >= 3


def test_watermarked_dedup_bounds_state_and_drops_in_window_dups(spark, tmp_path):
    """The unbounded-stream swap SCALE.md documents for streaming dedup:
    ``withWatermark + dropDuplicatesWithinWatermark`` keeps only state
    inside the lateness horizon. Within-watermark redeliveries are still
    dropped exactly; the state row count is bounded by the horizon instead
    of the stream's full key cardinality."""
    import tempfile

    from pyspark.sql import functions as F

    src = tempfile.mkdtemp(prefix="wm_src_", dir=str(tmp_path))
    base = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.expr("timestamp '2024-01-01 00:00:00'") + F.make_interval(secs=F.col("id"))).alias("ts"),
    )
    # batch 1: all events; batch 2: full redelivery (all inside the horizon
    # because event times are re-read unchanged)
    base.coalesce(1).write.mode("append").parquet(src)
    base.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    sink = tempfile.mkdtemp(prefix="wm_sink_", dir=str(tmp_path))

    def write_epoch(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(f"{sink}/epoch={epoch_id}")

    q = stream.writeStream.outputMode("append").foreachBatch(write_epoch).start()
    try:
        q.processAllAvailable()
        progress = q.recentProgress
    finally:
        q.stop()

    out = spark.read.option("basePath", sink).parquet(f"{sink}/epoch=*")
    assert out.select("event_id").distinct().count() == 100
    assert out.count() == 100  # the full redelivery was absorbed
    # state is watermark-bounded: the operator reports rows in state
    state_rows = [
        op.get("numRowsTotal")
        for p in progress
        for op in (p.get("stateOperators") or [])
        if op.get("numRowsTotal") is not None
    ]
    assert state_rows and max(state_rows) <= 200
