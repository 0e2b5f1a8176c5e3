"""Python Data Source (sources/pysource.py): partition planning, filter
pushdown semantics, and end-to-end reads through the registered format."""

from __future__ import annotations

import pytest

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

from data_etl_pipeline_spark.sources import pysource

ROWS = [(f"id-{i}", "ok" if i % 3 else "bad", i, f"b{i}") for i in range(30)]


def _reader(tmp_path, n_shards=4):
    d = str(tmp_path / "results")
    pysource.write_result_fixture(ROWS, d, n_shards=n_shards)
    return pysource.BatchResultsReader({"path": d}), d


def test_partitions_one_per_shard_file(tmp_path):
    r, _ = _reader(tmp_path)
    assert sorted(p.shard for p in r.partitions()) == [0, 1, 2, 3]


def test_pushdown_equality_and_in(tmp_path):
    r, _ = _reader(tmp_path)
    assert list(r.pushFilters([EqualTo(("shard",), 1)])) == []
    assert [p.shard for p in r.partitions()] == [1]
    r2, _ = _reader(tmp_path)
    assert list(r2.pushFilters([In(("shard",), (0, 3))])) == []
    assert [p.shard for p in r2.partitions()] == [0, 3]
    # intersecting equality with IN narrows further
    r3, _ = _reader(tmp_path)
    assert list(r3.pushFilters([In(("shard",), (0, 3)), EqualTo(("shard",), 3)])) == []
    assert [p.shard for p in r3.partitions()] == [3]


def test_pushdown_ranges_strict_and_inclusive(tmp_path):
    r, _ = _reader(tmp_path)
    assert list(r.pushFilters([GreaterThan(("shard",), 0), LessThan(("shard",), 3)])) == []
    assert [p.shard for p in r.partitions()] == [1, 2]
    r2, _ = _reader(tmp_path)
    assert list(r2.pushFilters([GreaterThanOrEqual(("shard",), 2)])) == []
    assert [p.shard for p in r2.partitions()] == [2, 3]


def test_pushdown_equal_bound_keeps_strictness(tmp_path):
    # `shard > 1 AND shard >= 1`: both filters are consumed, so the
    # reader must honor the STRICTER of the two — shard 1 is excluded.
    # (Regression: the >= used to overwrite the strict flag.)
    r, _ = _reader(tmp_path)
    assert (
        list(r.pushFilters([GreaterThan(("shard",), 1), GreaterThanOrEqual(("shard",), 1)]))
        == []
    )
    assert [p.shard for p in r.partitions()] == [2, 3]
    # order-independent: >= first, then >
    r2, _ = _reader(tmp_path)
    assert (
        list(r2.pushFilters([GreaterThanOrEqual(("shard",), 1), GreaterThan(("shard",), 1)]))
        == []
    )
    assert [p.shard for p in r2.partitions()] == [2, 3]
    # same on the upper bound: shard < 2 AND shard <= 2 excludes 2
    r3, _ = _reader(tmp_path)
    assert (
        list(r3.pushFilters([LessThanOrEqual(("shard",), 2), LessThan(("shard",), 2)]))
        == []
    )
    assert [p.shard for p in r3.partitions()] == [0, 1]


def test_unsupported_filters_returned_to_spark(tmp_path):
    r, _ = _reader(tmp_path)
    unsupported = [
        StringStartsWith(("custom_id",), "id-1"),
        IsNotNull(("status",)),
        EqualTo(("status",), "ok"),  # supported column is shard only
    ]
    back = list(r.pushFilters([EqualTo(("shard",), 2), *unsupported]))
    assert back == unsupported  # same objects, same order
    assert [p.shard for p in r.partitions()] == [2]


def test_end_to_end_read_and_values(spark, tmp_path):
    _, d = _reader(tmp_path)
    pysource.register(spark)
    df = spark.read.format("batch_results").option("path", d).load()
    got = {(r.custom_id): (r.shard, r.status, r.n_tokens, r.body) for r in df.collect()}
    assert len(got) == len(ROWS)
    import hashlib

    for cid, status, n, body in ROWS:
        shard = int(hashlib.md5(cid.encode()).hexdigest()[:8], 16) % 4
        assert got[cid] == (shard, status, n, body)


def test_contradictory_pushdown_reads_nothing(tmp_path):
    r, _ = _reader(tmp_path)
    list(r.pushFilters([EqualTo(("shard",), 1), EqualTo(("shard",), 2)]))
    assert r.partitions() == []


def test_stream_reader_offsets_and_replay(tmp_path):
    """read() advances the offset by exactly the landed files;
    readBetweenOffsets replays the identical rows (immutable files =>
    deterministic replay, the exactly-once precondition)."""
    import shutil

    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    pysource.write_result_fixture(ROWS, staging)
    import os

    os.makedirs(live)
    r = pysource.BatchResultsStreamReader({"path": live})
    o0 = r.initialOffset()
    rows0, o1 = r.read(o0)
    assert list(rows0) == [] and o1 == {"files": []}

    shutil.copy(f"{staging}/part-0.jsonl", f"{live}/part-0.jsonl")
    shutil.copy(f"{staging}/part-1.jsonl", f"{live}/part-1.jsonl")
    rows1, o2 = r.read(o1)
    batch1 = sorted(rows1)
    assert sorted(o2["files"]) == ["part-0.jsonl", "part-1.jsonl"]
    assert batch1 and {t[0] for t in batch1} == {0, 1}

    shutil.copy(f"{staging}/part-3.jsonl", f"{live}/part-3.jsonl")
    rows2, o3 = r.read(o2)
    batch2 = sorted(rows2)
    assert {t[0] for t in batch2} == {3}
    # failure replay: between-offsets re-read is byte-identical
    assert sorted(r.readBetweenOffsets(o2, o3)) == batch2
    assert sorted(r.readBetweenOffsets(o1, o2)) == batch1
    # totals: nothing lost, nothing duplicated
    assert len(batch1) + len(batch2) == sum(
        1
        for cid, *_ in ROWS
        if int(__import__("hashlib").md5(cid.encode()).hexdigest()[:8], 16) % 4 != 2
    )


class TestNativeWriter:
    """df.write.format('batch_results'): two-phase commit writer."""

    @staticmethod
    def _df(spark, lo, hi):
        return spark.range(lo, hi).selectExpr(
            "'o-' || id AS custom_id",
            "CASE WHEN id % 7 = 0 THEN 'error' ELSE 'ok' END AS status",
            "id % 100 AS n_tokens",
            "'resp-' || id AS body",
        )

    def test_write_read_roundtrip(self, spark, tmp_path):
        import os

        from data_etl_pipeline_spark.sources import pysource

        pysource.register(spark)
        d = str(tmp_path / "out")
        self._df(spark, 0, 200).repartition(4).write.format("batch_results").option(
            "path", d
        ).mode("append").save()
        # staging fully cleaned after commit
        assert not os.path.isdir(os.path.join(d, "_staging"))
        got = spark.read.format("batch_results").option("path", d).load()
        assert got.count() == 200
        assert got.select("custom_id").distinct().count() == 200
        # derived shard agrees with the fixture/oracle hash
        import hashlib

        for r in got.take(20):
            want = int(hashlib.md5(r.custom_id.encode()).hexdigest()[:8], 16) % 4
            assert r.shard == want

    def test_append_then_overwrite(self, spark, tmp_path):
        from data_etl_pipeline_spark.sources import pysource

        pysource.register(spark)
        d = str(tmp_path / "out")
        self._df(spark, 0, 50).write.format("batch_results").option("path", d).mode(
            "append"
        ).save()
        self._df(spark, 50, 100).write.format("batch_results").option("path", d).mode(
            "append"
        ).save()
        got = spark.read.format("batch_results").option("path", d).load()
        assert got.count() == 100
        self._df(spark, 0, 30).write.format("batch_results").option("path", d).mode(
            "overwrite"
        ).save()
        got = spark.read.format("batch_results").option("path", d).load()
        assert got.count() == 30

    def test_failed_job_leaves_table_untouched(self, spark, tmp_path):
        import os

        from data_etl_pipeline_spark.sources import pysource

        pysource.register(spark)
        d = str(tmp_path / "out")
        self._df(spark, 0, 50).write.format("batch_results").option("path", d).mode(
            "append"
        ).save()
        bad = self._df(spark, 50, 100).selectExpr(
            "custom_id", "status", "n_tokens", "body", "1 AS shard"
        )
        with pytest.raises(Exception, match="derived from custom_id"):
            bad.write.format("batch_results").option("path", d).mode("append").save()
        # abort cleaned staging; the committed generation is intact
        assert not any(
            f.startswith("_staging") for f in os.listdir(d)
        ) or not os.listdir(os.path.join(d, "_staging"))
        got = spark.read.format("batch_results").option("path", d).load()
        assert got.count() == 50

    def test_pushdown_still_prunes_writer_files(self, spark, tmp_path):
        from data_etl_pipeline_spark.sources import pysource

        pysource.register(spark)
        d = str(tmp_path / "out")
        self._df(spark, 0, 200).repartition(3).write.format("batch_results").option(
            "path", d
        ).mode("append").save()
        got = (
            spark.read.format("batch_results").option("path", d).load()
            .where("shard = 2")
        )
        assert got.count() > 0
        assert got.select("shard").distinct().collect()[0][0] == 2


class TestNativeStreamWriter:
    """.writeStream.format('batch_results'): epoch-ledgered streaming sink."""

    def test_end_to_end_stream_pipeline(self, spark, tmp_path):
        import os
        import shutil

        from data_etl_pipeline_spark.sources import pysource

        pysource.register(spark)
        rows = [
            (f"o-{i}", "ok" if i % 3 else "error", i % 50, f"resp-{i}")
            for i in range(120)
        ]
        staging = str(tmp_path / "fixture")
        pysource.write_result_fixture(rows, staging, n_shards=4)
        live = str(tmp_path / "live")
        os.makedirs(live)
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        q = (
            spark.readStream.format("batch_results").option("path", live).load()
            .writeStream.format("batch_results")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            shutil.copy(os.path.join(staging, "part-0.jsonl"), live)
            shutil.copy(os.path.join(staging, "part-1.jsonl"), live)
            q.processAllAvailable()
            shutil.copy(os.path.join(staging, "part-2.jsonl"), live)
            shutil.copy(os.path.join(staging, "part-3.jsonl"), live)
            q.processAllAvailable()
        finally:
            q.stop()

        got = spark.read.format("batch_results").option("path", sink).load()
        assert got.count() == 120
        assert got.select("custom_id").distinct().count() == 120
        # ledger recorded at least two published batches
        assert len(os.listdir(os.path.join(sink, "_commits"))) >= 2

    def test_replayed_batch_id_not_published_twice(self, spark, tmp_path):
        import os

        from pyspark.sql import Row

        from data_etl_pipeline_spark.sources.pysource import (
            BatchResultsStreamWriter,
        )

        d = str(tmp_path / "sink")
        w = BatchResultsStreamWriter({"path": d})
        rows = [
            Row(custom_id=f"o-{i}", status="ok", n_tokens=i, body=f"b-{i}")
            for i in range(10)
        ]
        m1 = w.write(iter(rows))
        w.commit([m1], batchId=0)
        n_files = len([f for f in os.listdir(d) if f.endswith(".jsonl")])
        # redelivery of batch 0 (restart race): staged again, then dropped
        m2 = w.write(iter(rows))
        w.commit([m2], batchId=0)
        assert len([f for f in os.listdir(d) if f.endswith(".jsonl")]) == n_files
        assert not os.listdir(os.path.join(d, "_staging"))

    def test_abort_cleans_staging(self, spark, tmp_path):
        import os

        from pyspark.sql import Row

        from data_etl_pipeline_spark.sources.pysource import (
            BatchResultsStreamWriter,
        )

        d = str(tmp_path / "sink")
        w = BatchResultsStreamWriter({"path": d})
        m = w.write(iter([Row(custom_id="x", status="ok", n_tokens=1, body="b")]))
        w.abort([m, None], batchId=0)
        assert not os.listdir(os.path.join(d, "_staging"))
        assert not [f for f in os.listdir(d) if f.endswith(".jsonl")]
