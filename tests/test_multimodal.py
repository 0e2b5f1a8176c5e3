"""Multimodal plumbing tests: binary payload handling, Arrow batch shapes,
stubbed decode seam, approx-aggregate accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators import multimodal


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="no codec"):
        multimodal.decode_payload(b"\x89PNG...", "image")


def test_feature_extraction_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    payloads = multimodal.payloads_from_documents(docs)
    feats = multimodal.extract_features(payloads).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == 20
    for r in feats:
        raw = texts[r["item_id"]].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert 0 <= r["fake_width"] < 640 and 0 <= r["fake_height"] < 480
        assert r["kind"] in ("image", "audio", "video")


def test_binary_payload_type(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    payloads = multimodal.payloads_from_documents(docs)
    assert dict(payloads.dtypes)["payload"] == "binary"


def test_frame_sample_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    payloads = multimodal.payloads_from_documents(docs)
    frames = multimodal.frame_sample_plan(payloads, every_n=10)
    by_item = {r["item_id"]: r["n"] for r in frames.groupBy("item_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n >= 1 for n in by_item.values())  # every payload yields >= 1 sampled frame


def test_approx_distinct_accuracy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"), F.countDistinct("l_partkey").alias("p")
    ).collect()[0]
    approx = li.agg(
        F.approx_count_distinct("l_orderkey").alias("o"), F.approx_count_distinct("l_partkey").alias("p")
    ).collect()[0]
    # default HLL rsd is 5%; allow 2x headroom on the tiny smoke table
    assert abs(approx["o"] - exact["o"]) / exact["o"] < 0.10
    assert abs(approx["p"] - exact["p"]) / exact["p"] < 0.10


def test_resize_plan_geometry(spark, sf_dir):
    from data_etl_pipeline_spark.operators.multimodal import (
        extract_features,
        payloads_from_documents,
        resize_plan,
    )
    from data_etl_pipeline_spark.tables import load

    feats = extract_features(payloads_from_documents(load(spark, sf_dir, "documents")))
    plan = resize_plan(feats, max_side=256)
    rows = plan.collect()
    assert len(rows) == feats.count()
    for r in rows:
        # aspect-preserving fit, never upscaled, never zero-sized
        assert 1 <= r["target_width"] <= max(256, 1)
        assert 1 <= r["target_height"] <= max(256, 1)
        if r["needs_resize"]:
            assert max(r["src_width"], r["src_height"]) > 256
            assert r["scale"] < 1.0
        else:
            assert r["scale"] == 1.0
            assert r["target_width"] == max(r["src_width"], 1)


class TestVideoHeaders:
    def test_both_mvhd_versions_parse(self):
        from data_etl_pipeline_spark.operators.multimodal import (
            synth_video_payload,
            video_header_info,
        )

        for v in (0, 1):
            got = video_header_info(synth_video_payload(90000, 123456789, 2, v))
            assert got == ("mp4", 90000, 123456789, 2)

    def test_malformed_payloads_yield_none(self):
        from data_etl_pipeline_spark.operators.multimodal import (
            synth_video_payload,
            video_header_info,
        )

        good = synth_video_payload(30000, 1000, 1, 0)
        assert video_header_info(None) is None
        assert video_header_info(b"") is None
        assert video_header_info(b"1234") is None
        assert video_header_info(b"RIFFxxxxWAVE") is None  # wrong container
        assert video_header_info(good[:20]) is None  # truncated mid-moov
        # zero timescale refuses rather than dividing later
        bad = bytearray(synth_video_payload(1, 1000, 1, 0))
        i = bad.find((1).to_bytes(4, "big"), 40)
        assert video_header_info(bytes(bad)) is not None
        # corrupt the box size so the walk stops cleanly
        assert video_header_info(good[:4] + b"xxxx" + good[8:]) is None

    def test_version2_mvhd_refuses(self):
        from data_etl_pipeline_spark.operators.multimodal import (
            synth_video_payload,
            video_header_info,
        )

        p = bytearray(synth_video_payload(30000, 1000, 1, 0))
        # flip the mvhd version byte (body starts right after 'mvhd')
        i = p.find(b"mvhd") + 4
        p[i] = 2
        assert video_header_info(bytes(p)) is None
