"""Image header parsing against spec-derived byte vectors."""

from __future__ import annotations

from data_etl_pipeline_spark.operators.multimodal import (
    image_header_dims,
    image_header_features,
    synth_image_payload,
)


class TestKnownVectors:
    def test_png_spec_bytes(self):
        # the canonical 1x1 PNG header, byte-for-byte from the PNG spec
        p = bytes.fromhex(
            "89504e470d0a1a0a" "0000000d" "49484452"
            "00000001" "00000001" "0802000000" "00000000"
        )
        assert image_header_dims(p) == ("png", 1, 1)

    def test_gif_spec_bytes(self):
        # GIF89a logical screen 320x200, little-endian per spec
        p = b"GIF89a" + bytes.fromhex("4001" "c800") + b"\x00\x00\x00"
        assert image_header_dims(p) == ("gif", 320, 200)

    def test_jpeg_sof_after_app0(self):
        # SOI, APP0(JFIF), SOF0 with height=8, width=16 (big-endian)
        p = (
            bytes.fromhex("ffd8")
            + bytes.fromhex("ffe0" "0010") + b"JFIF\x00" + b"\x00" * 9
            + bytes.fromhex("ffc0" "000b" "08" "0008" "0010" "01" "11" "00")
        )
        assert image_header_dims(p) == ("jpeg", 16, 8)

    def test_bmp_negative_height_topdown(self):
        p = synth_image_payload("bmp", 64, 48)
        assert image_header_dims(p) == ("bmp", 64, 48)
        # top-down BMP stores a NEGATIVE height; dimension is |h|
        neg = bytearray(p)
        neg[22:26] = (-48).to_bytes(4, "little", signed=True)
        assert image_header_dims(bytes(neg)) == ("bmp", 64, 48)

    def test_unrecognized_and_truncated_return_none(self):
        assert image_header_dims(b"") is None
        assert image_header_dims(b"not an image at all") is None
        assert image_header_dims(b"\x89PNG\r\n\x1a\n0000") is None  # truncated
        assert image_header_dims(b"\xff\xd8\xff") is None  # JPEG, no SOF

    def test_synth_roundtrip_all_formats(self):
        for fmt in ("png", "gif", "bmp", "jpeg"):
            assert image_header_dims(synth_image_payload(fmt, 123, 45)) == (fmt, 123, 45)


def test_spark_scan_with_nulls_for_corrupt(spark):
    rows = [
        (1, synth_image_payload("png", 10, 20)),
        (2, b"garbage"),
        (3, synth_image_payload("jpeg", 300, 150)),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r["item_id"]: (r["format"], r["width"], r["height"])
           for r in image_header_features(df).collect()}
    assert got[1] == ("png", 10, 20)
    assert got[2] == (None, None, None)
    assert got[3] == ("jpeg", 300, 150)
