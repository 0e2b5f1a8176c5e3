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


class TestAudioHeaders:
    def test_wav_roundtrip_and_odd_chunk_padding(self, spark):
        from data_etl_pipeline_spark.operators.multimodal import (
            audio_header_info,
            synth_audio_payload,
        )

        for ch, rate, bits, n in [(1, 8000, 8, 1), (2, 48000, 24, 99999), (6, 192000, 32, 0)]:
            assert audio_header_info(synth_audio_payload("wav", ch, rate, bits, n)) == (
                "wav", ch, rate, bits, n,
            )
        # an odd-sized unknown chunk before fmt must be skipped WITH its
        # pad byte (RIFF chunks are word-aligned)
        base = synth_audio_payload("wav", 2, 44100, 16, 10)
        odd = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
        spliced = base[:12] + odd + base[12:]
        assert audio_header_info(spliced) == ("wav", 2, 44100, 16, 10)

    def test_flac_bit_packing_extremes(self, spark):
        from data_etl_pipeline_spark.operators.multimodal import (
            audio_header_info,
            synth_audio_payload,
        )

        # 8 channels, 32-bit depth, huge frame count exercise every field
        # boundary of the packed 64 bits
        assert audio_header_info(
            synth_audio_payload("flac", 8, 655350, 32, (1 << 36) - 1)
        ) == ("flac", 8, 655350, 32, (1 << 36) - 1)

    def test_malformed_payloads_yield_none(self, spark):
        from data_etl_pipeline_spark.operators.multimodal import audio_header_info

        assert audio_header_info(None) is None
        assert audio_header_info(b"") is None
        assert audio_header_info(b"RIFFxxxxWAVE") is None          # no chunks
        assert audio_header_info(b"fLaC\x81\x00\x00\x22") is None  # wrong first block type
        # fmt chunk declaring zero channels must not divide by zero
        from data_etl_pipeline_spark.operators.multimodal import synth_audio_payload

        p = bytearray(synth_audio_payload("wav", 1, 8000, 8, 4))
        p[22:24] = (0).to_bytes(2, "little")  # channels = 0
        assert audio_header_info(bytes(p)) is None

    def test_distributed_scan_nulls_for_unknown(self, spark):
        from data_etl_pipeline_spark.operators.multimodal import (
            audio_header_features,
            synth_audio_payload,
        )

        rows = [
            (0, synth_audio_payload("wav", 2, 44100, 16, 5)),
            (1, b"not audio at all"),
            (2, synth_audio_payload("flac", 1, 22050, 16, 7)),
        ]
        df = spark.createDataFrame(rows, "item_id long, payload binary")
        got = {r["item_id"]: r for r in audio_header_features(df).collect()}
        assert got[0]["format"] == "wav" and got[0]["n_frames"] == 5
        assert got[1]["format"] is None and got[1]["sample_rate"] is None
        assert got[2]["format"] == "flac" and got[2]["channels"] == 1
