"""Multimodal column plumbing (BASELINE.json first-class extension).

Images/audio/video ride through the engine as opaque ``binary`` payload
columns with typed metadata; the compute pattern is Arrow-batched
mapInPandas over (id, payload, kind). The actual codecs are NOT in this
container, so the decode step is stubbed:

  * ``decode_payload`` raises NotImplementedError — the seam where PIL/
    ffmpeg/torchaudio plug in;
  * ``extract_features`` computes real, deterministic byte-level features
    (size, digest, md5-derived fake dimensions) so the Spark plumbing —
    schema, batching, partitioning, UDF signature — is fully exercised and
    oracle-checkable end-to-end.

At 100 TB payloads dominate I/O: features project payloads down to a few
scalar columns in a single scan, and anything downstream (dedup by digest,
sampling by dimension) operates on the narrow table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "item_id long, kind string, n_bytes int, payload_sha256 string, "
    "fake_width int, fake_height int"
)

MERSENNE_31 = 2_147_483_647


def decode_payload(payload: bytes, kind: str):  # pragma: no cover - stub
    """Real decode seam (PIL.Image.open / av.open / soundfile.read).

    The codec libraries are not available in this environment; plug them in
    here — callers only see rows, so swapping the implementation does not
    change any pipeline code.
    """
    raise NotImplementedError(
        f"no codec for kind={kind!r} in this environment; "
        "install PIL/ffmpeg/torchaudio and implement decode_payload"
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decoded dimensions: derived from the same
    md5-int-60 hash the rest of the engine uses, so the DuckDB oracle can
    reproduce it."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16) % MERSENNE_31
    return (h % 640, h % 480)


def extract_features(df: DataFrame, id_col: str = "item_id", payload_col: str = "payload", kind_col: str = "kind") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One corpus scan; output is the narrow feature table. Batch shape:
    pandas DataFrames of (id, payload bytes, kind).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [_fake_dims(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "kind": pdf[kind_col],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "payload_sha256": [hashlib.sha256(bytes(p)).hexdigest() for p in payloads],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                }
            )

    return df.select(id_col, payload_col, kind_col).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "item_id") -> DataFrame:
    """Frame-sampling plumbing: emit (item_id, frame_no) rows for every
    n-th fake frame (frame count derived from payload size at 1 KB/frame).
    The decode of each frame is the NotImplementedError seam; the explode /
    partitioning shape is the real thing."""
    n_frames = F.greatest(F.lit(1), (F.length(F.col("payload")) / 1024).cast("int"))
    return (
        df.select(id_col, n_frames.alias("n_frames"))
        .select(
            id_col,
            F.explode(F.expr(f"filter(sequence(0, n_frames - 1), f -> f % {every_n} = 0)")).alias("frame_no"),
        )
    )


def resize_plan(
    features: DataFrame, max_side: int = 256, w_col: str = "fake_width", h_col: str = "fake_height"
) -> DataFrame:
    """Resize plumbing over the narrow feature table: compute the target
    geometry (aspect-preserving fit into max_side x max_side, never
    upscaling) as JVM expressions; only the pixel resample itself sits
    behind the decode_payload seam. Planning geometry on the feature
    table instead of the payload table is the 100 TB move — the decision
    of WHAT to resize never touches the heavy binary column.
    """
    w = F.greatest(F.col(w_col), F.lit(1))
    h = F.greatest(F.col(h_col), F.lit(1))
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return features.select(
        "item_id",
        "kind",
        F.col(w_col).alias("src_width"),
        F.col(h_col).alias("src_height"),
        F.round(scale, 6).alias("scale"),
        F.greatest(F.lit(1), F.floor(w * scale)).cast("int").alias("target_width"),
        F.greatest(F.lit(1), F.floor(h * scale)).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )


def payloads_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic binary fixture: the documents table's text bytes as
    payloads with a kind column cycling image/audio/video."""
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
    )


# ---------------------------------------------------------------------------
# REAL header parsing — no codec required. PNG/GIF/BMP/JPEG dimensions
# live in fixed, publicly-specified header fields (PNG IHDR big-endian at
# 16/20; GIF logical-screen little-endian at 6/8; BMP BITMAPINFOHEADER
# little-endian at 18/22; JPEG SOFn height/width after the marker), so
# width/height extraction is pure byte arithmetic. This moves the most
# common multimodal question — "what are the dimensions?" — OUT of the
# decode_payload stub into working code; only pixel access remains behind
# the codec seam.
# ---------------------------------------------------------------------------
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def image_header_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) parsed from the container header, or None
    for unrecognized/truncated/NULL payloads (callers surface NULLs, never
    exceptions — a corrupt blob must not kill a 100 TB scan). Parsed
    dimensions outside int32 range mark the header corrupt -> None, so
    the Arrow Int32 column build can never overflow either."""
    if payload is None:
        return None
    out = _image_header_dims_raw(bytes(payload))
    if out is None:
        return None
    _fmt, w, h = out
    if not (0 <= w <= 2**31 - 1 and 0 <= h <= 2**31 - 1):
        return None
    return out


def _image_header_dims_raw(p: bytes) -> tuple[str, int, int] | None:
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        return ("png", int.from_bytes(p[16:20], "big"), int.from_bytes(p[20:24], "big"))
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(p[6:8], "little"), int.from_bytes(p[8:10], "little"))
    if len(p) >= 26 and p[:2] == b"BM":
        # height may be negative (top-down rows); dimension is |height|
        return (
            "bmp",
            int.from_bytes(p[18:22], "little", signed=True),
            abs(int.from_bytes(p[22:26], "little", signed=True)),
        )
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(p):
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                if i + 9 > len(p):
                    return None
                h = int.from_bytes(p[i + 5 : i + 7], "big")
                w = int.from_bytes(p[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None


HEADER_SCHEMA = "item_id long, format string, width int, height int"


def image_header_features(df: DataFrame, id_col: str = "item_id", payload_col: str = "payload") -> DataFrame:
    """One Arrow-batched scan -> (item_id, format, width, height); NULL
    columns for payloads no header matcher recognizes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [image_header_dims(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "format": [t[0] if t else None for t in parsed],
                    "width": pd.array([t[1] if t else None for t in parsed], dtype="Int32"),
                    "height": pd.array([t[2] if t else None for t in parsed], dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, HEADER_SCHEMA)


def synth_image_payload(fmt: str, w: int, h: int) -> bytes:
    """Minimal spec-correct header bytes for fixtures: a real parser (this
    module's or any external tool reading only the header) sees exactly
    (w, h)."""
    if fmt == "png":
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00"
        )
    if fmt == "gif":
        return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00\x00\x00"
    if fmt == "bmp":
        # BITMAPINFOHEADER (size 40): 32-bit signed dims at offsets 18/22
        return (
            b"BM" + (54).to_bytes(4, "little") + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"\x00" * 24
        )
    if fmt == "jpeg":
        sof = b"\xff\xc0" + (8 + 3).to_bytes(2, "big") + b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x11\x00"
        return b"\xff\xd8" + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9 + sof
    raise ValueError(f"unknown fixture format {fmt!r}")


# ---------------------------------------------------------------------------
# Audio container headers (reference capability family of image_header_dims
# — multimodal metadata without codecs): WAV RIFF chunks and the FLAC
# STREAMINFO block are pure public byte layouts, so channel count, sample
# rate, bit depth and frame count parse from the first bytes of a blob.
# Only sample ACCESS stays behind the codec seam (decode_image/decode_audio).
# ---------------------------------------------------------------------------

def audio_header_info(payload: bytes) -> tuple[str, int, int, int, int] | None:
    """(format, channels, sample_rate, bits_per_sample, n_frames) from a
    WAV or FLAC container header, or None for unrecognized / truncated /
    malformed payloads (NULLs, never exceptions, on a 100 TB scan)."""
    if payload is None:
        return None
    p = bytes(payload)
    if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return _wav_info(p)
    if len(p) >= 4 and p[:4] == b"fLaC":
        return _flac_info(p)
    return None


def _wav_info(p: bytes) -> tuple[str, int, int, int, int] | None:
    channels = rate = bits = None
    data_size = None
    i = 12
    # chunk walk: id(4) size(4 LE) payload(size, padded to even). The data
    # chunk's DECLARED size is the authority for frame count — header-only
    # fixtures and streamed blobs need not carry the samples themselves.
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        size = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            if i + 8 + 16 > len(p) or size < 16:
                return None
            body = p[i + 8 : i + 24]
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data_size = size
        if channels is not None and data_size is not None:
            break
        i += 8 + size + (size % 2)
    if channels in (None, 0) or rate in (None, 0) or bits in (None, 0) or data_size is None:
        return None
    block_align = channels * (bits // 8)
    if block_align == 0:
        return None
    return ("wav", channels, rate, bits, data_size // block_align)


def _flac_info(p: bytes) -> tuple[str, int, int, int, int] | None:
    # fLaC magic, then metadata blocks: 1 byte (last<<7 | type), 3-byte
    # big-endian length. STREAMINFO (type 0) must come first per spec.
    if len(p) < 8 or (p[4] & 0x7F) != 0:
        return None
    length = int.from_bytes(p[5:8], "big")
    if length < 34 or len(p) < 8 + 34:
        return None
    body = p[8 : 8 + 34]
    packed = int.from_bytes(body[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        return None
    return ("flac", channels, rate, bits, total)


AUDIO_SCHEMA = (
    "item_id long, format string, channels int, sample_rate int, "
    "bits_per_sample int, n_frames long"
)


def audio_header_features(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """One Arrow-batched scan -> audio container metadata; NULL columns
    for unrecognized payloads (same contract as image_header_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [audio_header_info(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "format": [t[0] if t else None for t in parsed],
                    "channels": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int32"
                    ),
                    "bits_per_sample": pd.array(
                        [t[3] if t else None for t in parsed], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [t[4] if t else None for t in parsed], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_SCHEMA)


def synth_audio_payload(
    fmt: str, channels: int, rate: int, bits: int, n_frames: int
) -> bytes:
    """Minimal spec-correct container header bytes for fixtures (samples
    omitted; every field a header parser reads is real)."""
    if fmt == "wav":
        data_size = n_frames * channels * (bits // 8)
        fmt_chunk = (
            b"fmt "
            + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * channels * (bits // 8)).to_bytes(4, "little")
            + (channels * (bits // 8)).to_bytes(2, "little")
            + bits.to_bytes(2, "little")
        )
        data_hdr = b"data" + data_size.to_bytes(4, "little")
        riff_size = 4 + len(fmt_chunk) + len(data_hdr) + data_size
        return b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + fmt_chunk + data_hdr
    if fmt == "flac":
        packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | n_frames
        body = (
            (4096).to_bytes(2, "big") * 2
            + (0).to_bytes(3, "big")
            + (0).to_bytes(3, "big")
            + packed.to_bytes(8, "big")
            + b"\x00" * 16  # md5 of the (absent) samples
        )
        return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    raise ValueError(f"unknown audio fixture format {fmt!r}")


# ---------------------------------------------------------------------------
# Video container headers (ISO BMFF / MP4, reference capability "video
# metadata without codecs", sibling of the WAV/FLAC walk above): box
# structure is size(4 BE) + type(4) + payload; movie-level metadata
# lives in moov/mvhd (timescale + duration, version 0 = 32-bit times,
# version 1 = 64-bit) and stream count is the number of trak children.
# Frame ACCESS stays behind the codec seam like pixels and samples.
# ---------------------------------------------------------------------------

def video_header_info(payload: bytes) -> tuple[str, int, int, int] | None:
    """(format, timescale, duration, n_tracks) from an MP4/ISO-BMFF
    header, or None for unrecognized / truncated / malformed payloads
    (NULLs, never exceptions, on a 100 TB scan)."""
    if payload is None:
        return None
    p = bytes(payload)
    if len(p) < 12 or p[4:8] != b"ftyp":
        return None
    moov = _find_box(p, 0, len(p), b"moov")
    if moov is None:
        return None
    lo, hi = moov
    mvhd = _find_box(p, lo, hi, b"mvhd")
    if mvhd is None:
        return None
    b_lo, b_hi = mvhd
    body = p[b_lo:b_hi]
    if len(body) < 4:
        return None
    version = body[0]
    if version == 0:
        if len(body) < 20:
            return None
        timescale = int.from_bytes(body[12:16], "big")
        duration = int.from_bytes(body[16:20], "big")
    elif version == 1:
        if len(body) < 32:
            return None
        timescale = int.from_bytes(body[20:24], "big")
        duration = int.from_bytes(body[24:32], "big")
    else:
        return None
    if timescale == 0:
        return None
    n_tracks = 0
    i = lo
    while i + 8 <= hi:
        size = int.from_bytes(p[i : i + 4], "big")
        if size < 8 or i + size > hi:
            break
        if p[i + 4 : i + 8] == b"trak":
            n_tracks += 1
        i += size
    return ("mp4", timescale, duration, n_tracks)


def _find_box(p: bytes, lo: int, hi: int, name: bytes) -> tuple[int, int] | None:
    """(body_lo, body_hi) of the first ``name`` box in p[lo:hi]."""
    i = lo
    while i + 8 <= hi:
        size = int.from_bytes(p[i : i + 4], "big")
        if size < 8 or i + size > hi:
            return None
        if p[i + 4 : i + 8] == name:
            return (i + 8, i + size)
        i += size
    return None


VIDEO_SCHEMA = "item_id long, format string, timescale int, duration long, n_tracks int"


def video_header_features(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """One Arrow-batched scan -> video container metadata; NULL columns
    for unrecognized payloads (same contract as the image/audio walks)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [video_header_info(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "format": [t[0] if t else None for t in parsed],
                    "timescale": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int32"
                    ),
                    "duration": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int64"
                    ),
                    "n_tracks": pd.array(
                        [t[3] if t else None for t in parsed], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, VIDEO_SCHEMA)


def _box(name: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + name + body


def synth_video_payload(
    timescale: int, duration: int, n_tracks: int, mvhd_version: int = 0
) -> bytes:
    """Minimal spec-correct MP4 header bytes for fixtures — every field
    the box walk reads is real; media data is absent."""
    if mvhd_version == 0:
        mvhd_body = (
            bytes([0, 0, 0, 0])
            + (0).to_bytes(4, "big") * 2
            + timescale.to_bytes(4, "big")
            + duration.to_bytes(4, "big")
            + b"\x00" * 80  # rate/volume/matrix/predefined/next_track_id
        )
    elif mvhd_version == 1:
        mvhd_body = (
            bytes([1, 0, 0, 0])
            + (0).to_bytes(8, "big") * 2
            + timescale.to_bytes(4, "big")
            + duration.to_bytes(8, "big")
            + b"\x00" * 80
        )
    else:
        raise ValueError("mvhd version must be 0 or 1")
    traks = b"".join(
        _box(b"trak", _box(b"tkhd", b"\x00" * 84)) for _ in range(n_tracks)
    )
    moov = _box(b"moov", _box(b"mvhd", mvhd_body) + traks)
    ftyp = _box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    return ftyp + moov
