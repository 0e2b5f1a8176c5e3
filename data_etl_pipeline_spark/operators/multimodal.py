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
