"""SURVEY §2.10 U3 — the 1→N surface through Spark's native Python UDTF.

The production chunkers run through Arrow-batched ``mapInPandas``
(operators/chunker.py) because per-batch vectorization beats per-row
generator calls at corpus scale; this file proves the engine's chunking
SEMANTICS are also expressible through the first-class UDTF API (lateral
join / TABLE() form), and that the two agree row-for-row — so a user
coming from an engine whose custom operators are table functions has the
same surface here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from data_etl_pipeline_spark.operators.chunker import (
    _chunk_one,
    chunk_by_tokens,
    whitespace_tokens,
)


@udtf(returnType="chunk_no int, chunk_text string, start int, end int")
class ChunkUdtf:
    """The token-aware chunker as a UDTF: the SAME pure per-document
    function (_chunk_one) the mapInPandas path applies per Arrow batch."""

    def eval(self, text: str, soft_limit: int):
        for c in _chunk_one(text or "", soft_limit, 0.0, 100, whitespace_tokens):
            yield c["chunk_no"], c["chunk_text"], c["chunk_start"], c["chunk_end"]


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "one two three\nfour five six\nseven eight"),
        (2, "alpha beta"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_udtf_lateral_matches_mapinpandas_chunker(spark, docs):
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("chunk_udtf", ChunkUdtf)
    got = sorted(
        (r["doc_id"], r["chunk_no"], r["chunk_text"])
        for r in spark.sql(
            """
            SELECT d.doc_id, c.chunk_no, c.chunk_text
            FROM udtf_docs d, LATERAL chunk_udtf(d.text, 5) c
            """
        ).collect()
    )
    want = sorted(
        (r["doc_id"], r["chunk_no"], r["chunk_text"])
        for r in chunk_by_tokens(docs, soft_limit_tokens=5, overlap_ratio=0.0).collect()
    )
    assert got == want and got  # identical 1→N output through both surfaces


def test_udtf_offsets_index_original_text(spark, docs):
    spark.udtf.register("chunk_udtf", ChunkUdtf)
    docs.createOrReplaceTempView("udtf_docs2")
    rows = spark.sql(
        """
        SELECT d.text, c.chunk_text, c.start, c.end
        FROM udtf_docs2 d, LATERAL chunk_udtf(d.text, 5) c
        """
    ).collect()
    assert rows
    for r in rows:
        assert r["text"][r["start"] : r["end"]] == r["chunk_text"]
