"""Unit tests for the token-aware chunker (SURVEY W1 semantics, modeled on
the reference's test strategy: deterministic token counter, offset-exact
chunk maps — data_etl_app/tests/test_utils/test_chunk_util.py:9-80)."""

from __future__ import annotations

from data_etl_pipeline_spark.operators.chunker import _chunk_one, chunk_by_tokens, whitespace_tokens


def toks(s: str) -> int:
    return whitespace_tokens(s)


def make_text(n_lines: int, words_per_line: int = 5) -> str:
    return "\n".join(" ".join(f"w{i}_{j}" for j in range(words_per_line)) for i in range(n_lines))


def test_offsets_are_exact_substrings():
    text = make_text(20)
    for c in _chunk_one(text, soft_limit=25, overlap_ratio=0.0, max_chunks=100, tokens=toks):
        assert text[c["chunk_start"]:c["chunk_end"]] == c["chunk_text"]
        assert c["chunk_bounds"] == f"{c['chunk_start']}:{c['chunk_end']}"


def test_soft_limit_respected_without_overlap():
    text = make_text(20, words_per_line=5)
    chunks = _chunk_one(text, soft_limit=25, overlap_ratio=0.0, max_chunks=100, tokens=toks)
    assert len(chunks) == 4  # 100 words / 25-per-chunk
    for c in chunks:
        assert c["num_tokens"] <= 25


def test_overlap_carries_trailing_tokens():
    text = make_text(20, words_per_line=5)
    chunks = _chunk_one(text, soft_limit=25, overlap_ratio=0.2, max_chunks=100, tokens=toks)
    for prev, nxt in zip(chunks, chunks[1:]):
        assert nxt["chunk_start"] < prev["chunk_end"]  # overlapping bounds


def test_max_chunks_early_stop():
    text = make_text(100)
    chunks = _chunk_one(text, soft_limit=10, overlap_ratio=0.0, max_chunks=3, tokens=toks)
    assert len(chunks) == 3


def test_chunk_numbering_is_sequential():
    text = make_text(30)
    chunks = _chunk_one(text, soft_limit=20, overlap_ratio=0.1, max_chunks=100, tokens=toks)
    assert [c["chunk_no"] for c in chunks] == list(range(1, len(chunks) + 1))


def test_single_line_text_falls_back_to_words():
    text = " ".join(f"w{i}" for i in range(50))
    chunks = _chunk_one(text, soft_limit=10, overlap_ratio=0.0, max_chunks=100, tokens=toks)
    assert len(chunks) == 5
    for c in chunks:
        assert text[c["chunk_start"]:c["chunk_end"]] == c["chunk_text"]


def test_spark_chunker_matches_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    rows = chunk_by_tokens(docs, soft_limit_tokens=40).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert texts[r["doc_id"]][r["chunk_start"]:r["chunk_end"]] == r["chunk_text"]
    for doc_id, chunks in by_doc.items():
        expected = _chunk_one(texts[doc_id], 40, 0.15, 100, whitespace_tokens)
        got = sorted(chunks, key=lambda r: r["chunk_no"])
        assert [(c["chunk_bounds"]) for c in expected] == [r["chunk_bounds"] for r in got]
