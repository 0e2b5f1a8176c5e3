"""Corpus-wide BPE encode (operators/bpe.py encode surface +
operators/bpe_encode.py distributed pass): losslessness, id determinism,
count/encode agreement, and the distributed output matching the offline
tokenizer row for row."""

from __future__ import annotations

import pytest

from data_etl_pipeline_spark.operators import bpe


CASES = [
    "the fast key order sort table scan",
    "hello   world",  # multi-space runs survive byte-exactly
    "don't stop, it's 2024!",
    " leading space",
    "trailing space ",
    "tabs\tand\nnewlines",
    "",
    "x",
]


@pytest.mark.parametrize("s", CASES)
def test_encode_decode_roundtrip_byte_exact(s):
    assert bpe.bpe_decode(bpe.bpe_encode(s)) == s


@pytest.mark.parametrize("s", CASES)
def test_count_agrees_with_encode(s):
    assert bpe.bpe_tokens(s) == len(bpe.bpe_encode(s))


def test_merges_actually_fire():
    toks = bpe.bpe_encode("the theory of the thing")
    # 'Ġthe' is a rank-6 merge in the embedded table: whole-word token
    assert "Ġthe" in toks
    assert len(toks) < len("the theory of the thing")


def test_token_ids_deterministic_and_disjoint():
    toks = bpe.bpe_encode("the fast key order sort")
    ids = [bpe.token_id(t) for t in toks]
    assert ids == [bpe.token_id(t) for t in toks]  # stable
    for t, i in zip(toks, ids):
        if len(t) == 1:
            assert i == ord(t) < 0x110000
        else:
            assert i >= 0x110000  # merged range never collides with chars


def test_fallback_id_stable_without_hash():
    a = bpe.token_id("zzqx")  # not in any merge vocab
    assert a == bpe.token_id("zzqx") and a >= 0x220000_0000


def test_distributed_encode_matches_offline(spark, sf_dir):
    from data_etl_pipeline_spark.operators.bpe_encode import encode_documents
    from data_etl_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(20)
    got = {r["doc_id"]: r for r in encode_documents(docs).collect()}
    for row in docs.collect():
        toks = bpe.bpe_encode(row["text"])
        g = got[row["doc_id"]]
        assert g["ids"] == [bpe.token_id(t) for t in toks]
        assert g["n_tokens"] == len(toks)
        assert g["reassembled"] == row["text"]  # byte-exact losslessness
        assert g["n_tokens"] < len(row["text"])  # merges fired
