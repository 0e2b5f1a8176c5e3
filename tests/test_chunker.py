"""Unit tests for the token-aware chunker (SURVEY W1 semantics, modeled on
the reference's test strategy: deterministic token counter, offset-exact
chunk maps — data_etl_app/tests/test_utils/test_chunk_util.py:9-80)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


# --- hard-limit chunker (reference chunk_util.py:318-377 intent) ----------

from data_etl_pipeline_spark.operators.chunker import (  # noqa: E402
    _chunk_one_hard,
    bpe_ish_tokens,
    chunk_by_tokens_hard,
)
import pytest  # noqa: E402


from data_etl_pipeline_spark.operators.bpe import bpe_tokens  # noqa: E402

_COUNTERS = [whitespace_tokens, bpe_ish_tokens, bpe_tokens]


@pytest.mark.parametrize("counter", _COUNTERS)
def test_hard_limit_is_a_ceiling(counter):
    text = make_text(30, words_per_line=5)
    chunks = _chunk_one_hard(text, hard_limit=25, overlap_ratio=0.0, max_chunks=1000, tokens=counter)
    for c in chunks:
        assert c["num_tokens"] <= 25 or text[c["chunk_start"]:c["chunk_end"]].count("\n") == 0


def test_hard_limit_golden_bounds():
    # 3 lines x 4 words ("w0_0 w0_1 w0_2 w0_3" = 19 chars), limit 8 -> 2 lines/chunk,
    # no overlap: chunk1 = lines 0-1 ([0:39]), chunk2 = line 2 ([40:59])
    text = make_text(3, words_per_line=4)
    chunks = _chunk_one_hard(text, hard_limit=8, overlap_ratio=0.0, max_chunks=10, tokens=toks)
    assert [(c["chunk_start"], c["chunk_end"]) for c in chunks] == [(0, 39), (40, 59)]
    assert [c["chunk_no"] for c in chunks] == [1, 2]
    for c in chunks:
        assert text[c["chunk_start"]:c["chunk_end"]] == c["chunk_text"]


def test_hard_limit_overlap_backtracks_lines():
    # limit 10, overlap 0.3 -> required 3 tokens = one 5-word line won't do;
    # carried overlap is whole trailing lines
    text = make_text(8, words_per_line=5)
    chunks = _chunk_one_hard(text, hard_limit=10, overlap_ratio=0.3, max_chunks=100, tokens=toks)
    assert len(chunks) > 1
    for prev, nxt in zip(chunks, chunks[1:]):
        assert nxt["chunk_start"] < prev["chunk_end"]  # overlap carried
        assert nxt["chunk_start"] > prev["chunk_start"]  # forward progress


def test_hard_limit_oversized_single_line_is_singleton_chunk():
    text = "short line\n" + " ".join(f"w{i}" for i in range(50)) + "\nanother short"
    chunks = _chunk_one_hard(text, hard_limit=10, overlap_ratio=0.0, max_chunks=100, tokens=toks)
    over = [c for c in chunks if c["num_tokens"] > 10]
    assert len(over) == 1 and over[0]["num_tokens"] == 50  # emitted alone, offsets exact
    for c in chunks:
        assert text[c["chunk_start"]:c["chunk_end"]] == c["chunk_text"]


def test_hard_limit_rejects_high_overlap_ratio():
    import pandas as pd  # noqa: F401

    with pytest.raises(ValueError):
        _ = chunk_by_tokens_hard.__wrapped__ if hasattr(chunk_by_tokens_hard, "__wrapped__") else None
        # the guard fires at operator construction, before any Spark job
        from data_etl_pipeline_spark.operators import chunker as _c

        _c.chunk_by_tokens_hard(None, overlap_ratio=0.95)


def test_real_bpe_counter_merges_and_caches():
    # ' the' is one token (successive merges to the known GPT-2 symbol),
    # unknown character runs stay one-symbol-per-char
    assert bpe_tokens(" the") == 1
    assert bpe_tokens(" the the the") == 3
    assert bpe_tokens("zqzqzq") == 6
    # merge ranks cascade: lower-rank pair merges first, so the composed
    # symbol keeps merging ('Ġ'+'t' -> 'Ġt', 'Ġt'+'he' -> 'Ġthe')
    assert bpe_tokens(" that") == 1
    # distinct from both existing counters on real prose
    s = "The quick brown fox, internationally known!"
    assert len({whitespace_tokens(s), bpe_ish_tokens(s), bpe_tokens(s)}) == 3
    assert bpe_tokens(s) == bpe_tokens(s)  # deterministic / cached


def test_bpe_corpus_trained_table_is_loaded():
    """The composed default table = embedded GPT-2 head + the
    corpus-trained bpe_merges.txt (scripts/train_bpe_merges.py, run to
    saturation): corpus-frequent words must collapse to far fewer tokens
    than the head alone produces, and head behavior must be unchanged."""
    from data_etl_pipeline_spark.operators.bpe import _MERGES_TXT, _RANKS, load_merges

    head_only = load_merges(_MERGES_TXT.splitlines())
    assert len(_RANKS) > len(head_only)  # trained tail actually appended
    # head ranks keep public precedence: same rank for every head pair
    for pair, rank in head_only.items():
        assert _RANKS[pair] == rank

    def count_with(ranks, pretoken):
        # replay the merge loop under an explicit table
        symbols = ["Ġ", *pretoken[1:]] if pretoken.startswith(" ") else list(pretoken)
        while len(symbols) > 1:
            ranked = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(symbols, symbols[1:]))
                if (a, b) in ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
        return len(symbols)

    # corpus-frequent words saturate under the composed table
    assert count_with(_RANKS, " spark") == 1
    assert count_with(_RANKS, " spark") < count_with(head_only, " spark")
    total_composed = sum(count_with(_RANKS, " " + w) for w in ["spark", "window", "vector", "customer"])
    total_head = sum(count_with(head_only, " " + w) for w in ["spark", "window", "vector", "customer"])
    assert total_composed < total_head


def test_real_bpe_loads_external_merge_table():
    # the seam contract: the table is data, not code — load_merges accepts
    # any merges.txt-format iterable (e.g. the full public GPT-2 file)
    from data_etl_pipeline_spark.operators.bpe import load_merges

    ranks = load_merges(["a b", "ab c"])
    assert ranks == {("a", "b"): 0, ("ab", "c"): 1}


def test_bpe_ish_tokenizer_differs_from_whitespace():
    s = "internationalization, tokenizer-seam!"
    assert whitespace_tokens(s) == 2
    # internationalization = 20 chars -> 5 pieces; comma 1; tokenizer 9->3? ("toke","nize","r")
    # -seam! -> '-',1 + 'seam',1 + '!',1 ; total > 2
    assert bpe_ish_tokens(s) > whitespace_tokens(s)
    assert bpe_ish_tokens(s) == bpe_ish_tokens(s)  # deterministic


@pytest.mark.parametrize("counter", _COUNTERS)
def test_soft_chunker_seam_accepts_both_counters(counter):
    text = make_text(12, words_per_line=6)
    chunks = _chunk_one(text, soft_limit=20, overlap_ratio=0.1, max_chunks=100, tokens=counter)
    assert chunks
    for c in chunks:
        assert text[c["chunk_start"]:c["chunk_end"]] == c["chunk_text"]
        assert c["num_tokens"] == counter(c["chunk_text"])


def test_spark_hard_chunker_matches_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    rows = chunk_by_tokens_hard(docs, hard_limit_tokens=30, token_counter=bpe_ish_tokens).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert texts[r["doc_id"]][r["chunk_start"]:r["chunk_end"]] == r["chunk_text"]
    for doc_id, chunks in by_doc.items():
        expected = _chunk_one_hard(texts[doc_id], 30, 0.15, 100_000, bpe_ish_tokens)
        got = sorted(
            [(c["chunk_no"], c["chunk_start"], c["chunk_end"]) for c in chunks]
        )
        want = sorted([(c["chunk_no"], c["chunk_start"], c["chunk_end"]) for c in expected])
        assert got == want


class TestSequencePacking:
    def test_greedy_first_fit_bins(self, spark):
        from data_etl_pipeline_spark.operators.packing import pack_sequences

        rows = [
            # (doc_id, text) in one source; capacity 10 tokens (stripped)
            (1, "a " * 4),   # 4 tokens -> bin 0 (fill 4)
            (2, "b " * 3),   # 3 tokens -> bin 0 (fill 7)
            (3, "c " * 7),   # 7 tokens -> 7+7 > 10 -> bin 1
            (4, "d " * 20),  # 20 tokens > capacity -> alone in bin 2
            (5, "e"),        # 1 token -> bin 3 (doc 4 overflowed its bin)
        ]
        df = spark.createDataFrame(
            [(i, t.strip()) for i, t in rows], "doc_id long, text string"
        ).withColumn("source", F.lit("s"))
        out = {
            r["doc_id"]: r["bin"]
            for r in pack_sequences(df, capacity=10, n_shards=1).collect()
        }
        assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}

    def test_bins_never_mix_sources(self, spark):
        from data_etl_pipeline_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(i, "w " * 5, f"s{i % 3}") for i in range(30)],
            "doc_id long, text string, source string",
        )
        out = pack_sequences(df, capacity=12).collect()
        assert len(out) == 30
        owners: dict[tuple, set] = {}
        for r in out:
            owners.setdefault((r["source"], r["bin"]), set()).add(r["source"])
        assert all(len(s) == 1 for s in owners.values())

    def test_sharded_packing_matches_per_shard_first_fit(self, spark):
        """Sharded packing == unsharded first-fit applied to each shard's
        doc subset, with bin ids mapped as local_bin * n_shards + shard."""
        from data_etl_pipeline_spark.operators.packing import pack_sequences

        docs = [(i, "t " * ((i * 7) % 23 + 1), "s") for i in range(100)]
        df = spark.createDataFrame(
            [(i, t.strip(), s) for i, t, s in docs],
            "doc_id long, text string, source string",
        )
        sharded = {r["doc_id"]: r["bin"] for r in pack_sequences(df, capacity=40, n_shards=4).collect()}
        for shard in range(4):
            sub = df.where(F.col("doc_id") % 4 == shard)
            plain = {
                r["doc_id"]: r["bin"]
                for r in pack_sequences(sub, capacity=40, n_shards=1).collect()
            }
            for doc_id, local_bin in plain.items():
                assert sharded[doc_id] == local_bin * 4 + shard

    def test_single_source_corpus_packs_in_parallel_groups(self, spark):
        """De-skew guarantee: one giant source still fans out into n_shards
        independent packing groups (the applyInPandas group key), so a
        source holding most of a corpus cannot serialize onto one task."""
        from data_etl_pipeline_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(i, "w " * 9, "only_source") for i in range(64)],
            "doc_id long, text string, source string",
        )
        out = pack_sequences(df, capacity=20, n_shards=8)
        # shard = doc_id % 8 -> 8 distinct (source, shard) groups; visible in
        # the output as 8 disjoint bin-id residue classes mod 8
        residues = {r["bin"] % 8 for r in out.collect()}
        assert residues == set(range(8))
        # capacity is respected within every bin (no doc here exceeds it)
        per_bin = (
            out.groupBy("bin").agg(F.sum("n_tokens").alias("tot")).collect()
        )
        assert all(r["tot"] <= 20 for r in per_bin)


class TestIncrementalPacking:
    """pack_sequences_incremental: prefix-stability against the one-shot
    pack under adversarial shapes — forced continuations, oversize docs,
    streams born in the second batch."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_incremental_equals_full_repack(self, spark):
        from data_etl_pipeline_spark.operators.packing import (
            pack_sequences,
            pack_sequences_incremental,
            packing_state,
        )

        words = lambda n: " ".join(["w"] * n)  # noqa: E731
        rows = (
            # source a: partial bin at the split (3+4=7 of 10, then 2 fits)
            [(1, "a", words(3)), (2, "a", words(4)), (11, "a", words(2)),
             (12, "a", words(9))]
            # source b: oversize doc alone in a bin, both sides of the split
            + [(3, "b", words(25)), (13, "b", words(1)), (14, "b", words(25))]
            # source c: exists ONLY in the new batch (no state row)
            + [(15, "c", words(6)), (16, "c", words(6))]
        )
        full = self._docs(spark, rows)
        batch1 = full.where("doc_id < 10")
        batch2 = full.where("doc_id >= 10")
        p1 = pack_sequences(batch1, capacity=10, n_shards=1)
        st = packing_state(p1, n_shards=1)
        p2 = pack_sequences_incremental(batch2, st, capacity=10, n_shards=1)
        got = {
            (r.source, r.doc_id): (r.n_tokens, r.bin)
            for r in p1.unionByName(p2).collect()
        }
        want = {
            (r.source, r.doc_id): (r.n_tokens, r.bin)
            for r in pack_sequences(full, capacity=10, n_shards=1).collect()
        }
        assert got == want
        # the continuation actually happened: doc 11 topped up doc 1+2's bin
        assert got[("a", 11)][1] == got[("a", 1)][1]
        # and the state frame is O(streams): one row per (source, shard)
        assert st.count() == 2  # sources a, b in batch1

    def test_incremental_sharded_matches_full(self, spark, sf_dir):
        from data_etl_pipeline_spark.operators.packing import (
            pack_sequences,
            pack_sequences_incremental,
            packing_state,
        )
        from data_etl_pipeline_spark.tables import load

        docs = load(spark, sf_dir, "documents")
        p1 = pack_sequences(docs.where("doc_id < 25"), capacity=64, n_shards=8)
        st = packing_state(p1, n_shards=8)
        p2 = pack_sequences_incremental(
            docs.where("doc_id >= 25"), st, capacity=64, n_shards=8
        )
        got = sorted(map(tuple, p1.unionByName(p2).collect()))
        want = sorted(map(tuple, pack_sequences(docs, capacity=64, n_shards=8).collect()))
        assert got == want
