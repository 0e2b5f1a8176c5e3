"""Property-based tests (hypothesis) over the pure operator cores.

The reference's suite is example-based only (SURVEY §5); these pin the
invariants the engine's join keys and sinks depend on: chunk offsets must
slice the original text exactly, byte splitting must be loss-free and
line-exact, JSON repair must fix the LLM breakage classes without
corrupting valid payloads, and the as-of kernel must match a brute-force
reference on arbitrary inputs.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from data_etl_pipeline_spark.functions.json_repair import (
    parse_json_array,
    strip_markdown_fences,
)
from data_etl_pipeline_spark.operators.chunker import _chunk_one, whitespace_tokens
from data_etl_pipeline_spark.sources.jsonl import split_bytes_on_lines

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=2000
)


class TestChunkerProperties:
    @given(text=texts, soft=st.integers(1, 50), overlap=st.floats(0.0, 0.5))
    @settings(max_examples=200, deadline=None)
    def test_offsets_slice_the_text_exactly(self, text, soft, overlap):
        for c in _chunk_one(text, soft, overlap, max_chunks=100, tokens=whitespace_tokens):
            assert text[c["chunk_start"] : c["chunk_end"]] == c["chunk_text"]
            assert c["chunk_bounds"] == f"{c['chunk_start']}:{c['chunk_end']}"

    @given(text=texts, soft=st.integers(1, 50))
    @settings(max_examples=200, deadline=None)
    def test_no_overlap_means_monotone_coverage(self, text, soft):
        chunks = _chunk_one(text, soft, 0.0, max_chunks=10_000, tokens=whitespace_tokens)
        # without overlap, chunk spans are strictly ordered and disjoint
        for a, b in zip(chunks, chunks[1:]):
            assert a["chunk_end"] <= b["chunk_start"]
            assert a["chunk_no"] + 1 == b["chunk_no"]
        # every non-blank character of the text is covered by some chunk
        covered = set()
        for c in chunks:
            covered.update(range(c["chunk_start"], c["chunk_end"]))
        for i, ch in enumerate(text):
            if not ch.isspace():
                assert i in covered

    @given(text=texts, soft=st.integers(1, 30), overlap=st.floats(0.0, 0.5), mx=st.integers(1, 5))
    @settings(max_examples=100, deadline=None)
    def test_max_chunks_cap_holds(self, text, soft, overlap, mx):
        assert len(_chunk_one(text, soft, overlap, max_chunks=mx, tokens=whitespace_tokens)) <= mx


class TestByteSplitterProperties:
    lines = st.lists(st.binary(min_size=0, max_size=40).filter(lambda b: b"\n" not in b), min_size=0, max_size=40)

    @given(lines=lines, max_chunk=st.integers(8, 200))
    @settings(max_examples=200, deadline=None)
    def test_lossless_and_line_exact(self, lines, max_chunk):
        data = b"\n".join(lines)
        parts = split_bytes_on_lines(data, max_chunk)
        assert b"".join(parts) == data  # loss-free
        for p in parts[:-1]:
            # every split point lands on a line boundary
            assert p.endswith(b"\n") or len(p) >= max_chunk
        # chunks only exceed max_chunk when a single line does
        max_line = max((len(line) for line in lines), default=0)
        for p in parts:
            assert len(p) <= max(max_chunk, max_line + 1)


class TestJsonRepairProperties:
    payloads = st.lists(
        st.text(alphabet=st.characters(blacklist_characters='"\\', blacklist_categories=("Cs",)), max_size=20),
        max_size=8,
    )

    @given(items=payloads)
    @settings(max_examples=200, deadline=None)
    def test_valid_arrays_round_trip(self, items):
        assert parse_json_array(json.dumps(items)) == items

    @given(items=payloads)
    @settings(max_examples=200, deadline=None)
    def test_fenced_arrays_round_trip(self, items):
        fenced = "```json\n" + json.dumps(items) + "\n```"
        assert parse_json_array(fenced) == items

    @given(inner=st.text(alphabet=st.sampled_from("ab c"), max_size=10))
    @settings(max_examples=100, deadline=None)
    def test_unescaped_inner_quotes_repaired(self, inner):
        broken = f'["a "{inner}" phrase", "plain"]'
        out = parse_json_array(broken)
        assert out is not None and len(out) == 2 and out[1] == "plain"

    @given(s=st.text(max_size=50))
    @settings(max_examples=200, deadline=None)
    def test_strip_fences_never_raises_and_is_idempotent(self, s):
        once = strip_markdown_fences(s)
        assert strip_markdown_fences(once) == once or once.startswith("```")


def _brute_asof(left, right):
    out = {}
    for k, t, eid in left:
        best = None
        for rk, rt, rid in right:
            if rk == k and rt <= t and (best is None or (rt, rid) > best):
                best = (rt, rid)
        out[eid] = None if best is None else best[1]
    return out


class TestAsofKernelProperty:
    @given(
        left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 10**6)), max_size=12, unique_by=lambda x: x[2]),
        right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 10**6)), max_size=12, unique_by=lambda x: x[2]),
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_bruteforce(self, spark, left, right):
        from datetime import datetime, timedelta

        from data_etl_pipeline_spark.operators.asof import asof_join

        base = datetime(2024, 1, 1)
        ldf = spark.createDataFrame(
            [(k, base + timedelta(hours=t), i) for k, t, i in left] or [(0, base, -1)],
            "k long, ts timestamp, eid long",
        )
        rdf = spark.createDataFrame(
            [(k, base + timedelta(hours=t), i) for k, t, i in right] or [(99, base, -1)],
            "k long, rts timestamp, rid long",
        )
        got = {
            r["eid"]: r["rid"]
            for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts", payload_cols=["rid"], tiebreak="rid").collect()
        }
        expect = _brute_asof(
            [(k, t, i) for k, t, i in left] or [(0, 0, -1)],
            [(k, t, i) for k, t, i in right] or [(99, 0, -1)],
        )
        assert got == expect


class TestAhoCorasick:
    def test_finds_overlapping_and_nested_patterns(self):
        from data_etl_pipeline_spark.operators.vocab import AhoCorasick

        pats = ["he", "she", "his", "hers"]
        ac = AhoCorasick(pats).attach_patterns(pats)
        hits = {(s, e, pats[i]) for s, e, i in ac.find("ushers")}
        assert hits == {(1, 4, "she"), (2, 4, "he"), (2, 6, "hers")}

    def test_matches_regex_alternation_on_random_text(self):
        import re

        from hypothesis import given, settings, strategies as st
        from data_etl_pipeline_spark.operators.vocab import AhoCorasick

        pats = ["ab", "abc", "bc", "ca", "aaa"]

        @given(text=st.text(alphabet="abc ", max_size=60))
        @settings(max_examples=300, deadline=None)
        def check(text):
            ac = AhoCorasick(pats).attach_patterns(pats)
            got = {(s, e, i) for s, e, i in ac.find(text)}
            want = set()
            for i, p in enumerate(pats):
                for m in re.finditer(f"(?={re.escape(p)})", text):
                    want.add((m.start(), m.start() + len(p), i))
            assert got == want

        check()

    def test_word_boundary_filter(self, spark):
        from data_etl_pipeline_spark.operators.vocab import ac_multi_match

        docs = spark.createDataFrame(
            [(1, "a hash join here"), (2, "rehash joints"), (3, "hash join")],
            "doc_id long, text string",
        )
        out = {(r["doc_id"], r["concept"]) for r in ac_multi_match(docs, [("join", "hash join")]).collect()}
        # doc 2's "rehash joints" contains the substring but not on word
        # boundaries; docs 1 and 3 match (start/end-of-string count)
        assert out == {(1, "join"), (3, "join")}


class TestHardChunkerProperties:
    @given(text=texts, hard=st.integers(1, 50), overlap=st.floats(0.0, 0.5))
    @settings(max_examples=200, deadline=None)
    def test_offsets_slice_the_text_exactly(self, text, hard, overlap):
        from data_etl_pipeline_spark.operators.chunker import _chunk_one_hard

        for c in _chunk_one_hard(text, hard, overlap, max_chunks=100, tokens=whitespace_tokens):
            assert text[c["chunk_start"] : c["chunk_end"]] == c["chunk_text"]

    @given(text=texts, hard=st.integers(2, 50))
    @settings(max_examples=200, deadline=None)
    def test_cap_is_hard_except_singleton_segments(self, text, hard):
        from data_etl_pipeline_spark.operators.chunker import _chunk_one_hard, _segments

        chunks = _chunk_one_hard(text, hard, 0.0, max_chunks=10_000, tokens=whitespace_tokens)
        seg_bounds = {(s, e) for s, e, _ in _segments(text)}
        for c in chunks:
            # over-cap chunks are only ever a single oversized segment
            assert c["num_tokens"] <= hard or (c["chunk_start"], c["chunk_end"]) in seg_bounds

    @given(text=texts, hard=st.integers(1, 30), overlap=st.floats(0.0, 0.5))
    @settings(max_examples=100, deadline=None)
    def test_forward_progress_and_ordering(self, text, hard, overlap):
        from data_etl_pipeline_spark.operators.chunker import _chunk_one_hard

        chunks = _chunk_one_hard(text, hard, overlap, max_chunks=10_000, tokens=whitespace_tokens)
        for a, b in zip(chunks, chunks[1:]):
            assert b["chunk_start"] > a["chunk_start"]  # strict progress
            assert b["chunk_no"] == a["chunk_no"] + 1


class TestPslProperties:
    label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
        lambda s: not s.startswith("-") and not s.endswith("-")
    )

    @given(labels=st.lists(label, min_size=1, max_size=5))
    @settings(max_examples=300, deadline=None)
    def test_etld1_is_suffix_and_respects_public_suffix(self, labels):
        from data_etl_pipeline_spark.functions.psl import etld1, public_suffix_len

        host = ".".join(labels)
        d = etld1(host)
        ps = public_suffix_len(host)
        if len(labels) <= ps:
            assert d is None  # the host IS a public suffix (or bare TLD)
        else:
            assert d is not None and host.endswith(d)
            assert d.count(".") == ps  # exactly public suffix + 1 label

    def test_spark_expression_matches_python_on_fuzz_hosts(self, spark):
        # deterministic fuzz corpus spanning exact/wildcard/exception/private
        # rules plus unlisted TLDs, evaluated through the codegen fold
        from data_etl_pipeline_spark.functions import psl

        suffixes = ["com", "co.uk", "co.nz", "github.io", "ck", "www.ck", "k12.va.us", "xyz", "fk"]
        hosts = []
        for i in range(200):
            depth = i % 4
            name = f"h{i}"
            prefix = ".".join(f"l{j}" for j in range(depth))
            host = ".".join(x for x in (prefix, name, suffixes[i % len(suffixes)]) if x)
            hosts.append(host)
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = dict(psl.with_etld1(df, "host").collect())
        for h in hosts:
            assert got[h] == psl.etld1(h), h


class TestBpeProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_count_bounds_and_determinism(self, s):
        from data_etl_pipeline_spark.operators.bpe import _PRETOKEN, bpe_tokens

        n = bpe_tokens(s)
        pretokens = [m.group(0) for m in _PRETOKEN.finditer(s)]
        # merges only ever shrink: count is between #pretokens and #chars
        assert len(pretokens) <= n or not pretokens
        assert n <= len(s) or s == ""
        assert n == bpe_tokens(s)  # deterministic / cache-consistent
        assert (n == 0) == (len(pretokens) == 0)

    @given(st.lists(st.sampled_from(["the", "and", "that", "info", "x1", "!"]), max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_concatenation_subadditivity(self, words):
        # BPE counts are per-pretoken, so joining with spaces costs exactly
        # the sum of each ' word' pretoken's cost
        from data_etl_pipeline_spark.operators.bpe import bpe_tokens

        s = "".join(" " + w for w in words)
        assert bpe_tokens(s) == sum(bpe_tokens(" " + w) for w in words)


class TestByteSplitterProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
        st.integers(min_value=16, max_value=256),
    )
    @settings(max_examples=200, deadline=None)
    def test_split_reassembles_and_respects_cap(self, ids, max_chunk):
        from data_etl_pipeline_spark.sources.jsonl import split_bytes_on_lines

        data = "".join(f"{i}\n" for i in ids).encode()
        chunks = split_bytes_on_lines(data, max_chunk=max_chunk)
        assert b"".join(chunks) == data  # byte-exact reassembly
        for ch in chunks:
            # a chunk over the cap is only legal when it cannot be cut at a
            # newline: i.e. it contains a single over-long line
            assert len(ch) <= max_chunk or ch.rstrip(b"\n").count(b"\n") == 0
            assert ch.endswith(b"\n")  # trailing-newline corpus -> line-exact cuts
