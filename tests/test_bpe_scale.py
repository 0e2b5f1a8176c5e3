"""The BPE seam at full-GPT-2 table scale.

The genuine 50k GPT-2 ``merges.txt`` is a released data artifact this
environment cannot fetch (no network — verified; tiktoken absent), so the
corpus-trained table stays the shipped default. These tests prove the
SEAM handles a table of the real artifact's SIZE and SHAPE: 50,000 merges
generated as a deterministic cascade (every merge joins two previously
existing symbols, exactly how the real table is structured), installed
through ``set_merges`` — the same one-call data swap loading the genuine
file would be.
"""

from __future__ import annotations

import time

import pytest

from data_etl_pipeline_spark.operators import bpe


def _cascade_table(n: int) -> dict[tuple[str, str], int]:
    """Deterministic 50k-scale merge table with realistic cascade
    structure: start from single characters, each new merge joins two
    existing symbols chosen by a hash of the rank — so later merges build
    on earlier ones, like the real GPT-2 list."""
    import hashlib

    symbols = [chr(c) for c in range(ord("a"), ord("z") + 1)] + ["Ġ"]
    ranks: dict[tuple[str, str], int] = {}
    i = 0
    while len(ranks) < n:
        h = hashlib.md5(f"bpe-scale-{i}".encode()).digest()
        a = symbols[int.from_bytes(h[0:4], "big") % len(symbols)]
        b = symbols[int.from_bytes(h[4:8], "big") % len(symbols)]
        i += 1
        if len(a) + len(b) > 12:  # keep symbols short like real subwords
            continue
        if (a, b) in ranks:
            continue
        ranks[(a, b)] = len(ranks)
        symbols.append(a + b)
    return ranks


@pytest.fixture(scope="module")
def big_table():
    # module scope: the 50k cascade build costs ~15 s of pure-Python md5;
    # both consumers only read the table (their own set_merges calls
    # save/restore module state themselves)
    original = dict(bpe._RANKS)
    table = _cascade_table(50_000)
    bpe.set_merges(table)
    yield table
    bpe.set_merges(original)


class TestBpeFullScaleTable:
    def test_counts_under_50k_table_are_sane_and_fast(self, big_table):
        texts = [
            ("the quick brown fox jumps over the lazy dog " * 20).strip()
        ] * 50 + [f"document number {i} with some varied content here" for i in range(200)]
        t0 = time.time()
        counts = [bpe.bpe_tokens(t) for t in texts]
        wall = time.time() - t0
        assert all(c > 0 for c in counts)
        # merges can only reduce the symbol count vs characters
        for t, c in zip(texts, counts):
            assert c <= len(t)
        # 250 docs under a 50k table must stay interactive — the chunker
        # runs this inside Arrow batches, so per-doc cost is the budget
        assert wall < 10.0, f"50k-table counting too slow: {wall:.1f}s"

    def test_rank_precedence_cascades(self):
        # lower rank merges first: with ranks {(a,b):0, (ab,c):1} the word
        # "abc" becomes one symbol; flipping the ranks leaves two
        original = dict(bpe._RANKS)
        try:
            bpe.set_merges({("a", "b"): 0, ("ab", "c"): 1})
            assert bpe.bpe_tokens("abc") == 1
            bpe.set_merges({("b", "c"): 0, ("a", "b"): 1})
            # "abc": (b,c) merges first -> ["a","bc"], (a,b) no longer
            # adjacent as raw symbols -> 2 tokens
            assert bpe.bpe_tokens("abc") == 2
        finally:
            bpe.set_merges(original)

    def test_set_merges_clears_memoized_counts(self):
        original = dict(bpe._RANKS)
        try:
            bpe.set_merges({("a", "b"): 0})
            first = bpe.bpe_tokens("ababab")
            bpe.set_merges({("a", "b"): 0, ("ab", "ab"): 1, ("abab", "ab"): 2})
            second = bpe.bpe_tokens("ababab")
            assert first == 3 and second == 1  # stale cache would repeat 3
        finally:
            bpe.set_merges(original)

    def test_loading_merges_txt_format_at_scale(self, tmp_path, big_table):
        # the genuine-artifact path: a 50k-line merges.txt on disk loads
        # through load_merges(lines) with ranks = line positions
        p = tmp_path / "merges.txt"
        ordered = sorted(big_table.items(), key=lambda kv: kv[1])
        p.write_text(
            "#version: 0.2\n" + "\n".join(f"{a} {b}" for (a, b), _ in ordered)
        )
        loaded = bpe.load_merges(p.read_text().splitlines())
        assert loaded == big_table
