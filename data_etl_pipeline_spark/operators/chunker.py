"""Text chunking operators (SURVEY W1, reference chunk_util.py:136-233).

Two variants:

  chunk_even_chars      - fixed-size char chunks with overlap, expressed as
                          pure DataFrame ops (sequence + transform +
                          posexplode). Fully oracle-checkable in SQL.
  chunk_by_tokens       - the reference's token-aware, line-boundary,
                          overlapping chunker as a vectorized mapInPandas
                          operator with a pluggable token counter
                          (FIXTURES.md B7 stub: whitespace words).

Chunk bounds are char offsets into the source text and the emitted
``chunk_bounds`` string "{start}:{end}" is the join key used downstream —
exactly the reference's offset-keyed chunk map semantics.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SCHEMA = (
    "doc_id long, chunk_no int, chunk_start int, chunk_end int, "
    "chunk_bounds string, chunk_text string, num_tokens int"
)


def chunk_even_chars(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Overlapping fixed-char-size chunks; stride = size - overlap.

    One row in, ceil((len-overlap)/stride) rows out — UDTF-shaped explode
    that stays in codegen (no Python). Offsets are 0-based, end exclusive.
    """
    if overlap >= size:
        raise ValueError(
            f"overlap={overlap} must be < size={size}: stride 0 divides by "
            "zero mid-job and a negative stride silently truncates every "
            "document to its first chunk"
        )
    stride = size - overlap
    n = f"greatest(1, cast(ceil((length({text_col}) - {overlap}) / {stride}.0) as int))"
    chunks = (
        f"transform(sequence(0, {n} - 1), i -> named_struct("
        f"'chunk_no', cast(i + 1 as int), "
        f"'chunk_start', cast(i * {stride} as int), "
        f"'chunk_end', cast(least(i * {stride} + {size}, length({text_col})) as int), "
        f"'chunk_text', substr({text_col}, i * {stride} + 1, {size})))"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.expr(chunks)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_no").alias("chunk_no"),
            F.col("c.chunk_start").alias("chunk_start"),
            F.col("c.chunk_end").alias("chunk_end"),
            F.concat_ws(":", F.col("c.chunk_start"), F.col("c.chunk_end")).alias("chunk_bounds"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


def whitespace_tokens(s: str) -> int:
    """Deterministic tokenizer stub (FIXTURES.md B7): whitespace words."""
    return len(s.split())


_BPE_PIECE = None  # compiled lazily so importing this module stays cheap


def bpe_ish_tokens(s: str) -> int:
    """Deterministic BPE-approximating counter — the second tokenizer through
    the pluggable seam (reference counts with tiktoken,
    open_ai_key_app/src/open_ai_key_app/utils/token_util.py:6-8; real BPE is
    a data dependency, not a code change).

    Rules approximating byte-pair behavior: every run of <=4 alphanumerics is
    one token, longer runs cost ceil(len/4), and every non-space symbol is
    its own token. Distinct from whitespace_tokens on punctuation and long
    words, which is what makes seam tests meaningful.
    """
    global _BPE_PIECE
    if _BPE_PIECE is None:
        import re

        _BPE_PIECE = re.compile(r"[A-Za-z0-9]{1,4}|[^\sA-Za-z0-9]")
    return sum(1 for _ in _BPE_PIECE.finditer(s))


def _run_chunker(df: DataFrame, id_col: str, text_col: str, chunk_fn) -> DataFrame:
    """Shared mapInPandas driver for the soft and hard chunkers: one Arrow
    batch in, chunk rows out.  NULL texts are skipped — ``str(None)`` would
    otherwise fabricate a literal 'None' training chunk."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                for rec in chunk_fn(str(text)):
                    rec["doc_id"] = doc_id
                    out.append(rec)
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "chunk_no",
                    "chunk_start",
                    "chunk_end",
                    "chunk_bounds",
                    "chunk_text",
                    "num_tokens",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(run, CHUNK_SCHEMA)


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    soft_limit_tokens: int = 40,
    overlap_ratio: float = 0.15,
    max_chunks: int = 100,
    token_counter: Callable[[str], int] = whitespace_tokens,
) -> DataFrame:
    """Token-aware overlapping chunker (reference chunk_util.py:136-233).

    Splits on line boundaries (falling back to word boundaries for single-
    line texts), accumulating lines until the soft token limit, then carries
    ``overlap_ratio`` of trailing tokens into the next chunk. Emits
    offset-keyed chunks; offsets index the original text so
    ``text[start:end] == chunk_text`` byte-for-byte.

    Runs as mapInPandas: per-document imperative offset bookkeeping is the
    genuinely non-relational part (SURVEY §7.3 "hard parts" #1); everything
    up/downstream stays declarative. Arrow-batched, no per-row Python UDF.
    """

    if not 0.0 <= overlap_ratio < 0.9:
        raise ValueError(
            f"overlap_ratio={overlap_ratio} must be in [0, 0.9): at >= 1.0 the "
            "chunk start never advances and output grows O(max_chunks * doc)"
        )
    return _run_chunker(
        df, id_col, text_col,
        lambda text: _chunk_one(text, soft_limit_tokens, overlap_ratio, max_chunks, token_counter),
    )


def _chunk_one(
    text: str,
    soft_limit: int,
    overlap_ratio: float,
    max_chunks: int,
    tokens: Callable[[str], int],
) -> list[dict]:
    """Chunk one document; pure function so it unit-tests without Spark."""
    # line segmentation with exact offsets; single-line texts fall back to
    # whitespace-word segments so the soft limit still applies.
    segs = _segments(text)
    chunks: list[dict] = []
    cur_start = None
    cur_end = None
    cur_tokens = 0
    i = 0
    while i < len(segs) and len(chunks) < max_chunks:
        s_start, s_end, s_text = segs[i]
        s_tok = tokens(s_text)
        if cur_start is None:
            cur_start, cur_end, cur_tokens = s_start, s_end, s_tok
        elif cur_tokens + s_tok <= soft_limit or cur_tokens == 0:
            cur_end, cur_tokens = s_end, cur_tokens + s_tok
        else:
            chunks.append(_emit(text, cur_start, cur_end, len(chunks) + 1, tokens))
            # carry overlap: back up whole segments until overlap tokens covered
            overlap_tokens = int(cur_tokens * overlap_ratio)
            j = i - 1
            carried = 0
            back_start = s_start
            while j >= 0 and carried < overlap_tokens and segs[j][0] >= cur_start:
                carried += tokens(segs[j][2])
                back_start = segs[j][0]
                j -= 1
            cur_start, cur_end, cur_tokens = back_start, s_end, tokens(text[back_start:s_end])
        i += 1
    if cur_start is not None and len(chunks) < max_chunks:
        chunks.append(_emit(text, cur_start, cur_end, len(chunks) + 1, tokens))
    return chunks


def chunk_by_tokens_hard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hard_limit_tokens: int = 60,
    overlap_ratio: float = 0.15,
    max_chunks: int = 100_000,
    token_counter: Callable[[str], int] = whitespace_tokens,
) -> DataFrame:
    """Hard-limit line-boundary chunker (reference chunk_util.py:318-377,
    get_chunks_respecting_line_boundaries_with_hard_limit).

    Unlike the soft chunker, the token cap is a CEILING: a line is never
    added to a chunk it would push over ``hard_limit_tokens``; instead the
    chunk is emitted and the next chunk backtracks over trailing lines
    until ``hard_limit_tokens * overlap_ratio`` overlap tokens are carried.
    Divergences from the reference, both documented here on purpose:
      * the reference never resets its line accumulator after emitting a
        chunk, which would re-emit the same bounds forever — we implement
        the documented intent (fresh accumulator seeded with the overlap);
      * a single line exceeding the hard limit crashes the reference
        (first-element access on an empty accumulator) — we emit it as a
        singleton over-limit chunk so offsets stay exact.
    Shares _segments/_emit offset bookkeeping with chunk_by_tokens.
    """
    if overlap_ratio >= 0.9:
        raise ValueError(f"overlap_ratio={overlap_ratio} is greater than or equal to 0.9")

    return _run_chunker(
        df, id_col, text_col,
        lambda text: _chunk_one_hard(text, hard_limit_tokens, overlap_ratio, max_chunks, token_counter),
    )


def _chunk_one_hard(
    text: str,
    hard_limit: int,
    overlap_ratio: float,
    max_chunks: int,
    tokens: Callable[[str], int],
) -> list[dict]:
    """Hard-cap chunk one document; pure function, unit-tested without Spark."""
    segs = _segments(text)
    if not segs:
        return []
    seg_tok = [tokens(s[2]) for s in segs]
    required_overlap = int(hard_limit * overlap_ratio)
    chunks: list[dict] = []
    cur: list[int] = []  # indexes into segs
    cur_tok = 0
    i = 0
    while i < len(segs) and len(chunks) < max_chunks:
        if not cur or cur_tok + seg_tok[i] <= hard_limit:
            cur.append(i)
            cur_tok += seg_tok[i]
            i += 1
            continue
        # suppress pure-subset emissions: with a large overlap_ratio the
        # carried segments alone can exceed the limit, which would emit a
        # chunk containing zero content the previous chunk lacks
        end = segs[cur[-1]][1]
        if not chunks or end > chunks[-1]["chunk_end"]:
            chunks.append(_emit(text, segs[cur[0]][0], end, len(chunks) + 1, tokens))
        # backtrack: carry trailing segments until the overlap requirement is
        # met; j > 0 guarantees cur shrinks each round (the subset guard
        # above is what guarantees emitted chunks always add content)
        j = len(cur) - 1
        carried = 0
        while j > 0 and carried < required_overlap:
            carried += seg_tok[cur[j]]
            j -= 1
        cur = cur[j + 1 :]  # carried overlap (possibly best-effort short); [] when required_overlap == 0
        cur_tok = sum(seg_tok[k] for k in cur)
    if cur and len(chunks) < max_chunks:
        end = segs[cur[-1]][1]
        if not chunks or end > chunks[-1]["chunk_end"]:
            chunks.append(_emit(text, segs[cur[0]][0], end, len(chunks) + 1, tokens))
    return chunks


def _segments(text: str) -> list[tuple[int, int, str]]:
    """(start, end, text) line segments; word segments for single-line text."""
    segs: list[tuple[int, int, str]] = []
    pos = 0
    for line in text.split("\n"):
        end = pos + len(line)
        if line.strip():
            segs.append((pos, end, line))
        pos = end + 1  # the newline
    if len(segs) <= 1 and text:
        segs = []
        pos = 0
        for word in text.split(" "):
            end = pos + len(word)
            if word:
                segs.append((pos, end, word))
            pos = end + 1
    return segs


def _emit(text: str, start: int, end: int, no: int, tokens: Callable[[str], int]) -> dict:
    chunk_text = text[start:end]
    return {
        "chunk_no": no,
        "chunk_start": start,
        "chunk_end": end,
        "chunk_bounds": f"{start}:{end}",
        "chunk_text": chunk_text,
        "num_tokens": tokens(chunk_text),
    }
