"""Text-analysis operators for training-data pipelines.

BASELINE.json names these as first-class: language ID, quality scoring,
token counting, document fingerprinting. All are single-pass, shuffle-free
column expressions (whole-stage codegen) so they cost one corpus scan at
any scale. The reference's token counting (open_ai_key_app/.../token_util.py)
is tiktoken-based; here the pluggable stub is whitespace words (FIXTURES.md
B7) plus a regex "BPE-ish" token split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_etl_pipeline_spark.functions.hashing import MERSENNE_31

# marker word groups for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def _count_in(words_expr: str, markers: tuple[str, ...]) -> str:
    lst = ",".join(f"'{m}'" for m in markers)
    return f"size(filter({words_expr}, x -> x IN ({lst})))"


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of marker-word counts (ties: en>es>de).

    A real deployment swaps the marker table for char-n-gram profiles; the
    operator shape (scan + scoring expression, zero shuffles) is identical.
    """
    w = f"split({text_col}, ' ')"
    scores = {lang: _count_in(w, m) for lang, m in LANG_MARKERS.items()}
    pred = (
        f"CASE WHEN {scores['en']} >= {scores['es']} AND {scores['en']} >= {scores['de']} THEN 'en' "
        f"WHEN {scores['es']} >= {scores['de']} THEN 'es' ELSE 'de' END"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(scores["en"]).alias("score_en"),
        F.expr(scores["es"]).alias("score_es"),
        F.expr(scores["de"]).alias("score_de"),
        F.expr(pred).alias("pred_lang"),
    )


def _quality_exprs(text_col: str) -> dict[str, str]:
    """The quality feature/score SQL fragments, built once so the join form
    (quality_score) and the in-place form (with_quality) can never drift on
    weights or thresholds."""
    w = f"split({text_col}, ' ')"
    n_words = f"size({w})"
    n_distinct = f"size(array_distinct({w}))"
    n_chars = f"length({text_col})"
    n_stop = _count_in(w, STOPWORDS)
    stop_ratio = f"(cast({n_stop} as double) / {n_words})"
    diversity = f"(cast({n_distinct} as double) / {n_words})"
    return {
        "n_words": n_words,
        "n_distinct": n_distinct,
        "n_chars": n_chars,
        "n_stop": n_stop,
        "avg_word_len": f"(cast({n_chars} as double) / {n_words})",
        "stop_ratio": stop_ratio,
        "diversity": diversity,
        "score": (
            f"round(0.4 * {diversity} + 0.3 * least({stop_ratio} * 4.0, 1.0) "
            f"+ 0.3 * least({n_words} / 100.0, 1.0), 6)"
        ),
    }


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / stopword-ratio / lexical-diversity quality features + score.

    Mirrors the quality gates the reference applies before LLM extraction
    (token band filters, new_extract_queue_bot.py:81-82; scrape validity,
    url_scraper_service.py:96-102) generalized to a scored filter.
    """
    e = _quality_exprs(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(e["n_words"]).alias("n_words"),
        F.expr(e["n_distinct"]).alias("n_distinct_words"),
        F.expr(f"round({e['avg_word_len']}, 6)").alias("avg_word_len"),
        F.expr(f"round({e['stop_ratio']}, 6)").alias("stopword_ratio"),
        F.expr(e["score"]).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace and regex (BPE-ish word/number split) token counts.

    The pluggable-tokenizer seam from FIXTURES.md B7: whitespace words are
    the deterministic stub; swapping in tiktoken means replacing these
    expressions with a vectorized pandas_udf without touching callers.
    """
    ws = f"size(split({text_col}, ' '))"
    bpe = f"size(filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != ''))"
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(ws).alias("ws_tokens"),
        F.expr(bpe).alias("re_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Polynomial rolling-hash document fingerprint (mod 2^31-1).

    Sequential char fold — identical op order in Spark's ``aggregate`` and
    the oracle's ``list_reduce``. Used as a cheap content identity for
    incremental recomputation (the reference keys lineage on content
    version ids, SURVEY §1.3).
    """
    fp = (
        f"aggregate(transform(split({text_col}, ''), x -> ascii(x)), "
        f"cast(0 as bigint), (acc, c) -> (acc * 31 + c) % {MERSENNE_31})"
    )
    return df.select(F.col(id_col).alias("doc_id"), F.expr(fp).alias("fingerprint"))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the quality feature columns IN PLACE (no join): the composing
    form of ``quality_score`` — adding expressions to an existing plan keeps
    curation pipelines at one corpus scan."""
    e = _quality_exprs(text_col)
    return df.withColumn("n_words", F.expr(e["n_words"])).withColumn(
        "quality_score", F.expr(e["score"])
    )


# --- PII redaction (training-corpus scrubbing) ----------------------------

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Email/phone redaction with redaction counts — the scrub step a
    training pipeline runs before tokenization. Pure regexp_replace /
    regexp_count expressions (RE2-compatible patterns so the DuckDB oracle
    evaluates the same automata); zero shuffles, one corpus scan.
    """
    emails = F.regexp_count(F.col(text_col), F.lit(EMAIL_PATTERN)).cast("long")
    phones = F.regexp_count(F.col(text_col), F.lit(PHONE_PATTERN)).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        redacted.alias("redacted_text"),
        emails.alias("n_emails"),
        phones.alias("n_phones"),
    )


# --- repetition filter (Gopher-style quality gate) ------------------------

def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-document repetition ratios: fraction of words taken by the most
    frequent word, and fraction of n-gram occurrences taken by the most
    frequent n-gram — the standard repetition quality gates (Gopher /
    RefinedWeb style rules) for dropping boilerplate-heavy documents.

    All array expressions (split once -> sort -> longest-equal-run fold),
    so the operator is a zero-shuffle corpus scan.

    Cost note: the top frequency of an array's elements is computed as
    the longest equal run over the SORTED array — one O(L log L) sort +
    one O(L) struct-accumulator fold per document. The previous form
    (`transform(array_distinct(w), d -> size(filter(w, ...)))`) was
    O(distinct x L) with the `split` re-evaluated inside every lambda
    invocation (HOFs are interpreted CodegenFallback expressions), which
    made whole-corpus gating ~10x slower and quadratic on book-length
    docs. The DuckDB oracle keeps its own (quadratic, list-comprehension)
    form — the contract is exact VALUE parity, and both forms produce the
    same exact integer counts.
    """
    # split exactly once per row; every later reference reads the column.
    with_ws = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__ws"),
    )

    def top_freq(arr: str) -> str:
        # longest equal run over the sorted array: (prev, run, best) fold.
        return (
            f"aggregate(array_sort({arr}), "
            "struct(cast(null as string) as prev, 0L as run, 0L as best), "
            "(a, x) -> named_struct("
            "'prev', x, "
            "'run', if(a.prev <=> x, a.run + 1, 1L), "
            "'best', greatest(a.best, if(a.prev <=> x, a.run + 1, 1L))), "
            "a -> a.best)"
        )

    grams = (
        f"transform(sequence(0, size(__ws) - {n}), "
        f"i -> concat_ws(' ', slice(__ws, i + 1, {n})))"
    )
    return with_ws.select(
        "doc_id",
        F.expr("size(__ws)").cast("long").alias("n_words"),
        F.expr(
            f"round(cast({top_freq('__ws')} as double) / size(__ws), 6)"
        ).alias("top_word_ratio"),
        F.expr(
            f"case when size(__ws) >= {n} then "
            f"round(cast({top_freq(grams)} as double) / (size(__ws) - {n} + 1), 6) end"
        ).alias("top_trigram_ratio"),
    )
