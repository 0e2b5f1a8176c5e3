"""Scraped-page block operators (SURVEY W4/W5 — dedup_util.py semantics).

The reference stores a scraped site as newline-delimited *blocks*
("#"*50 separator, then the page URL, blank line, then the body). Dedup is
two-phase:

  W4 dedup_blocks_first_wins - blocks with an identical body hash keep the
      body only at their first occurrence (by block order); later
      duplicates become URL-only stubs. Original order preserved.
  W5 header_footer_vote      - per line *position*, if >= 95% of blocks
      agree with the most common line at that position (and >= 3 lines
      qualify contiguously), the run is a boilerplate header/footer and is
      stripped from every block.

Both are distributed: W4 is a window over the body hash; W5 is a groupBy on
(site, position) plus a broadcast of the small per-site boilerplate depth.
The reference streams ~1 GB files on one node (dedup_util.py:9-25); here
blocks are rows, so a 100 TB corpus just partitions by site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# Blocks schema: site string, block_no int, url string, body string


def dedup_blocks_first_wins(blocks: DataFrame) -> DataFrame:
    """W4: first block with a given body hash keeps it; later duplicates
    are emptied to URL-only stubs. Order (site, block_no) preserved."""
    w = W.partitionBy("site", F.sha2(F.col("body"), 256)).orderBy("block_no")
    return (
        blocks.withColumn("rn", F.row_number().over(w))
        .withColumn("is_duplicate", F.col("rn") > 1)
        .withColumn("body", F.when(F.col("is_duplicate"), F.lit("")).otherwise(F.col("body")))
        .drop("rn")
    )


def header_footer_vote(
    blocks: DataFrame,
    agree_ratio: float = 0.95,
    min_lines: int = 3,
    max_scan: int = 20,
) -> DataFrame:
    """W5: strip per-site boilerplate headers by positional majority vote.

    For each site and line position (0..max_scan-1 from the top), the
    position is boilerplate when the most frequent line at that position
    occurs in >= agree_ratio of the site's blocks. The header depth is the
    longest boilerplate prefix, applied only when >= min_lines. (The
    reference votes from both ends; the footer pass is this operator on
    reversed line numbers.)

    Returns blocks with a ``body_clean`` column.
    """
    lines = blocks.select(
        "site",
        "block_no",
        F.posexplode(F.split("body", "\n")).alias("pos", "line"),
    ).where(F.col("pos") < max_scan)

    n_blocks = blocks.groupBy("site").agg(F.count(F.lit(1)).alias("n_blocks"))

    # most-common line share per (site, pos); positions must also be present
    # in (almost) all blocks for the vote to make sense
    line_counts = lines.groupBy("site", "pos", "line").agg(F.count(F.lit(1)).alias("c"))
    top_share = (
        line_counts.groupBy("site", "pos")
        .agg(F.max("c").alias("top_c"))
        .join(F.broadcast(n_blocks), "site")
        .withColumn("agrees", F.col("top_c") >= F.ceil(F.lit(agree_ratio) * F.col("n_blocks")))
    )

    # longest agreeing prefix: min non-agreeing position (or max_scan)
    depth = (
        top_share.groupBy("site")
        .agg(
            F.min(F.when(~F.col("agrees"), F.col("pos"))).alias("first_break"),
            F.max(F.when(F.col("agrees"), F.col("pos") + 1)).alias("max_agree"),
        )
        .withColumn("header_depth", F.coalesce(F.col("first_break"), F.col("max_agree"), F.lit(0)))
        .withColumn("header_depth", F.when(F.col("header_depth") >= min_lines, F.col("header_depth")).otherwise(F.lit(0)))
        .select("site", "header_depth")
    )

    return (
        blocks.join(F.broadcast(depth), "site", "left")
        .withColumn("header_depth", F.coalesce("header_depth", F.lit(0)))
        .withColumn(
            "body_clean",
            F.array_join(
                F.slice(F.split("body", "\n"), F.col("header_depth") + 1, F.lit(1_000_000)),
                "\n",
            ),
        )
    )


def assemble_blocks_from_documents(docs: DataFrame, header: str = "NAV|HOME|ABOUT\nMENU") -> DataFrame:
    """Deterministic blocks fixture derived from the documents table: one
    site per source, one block per document, a shared synthetic header, and
    every 5th block duplicating the body of the previous block (so W4 has
    real duplicates). Used by tests and the oracle-checked queries."""
    base = docs.select(
        F.col("source").alias("site"),
        F.col("doc_id").cast("int").alias("block_no"),
        F.concat(F.lit("http://"), F.col("source"), F.lit("/page"), F.col("doc_id")).alias("url"),
        F.col("text"),
        F.col("doc_id"),
    )
    w = W.partitionBy("site").orderBy("block_no")
    return (
        base.withColumn("prev_text", F.lag("text").over(w))
        .withColumn(
            "body",
            F.concat(
                F.lit(header + "\n"),
                F.when((F.col("doc_id") % 5 == 0) & F.col("prev_text").isNotNull(), F.col("prev_text")).otherwise(
                    F.col("text")
                ),
            ),
        )
        .select("site", "block_no", "url", "body")
    )
