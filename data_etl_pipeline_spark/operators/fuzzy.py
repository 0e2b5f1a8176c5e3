"""Edit-distance similarity JOIN with lossless q-gram blocking (entity
resolution — the generalization of the reference's record-reconciliation
merges, SURVEY J10 / `plans/reconcile.py`, to free-text keys).

The naive form is a cross join with a ``levenshtein() <= d`` filter —
O(n*m) comparisons, unusable at scale. The scale form here is COUNT
FILTERING over q-grams (Gravano et al., "Approximate String Joins in a
Database (Almost) for Free", VLDB 2001 — public literature):

  * a single edit operation can destroy at most ``q`` of a string's
    positional q-grams, so two strings within edit distance ``d`` must
    share at least ``max(|G(a)|, |G(b)|) - d*q`` of their (padded,
    distinct) q-grams;
  * pairs are therefore mined from a q-gram inverted index (explode →
    equi-join on the gram → count shared per pair) and only pairs meeting
    the count bound are verified with the exact levenshtein — the same
    posting-list shape as every other pair miner in this engine, never a
    cross join;
  * strings too short for the bound to bite (fewer than ``d*q + 1``
    grams) cannot be blocked losslessly — they fall into a bounded SHORT
    bucket compared directly against the (short ± d-length) slice of the
    other side. Correctness never depends on data: blocking + short
    bucket together are provably lossless for the threshold, which is
    what lets the quadratic oracle check the blocked plan's exact output.

Both engines implement the identical levenshtein (unit-cost edit
distance), so the verified pair set hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# \x01 cannot occur in the data; q-1 copies pad each end so boundary
# characters get full gram coverage (standard positional-gram padding)
_PAD = "\x01"


def _with_grams(df: DataFrame, id_col: str, text_col: str, q: int, side: str) -> DataFrame:
    padded = F.concat(F.lit(_PAD * (q - 1)), F.col(text_col), F.lit(_PAD * (q - 1)))
    out = df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.col(text_col).alias(f"{side}_s"),
        padded.alias("__p"),
    ).withColumn(
        f"{side}_grams",
        F.expr(f"array_distinct(transform(sequence(1, length(__p) - {q - 1}), i -> substring(__p, i, {q})))"),
    ).drop("__p")
    return out.withColumn(f"{side}_ng", F.size(f"{side}_grams"))


def fuzzy_match_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    text_col: str = "s",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All (left_id, right_id, dist) with ``levenshtein <= max_dist``.

    Long×long pairs come from the q-gram inverted index with the count
    bound; any pair involving a short string (< d*q + 1 grams) is checked
    in the bounded short bucket (short side × length-compatible slice of
    the other side). Exact levenshtein verifies every candidate, so the
    output equals the quadratic join's — blocking only prunes work.
    """
    min_grams = max_dist * q + 1
    L = _with_grams(left, id_col, text_col, q, "l")
    R = _with_grams(right, id_col, text_col, q, "r")
    dist = F.levenshtein(F.col("l_s"), F.col("r_s"))

    # --- long × long: gram inverted index + count filtering ---------------
    lg = L.where(F.col("l_ng") >= min_grams).select(
        "l_id", "l_s", "l_ng", F.explode("l_grams").alias("g")
    )
    rg = R.where(F.col("r_ng") >= min_grams).select(
        "r_id", "r_s", "r_ng", F.explode("r_grams").alias("g")
    )
    shared = (
        lg.join(rg, "g")
        .groupBy("l_id", "r_id")
        .agg(
            F.first("l_s").alias("l_s"),
            F.first("r_s").alias("r_s"),
            F.first("l_ng").alias("l_ng"),
            F.first("r_ng").alias("r_ng"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .where(F.col("n_shared") >= F.greatest("l_ng", "r_ng") - F.lit(max_dist * q))
    )
    long_pairs = shared.select("l_id", "r_id", "l_s", "r_s")

    # --- short bucket: lossless remainder, bounded by construction --------
    # each edit removes at most q distinct gram types, so a qualifying
    # pair's distinct-gram counts differ by at most max_dist*q — a short
    # string (ng <= max_dist*q) only needs the other side's slice with
    # ng < min_grams + max_dist*q; a qualifying pair's lengths also
    # differ by at most max_dist. Both prunes are PROVEN bounds (they
    # gate which candidates reach the verify, so soundness is what makes
    # the whole join lossless); levenshtein then exact-verifies.
    margin = max_dist * q
    ls = L.where(F.col("l_ng") < min_grams)
    rs = R.where(F.col("r_ng") < min_grams)
    len_ok = F.abs(F.length("l_s") - F.length("r_s")) <= max_dist
    short_l = ls.crossJoin(
        F.broadcast(R.where(F.col("r_ng") < min_grams + margin).select("r_id", "r_s"))
    ).where(len_ok)
    short_r = (
        L.where((F.col("l_ng") >= min_grams) & (F.col("l_ng") < min_grams + margin))
        .select("l_id", "l_s")
        .crossJoin(F.broadcast(rs.select("r_id", "r_s")))
        .where(len_ok)
    )
    short_pairs = short_l.select("l_id", "r_id", "l_s", "r_s").unionByName(
        short_r.select("l_id", "r_id", "l_s", "r_s")
    )

    # Verify BEFORE the cross-bucket dedup, then dedup on scalars: dist is
    # a per-pair constant of (l_s, r_s), so min(dist) over duplicate
    # candidates equals the single value the old dropDuplicates kept. The
    # selective distance filter now runs before the dedup exchange, which
    # carries (ids, long) instead of (ids, both strings) — same reorder as
    # the LSH/simhash pair miners (guide §2.3); worst case one extra
    # levenshtein for a pair surfacing in two buckets.
    return (
        long_pairs.unionByName(short_pairs)
        .withColumn("dist", dist.cast("long"))
        .where(F.col("dist") <= max_dist)
        .groupBy("l_id", "r_id")
        .agg(F.min("dist").alias("dist"))
        .select(F.col("l_id").alias("left_id"), F.col("r_id").alias("right_id"), "dist")
    )
