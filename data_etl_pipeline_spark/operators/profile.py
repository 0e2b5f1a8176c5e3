"""Data-quality profiling and constraint validation (the Deequ / Great
Expectations shape): compute per-column statistics for ANY table in one
generic pass, then evaluate declarative constraints against them.

The reference validates records field-by-field in Python (Pydantic models,
ad-hoc null checks before each pipeline stage); the engine-native form
profiles whole tables declaratively so a 100 TB ingest can be gated on
"null rate below x, key unique, values in range" without custom code.

Scale shape: rows unpivot to (column, value-as-string) pairs — a fan-out
of x n_cols, all codegen `stack()` — then ONE groupBy (column, value)
with map-side combine feeds a per-column rollup.  Cost is one shuffle of
pre-reduced (column, value, count) triples regardless of how many columns
are profiled; per-column passes (the naive form) would scan the table
n_cols times.  Top-value ties break lexicographically so the result is
deterministic and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_null, n_distinct,
    min_value, max_value, top_value, top_count) — values compared in their
    string form so one schema serves every column type.  NULLs count into
    n_null only (not distinct/min/max/top)."""
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) as (col_name, value)")
    )
    per_value = long.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_value.groupBy("col_name")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), F.col("n")).otherwise(0)).alias("n_null"),
            F.count(F.when(F.col("value").isNotNull(), 1)).alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            # min over (-count, value): highest count wins, ties take the
            # lexicographically smallest value; null values carry a +inf
            # key so they only surface when a column is entirely null
            F.expr(
                "min_by(value, named_struct("
                "'negn', if(value is null, 9223372036854775807L, -n), "
                "'v', value))"
            ).alias("_top_raw"),
            F.max(F.when(F.col("value").isNotNull(), F.col("n")).otherwise(-1)).alias(
                "top_count_raw"
            ),
        )
        .select(
            "col_name",
            "n_rows",
            "n_null",
            "n_distinct",
            "min_value",
            "max_value",
            F.col("_top_raw").alias("top_value"),
            F.when(F.col("top_count_raw") < 0, None)
            .otherwise(F.col("top_count_raw"))
            .cast("long")
            .alias("top_count"),
        )
    )


def check_constraints(profile_df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate declarative constraints against a profile: each rule is
    {"column", "kind", ...} with kinds

      * ``not_null``  (max_null_rate: float)  — null share bound
      * ``unique``                            — n_distinct == non-null rows
      * ``min_distinct`` (at_least: int)      — cardinality floor

    Returns (col_name, kind, passed) rows — the gate a pipeline asserts on
    before promoting an ingest batch.

    A rule whose column has NO profile row (misspelled column, or an empty
    table producing an empty profile) raises instead of vanishing from the
    output — a gate that silently passes on missing evidence is the
    failure mode this exists to prevent."""
    if not rules:
        raise ValueError("check_constraints needs at least one rule")
    present = {r["col_name"] for r in profile_df.select("col_name").distinct().collect()}
    missing = [r["column"] for r in rules if r["column"] not in present]
    if missing:
        raise ValueError(
            f"no profile rows for constraint column(s) {missing}; refusing a "
            "vacuously-passing gate (empty table or wrong column name)"
        )
    checks = []
    for r in rules:
        base = profile_df.where(F.col("col_name") == r["column"])
        if r["kind"] == "not_null":
            passed = F.col("n_null") <= F.lit(r["max_null_rate"]) * F.col("n_rows")
        elif r["kind"] == "unique":
            passed = F.col("n_distinct") == F.col("n_rows") - F.col("n_null")
        elif r["kind"] == "min_distinct":
            passed = F.col("n_distinct") >= F.lit(r["at_least"])
        else:
            raise ValueError(f"unknown constraint kind {r['kind']!r}")
        checks.append(
            base.select(
                "col_name", F.lit(r["kind"]).alias("kind"), passed.alias("passed")
            )
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group weighted median: the smallest value whose cumulative
    weight (over all rows with value <= it) reaches half the group total.

    Weights accumulate as exact DECIMAL(28,10) over the default RANGE
    window frame — peers at the same value are summed TOGETHER, so tie
    ordering can never make the cumulative sum engine-dependent (the ROWS
    frame would). Scale 10 keeps sub-cent fractional weights (round-7
    ADVICE fix: scale 2 silently zeroed weights like 0.004, shifting the
    median). Weights must be non-negative — a negative weight makes the
    cumulative-reaches-half definition meaningless, so it fails the job
    (JVM-side assert riding the weight expression itself, un-prunable).
    One shuffle on the group key; the window sort is partition-local.
    """
    from pyspark.sql import Window as W

    w_raw = F.col(weight_col).cast("decimal(28,10)")
    # assert_true yields NULL on pass; riding it inside the weight
    # expression keeps Catalyst from pruning the check away. NULL weights
    # keep their historical skip-from-the-sums semantics (the predicate
    # admits them explicitly — a bare >= 0 evaluates NULL and would fail
    # the job with a wrong 'negative' diagnostic).
    w = F.when(
        F.assert_true(
            (w_raw >= 0) | w_raw.isNull(), f"negative weight in {weight_col}"
        ).isNull(),
        w_raw,
    )
    win = W.partitionBy(*group_cols).orderBy(F.col(value_col))  # RANGE frame: peers included
    tot = W.partitionBy(*group_cols)
    c = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.sum(w).over(win).alias("__cum"),
        F.sum(w).over(tot).alias("__tot"),
    )
    # __cum is decimal(38,10); a bare *2 would push precision past 38 and
    # Spark would REDUCE THE SCALE to 6, rounding sub-1e-6 weights away at
    # the boundary (round-7 review fix). Casting down to (36,10) first
    # keeps (36,10) x (1,0) at precision 38 exactly — scale intact; the
    # cast itself can only overflow for cumulative weights >= 1e26, which
    # fails loudly rather than rounding silently.
    cum2 = F.col("__cum").cast("decimal(36,10)") * F.lit(2).cast("decimal(1,0)")
    return (
        c.where(cum2 >= F.col("__tot"))
        .groupBy(*group_cols)
        .agg(F.min("__v").alias("weighted_median"))
    )
