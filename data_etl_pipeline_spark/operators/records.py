"""Record reconciliation operators (SURVEY J10, A7, A1).

  merge_addresses  - J10: pairwise merge of address structs sharing a
                     (city, state, country) base hash with compatible
                     postal codes; phone/fax sets union (address_util.py:4-66).
  correction_fold  - A7: final ground truth = base results with ordered
                     correction logs folded over them (adds applied, removes
                     dropped) — ground_truth_helper_util.py:9-50.
  rollup_result_sets - A1: union of per-chunk result sets to one
                     per-entity sorted array (keyword_reconcile_node.py:75-117).

All are expressed as groupBy + higher-order functions — no UDFs, so they
stay in codegen and scale as ordinary hash aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# addresses schema: entity string, city string, state string, country string,
#                   postal_code string (nullable), phones array<string>


def merge_addresses(addresses: DataFrame) -> DataFrame:
    """J10: merge addresses within an entity sharing base_hash =
    (city, state, country), when postal codes are compatible (equal, or one
    side null). Phones union. Output one merged address per group.

    Grouped-agg formulation of the reference's pairwise loop: compatible
    postal codes within a group collapse to the single non-null value; a
    group with >1 distinct non-null postal codes stays split (grouped by
    postal code as a secondary key), matching can_merge semantics.
    """
    base = addresses.withColumn(
        "base_hash", F.sha2(F.concat_ws("|", F.lower("city"), F.lower("state"), F.lower("country")), 256)
    )
    # secondary key: the postal code when present; a null-postal address is
    # compatible with any code, so it merges into the group's smallest code
    # (deterministic stand-in for the reference's first-fit pairwise merge)
    pc = base.groupBy("entity", "base_hash").agg(F.min("postal_code").alias("min_code"))
    keyed = base.join(pc, ["entity", "base_hash"]).withColumn(
        "merge_key", F.coalesce("postal_code", "min_code", F.lit(""))
    )
    return (
        keyed.groupBy("entity", "base_hash", "merge_key")
        .agg(
            F.first("city").alias("city"),
            F.first("state").alias("state"),
            F.first("country").alias("country"),
            F.max("postal_code").alias("postal_code"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("phones")))).alias("phones"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("merge_key")
    )


def correction_fold(gt: DataFrame, mode: str = "fold_all") -> DataFrame:
    """A7: apply ordered correction logs to base result sets.

    ``gt`` columns: entity string, base_results array<string>,
    logs array<struct<seq int, add array<string>, remove array<string>>>.

    mode='fold_all'  - keywords semantics: fold every log in seq order
                       (final = ((base - rm1) + add1 - rm2) + add2 ...).
    mode='last_log'  - concepts semantics: only the latest log applies.
    Output: entity, final_results (sorted array).
    """
    logs_sorted = "array_sort(logs, (a, b) -> a.seq - b.seq)"
    if mode == "fold_all":
        folded = (
            f"aggregate({logs_sorted}, base_results, "
            f"(acc, l) -> array_union(array_except(acc, l.remove), l.add))"
        )
    elif mode == "last_log":
        folded = (
            f"IF(size(logs) = 0, base_results, "
            f"array_union(array_except(base_results, element_at({logs_sorted}, -1).remove), "
            f"element_at({logs_sorted}, -1).add))"
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return gt.select(
        "entity",
        F.array_sort(F.array_distinct(F.expr(folded))).alias("final_results"),
    )


def rollup_result_sets(chunk_results: DataFrame, entity_col: str = "entity", results_col: str = "results") -> DataFrame:
    """A1: per-entity union of per-chunk result arrays, sorted for stable
    comparison. Partial aggregation keeps the shuffle proportional to the
    distinct result values, not the chunk count."""
    return chunk_results.groupBy(entity_col).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(results_col)))).alias("final_results")
    )
