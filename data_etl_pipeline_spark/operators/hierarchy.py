"""Iterative graph algorithms over DataFrames: transitive closure of a
concept hierarchy.

The reference walks its SKOS concept tree recursively in driver memory
(rdf_to_graph_util.py:13-124 builds the tree; ontology trees served at
api/routes/knowledge/ontology.py). At 100 TB-class ontologies/lineage
graphs the closure must be computed distributed: Spark has no recursive
CTE, so the engine runs the classic iterative semi-naive expansion —
each round joins the newest frontier to the edge table and unions new
pairs, doubling the reachable depth roughly every join round; iteration
stops at fixpoint (empty frontier) or max_depth.

Each round is one broadcast/shuffle join + a distinct; intermediate
results are cached and the loop is driver-side CONTROL only (O(depth)
decisions) — the data never funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_cycles(edges: DataFrame, max_depth: int = 32) -> DataFrame:
    """Concept-tree cycle check (SURVEY §3.4 — the reference validates its
    ontology for cycles in rdf_validation_service.py:37-79): a node on a
    cycle reaches itself in the closure. Returns (node, depth) rows —
    empty means acyclic."""
    closure = transitive_closure(edges, max_depth)
    return closure.where(F.col("node") == F.col("ancestor")).select(
        "node", F.col("depth").alias("cycle_length")
    )


def duplicate_labels(vocab: DataFrame, label_col: str = "label") -> DataFrame:
    """Ontology duplicate-label check (same validation service): labels
    carried by more than one concept, case-insensitive. Returns
    (label_lower, n_concepts, concepts) — empty means clean."""
    return (
        vocab.groupBy(F.lower(F.col(label_col)).alias("label_lower"))
        .agg(
            F.countDistinct("concept").alias("n_concepts"),
            F.array_sort(F.collect_set("concept")).alias("concepts"),
        )
        .where(F.col("n_concepts") > 1)
    )


def transitive_closure(edges: DataFrame, max_depth: int = 32) -> DataFrame:
    """All (node, ancestor, depth) pairs reachable through ``edges``
    (columns: child, parent). depth 1 = direct parent. Fixpoint loop:
    frontier(k+1) = frontier(k) join edges, keeping the SHORTEST depth
    per pair (min over rounds — consistent with the recursive-CTE oracle
    that explores breadth-first).
    """
    closure = edges.select(
        F.col("child").alias("node"), F.col("parent").alias("ancestor"), F.lit(1).alias("depth")
    )
    frontier = closure
    for _ in range(max_depth - 1):
        nxt = (
            frontier.join(
                edges.select(F.col("child").alias("ancestor"), F.col("parent").alias("up")),
                "ancestor",
            )
            .select("node", F.col("up").alias("ancestor"), (F.col("depth") + 1).alias("depth"))
            .join(closure.select("node", "ancestor").withColumn("_seen", F.lit(True)), ["node", "ancestor"], "left")
            .where(F.col("_seen").isNull())
            .drop("_seen")
            .localCheckpoint(eager=True)  # truncate the growing lineage
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return closure
