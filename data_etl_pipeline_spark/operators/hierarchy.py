"""Iterative graph algorithms over DataFrames: transitive closure of a
concept hierarchy.

The reference walks its SKOS concept tree recursively in driver memory
(rdf_to_graph_util.py:13-124 builds the tree; ontology trees served at
api/routes/knowledge/ontology.py). At 100 TB-class ontologies/lineage
graphs the closure must be computed distributed: Spark has no recursive
CTE, so the engine runs the classic iterative semi-naive expansion —
each round joins the newest frontier to the edge table and unions new
pairs, extending the reachable depth by one edge per round (the frontier
joins BASE edges, not the closure — linear rounds, but each round is one
cheap join instead of a growing self-join); iteration stops at fixpoint
(empty frontier) or max_depth.

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

    def next_frontier(frontier: DataFrame, closure: DataFrame) -> DataFrame:
        return (
            frontier.join(
                edges.select(F.col("child").alias("ancestor"), F.col("parent").alias("up")),
                "ancestor",
            )
            .select("node", F.col("up").alias("ancestor"), (F.col("depth") + 1).alias("depth"))
            # dedup within the round FIRST: two equal-length paths to the
            # same ancestor (any diamond) otherwise both survive the
            # _seen anti-join and compound through later frontiers — row
            # count would track path count (exponential in layered DAGs),
            # not pair count
            .groupBy("node", "ancestor")
            .agg(F.min("depth").alias("depth"))
            .join(closure.select("node", "ancestor").withColumn("_seen", F.lit(True)), ["node", "ancestor"], "left")
            .where(F.col("_seen").isNull())
            .drop("_seen")
            .localCheckpoint(eager=True)  # truncate the growing lineage
        )

    frontier = closure
    for _ in range(max_depth - 1):
        nxt = next_frontier(frontier, closure)
        if nxt.isEmpty():
            frontier = None
            break
        closure = closure.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    # if the round budget ran out with a live frontier, either the
    # hierarchy is exactly max_depth deep (fine) or deeper ancestry exists
    # and silently returning would TRUNCATE the closure (the recursive-CTE
    # oracle explores unbounded depth, so truncation is silent wrongness,
    # not an approximation). One real probe round distinguishes the two.
    if frontier is not None and not next_frontier(frontier, closure).isEmpty():
        raise RuntimeError(
            f"transitive_closure exceeded max_depth={max_depth} with "
            "reachable ancestors remaining; raise max_depth"
        )
    return closure


def pagerank_fixed_point(
    edges: DataFrame, iterations: int = 3, damping_pct: int = 85
) -> DataFrame:
    """PageRank in integer micro-units — the importance-propagation shape
    (rank web-crawl sources, weight corpus domains) made bit-deterministic:
    ranks are BIGINT micro-rank, contributions use integer division
    (``rank div out_degree``), and the update is

        rank' = (100 - damping_pct) * 10_000 + damping_pct * sum(contrib) div 100

    Every operation is exact integer arithmetic, so partial-aggregation
    order cannot wobble a bit and a SQL oracle unrolls the iterations
    verbatim.  The div-truncation bias is <= 1 micro-unit per edge per
    iteration (documented, deterministic).  Dangling-node mass is dropped
    (the simplest standard variant; both engines mirror it).

    Scale shape: per iteration ONE shuffle — contributions group by dst
    with map-side combine; the rank table joins edges on src (broadcast
    while ranks are dim-sized, SMJ beyond).  Iterations are driver-side
    control only; ranks are localCheckpointed so lineage stays flat
    (same mechanics as transitive_closure above).
    """
    edges = edges.select("src", "dst").distinct().persist()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    base = F.lit((100 - damping_pct) * 10_000).cast("long")
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank_micro")).localCheckpoint()
    for _ in range(iterations):
        contribs = (
            edges.join(out_deg, "src")
            .join(ranks, edges.src == ranks.node)
            .select("dst", F.expr("rank_micro div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            ranks.join(contribs, ranks.node == contribs.dst, "left")
            .select(
                "node",
                (
                    base
                    + F.expr(f"{damping_pct} * coalesce(in_mass, 0L) div 100")
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint()
        )
    edges.unpersist()
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph via DEGREE-ORDERED
    edge orientation — the standard distributed-triangle trick (cf. Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
    WWW'11): orient every edge from its lower-(degree, id) endpoint to the
    higher one, enumerate wedges only at each edge's SOURCE, and close the
    wedge with an equi-join back to the oriented edge set. Each triangle is
    found exactly once (at its lowest-degree corner).

    Input: ``edges`` with columns (u, v), undirected — either orientation,
    duplicates, and self-loops are all normalized away here.

    Scale shape: wedge count is sum(out_degree^2) which orientation bounds
    by O(m^1.5) on any graph — a celebrity node of degree d contributes
    wedges at its (lower-degree) neighbors instead of d^2 at itself, so the
    skewed key the naive enumeration creates simply does not exist. The
    oriented edge list is MATERIALIZED once (localCheckpoint, same flat-
    lineage mechanics as pagerank above): it feeds three DAG branches
    (both wedge spokes and the closing probe), and lazily each branch
    would re-run the canonicalize+degree+orient build — ~5 redundant fact
    scans at any scale. Downstream of the build: one wedge self-join on
    src, one closing equi-join on (x, y), one count agg — each over the
    orientation-bounded wedge set; no OR-joins, the closing edge's
    orientation is forced by carrying neighbor degrees in the wedge row.
    """
    # canonicalize: either direction accepted, self-loops dropped
    e = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("k"))
        .unionByName(e.select(F.col("v").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient toward the higher (deg, id); keep the destination's degree so
    # the wedge join below can order its two spokes without re-joining deg
    withdeg = (
        e.join(deg.withColumnRenamed("k", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("k", "v").withColumnRenamed("deg", "dv"), "v")
    )
    fwd = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    ed = withdeg.select(
        F.when(fwd | tie, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd | tie, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd | tie, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    ).localCheckpoint()
    a, b = ed.alias("a"), ed.alias("b")
    spoke_lt = (F.col("a.ddeg") < F.col("b.ddeg")) | (
        (F.col("a.ddeg") == F.col("b.ddeg")) & (F.col("a.dst") < F.col("b.dst"))
    )
    wedges = a.join(b, (F.col("a.src") == F.col("b.src")) & spoke_lt).select(
        F.col("a.src").alias("apex"),
        F.col("a.dst").alias("x"),
        F.col("b.dst").alias("y"),
    )
    closing = ed.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = wedges.join(closing, ["x", "y"])
    return (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
