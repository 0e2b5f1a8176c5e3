"""Deferred LLM-extraction state machine (SURVEY §3.3, ST2-ST5, X4).

The reference keeps a pending-task table (GPTBatchRequest rows keyed by
custom_id "etld1>field>phase>chunk>bounds"), creates only *missing* requests
(anti-join against current state), ships them to an external batch executor
as JSONL, harvests responses by custom_id, unpairs missing ids for retry,
and reconciles per-chunk results into per-entity records.

Spark-first translation: the task table is a DataFrame (Parquet/Delta in a
real deployment); every transition is a join/anti-join keyed on custom_id —
idempotent by construction, so re-running a step after a failure converges
(the MERGE-on-custom_id semantics of SURVEY ST2). The LLM boundary is a
deterministic stub (FIXTURES.md B4) so the whole pipeline is hermetic.

custom_id format follows the reference
(extract_concept_deferred_service.py:213-215,582):
    "{entity}>{field}>llm_search>chunk>{start}:{end}"
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELDS = ("products", "certificates", "process_caps")

# --------------------------------------------------------------------------
# request construction (U2: pure request-blob builder)
# --------------------------------------------------------------------------


def build_requests(chunks: DataFrame, fields: tuple[str, ...] = FIELDS) -> DataFrame:
    """One pending request per (entity, field, chunk).

    ``chunks`` needs columns: doc_id, chunk_bounds, chunk_text.
    Output: custom_id, entity, field, chunk_bounds, context, num_tokens.
    """
    fields_arr = "array(" + ",".join(f"'{f}'" for f in fields) + ")"
    return (
        chunks.select(
            F.col("doc_id").cast("string").alias("entity"),
            "chunk_bounds",
            F.col("chunk_text").alias("context"),
            F.explode(F.expr(fields_arr)).alias("field"),
        )
        .select(
            F.concat_ws(">", "entity", "field", F.lit("llm_search"), F.lit("chunk"), "chunk_bounds").alias(
                "custom_id"
            ),
            "entity",
            "field",
            "chunk_bounds",
            "context",
            F.size(F.split("context", " ")).alias("num_tokens"),
        )
    )


def missing_requests(wanted: DataFrame, state: DataFrame) -> DataFrame:
    """X4/ST3: incremental recomputation — create only requests whose
    custom_id is absent from the state table (left anti-join)."""
    return wanted.join(state.select("custom_id"), "custom_id", "left_anti")


# --------------------------------------------------------------------------
# deterministic LLM stub (U1 boundary; FIXTURES.md B4 semantics)
# --------------------------------------------------------------------------


def llm_stub_responses(requests: DataFrame, dirty_every: int = 7) -> DataFrame:
    """Deterministic canned responses: a JSON array of the first words of
    the context whose md5-hash parity matches the field — stable across
    engines and runs. Every ``dirty_every``-th response is wrapped in
    markdown fences to exercise the JSON-repair path (str_util.py cases).
    """
    picked = (
        "filter(slice(split(context, ' '), 1, 12), "
        "x -> (cast(conv(substr(md5(concat(x, field)), 1, 15), 16, 10) as bigint) % 3) = 0)"
    )
    clean = f"to_json({picked})"
    dirty = f"concat('```json\n', {clean}, '\n```')"
    is_dirty = f"(cast(conv(substr(md5(custom_id), 1, 15), 16, 10) as bigint) % {dirty_every}) = 0"
    return requests.select(
        "custom_id",
        F.expr(f"IF({is_dirty}, {dirty}, {clean})").alias("response"),
    )


# --------------------------------------------------------------------------
# harvest + retry (ST2/ST5)
# --------------------------------------------------------------------------


def harvest(state: DataFrame, responses: DataFrame) -> DataFrame:
    """Attach responses by custom_id (idempotent: dedup on custom_id, left
    join so unanswered requests stay pending)."""
    r = responses.dropDuplicates(["custom_id"]).withColumnRenamed("response", "_resp")
    return (
        state.join(r, "custom_id", "left")
        .withColumn("response", F.coalesce("_resp", "response" if "response" in state.columns else F.lit(None)))
        .drop("_resp")
    )


def unpair_missing(state: DataFrame, batch_results: DataFrame) -> DataFrame:
    """ST5: requests paired to a batch whose result file lacks their
    custom_id are unpaired (batch_id nulled) for automatic retry.

    Scope: when ``batch_results`` carries a ``batch_id`` column, ONLY
    requests paired to one of those batches are candidates — results for
    batch b1 must not unpair b2's still-in-flight requests (which would
    re-ship b2's whole workload and double-spend tokens).  Without the
    column the results are treated as covering every in-flight batch
    (the historical all-batches contract, which in-repo callers use by
    passing the union)."""
    present = batch_results.select("custom_id").distinct().withColumn("_seen", F.lit(True))
    if "batch_id" in batch_results.columns:
        covered = (
            batch_results.select("batch_id").where(F.col("batch_id").isNotNull())
            .distinct()
            .withColumn("_covered", F.lit(True))
        )
        state = state.join(covered, "batch_id", "left")
    else:
        state = state.withColumn("_covered", F.lit(True))
    return (
        state.join(present, "custom_id", "left")
        .withColumn(
            "batch_id",
            F.when(
                F.col("batch_id").isNotNull()
                & F.col("_covered").eqNullSafe(F.lit(True))
                & F.col("_seen").isNull(),
                F.lit(None),
            ).otherwise(F.col("batch_id")),
        )
        .drop("_seen", "_covered")
    )


# --------------------------------------------------------------------------
# reconcile (A1 + J8 label matching)
# --------------------------------------------------------------------------


# Fence repair shared by reconcile() and dead_letters(): the two MUST agree
# on what is parseable or the error ledger and the rollup diverge. (This is
# the oracle-mirrored inline form; functions/json_repair.py holds the fuller
# Arrow-batched repair used by the pandas-UDF queries.)
_FENCE_REPAIR = (
    "IF(startswith(response, '```'), "
    "regexp_replace(regexp_replace(response, '^```json\\n', ''), '\\n```$', ''), response)"
)


def reconcile(completed: DataFrame) -> DataFrame:
    """Parse responses (with JSON repair for fenced payloads), explode the
    found strings, and roll up per (entity, field) as a sorted distinct
    array (A1 set-union semantics)."""
    parsed = completed.select(
        "entity",
        "field",
        F.from_json(F.expr(_FENCE_REPAIR), "array<string>").alias("found"),
    )
    return (
        parsed.select("entity", "field", F.explode_outer("found").alias("item"))
        .groupBy("entity", "field")
        .agg(F.array_sort(F.array_distinct(F.collect_list("item"))).alias("results"))
    )


def dead_letters(completed: DataFrame) -> DataFrame:
    """ST5's error-table path: responses that still fail to parse AFTER
    repair become append-only error rows (the reference writes
    ExtractionError rows and resets the request,
    new_extract_queue_bot.py:228-236 / batch_file_station.py:239-251).
    Keyed by custom_id so the retry job can unpair exactly these."""
    return (
        completed.withColumn("_parsed", F.from_json(F.expr(_FENCE_REPAIR), "array<string>"))
        .where(F.col("response").isNotNull() & F.col("_parsed").isNull())
        .select(
            "custom_id",
            "entity",
            "field",
            F.lit("json_parse_error").alias("error"),
            "response",
        )
    )


def run_extraction_pass(chunks: DataFrame, state: DataFrame | None = None) -> dict[str, DataFrame]:
    """One full orchestrator pass: discover missing -> stub-execute ->
    harvest -> reconcile. Returns the new state and reconciled results.
    Calling it again with the returned state creates zero new requests
    (idempotence — the property SURVEY X4 centers on)."""
    wanted = build_requests(chunks)
    if state is None:
        state = wanted.limit(0).withColumn("response", F.lit(None).cast("string"))
    todo = missing_requests(wanted, state)
    responses = llm_stub_responses(todo)
    new_state = harvest(
        state.unionByName(todo.withColumn("response", F.lit(None).cast("string")), allowMissingColumns=True),
        responses,
    )
    completed = new_state.where(F.col("response").isNotNull())
    return {
        "state": new_state,
        "results": reconcile(completed),
        "errors": dead_letters(completed),
    }
