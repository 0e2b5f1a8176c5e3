"""Physical-plan introspection helpers for runtime-contract queries.

Several declared queries assert *how* Spark executed them, not just what
they returned — bucketed zero-shuffle joins, AQE broadcast conversion,
AQE skew splits, dynamic partition pruning, exchange reuse, and
ReadSchema/PushedFilters pruning proofs. Those assertions all read the
physical plan through the JVM handle (``df._jdf``), which exists ONLY in
a classic (in-process JVM) SparkSession.

SPARK CONNECT BOUNDARY: under Spark Connect (the default client mode for
many Spark 4 deployments) the DataFrame is a thin proto client and has
no ``_jdf``; the equivalent surface is ``df.explain(...)`` text capture,
which Connect serves remotely, but the *executed* adaptive plan of an
already-collected DataFrame is not reachable at all. Every
runtime-contract query therefore requires a classic session, and fails
loudly here (rather than with an AttributeError deep in a query) when
run under Connect. The data-path of every query is Connect-compatible;
only the plan ASSERTIONS are classic-only. See SCALE.md ("Spark Connect
boundary") for the full list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CONNECT_MSG = (
    "plan introspection needs a classic SparkSession: under Spark Connect "
    "there is no JVM handle (df._jdf) and the executed adaptive plan is "
    "not client-visible. The query's data path runs under Connect; only "
    "this plan assertion is classic-session-only (SCALE.md: 'Spark "
    "Connect boundary')."
)


def _jdf(df: DataFrame):
    jdf = getattr(df, "_jdf", None)
    if jdf is None:
        raise NotImplementedError(_CONNECT_MSG)
    return jdf


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The pre-execution plan in ``explain(mode)`` form — use for static
    assertions (join strategy chosen, ReadSchema, PushedFilters)."""
    jvm = df.sparkSession._jvm  # None under Connect
    if jvm is None:
        raise NotImplementedError(_CONNECT_MSG)
    return jvm.PythonSQLUtils.explainString(_jdf(df).queryExecution(), mode)


def optimized_plan(df: DataFrame) -> str:
    """The post-optimizer LOGICAL plan — where optimizer-injected
    constructs invisible to the physical explain (e.g. Bloom-filter
    ``might_contain`` runtime filters) are asserted."""
    return _jdf(df).queryExecution().optimizedPlan().toString()


def executed_plan(df: DataFrame) -> str:
    """The FINAL physical plan after the DataFrame has run — the only
    place AQE's runtime decisions (broadcast conversion, skew splits,
    reused exchanges, DPP subqueries) are visible. Call after an action."""
    return _jdf(df).queryExecution().executedPlan().toString()


def read_schema(df: DataFrame) -> str:
    """The columns the scan actually reads (``ReadSchema: struct<...>``),
    '' if the plan has no file scan — use for column-pruning proofs."""
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    return m.group(1) if m else ""
