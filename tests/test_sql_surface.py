"""The engine's SQL surface: ANSI-compatible declared queries run as
literal ``spark.sql(...)`` text over registered views and must produce the
same rows as their DataFrame plans — the same SQL text the DuckDB oracle
executes, so these queries are portable across all three surfaces."""

from __future__ import annotations

import math

import pytest

from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded
from data_etl_pipeline_spark.tables import register_views

_ensure_loaded()

# oracle SQL that is ANSI enough to run unchanged on Spark SQL
ANSI_PORTABLE = [
    "pricing_summary",
    "newest_open_orders",
    "returned_items_revenue",
    "returnflag_priority_counts",
    "order_priority_rollup",
    "returnflag_status_cube",
    "brand_supplier_counts",
    "idle_rich_customers",
    "nation_market_share",
    "top_revenue_supplier",
]


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ANSI_PORTABLE)
def test_oracle_sql_runs_on_spark_and_matches_dataframe_plan(spark, sf_dir, name):
    register_views(spark, sf_dir)
    spec = QUERIES[name]
    via_sql = spark.sql(spec.sql)
    via_df = spec.fn(spark, sf_dir)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    sql_rows = _norm(r for r in via_sql.select(*sorted(via_sql.columns)).collect())
    df_rows = _norm(r for r in via_df.select(*sorted(via_df.columns)).collect())
    assert len(sql_rows) == len(df_rows)
    for a, b in zip(sql_rows, df_rows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert x == y
