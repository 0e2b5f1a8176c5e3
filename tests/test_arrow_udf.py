"""mapInArrow vector stats: edge cases the declared query's fixture
(uniform 64-dim vectors) cannot reach — empty vectors, ragged dims,
all-negative components — plus the recursive-CTE/iterative-closure
cross-check (two independent Spark formulations must agree without
consulting the oracle)."""

from __future__ import annotations

import math

from data_etl_pipeline_spark.operators.similarity import embedding_norms_arrow
from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded


def test_norms_handle_empty_and_ragged_vectors(spark):
    rows = [
        (1, [3.0, 4.0]),          # norm 5, 2 positive
        (2, []),                  # empty: the reduceat guard path
        (3, [-1.0, -2.0, 2.0]),   # norm 3, 1 positive
        (4, [0.0]),               # zero component is NOT positive
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in embedding_norms_arrow(df).collect()}
    assert (got[1]["dim"], got[1]["l2_norm"], got[1]["n_pos"]) == (2, 5.0, 2)
    assert (got[2]["dim"], got[2]["l2_norm"], got[2]["n_pos"]) == (0, 0.0, 0)
    assert (got[3]["dim"], got[3]["l2_norm"], got[3]["n_pos"]) == (3, 3.0, 1)
    assert (got[4]["dim"], got[4]["l2_norm"], got[4]["n_pos"]) == (1, 0.0, 0)


def test_norms_keep_null_vectors_null(spark):
    """A NULL embedding must surface as NULL stats (SQL semantics:
    len(NULL) -> NULL), not silently collapse into the empty-list row
    (0, 0.0, 0) — the validity bitmap is separate from the offsets.

    coalesce(1) is load-bearing: all four rows must share ONE Arrow
    batch so a VALID row immediately precedes a NULL row within the
    batch — the layout where mutating offsets at null slots would make
    the reduceat index array non-monotonic and silently turn the valid
    row's segment sum into a single-element read. Under default test
    parallelism each row lands in its own batch and that layout never
    occurs."""
    rows = [
        (1, [3.0, 4.0]),          # valid row DIRECTLY before a null
        (2, None),                # NULL list: masked, not empty
        (3, [-1.0, 2.0, 2.0]),    # valid row DIRECTLY before a null
        (4, None),                # NULL at the tail
        (5, []),                  # genuinely empty: zeros
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)
    got = {r["vec_id"]: r for r in embedding_norms_arrow(df).collect()}
    assert (got[1]["dim"], got[1]["l2_norm"], got[1]["n_pos"]) == (2, 5.0, 2)
    assert (got[2]["dim"], got[2]["l2_norm"], got[2]["n_pos"]) == (None, None, None)
    assert (got[3]["dim"], got[3]["l2_norm"], got[3]["n_pos"]) == (3, 3.0, 2)
    assert (got[4]["dim"], got[4]["l2_norm"], got[4]["n_pos"]) == (None, None, None)
    assert (got[5]["dim"], got[5]["l2_norm"], got[5]["n_pos"]) == (0, 0.0, 0)


def test_norms_match_python_fold_on_fixture(spark, sf_dir):
    from data_etl_pipeline_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").limit(50)
    got = {r["vec_id"]: r["l2_norm"] for r in embedding_norms_arrow(emb).collect()}
    for row in emb.collect():
        want = round(math.sqrt(sum(float(x) * float(x) for x in row["embedding"])), 6)
        assert math.isclose(got[row["vec_id"]], want, abs_tol=1e-9)


def test_recursive_cte_equals_iterative_closure(spark, sf_dir):
    """Spark-vs-Spark: the native WITH RECURSIVE closure and the iterative
    fixpoint closure are independent engine paths over the same edges —
    they must agree row-for-row without any oracle in the loop."""
    _ensure_loaded()
    sql_rows = {
        (r["node"], r["ancestor"], r["depth"])
        for r in QUERIES["concept_ancestor_closure_sql"].fn(spark, sf_dir).collect()
    }
    iter_rows = {
        (r["node"], r["ancestor"], r["depth"])
        for r in QUERIES["concept_ancestor_closure"].fn(spark, sf_dir).collect()
    }
    assert sql_rows == iter_rows
