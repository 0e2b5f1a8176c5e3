"""Behavioral invariants for the round-4 session operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.dedup import (
    min_label_clusters,
    repeated_substring_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_are_fully_covered_spans(spark):
    text = " ".join(f"w{i}" for i in range(20))
    out = {
        r.doc_id: r
        for r in repeated_substring_spans(
            _docs(spark, [(1, text), (2, text)]), k=8
        ).collect()
    }
    for d in (1, 2):
        assert out[d].n_dup_spans == 1
        assert out[d].dup_words == 20
        assert out[d].dup_frac == 1.0


def test_disjoint_vocabularies_have_no_spans(spark):
    a = " ".join(f"a{i}" for i in range(20))
    b = " ".join(f"b{i}" for i in range(20))
    out = repeated_substring_spans(_docs(spark, [(1, a), (2, b)]), k=8).collect()
    assert all(r.n_dup_spans == 0 and r.dup_words == 0 for r in out)


def test_shared_middle_yields_one_exact_span(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    a = " ".join(f"a{i}" for i in range(6)) + " " + shared + " " + " ".join(f"x{i}" for i in range(6))
    b = " ".join(f"b{i}" for i in range(6)) + " " + shared + " " + " ".join(f"y{i}" for i in range(6))
    out = {r.doc_id: r for r in repeated_substring_spans(_docs(spark, [(1, a), (2, b)]), k=8).collect()}
    for d in (1, 2):
        assert out[d].n_dup_spans == 1
        assert out[d].dup_words == 8  # exactly the shared 8-gram, coalesced


def test_short_docs_survive_with_zero_spans(spark):
    out = repeated_substring_spans(_docs(spark, [(1, "only three words"), (2, "only three words")]), k=8).collect()
    assert {(r.doc_id, r.n_dup_spans) for r in out} == {(1, 0), (2, 0)}


def test_min_label_clusters_propagates_along_chains(spark):
    """A pure chain (worst-case diameter, no cliques) must still converge
    to the global minimum label."""
    n = 9
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels = {r.doc_id: r.cluster for r in min_label_clusters(nodes, edges).collect()}
    assert labels == {i: 0 for i in range(n)}


def test_min_label_clusters_keeps_singletons_self_labeled(spark):
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    labels = {r.doc_id: r.cluster for r in min_label_clusters(nodes, edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 3}


def test_weighted_sample_with_k_over_n_returns_everything(spark):
    from data_etl_pipeline_spark.operators.mixture import weighted_sample_topk

    df = spark.createDataFrame([(i, i + 1) for i in range(10)], "doc_id long, w long")
    out = weighted_sample_topk(df, weight_col="w", k=100)
    assert out.count() == 10


def test_nb_classifier_is_deterministic_across_runs(spark, sf_dir):
    from data_etl_pipeline_spark.operators.nbayes import train_score_nb
    from data_etl_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    a = sorted(tuple(r) for r in train_score_nb(docs).collect())
    b = sorted(tuple(r) for r in train_score_nb(docs).collect())
    assert a == b


def test_training_shards_are_hash_balanced(spark, sf_dir):
    """Hash assignment must spread token mass across output shards without
    coordination: no empty shard, and no shard more than ~2x the mean."""
    import __spark_entry__ as e

    df = e.queries()["training_shard_manifest"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 16
    masses = [r.n_tokens for r in rows]
    mean = sum(masses) / len(masses)
    assert min(masses) > 0
    assert max(masses) < 2 * mean, (max(masses), mean)


def test_hll_estimates_stay_within_bound(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.queries()["hll_incremental_distinct"](spark, sf_dir).collect()
    assert len(rows) >= 2  # per-day rows + the corpus-total row
    assert all(r.within_5pct for r in rows)
    assert any(r.day is None for r in rows)  # total row present


def test_profile_handles_all_null_and_mixed_columns(spark):
    from data_etl_pipeline_spark.operators.profile import check_constraints, profile

    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, "x"), (3, None, None)],
        "id long, dead string, tag string",
    )
    prof = {r.col_name: r for r in profile(df, ["id", "dead", "tag"]).collect()}
    assert prof["dead"].n_null == 3
    assert prof["dead"].n_distinct == 0
    assert prof["dead"].top_value is None and prof["dead"].top_count is None
    assert prof["tag"].top_value == "x" and prof["tag"].top_count == 2
    assert prof["tag"].n_null == 1
    assert prof["id"].n_distinct == 3 and prof["id"].min_value == "1"

    checks = check_constraints(
        profile(df, ["id", "dead"]),
        [
            {"column": "id", "kind": "unique"},
            {"column": "dead", "kind": "not_null", "max_null_rate": 0.5},
        ],
    ).collect()
    got = {(r.col_name, r.kind): r.passed for r in checks}
    assert got[("id", "unique")] is True
    assert got[("dead", "not_null")] is False


def test_pagerank_sink_gains_rank_and_mass_is_conserved_modulo_truncation(spark):
    from data_etl_pipeline_spark.operators.hierarchy import pagerank_fixed_point

    # star graph: many sources point at one hub -> hub must dominate
    edges = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(5)] + [("hub", "out")],
        "src string, dst string",
    )
    ranks = {r.node: r.rank_micro for r in pagerank_fixed_point(edges, iterations=3).collect()}
    # sources have no in-edges: they decay to the base; hub and its
    # downstream node accumulate their mass
    assert ranks["hub"] > ranks["s0"]
    assert ranks["out"] > ranks["s0"]
    assert ranks["s0"] == ranks["s4"] == 150_000  # pure-source fixpoint
    assert all(v >= 150_000 for v in ranks.values())  # base mass floor


def test_degenerate_inputs_fail_loudly_or_empty_cleanly(spark):
    """Empty/degenerate inputs: gates must refuse vacuous passes, trainers
    must name the problem, and pure transforms must return empty."""
    import pytest

    from data_etl_pipeline_spark.operators.mixture import weighted_sample_topk
    from data_etl_pipeline_spark.operators.nbayes import train_score_nb
    from data_etl_pipeline_spark.operators.profile import check_constraints, profile

    empty_docs = spark.createDataFrame([], "doc_id long, text string")

    # empty table -> empty profile -> the constraint gate must NOT pass
    with pytest.raises(ValueError, match="vacuously"):
        check_constraints(
            profile(empty_docs, ["doc_id"]), [{"column": "doc_id", "kind": "unique"}]
        )
    # wrong column name is the same trap
    nonempty = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vacuously"):
        check_constraints(
            profile(nonempty, ["text"]), [{"column": "txet", "kind": "unique"}]
        )

    # one-class corpus -> NB must name the degenerate split, not crash in math
    one_class = spark.createDataFrame(
        [(i, "scan table row") for i in range(1, 10)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="degenerate training split"):
        train_score_nb(one_class, label_word="scan")

    # pure transforms: empty in, empty out
    from data_etl_pipeline_spark.operators.dedup import repeated_substring_spans

    assert repeated_substring_spans(empty_docs).count() == 0
    e2 = spark.createDataFrame([], "doc_id long, w long")
    assert weighted_sample_topk(e2, weight_col="w", k=5).count() == 0


def test_transitive_closure_dedups_diamond_paths(spark):
    from data_etl_pipeline_spark.operators.hierarchy import transitive_closure

    # diamond: a->b->d and a->c->d — (a, d) must appear exactly ONCE
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        "child string, parent string",
    )
    rows = transitive_closure(edges).collect()
    pairs = [(r.node, r.ancestor) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate closure rows"
    got = {(r.node, r.ancestor): r.depth for r in rows}
    assert got[("a", "d")] == 2
    assert got[("a", "e")] == 3


def test_transitive_closure_depth_cap_is_loud_not_truncating(spark):
    """A hierarchy deeper than max_depth must RAISE — silently returning
    a truncated closure diverges from the unbounded recursive-CTE oracle
    with no signal; a hierarchy of EXACTLY max_depth completes."""
    import pytest

    from data_etl_pipeline_spark.operators.hierarchy import transitive_closure

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(8)], "child string, parent string"
    )
    # depth exactly 8 (n0 -> n8): completes at max_depth=8 with the full
    # closure (8 + 7 + ... + 1 pairs)
    rows = transitive_closure(chain, max_depth=8).collect()
    assert len(rows) == 8 * 9 // 2
    assert {r.depth for r in rows} == set(range(1, 9))

    with pytest.raises(RuntimeError, match="exceeded max_depth"):
        transitive_closure(chain, max_depth=7)
