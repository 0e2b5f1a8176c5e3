"""BM25 search: relevance ordering, index shape, top-k plan."""

from __future__ import annotations

import pytest

from data_etl_pipeline_spark.operators.search import (
    bm25_search,
    build_postings,
    doc_lengths,
)
from data_etl_pipeline_spark.plans.planassert import formatted_plan


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "dogs chase the cat and the cat runs"),
        (3, "completely unrelated text about spark engines"),
        (4, "cat cat cat cat"),  # high tf, short doc
        (5, "a very long document about many things including one cat "
            + "filler " * 50),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_relevance_ordering(corpus):
    got = bm25_search(corpus, ["cat"], topk=5).collect()
    ids = [r["doc_id"] for r in got]
    # docs without the term never appear
    assert 3 not in ids
    # tf-dense short doc outranks the one-mention long doc (length norm)
    assert ids.index(4) < ids.index(5)
    # ranks dense from 1
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_multi_term_sums_evidence(corpus):
    one = {r["doc_id"]: r["score"] for r in bm25_search(corpus, ["cat"], topk=5).collect()}
    two = {r["doc_id"]: r["score"] for r in bm25_search(corpus, ["cat", "dogs"], topk=5).collect()}
    # doc 2 has both terms: adding a matching term can only raise its score
    assert two[2] > one[2]
    # a doc without the extra term keeps its single-term score
    assert two[4] == one[4]


def test_postings_shape(corpus):
    postings = build_postings(corpus)
    p = {(r["term"], r["doc_id"]): r["tf"] for r in postings.collect()}
    assert p[("cat", 4)] == 4
    assert p[("cat", 1)] == 1
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(postings).collect()}
    assert dl[4] == 4
    # single-character tokens are dropped by the tokenizer
    assert ("a", 5) not in p


def test_persisted_postings_skip_tokenize(corpus):
    # querying a supplied index must produce identical results to the
    # one-shot path (the persisted-index seam)
    postings = build_postings(corpus).localCheckpoint(eager=True)
    via_index = {(r["doc_id"], r["score"]) for r in
                 bm25_search(corpus, ["cat"], postings=postings).collect()}
    one_shot = {(r["doc_id"], r["score"]) for r in
                bm25_search(corpus, ["cat"]).collect()}
    assert via_index == one_shot


def test_topk_plan_takeordered(corpus):
    out = bm25_search(corpus, ["cat"], topk=3)
    plan = formatted_plan(out)
    # the corpus-wide ordering must collapse to TakeOrderedAndProject —
    # never a full global sort feeding the bounded rank window
    assert "TakeOrderedAndProject" in plan


def test_empty_query_refused(corpus):
    with pytest.raises(ValueError, match="at least one"):
        bm25_search(corpus, [])


def test_persisted_index_probe_plan_has_no_tokenize(spark, corpus, tmp_path):
    # the stored-index search must not re-tokenize the corpus: no regexp
    # split expression anywhere in the probe plan (the n_docs count scans
    # docs, but only as a narrow count)
    from data_etl_pipeline_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "bm25idx"))
    t.write(build_postings(corpus), cluster_by=["term"])
    out = bm25_search(corpus, ["cat"], topk=3, postings=t.read())
    plan = formatted_plan(out)
    assert "split(lower(" not in plan
    got = {r["doc_id"] for r in out.collect()}
    want = {r["doc_id"] for r in bm25_search(corpus, ["cat"], topk=3).collect()}
    assert got == want


def test_refresh_postings_handles_updates_and_refuses_big_batches(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from data_etl_pipeline_spark.operators.search import (
        build_postings,
        refresh_postings,
    )
    from data_etl_pipeline_spark.sources.versioned import VersionedTable

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    idx = VersionedTable(spark, str(tmp_path / "pidx"))
    idx.write(build_postings(docs))
    # an UPDATE: doc 2's text changes entirely -> its old postings must
    # die and the new ones appear
    changes = spark.createDataFrame(
        [
            (2, "beta gamma", "update_preimage"),
            (2, "epsilon zeta", "update_postimage"),
            (3, "gamma delta", "delete"),
        ],
        "doc_id long, text string, change_type string",
    )
    refresh_postings(idx, changes)
    want = build_postings(
        spark.createDataFrame(
            [(1, "alpha beta"), (2, "epsilon zeta")], "doc_id long, text string"
        )
    )
    got = {(r.term, r.doc_id, r.tf) for r in idx.read().collect()}
    assert got == {(r.term, r.doc_id, r.tf) for r in want.collect()}

    # past the changed-doc bound: refuse, recommend a rebuild
    big = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit("delete").alias("change_type"),
    )
    with pytest.raises(ValueError, match="rebuild"):
        refresh_postings(idx, big, max_changed_docs=3)


class TestRrfFuse:
    def _rank(self, spark, rows):
        return spark.createDataFrame(rows, "q_id long, doc_id long, rank long")

    def test_fuses_and_ranks_by_reciprocal_sum(self, spark):
        from data_etl_pipeline_spark.operators.search import rrf_fuse

        sem = self._rank(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
        lex = self._rank(spark, [(0, 11, 1), (0, 13, 2)])
        got = {r["doc_id"]: (r["rank"], r["rrf_score"])
               for r in rrf_fuse([sem, lex], k=10).collect()}
        # doc 11 appears in both lists -> highest fused score
        assert got[11][0] == 1
        assert got[11][1] == round(1 / 62 + 1 / 61, 6)
        # docs present in one list only still score
        assert got[10][1] == round(1 / 61, 6)
        assert got[13][1] == round(1 / 62, 6)
        assert got[12][1] == round(1 / 63, 6)

    def test_score_ties_break_on_doc_id(self, spark):
        from data_etl_pipeline_spark.operators.search import rrf_fuse

        sem = self._rank(spark, [(0, 20, 1), (0, 5, 2)])
        lex = self._rank(spark, [(0, 5, 1), (0, 20, 2)])
        rows = sorted(rrf_fuse([sem, lex], k=2).collect(), key=lambda r: r["rank"])
        # both docs score 1/61 + 1/62 — smaller doc_id must rank first
        assert [r["doc_id"] for r in rows] == [5, 20]

    def test_requires_two_rankings(self, spark):
        import pytest

        from data_etl_pipeline_spark.operators.search import rrf_fuse

        with pytest.raises(ValueError, match="at least two"):
            rrf_fuse([self._rank(spark, [(0, 1, 1)])])

    def test_three_system_fusion(self, spark):
        from data_etl_pipeline_spark.operators.search import rrf_fuse

        a = self._rank(spark, [(0, 1, 1)])
        b = self._rank(spark, [(0, 1, 2)])
        c = self._rank(spark, [(0, 2, 1)])
        got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([a, b, c], k=5).collect()}
        assert got[1] == round(1 / 61 + 1 / 62, 6)
        assert got[2] == round(1 / 61, 6)


class TestJaccardTopk:
    def test_ranks_by_exact_jaccard(self, spark):
        from data_etl_pipeline_spark.operators.dedup import jaccard_topk

        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps"),       # query
                (1, "the quick brown fox sleeps"),      # 2 shared 3-grams
                (2, "the quick brown cat jumps"),       # 1 shared
                (3, "completely different text here now"),  # 0 shared
            ],
            "doc_id long, text string",
        )
        rows = jaccard_topk(docs, n_queries=1, k=3).collect()
        ranked = {r["rank"]: r["doc_id"] for r in rows}
        assert ranked[1] == 1 and ranked[2] == 2
        assert all(r["doc_id"] != 0 for r in rows)  # never self-matches
        assert 3 not in {r["doc_id"] for r in rows}  # zero overlap never appears
        j = {r["doc_id"]: r["jaccard"] for r in rows}
        assert j[1] == round(2 / 4, 6)  # 3 shingles each, 2 shared
        assert j[2] == round(1 / 5, 6)

    def test_query_without_shingles_ranks_nothing(self, spark):
        from data_etl_pipeline_spark.operators.dedup import jaccard_topk

        docs = spark.createDataFrame(
            [(0, "too short"), (1, "a longer document with words")],
            "doc_id long, text string",
        )
        assert jaccard_topk(docs, n_queries=1, k=3).collect() == []


def test_jaccard_topk_honors_custom_id_col(spark):
    # round-7 review fix: shingles() canonicalizes the id to doc_id; a
    # non-default id_col used to raise an unresolved-column error
    from data_etl_pipeline_spark.operators.dedup import jaccard_topk

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "the quick brown fox sleeps"),
            (2, "unrelated words entirely here now"),
        ],
        "vec_id long, text string",
    )
    rows = jaccard_topk(docs, n_queries=1, k=2, id_col="vec_id").collect()
    assert rows and rows[0].asDict().keys() >= {"q_id", "vec_id", "jaccard", "rank"}
    assert {r["vec_id"] for r in rows} == {1}
