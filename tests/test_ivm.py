"""Join-view delta algebra: randomized equivalence against recompute."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_etl_pipeline_spark.operators.ivm import join_view_delta, signed


def _feed(spark, pre, post, key, cols):
    """Synthesize a change feed between two versions of a keyed table."""
    rows = []
    pre_d = {r[key]: r for r in pre}
    post_d = {r[key]: r for r in post}
    for k, r in post_d.items():
        if k not in pre_d:
            rows.append((*[r[c] for c in cols], "insert"))
        elif [pre_d[k][c] for c in cols] != [r[c] for c in cols]:
            rows.append((*[pre_d[k][c] for c in cols], "update_preimage"))
            rows.append((*[r[c] for c in cols], "update_postimage"))
    for k, r in pre_d.items():
        if k not in post_d:
            rows.append((*[r[c] for c in cols], "delete"))
    schema = ", ".join(f"{c} long" for c in cols) + ", change_type string"
    return spark.createDataFrame(rows, schema)


def test_randomized_join_delta_equals_recompute(spark):
    rnd = random.Random(42)
    cols_a = ["ak", "attr"]
    cols_b = ["bk", "fk", "val"]
    a0 = [{"ak": i, "attr": i % 5} for i in range(30)]
    b0 = [{"bk": i, "fk": rnd.randrange(30), "val": rnd.randrange(100)} for i in range(80)]
    # random churn on both sides
    a1 = [dict(r, attr=(r["attr"] + 1) % 5) if rnd.random() < 0.3 else dict(r) for r in a0]
    a1 = [r for r in a1 if rnd.random() > 0.1] + [{"ak": 100 + i, "attr": 9} for i in range(3)]
    b1 = [dict(r, val=r["val"] + 500) if rnd.random() < 0.2 else dict(r) for r in b0]
    b1 = [r for r in b1 if rnd.random() > 0.15] + [
        {"bk": 200 + i, "fk": rnd.randrange(30), "val": 777} for i in range(5)
    ]

    mk = lambda rows, cols: spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows], ", ".join(f"{c} long" for c in cols)
    )
    A0, A1 = mk(a0, cols_a), mk(a1, cols_a)
    B0, B1 = mk(b0, cols_b), mk(b1, cols_b)
    dA = _feed(spark, a0, a1, "ak", cols_a)
    dB = _feed(spark, b0, b1, "bk", cols_b)

    delta = join_view_delta(dA, B0, A1, dB, on_a="ak", on_b="fk")
    view = lambda A, B: (
        A.join(B, A["ak"] == B["fk"])
        .groupBy("attr")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("t"))
    )
    mv0 = view(A0, B0)
    dagg = delta.groupBy("attr").agg(
        F.sum("_sign").alias("n"), F.sum(F.col("val") * F.col("_sign")).alias("t")
    )
    maintained = {
        r["attr"]: (r["n"], r["t"])
        for r in mv0.unionByName(dagg)
        .groupBy("attr")
        .agg(F.sum("n").alias("n"), F.sum("t").alias("t"))
        .where(F.col("n") > 0)
        .collect()
    }
    truth = {r["attr"]: (r["n"], r["t"]) for r in view(A1, B1).collect()}
    assert maintained == truth


def test_signed_drops_feed_metadata(spark):
    df = spark.createDataFrame(
        [(1, "insert", 3), (2, "delete", 4)], "k long, change_type string, _commit_version long"
    )
    out = signed(df)
    assert set(out.columns) == {"k", "_sign"}
    assert {r["k"]: r["_sign"] for r in out.collect()} == {1: 1, 2: -1}


class TestVersionedForm:
    """join_view_delta_versioned derives snapshots + feeds from the tables
    and version numbers — the wrong snapshot pairing is inexpressible
    (round-7 verdict item: make ivm_join_view misuse loud)."""

    def _tables(self, spark, tmp_path):
        from data_etl_pipeline_spark.sources.versioned import VersionedTable

        a = VersionedTable(spark, str(tmp_path / "a"))
        b = VersionedTable(spark, str(tmp_path / "b"))
        a.write(spark.createDataFrame([(1, 10), (2, 20)], "ak long, av long"))
        b.write(spark.createDataFrame([(1, 100), (2, 200)], "bk long, bv long"))
        return a, b

    def test_matches_recompute_through_both_tables_changing(self, spark, tmp_path):
        from data_etl_pipeline_spark.operators.ivm import join_view_delta_versioned

        a, b = self._tables(spark, tmp_path)
        v0_view = a.read(version=0).join(b.read(version=0), F.col("ak") == F.col("bk"))
        base = {(r.ak, r.av, r.bk, r.bv) for r in v0_view.collect()}
        # change both sides: update a row in A, insert + delete in B
        a.merge(spark.createDataFrame([(1, 11)], "ak long, av long"), keys=["ak"])
        b.merge(spark.createDataFrame([(3, 300)], "bk long, bv long"), keys=["bk"])
        b.delete_where(F.col("bk") == 2)
        a.merge(spark.createDataFrame([(3, 30)], "ak long, av long"), keys=["ak"])
        delta = join_view_delta_versioned(
            a, b, a_keys=["ak"], b_keys=["bk"], on_a="ak", on_b="bk",
            a_from=0, b_from=0,
        ).collect()
        state = dict()
        for r in delta:
            key = (r.ak, r.av, r.bk, r.bv)
            state[key] = state.get(key, 0) + r._sign
        for key in base:
            state[key] = state.get(key, 0) + 1
        maintained = {k for k, n in state.items() if n > 0}
        assert all(n in (0, 1) for n in state.values()), state
        truth = {
            (r.ak, r.av, r.bk, r.bv)
            for r in a.read().join(b.read(), F.col("ak") == F.col("bk")).collect()
        }
        assert maintained == truth

    def test_backward_version_range_raises(self, spark, tmp_path):
        import pytest

        from data_etl_pipeline_spark.operators.ivm import join_view_delta_versioned

        a, b = self._tables(spark, tmp_path)
        a.merge(spark.createDataFrame([(1, 11)], "ak long, av long"), keys=["ak"])
        with pytest.raises(ValueError, match="must move forward"):
            join_view_delta_versioned(
                a, b, a_keys=["ak"], b_keys=["bk"], on_a="ak", on_b="bk",
                a_from=1, b_from=0, a_to=0,
            )

    def test_projection_drops_ambiguous_columns_before_join(self, spark, tmp_path):
        from data_etl_pipeline_spark.operators.ivm import join_view_delta_versioned

        a, b = self._tables(spark, tmp_path)
        b.merge(spark.createDataFrame([(3, 300)], "bk long, bv long"), keys=["bk"])
        delta = join_view_delta_versioned(
            a, b, a_keys=["ak"], b_keys=["bk"], on_a="ak", on_b="bk",
            a_from=0, b_from=0, b_cols=["bk", "bv"],
        )
        assert set(delta.columns) == {"ak", "av", "bk", "bv", "_sign"}
