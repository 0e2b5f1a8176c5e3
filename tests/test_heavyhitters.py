"""Misra-Gries nomination guarantee and exactness of the two-pass
heavy-hitter operator."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from data_etl_pipeline_spark.operators.heavyhitters import (
    heavy_hitters,
    misra_gries_candidates,
)


def _zipf_stream(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    # heavy head + long tail of singletons
    items = []
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            items.append("alpha")
        elif r < 0.45:
            items.append("beta")
        elif r < 0.52:
            items.append("gamma")
        else:
            items.append(f"tail{rng.randrange(n)}")
    return items


class TestHeavyHitters:
    def test_matches_exact_counts(self, spark):
        stream = _zipf_stream(5000, seed=7)
        df = spark.createDataFrame([(s,) for s in stream], "item string").repartition(8)
        support = 0.05
        got = {r["item"]: (r["cnt"], r["share"]) for r in
               heavy_hitters(df, "item", support).collect()}
        counts = Counter(stream)
        total = len(stream)
        import math
        want = {i: c for i, c in counts.items() if c >= math.ceil(support * total)}
        assert set(got) == set(want)
        for i, c in want.items():
            assert got[i][0] == c
            assert got[i][1] == round(c / total, 6)

    def test_candidates_are_superset_of_heavy(self, spark):
        # adversarial order: all heavy items first, then a flood of tail —
        # the decrement storm must not evict a true heavy hitter's claim
        stream = ["hot"] * 400 + [f"t{i}" for i in range(3600)]
        random.Random(3).shuffle(stream)
        df = spark.createDataFrame([(s,) for s in stream], "item string").repartition(4)
        k = 10  # guarantees count > N/(k+1) = 4000/11 ~ 364 survives
        # filter the NULL _prows sentinel rows — they are totals, not items
        cand = {
            r["item"]
            for r in misra_gries_candidates(df, "item", k).collect()
            if r["item"] is not None
        }
        assert "hot" in cand

    def test_candidate_count_bounded_by_k_per_partition(self, spark):
        stream = [f"u{i}" for i in range(10_000)]  # all distinct: worst case
        df = spark.createDataFrame([(s,) for s in stream], "item string").repartition(5)
        k = 7
        summary = misra_gries_candidates(df, "item", k)
        # the k-per-partition bound applies to REAL candidates only; each
        # partition also emits one NULL-item sentinel row carrying _prows
        n_cand = summary.where("item IS NOT NULL").count()
        assert n_cand <= k * 5
        n_sentinel = summary.where("item IS NULL").count()
        assert 1 <= n_sentinel <= 5

    def test_parameter_validation(self, spark):
        df = spark.createDataFrame([("x",)], "item string")
        with pytest.raises(ValueError, match="support"):
            heavy_hitters(df, "item", 0.0)
        with pytest.raises(ValueError, match="k must"):
            misra_gries_candidates(df, "item", 0)

    def test_non_string_item_domain(self, spark):
        stream = [1] * 50 + list(range(100, 200))
        df = spark.createDataFrame([(s,) for s in stream], "item long").repartition(3)
        got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", 0.2).collect()}
        assert got == {1: 50}
