"""Degree-oriented triangle counting: the orientation must count every
triangle exactly once, at exactly one corner.

The declared query's DuckDB oracle mirrors the canonical u<v triple-join
formulation; this test goes one step more independent — a pure-Python
brute force over an adversarial fixture graph (a clique, a star whose hub
is ALSO in the clique, a chain, and an isolated edge) chosen to stress
the (degree, id) orientation: the hub has max degree, so every hub edge
is oriented TOWARD it and hub wedges must come from its low-degree
neighbors, the exact case where naive enumeration piles work on the hub.
"""

from __future__ import annotations

from itertools import combinations

from data_etl_pipeline_spark.operators.hierarchy import triangle_counts


def _fixture_edges():
    edges = set()
    clique = [0, 1, 2, 3, 4]
    edges.update((a, b) for a, b in combinations(clique, 2))
    hub = 0  # star hub inside the clique: degree 4 (clique) + 6 (star)
    edges.update((min(hub, s), max(hub, s)) for s in range(10, 16))
    edges.update((i, i + 1) for i in range(20, 25))  # chain: no triangles
    edges.add((30, 31))  # isolated edge
    # one extra triangle hanging off the star so two star spokes close
    edges.add((10, 11))
    return sorted(edges)


def _brute_force(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts: dict[int, int] = {}
    nodes = sorted(adj)
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_matches_brute_force_on_adversarial_graph(spark):
    edges = _fixture_edges()
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _brute_force(edges)


def test_total_is_three_times_triangle_count(spark):
    """Sum of per-node credits == 3 * number of triangles (each triangle
    credits exactly its three corners — i.e. found exactly once)."""
    edges = _fixture_edges()
    df = spark.createDataFrame(edges, "u long, v long")
    total = sum(r["n_triangles"] for r in triangle_counts(df).collect())
    n_tri = sum(_brute_force(edges).values()) // 3
    assert total == 3 * n_tri


def test_duplicate_and_reversed_edges_are_normalized(spark):
    """The operator canonicalizes input: only u<v rows are kept and
    duplicates dropped, so feeding both directions must not change
    anything (reversed rows fail u<v and are the duplicates' mirror)."""
    edges = _fixture_edges()
    doubled = edges + [(v, u) for u, v in edges] + edges[:5]
    df = spark.createDataFrame(doubled, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _brute_force(edges)
