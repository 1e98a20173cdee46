"""Graph analytics operators: fixed-point PageRank + degrees (graph_stats.py).

Oracles are pure-Python/numpy reimplementations of the documented
semantics: the integer recurrence must match EXACTLY (that is the
operator's whole claim), and the converged ranks must approximate the
textbook float PageRank with the same dangling-drop convention.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyld_spark.operators.graph_stats import (
    comention_edges,
    degree_stats,
    pagerank_fixed_point,
)


def _pagerank_int_oracle(edges, iters, scale=10**9, num=85, den=100):
    """Reference integer recurrence (floor division), plain dicts."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    teleport = (scale * (den - num)) // den
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        nxt = {n: teleport for n in nodes}
        for u, v in edges:
            nxt[v] += (rank[u] * num) // (den * outdeg[u])
        rank = nxt
    return rank


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


GRAPH = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),  # d has no in-edges; e below is dangling
    ("c", "e"),
]


def test_pagerank_matches_integer_oracle_exactly(spark):
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(_edges_df(spark, GRAPH), iters=4).collect()
    }
    assert got == _pagerank_int_oracle(GRAPH, iters=4)


def test_pagerank_approximates_float_pagerank(spark):
    # Converged fixed-point ranks ~ textbook power iteration with dangling
    # mass dropped (same convention), rel. error << rank gaps.
    ranks = {
        r["node"]: r["rank_fp"] / 10**9
        for r in pagerank_fixed_point(_edges_df(spark, GRAPH), iters=40).collect()
    }
    edges = sorted(set(GRAPH))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    pr = {n: 1.0 for n in nodes}
    for _ in range(200):
        nxt = {n: 0.15 for n in nodes}
        for u, v in edges:
            nxt[v] += 0.85 * pr[u] / outdeg[u]
        pr = nxt
    for n in nodes:
        assert ranks[n] == pytest.approx(pr[n], rel=1e-6, abs=1e-6)


def test_pagerank_deterministic_across_partitionings(spark):
    df = _edges_df(spark, GRAPH)
    a = pagerank_fixed_point(df.repartition(7), iters=3).collect()
    b = pagerank_fixed_point(df.repartition(1), iters=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_dedups_edges_and_zero_iters(spark):
    dup = _edges_df(spark, GRAPH + GRAPH)
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(dup, iters=2).collect()
    }
    assert got == _pagerank_int_oracle(GRAPH, iters=2)
    zero = pagerank_fixed_point(_edges_df(spark, GRAPH), iters=0).collect()
    assert {r["rank_fp"] for r in zero} == {10**9}


def test_degree_stats(spark):
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(_edges_df(spark, GRAPH)).collect()
    }
    assert got == {
        "a": (2, 1), "b": (1, 1), "c": (2, 3), "d": (1, 0), "e": (0, 1),
    }


def test_comention_edges(spark):
    linked = spark.createDataFrame(
        [
            ("c1", 0, "E1"), ("c1", 0, "E2"), ("c1", 0, "E2"),  # dup mention
            ("c1", 1, "E1"),                                    # lone mention
            ("c2", 0, "E2"), ("c2", 0, "E3"),
        ],
        "conv_id string, turn_idx int, entity_iri string",
    )
    got = {(r["src"], r["dst"]) for r in comention_edges(linked).collect()}
    assert got == {("E1", "E2"), ("E2", "E1"), ("E2", "E3"), ("E3", "E2")}


def test_triangle_counts_known_graph(spark):
    from pyld_spark.operators.graph_stats import triangle_counts

    # K4 on {a,b,c,d} (4 triangles, each node in 3) plus a pendant edge
    # and a disconnected triangle {x,y,z}
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("x", "y"), ("y", "z"), ("z", "x")]
    # feed both orientations + duplicates: canonicalization must absorb them
    rows = edges + [(b, a) for a, b in edges] + edges[:3]
    df = spark.createDataFrame(rows, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "x": 1, "y": 1, "z": 1}


def test_triangle_counts_matches_brute_force(spark):
    import itertools

    from pyld_spark.operators.graph_stats import triangle_counts

    import numpy as np
    rng = np.random.RandomState(11)
    nodes = [f"n{i}" for i in range(30)]
    edges = {tuple(sorted((nodes[rng.randint(30)], nodes[rng.randint(30)])))
             for _ in range(140)}
    edges = [(a, b) for a, b in edges if a != b]
    eset = set(edges)
    expected = {}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expected


def test_triangle_counts_self_loops_ignored(spark):
    from pyld_spark.operators.graph_stats import triangle_counts

    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"])
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}
