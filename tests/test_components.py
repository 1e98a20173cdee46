"""Connected-components operator (large-star/small-star DataFrame fixpoint)
vs a pure-Python union-find ground truth."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pyld_spark.operators.components import connected_components, dedup_clusters


def _union_find_labels(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _spark_labels(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_random_graphs_match_union_find(spark):
    # 12 random graphs fused into ONE fixpoint run: node ids are prefixed
    # with the trial id, so components can never cross trials and a single
    # connected_components call certifies all of them (12 sequential
    # fixpoints would each pay the per-round job overhead).
    rng = random.Random(41)
    all_edges, expected = [], {}
    for trial in range(12):
        n = rng.randint(5, 60)
        nodes = [f"t{trial:02d}n{i:03d}" for i in range(n)]
        m = rng.randint(1, 2 * n)
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        labels = _union_find_labels(nodes, edges)
        touched = {a for e in edges for a in e}
        expected.update({n: labels[n] for n in touched})
        all_edges.extend(edges)
    got = _spark_labels(spark, all_edges)
    assert got == expected


def test_long_chain_converges(spark):
    # Path graph of 64 nodes: worst case for naive label propagation
    # (diameter 63); the star algorithm must finish in O(log n) rounds.
    nodes = [f"c{i:03d}" for i in range(64)]
    edges = list(zip(nodes, nodes[1:]))
    got = _spark_labels(spark, edges)
    assert set(got.values()) == {"c000"}
    assert len(got) == 64


def test_star_and_cycle_and_selfloop(spark):
    edges = (
        [("hub", f"s{i}") for i in range(10)]          # star
        + [("x1", "x2"), ("x2", "x3"), ("x3", "x1")]   # cycle
        + [("iso", "iso")]                             # self-loop only
        + [("dup1", "dup2"), ("dup2", "dup1")]         # duplicate both ways
    )
    got = _spark_labels(spark, edges)
    assert got["hub"] == "hub" and all(got[f"s{i}"] == "hub" for i in range(10))
    assert got["x1"] == got["x2"] == got["x3"] == "x1"
    assert "iso" not in got  # self-loops are dropped, node never materializes
    assert got["dup1"] == got["dup2"] == "dup1"


def test_dedup_clusters_covers_singletons(spark):
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(8)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [("d1", "d3"), ("d3", "d5"), ("d2", "d6")], ["doc_a", "doc_b"]
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    for d in ("d1", "d3", "d5"):
        assert rows[d]["cluster_id"] == "d1" and rows[d]["cluster_size"] == 3
    for d in ("d2", "d6"):
        assert rows[d]["cluster_id"] == "d2" and rows[d]["cluster_size"] == 2
    for d in ("d0", "d4", "d7"):
        assert rows[d]["cluster_id"] == d and rows[d]["cluster_size"] == 1
        assert rows[d]["is_duplicate"] is False
    assert rows["d3"]["is_duplicate"] is True and rows["d1"]["is_duplicate"] is False


def test_gate_query_matches_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    sdf = entry.queries()["dedup_clusters"](spark, sf).orderBy("doc_id")
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    oracle = con.execute(
        entry.oracle_sql()["dedup_clusters"] + " ORDER BY doc_id"
    ).fetchall()
    assert spark_rows == oracle
