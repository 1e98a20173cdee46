"""Scale bench for the graph operators (components, PageRank, co-mention).

Two workloads, both deterministic (no RNG — pure hash functions of ids):

1. connected_components on a uniform random digraph (N nodes, E edges via
   xxhash64 of spark.range ids) — stresses the large-star/small-star
   fixpoint's shuffle rounds at millions of edges.
2. comention_edges + pagerank_fixed_point on the standard 2M-turn scaling
   corpus — the real KG shape (Zipf-ish entity degrees, one giant hairball
   component from shared tool/handle entities).

Usage: python tools/bench_graph.py [n_nodes] [n_edges] [n_convs]
Prints one JSON line; append results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    from pyld_spark.operators.components import connected_components
    from pyld_spark.operators.graph_stats import (
        comention_edges,
        pagerank_fixed_point,
    )
    from pyld_spark.operators.linking import extract_mentions, link_entities
    from pyld_spark.session import ensure_workers_can_import, get_spark
    from pyld_spark.transcripts import synthesize_transcripts

    spark = get_spark("bench_graph")
    spark.sparkContext.setLogLevel("WARN")
    ensure_workers_can_import(spark)
    out: dict = {"metric": "graph_ops_bench", "unit": "sec"}

    # -- workload 1: components on a uniform random digraph ---------------
    edges = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).cast("string").alias("src"),
            F.pmod(F.xxhash64(F.col("id") * 7 + 13), F.lit(n_nodes))
            .cast("string")
            .alias("dst"),
        )
        .localCheckpoint(eager=True)  # exclude generation from the timing
    )
    t0 = time.perf_counter()
    cc = connected_components(edges, src="src", dst="dst")
    n_components = cc.agg(F.countDistinct("component")).collect()[0][0]
    wall_cc = time.perf_counter() - t0
    out["components"] = {
        "nodes": n_nodes,
        "edges": n_edges,
        "n_components": int(n_components),
        "wall_sec": round(wall_cc, 2),
        "edges_per_sec": round(n_edges / wall_cc),
    }

    # -- workload 1b: PageRank throughput on the same random digraph ------
    t0 = time.perf_counter()
    pr_big = pagerank_fixed_point(edges, iters=5)
    pr_big.agg(F.sum("rank_fp")).collect()
    wall_pr_big = time.perf_counter() - t0
    out["pagerank_random_graph"] = {
        "edges": n_edges,
        "iters": 5,
        "wall_sec": round(wall_pr_big, 2),
        "edge_visits_per_sec": round(5 * n_edges / wall_pr_big),
    }

    # -- workload 2: co-mention graph + PageRank on the 2M-turn corpus ----
    t = synthesize_transcripts(
        spark, n_convs=n_convs, turns_per_conv=20, hot_convs=2, hot_turns=2000
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    linked = link_entities(extract_mentions(t))
    ce = comention_edges(linked).localCheckpoint(eager=True)
    n_ce = ce.count()
    wall_edges = time.perf_counter() - t0
    t0 = time.perf_counter()
    pr = pagerank_fixed_point(ce, iters=5)
    top = pr.orderBy(F.desc("rank_fp")).limit(3).collect()
    wall_pr = time.perf_counter() - t0
    out["comention_pagerank"] = {
        "turns": t.count(),
        "comention_edges": int(n_ce),
        "edges_wall_sec": round(wall_edges, 2),
        "pagerank_iters": 5,
        "pagerank_wall_sec": round(wall_pr, 2),
        "pagerank_edge_visits_per_sec": round(5 * n_ce / wall_pr),
        "top_rank_fp": [int(r["rank_fp"]) for r in top],
    }
    # -- workload 3 (round-5 verdict item 6): BGP + OPTIONAL and khop(k=4)
    # on an 8M-triple KG derived from the random digraph: 4 predicates by
    # edge hash, obj_kind='IRI' throughout — the triples-table shape the
    # gate queries use, at graph-bench scale.
    from pyld_spark.operators.kg_query import bgp_match, khop_neighborhood

    triples = (
        edges.select(
            F.col("src").alias("subj"),
            F.concat(F.lit("p:"), F.pmod(F.xxhash64("src", "dst"), F.lit(4))
                     .cast("string")).alias("pred"),
            F.lit("IRI").alias("obj_kind"),
            F.col("dst").alias("obj_value"),
        )
        .localCheckpoint(eager=True)
    )
    _ = triples.count()
    # unconstrained 3-hop path enumeration (~n_edges/4 bindings): the
    # heavy-join shape; a constant-terminated chain on this uniform graph
    # matches ~0 rows and AQE short-circuits it — not a bench
    bgp = bgp_match(
        triples,
        patterns=[("?a", "p:0", "?b"), ("?b", "p:1", "?c"),
                  ("?c", "p:2", "?d")],
        filters=("a < b",),
        optional=[("?a", "p:3", "?e")],
    )
    plan_bgp = bgp._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan_bgp and "BroadcastNestedLoopJoin" not in plan_bgp, plan_bgp
    t0 = time.perf_counter()
    n_bgp = bgp.count()
    wall_bgp = time.perf_counter() - t0
    out["bgp_optional_8m"] = {
        "triples": n_edges,
        "bindings": int(n_bgp),
        "wall_sec": round(wall_bgp, 2),
        "triples_per_sec": round(n_edges / wall_bgp),
        "plan": "no-cartesian/no-BNLJ (asserted)",
    }

    seeds = spark.range(16).select(
        F.pmod(F.xxhash64(F.col("id") + 99), F.lit(n_nodes)).cast("string").alias("node")
    )
    t0 = time.perf_counter()
    kh = khop_neighborhood(triples, seeds, k=4)
    n_kh = kh.count()
    wall_kh = time.perf_counter() - t0
    out["khop4_8m"] = {
        "triples": n_edges,
        "seeds": 16,
        "reached": int(n_kh),
        "wall_sec": round(wall_kh, 2),
        "triples_per_sec": round(n_edges / wall_kh),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
