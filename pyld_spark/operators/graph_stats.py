"""Graph analytics over the constructed KG: fixed-point PageRank + degrees.

No reference analogue (digitalbazaar/pyld stops at document algorithms);
this serves the "graph materialize" output of the north rule — ranking the
canonical entity table by link structure is the first thing a downstream
consumer does with a KG.

Why FIXED-POINT (integer) PageRank and not doubles:

- Distributed float PageRank is not deterministic: `sum(double)` depends on
  partition/merge order, so two runs of the same job can differ in the last
  ulps and a rank near a tie can flip order. At 10^12-row scale with AQE
  re-planning between runs, that makes results non-reproducible.
- Here ranks are BIGINTs in units of ``1/scale``: every contribution is
  ``(rank * damping_num) div (damping_den * out_degree)`` — integer floor
  division — and integer sums are exact and order-independent. The same
  arithmetic replays bit-identically in any SQL engine, which is also what
  makes the DuckDB gate oracle hash-exact.
- Precision: with the default ``scale=10**9`` the rank unit is 1e-9 of one
  node's initial mass; floor-division truncation loses < out_degree units
  per node per iteration — orders of magnitude below rank gaps of interest.
- Overflow headroom: total mass ≤ n_nodes * scale, so BIGINT (< 9.2e18)
  holds up to ~9e9 nodes at the default scale.

Scale design: each iteration is one broadcast-or-shuffle hash join
(ranks ⋈ edges, both keyed on the node id) plus one groupBy(dst) sum with
map-side partial aggregation; lineage is truncated per iteration
(``localCheckpoint``; pass ``reliable=True`` on a real cluster) exactly like
the connected-components fixpoint (components.py). Dangling-node mass is
dropped (documented choice — keeps the recurrence purely local; ranking
order is unaffected for connected corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree) over a directed edge list — exact
    integers, one shuffle per direction, full outer combined."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").cast("bigint").alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").cast("bigint").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    reliable: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list in exact integer arithmetic.

    Returns (node, rank_fp) where ``rank_fp`` is a BIGINT in units of
    ``1/scale`` (initial rank = ``scale`` per node). The recurrence per
    iteration::

        rank'(v) = teleport + sum over in-edges (u, v) of
                   (rank(u) * damping_num) div (damping_den * out_degree(u))
        teleport = (scale * (damping_den - damping_num)) div damping_den

    Deterministic across partitionings, run-to-run, and engines (see module
    docstring). Duplicate edges count once (the edge set is distinct-ed);
    self-loops participate like any edge.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    ).distinct()
    out_deg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("out_degree"))
    ej = e.join(out_deg, "src")  # (src, dst, out_degree), static across iters
    ej = ej.localCheckpoint(eager=True) if not reliable else ej.checkpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    teleport = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.withColumn("rank_fp", F.lit(scale).cast("bigint"))
    contrib_expr = F.expr(
        f"(rank_fp * CAST({damping_num} AS BIGINT)) "
        f"div (CAST({damping_den} AS BIGINT) * out_degree)"
    )
    for _ in range(iters):
        contrib = (
            ej.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst"), contrib_expr.alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(teleport).cast("bigint") + F.coalesce("in_mass", F.lit(0)))
                .cast("bigint")
                .alias("rank_fp"),
            )
        )
        ranks = (
            ranks.localCheckpoint(eager=True)
            if not reliable
            else ranks.checkpoint(eager=True)
        )
    return ranks


def comention_edges(linked: DataFrame) -> DataFrame:
    """Undirected entity co-mention graph from linked mentions: an edge per
    ordered pair of DISTINCT entities mentioned by the same (conv, turn) —
    both orientations, distinct-ed, so PageRank sees a symmetric graph.

    One self-join keyed on the (conv, turn) pair; the per-turn distinct
    entity list is tiny (a turn mentions a handful of entities), so the
    join fans out per-turn, never per-corpus."""
    per_turn = linked.select("conv_id", "turn_idx", "entity_iri").distinct()
    a = per_turn.alias("a")
    b = per_turn.alias("b")
    return (
        a.join(
            b,
            (F.col("a.conv_id") == F.col("b.conv_id"))
            & (F.col("a.turn_idx") == F.col("b.turn_idx"))
            & (F.col("a.entity_iri") != F.col("b.entity_iri")),
        )
        .select(
            F.col("a.entity_iri").alias("src"),
            F.col("b.entity_iri").alias("dst"),
        )
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    The standard two-join relational formulation: canonicalize each edge
    to (lo, hi) with lo < hi and dedupe (so each undirected edge exists
    once), build wedges a<b<c by joining on the middle node, then close
    each wedge against the canonical edge set with an (a, c) equi-join.
    Every triangle {a, b, c} is produced exactly once (as its sorted
    orientation), then exploded to credit each member node.

    Scale shape: two shuffled equi-joins + one aggregation, all keyed —
    no theta joins, nothing driver-side. Wedge fan-out concentrates on
    high-degree middle nodes (inherent to triangle enumeration); AQE skew
    splitting applies to the wedge join, and the canonical-orientation
    trick halves both join inputs versus the naive symmetric encoding.
    Output: (node, n_triangles) for nodes in ≥1 triangle.
    """
    canon = edges.select(
        F.least(F.col(src), F.col(dst)).alias("lo"),
        F.greatest(F.col(src), F.col(dst)).alias("hi"),
    ).filter(F.col("lo") != F.col("hi")).distinct()

    # Degree-ordered orientation (compact-forward): re-orient every canonical
    # edge from its lower-(degree, id) endpoint to its higher one and build
    # wedges as pairs of OUT-edges of the low vertex. Any total order
    # enumerates each triangle exactly once, so the output is identical to
    # the id-ordered formulation — but with id order the wedge fan-out is
    # sum(deg^2) over MIDDLE nodes, which explodes on co-mention hubs
    # (82 s at sf0.1); with degree order the out-degree of every vertex is
    # O(sqrt(m)) amortized, the standard bound. The degree table is one row
    # per node (the optimizer auto-broadcasts it while it fits; at larger
    # |V| these stay keyed equi-joins — no forced hint); both remaining
    # joins stay keyed equi-joins. Measured sf0.1 entity_triangles:
    # 82.3 -> ~3 s.
    deg = (
        canon.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("_deg"))
    )
    with_deg = (
        canon.join(deg.withColumnRenamed("node", "lo"), "lo")
        .withColumnRenamed("_deg", "_dlo")
        .join(deg.withColumnRenamed("node", "hi"), "hi")
        .withColumnRenamed("_deg", "_dhi")
    )
    lo_first = F.struct(F.col("_dlo"), F.col("lo")) < F.struct(F.col("_dhi"), F.col("hi"))
    directed = with_deg.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("_dhi")).otherwise(F.col("_dlo")).alias("_dv"),
    )
    w1 = directed.select(F.col("u"), F.col("v").alias("b"), F.col("_dv").alias("_db"))
    w2 = directed.select(F.col("u"), F.col("v").alias("c"), F.col("_dv").alias("_dc"))
    wedges = (
        w1.join(w2, "u")
        .filter(F.struct(F.col("_db"), F.col("b")) < F.struct(F.col("_dc"), F.col("c")))
        .select(F.col("u").alias("a"), "b", "c")
    )
    closing = directed.select(F.col("u").alias("b"), F.col("v").alias("c"))
    triangles = wedges.join(closing, ["b", "c"])

    member = triangles.select(
        F.explode(F.array("a", "b", "c")).alias("node"))
    return member.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))
