"""Round-6 optimization pins: operators whose internals were restructured for
performance must emit exactly what the round-5 formulations emitted.

- triangle_counts: degree-ordered (compact-forward) orientation vs the old
  id-ordered wedge join — same per-node triangle counts on random graphs
  with duplicate / reversed / self-loop edges.
- simhash_near_pairs_md5: packed xor+bit_count Hamming + dedup-before-
  distance vs the old interpreted per-pair aggregate — same pair set.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from pyld_spark.operators.dedup import simhash_near_pairs_md5, simhash_signatures_md5
from pyld_spark.operators.graph_stats import triangle_counts


def _old_triangle_counts(edges, src="src", dst="dst"):
    """The round-5 formulation, kept verbatim as the differential oracle."""
    canon = edges.select(
        F.least(F.col(src), F.col(dst)).alias("lo"),
        F.greatest(F.col(src), F.col(dst)).alias("hi"),
    ).filter(F.col("lo") != F.col("hi")).distinct()
    e1 = canon.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = canon.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b")
    e3 = canon.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    triangles = wedges.join(e3, ["a", "c"])
    member = triangles.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return member.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def _old_simhash_near_pairs_md5(signatures, id_col="doc_id", max_hamming=16):
    """Round-5 formulation: interpreted per-candidate-pair Hamming."""
    from pyld_spark.operators.dedup import _hamming_block_offsets

    offsets = _hamming_block_offsets(64, max_hamming + 1)
    blocks = F.array(
        *[F.substring(F.col("simbits"), o + 1, ln) for o, ln in offsets]
    )
    blocked = signatures.select(
        F.col(id_col).alias("doc"), F.col("simbits"),
        F.posexplode(blocks).alias("block_idx", "block_val"),
    )
    a = blocked.select(
        F.col("doc").alias("doc_a"), F.col("simbits").alias("sim_a"),
        "block_idx", "block_val",
    )
    b = blocked.select(
        F.col("doc").alias("doc_b"), F.col("simbits").alias("sim_b"),
        "block_idx", "block_val",
    )
    hamming = F.expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> acc + "
        "CASE WHEN substring(sim_a, i, 1) = substring(sim_b, i, 1) "
        "THEN 0 ELSE 1 END)"
    ).cast("bigint")
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_triangle_counts_matches_round5_formulation(spark, seed):
    rnd = random.Random(seed)
    n = rnd.choice([5, 12, 30, 60])
    p = rnd.choice([0.1, 0.3, 0.6])
    edges = [
        (f"n{i}", f"n{j}")
        for i in range(n)
        for j in range(n)
        if i != j and rnd.random() < p
    ]
    edges += edges[:5] + [(b, a) for a, b in edges[:5]] + [("n0", "n0")]
    if not edges:
        edges = [("n0", "n1")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    new = sorted(tuple(r) for r in triangle_counts(df).collect())
    old = sorted(tuple(r) for r in _old_triangle_counts(df).collect())
    assert new == old


@pytest.mark.parametrize("max_hamming", [3, 16])
def test_simhash_pairs_md5_matches_round5_formulation(spark, max_hamming):
    rnd = random.Random(42)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(80):
        text = " ".join(rnd.choices(words, k=rnd.randint(3, 20)))
        rows.append((f"d{d:03d}", text))
    # near-duplicate cluster: identical and one-token-edited texts
    rows += [("dup-a", "alpha beta gamma delta"), ("dup-b", "alpha beta gamma delta"),
             ("dup-c", "alpha beta gamma EPSILON")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = simhash_signatures_md5(docs).cache()
    try:
        new = sorted(
            tuple(r)
            for r in simhash_near_pairs_md5(sigs, max_hamming=max_hamming).collect()
        )
        old = sorted(
            tuple(r)
            for r in _old_simhash_near_pairs_md5(sigs, max_hamming=max_hamming).collect()
        )
        assert new == old
        assert ("dup-a", "dup-b", 0) in new
    finally:
        sigs.unpersist()
