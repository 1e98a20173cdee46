"""Giant-document guard for the exact-c14n fallback (round-3 verdict item 5).

A symmetric bnode cycle makes EVERY first-degree hash collide, so the whole
doc is "ambiguous". Pre-guard, it entered the exact URDNA2015 fallback as one
``applyInPandas`` group, where hash-n-degree explores permutations — a 10^6
node cycle would never return. The guard routes docs over ``max_exact_quads``
to the distributed WL-refinement path, which completes in bounded time/memory
with deterministic labels.
"""

import time

from pyspark.sql import functions as F

from pyld_spark.operators.canonicalize import (
    canonical_labels,
    canonicalize_triples,
)

PRED = "http://example.org/next"


def _cycle_triples(spark, n, doc_id="giant"):
    """n-node symmetric bnode cycle _:b0 → _:b1 → … → _:b0 (no driver loop)."""
    return (
        spark.range(n)
        .select(
            F.lit(doc_id).alias("doc_id"),
            F.concat(F.lit("_:b"), F.col("id").cast("string")).alias("subj"),
            F.lit(PRED).alias("pred"),
            F.lit("blank node").alias("obj_kind"),
            F.concat(F.lit("_:b"), ((F.col("id") + 1) % n).cast("string")).alias("obj_value"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_language"),
            F.lit("@default").alias("graph"),
        )
    )


def test_giant_automorphic_doc_completes(spark):
    # Fully ambiguous bnode cycle: every fd hash identical → whole doc is one
    # collision class. Must route to WL, not the exact single-group UDF (which
    # explores permutations and would hang). 250k nodes over a 50k threshold
    # exercises the identical routing as the original 1M/100k shape (verified
    # once at 1M: completes in ~470 s) while keeping the suite fast and the
    # wall bound safe under full-suite contention.
    n = 250_000
    t0 = time.time()
    labels = canonical_labels(_cycle_triples(spark, n), max_exact_quads=50_000)
    got = labels.agg(
        F.count("*").alias("n"),
        F.count_distinct("label").alias("nd"),
    ).collect()[0]
    wall = time.time() - t0
    assert got["n"] == n
    assert got["nd"] == n  # every bnode gets its own deterministic label
    # generous bound: the point is "completes", not speed — pre-guard this hung
    assert wall < 900


def test_wl_labels_are_deterministic(spark):
    a = {
        (r["bnode"], r["label"])
        for r in canonical_labels(_cycle_triples(spark, 5_000), max_exact_quads=100).collect()
    }
    b = {
        (r["bnode"], r["label"])
        for r in canonical_labels(_cycle_triples(spark, 5_000), max_exact_quads=100).collect()
    }
    assert a == b


def test_small_ambiguous_docs_still_exact(spark):
    """Docs under the bound keep the byte-exact URDNA2015 fallback."""
    from pyld_spark.jsonld.canon import URDNA2015

    n = 6
    labels = {
        r["bnode"]: r["label"]
        for r in canonical_labels(_cycle_triples(spark, n), max_exact_quads=100_000).collect()
    }
    quads = []
    for i in range(n):
        quads.append((
            {"type": "blank node", "value": f"_:b{i}"},
            {"type": "IRI", "value": PRED},
            {"type": "blank node", "value": f"_:b{(i + 1) % n}"},
            "@default",
        ))
    expected = URDNA2015().main(quads)
    assert labels == expected


def _path_triples(spark, n, doc_id="easy"):
    """n-quad bnode PATH _:b0 → … → _:bn (asymmetric: every fd hash is
    unique, so the doc rides the relational fast path)."""
    return (
        spark.range(n)
        .select(
            F.lit(doc_id).alias("doc_id"),
            F.concat(F.lit("_:b"), F.col("id").cast("string")).alias("subj"),
            F.lit(PRED).alias("pred"),
            F.lit("blank node").alias("obj_kind"),
            F.concat(F.lit("_:b"), (F.col("id") + 1).cast("string")).alias("obj_value"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_language"),
            F.lit("@default").alias("graph"),
        )
    )


def test_guard_split_keeps_all_docs(spark):
    """Easy + small-ambiguous + big-ambiguous docs in ONE table: all three
    routing branches (row_number fast path, exact applyInPandas fallback,
    WL refinement) are simultaneously non-empty in a single
    canonicalize_triples plan, and every doc comes out fully labeled."""
    t = (
        _cycle_triples(spark, 4, doc_id="small")
        .unionByName(_cycle_triples(spark, 2_000, doc_id="big"))
        .unionByName(_path_triples(spark, 5, doc_id="easy"))
    )
    out = canonicalize_triples_counts(t)
    # path doc: 5 quads → subjects _:b0.._:b4 (b5 is object-only)
    assert out == {"small": 4, "big": 2_000, "easy": 5}


def canonicalize_triples_counts(t):
    # bound of 100: "small" (4 quads) stays exact, "big" (2000) routes to WL
    relabeled = canonicalize_triples(t, max_exact_quads=100)
    rows = (
        relabeled.filter(F.col("subj").startswith("_:d"))
        .groupBy("doc_id").agg(F.count_distinct("subj").alias("n")).collect()
    )
    return {r["doc_id"]: r["n"] for r in rows}
