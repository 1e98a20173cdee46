"""Differential fuzz for the Spark canonicalization OPERATOR on random
graphs: the DataFrame fixpoint (fast path + exact fallback routing,
operators/canonicalize.py) must reproduce the per-document URDNA2015
canonical document for arbitrary small bnode graphs, not just the
transcript ontology and the hand-built automorphic gadgets.

300 seeded random docs run as ONE batched Spark job (per-example Spark
jobs would be ~1000x slower than the assertion deserves). Comparison is
the canonical *document* (label-applied quad set) — automorphic orbits
admit several equally-canonical mappings, but the rendered document is
unique (same criterion as the reference runner, runtests.py:455-476).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pyld_spark.jsonld.canon import URDNA2015
from pyld_spark.operators.canonicalize import canonical_labels, canonicalize_triples

PREDS = ["http://ex.org/p", "http://ex.org/q"]
_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj_kind", StringType(), False),
    StructField("obj_value", StringType(), False),
    StructField("obj_datatype", StringType(), True),
    StructField("obj_language", StringType(), True),
    StructField("graph", StringType(), False),
])


def _random_doc(rng: random.Random):
    """Random quads over ≤6 bnodes: directed bnode edges (symmetric shapes
    collide fd hashes → exact fallback), IRI anchors and literals
    (asymmetry → fast path), occasional bnode graph names and exact
    duplicate quads (URDNA2015 must NOT dedup)."""
    n = rng.randint(1, 6)
    nodes = [f"_:b{i}" for i in range(n)]
    quads = []
    for i in range(n):
        for j in range(n):
            if i != j and rng.random() < 0.35:
                quads.append((nodes[i], rng.choice(PREDS), "blank node",
                              nodes[j], None, None, "@default"))
    if rng.random() < 0.4:
        k = rng.randrange(n)
        quads.append((nodes[k], PREDS[0], "IRI", "http://ex.org/anchor",
                      None, None, "@default"))
    if rng.random() < 0.4:
        k = rng.randrange(n)
        # include degenerate literal shapes a hand-fed table can contain:
        # langString WITHOUT a language, and a null datatype (≡ xsd:string)
        dt, lang = rng.choice([
            ("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en"),
            ("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", None),
            ("http://www.w3.org/2001/XMLSchema#string", None),
            (None, None),
        ])
        quads.append((nodes[k], PREDS[1], "literal", f"v{rng.randrange(3)}",
                      dt, lang, "@default"))
    if n > 1 and rng.random() < 0.25:
        k = rng.randrange(n)
        quads.append((nodes[k], PREDS[0], "blank node", nodes[k],
                      None, None, "@default"))  # self-loop: multi-position bnode
    if rng.random() < 0.25:
        k = rng.randrange(n)
        quads.append((nodes[k], PREDS[0], "IRI", "http://ex.org/in-graph",
                      None, None, nodes[rng.randrange(n)]))
    if not quads:
        quads.append((nodes[0], PREDS[0], "IRI", "http://ex.org/lonely",
                      None, None, "@default"))
    if rng.random() < 0.3:
        quads.append(quads[rng.randrange(len(quads))])  # exact duplicate
    return quads


def _term(kind, value, dt, lang):
    if kind == "literal":
        t = {"type": "literal", "value": value, "datatype": dt}
        if lang is not None:
            t["language"] = lang
        return t
    return {"type": kind, "value": value}


def _canonical_doc(quads, mapping):
    """Render the label-applied quad multiset (sorted tuple, dup-preserving)."""
    out = []
    for s, p, ok, ov, dt, lang, g in quads:
        out.append((
            mapping.get(s, s), p, ok,
            mapping.get(ov, ov) if ok == "blank node" else ov,
            dt, lang, mapping.get(g, g),
        ))
    return tuple(sorted(out))


def test_random_graphs_match_exact_urdna2015(spark):
    rng = random.Random(0xC14)
    docs = {f"doc{i}": _random_doc(rng) for i in range(300)}
    rows = [(d, *q) for d, quads in docs.items() for q in quads]
    df = spark.createDataFrame(rows, _SCHEMA)
    labels: dict = {}
    for r in canonical_labels(df).collect():
        labels.setdefault(r.doc_id, {})[r.bnode] = r.label
    mismatches = []
    for doc_id, quads in docs.items():
        ref_mapping = URDNA2015().main([
            (_term("blank node" if s.startswith("_:") else "IRI", s, None, None),
             {"type": "IRI", "value": p}, _term(ok, ov, dt, lang), g)
            for s, p, ok, ov, dt, lang, g in quads
        ])
        got = _canonical_doc(quads, labels.get(doc_id, {}))
        want = _canonical_doc(quads, ref_mapping)
        if got != want:
            mismatches.append((doc_id, got, want))
    assert not mismatches, f"{len(mismatches)} docs diverge; first: {mismatches[0]}"


def test_random_graphs_relabel_is_complete(spark):
    """canonicalize_triples leaves no un-relabeled _: ids and preserves the
    per-doc quad count (duplicates included) on the same random corpus."""
    rng = random.Random(0xC14 + 1)
    docs = {f"doc{i}": _random_doc(rng) for i in range(150)}
    rows = [(d, *q) for d, quads in docs.items() for q in quads]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = canonicalize_triples(df)
    stray = out.filter(
        F.col("subj").rlike("^_:b[0-9]+$")
        | ((F.col("obj_kind") == "blank node") & F.col("obj_value").rlike("^_:b[0-9]+$"))
        | F.col("graph").rlike("^_:b[0-9]+$")
    ).count()
    assert stray == 0
    counts = {r.doc_id: r.n for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {d: len(q) for d, q in docs.items()}
