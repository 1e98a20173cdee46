"""RDFS entailment operators vs a pure-Python reachability oracle."""

import random

import pytest

from pyspark.sql import functions as F

from pyld_spark.operators.inference import (
    entailed_types,
    transitive_closure,
    type_triples,
)


def _py_closure(edges):
    """Floyd-Warshall-ish reachability oracle (fine at test sizes)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    reach = {u: set() for u in nodes}
    for u, v in edges:
        if u != v:
            reach[u].add(v)
    changed = True
    while changed:
        changed = False
        for u in nodes:
            add = set()
            for v in reach[u]:
                add |= reach[v]
            if not add <= reach[u]:
                reach[u] |= add
                changed = True
    return {(u, v) for u in nodes for v in reach[u]}


def _spark_closure(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {(r["src"], r["dst"]) for r in transitive_closure(df).collect()}


def test_closure_chain(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _spark_closure(spark, edges) == _py_closure(edges)


def test_closure_cycle_terminates(spark):
    # cycle → every node reaches every node including itself
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _spark_closure(spark, edges)
    assert got == _py_closure(edges)
    assert ("a", "a") in got  # on-cycle self-reachability


def test_closure_dedups_and_drops_self_loops(spark):
    edges = [("a", "b"), ("a", "b"), ("b", "b"), ("b", "c")]
    assert _spark_closure(spark, edges) == {("a", "b"), ("a", "c"), ("b", "c")}


@pytest.mark.parametrize("seed", [7, 19, 23])
def test_closure_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = sorted(
        {
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(90)
        }
    )
    assert _spark_closure(spark, edges) == _py_closure(edges)


def test_closure_max_rounds_backstop(spark):
    edges = [(f"n{i}", f"n{i + 1}") for i in range(12)]
    df = spark.createDataFrame(edges, "src string, dst string")
    with pytest.raises(RuntimeError, match="did not converge"):
        transitive_closure(df, max_rounds=2)


def test_entailed_types(spark):
    onto = spark.createDataFrame(
        [("User", "Agent"), ("Tool", "Agent"), ("Agent", "Thing")],
        "sub string, sup string",
    )
    facts = spark.createDataFrame(
        [("u1", "User"), ("t1", "Tool"), ("x1", "Thing")],
        "instance string, cls string",
    )
    got = {
        (r["instance"], r["cls"]): r["asserted"]
        for r in entailed_types(facts, onto).collect()
    }
    assert got == {
        ("u1", "User"): True,
        ("u1", "Agent"): False,
        ("u1", "Thing"): False,
        ("t1", "Tool"): True,
        ("t1", "Agent"): False,
        ("t1", "Thing"): False,
        ("x1", "Thing"): True,
    }


def test_entailed_asserted_wins_over_inferred(spark):
    onto = spark.createDataFrame([("User", "Agent")], "sub string, sup string")
    facts = spark.createDataFrame(
        [("u1", "User"), ("u1", "Agent")], "instance string, cls string"
    )
    got = {
        (r["instance"], r["cls"]): r["asserted"]
        for r in entailed_types(facts, onto).collect()
    }
    assert got[("u1", "Agent")] is True


def test_type_triples_schema(spark):
    onto = spark.createDataFrame([("User", "Agent")], "sub string, sup string")
    facts = spark.createDataFrame([("u1", "User")], "instance string, cls string")
    out = type_triples(entailed_types(facts, onto))
    rows = {(r["subj"], r["pred"], r["obj_kind"], r["obj_value"], r["graph"])
            for r in out.collect()}
    assert rows == {
        ("u1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "IRI",
         "User", "@default"),
        ("u1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "IRI",
         "Agent", "@default"),
    }
    # standard quad schema: datatype/language stay null for IRI objects
    assert out.where(F.col("obj_datatype").isNotNull()).count() == 0
