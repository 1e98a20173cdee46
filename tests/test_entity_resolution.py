"""sameAs entity resolution vs a pure-Python union-find oracle."""

import random

from pyld_spark.operators.entity_resolution import (
    OWL_SAMEAS,
    canonical_entity_map,
    resolve_sameas,
    rewrite_triples,
    sameas_edges,
)

QUAD_COLS = "subj string, pred string, obj_kind string, obj_value string, " \
    "obj_datatype string, obj_language string, graph string"


def _quad(subj, pred, obj_kind, obj_value, graph="@default",
          dt=None, lang=None):
    return (subj, pred, obj_kind, obj_value, dt, lang, graph)


def _py_canonical(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member of the class
    members = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    out = {}
    for root, mem in members.items():
        c = min(mem + [root])
        for x in mem:
            if x != c:
                out[x] = c
    return out


def test_canonical_map_chain_and_cycle(spark):
    edges = [("b", "a"), ("b", "c"), ("x", "y"), ("y", "z"), ("z", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["entity"]: r["canonical"]
        for r in canonical_entity_map(df).collect()
    }
    assert got == _py_canonical(edges) == {
        "b": "a", "c": "a", "y": "x", "z": "x"
    }


def test_canonical_map_random(spark):
    rng = random.Random(11)
    edges = sorted(
        {(f"e{rng.randrange(30)}", f"e{rng.randrange(30)}") for _ in range(25)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["entity"]: r["canonical"]
        for r in canonical_entity_map(df).collect()
    }
    assert got == _py_canonical(edges)


def test_rewrite_merges_subjects_objects_and_graphs(spark):
    quads = [
        _quad("e:b", OWL_SAMEAS, "IRI", "e:a"),
        _quad("e:b", "p:name", "literal", "Alice"),
        _quad("e:a", "p:name", "literal", "Alice"),
        _quad("t:1", "p:mentions", "IRI", "e:b"),
        _quad("t:1", "p:note", "literal", "e:b"),  # literal NOT rewritten
        _quad("t:2", "p:said", "IRI", "e:c", graph="e:b"),
    ]
    df = spark.createDataFrame(quads, QUAD_COLS)
    out = resolve_sameas(df)
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        # sameAs triple consumed; duplicate name assertions collapsed
        _quad("e:a", "p:name", "literal", "Alice"),
        _quad("t:1", "p:mentions", "IRI", "e:a"),
        _quad("t:1", "p:note", "literal", "e:b"),
        _quad("t:2", "p:said", "IRI", "e:c", graph="e:a"),
    }


def test_rewrite_keeps_cross_class_sameas_consumed_only(spark):
    # a sameAs between two DIFFERENT classes never exists post-merge, but a
    # sameAs to an entity outside any class maps its subject only
    quads = [
        _quad("e:b", OWL_SAMEAS, "IRI", "e:a"),
        _quad("e:c", "p:rel", "IRI", "e:d"),
    ]
    df = spark.createDataFrame(quads, QUAD_COLS)
    rows = {tuple(r) for r in resolve_sameas(df).collect()}
    assert rows == {_quad("e:c", "p:rel", "IRI", "e:d")}


def test_rewrite_without_broadcast_matches(spark):
    quads = [
        _quad("e:b", OWL_SAMEAS, "IRI", "e:a"),
        _quad("e:c", OWL_SAMEAS, "IRI", "e:b"),
        _quad("t:1", "p:mentions", "IRI", "e:c"),
    ]
    df = spark.createDataFrame(quads, QUAD_COLS)
    mapping = canonical_entity_map(sameas_edges(df))
    a = {tuple(r) for r in rewrite_triples(df, mapping, broadcast=True).collect()}
    b = {tuple(r) for r in rewrite_triples(df, mapping, broadcast=False).collect()}
    assert a == b == {_quad("t:1", "p:mentions", "IRI", "e:a")}


def test_noop_without_sameas(spark):
    quads = [
        _quad("e:a", "p:name", "literal", "x"),
        _quad("e:b", "p:rel", "IRI", "e:a"),
    ]
    df = spark.createDataFrame(quads, QUAD_COLS)
    assert {tuple(r) for r in resolve_sameas(df).collect()} == set(
        map(tuple, quads)
    )


def test_pmi_pairs_matches_python_replay(spark):
    from collections import Counter
    from itertools import combinations

    from pyld_spark.operators.linking import pmi_pairs

    rows = [
        ("c1", "e1"), ("c1", "e2"), ("c1", "e3"), ("c1", "e1"),  # dup mention
        ("c2", "e1"), ("c2", "e2"),
        ("c3", "e2"), ("c3", "e3"),
        ("c4", "e1"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "entity_iri"])
    got = {
        (r.entity_a, r.entity_b): (r.c_xy, r.c_x, r.c_y, r.n_convs, r.lift)
        for r in pmi_pairs(df, min_pair_count=1).collect()
    }
    convs = {}
    for c, e in rows:
        convs.setdefault(c, set()).add(e)
    n = len(convs)
    marg = Counter(e for es in convs.values() for e in es)
    cxy = Counter()
    for es in convs.values():
        for a, b in combinations(sorted(es), 2):
            cxy[(a, b)] += 1
    exp = {
        k: (v, marg[k[0]], marg[k[1]], n,
            round(float(n) * v / (float(marg[k[0]]) * marg[k[1]]), 6))
        for k, v in cxy.items()
    }
    assert got == exp
    # min_pair_count prunes
    pruned = pmi_pairs(df, min_pair_count=2).collect()
    assert {(r.entity_a, r.entity_b) for r in pruned} == {
        k for k, v in cxy.items() if v >= 2
    }
