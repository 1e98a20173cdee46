"""BGP matching and k-hop neighborhood over a triple DataFrame."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyld_spark.operators.kg_query import bgp_match, khop_neighborhood

V = "https://pyld-spark.example/vocab#"
_SCHEMA = ("subj string, pred string, obj_kind string, obj_value string, "
           "obj_datatype string, obj_language string")


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, k, o, None, None) for s, p, k, o in rows], _SCHEMA
    )


@pytest.fixture()
def kg(spark):
    # turn1 mentions A and B; turn2 mentions B and C; labels for all three
    return _triples(spark, [
        ("t1", V + "mentions", "IRI", "A"),
        ("t1", V + "mentions", "IRI", "B"),
        ("t2", V + "mentions", "IRI", "B"),
        ("t2", V + "mentions", "IRI", "C"),
        ("A", V + "label", "literal", "alpha"),
        ("B", V + "label", "literal", "beta"),
        ("C", V + "label", "literal", "gamma"),
    ])


def test_bgp_two_pattern_join(kg):
    out = bgp_match(kg, [
        ("?turn", V + "mentions", "?e"),
        ("?e", V + "label", "?lab"),
    ])
    got = {(r["turn"], r["e"], r["lab"]) for r in out.collect()}
    assert got == {
        ("t1", "A", "alpha"), ("t1", "B", "beta"),
        ("t2", "B", "beta"), ("t2", "C", "gamma"),
    }
    assert out.columns == ["turn", "e", "lab"]


def test_bgp_self_join_with_filter(kg):
    out = bgp_match(kg, [
        ("?turn", V + "mentions", "?e1"),
        ("?turn", V + "mentions", "?e2"),
    ], filters=("e1 < e2",))
    got = {(r["turn"], r["e1"], r["e2"]) for r in out.collect()}
    assert got == {("t1", "A", "B"), ("t2", "B", "C")}


def test_bgp_constant_object_and_subject(kg):
    out = bgp_match(kg, [("?turn", V + "mentions", "B")])
    assert {r["turn"] for r in out.collect()} == {"t1", "t2"}
    out2 = bgp_match(kg, [("t1", V + "mentions", "?e")])
    assert {r["e"] for r in out2.collect()} == {"A", "B"}


def test_bgp_bag_semantics(spark):
    # duplicate triples multiply bindings, exactly like the SQL-join oracle
    dup = _triples(spark, [
        ("t1", V + "mentions", "IRI", "A"),
        ("t1", V + "mentions", "IRI", "A"),
        ("A", V + "label", "literal", "alpha"),
    ])
    out = bgp_match(dup, [
        ("?turn", V + "mentions", "?e"),
        ("?e", V + "label", "?lab"),
    ])
    assert out.count() == 2


def test_bgp_repeated_variable_in_one_pattern(spark):
    t = _triples(spark, [
        ("x", V + "sameAs", "IRI", "x"),
        ("x", V + "sameAs", "IRI", "y"),
    ])
    out = bgp_match(t, [("?n", V + "sameAs", "?n")])
    assert [r["n"] for r in out.collect()] == ["x"]


def test_bgp_rejects_disconnected_and_ground(kg):
    with pytest.raises(ValueError, match="connected"):
        bgp_match(kg, [
            ("?a", V + "mentions", "?b"),
            ("?c", V + "label", "?d"),
        ])
    with pytest.raises(ValueError, match="ground"):
        bgp_match(kg, [("t1", V + "mentions", "B")])
    with pytest.raises(ValueError, match="empty"):
        bgp_match(kg, [])


def test_khop_bfs_min_hops(kg, spark):
    seeds = spark.createDataFrame([("A",)], ["node"])
    out = {r["node"]: r["hops"] for r in
           khop_neighborhood(kg, seeds, k=4).collect()}
    # undirected over IRI edges only (labels are literals, excluded):
    # A -1- t1 -2- B -3- t2 -4- C
    assert out == {"A": 0, "t1": 1, "B": 2, "t2": 3, "C": 4}
    out2 = {r["node"]: r["hops"] for r in
            khop_neighborhood(kg, seeds, k=2).collect()}
    assert out2 == {"A": 0, "t1": 1, "B": 2}


def test_khop_directed_and_k0(kg, spark):
    seeds = spark.createDataFrame([("t1",)], ["node"])
    out = {r["node"]: r["hops"] for r in
           khop_neighborhood(kg, seeds, k=3, directed=True).collect()}
    assert out == {"t1": 0, "A": 1, "B": 1}  # no IRI edges leave A or B
    out0 = khop_neighborhood(kg, seeds, k=0).collect()
    assert [(r["node"], r["hops"]) for r in out0] == [("t1", 0)]


def test_gate_queries_match_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    for name, order in (("kg_comention_pairs", ["turn", "e1", "e2", "label1"]),
                        ("kg_entity_khop", ["node", "hops"])):
        sdf = entry.queries()[name](spark, sf).orderBy(*order)
        spark_rows = [tuple(r) for r in sdf.collect()]
        oracle = con.execute(
            entry.oracle_sql()[name] + " ORDER BY "
            + ", ".join(str(i + 1) for i in range(len(order)))
        ).fetchall()
        assert spark_rows == oracle, name


def test_bgp_optional_pattern_nulls_where_unmatched(spark):
    trips = _triples(spark, [
        ("t1", V + "role", "literal", "user"),
        ("t2", V + "role", "literal", "assistant"),
        ("t2", V + "tool", "literal", "search"),
    ])
    out = bgp_match(
        trips,
        [("?turn", V + "role", "?role")],
        optional=[("?turn", V + "tool", "?tool")],
    )
    got = {(r["turn"], r["role"], r["tool"]) for r in out.collect()}
    assert got == {("t1", "user", None), ("t2", "assistant", "search")}
    assert out.columns == ["turn", "role", "tool"]


def test_bgp_optional_never_constrains_required(kg):
    # an optional pattern that matches nothing leaves all required rows
    out = bgp_match(
        kg,
        [("?turn", V + "mentions", "?e")],
        optional=[("?e", V + "nope", "?x")],
    )
    assert out.count() == 4
    assert all(r["x"] is None for r in out.collect())


def test_bgp_optional_validation(kg):
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(
            kg,
            [("?turn", V + "mentions", "?e")],
            optional=[("?other", V + "label", "?lab")],
        )
    with pytest.raises(ValueError, match="rebinds"):
        bgp_match(
            kg,
            [("?turn", V + "mentions", "?e")],
            optional=[
                ("?e", V + "label", "?lab"),
                ("?turn", V + "mentions", "?lab"),
            ],
        )


def test_khop_edges_persisted_not_reshuffled(kg, spark):
    """Round-5: the edge relation is partitioned+sorted on src ONCE and
    localCheckpointed; each BFS round's join must not re-exchange or
    re-sort the graph side (LogicalRDD preserves partitioning/ordering).
    The duplicate-edge global distinct is gone — duplicates cannot change
    minimal hops and the frontier is distinct-ed per round."""
    seeds = spark.createDataFrame([("e:0",)], ["node"])
    out = khop_neighborhood(kg, seeds, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only exchanges on src may be the one-time repartition (runs
    # before the checkpoint, not inside the loop); after the checkpoint
    # the edge side appears as Scan ExistingRDD with no Exchange above it
    for i, ln in enumerate(plan.splitlines()):
        if "Scan ExistingRDD" in ln and "src" in ln:
            above = plan.splitlines()[max(0, i - 2):i]
            assert not any("Exchange" in a or "Sort " in a for a in above), (
                "\n".join(above) + "\n" + ln
            )
