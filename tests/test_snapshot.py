"""Snapshot-delta operators (operators/snapshot.py): set-diff semantics,
the apply_diff inverse property, and VoID summary counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyld_spark.operators.snapshot import apply_diff, triple_diff, void_summary

COLS = ["doc_id", "subj", "pred", "obj_kind", "obj_value",
        "obj_datatype", "obj_language", "graph"]


def _t(doc, s, p, kind, v):
    return (doc, s, p, kind, v, None, None, "@default")


def _df(spark, rows):
    return spark.createDataFrame(rows, " ".join(f"{c} string," for c in COLS)[:-1])


def test_triple_diff_added_removed_unchanged(spark):
    old = _df(spark, [
        _t("d1", "a", "p", "IRI", "x"),
        _t("d1", "a", "p", "IRI", "y"),       # removed
        _t("d2", "b", "q", "literal", "1"),
    ])
    new = _df(spark, [
        _t("d1", "a", "p", "IRI", "x"),
        _t("d2", "b", "q", "literal", "1"),
        _t("d3", "c", "p", "IRI", "z"),       # added
    ])
    got = {tuple(r) for r in triple_diff(old, new).collect()}
    assert got == {
        _t("d1", "a", "p", "IRI", "y") + ("removed",),
        _t("d3", "c", "p", "IRI", "z") + ("added",),
    }


def test_triple_diff_set_semantics_on_duplicates(spark):
    # a quad duplicated on one side and single on the other is unchanged
    old = _df(spark, [_t("d", "a", "p", "IRI", "x")] * 2)
    new = _df(spark, [_t("d", "a", "p", "IRI", "x")])
    assert triple_diff(old, new).count() == 0


def test_apply_diff_inverse_property(spark):
    old = _df(spark, [
        _t("d1", "a", "p", "IRI", "x"),
        _t("d1", "a", "p", "IRI", "y"),
        _t("d2", "b", "q", "literal", "1"),
        _t("d2", "b", "q", "literal", "2"),
    ])
    new = _df(spark, [
        _t("d1", "a", "p", "IRI", "x"),
        _t("d2", "b", "q", "literal", "2"),
        _t("d3", "c", "r", "blank node", "_:b0"),
    ])
    rolled = apply_diff(old, triple_diff(old, new))
    assert {tuple(r) for r in rolled.collect()} == {
        tuple(r) for r in new.collect()
    }


def test_void_summary_counters(spark):
    t = _df(spark, [
        _t("d1", "a", "p", "IRI", "x"),
        _t("d1", "b", "p", "IRI", "x"),
        _t("d1", "b", "p", "literal", "1"),
        _t("d2", "a", "q", "blank node", "_:b0"),
    ])
    rows = {r["pred"]: r for r in void_summary(t).collect()}
    p, q = rows["p"], rows["q"]
    assert (p["n_triples"], p["n_subjects"], p["n_objects"]) == (3, 2, 2)
    assert (p["n_iri_objs"], p["n_literal_objs"], p["n_bnode_objs"]) == (2, 1, 0)
    assert (q["n_triples"], q["n_subjects"], q["n_objects"]) == (1, 1, 1)
    assert (q["n_iri_objs"], q["n_literal_objs"], q["n_bnode_objs"]) == (0, 0, 1)


def test_diff_plan_is_single_aggregate_no_join(spark):
    """The diff must stay a tag+union+ONE hash aggregate — no join node."""
    old = _df(spark, [_t("d", "a", "p", "IRI", "x")])
    new = _df(spark, [_t("d", "a", "p", "IRI", "y")])
    plan = triple_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
