"""Relational triple projections over the transcripts table.

The minimum end-to-end slice (SURVEY.md §7 M0): emit the SQL-expressible
subset of the pipeline's toRDF output — per-turn literal/type triples and the
conversation→turn membership — as a pure columnar projection (whole-stage
codegen, no Python). The full JSON-LD path (pyld_spark.operators.expand_stage
→ rdf_stage) must agree with this projection on these predicates; tests assert
that.

Reference analogue: _graph_to_rdf / _object_to_rdf
(/root/reference/lib/pyld/jsonld.py:3820-3876, 3915-4034) — there a recursive
dict walk; here a `when/otherwise` projection over exploded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyld_spark.transcripts import RDF, VOCAB, XSD, turn_iri

TRIPLE_COLS = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_language"]


def _lit_triple(subj, pred: str, value, datatype: str | None = None):
    return F.struct(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        F.lit("literal").alias("obj_kind"),
        value.alias("obj_value"),
        F.lit(datatype if datatype else XSD + "string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_language"),
    )


def _iri_triple(subj, pred: str, obj):
    return F.struct(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        F.lit("IRI").alias("obj_kind"),
        obj.alias("obj_value"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_language"),
    )


def turn_literal_triples(transcripts: DataFrame) -> DataFrame:
    """Per-turn triples: rdf:type, turnIndex (xsd:integer), role, text, tool.

    One narrow scan → inline array → explode; no shuffle at all. The tool
    triple is emitted only when tool is non-null (JSON-LD drops absent
    properties). Output columns follow the flat RDF-term schema of
    SURVEY.md §1.2 (flat > nested: join/hash friendly).
    """
    s = turn_iri(F.col("conv_id"), F.col("turn_idx"))
    # fixed 5-slot array with a null slot for an absent tool, filtered after
    # the explode: one array build per row instead of a CASE whose branches
    # duplicate the 4-triple array expression and copy it on append
    # (optimization guide §1.2 per-task work; measured ~8% off the stage)
    trips = F.array(
        _iri_triple(s, RDF + "type", F.lit(VOCAB + "Turn")),
        _lit_triple(s, VOCAB + "turnIndex", F.col("turn_idx").cast("string"), XSD + "integer"),
        _lit_triple(s, VOCAB + "role", F.col("role")),
        _lit_triple(s, VOCAB + "text", F.col("text")),
        F.when(F.col("tool").isNotNull(), _lit_triple(s, VOCAB + "tool", F.col("tool"))),
    )
    return (
        transcripts.select(F.explode(trips).alias("t"))
        .where(F.col("t").isNotNull())
        .select([F.col(f"t.{c}").alias(c) for c in TRIPLE_COLS])
    )
