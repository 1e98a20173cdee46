"""owl:sameAs entity resolution — canonical-id merging over the triple table.

The last step of knowledge-graph construction: once linking has emitted
entity IRIs and (possibly) ``owl:sameAs`` assertions between them, the
graph is rewritten so every member of a sameAs equivalence class appears
under ONE canonical IRI. Three composable pieces:

- :func:`sameas_edges` — project the sameAs assertions out of the quad
  table (filter + two columns; pushed to the scan);
- :func:`canonical_entity_map` — equivalence classes via the engine's
  alternating large/small-star connected components
  (:mod:`.components` — O(log n) rounds, no driver union-find); canonical
  id = lexicographically-smallest member, so the map is deterministic and
  matches a SQL ``min`` over the transitive closure;
- :func:`rewrite_triples` — apply the map to the corpus-sized quad table:
  subjects, IRI objects, and non-default graph names route through the
  map with ``coalesce`` left joins; sameAs triples that became
  self-referential are dropped; a final ``dropDuplicates`` collapses
  assertions that merged.

Scale: the sameAs edge set is entity-sized (≪ corpus). The map — one row
per *non-canonical* member — is usually broadcastable; ``rewrite_triples``
takes a ``broadcast`` flag (default True) and otherwise falls back to
plain shuffled left joins keyed on the high-cardinality subj/obj columns,
which AQE will skew-split if one merged entity is viral. The quad table is
scanned once and shuffled once (the final distinct).

No reference analogue (digitalbazaar/pyld processes documents; it has no
cross-document entity-merge surface); part of the builder's-brief
KG-construction extras. owl:sameAs semantics per the public OWL spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyld_spark.operators.components import connected_components

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_edges(triples: DataFrame, pred: str = OWL_SAMEAS) -> DataFrame:
    """(src, dst) pairs asserted equivalent in the quad table."""
    return triples.where(
        (F.col("pred") == pred) & (F.col("obj_kind") == "IRI")
    ).select(F.col("subj").alias("src"), F.col("obj_value").alias("dst"))


def canonical_entity_map(edges: DataFrame) -> DataFrame:
    """sameAs edges → (entity, canonical) for every NON-canonical member.

    canonical = min IRI of the connected component. Rows where the entity
    already is its own canonical id are omitted, so the map joins as a
    pure "rewrite exceptions" table (smallest possible broadcast).
    """
    comp = connected_components(edges, src="src", dst="dst")
    return (
        comp.where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("entity"),
                F.col("component").alias("canonical"))
    )


def _mapped(col: str, mapping: DataFrame, broadcast: bool) -> DataFrame:
    m = F.broadcast(mapping) if broadcast else mapping
    return m.withColumnRenamed("entity", col)


def rewrite_triples(
    triples: DataFrame,
    mapping: DataFrame,
    broadcast: bool = True,
    drop_self_sameas: bool = True,
    pred: str = OWL_SAMEAS,
) -> DataFrame:
    """Rewrite the quad table onto canonical entity ids.

    Subjects always route through the map; objects only when
    ``obj_kind = 'IRI'``; graph names only when not ``@default``. With
    ``drop_self_sameas`` (default) the sameAs assertions that the merge
    made self-referential are removed — the merge has *consumed* them.
    Output is distinct over all quad columns (merging can collapse
    previously-distinct assertions).
    """
    cols = triples.columns
    out = (
        triples.join(
            _mapped("subj", mapping, broadcast).withColumnRenamed(
                "canonical", "_cs"
            ),
            "subj",
            "left",
        )
        .join(
            _mapped("obj_value", mapping, broadcast).withColumnRenamed(
                "canonical", "_co"
            ),
            "obj_value",
            "left",
        )
        .withColumn("subj", F.coalesce("_cs", "subj"))
        .withColumn(
            "obj_value",
            F.when(
                F.col("obj_kind") == "IRI", F.coalesce("_co", "obj_value")
            ).otherwise(F.col("obj_value")),
        )
        .drop("_cs", "_co")
    )
    if "graph" in cols:
        out = (
            out.join(
                _mapped("graph", mapping, broadcast).withColumnRenamed(
                    "canonical", "_cg"
                ),
                "graph",
                "left",
            )
            .withColumn("graph", F.coalesce("_cg", "graph"))
            .drop("_cg")
        )
    if drop_self_sameas:
        out = out.where(
            ~(
                (F.col("pred") == pred)
                & (F.col("obj_kind") == "IRI")
                & (F.col("subj") == F.col("obj_value"))
            )
        )
    return out.select(*cols).dropDuplicates(cols)


def resolve_sameas(
    triples: DataFrame,
    pred: str = OWL_SAMEAS,
    broadcast: bool = True,
) -> DataFrame:
    """End-to-end: extract sameAs assertions from the quad table, compute
    the canonical map, and return the merged graph. The map is computed
    from (entity-sized) edges only; the corpus-sized quad table is
    touched by the joins in :func:`rewrite_triples` alone."""
    mapping = canonical_entity_map(sameas_edges(triples, pred))
    return rewrite_triples(triples, mapping, broadcast=broadcast, pred=pred)
