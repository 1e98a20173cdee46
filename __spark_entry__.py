"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship transcript→triples pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose each implemented operator with
a DuckDB-checkable ANSI-SQL oracle (run at sf0.01 by the driver).

The transcripts table is synthesized deterministically from the driver's
``events`` parquet via a shared transformation (see
pyld_spark.transcripts.TRANSCRIPTS_FROM_EVENTS_SQL) so the oracle can verify
transcript-shaped queries too.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyld_spark.transcripts import (  # noqa: E402
    TRANSCRIPTS_FROM_EVENTS_SQL,
    assemble_documents,
    transcripts_from_events,
)
from pyld_spark.operators.expand_stage import (  # noqa: E402
    docs_to_canonical_nquads,
    docs_to_triples,
    split_quarantine,
)
from pyld_spark.operators.linking import (  # noqa: E402
    entity_mention_counts,
    extract_mentions,
    link_entities,
    mention_triples,
)
from pyld_spark.operators.triples import turn_literal_triples  # noqa: E402
from pyld_spark.session import ensure_workers_can_import  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"

# --- shared SQL fragments for oracles -------------------------------------

_T_CTE = f"WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL})"

_VOCAB = "https://pyld-spark.example/vocab#"
_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_CONV = "https://pyld-spark.example/conv/"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction path at sf0.001 — transcripts →
    window-ordered assembly → JSON-LD expansion → node map → RDF triples
    (Arrow-batched mapInPandas, no Python in the relational stages)."""
    ensure_workers_can_import(spark)
    t = transcripts_from_events(spark, _SF0001)
    docs = assemble_documents(t)
    triples, _quarantine = split_quarantine(docs_to_triples(docs))
    return triples


# --- queries ---------------------------------------------------------------


def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(spark, sf_dir).drop("ts")


def _q_assembly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = transcripts_from_events(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.min("turn_idx").cast("int").alias("min_turn"),
        F.max("turn_idx").cast("int").alias("max_turn"),
        F.sum(F.length("text")).cast("bigint").alias("text_chars"),
        F.count("tool").cast("bigint").alias("n_tool_turns"),
    )


def _q_turn_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return turn_literal_triples(transcripts_from_events(spark, sf_dir))


def _q_pipeline_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    docs = assemble_documents(transcripts_from_events(spark, sf_dir))
    triples, _ = split_quarantine(docs_to_triples(docs))
    return triples


def _q_canonical_nquads(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    docs = assemble_documents(transcripts_from_events(spark, sf_dir))
    out, _ = split_quarantine(docs_to_canonical_nquads(docs))
    return out


def _q_linked_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    t = transcripts_from_events(spark, sf_dir)
    return link_entities(extract_mentions(t))


def _q_mention_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    t = transcripts_from_events(spark, sf_dir)
    return mention_triples(link_entities(extract_mentions(t)))


def _q_entity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    t = transcripts_from_events(spark, sf_dir)
    return entity_mention_counts(link_entities(extract_mentions(t)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_from_events": _q_transcripts,
        "assembly_stats": _q_assembly_stats,
        "turn_literal_triples": _q_turn_triples,
        "pipeline_triples": _q_pipeline_triples,
        "canonical_nquads": _q_canonical_nquads,
        "linked_mentions": _q_linked_mentions,
        "mention_triples": _q_mention_triples,
        "entity_mention_counts": _q_entity_counts,
    }


def oracle_sql() -> dict[str, str]:
    turn_subj = f"concat('{_CONV}', conv_id, '/turn/', CAST(turn_idx AS STRING))"
    # Full-pipeline oracle: reconstructs the complete toRDF output (including
    # namespaced rdf:first/rest cons-cell bnodes) in portable SQL.
    pipeline_oracle = f"""{_T_CTE},
        stats AS (
          SELECT conv_id, count(*) AS n_turns FROM transcripts GROUP BY conv_id
        ),
        base AS (
          SELECT t.conv_id, t.turn_idx, t.role, t.text, t.tool,
                 concat('{_CONV}', t.conv_id) AS conv_iri,
                 {turn_subj.replace('conv_id', 't.conv_id').replace('turn_idx', 't.turn_idx')} AS turn_iri,
                 concat('_:d', substr(sha256(t.conv_id), 1, 16), '_b',
                        CAST(t.turn_idx AS STRING)) AS cell,
                 concat('_:d', substr(sha256(t.conv_id), 1, 16), '_b',
                        CAST(t.turn_idx + 1 AS STRING)) AS next_cell,
                 strftime(t.ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS ts_str,
                 s.n_turns
          FROM transcripts t JOIN stats s ON t.conv_id = s.conv_id
        ),
        convs AS (SELECT DISTINCT conv_id, conv_iri,
                         concat('_:d', substr(sha256(conv_id), 1, 16), '_b0') AS head
                  FROM base)
        SELECT conv_id AS doc_id, conv_iri AS subj, '{_RDF}type' AS pred,
               'IRI' AS obj_kind, '{_VOCAB}Conversation' AS obj_value,
               CAST(NULL AS STRING) AS obj_datatype, CAST(NULL AS STRING) AS obj_language,
               '@default' AS graph
        FROM convs
        UNION ALL
        SELECT conv_id, conv_iri, '{_VOCAB}turns', 'blank node', head,
               CAST(NULL AS STRING), CAST(NULL AS STRING), '@default' FROM convs
        UNION ALL
        SELECT conv_id, cell, '{_RDF}first', 'IRI', turn_iri,
               CAST(NULL AS STRING), CAST(NULL AS STRING), '@default' FROM base
        UNION ALL
        SELECT conv_id, cell, '{_RDF}rest',
               CASE WHEN turn_idx = n_turns - 1 THEN 'IRI' ELSE 'blank node' END,
               CASE WHEN turn_idx = n_turns - 1 THEN '{_RDF}nil' ELSE next_cell END,
               CAST(NULL AS STRING), CAST(NULL AS STRING), '@default' FROM base
        UNION ALL
        SELECT conv_id, turn_iri, '{_RDF}type', 'IRI', '{_VOCAB}Turn',
               CAST(NULL AS STRING), CAST(NULL AS STRING), '@default' FROM base
        UNION ALL
        SELECT conv_id, turn_iri, '{_VOCAB}turnIndex', 'literal',
               CAST(turn_idx AS STRING), '{_XSD}integer', CAST(NULL AS STRING),
               '@default' FROM base
        UNION ALL
        SELECT conv_id, turn_iri, '{_VOCAB}role', 'literal', role,
               '{_XSD}string', CAST(NULL AS STRING), '@default' FROM base
        UNION ALL
        SELECT conv_id, turn_iri, '{_VOCAB}text', 'literal', text,
               '{_XSD}string', CAST(NULL AS STRING), '@default' FROM base
        UNION ALL
        SELECT conv_id, turn_iri, '{_VOCAB}tool', 'literal', tool,
               '{_XSD}string', CAST(NULL AS STRING), '@default' FROM base
        WHERE tool IS NOT NULL
        UNION ALL
        SELECT conv_id, turn_iri, '{_VOCAB}ts', 'literal', ts_str,
               '{_XSD}dateTime', CAST(NULL AS STRING), '@default' FROM base"""
    mentions_cte = f"""m AS (
          SELECT conv_id, turn_idx, 'handle' AS mention_kind,
                 unnest(regexp_extract_all(text, '@[A-Za-z0-9_]+')) AS mention
          FROM transcripts
          UNION ALL
          SELECT conv_id, turn_idx, 'url',
                 unnest(regexp_extract_all(text, 'https?://[^\\s]+'))
          FROM transcripts
          UNION ALL
          SELECT conv_id, turn_idx, 'tool', tool FROM transcripts
          WHERE tool IS NOT NULL
        ),
        linked AS (
          SELECT conv_id, turn_idx, mention_kind, mention,
                 concat('{_VOCAB}entity/', md5(lower(mention))) AS entity_iri,
                 round(1.0 - 1.0 / (2.0 + length(lower(mention))), 4) AS score
          FROM m
        )"""
    return {
        "linked_mentions": f"""{_T_CTE}, {mentions_cte}
            SELECT * FROM linked""",
        "mention_triples": f"""{_T_CTE}, {mentions_cte}
            SELECT {turn_subj} AS subj, '{_VOCAB}mentions' AS pred,
                   'IRI' AS obj_kind, entity_iri AS obj_value,
                   CAST(NULL AS STRING) AS obj_datatype,
                   CAST(NULL AS STRING) AS obj_language
            FROM linked
            UNION ALL
            SELECT DISTINCT entity_iri, '{_VOCAB}label', 'literal',
                   lower(mention), '{_XSD}string', CAST(NULL AS STRING)
            FROM linked""",
        "entity_mention_counts": f"""{_T_CTE}, {mentions_cte}
            SELECT entity_iri, CAST(count(*) AS BIGINT) AS n_mentions,
                   min(mention_kind) AS mention_kind
            FROM linked GROUP BY entity_iri""",
        "pipeline_triples": pipeline_oracle,
        "transcripts_from_events": (
            f"{_T_CTE} SELECT conv_id, turn_idx, role, text, tool FROM transcripts"
        ),
        "assembly_stats": f"""{_T_CTE}
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(min(turn_idx) AS INT) AS min_turn,
                   CAST(max(turn_idx) AS INT) AS max_turn,
                   CAST(sum(length(text)) AS BIGINT) AS text_chars,
                   CAST(count(tool) AS BIGINT) AS n_tool_turns
            FROM transcripts GROUP BY conv_id""",
        "turn_literal_triples": f"""{_T_CTE}, base AS (
              SELECT {turn_subj} AS subj, turn_idx, role, text, tool FROM transcripts
            )
            SELECT subj, '{_RDF}type' AS pred, 'IRI' AS obj_kind,
                   '{_VOCAB}Turn' AS obj_value,
                   CAST(NULL AS STRING) AS obj_datatype, CAST(NULL AS STRING) AS obj_language
            FROM base
            UNION ALL
            SELECT subj, '{_VOCAB}turnIndex', 'literal', CAST(turn_idx AS STRING),
                   '{_XSD}integer', CAST(NULL AS STRING) FROM base
            UNION ALL
            SELECT subj, '{_VOCAB}role', 'literal', role,
                   '{_XSD}string', CAST(NULL AS STRING) FROM base
            UNION ALL
            SELECT subj, '{_VOCAB}text', 'literal', text,
                   '{_XSD}string', CAST(NULL AS STRING) FROM base
            UNION ALL
            SELECT subj, '{_VOCAB}tool', 'literal', tool,
                   '{_XSD}string', CAST(NULL AS STRING) FROM base WHERE tool IS NOT NULL""",
    }
