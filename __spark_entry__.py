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
from pyld_spark.operators.textstats import EN_STOPWORDS  # noqa: E402
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


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), k=5, threshold=0.2)


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.2)


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.dedup import simhash_near_pairs, simhash_signatures

    return simhash_near_pairs(simhash_signatures(_docs(spark, sf_dir)), max_hamming=16)


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.textstats import text_stats

    return text_stats(_docs(spark, sf_dir))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


def _q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.textstats import doc_fingerprint

    return doc_fingerprint(_docs(spark, sf_dir), k=8)


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pyld_spark.operators.similarity import quantized_dot_topk

    embs = _embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return quantized_dot_topk(embs, queries_df, k=10)


def _q_ann_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pyld_spark.operators.similarity import brute_force_topk

    embs = _embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(embs, queries_df, k=10)


def _q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pyld_spark.operators.multimodal import attach_fake_payload

    media = attach_fake_payload(_docs(spark, sf_dir))
    return media.select(
        "doc_id", "media_type",
        F.length("payload").cast("bigint").alias("n_bytes"),
        "width", "height",
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_workers_can_import(spark)
    from pyld_spark.operators.multimodal import (
        attach_fake_payload,
        extract_binary_features,
    )

    return extract_binary_features(attach_fake_payload(_docs(spark, sf_dir)))


def _q_list_chain_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.fromrdf_stage import list_chain_lengths

    ensure_workers_can_import(spark)
    docs = assemble_documents(transcripts_from_events(spark, sf_dir))
    triples, _ = split_quarantine(docs_to_triples(docs))
    return list_chain_lengths(triples)


def _q_fromrdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """triples → fromRDF per doc → count of reconstructed @list entries:
    the full inverse direction exercised at corpus level."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pyld_spark.operators.fromrdf_stage import triples_to_documents

    ensure_workers_can_import(spark)
    docs = assemble_documents(transcripts_from_events(spark, sf_dir))
    triples, _ = split_quarantine(docs_to_triples(docs))
    recon = triples_to_documents(triples)

    schema = StructType([
        StructField("doc_id", StringType(), False),
        StructField("n_list_items", LongType(), False),
    ])

    def count_lists(batches):
        import json as _json

        import pandas as pd

        def count(doc_json):
            if doc_json is None:
                return 0
            total = 0
            for node in _json.loads(doc_json):
                for v in node.values():
                    if isinstance(v, list):
                        for item in v:
                            if isinstance(item, dict) and "@list" in item:
                                total += len(item["@list"])
            return total

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_list_items": pdf["expanded"].map(count).astype("int64"),
            })

    return recon.mapInPandas(count_lists, schema)


def _q_framed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyld_spark.operators.frame_stage import frame_corpus
    from pyld_spark.transcripts import VOCAB as _V

    ensure_workers_can_import(spark)
    docs = assemble_documents(transcripts_from_events(spark, sf_dir))
    triples, _ = split_quarantine(docs_to_triples(docs))
    frame_doc = {
        "@context": {"@vocab": _V},
        "@type": "Conversation",
    }
    return frame_corpus(docs, triples, frame_doc)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "list_chain_lengths": _q_list_chain_lengths,
        "fromrdf_roundtrip": _q_fromrdf_roundtrip,
        "framed_conversations": _q_framed,
        "transcripts_from_events": _q_transcripts,
        "assembly_stats": _q_assembly_stats,
        "turn_literal_triples": _q_turn_triples,
        "pipeline_triples": _q_pipeline_triples,
        "canonical_nquads": _q_canonical_nquads,
        "linked_mentions": _q_linked_mentions,
        "mention_triples": _q_mention_triples,
        "entity_mention_counts": _q_entity_counts,
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard_pairs": _q_jaccard_pairs,
        "minhash_dedup_pairs": _q_minhash_pairs,
        "simhash_near_pairs": _q_simhash_pairs,
        "text_stats": _q_text_stats,
        "quality_score": _q_quality,
        "language_id": _q_langid,
        "doc_fingerprint": _q_fingerprint,
        "ann_topk_quantized": _q_ann_topk,
        "ann_topk_cosine": _q_ann_brute_cosine,
        "media_meta": _q_media_meta,
        "media_features": _q_media_features,
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
    shingles5 = (
        "list_distinct(list_transform(range(1, greatest(length(text)-4,1)+1),"
        " i -> text[i:i+4]))"
    )
    shingles8 = (
        "list_distinct(list_transform(range(1, greatest(length(text)-7,1)+1),"
        " i -> text[i:i+7]))"
    )
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')"

    def lang_hits(lang: str) -> str:
        from pyld_spark.operators.textstats import LANG_MARKERS

        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            f"CAST(len(list_filter({toks}, x -> list_contains([{markers}], x)))"
            f" AS BIGINT)"
        )

    extras = {
        "exact_dedup": """
            WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
            s AS (SELECT content_hash, min(doc_id) AS survivor_id FROM h GROUP BY 1)
            SELECT h.doc_id, h.content_hash, s.survivor_id,
                   h.doc_id != s.survivor_id AS is_duplicate
            FROM h JOIN s USING (content_hash)""",
        "ngram_jaccard_pairs": f"""
            WITH sh AS (SELECT doc_id AS doc, unnest({shingles5}) AS sh FROM documents),
            sizes AS (SELECT doc, CAST(count(*) AS BIGINT) AS size FROM sh GROUP BY doc),
            df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
            shf AS (SELECT s.doc, s.sh FROM sh s JOIN df USING (sh) WHERE df <= 1000),
            inter AS (
              SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(count(*) AS BIGINT) AS inter
              FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc < b.doc GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, inter, sa.size AS size_a, sb.size AS size_b,
                   round(inter / (sa.size + sb.size - inter), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
            WHERE round(inter / (sa.size + sb.size - inter), 4) >= 0.2""",
        "text_stats": f"""
            SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(len({toks}) AS BIGINT) AS n_tokens,
              CAST(len(regexp_extract_all(text, '[a-zA-Z]+'))
                 + len(regexp_extract_all(text, '[0-9]+'))
                 + len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT)
                AS n_bpe_tokens,
              round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                    / greatest(length(text), 1), 4) AS punct_ratio,
              round(len(list_filter({toks}, x -> list_contains(
                    {list(EN_STOPWORDS)!r}, x)))
                    / greatest(len({toks}), 1), 4) AS stopword_ratio,
              CASE WHEN len({toks}) > 0
                   THEN round(list_sum(list_transform({toks}, t -> length(t)))
                              / CAST(len({toks}) AS DOUBLE), 4)
                   ELSE 0.0 END AS mean_word_len
            FROM documents""",
        "quality_score": f"""
            WITH st AS (
              SELECT doc_id,
                CAST(len({toks}) AS BIGINT) AS n_tokens,
                round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                      / greatest(length(text), 1), 4) AS punct_ratio,
                CASE WHEN len({toks}) > 0
                     THEN round(list_sum(list_transform({toks}, t -> length(t)))
                                / CAST(len({toks}) AS DOUBLE), 4)
                     ELSE 0.0 END AS mean_word_len
              FROM documents)
            SELECT doc_id,
              round(least(n_tokens / 50.0, 1.0) * 0.4
                    + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10
                            THEN 1.0 ELSE 0.5 END) * 0.3
                    + greatest(0.0, 1.0 - punct_ratio * 4) * 0.3, 4) AS quality
            FROM st""",
        "language_id": f"""
            WITH h AS (
              SELECT doc_id,
                {lang_hits('de')} AS h_de, {lang_hits('en')} AS h_en,
                {lang_hits('es')} AS h_es, {lang_hits('fr')} AS h_fr
              FROM documents),
            m AS (SELECT doc_id, h_de, h_en, h_es, h_fr,
                         greatest(h_de, h_en, h_es, h_fr) AS mx FROM h)
            SELECT doc_id,
              CASE WHEN mx = 0 THEN 'und'
                   WHEN h_fr = mx THEN 'fr'
                   WHEN h_es = mx THEN 'es'
                   WHEN h_en = mx THEN 'en'
                   ELSE 'de' END AS pred_lang,
              mx AS marker_hits
            FROM m""",
        "doc_fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string(list_sort({shingles8}), chr(0))) AS fingerprint
            FROM documents""",
        "ann_topk_quantized": """
            WITH q AS (
              SELECT vec_id AS query_id,
                     list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qq
              FROM embeddings WHERE vec_id < 5),
            c AS (
              SELECT vec_id AS neighbor_id,
                     list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS cq
              FROM embeddings),
            d AS (
              SELECT query_id, neighbor_id,
                     CAST(list_sum(list_transform(range(1, len(cq) + 1),
                                                  i -> cq[i] * qq[i])) AS BIGINT) AS dot
              FROM c, q),
            r AS (SELECT query_id, neighbor_id,
                         CAST(row_number() OVER (
                           PARTITION BY query_id ORDER BY dot DESC, neighbor_id
                         ) AS INT) AS rank, dot
                  FROM d)
            SELECT query_id, neighbor_id, rank, dot FROM r WHERE rank <= 10""",
        "media_meta": """
            SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                   WHEN doc_id % 3 = 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS media_type,
              CAST(octet_length(encode(text || text)) AS BIGINT) AS n_bytes,
              CAST((doc_id * 7919) % 1920 + 1 AS INT) AS width,
              CAST((doc_id * 104729) % 1080 + 1 AS INT) AS height
            FROM documents""",
    }
    return {
        **extras,
        "list_chain_lengths": f"""{_T_CTE}
            SELECT conv_id AS doc_id,
                   concat('_:d', substr(sha256(conv_id), 1, 16), '_b0') AS head,
                   CAST(count(*) AS BIGINT) AS length
            FROM transcripts GROUP BY conv_id""",
        "fromrdf_roundtrip": f"""{_T_CTE}
            SELECT conv_id AS doc_id, CAST(count(*) AS BIGINT) AS n_list_items
            FROM transcripts GROUP BY conv_id""",
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
