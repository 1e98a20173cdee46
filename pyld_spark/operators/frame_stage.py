"""Corpus-scale framing (SURVEY.md §2.8): a JSON-LD frame is the engine's
"query by example". The frame's top-level constraints become *relational
predicates on the triples table* (filter/semi-join — Catalyst prunes and
pushes them down) to select matching documents; full recursive embedding
then runs per document in an Arrow-batched UDF.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def frame_subject_filter(triples: DataFrame, expanded_frame: list) -> DataFrame:
    """Subjects matching the frame's top-level @type / @id / property
    constraints, as pure relational ops over (doc_id, subj, pred, ...).

    Returns distinct (doc_id, subj). This is the scale path: at 10^12 triples
    the frame prunes the corpus *before* any per-document work — so the
    candidate set is seeded from the most selective constraint (a filtered
    scan that Catalyst pushes down), never from a full-corpus distinct. Only
    a constraint-free wildcard frame pays the distinct-all shuffle.
    """
    frame = expanded_frame[0] if expanded_frame else {}
    types = frame.get("@type")
    has_type_constraint = (
        isinstance(types, list) and bool(types) and not isinstance(types[0], dict)
    )
    ids = frame.get("@id")
    has_id_constraint = (
        isinstance(ids, list) and bool(ids) and not isinstance(ids[0], dict)
    )
    props = [p for p in frame if not p.startswith("@")]
    required = [p for p in props if frame[p] != []]
    forbidden = [p for p in props if frame[p] == []]

    # seed: most selective positive constraint first (@type ≺ required
    # property ≺ wildcard). @id is a pure filter applied to any seed.
    if has_type_constraint:
        out = (
            triples.filter(
                (F.col("pred") == RDF_TYPE) & F.col("obj_value").isin(types)
            )
            .select("doc_id", "subj")
            .distinct()
        )
    elif required:
        out = (
            triples.filter(F.col("pred") == required[0])
            .select("doc_id", "subj")
            .distinct()
        )
        required = required[1:]
    else:
        # wildcard frame: every subject is a candidate
        out = triples.select("doc_id", "subj").distinct()
    if has_id_constraint:
        out = out.filter(F.col("subj").isin(ids))
    for prop in required:
        has = triples.filter(F.col("pred") == prop).select(
            "doc_id", "subj"
        ).distinct()
        out = out.join(has, ["doc_id", "subj"], "left_semi")
    for prop in forbidden:
        # match-none: subject must NOT have the property
        has = triples.filter(F.col("pred") == prop).select(
            "doc_id", "subj"
        ).distinct()
        out = out.join(has, ["doc_id", "subj"], "left_anti")
    return out


FRAMED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("framed", StringType(), True),
        StructField("error_code", StringType(), True),
    ]
)


def frame_documents(docs: DataFrame, frame_doc: dict,
                    id_col: str = "conv_id", doc_col: str = "doc") -> DataFrame:
    """Apply the full framing algorithm per document (Arrow-batched).

    Returns (doc_id, framed json, error_code)."""
    frame_json = json.dumps(frame_doc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyld_spark.jsonld import api
        from pyld_spark.jsonld.errors import JsonLdError

        frame = json.loads(frame_json)
        for pdf in batches:
            rows = []
            for doc_id, doc_json in zip(pdf[id_col], pdf[doc_col]):
                try:
                    framed = api.frame(json.loads(doc_json), frame)
                    rows.append((doc_id, json.dumps(framed, sort_keys=True), None))
                except JsonLdError as e:
                    rows.append((doc_id, None, e.code))
                except Exception as e:  # noqa: BLE001
                    rows.append((doc_id, None, f"internal error: {type(e).__name__}"))
            yield pd.DataFrame(rows, columns=["doc_id", "framed", "error_code"])

    return docs.mapInPandas(run, FRAMED_SCHEMA)


def frame_corpus(docs: DataFrame, triples: DataFrame, frame_doc: dict,
                 id_col: str = "conv_id") -> DataFrame:
    """End-to-end corpus framing: relational pre-filter on the triples table
    selects candidate documents, then per-document framing embeds them."""
    candidate_docs = _frame_candidates(docs, triples, frame_doc, id_col)
    return frame_documents(candidate_docs, frame_doc, id_col=id_col)


def _frame_candidates(docs: DataFrame, triples: DataFrame, frame_doc: dict,
                      id_col: str) -> DataFrame:
    from pyld_spark.jsonld import api

    expanded_frame = api.expand(
        frame_doc, {"isFrame": True, "keepFreeFloatingNodes": True}
    )
    subjects = frame_subject_filter(triples, expanded_frame)
    return docs.join(
        subjects.select("doc_id").distinct(),
        docs[id_col] == F.col("doc_id"), "left_semi",
    )


FRAMED_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("matched_type", StringType(), True),
        StructField("n_embedded_turns", LongType(), True),
        StructField("turns_md5", StringType(), True),
    ]
)


def frame_corpus_stats(docs: DataFrame, triples: DataFrame, frame_doc: dict,
                       id_col: str = "conv_id", list_prop: str = "turns") -> DataFrame:
    """Corpus framing with SQL-reconstructable output: for each matched
    document, the matched node's @type, the number of embedded ``list_prop``
    nodes, and md5 over the comma-joined embedded @ids *in list order* — so
    the DuckDB oracle certifies both the frame match set and the embedding
    order (the full framing algorithm runs; only the emitted columns are
    reduced to verifiable form)."""
    import hashlib

    frame_json = json.dumps(frame_doc)
    candidate_docs = _frame_candidates(docs, triples, frame_doc, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyld_spark.jsonld import api

        frame = json.loads(frame_json)
        for pdf in batches:
            rows = []
            for doc_id, doc_json in zip(pdf[id_col], pdf["doc"]):
                try:
                    framed = api.frame(json.loads(doc_json), frame)
                except Exception:  # noqa: BLE001 — quarantine, never crash
                    rows.append((doc_id, None, None, None))
                    continue
                nodes = framed.get("@graph", [framed])
                node = nodes[0] if nodes else {}
                t = node.get("@type")
                matched_type = t[0] if isinstance(t, list) and t else t
                items = node.get(list_prop)
                if isinstance(items, dict):
                    items = items.get("@list", [])
                if not isinstance(items, list):
                    items = []
                ids = [it.get("@id", "") for it in items if isinstance(it, dict)]
                rows.append((
                    doc_id,
                    matched_type if isinstance(matched_type, str) else None,
                    len(ids),
                    hashlib.md5(",".join(ids).encode("utf-8")).hexdigest(),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "matched_type", "n_embedded_turns", "turns_md5"],
            )

    return candidate_docs.mapInPandas(run, FRAMED_STATS_SCHEMA)
