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
from pyspark.sql.types import StringType, StructField, StructType

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def frame_subject_filter(triples: DataFrame, expanded_frame: list) -> DataFrame:
    """Subjects matching the frame's top-level @type / @id / property
    constraints, as pure relational ops over (doc_id, subj, pred, ...).

    Returns distinct (doc_id, subj). This is the scale path: at 10^12 triples
    the frame prunes the corpus *before* any per-document work.
    """
    frame = expanded_frame[0] if expanded_frame else {}
    out = triples.select("doc_id", "subj").distinct()
    types = frame.get("@type")
    if isinstance(types, list) and types and not isinstance(types[0], dict):
        matching = (
            triples.filter(
                (F.col("pred") == RDF_TYPE) & F.col("obj_value").isin(types)
            )
            .select("doc_id", "subj")
            .distinct()
        )
        out = out.join(matching, ["doc_id", "subj"], "left_semi")
    ids = frame.get("@id")
    if isinstance(ids, list) and ids and not isinstance(ids[0], dict):
        out = out.filter(F.col("subj").isin(ids))
    for prop, pat in frame.items():
        if prop.startswith("@"):
            continue
        if pat == []:
            # match-none: subject must NOT have the property
            has = triples.filter(F.col("pred") == prop).select(
                "doc_id", "subj"
            ).distinct()
            out = out.join(has, ["doc_id", "subj"], "left_anti")
        else:
            has = triples.filter(F.col("pred") == prop).select(
                "doc_id", "subj"
            ).distinct()
            out = out.join(has, ["doc_id", "subj"], "left_semi")
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
    from pyld_spark.jsonld import api

    expanded_frame = api.expand(
        frame_doc, {"isFrame": True, "keepFreeFloatingNodes": True}
    )
    subjects = frame_subject_filter(triples, expanded_frame)
    candidate_docs = docs.join(
        subjects.select("doc_id").distinct(),
        docs[id_col] == F.col("doc_id"), "left_semi",
    )
    return frame_documents(candidate_docs, frame_doc, id_col=id_col)
