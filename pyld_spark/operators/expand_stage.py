"""Spark stages: JSON-LD documents → expanded form → RDF triples / canonical
N-Quads, as Arrow-batched transforms (``mapInArrow`` for the fat triples
stage — no pandas round-trip; ``mapInPandas`` for the thin per-doc outputs).

Scale design (SURVEY.md §3.1):
- the only shuffle in the whole doc path is the assembly ``groupBy(conv_id)``;
  expansion/toRDF/canonicalization are per-row ``mapInPandas`` (narrow, no
  exchange, pipelined with the scan);
- contexts: static pipeline contexts are processed once per *executor process*
  (module-level cache keyed by canonical JSON of the inline @context), not per
  document;
- blank nodes are doc-local (``_:b0``) and namespaced with a doc-id hash so
  the corpus-global triples table needs no global counter;
- spec errors never kill executors: they become quarantine rows
  (``error_code`` non-null), split off with :func:`split_quarantine`.
"""

from __future__ import annotations

import hashlib
import json
from collections import OrderedDict
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

TRIPLE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj_kind", StringType(), True),
        StructField("obj_value", StringType(), True),
        StructField("obj_datatype", StringType(), True),
        StructField("obj_language", StringType(), True),
        StructField("graph", StringType(), True),
        StructField("error_code", StringType(), True),
    ]
)

NQUADS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("nquads", StringType(), True),
        StructField("error_code", StringType(), True),
    ]
)

# executor-process-level LRU cache of processed contexts (keyed by canonical
# JSON); OrderedDict move-to-end on hit, evict oldest single entry at capacity
# so a pipeline cycling >64 distinct per-doc contexts keeps its working set
_CTX_CACHE: OrderedDict = OrderedDict()
_CTX_CACHE_MAX = 64


def _processed_context(ctx_value, base_url):
    from pyld_spark.jsonld.context import (
        DEFAULT_BASE_IRI, initial_context, process_context,
    )

    key = (json.dumps(ctx_value, sort_keys=True, default=str), base_url)
    cached = _CTX_CACHE.get(key)
    if cached is not None:
        _CTX_CACHE.move_to_end(key)
    if cached is None:
        while len(_CTX_CACHE) >= _CTX_CACHE_MAX:
            _CTX_CACHE.popitem(last=False)
        # the default base must be present BEFORE context processing — a
        # non-propagating context snapshots `previous` then (api.expand
        # applies the same rule)
        cached = process_context(
            initial_context(base=base_url or DEFAULT_BASE_IRI),
            ctx_value, base_url,
        )
        _CTX_CACHE[key] = cached
    return cached


def _doc_bnode_namespace(doc_id: str) -> str:
    # sha256 (not sha1): reproducible in both Spark SQL (sha2(x,256)) and
    # DuckDB (sha256(x)), so the oracle can reconstruct namespaced bnode ids
    return "_:d" + hashlib.sha256(doc_id.encode("utf-8")).hexdigest()[:16]


def _doc_to_quads(doc_json: str, base_url: str | None):
    """Parse → expand (context-cached) → node map → quads. Pure function."""
    from pyld_spark.jsonld.context import initial_context
    from pyld_spark.jsonld.expand import expand
    from pyld_spark.jsonld.rdf import to_rdf

    doc = json.loads(doc_json)
    preapplied = False
    if isinstance(doc, dict) and "@context" in doc:
        ctx = _processed_context(doc["@context"], base_url)
        doc = {k: v for k, v in doc.items() if k != "@context"}
        preapplied = True
    else:
        ctx = initial_context(base=base_url)
    expanded = expand(doc, context=ctx, base_url=base_url,
                      context_preapplied=preapplied)
    return to_rdf(expanded)


def docs_to_triples(
    docs: DataFrame,
    id_col: str = "conv_id",
    doc_col: str = "doc",
    base_url: str | None = None,
    namespace_bnodes: bool = True,
    base_col: str | None = None,
) -> DataFrame:
    """(doc_id, doc json) → flat triples table (+ quarantine rows).

    Narrow ``mapInArrow`` — scales linearly with input partitions; no
    shuffle, and no pandas round-trip: input strings come straight off the
    Arrow batch (``to_pylist``) and output columns are built as plain Python
    lists converted once to Arrow arrays. On the 2M-turn scaling corpus the
    pandas conversion both ways was the largest non-kernel cost of the
    stage (JVM→Python transport share), so this is the scale path.

    ``base_col`` names an optional per-document base-IRI column (e.g. the
    ``<base href>`` extracted by the HTML ingestion source); it overrides
    ``base_url`` row-wise when non-null.
    """

    def run(batches) -> Iterator:
        import pyarrow as pa

        from pyld_spark.jsonld.errors import JsonLdError

        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col)).to_pylist()
            djs = batch.column(batch.schema.get_field_index(doc_col)).to_pylist()
            if base_col is not None:
                bases = batch.column(
                    batch.schema.get_field_index(base_col)
                ).to_pylist()
            else:
                bases = None
            c_doc: list = []
            c_subj: list = []
            c_pred: list = []
            c_okind: list = []
            c_oval: list = []
            c_odt: list = []
            c_olang: list = []
            c_graph: list = []
            c_err: list = []
            for row_idx, (doc_id, doc_json) in enumerate(zip(ids, djs)):
                row_base = base_url
                if bases is not None and bases[row_idx] is not None:
                    row_base = bases[row_idx]
                try:
                    quads = _doc_to_quads(doc_json, row_base)
                except JsonLdError as e:
                    c_doc.append(doc_id)
                    for col in (c_subj, c_pred, c_okind, c_oval, c_odt,
                                c_olang, c_graph):
                        col.append(None)
                    c_err.append(e.code)
                    continue
                except Exception as e:  # noqa: BLE001 — quarantine, never crash
                    c_doc.append(doc_id)
                    for col in (c_subj, c_pred, c_okind, c_oval, c_odt,
                                c_olang, c_graph):
                        col.append(None)
                    c_err.append(f"internal error: {type(e).__name__}")
                    continue
                ns = _doc_bnode_namespace(doc_id) if namespace_bnodes else None

                def fix(v: str) -> str:
                    if ns is not None and v.startswith("_:"):
                        return ns + "_" + v[2:]
                    return v

                for subj, pred, obj, graph in quads:
                    sv = subj["value"]
                    if subj["type"] == "blank node":
                        sv = fix(sv)
                    pv = pred["value"]
                    if pred["type"] == "blank node":
                        pv = fix(pv)
                    ok = obj["type"]
                    if ok == "literal":
                        c_odt.append(obj.get("datatype"))
                        c_olang.append(obj.get("language"))
                        c_oval.append(obj["value"])
                    else:
                        c_odt.append(None)
                        c_olang.append(None)
                        c_oval.append(fix(obj["value"]) if ok == "blank node"
                                      else obj["value"])
                    c_doc.append(doc_id)
                    c_subj.append(sv)
                    c_pred.append(pv)
                    c_okind.append(ok)
                    c_graph.append(graph if graph == "@default" else fix(graph))
                    c_err.append(None)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(c, type=pa.string())
                    for c in (c_doc, c_subj, c_pred, c_okind, c_oval,
                              c_odt, c_olang, c_graph, c_err)
                ],
                names=[f.name for f in TRIPLE_SCHEMA.fields],
            )

    return docs.mapInArrow(run, TRIPLE_SCHEMA)


def docs_to_canonical_nquads(
    docs: DataFrame,
    id_col: str = "conv_id",
    doc_col: str = "doc",
    base_url: str | None = None,
    algorithm: str = "URDNA2015",
) -> DataFrame:
    """(doc_id, doc json) → per-document canonical N-Quads (``_:c14nN``).

    Valid because transcript bnodes are doc-local: canonicalization components
    never span documents (SURVEY.md §2.9); each doc canonicalizes
    independently and in parallel.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyld_spark.jsonld.canon import canonize_quads
        from pyld_spark.jsonld.errors import JsonLdError

        for pdf in batches:
            rows = []
            for doc_id, doc_json in zip(pdf[id_col], pdf[doc_col]):
                try:
                    quads = _doc_to_quads(doc_json, base_url)
                    rows.append((doc_id, canonize_quads(quads, algorithm), None))
                except JsonLdError as e:
                    rows.append((doc_id, None, e.code))
                except Exception as e:  # noqa: BLE001
                    rows.append((doc_id, None, f"internal error: {type(e).__name__}"))
            yield pd.DataFrame(rows, columns=["doc_id", "nquads", "error_code"])

    return docs.mapInPandas(run, NQUADS_SCHEMA)


def canonical_nquads_stats(canonical: DataFrame) -> DataFrame:
    """(doc_id, nquads) → (doc_id, n_lines, n_labels, nquads_sha256).

    Pure JVM projection over the canonicalization output. The emitted
    columns are SQL-reconstructable: for the transcript ontology every doc's
    blank nodes are an rdf:first/rest chain whose URDNA2015 labels finish in
    the first-degree-hash pass, so a SQL oracle can recompute the per-cell
    sha256 hashes, the sorted-hash label assignment, and the full sorted
    canonical N-Quads text — certifying the c14n engine end to end.
    """
    n_lines = (
        F.length("nquads")
        - F.length(F.replace(F.col("nquads"), F.lit("\n"), F.lit("")))
    ).cast("bigint")
    n_labels = F.size(
        F.array_distinct(F.expr("regexp_extract_all(nquads, '_:c14n[0-9]+', 0)"))
    ).cast("bigint")
    return canonical.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_labels.alias("n_labels"),
        F.sha2(F.col("nquads"), 256).alias("nquads_sha256"),
    )


def split_quarantine(combined: DataFrame):
    """Combined stage output → (good rows without error_code, quarantine)."""
    good = combined.filter(F.col("error_code").isNull()).drop("error_code")
    bad = combined.filter(F.col("error_code").isNotNull()).select("doc_id", "error_code")
    return good, bad
