"""Deserialize JSON-LD to RDF (toRDF) and RDF term/literal conversion
(W3C JSON-LD 1.1 API §8; reference parity: _graph_to_rdf/_object_to_rdf/
_list_to_rdf, /root/reference/lib/pyld/jsonld.py:3820-4034).

Terms are plain dicts ``{'type': 'IRI'|'blank node'|'literal', 'value': str,
'datatype'?: str, 'language'?: str}``; a quad adds ``'name'`` — the same
shape the reference uses, which flattens 1:1 onto the Spark triples schema
(subj, pred, obj_kind, obj_value, obj_datatype, obj_language, graph).
"""

from __future__ import annotations

import re

from pyld_spark.jsonld.context import is_keyword
from pyld_spark.jsonld.iri import is_absolute_iri
from pyld_spark.jsonld.jcs import canonicalize as jcs_canonicalize
from pyld_spark.jsonld.nodemap import IdentifierIssuer, build_node_map

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_JSON = RDF_NS + "JSON"
RDF_LANGSTRING = RDF_NS + "langString"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_DOUBLE = XSD_NS + "double"
XSD_INTEGER = XSD_NS + "integer"
XSD_STRING = XSD_NS + "string"
I18N_NS = "https://www.w3.org/ns/i18n#"

_DOUBLE_TRIM_RE = re.compile(r"(\d)0*E\+?(-)?0*(\d)")

# shared immutable term dicts (hot path: one per cons cell otherwise)
_RDF_FIRST_TERM = {"type": "IRI", "value": RDF_FIRST}
_RDF_REST_TERM = {"type": "IRI", "value": RDF_REST}
_RDF_NIL_TERM = {"type": "IRI", "value": RDF_NIL}


def canonical_double(value: float) -> str:
    """Canonical xsd:double form: %1.15E with zero-trimmed mantissa/exponent
    (reference: jsonld.py:6392-6394)."""
    return _DOUBLE_TRIM_RE.sub(r"\1E\2\3", f"{value:1.15E}")


def _is_double_valued(v) -> bool:
    # reference parity: integral floats (even 1e21) serialize as xsd:integer
    return isinstance(v, float) and not float(v).is_integer()


def object_to_rdf(item: dict, issuer: IdentifierIssuer, triples: list, graph_name: str,
                  rdf_direction: str | None = None):
    """Expanded value/node/list object → RDF term (or None to drop).

    ``item`` is always a dict here (node-map values and expanded list
    entries are value objects, node references, or list objects), so the
    hot path branches on key membership directly."""
    if "@value" not in item:
        if "@list" in item:
            return list_to_rdf(item["@list"], issuer, triples, graph_name,
                               rdf_direction)
        # node object / reference
        id_ = item.get("@id")
        if not isinstance(id_, str):
            return None
        if id_.startswith("_:"):
            return {"type": "blank node", "value": id_}
        if not is_absolute_iri(id_):
            return None
        return {"type": "IRI", "value": id_}

    value = item["@value"]
    datatype = item.get("@type")
    language = item.get("@language")
    direction = item.get("@direction")

    if datatype == "@json":
        value = jcs_canonicalize(value)
        datatype = RDF_JSON
    elif type(value) is bool:
        value = "true" if value else "false"
        datatype = datatype or XSD_BOOLEAN
    elif _is_double_valued(value):
        value = canonical_double(float(value))
        datatype = datatype or XSD_DOUBLE
    elif datatype == XSD_DOUBLE:
        # value is not a float here; canonicalize only when convertible,
        # else emit the lexical form unchanged (reference
        # jsonld.py:3948-3961 — never raise on e.g. "not-a-number")
        try:
            value = canonical_double(float(value))
        except (ValueError, TypeError):
            value = str(value)
    elif isinstance(value, (int, float)):
        value = "%d" % value
        datatype = datatype or XSD_INTEGER
    elif direction is not None and rdf_direction == "compound-literal":
        # emission order mirrors the reference: rdf:value, rdf:direction,
        # then rdf:language; language case preserved (expansion already
        # lowercased keyword @language — jsonld.py:3965-4002)
        bnode = issuer.get_id()
        term = {"type": "blank node", "value": bnode}
        subj = term
        triples.append((subj, {"type": "IRI", "value": RDF_NS + "value"},
                        {"type": "literal", "value": str(value), "datatype": XSD_STRING},
                        graph_name))
        triples.append((subj, {"type": "IRI", "value": RDF_NS + "direction"},
                        {"type": "literal", "value": direction, "datatype": XSD_STRING},
                        graph_name))
        if language is not None:
            triples.append((subj, {"type": "IRI", "value": RDF_NS + "language"},
                            {"type": "literal", "value": language,
                             "datatype": XSD_STRING}, graph_name))
        return term
    elif direction is not None and rdf_direction == "i18n-datatype":
        datatype = I18N_NS + f"{language or ''}_{direction}"
        value = str(value)
    else:
        value = str(value)
        if language is not None:
            datatype = datatype or RDF_LANGSTRING
        else:
            datatype = datatype or XSD_STRING

    literal = {"type": "literal", "value": value, "datatype": datatype}
    if language is not None and datatype == RDF_LANGSTRING:
        literal["language"] = language
    return literal


def list_to_rdf(items: list, issuer: IdentifierIssuer, triples: list, graph_name: str,
                rdf_direction: str | None = None):
    """@list → rdf:first/rest/nil cons-cell chain (reference
    jsonld.py:3878-3913). In the DataFrame path the same chain is produced
    with posexplode + lead() (pyld_spark.operators.rdf_stage)."""
    first = _RDF_FIRST_TERM
    rest = _RDF_REST_TERM
    nil = _RDF_NIL_TERM
    if not items:
        return nil
    # reference issuance order: each cell's bnode is issued immediately
    # before converting its item (nested lists interleave their cell ids)
    cells = []
    for item in items:
        subj = {"type": "blank node", "value": issuer.get_id()}
        obj = object_to_rdf(item, issuer, triples, graph_name, rdf_direction)
        cells.append((subj, obj))
    for i, (subj, obj) in enumerate(cells):
        if obj is not None:
            triples.append((subj, first, obj, graph_name))
        nxt = cells[i + 1][0] if i + 1 < len(cells) else nil
        triples.append((subj, rest, nxt, graph_name))
    return cells[0][0]


def node_map_to_quads(node_map: dict, issuer: IdentifierIssuer,
                      produce_generalized_rdf: bool = False,
                      rdf_direction: str | None = None) -> list:
    """node map → list of quads (subj_term, pred_term, obj_term, graph_name).

    Graph names are iterated in sorted order; relative-IRI graph names,
    subjects, predicates and objects are dropped per spec.
    """
    quads: list = []
    # predicate IRIs repeat across every subject: build each term dict once
    # (terms are treated as immutable downstream)
    pred_cache: dict = {"@type": {"type": "IRI", "value": RDF_TYPE}}
    # None keys (no-@id @set nodes) sort tolerantly and then skip below,
    # like any other non-IRI non-bnode name — the reference crashes first
    key = lambda k: (k is not None, k if k is not None else "")  # noqa: E731
    for graph_name in sorted(node_map, key=key):
        graph = node_map[graph_name]
        if graph_name == "@default":
            gname = "@default"
        elif not isinstance(graph_name, str):
            continue
        elif graph_name.startswith("_:"):
            gname = graph_name
        elif is_absolute_iri(graph_name):
            gname = graph_name
        else:
            continue
        for subject in sorted(graph, key=key):
            node = graph[subject]
            if not isinstance(subject, str):
                continue
            if subject.startswith("_:"):
                subj = {"type": "blank node", "value": subject}
            elif is_absolute_iri(subject):
                subj = {"type": "IRI", "value": subject}
            else:
                continue
            for prop in sorted(node):
                values = node[prop]
                if prop == "@type":
                    pred = pred_cache["@type"]
                    for t in values:
                        if isinstance(t, str) and t.startswith("_:"):
                            obj = {"type": "blank node", "value": t}
                        elif isinstance(t, str) and is_absolute_iri(t):
                            obj = {"type": "IRI", "value": t}
                        else:
                            continue
                        quads.append((subj, pred, obj, gname))
                    continue
                pred = pred_cache.get(prop)
                if pred is None:
                    if is_keyword(prop):
                        pred = False
                    elif prop.startswith("_:"):
                        pred = (
                            {"type": "blank node", "value": prop}
                            if produce_generalized_rdf else False
                        )
                    elif is_absolute_iri(prop):
                        pred = {"type": "IRI", "value": prop}
                    else:
                        pred = False
                    pred_cache[prop] = pred
                if pred is False:
                    continue
                for item in values:
                    obj = object_to_rdf(item, issuer, quads, gname, rdf_direction)
                    if obj is not None:
                        quads.append((subj, pred, obj, gname))
    return quads


def to_rdf(expanded: list, produce_generalized_rdf: bool = False,
           rdf_direction: str | None = None) -> list:
    """Expanded form → quads. One issuer spans node map + list bnodes so the
    ``_:bN`` label sequence matches the reference byte-for-byte."""
    issuer = IdentifierIssuer("_:b")
    node_map = build_node_map(expanded, issuer)
    return node_map_to_quads(node_map, issuer, produce_generalized_rdf, rdf_direction)


def to_rdf_dataset(expanded: list, produce_generalized_rdf: bool = False,
                   rdf_direction: str | None = None) -> dict:
    """Expanded form → the reference's RDF-dataset dict
    ({graph_name: [{subject, predicate, object}, …]}), PRESERVING empty
    named graphs: the reference seeds dataset[graph_name] for every
    node-map graph whose name is '@default' or passes _is_absolute_iri —
    bnode labels included (jsonld.py:1040-1044) — so a named graph with no
    triples survives the no-format dialect and round-trips through
    from_rdf as {'@id': …, '@graph': []} (soak wave N+25 find)."""
    issuer = IdentifierIssuer("_:b")
    node_map = build_node_map(expanded, issuer)
    quads = node_map_to_quads(node_map, issuer, produce_generalized_rdf, rdf_direction)
    key = lambda k: (k is not None, k if k is not None else "")  # noqa: E731
    dataset: dict = {}
    for graph_name in sorted(node_map, key=key):
        if graph_name == "@default" or (
            isinstance(graph_name, str)
            and (graph_name.startswith("_:") or is_absolute_iri(graph_name))
        ):
            dataset[graph_name] = []
    dataset.setdefault("@default", [])
    for s, p, obj, g in quads:
        dataset[g].append({"subject": s, "predicate": p, "object": obj})
    return dataset
