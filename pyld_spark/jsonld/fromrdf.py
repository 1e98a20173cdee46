"""Serialize RDF as JSON-LD (fromRDF; W3C JSON-LD 1.1 API §8.3).

Behavioral parity: _from_rdf / _rdf_to_object
(/root/reference/lib/pyld/jsonld.py:2921-3196).

Spark role (SURVEY.md §2.6): per-graph/doc this runs in a pandas UDF; the
corpus-scale relational analogues (list reconstruction as bounded self-joins
on rdf:rest, referenced-once as groupBy(obj).count()==1) live in
pyld_spark.operators.fromrdf_stage.
"""

from __future__ import annotations

import json
import re

from pyld_spark.jsonld.nodemap import add_value
from pyld_spark.jsonld.rdf import (
    I18N_NS,
    RDF_FIRST,
    RDF_JSON,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

RDF_LIST = RDF_NS + "List"
RDF_VALUE = RDF_NS + "value"
RDF_LANGUAGE = RDF_NS + "language"
RDF_DIRECTION = RDF_NS + "direction"

_LANG_RE = re.compile(r"^[a-zA-Z]+(-[a-zA-Z0-9]+)*$")

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_DOUBLE_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def _is_bnode_id(v) -> bool:
    return isinstance(v, str) and v.startswith("_:")


def rdf_to_object(term: dict, use_native_types: bool, rdf_direction: str | None,
                  processing_mode: str = "json-ld-1.1"):
    """RDF term → JSON-LD value/node object (§8.3.2 step helper)."""
    if term["type"] in ("IRI", "blank node"):
        return {"@id": term["value"]}
    value = term["value"]
    datatype = term.get("datatype") or XSD_STRING
    rval: dict = {"@value": value}
    if term.get("language"):
        rval["@language"] = term["language"]
    elif datatype == RDF_JSON and processing_mode != "json-ld-1.0":
        rval["@type"] = "@json"
        try:
            rval["@value"] = json.loads(value)
        except ValueError as e:
            from pyld_spark.jsonld.errors import JsonLdError

            raise JsonLdError(
                f"invalid rdf:JSON literal: {e}", "invalid JSON literal"
            )
    elif rdf_direction == "i18n-datatype" and datatype.startswith(I18N_NS):
        lang_dir = datatype[len(I18N_NS):]
        lang, _, direction = lang_dir.partition("_")
        if lang:
            rval["@language"] = lang
        if direction:
            rval["@direction"] = direction
    elif use_native_types:
        if datatype == XSD_BOOLEAN:
            if value == "true":
                rval["@value"] = True
            elif value == "false":
                rval["@value"] = False
            else:
                rval["@type"] = datatype
        elif datatype == XSD_INTEGER and _INT_RE.match(value):
            rval["@value"] = int(value)
        elif datatype == XSD_DOUBLE and _DOUBLE_RE.match(value):
            rval["@value"] = float(value)
        elif datatype != XSD_STRING:
            rval["@type"] = datatype
    elif datatype != XSD_STRING:
        rval["@type"] = datatype
    return rval


def from_rdf(
    quads: list,
    use_native_types: bool = False,
    use_rdf_type: bool = False,
    rdf_direction: str | None = None,
    processing_mode: str = "json-ld-1.1",
) -> list:
    """Quads ``(subj_term, pred_term, obj_term, graph_name)`` → expanded
    JSON-LD array."""
    default_graph: dict = {}
    graph_map: dict = {"@default": default_graph}
    referenced_once: dict = {}
    compound_subjects: dict = {}

    for subj, pred, obj, name in quads:
        node_map = graph_map.setdefault(name, {})
        if rdf_direction == "compound-literal" and pred["value"] == RDF_DIRECTION:
            compound_subjects.setdefault(name, set()).add(subj["value"])
        if name != "@default" and name not in default_graph:
            default_graph[name] = {"@id": name}
        node = node_map.setdefault(subj["value"], {"@id": subj["value"]})
        if obj["type"] in ("IRI", "blank node"):
            node_map.setdefault(obj["value"], {"@id": obj["value"]})
        if (
            pred["value"] == RDF_TYPE
            and not use_rdf_type
            and obj["type"] in ("IRI", "blank node")
        ):
            add_value(node, "@type", obj["value"], allow_duplicate=False)
            continue
        value = rdf_to_object(obj, use_native_types, rdf_direction, processing_mode)
        add_value(node, pred["value"], value, allow_duplicate=False)
        if obj["type"] in ("IRI", "blank node"):
            oid = obj["value"]
            if oid == RDF_NIL:
                obj_node = node_map[oid]
                obj_node.setdefault("usages", []).append(
                    {"node": node, "property": pred["value"], "value": value}
                )
            elif oid in referenced_once:
                referenced_once[oid] = False
            elif obj["type"] == "blank node":
                referenced_once[oid] = {
                    "node": node, "property": pred["value"], "value": value,
                }

    # compound-literal decode (reference jsonld.py:3123-3185): rewrite
    # unshared rdf:value/language/direction bnodes into @direction values
    for name, cls in compound_subjects.items():
        graph_object = graph_map.get(name, {})
        for cl in sorted(cls):
            entry = referenced_once.get(cl)
            if not isinstance(entry, dict):
                continue
            value = entry["value"]
            cl_node = graph_object.get(cl)
            if cl_node is None or RDF_VALUE not in cl_node:
                continue
            value.pop("@id", None)
            value["@value"] = cl_node[RDF_VALUE][0]["@value"]
            if RDF_LANGUAGE in cl_node:
                lang = cl_node[RDF_LANGUAGE][0]["@value"]
                if not _LANG_RE.match(lang):
                    from pyld_spark.jsonld.errors import JsonLdError

                    raise JsonLdError(
                        f"invalid language tag: {lang}",
                        "invalid language-tagged string",
                    )
                value["@language"] = lang.lower()
            if RDF_DIRECTION in cl_node:
                d = cl_node[RDF_DIRECTION][0]["@value"]
                if d not in ("ltr", "rtl"):
                    from pyld_spark.jsonld.errors import JsonLdError

                    raise JsonLdError(
                        f"invalid direction: {d}", "invalid base direction"
                    )
                value["@direction"] = d
            graph_object.pop(cl, None)

    # list reconstruction (walk rdf:rest chains backwards from rdf:nil)
    for name, graph_object in graph_map.items():
        nil = graph_object.get(RDF_NIL)
        if nil is None:
            continue
        for usage in nil.get("usages", []):
            node, prop, head = usage["node"], usage["property"], usage["value"]
            list_, list_nodes = [], []
            while (
                prop == RDF_REST
                and _is_bnode_id(node.get("@id"))
                and isinstance(referenced_once.get(node["@id"]), dict)
                and isinstance(node.get(RDF_FIRST), list)
                and len(node[RDF_FIRST]) == 1
                and isinstance(node.get(RDF_REST), list)
                and len(node[RDF_REST]) == 1
                and (
                    set(node) <= {"@id", RDF_FIRST, RDF_REST}
                    or set(node) <= {"@id", RDF_FIRST, RDF_REST, "@type"}
                    and node.get("@type") == [RDF_LIST]
                )
            ):
                list_.append(node[RDF_FIRST][0])
                list_nodes.append(node["@id"])
                next_usage = referenced_once[node["@id"]]
                node, prop, head = (
                    next_usage["node"], next_usage["property"], next_usage["value"],
                )
                if not _is_bnode_id(node.get("@id")):
                    break
            # note: when prop == rdf:first the chain is nested inside another
            # list; `head` is that cell's rdf:first value object, and the
            # generic replacement below folds it in place (shared dicts).
            head.pop("@id", None)
            head["@list"] = list(reversed(list_))
            for nid in list_nodes:
                graph_object.pop(nid, None)
        nil.pop("usages", None)

    result = []
    for subject in sorted(default_graph):
        node = default_graph[subject]
        if subject in graph_map and subject != "@default":
            node["@graph"] = []
            graph_object = graph_map[subject]
            for s in sorted(graph_object):
                n = graph_object[s]
                n.pop("usages", None)
                if len(n) > 1:
                    node["@graph"].append(n)
        node.pop("usages", None)
        if len(node) > 1:
            result.append(node)
    return result
