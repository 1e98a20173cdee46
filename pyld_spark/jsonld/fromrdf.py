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
import math
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

_BCP47_RE = re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")

_INT_RE = re.compile(r"^[+-]?\d+$")


def _is_bnode_id(v) -> bool:
    return isinstance(v, str) and v.startswith("_:")


def _is_value_object(v) -> bool:
    return isinstance(v, dict) and "@value" in v


def _single_rdf_value(node: dict, key: str) -> bool:
    vals = node.get(key)
    return isinstance(vals, list) and len(vals) == 1 and _is_value_object(vals[0])


_COMPOUND_KEYS = {"@id", RDF_VALUE, RDF_LANGUAGE, RDF_DIRECTION}


def _compound_literal_to_value(node_id: str, node: dict):
    """Value object for a compound-literal-shaped bnode, else None.

    Reference parity: jsonld.py:3123-3186 — the node must carry *only*
    rdf:value/rdf:direction (+ optional rdf:language); extra properties make
    it an ordinary node. The full rdf:value value object is copied (datatype
    and native value preserved) and the language tag's case is kept.
    """
    from pyld_spark.jsonld.errors import JsonLdError

    if (
        not node_id.startswith("_:")
        or set(node) - _COMPOUND_KEYS
        or RDF_VALUE not in node
        or RDF_DIRECTION not in node
    ):
        return None
    if not _single_rdf_value(node, RDF_VALUE):
        raise JsonLdError(
            "rdf:value must be a single value.", "invalid value object"
        )
    if not _single_rdf_value(node, RDF_DIRECTION):
        raise JsonLdError(
            "rdf:direction must be a single value.", "invalid base direction"
        )
    value = dict(node[RDF_VALUE][0])
    direction = node[RDF_DIRECTION][0].get("@value")
    if direction not in ("ltr", "rtl"):
        raise JsonLdError(
            f"invalid direction: {direction}", "invalid base direction"
        )
    if RDF_LANGUAGE in node:
        if not _single_rdf_value(node, RDF_LANGUAGE):
            raise JsonLdError(
                "rdf:language must be a single value.",
                "invalid language-tagged string",
            )
        language = node[RDF_LANGUAGE][0].get("@value")
        if not isinstance(language, str) or not _BCP47_RE.match(language):
            raise JsonLdError(
                f"invalid language tag: {language}",
                "invalid language-tagged string",
            )
        value["@language"] = language
    value["@direction"] = direction
    return value


def _rewrite_compound_literals(graph_object: dict) -> None:
    """Replace once-referenced compound-literal bnodes with @direction value
    objects, in place (runs before @list reconstruction so list items can be
    directional)."""
    compound_literals = {
        node_id: value
        for node_id, node in graph_object.items()
        if (value := _compound_literal_to_value(node_id, node)) is not None
    }
    if not compound_literals:
        return
    # locate references; only unshared (exactly-once) bnodes are rewritten —
    # shared bnodes carry graph identity and must stay @id references
    references: dict[str, list] = {}
    for node in graph_object.values():
        for key, values in node.items():
            if key == "@id" or not isinstance(values, list):
                continue
            for index, item in enumerate(values):
                if not (isinstance(item, dict) and set(item) == {"@id"}):
                    continue
                ref_id = item["@id"]
                if ref_id in compound_literals:
                    locations = references.setdefault(ref_id, [])
                    if len(locations) < 2:
                        locations.append((values, index))
    for node_id, value in compound_literals.items():
        locations = references.get(node_id, [])
        if len(locations) != 1:
            continue
        values, index = locations[0]
        values[index] = value
        del graph_object[node_id]


def rdf_to_object(term: dict, use_native_types: bool, rdf_direction: str | None,
                  processing_mode: str = "json-ld-1.1"):
    """RDF term → JSON-LD value/node object (§8.3.2 step helper).

    Branch order mirrors the reference (jsonld.py:4036-4106): JSON literal
    parse first, then native types (which win over the i18n-datatype decode),
    then i18n, then plain typed literal.
    """
    if term["type"] in ("IRI", "blank node"):
        return {"@id": term["value"]}
    value = term["value"]
    rval: dict = {"@value": value}
    if term.get("language"):
        rval["@language"] = term["language"]
        return rval
    datatype = term.get("datatype") or XSD_STRING
    if datatype == RDF_JSON and processing_mode != "json-ld-1.0":
        datatype = "@json"
        try:
            rval["@value"] = json.loads(value)
        except ValueError as e:
            from pyld_spark.jsonld.errors import JsonLdError

            raise JsonLdError(
                f"invalid rdf:JSON literal: {e}", "invalid JSON literal"
            )
    if use_native_types:
        converted = False
        if datatype == XSD_BOOLEAN:
            if value in ("true", "1"):
                rval["@value"] = True
                converted = True
            elif value in ("false", "0"):
                rval["@value"] = False
                converted = True
        elif datatype == XSD_INTEGER and _INT_RE.match(value):
            rval["@value"] = int(value)
            converted = True
        elif datatype == XSD_DOUBLE:
            # reference accepts anything float() accepts, but non-finite
            # results (e.g. "1e400" → inf) keep the typed string
            try:
                converted_value = float(value)
            except (ValueError, TypeError):
                pass
            else:
                if math.isfinite(converted_value):
                    rval["@value"] = converted_value
                    converted = True
        if not converted and datatype != XSD_STRING:
            rval["@type"] = datatype
    elif rdf_direction == "i18n-datatype" and datatype.startswith(I18N_NS):
        # the reference re.splits the WHOLE IRI on [#_] and unpacks exactly
        # three parts (jsonld.py:4098) — so the suffix must contain exactly
        # one '_'; @direction is then set UNCONDITIONALLY, even when empty
        # ('i18n#ar_' decodes to @direction: ""). Zero or 2+ underscores
        # crash the reference with a bare ValueError — this engine instead
        # keeps the plain typed literal (graceful divergence: a malformed
        # datatype must not kill a stage, and not decoding preserves the
        # original literal exactly)
        lang_dir = datatype[len(I18N_NS):]
        if lang_dir.count("_") == 1:
            lang, _, direction = lang_dir.partition("_")
            if lang:
                rval["@language"] = lang
            rval["@direction"] = direction
        else:
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
    graph_names: list | None = None,
) -> list:
    """Quads ``(subj_term, pred_term, obj_term, graph_name)`` → expanded
    JSON-LD array.

    ``graph_names`` (dataset-dict callers) carries EVERY graph key of the
    source dataset, triples or not: the reference seeds graph_map and the
    default-graph node per dataset ENTRY (jsonld.py:2934-2937), so an
    empty named graph still surfaces as {'@id': …, '@graph': []}."""
    default_graph: dict = {}
    graph_map: dict = {"@default": default_graph}
    referenced_once: dict = {}

    for name in graph_names or ():
        graph_map.setdefault(name, {})
        if name != "@default" and name not in default_graph:
            default_graph[name] = {"@id": name}

    for subj, pred, obj, name in quads:
        node_map = graph_map.setdefault(name, {})
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
            add_value(node, "@type", obj["value"])
            continue
        value = rdf_to_object(obj, use_native_types, rdf_direction, processing_mode)
        # duplicates allowed (reference jsonld.py:2964): distinct quads whose
        # decoded value objects are equal (e.g. "true" and "1" as booleans)
        # both appear
        add_value(node, pred["value"], value)
        if obj["type"] in ("IRI", "blank node"):
            oid = obj["value"]
            if oid == RDF_NIL:
                obj_node = node_map[oid]
                obj_node.setdefault("usages", []).append(
                    {"node": node, "property": pred["value"], "value": value}
                )
            elif oid in referenced_once:
                referenced_once[oid] = False
            else:
                # IRI objects are tracked too, not just bnodes (reference
                # jsonld.py:2977-2985) — that is what lets an IRI-named
                # list cell convert, via the post-advance bnode break
                referenced_once[oid] = {
                    "node": node, "property": pred["value"], "value": value,
                }

    # list reconstruction (walk rdf:rest chains backwards from rdf:nil)
    for name, graph_object in graph_map.items():
        # compound literals decode first so @list items can be directional
        if rdf_direction == "compound-literal":
            _rewrite_compound_literals(graph_object)
        nil = graph_object.get(RDF_NIL)
        if nil is None:
            continue
        for usage in nil.get("usages", []):
            node, prop, head = usage["node"], usage["property"], usage["value"]
            list_, list_nodes = [], []
            # NOTE: no bnode-ness requirement here — the reference checks
            # bnode-ness only AFTER advancing (jsonld.py:3044-3046), so an
            # IRI-named list cell IS converted (and, because
            # referenced_once is GLOBAL while usages are per-graph, its
            # single reference may live in ANOTHER graph — the walk then
            # crosses graphs and rewrites that usage site; soak-found,
            # round 4 fromRdf axis)
            while (
                prop == RDF_REST
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
