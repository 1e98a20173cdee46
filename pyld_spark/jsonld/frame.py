"""JSON-LD 1.1 Framing (W3C JSON-LD Framing spec).

Behavioral parity: _frame/_match_frame/_filter_subjects/_cleanup_preserve
(/root/reference/lib/pyld/jsonld.py:727-870, 2877-2919, 4339-5071).

Spark role (SURVEY.md §2.8): per-document UDF. At corpus scale a frame's
top-level @id/@type/property constraints translate to DataFrame filters /
semi-joins on the triples table *before* per-document embedding — see
pyld_spark.operators.frame_stage.
"""

from __future__ import annotations

import copy

from pyld_spark.jsonld.context import arrayify, is_keyword
from pyld_spark.jsonld.errors import JsonLdError
from pyld_spark.jsonld.expand import is_list_object, is_value_object
from pyld_spark.jsonld.nodemap import (
    IdentifierIssuer,
    add_value,
    build_node_map,
    merge_node_map_graphs,
)


class FrameState:
    def __init__(self, graph_map: dict, graph: str, options: dict):
        self.graph_map = graph_map
        self.graph = graph
        self.graph_stack: list = []
        self.subject_stack: list = []
        self.link: dict = {}
        self.unique_embeds: dict = {graph: {}}
        self.bnodes_to_clear: set = set()
        self.options = options

    @property
    def subjects(self) -> dict:
        return self.graph_map.get(self.graph, {})


def frame_expanded(
    expanded_input: list,
    expanded_frame: list,
    options: dict | None = None,
) -> list:
    """Frame pre-expanded input with a pre-expanded frame; returns the framed
    array (pre-compaction, with @preserve markers intact)."""
    o = {
        "embed": "@once",
        "explicit": False,
        "requireAll": False,
        "omitDefault": False,
        "pruneBlankNodeIdentifiers": True,
        **(options or {}),
    }
    frame_keys = set()
    for f in expanded_frame:
        if isinstance(f, dict):
            frame_keys.update(f)
    use_default_graph = "@graph" in frame_keys

    node_map = build_node_map(copy.deepcopy(expanded_input), IdentifierIssuer("_:b"))
    if use_default_graph:
        graph = "@default"
    else:
        node_map = {**node_map, **merge_node_map_graphs(node_map)}
        graph = "@merged"
    state = FrameState(node_map, graph, o)

    result: list = []
    match_frame(state, sorted(state.subjects), expanded_frame, result, None)

    result = cleanup_preserve(result, state)
    if o["pruneBlankNodeIdentifiers"]:
        result = prune_bnode_ids(result, state)
    return result


def _get_flag(frame: dict, options: dict, name: str):
    value = frame.get("@" + name)
    if isinstance(value, list) and value:
        value = value[0]
    if isinstance(value, dict) and "@value" in value:
        value = value["@value"]
    if name == "embed":
        if value is True:
            return "@last"
        if value is False:
            return "@never"
        if value in ("@always", "@never", "@link", "@once", "@first", "@last"):
            return value
        if value is None:
            return options["embed"]
        raise JsonLdError(f"invalid @embed value: {value!r}", "invalid @embed value")
    if value is None:
        return options[name]
    return bool(value)


def _value_match(pattern: dict, value: dict) -> bool:
    v1, t1, l1 = value.get("@value"), value.get("@type"), value.get("@language")
    v2 = arrayify(pattern.get("@value"))
    t2 = arrayify(pattern.get("@type"))
    l2 = arrayify(pattern.get("@language"))
    if not v2 and not t2 and not l2:
        return True
    if not (not v2 or v1 in v2 or v2 == [{}]):
        return False
    if not (not t2 or t1 in t2 or (t2 == [{}] and t1 is not None)):
        return False
    l1n = l1.lower() if isinstance(l1, str) else l1
    l2n = [x.lower() if isinstance(x, str) else x for x in l2]
    if not (not l2 or l1n in l2n or (l2 == [{}] and l1 is not None)):
        return False
    return True


def _node_match(state: FrameState, pattern: dict, value: dict) -> bool:
    id_ = value.get("@id")
    if id_ is None:
        return False
    node = state.subjects.get(id_)
    if node is None:
        return False
    return filter_subject(state, node, pattern, flags={"requireAll": True})


def filter_subject(state: FrameState, subject: dict, frame: dict, flags: dict) -> bool:
    require_all = flags.get("requireAll", False)
    wildcard = True
    matches_some = False
    for key in sorted(frame):
        v = frame[key]
        has_key = key in subject
        if key == "@id":
            ids = v if isinstance(v, list) else [v]
            wildcard = False
            if ids == [] or ids == [{}]:
                matched = True
            else:
                matched = subject.get("@id") in ids
            if not matched:
                return False
            matches_some = True
            continue
        if key == "@type":
            wildcard = False
            types = v if isinstance(v, list) else [v]
            node_types = subject.get("@type", [])
            if types == []:
                matched = not node_types
            elif types == [{}]:
                matched = bool(node_types)
            elif any(isinstance(t, dict) and "@default" in t for t in types):
                matched = True
            else:
                matched = bool(set(types) & set(node_types))
            if not matched:
                return False
            matches_some = True
            continue
        if is_keyword(key):
            continue
        wildcard = False
        subframe = v[0] if isinstance(v, list) and v and isinstance(v[0], dict) else (
            v if isinstance(v, dict) else {}
        )
        has_default = isinstance(subframe, dict) and "@default" in subframe
        values = subject.get(key, [])
        if isinstance(v, list) and v == []:
            # match none: property must be absent
            if values:
                return False
            matches_some = True
            continue
        if has_default:
            matches_some = True
            continue
        if not values:
            if require_all:
                return False
            continue
        # property present: check value patterns
        if isinstance(v, list) and v and isinstance(v[0], dict) and v != [{}]:
            pat = v[0]
            if is_value_object(pat):
                if not any(
                    is_value_object(val) and _value_match(pat, val) for val in values
                ):
                    return False
            elif not is_list_object(pat) and "@value" not in pat and any(
                k2 for k2 in pat if not is_keyword(k2)
            ) or "@id" in pat or "@type" in pat:
                if "@value" not in pat and not is_list_object(pat):
                    if not any(
                        isinstance(val, dict) and "@id" in val
                        and _node_match(state, pat, val) for val in values
                    ):
                        return False
        matches_some = True
    return wildcard or matches_some


def filter_subjects(state: FrameState, subjects: list, frame: dict, flags: dict) -> dict:
    matches = {}
    for id_ in subjects:
        subject = state.subjects.get(id_)
        if subject is not None and filter_subject(state, subject, frame, flags):
            matches[id_] = subject
    return matches


def _creates_circular_reference(state: FrameState, id_: str) -> bool:
    return any(s["@id"] == id_ for s in state.subject_stack)


def add_frame_output(parent, property: str | None, output) -> None:
    if isinstance(parent, dict):
        add_value(parent, property, output)
    else:
        parent.append(output)


def _remove_embed(state: FrameState, id_: str) -> None:
    embeds = state.unique_embeds[state.graph]
    embed = embeds.get(id_)
    if embed is None:
        return
    parent, property = embed["parent"], embed["property"]
    subject_ref = {"@id": id_}
    if isinstance(parent, list):
        for i, v in enumerate(parent):
            if isinstance(v, dict) and v.get("@id") == id_:
                parent[i] = subject_ref
                break
    elif parent is not None:
        vals = parent.get(property, [])
        for i, v in enumerate(vals):
            if isinstance(v, dict) and v.get("@id") == id_:
                vals[i] = subject_ref
                break

    def remove_dependents(id2: str):
        for next_id in list(embeds):
            e = embeds.get(next_id)
            if e is None:
                continue
            p = e.get("parent")
            if isinstance(p, dict) and p.get("@id") == id2:
                del embeds[next_id]
                remove_dependents(next_id)

    del embeds[id_]
    remove_dependents(id_)


def _implicit_frame(flags: dict) -> list:
    """Wildcard child frame that carries the parent frame's flags
    (reference _create_implicit_frame, jsonld.py:4609-4623)."""
    return [{"@" + key: [value] for key, value in flags.items()}]


def _is_subject_reference(v) -> bool:
    return isinstance(v, dict) and set(v) == {"@id"}


def match_frame(state: FrameState, subjects: list, frame, parent, property,
                embedded: bool = False) -> None:
    frame_obj = {}
    if isinstance(frame, list):
        if frame and isinstance(frame[0], dict):
            frame_obj = frame[0]
    elif isinstance(frame, dict):
        frame_obj = frame
    options = state.options
    flags = {
        "embed": _get_flag(frame_obj, options, "embed"),
        "explicit": _get_flag(frame_obj, options, "explicit"),
        "requireAll": _get_flag(frame_obj, options, "requireAll"),
    }
    matches = filter_subjects(state, subjects, frame_obj, flags)

    for id_ in sorted(matches):
        subject = matches[id_]
        embed = flags["embed"]
        # each top-level match is a compartmentalized result: reset the
        # unique-embeds map (reference jsonld.py:4370-4376)
        if property is None:
            state.unique_embeds = {state.graph: {}}
        else:
            state.unique_embeds.setdefault(state.graph, {})
        output = {"@id": id_}
        if id_.startswith("_:"):
            state.bnodes_to_clear.discard(id_)

        if embed == "@link" and id_ in state.link:
            add_frame_output(parent, property, state.link[id_])
            continue

        state.link[id_] = output

        if embed in ("@first", "@last") and options.get(
            "processingMode", "json-ld-1.1"
        ) != "json-ld-1.0":
            raise JsonLdError(
                f"invalid value of @embed: {embed}", "invalid @embed value"
            )

        # node already embedded inside another top-level node: skip the
        # top-level copy (reference jsonld.py:4407-4410)
        if not embedded and id_ in state.unique_embeds[state.graph]:
            continue

        # only an *embedded* (non-top-level) occurrence degrades to a
        # reference under @never / circularity / repeated-@once
        if embedded and (
            embed == "@never" or _creates_circular_reference(state, id_)
        ):
            add_frame_output(parent, property, output)
            continue
        if embedded and embed in ("@first", "@once") and (
            id_ in state.unique_embeds[state.graph]
        ):
            add_frame_output(parent, property, output)
            continue
        if embed == "@last" and id_ in state.unique_embeds[state.graph]:
            _remove_embed(state, id_)
        state.unique_embeds[state.graph][id_] = {
            "parent": parent, "property": property,
        }

        state.subject_stack.append(subject)

        # named graph recursion (embedded resets — graph content is framed
        # from its own top level)
        if id_ in state.graph_map:
            recurse, subframe = False, [{}]
            if "@graph" not in frame_obj:
                recurse = state.graph != "@merged"
            else:
                sf = frame_obj["@graph"]
                subframe = sf if isinstance(sf, list) else [sf]
                if not (subframe and isinstance(subframe[0], dict)):
                    subframe = [{}]
                recurse = id_ not in ("@merged", "@default")
            if recurse:
                state.graph_stack.append(state.graph)
                state.graph = id_
                state.unique_embeds.setdefault(id_, {})
                match_frame(
                    state, sorted(state.subjects), subframe, output, "@graph",
                    embedded=False,
                )
                state.graph = state.graph_stack.pop()

        # @included subframe recursion
        if "@included" in frame_obj:
            match_frame(
                state, subjects, frame_obj["@included"], output, "@included",
                embedded=False,
            )

        for prop in sorted(subject):
            values = subject[prop]
            if is_keyword(prop):
                if prop not in ("@type", "@id"):
                    output[prop] = copy.deepcopy(values)
                    continue
                if prop == "@type":
                    for t in values:
                        if t.startswith("_:"):
                            state.bnodes_to_clear.discard(t)
                    output["@type"] = list(values)
                continue
            if flags["explicit"] and prop not in frame_obj:
                continue
            for item in values:
                subframe = frame_obj.get(prop)
                if isinstance(subframe, list) and subframe and isinstance(subframe[0], dict):
                    sub = subframe
                elif isinstance(subframe, dict):
                    sub = [subframe]
                else:
                    sub = _implicit_frame(flags)
                if is_list_object(item):
                    sf0 = sub[0] if sub else {}
                    if prop in frame_obj and isinstance(sf0, dict) and "@list" in sf0:
                        list_frame = sf0["@list"]
                    else:
                        list_frame = _implicit_frame(flags)
                    list_output = {"@list": []}
                    for li in item["@list"]:
                        if _is_subject_reference(li):
                            match_frame(
                                state, [li["@id"]], list_frame, list_output,
                                "@list", embedded=True,
                            )
                        else:
                            add_frame_output(
                                list_output, "@list", copy.deepcopy(li)
                            )
                    add_frame_output(output, prop, list_output)
                elif _is_subject_reference(item):
                    match_frame(
                        state, [item["@id"]], sub, output, prop, embedded=True
                    )
                else:
                    sf0 = sub[0] if sub and isinstance(sub[0], dict) else {}
                    if is_value_object(item) and is_value_object(sf0) and not _value_match(sf0, item):
                        continue
                    add_frame_output(output, prop, copy.deepcopy(item))

        # defaults
        for prop in sorted(frame_obj):
            if prop == "@type":
                types = frame_obj[prop]
                if not (
                    isinstance(types, list) and types
                    and isinstance(types[0], dict) and "@default" in types[0]
                ):
                    continue
            elif is_keyword(prop):
                continue
            pf = frame_obj[prop]
            pf0 = pf[0] if isinstance(pf, list) and pf and isinstance(pf[0], dict) else (
                pf if isinstance(pf, dict) else {}
            )
            omit = _get_flag(pf0, options, "omitDefault") if "@omitDefault" in pf0 else options["omitDefault"]
            if not omit and prop not in output:
                default = pf0.get("@default", "@null")
                if not isinstance(default, list):
                    default = [default]
                output[prop] = [{"@preserve": copy.deepcopy(default)}]

        # @reverse in frame
        for reverse_prop, subframe in sorted(frame_obj.get("@reverse", {}).items()) if isinstance(frame_obj.get("@reverse"), dict) else []:
            for subject_id, node in state.subjects.items():
                if any(
                    isinstance(v, dict) and v.get("@id") == id_
                    for v in node.get(reverse_prop, [])
                ):
                    rev = output.setdefault("@reverse", {})
                    rev.setdefault(reverse_prop, [])
                    match_frame(
                        state, [subject_id], subframe, rev[reverse_prop],
                        property, embedded=True,
                    )

        add_frame_output(parent, property, output)
        state.subject_stack.pop()


def cleanup_preserve(input_, state: FrameState):
    """Replace {'@preserve': [...]} with its content ('@null' → None later)."""
    if isinstance(input_, list):
        return [cleanup_preserve(v, state) for v in input_]
    if isinstance(input_, dict):
        if "@preserve" in input_:
            preserved = input_["@preserve"]
            if preserved == ["@null"] or preserved == "@null":
                # keep the marker through compaction; api._cleanup_null maps
                # it to JSON null afterwards (keeping the key)
                return "@null"
            result = cleanup_preserve(preserved, state)
            if isinstance(result, list) and len(result) == 1:
                return result[0]
            return result
        return {k: cleanup_preserve(v, state) for k, v in input_.items()}
    return input_


def _collect_bnode_refs(input_, counts: dict) -> None:
    if isinstance(input_, list):
        for v in input_:
            _collect_bnode_refs(v, counts)
    elif isinstance(input_, dict):
        for k, v in input_.items():
            if k == "@id" and isinstance(v, str) and v.startswith("_:"):
                counts[v] = counts.get(v, 0) + 1
            else:
                _collect_bnode_refs(v, counts)


def prune_bnode_ids(input_, state: FrameState):
    """Drop @id entries for blank nodes that are referenced exactly once."""
    counts: dict = {}
    _collect_bnode_refs(input_, counts)
    to_prune = {b for b, n in counts.items() if n == 1}

    def prune(v):
        if isinstance(v, list):
            return [prune(x) for x in v]
        if isinstance(v, dict):
            out = {}
            for k, val in v.items():
                if k == "@id" and val in to_prune and len(v) > 1:
                    continue
                out[k] = prune(val)
            return out
        return v

    return prune(input_)
