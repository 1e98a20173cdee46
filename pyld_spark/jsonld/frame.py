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
from pyld_spark.jsonld.iri import is_absolute_iri as _is_absolute_iri
from pyld_spark.jsonld.nodemap import (
    IdentifierIssuer,
    _sort_ids as _sorted_ids,
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
        # bnode id → list of OUTPUT objects created for it (reference
        # state['bnodeMap']); ids with exactly one output occurrence get
        # their @id pruned afterwards
        self.bnode_map: dict = {}
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
    match_frame(state, _sorted_ids(state.subjects), expanded_frame, result, None)

    result = cleanup_preserve(result, state)
    if o["pruneBlankNodeIdentifiers"]:
        # reference jsonld.py:2914-2917 + 5031-5032: prune @ids whose bnode
        # produced exactly ONE output object during framing — even when that
        # leaves an empty {} node
        to_prune = {
            id_ for id_, outs in state.bnode_map.items() if len(outs) == 1
        }
        result = prune_bnode_ids(result, to_prune)
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


def _is_empty_object(v) -> bool:
    return isinstance(v, dict) and not v


def _is_subject(v) -> bool:
    """A node object: an object that is not a value/@set/@list and either has
    more than one key or lacks @id (reference jsonld.py:6412-6427)."""
    return (
        isinstance(v, dict)
        and "@value" not in v
        and "@set" not in v
        and "@list" not in v
        and (len(v) > 1 or "@id" not in v)
    )


def _get_values(subject: dict, key: str) -> list:
    """get_values parity (reference jsonld.py:1224-1238): arrayified entry,
    [] when absent."""
    return arrayify(subject[key]) if key in subject else []


def validate_frame(frame) -> None:
    """Frame validation parity (reference _validate_frame,
    jsonld.py:4680-4718): a frame is a single object; top-level @id entries
    must be wildcards or absolute non-bnode IRIs; @type entries wildcards,
    @json, or absolute non-bnode IRIs."""
    if (
        not isinstance(frame, list)
        or len(frame) != 1
        or not isinstance(frame[0], dict)
    ):
        raise JsonLdError(
            "a JSON-LD frame must be a single object", "invalid frame"
        )
    f = frame[0]
    if "@id" in f:
        for id_ in arrayify(f["@id"]):
            if not (isinstance(id_, dict) or _is_absolute_iri(id_)) or (
                isinstance(id_, str) and id_.startswith("_:")
            ):
                raise JsonLdError("invalid @id in frame", "invalid frame")
    if "@type" in f:
        for t in arrayify(f["@type"]):
            if not (
                isinstance(t, dict) or t == "@json" or _is_absolute_iri(t)
            ) or (isinstance(t, str) and t.startswith("_:")):
                raise JsonLdError("invalid @type in frame", "invalid frame")


def _value_match(pattern: dict, value: dict) -> bool:
    """Value-pattern match parity (reference _value_match,
    jsonld.py:4946-4977): an empty pattern matches any value; otherwise the
    value's @type/@language must be absent when the pattern omits them
    (languages compared case-sensitively, as the reference does)."""
    v1, t1, l1 = value.get("@value"), value.get("@type"), value.get("@language")
    v2 = _get_values(pattern, "@value")
    t2 = _get_values(pattern, "@type")
    l2 = _get_values(pattern, "@language")
    if not v2 and not t2 and not l2:
        return True
    if not (v1 in v2 or (v2 and _is_empty_object(v2[0]))):
        return False
    if not (
        (not t1 and not t2) or (t1 in t2) or (t1 and t2 and _is_empty_object(t2[0]))
    ):
        return False
    return (
        (not l1 and not l2) or (l1 in l2) or (l1 and l2 and _is_empty_object(l2[0]))
    )


def _node_match(state: FrameState, pattern: dict, value: dict, flags: dict) -> bool:
    """Node-pattern match parity (reference _node_match, jsonld.py:4932-4944):
    the parent frame's flags flow through (NOT hard-coded requireAll)."""
    id_ = value.get("@id")
    if id_ is None:
        return False
    node = state.subjects.get(id_)
    return bool(node) and filter_subject(state, node, pattern, flags)


def filter_subject(state: FrameState, subject: dict, frame: dict, flags: dict) -> bool:
    """Subject-vs-frame match parity (reference _filter_subject,
    jsonld.py:4737-4861). Control-flow points the reference relies on:

    - @id: with requireAll=False the @id decision is returned IMMEDIATELY —
      later constraints cannot veto it (jsonld.py:4771-4772).
    - @type: same early return, but only on the specific-type branch
      (jsonld.py:4790-4791); @type:[] / @type:[{}] fall through.
    - a property pattern with @default only *skips* (no matches_some) when
      the node lacks the property; when present it is an ordinary object
      pattern (presence test).
    - non-value non-reference object patterns test presence only; deep
      matching happens during recursion, except {"@id": ...}-only references
      which recurse into filter_subject via _node_match.
    """
    require_all = flags.get("requireAll", False)
    wildcard = True
    matches_some = False
    for key in sorted(frame):
        v = frame[key]
        match_this = False
        node_values = _get_values(subject, key)
        is_empty = isinstance(v, list) and len(v) == 0

        if key == "@id":
            ids = v if isinstance(v, list) else [v]
            if len(ids) == 0 or _is_empty_object(ids[0]):
                match_this = True
            else:
                match_this = bool(node_values) and node_values[0] in ids
            if not require_all:
                return match_this
        elif key == "@type":
            wildcard = False
            types = v if isinstance(v, list) else [v]
            if is_empty:
                if node_values:
                    return False
                match_this = True
            elif len(types) == 1 and _is_empty_object(types[0]):
                match_this = bool(node_values)
            else:
                for tv in types:
                    if isinstance(tv, dict) and "@default" in tv:
                        match_this = True
                    elif not match_this:
                        match_this = tv in node_values
                if not require_all:
                    return match_this
        elif is_keyword(key):
            continue
        else:
            this_frame_vals = _get_values(frame, key)
            this_frame = this_frame_vals[0] if this_frame_vals else None
            has_default = False
            if this_frame is not None:
                validate_frame([this_frame])
                has_default = (
                    isinstance(this_frame, dict) and "@default" in this_frame
                )
            wildcard = False
            if not node_values and has_default:
                # skip, but allow match: a default fills in later
                continue
            if node_values and is_empty:
                # match none: property must be absent
                return False
            if this_frame is None:
                if node_values:
                    return False
                match_this = True
            elif is_list_object(this_frame):
                list_value = (
                    this_frame["@list"][0] if this_frame["@list"] else None
                )
                if node_values and is_list_object(node_values[0]):
                    node_list_values = node_values[0]["@list"]
                    if is_value_object(list_value):
                        match_this = any(
                            _value_match(list_value, lv)
                            for lv in node_list_values
                        )
                    elif _is_subject(list_value) or _is_subject_reference(
                        list_value
                    ):
                        match_this = any(
                            isinstance(lv, dict)
                            and _node_match(state, list_value, lv, flags)
                            for lv in node_list_values
                        )
            elif is_value_object(this_frame):
                match_this = any(
                    _value_match(this_frame, nv) for nv in node_values
                )
            elif _is_subject_reference(this_frame):
                match_this = any(
                    isinstance(nv, dict)
                    and _node_match(state, this_frame, nv, flags)
                    for nv in node_values
                )
            elif isinstance(this_frame, dict):
                match_this = bool(node_values)
            else:
                match_this = False

        if not match_this and require_all:
            return False
        matches_some = matches_some or match_this
    return wildcard or matches_some


def filter_subjects(state: FrameState, subjects: list, frame: dict, flags: dict) -> dict:
    matches = {}
    for id_ in subjects:
        subject = state.subjects.get(id_)
        if subject is not None and filter_subject(state, subject, frame, flags):
            matches[id_] = subject
    return matches


def _creates_circular_reference(state: FrameState, id_: str) -> bool:
    """Reference jsonld.py:4625-4642: the TOP stack entry (the immediate
    parent) is excluded — a direct self-reference embeds one level before
    the cycle is cut — and only same-graph ancestors count."""
    return any(
        entry["graph"] == state.graph and entry["subject"]["@id"] == id_
        for entry in state.subject_stack[:-1]
    )


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
    if isinstance(frame, dict):
        frame = [frame]
    # every recursion validates its frame (reference jsonld.py:4350)
    validate_frame(frame)
    frame_obj = frame[0]
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
        # link-cache check BEFORE the bnodeMap registration (reference
        # jsonld.py:4378-4395): a @link cache hit must NOT bump the bnode
        # occurrence count, or shared bnodes keep their @id where the
        # reference clears it (single-occurrence pruning)
        if embed == "@link" and id_ in state.link:
            add_frame_output(parent, property, state.link[id_])
            continue

        output = {"@id": id_}
        if isinstance(id_, str) and id_.startswith("_:"):
            state.bnode_map.setdefault(id_, []).append(output)

        state.link[id_] = output

        if embed in ("@first", "@last") and options.get("is11", True):
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

        state.subject_stack.append({"subject": subject, "graph": state.graph})

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
                    state, _sorted_ids(state.subjects), subframe, output, "@graph",
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
                    # bnode @type values count as output occurrences
                    # (reference jsonld.py:4487-4496)
                    for t in values:
                        if t.startswith("_:"):
                            state.bnode_map.setdefault(t, []).append(output)
                    output["@type"] = list(values)
                continue
            if flags["explicit"] and prop not in frame_obj:
                continue
            for item in values:
                # the subframe is taken VERBATIM when the property exists in
                # the frame — even [] — so recursion into subject references
                # validates it and raises 'invalid frame' for empty patterns
                # (reference jsonld.py:4504-4507 + the _match_frame
                # validation); implicit only when ABSENT
                if prop in frame_obj:
                    sub = frame_obj[prop]
                    if isinstance(sub, dict):
                        sub = [sub]
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
                    # non-list non-reference values pass through the value
                    # pattern unconditionally — even when the pattern is not
                    # itself a value object (reference jsonld.py:4550: a
                    # @type-only pattern has no @value list, so every literal
                    # fails its first check and is dropped)
                    sf0 = sub[0] if sub and isinstance(sub[0], dict) else {}
                    if not _value_match(sf0, item):
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
                    # the reference's reverse recursion misspells 'embedded'
                    # (jsonld.py:4595 'embeded'), so the embedded flag is NOT
                    # set — reverse-embedded nodes keep the caller's flag
                    match_frame(
                        state, [subject_id], subframe, rev[reverse_prop],
                        property, embedded=embedded,
                    )

        add_frame_output(parent, property, output)
        state.subject_stack.pop()


def cleanup_preserve(input_, state: FrameState, _memo: dict | None = None):
    """Replace {'@preserve': [...]} with its content ('@null' → None later).

    Identity-memoized: @link framing emits shared/cyclic structures, which
    must keep their sharing (and terminate) through the walk."""
    if _memo is None:
        _memo = {}
    if isinstance(input_, list):
        key = id(input_)
        if key in _memo:
            return _memo[key]
        out: list = []
        _memo[key] = out
        out.extend(cleanup_preserve(v, state, _memo) for v in input_)
        return out
    if isinstance(input_, dict):
        if "@preserve" in input_:
            preserved = input_["@preserve"]
            if preserved == ["@null"] or preserved == "@null":
                # keep the marker through compaction; api._cleanup_null maps
                # it to JSON null afterwards (keeping the key)
                return "@null"
            # reference parity (jsonld.py:5004 `input_['@preserve'][0]`):
            # only the FIRST preserved element survives cleanup — an
            # array-valued @default drops its tail. An EMPTY @preserve (a
            # frame `"@default": []`) crashes the reference with a bare
            # IndexError; we stay graceful and keep the empty array
            # (documented divergence, soak wave N+15).
            if isinstance(preserved, list) and not preserved:
                return []
            first = preserved[0] if isinstance(preserved, list) else preserved
            return cleanup_preserve(first, state, _memo)
        key = id(input_)
        if key in _memo:
            return _memo[key]
        outd: dict = {}
        _memo[key] = outd
        for k, v in input_.items():
            outd[k] = cleanup_preserve(v, state, _memo)
        return outd
    return input_


def prune_bnode_ids(input_, to_prune: set):
    """Drop @id entries for blank nodes with a single output occurrence
    (reference _cleanup_preserve @id pop, jsonld.py:5031-5032 — value
    objects never carry @id, so a plain tree walk matches). Identity-
    memoized for @link-framed shared/cyclic structures."""
    memo: dict = {}

    def prune(v):
        if isinstance(v, list):
            key = id(v)
            if key in memo:
                return memo[key]
            out: list = []
            memo[key] = out
            out.extend(prune(x) for x in v)
            return out
        if isinstance(v, dict):
            key = id(v)
            if key in memo:
                return memo[key]
            outd: dict = {}
            memo[key] = outd
            for k, val in v.items():
                if not (k == "@id" and val in to_prune):
                    outd[k] = prune(val)
            return outd
        return v

    return prune(input_)
