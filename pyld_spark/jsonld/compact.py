"""JSON-LD 1.1 Compaction (W3C JSON-LD 1.1 API §4.3-4.5, §6).

Behavioral parity: _compact/_compact_iri/_select_term/_compact_value and
_get_inverse_context (/root/reference/lib/pyld/jsonld.py:1414-1982,
5073-5498, 6138-6228).

Spark role (SURVEY.md §2.7): per-document pandas UDF; the inverse context is
built once per processed context (cached on the Context object) and shipped
broadcast-style inside the UDF closure.
"""

from __future__ import annotations

from pyld_spark.jsonld.context import (
    Context,
    UNSET,
    arrayify,
    is_keyword,
    process_context,
)
from pyld_spark.jsonld.errors import JsonLdError
from pyld_spark.jsonld.expand import (
    is_graph_object,
    is_list_object,
    is_value_object,
)
from pyld_spark.jsonld.iri import relativize_iri, resolve_iri


def _sort_key(term: str):
    return (len(term), term)


def inverse_context(active: Context) -> dict:
    """Inverse Context Creation (§4.3.2), cached per Context instance."""
    if active._inverse is not None:
        return active._inverse
    inverse: dict = {}
    default_language = (active.default_language or "@none").lower()
    for term in sorted(active.terms, key=_sort_key):
        defn = active.terms[term]
        if defn is None or defn.iri is None:
            continue
        # absent @container keys as '@none'; an explicit EMPTY array keys
        # as '' and duplicates key verbatim ('@set@set') — both make the
        # term unselectable, exactly like the reference (jsonld.py:6166)
        container = (
            "".join(sorted(defn.container)) if defn.has_container else "@none"
        )
        entry = inverse.setdefault(defn.iri, {})
        tl_map = entry.setdefault(
            container, {"@language": {}, "@type": {}, "@any": {}}
        )
        tl_map["@any"].setdefault("@none", term)
        if defn.reverse:
            tl_map["@type"].setdefault("@reverse", term)
        elif defn.type == "@none":
            # registered under @none, not @any (reference jsonld.py:6180-6183)
            tl_map["@type"].setdefault("@none", term)
            tl_map["@language"].setdefault("@none", term)
            tl_map["@any"].setdefault("@none", term)
        elif defn.type is not None:
            tl_map["@type"].setdefault(defn.type, term)
        elif defn.language is not UNSET and defn.direction is not UNSET:
            lang = defn.language
            direction = defn.direction
            if lang and direction:
                key = f"{lang}_{direction}".lower()
            elif lang:
                key = lang.lower()
            elif direction:
                key = f"_{direction}"
            else:
                key = "@null"
            tl_map["@language"].setdefault(key, term)
        elif defn.language is not UNSET:
            key = defn.language.lower() if defn.language else "@null"
            tl_map["@language"].setdefault(key, term)
        elif defn.direction is not UNSET:
            key = f"_{defn.direction}" if defn.direction else "@none"
            tl_map["@language"].setdefault(key, term)
        else:
            # the reference's default-language entry ignores the default
            # @direction entirely (jsonld.py:6219-6226)
            tl_map["@language"].setdefault(default_language, term)
            tl_map["@language"].setdefault("@none", term)
            tl_map["@type"].setdefault("@none", term)
    active._inverse = inverse
    return inverse


def select_term(
    active: Context, iri: str, containers: list, type_language: str,
    preferred_values: list,
) -> str | None:
    inv = inverse_context(active)
    container_map = inv.get(iri, {})
    for container in containers:
        if container not in container_map:
            continue
        tl_map = container_map[container][type_language]
        for item in preferred_values:
            if item in tl_map:
                return tl_map[item]
    return None


def compact_iri(
    active: Context,
    iri: str | None,
    value=None,
    vocab: bool = False,
    reverse: bool = False,
    base_url: str | None = None,
) -> str | None:
    """IRI Compaction (§4.4.2)."""
    if iri is None:
        return None
    inv = inverse_context(active)
    if is_keyword(iri):
        # keyword alias fast path — value-shape-independent (reference
        # jsonld.py:5164-5174); keywords force vocab mode
        alias = inv.get(iri, {}).get("@none", {}).get("@type", {}).get("@none")
        if alias:
            return alias
        vocab = True
    if vocab and iri in inv:
        # the reference's default language here ignores the default
        # @direction (jsonld.py:5178)
        default_language = (active.default_language or "@none").lower()

        containers: list = []

        if isinstance(value, dict) and "@index" in value and not is_graph_object(value):
            containers += ["@index", "@index@set"]
        # a framing @preserve wrapper is transparent for container
        # selection (reference jsonld.py:5186-5188)
        if isinstance(value, dict) and "@preserve" in value:
            value = value["@preserve"][0]
        # most-specific container candidates derive from the VALUE SHAPE
        # alone, BEFORE the reverse/list branching (reference
        # jsonld.py:5190-5205) — in particular a reverse node reference
        # still offers the @id/@type-map containers, so a plain term with
        # @container @id compacts a reverse property and keys its id map
        if is_graph_object(value):
            if "@index" in value:
                containers += ["@graph@index", "@graph@index@set",
                               "@index", "@index@set"]
            if "@id" in value:
                containers += ["@graph@id", "@graph@id@set"]
            containers += ["@graph", "@graph@set", "@set"]
            if "@index" not in value:
                containers += ["@graph@index", "@graph@index@set"]
            if "@id" not in value:
                containers += ["@graph@id", "@graph@id@set"]
        elif isinstance(value, dict) and not is_value_object(value):
            # object non-value values (node references, @list objects) —
            # a None value (compacting a bare IRI like an @type entry)
            # gets no extra containers (reference jsonld.py:5204-5205)
            containers += ["@id", "@id@set", "@type", "@set@type"]

        type_language = "@language"
        type_language_value = "@null"

        if reverse:
            type_language = "@type"
            type_language_value = "@reverse"
            containers.append("@set")
        elif is_list_object(value):
            if "@index" not in value:
                containers.append("@list")
            lst = value["@list"]
            common_type = None
            common_language = default_language if not lst else None
            for item in lst:
                item_language, item_type = "@none", "@none"
                if is_value_object(item):
                    if "@direction" in item:
                        item_language = (
                            f"{item.get('@language', '')}_{item['@direction']}".lower()
                        )
                    elif "@language" in item:
                        item_language = item["@language"].lower()
                    elif "@type" in item:
                        item_type = item["@type"]
                    else:
                        item_language = "@null"
                else:
                    item_type = "@id"
                if common_language is None:
                    common_language = item_language
                elif common_language != item_language and is_value_object(item):
                    common_language = "@none"
                if common_type is None:
                    common_type = item_type
                elif common_type != item_type:
                    common_type = "@none"
                if common_language == "@none" and common_type == "@none":
                    break
            common_language = common_language or "@none"
            common_type = common_type or "@none"
            if common_type != "@none":
                type_language = "@type"
                type_language_value = common_type
            else:
                type_language_value = common_language
        else:
            if is_value_object(value):
                # branch ORDER mirrors the reference (jsonld.py:5271-5282):
                # a value with @language gets the language containers (and a
                # lang_dir key when it also carries @direction); a value
                # with @direction but NO @language gets only the '_dir' key
                # and NO language containers — so a @language-container
                # term is NOT selectable for it and compaction falls
                # through to vocab/CURIE (soak-found, options axis)
                if "@language" in value and "@index" not in value:
                    containers += ["@language", "@language@set"]
                    if value.get("@direction"):
                        type_language_value = (
                            f"{value['@language']}_{value['@direction']}".lower()
                        )
                    else:
                        type_language_value = value["@language"].lower()
                elif "@direction" in value and "@index" not in value:
                    type_language_value = f"_{value['@direction']}".lower()
                elif "@type" in value:
                    type_language = "@type"
                    type_language_value = value["@type"]
            else:
                type_language = "@type"
                type_language_value = "@id"
            containers.append("@set")

        containers.append("@none")
        if active.processing_mode != "json-ld-1.0":
            # low-priority @index candidates for OBJECT values only
            # (reference jsonld.py:5292-5295 `_is_object(value)`) — None and
            # marker strings fall through to vocab/CURIE
            if isinstance(value, dict) and "@index" not in value:
                containers += ["@index", "@index@set"]
            if is_value_object(value) and set(value) == {"@value"}:
                containers += ["@language", "@language@set"]

        preferred_values = []
        if type_language_value == "@reverse":
            preferred_values.append("@reverse")
        if type_language_value in ("@id", "@reverse") and isinstance(value, dict) and "@id" in value:
            candidate = compact_iri(active, value["@id"], vocab=True)
            cdef = active.terms.get(candidate)
            if cdef is not None and cdef.iri == value["@id"]:
                preferred_values += ["@vocab", "@id"]
            else:
                preferred_values += ["@id", "@vocab"]
        else:
            preferred_values.append(type_language_value)
            if is_list_object(value) and value.get("@list") == []:
                type_language = "@any"
        preferred_values.append("@none")
        if active.processing_mode != "json-ld-1.0":
            if "_" in str(type_language_value):
                preferred_values.append(
                    "_" + str(type_language_value).rpartition("_")[2]
                )
        term = select_term(active, iri, containers, type_language, preferred_values)
        if term is not None:
            return term

    if vocab and active.vocab is not None:
        if iri.startswith(active.vocab) and len(iri) > len(active.vocab):
            suffix = iri[len(active.vocab):]
            if suffix not in active.terms:
                return suffix

    # shortest CURIE
    candidate = None
    for term, defn in active.terms.items():
        if ":" in term:
            continue
        if (
            defn is None or defn.iri is None or defn.iri == iri
            or not iri.startswith(defn.iri) or not defn.prefix
        ):
            continue
        curie = term + ":" + iri[len(defn.iri):]
        is_usable = curie not in active.terms or (
            value is None and active.terms[curie].iri == iri
        )
        if is_usable and (
            candidate is None or _sort_key(curie) < _sort_key(candidate)
        ):
            candidate = curie
    if candidate is not None:
        return candidate

    # "IRI confused with prefix" guard
    for term, defn in active.terms.items():
        if defn is not None and defn.prefix and iri.startswith(term + ":"):
            raise JsonLdError(
                f"IRI {iri} confused with prefix {term}", "IRI confused with prefix"
            )

    if not vocab:
        if active.base is not None:
            base = active.base
            from pyld_spark.jsonld.iri import is_absolute_iri

            if not is_absolute_iri(base):
                # the reference's compact-side ladder anchors the stored
                # @base on the API base on EVERY relativization
                # (jsonld.py:5381: unresolve(iri, resolve(ctx_base, base)))
                # — for a RAW relative @base this is where it becomes
                # absolute; reference ValueErrors when the API base is
                # ''/None, this engine falls back to its synthetic document
                # base (same graceful class as the expansion-side anchor)
                from pyld_spark.jsonld.context import DEFAULT_BASE_IRI

                anchor = active.original_base or DEFAULT_BASE_IRI
                base = resolve_iri(anchor, base)
            return relativize_iri(base, iri)
    return iri


def compact_value(active: Context, active_property: str | None, value: dict):
    """Value Compaction — reference _compact_value ladder parity
    (jsonld.py:5388-5498), including its quirks: the bare-@value return
    checks only the default @language (NOT @direction); a matching
    @language alone compacts bare even when the value's @direction does not
    match the context's (and vice versa); a container-@index value's @index
    is dropped in the object fallback (the caller's index grouping carries
    it)."""
    defn = active.terms.get(active_property)

    if "@value" in value:
        type_ = defn.type if defn is not None else None
        language = (
            defn.language if defn is not None and defn.language is not UNSET
            else active.default_language
        )
        direction = (
            defn.direction if defn is not None and defn.direction is not UNSET
            else active.default_direction
        )
        container = defn.container if defn is not None else ()
        preserve_index = "@index" in value and "@index" not in container

        if not preserve_index and type_ != "@none":
            if "@type" in value and value["@type"] == type_:
                return value["@value"]
            if (
                "@language" in value and value["@language"] == language
                and "@direction" in value and value["@direction"] == direction
            ):
                return value["@value"]
            if "@language" in value and value["@language"] == language:
                return value["@value"]
            if "@direction" in value and value["@direction"] == direction:
                return value["@value"]

        key_count = len(value)
        is_value_only_key = key_count == 1 or (
            key_count == 2 and "@index" in value and not preserve_index
        )
        has_default_language = active.default_language is not None
        is_value_string = isinstance(value["@value"], str)
        has_null_mapping = (
            defn is not None and defn.language is not UNSET
            and defn.language is None
        )
        if (
            is_value_only_key
            and type_ != "@none"
            and (not has_default_language or not is_value_string or has_null_mapping)
        ):
            return value["@value"]

        rval = {}
        if preserve_index:
            rval[compact_iri(active, "@index", vocab=True)] = value["@index"]
        if "@type" in value:
            t = value["@type"]
            if isinstance(t, str):
                t = compact_iri(active, t, vocab=True)
            elif isinstance(t, list):
                t = [
                    compact_iri(active, x, vocab=True) if isinstance(x, str)
                    else x
                    for x in t
                ]
            # non-str/list @type (malformed skipExpansion input — the
            # reference crashes uncoded here) passes through as-is
            rval[compact_iri(active, "@type", vocab=True)] = t
        elif "@language" in value:
            rval[compact_iri(active, "@language", vocab=True)] = value["@language"]
        if "@direction" in value:
            rval[compact_iri(active, "@direction", vocab=True)] = value["@direction"]
        rval[compact_iri(active, "@value", vocab=True)] = value["@value"]
        return rval

    # subject reference
    from pyld_spark.jsonld.context import expand_iri

    ap_iri = (
        expand_iri(active, active_property, vocab=True)
        if active_property is not None
        else None
    )
    type_ = defn.type if defn is not None else None
    compacted = compact_iri(active, value["@id"], vocab=(type_ == "@vocab"))
    if type_ in ("@id", "@vocab") or ap_iri == "@graph":
        return compacted
    return {compact_iri(active, "@id", vocab=True): compacted}


def compact(
    active: Context,
    active_property: str | None,
    element,
    compact_arrays: bool = True,
    ordered: bool = True,
    base_url: str | None = None,
    loader=None,
    link_memo: dict | None = None,
):
    """Compaction Algorithm (§6.1.2).

    ``link_memo``: identity-keyed cache of already-compacted node objects,
    used by the @link framing path so SHARED (and cyclic) framed structures
    compact to shared/cyclic output instead of recursing forever. The
    reference's analogous options['link'] cache is dead code (an empty dict
    fails its own truthiness guard, jsonld.py:1456-1466, so reference
    link() RecursionErrors on cycles — deliberate divergence)."""
    if isinstance(element, list):
        result = []
        for item in element:
            compacted = compact(
                active, active_property, item, compact_arrays, ordered, base_url, loader, link_memo
            )
            if compacted is not None:
                result.append(compacted)
        defn = active.terms.get(active_property)
        container = defn.container if defn is not None else ()
        if (
            len(result) == 1
            and compact_arrays
            and active_property not in ("@graph", "@set")
            and "@list" not in container
            and "@set" not in container
        ):
            return result[0]
        return result

    if not isinstance(element, dict):
        return element

    # FIRST property-scoped context application (reference jsonld.py:
    # 1447-1451): runs before value compaction and before input_ctx is
    # captured, so value objects, @type VALUES and type-scoped lookups all
    # see the property-scoped context — including a nullifying
    # ``"@context": null``, which is why an embedded node under such a term
    # emits its @type as a full IRI (found by the round-4 framing soak)
    defn = active.terms.get(active_property)
    if defn is not None and defn.context is not UNSET:
        active = process_context(
            active, defn.context, defn.context_base,
            loader=loader, override_protected=True,
        )

    if "@value" in element or set(element) == {"@id"}:
        # value objects (and bare references) never proceed to node-object
        # processing — compact_value's result is final (it may legitimately
        # be a dict for @json values or uncompactable value objects)
        return compact_value(active, active_property, element)

    if is_list_object(element):
        # a nested list whose active property has a @list container
        # compacts to the bare inner array (reference jsonld.py:1485-1494);
        # every OTHER nested list falls through to generic node-object
        # processing, where the '@list' key routes through the property
        # loop — items compact under the '@list' alias (NOT the outer
        # term, so its @type coercion does not apply — soak-found, round 4)
        ldefn = active.terms.get(active_property)
        lcontainer = ldefn.container if ldefn is not None else ()
        if "@list" in lcontainer:
            return compact(
                active, active_property, element["@list"], compact_arrays,
                ordered, base_url, loader, link_memo,
            )

    # context for @type VALUES and type-scoped-context definition lookups —
    # post property-scoped application, pre revert (reference jsonld.py:1502)
    input_ctx = active
    # revert term-scoped context for new node objects (jsonld.py:1505-1507)
    if active.previous is not None:
        active = active.previous
    # SECOND property-scoped application, now from input_ctx against the
    # reverted context (reference jsonld.py:1509-1516) — a no-op when the
    # first application nullified the term's own definition away
    defn = input_ctx.terms.get(active_property)
    if defn is not None and defn.context is not UNSET:
        active = process_context(
            active, defn.context, defn.context_base,
            loader=loader, override_protected=True,
        )

    inside_reverse = active_property == "@reverse"
    result: dict = {}
    if link_memo is not None:
        # @link framing: a shared/cyclic framed node compacts ONCE PER
        # COMPACTION ENVIRONMENT; a later occurrence under the same active/
        # input context and property returns the same output object,
        # reproducing the input's sharing instead of recursing forever.
        # The environment is part of the key because the reference
        # recomputes every occurrence (its link cache is dead code), so a
        # node shared between two properties with different scoped
        # contexts legitimately compacts DIFFERENTLY at each site (e.g. a
        # term carrying ``"@context": null`` leaves the embedded copy's
        # @type as a full IRI — found by the round-4 link soak).
        # Cycle-cutting stays keyed by element identity alone: if this
        # element is already being compacted anywhere up the stack, return
        # that in-flight result (the reference RecursionErrors on every
        # cyclic input, so which environment wins there is unobservable).
        in_flight = link_memo.setdefault("__stack__", {})
        mid = id(element)
        if mid in in_flight:
            return in_flight[mid]
        memo_key = (mid, id(active), id(input_ctx), active_property)
        cached = link_memo.get(memo_key)
        if cached is not None:
            return cached
        link_memo[memo_key] = result
        in_flight[mid] = result
        # keep elements/contexts alive: id() keys are only stable while
        # the objects exist
        link_memo.setdefault("__pins__", []).append((element, active, input_ctx))

    if "@type" in element:
        # apply type-scoped contexts in sorted compacted-term order; the
        # scoped-context DEFINITION is looked up in input_ctx (pre-revert)
        compacted_types = sorted(
            compact_iri(active, t, vocab=True) for t in arrayify(element["@type"])
        )
        for cterm in compacted_types:
            tdef = input_ctx.terms.get(cterm)
            if tdef is not None and tdef.context is not UNSET:
                active = process_context(
                    active, tdef.context, tdef.context_base,
                    loader=loader, propagate=False,
                )

    keys = sorted(element) if ordered else list(element)
    for expanded_property in keys:
        expanded_value = element[expanded_property]

        if expanded_property == "@id":
            value = element["@id"]
            if value is None:
                # None-keyed @set node leaking out of the node map — the
                # reference crashes before reaching compaction here; we
                # stay graceful and pass the null through
                compacted = None
            else:
                compacted = (
                    compact_iri(active, value)
                    if isinstance(value, str)
                    else [compact_iri(active, v) for v in value]
                )
            alias = compact_iri(active, "@id", vocab=True)
            result[alias] = compacted
            continue

        if expanded_property == "@type":
            # @type VALUES compact against the pre-revert context
            # (reference jsonld.py:1568-1571 uses input_ctx)
            types = [
                compact_iri(input_ctx, t, vocab=True) for t in arrayify(expanded_value)
            ]
            alias = compact_iri(active, "@type", vocab=True)
            type_def = active.terms.get(alias)
            # a singleton @type unwraps UNCONDITIONALLY — compactArrays
            # does not gate it (reference jsonld.py:1572-1590: the unwrap
            # happens before add_value; only a 1.1 @set container or an
            # empty value forces an array). Soak-found, options axis.
            as_array = (
                active.processing_mode != "json-ld-1.0"
                and type_def is not None
                and "@set" in type_def.container
            ) or not types
            result[alias] = types if (len(types) > 1 or as_array) else types[0]
            continue

        if expanded_property == "@reverse":
            compacted = compact(
                active, "@reverse", expanded_value, compact_arrays, ordered,
                base_url, loader, link_memo,
            )
            for prop in list(compacted):
                pdef = active.terms.get(prop)
                if pdef is not None and pdef.reverse:
                    value = compacted.pop(prop)
                    as_array = not compact_arrays or "@set" in pdef.container
                    _add_compacted(result, prop, value, as_array)
            if compacted:
                alias = compact_iri(active, "@reverse", vocab=True)
                result[alias] = compacted
            continue

        if expanded_property == "@preserve":
            compacted = compact(
                active, active_property, expanded_value, compact_arrays, ordered,
                base_url, loader, link_memo,
            )
            if compacted != []:
                result["@preserve"] = compacted
            continue

        if expanded_property == "@index":
            if defn is not None and "@index" in defn.container:
                continue
            alias = compact_iri(active, "@index", vocab=True)
            result[alias] = expanded_value
            continue

        if expanded_property in ("@direction", "@language", "@value"):
            alias = compact_iri(active, expanded_property, vocab=True)
            result[alias] = expanded_value
            continue

        if expanded_property == "@included":
            compacted = compact(
                active, "@included", expanded_value, compact_arrays, ordered,
                base_url, loader, link_memo,
            )
            alias = compact_iri(active, "@included", vocab=True)
            result[alias] = compacted
            continue

        if expanded_property == "@graph":
            compacted = compact(
                active, "@graph", expanded_value, compact_arrays, ordered,
                base_url, loader, link_memo,
            )
            alias = compact_iri(active, "@graph", vocab=True)
            result[alias] = compacted
            continue

        if is_keyword(expanded_property) and expanded_property != "@list":
            # keywords other than @graph/@list/@included (@graph/@included
            # handled above, @list flows into the regular property loop like
            # the reference's): ALIAS the key and add the value AS-IS — no
            # value compaction, add_value list-unwrapping semantics
            # (reference jsonld.py:1656-1666)
            alias = compact_iri(active, expanded_property)
            vals = (
                expanded_value if isinstance(expanded_value, list)
                else [expanded_value]
            )
            for v in vals:
                if alias not in result:
                    result[alias] = v
                else:
                    if not isinstance(result[alias], list):
                        result[alias] = [result[alias]]
                    result[alias].append(v)
            continue

        # regular property
        if not isinstance(expanded_value, list):
            # malformed "expanded" input (reachable only via the public
            # skipExpansion option): the reference crashes with an uncoded
            # JsonLdError; we stay graceful and treat it as a singleton
            expanded_value = [expanded_value]
        if not expanded_value:
            item_active_property = compact_iri(
                active, expanded_property, value=None,
                vocab=True, reverse=inside_reverse,
            )
            nest_result, container = _nest_target(
                active, result, item_active_property
            )
            # explicit empty-property emission (direct set: _add_compacted
            # treats [] as add_value's no-op)
            nest_result.setdefault(item_active_property, [])
            continue

        for expanded_item in expanded_value:
            item_active_property = compact_iri(
                active, expanded_property, value=expanded_item,
                vocab=True, reverse=inside_reverse,
            )
            nest_result, container = _nest_target(active, result, item_active_property)
            idef = active.terms.get(item_active_property)
            as_array = not compact_arrays or "@set" in container

            inner = expanded_item
            if is_list_object(expanded_item):
                inner = expanded_item["@list"]
            elif is_graph_object(expanded_item):
                inner = expanded_item["@graph"]

            compacted_item = compact(
                active, item_active_property,
                inner if (is_list_object(expanded_item) or is_graph_object(expanded_item))
                else expanded_item,
                compact_arrays, ordered, base_url, loader, link_memo,
            )

            if is_list_object(expanded_item):
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if "@list" in container:
                    nest_result[item_active_property] = compacted_item
                    continue
                # wrap with the @list alias, then FALL THROUGH — a wrapped
                # list item still participates in container maps and the
                # final-add arrayify rule (reference jsonld.py:1748-1763
                # does not continue here; soak-found, round 4)
                alias = compact_iri(active, "@list", vocab=True)
                wrapped = {alias: compacted_item}
                if "@index" in expanded_item:
                    idx_alias = compact_iri(active, "@index", vocab=True)
                    wrapped[idx_alias] = expanded_item["@index"]
                compacted_item = wrapped

            if is_graph_object(expanded_item):
                compacted_item = _compact_graph_item(
                    active, nest_result, item_active_property, expanded_item,
                    compacted_item, container, compact_arrays, as_array,
                )
                continue

            if not isinstance(expanded_item, dict):
                # a framing '@null'/@preserve marker (our cleanup runs
                # before compaction, unlike the reference's) — bypass any
                # container grouping; api._cleanup_null maps it to JSON null
                _add_compacted(
                    nest_result, item_active_property, compacted_item, as_array
                )
                continue

            if {"@language", "@index", "@id", "@type"}.intersection(container) and "@graph" not in container:
                map_object = nest_result.setdefault(item_active_property, {})
                if "@language" in container:
                    key = expanded_item.get("@language")
                    if is_value_object(expanded_item):
                        compacted_item = expanded_item["@value"] if "@language" in expanded_item or set(expanded_item) <= {"@value", "@language"} else compacted_item
                elif "@index" in container:
                    index_key = idef.index if idef is not None and idef.index else "@index"
                    if index_key == "@index":
                        # the reference only DELETES the compacted @index
                        # entry (jsonld.py:1861-1870) — it never unwraps a
                        # single-entry node; a node holding one property
                        # stays a node inside the index map (soak-found:
                        # expansion turns {"@graph": [...]} under a plain
                        # @index container into @index="@graph" on the
                        # inner NODE, which must survive compaction whole)
                        key = expanded_item.get("@index")
                        if isinstance(compacted_item, dict):
                            idx_alias = compact_iri(active, "@index", vocab=True)
                            compacted_item.pop(idx_alias, None)
                    else:
                        # property-valued index: expand the term's @index
                        # mapping, take the FIRST expanded index value, and
                        # RE-COMPACT the index property WITH that value —
                        # term selection can depend on it, and the map key
                        # is extracted from the COMPACTED item under that
                        # re-compacted key (reference jsonld.py:1873-1908;
                        # soak-found, options axis: the old code looked up
                        # the raw index IRI and always missed)
                        from pyld_spark.jsonld.context import expand_iri as _xiri

                        expanded_index_key = _xiri(active, index_key, vocab=True)
                        index_values = arrayify(
                            expanded_item.get(expanded_index_key, [])
                        )
                        index_value = index_values[0] if index_values else None
                        container_key = compact_iri(
                            active, expanded_index_key, index_value, vocab=True
                        )
                        indexes = []
                        if isinstance(compacted_item, dict):
                            indexes = arrayify(
                                compacted_item.get(container_key, [])
                            )
                        key = None
                        if indexes and isinstance(indexes[0], str):
                            key = indexes.pop(0)
                            if not indexes:
                                del compacted_item[container_key]
                            elif len(indexes) == 1:
                                compacted_item[container_key] = indexes[0]
                            else:
                                compacted_item[container_key] = indexes
                elif "@id" in container:
                    id_alias = compact_iri(active, "@id", vocab=True)
                    key = None
                    if isinstance(compacted_item, dict) and id_alias in compacted_item:
                        key = compacted_item.pop(id_alias)
                    if isinstance(compacted_item, dict) and not compacted_item:
                        compacted_item = {}
                else:  # @type container
                    type_alias = compact_iri(active, "@type", vocab=True)
                    key = None
                    if isinstance(compacted_item, dict) and type_alias in compacted_item:
                        types = arrayify(compacted_item[type_alias])
                        if types:
                            key = types[0]
                            rest = types[1:]
                            if rest:
                                compacted_item[type_alias] = (
                                    rest[0] if len(rest) == 1 and compact_arrays else rest
                                )
                            else:
                                compacted_item.pop(type_alias)
                    if (
                        isinstance(compacted_item, dict)
                        and len(compacted_item) == 1
                        and "@id" in expanded_item
                    ):
                        recompacted = compact(
                            active, item_active_property, {"@id": expanded_item["@id"]},
                            compact_arrays, ordered, base_url, loader, link_memo,
                        )
                        compacted_item = recompacted
                if not key:
                    # missing map keys compact the @none KEYWORD, so a term
                    # aliasing @none wins over the literal (reference
                    # jsonld.py:1948 via the keyword-alias fast path in
                    # _compact_iri — soak-found, round 4 link axis)
                    key = compact_iri(active, "@none")
                _add_compacted(map_object, key, compacted_item, as_array)
                continue

            if isinstance(compacted_item, list) and not compacted_item:
                # reference parity: an originally-empty JSON array value sets
                # the property to [] directly (post-unwrap empties drop)
                nest_result.setdefault(item_active_property, [])
                continue
            # reference parity: compactArrays unwraps ANY singleton list
            # value (including @json literal arrays)
            if (
                compact_arrays
                and isinstance(compacted_item, list)
                and len(compacted_item) == 1
                and not ({"@set", "@list"}.intersection(container))
            ):
                compacted_item = compacted_item[0]
            # reference's final-add arrayify rule (jsonld.py:1962-1969):
            # a @list-container property and the '@list'/'@graph' keys
            # themselves always hold arrays
            if "@list" in container or expanded_property in ("@list", "@graph"):
                as_array = True
            _add_compacted(nest_result, item_active_property, compacted_item, as_array)

    if link_memo is not None:
        # this element is no longer being built — a later occurrence under
        # a DIFFERENT environment must recompute, not alias this result
        link_memo["__stack__"].pop(id(element), None)
    return result


def _compact_graph_item(
    active, nest_result, item_active_property, expanded_item, compacted_item,
    container, compact_arrays, as_array,
):
    graph_alias = compact_iri(active, "@graph", vocab=True)
    if "@graph" in container and "@id" in container:
        map_object = nest_result.setdefault(item_active_property, {})
        # the reference keys graph-id maps on the RAW expanded @id (no
        # compaction — jsonld.py:1788-1791); only a MISSING id compacts the
        # @none keyword (term aliases win — soak-found, round 4)
        key = expanded_item.get("@id") or compact_iri(active, "@none")
        _add_compacted(map_object, key, compacted_item, as_array)
    elif "@graph" in container and "@index" in container and _is_simple_graph(expanded_item):
        map_object = nest_result.setdefault(item_active_property, {})
        key = expanded_item.get("@index") or compact_iri(active, "@none")
        _add_compacted(map_object, key, compacted_item, as_array)
    elif "@graph" in container and _is_simple_graph(expanded_item):
        if isinstance(compacted_item, list) and len(compacted_item) > 1:
            compacted_item = {graph_alias: compacted_item}
        _add_compacted(nest_result, item_active_property, compacted_item, as_array)
    else:
        wrapped = {graph_alias: compacted_item if isinstance(compacted_item, list) else [compacted_item] if not compact_arrays else compacted_item}
        if "@id" in expanded_item:
            wrapped[compact_iri(active, "@id", vocab=True)] = compact_iri(
                active, expanded_item["@id"]
            )
        if "@index" in expanded_item:
            wrapped[compact_iri(active, "@index", vocab=True)] = expanded_item["@index"]
        _add_compacted(nest_result, item_active_property, wrapped, as_array)
    return compacted_item


def _is_simple_graph(v) -> bool:
    return is_graph_object(v) and "@id" not in v


def _nest_target(active: Context, result: dict, item_active_property: str):
    defn = active.terms.get(item_active_property)
    container = defn.container if defn is not None else ()
    if defn is not None and defn.nest is not None:
        nest_term = defn.nest
        if nest_term != "@nest":
            ndef = active.terms.get(nest_term)
            if ndef is None or ndef.iri != "@nest":
                raise JsonLdError(
                    "@nest term must expand to @nest", "invalid @nest value"
                )
        nest_result = result.setdefault(nest_term, {})
        return nest_result, container
    return result, container


def _add_compacted(target: dict, key: str, value, as_array: bool) -> None:
    """Reference add_value semantics: list values append item by item (an
    empty list adds nothing; a singleton collapses to a scalar unless
    as_array)."""
    if isinstance(value, list):
        for v in value:
            _add_compacted(target, key, v, as_array)
        return
    if key in target:
        existing = target[key]
        if not isinstance(existing, list):
            existing = [existing]
            target[key] = existing
        existing.append(value)
    else:
        target[key] = [value] if as_array else value
