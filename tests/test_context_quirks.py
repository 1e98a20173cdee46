"""Deterministic regressions for reference context-machinery quirks.

Each case was found by the random-context fuzz (test_property_contexts) and
verified against the reference processor; these pin the behavior with fixed
inputs so a regression is caught without relying on fuzz luck. The quirk
sources are cited at the mirroring sites:

- pyld_spark/jsonld/context.py (mode/direction clone-drops, @base raw keep,
  scoped-context validation ordering, term-definition ordering)
- pyld_spark/jsonld/expand.py (generic keyword fallthrough, nested lists,
  null type-scoped skip)
- pyld_spark/jsonld/compact.py (value-compaction ladder, input_ctx @type)
"""

from __future__ import annotations

import json

import pytest

from pyld_spark.jsonld import api
from pyld_spark.jsonld.errors import JsonLdError

EX = "http://e/"
P = EX + "p"


def _expand(doc, opts=None):
    return api.expand(json.loads(json.dumps(doc)), dict(opts or {}))


# ---------------------------------------------------------------------------
# generic keyword fallthrough in expansion (reference jsonld.py:2648-2727)

KEYWORD_FALLTHROUGH_CASES = [
    # (doc, expected expansion)
    ({"@context": {"t": "@none"}, "t": "", "@id": EX + "n"},
     [{"@id": EX + "n", "@none": [""]}]),
    ({"@none": "x", P: "v"},
     [{"@none": ["x"], P: [{"@value": "v"}]}]),
    ({"@explicit": True, "@id": EX + "n", P: "v"},
     [{"@explicit": [True], "@id": EX + "n", P: [{"@value": "v"}]}]),
    ({"@omitDefault": False, P: "v"},
     [{"@omitDefault": [False], P: [{"@value": "v"}]}]),
    ({"@requireAll": True, P: "v"},
     [{"@requireAll": [True], P: [{"@value": "v"}]}]),
    ({"@embed": "@once", P: "v"},
     [{"@embed": ["@once"], P: [{"@value": "v"}]}]),
    ({"@preserve": "x", P: "v"},
     [{"@preserve": ["x"], P: [{"@value": "v"}]}]),
    ({"@base": "b", P: "v"},
     [{"@base": ["b"], P: [{"@value": "v"}]}]),
    ({"@vocab": "v", P: "v"},
     [{"@vocab": ["v"], P: [{"@value": "v"}]}]),
    ({"@version": 1.1, P: "v"},
     [{"@version": [1.1], P: [{"@value": "v"}]}]),
    ({"@container": "@list", P: "v"},
     [{"@container": ["@list"], P: [{"@value": "v"}]}]),
    # term aliased to @none with a @list container wraps generically
    ({"@context": {"t": {"@id": "@none", "@container": "@list"}}, "t": "x", P: "v"},
     [{"@none": [{"@list": ["x"]}], P: [{"@value": "v"}]}]),
    # @included in 1.0 mode falls through generically (not dropped)
]


@pytest.mark.parametrize("doc,expected", KEYWORD_FALLTHROUGH_CASES)
def test_keyword_fallthrough(doc, expected):
    assert _expand(doc) == expected


def test_included_1_0_falls_through_generically():
    doc = {"@included": {"@id": EX + "x"}, "@id": EX + "n", P: "v"}
    out = _expand(doc, {"processingMode": "json-ld-1.0"})
    assert out == [{
        "@id": EX + "n", "@included": [{"@id": EX + "x"}], P: [{"@value": "v"}],
    }]


def test_keyword_collision_via_alias():
    with pytest.raises(JsonLdError) as e:
        _expand({"@context": {"t": "@none"}, "t": "a", "@none": "b", P: "v"})
    assert e.value.code == "colliding keywords"


def test_direction_kept_and_validated_in_1_0():
    out = _expand({"@direction": "ltr", P: "v"}, {"processingMode": "json-ld-1.0"})
    assert out == [{"@direction": "ltr", P: [{"@value": "v"}]}]
    with pytest.raises(JsonLdError) as e:
        _expand({"@direction": "up", P: "v"}, {"processingMode": "json-ld-1.0"})
    assert e.value.code == "invalid base direction"


def test_list_with_extra_keys_raises():
    with pytest.raises(JsonLdError) as e:
        _expand({"@list": ["x"], P: "v"})
    assert e.value.code == "invalid set or list object"


def test_nested_lists_expand_to_nested_list_objects():
    out = _expand({P: {"@list": [["a", "b"], "c"]}})
    assert out == [{P: [{"@list": [
        {"@list": [{"@value": "a"}, {"@value": "b"}]}, {"@value": "c"},
    ]}]}]


# ---------------------------------------------------------------------------
# @type add_value semantics (reference jsonld.py:2419-2428)

def test_single_none_expanded_type_raises():
    for v in ("t", ["t"]):
        with pytest.raises(JsonLdError) as e:
            _expand({"@context": {"t": None}, "@type": v})
        assert e.value.code == "invalid type value"


def test_multiple_none_expanded_types_survive():
    out = _expand({"@context": {"t": None}, "@type": ["t", "t"]})
    assert out == [{"@type": [None, None]}]


# ---------------------------------------------------------------------------
# processingMode / @direction clone drops (reference jsonld.py:6230-6247)

def test_propagate_false_disables_1_0_checks():
    # @propagate:false → the clone loses processingMode → restored to 1.1
    doc = {"@context": {"@propagate": False}, P: "v"}
    out = _expand(doc, {"processingMode": "json-ld-1.0"})
    assert out == [{P: [{"@value": "v"}]}]
    # @propagate:true keeps 1.0 mode and raises
    with pytest.raises(JsonLdError) as e:
        _expand({"@context": {"@propagate": True}, P: "v"},
                {"processingMode": "json-ld-1.0"})
    assert e.value.code == "invalid context entry"


def test_default_direction_dropped_by_next_context():
    kept = _expand({"@context": {"@direction": "ltr", "@vocab": EX}, "p": "v"})
    assert kept == [{P: [{"@direction": "ltr", "@value": "v"}]}]
    dropped = _expand({
        "@context": [{"@direction": "ltr", "@vocab": EX}, {"x": EX + "x"}],
        "p": "v",
    })
    assert dropped == [{P: [{"@value": "v"}]}]
    # @language survives the same clone
    lang = _expand({
        "@context": [{"@language": "en", "@vocab": EX}, {"x": EX + "x"}],
        "p": "v",
    })
    assert lang == [{P: [{"@language": "en", "@value": "v"}]}]


# ---------------------------------------------------------------------------
# scoped contexts

def test_null_type_scoped_context_skipped_in_expansion():
    doc = {
        "@context": {
            "@vocab": EX, "ex": EX,
            "t": {"@id": EX + "t", "@context": None},
        },
        "@id": EX + "n", "@type": "t", "ex:curie": "",
    }
    out = _expand(doc)
    # the null scoped context does NOT nullify: ex: still resolves
    assert out == [{
        "@id": EX + "n", "@type": [EX + "t"],
        EX + "curie": [{"@value": ""}],
    }]


def test_nested_context_override_raises():
    with pytest.raises(JsonLdError) as e:
        _expand({"@context": {"@vocab": EX}, "p": {"@context": {"@context": {}}, "q": 1}})
    assert e.value.code == "keyword redefinition"


def test_scoped_context_validated_after_definition():
    # invalid @nest in the SAME definition raises before the scoped-context
    # validation (reference jsonld.py:3535-3561 ordering)
    with pytest.raises(JsonLdError) as e:
        _expand({
            "@context": {"t": {"@id": EX + "t", "@context": "no-such",
                               "@nest": "@id"}},
            "t": 1,
        })
    assert e.value.code == "invalid @nest value"


# ---------------------------------------------------------------------------
# term-definition ordering

def test_missing_vocab_raises_before_type_validation():
    with pytest.raises(JsonLdError) as e:
        _expand({"@context": {"term2": {"@type": "rel-dt"}}, "term2": "v"})
    assert e.value.code == "invalid IRI mapping"


def test_blank_node_type_mapping_raises():
    with pytest.raises(JsonLdError) as e:
        _expand({"@context": {"@vocab": "_:b", "t": {"@type": "rel-dt"}}, "t": "v"})
    assert e.value.code == "invalid type mapping"


def test_protected_is_truthy_not_validated():
    out = _expand({
        "@context": {"t": {"@id": EX + "t", "@protected": "yes"}}, "t": "v",
    })
    assert out == [{EX + "t": [{"@value": "v"}]}]


# ---------------------------------------------------------------------------
# compaction quirks

def test_compact_type_uses_pre_revert_context():
    out = api.compact(
        {"@context": {"@vocab": EX}, "@type": "t"},
        {"@vocab": EX, "@propagate": False},
    )
    assert out == {
        "@context": {"@vocab": EX, "@propagate": False}, "@type": "t",
    }


def test_compact_bare_value_ignores_default_direction():
    out = api.compact(
        {"@context": {"@vocab": EX}, "term2": ""}, {"@direction": "ltr"},
    )
    assert out == {"@context": {"@direction": "ltr"}, EX + "term2": ""}


def test_compact_type_none_term_selected():
    out = api.compact(
        {"@context": {"@vocab": EX}, "@type": "t"},
        [{"@vocab": EX, "t": {"@type": "@none"}}],
    )
    assert out == {
        "@context": {"@vocab": EX, "t": {"@type": "@none"}}, "@type": "t",
    }


def test_compact_output_context_shapes():
    doc = {"@id": EX + "n", P: "v"}
    assert api.compact(dict(doc), [None]) == {
        "@context": None, "@id": EX + "n", P: "v",
    }
    assert api.compact(dict(doc), [{"a": EX + "a"}, {}]) == {
        "@context": {"a": EX + "a"}, "@id": EX + "n", P: "v",
    }
    assert "@context" not in api.compact(dict(doc), [{}])


def test_relative_base_against_null_base_kept_raw():
    # processing must not raise; the relative @base is stored raw
    out = api.compact({"@id": EX + "n", P: "v"}, {"@base": "rel/"})
    assert out["@context"] == {"@base": "rel/"}


def test_vocab_empty_string_resolves_to_default_base():
    out = api.compact(
        {"@context": {"@vocab": EX}, "term2": ""},
        {"@vocab": "", "ex": EX},
    )
    assert out == {"@context": {"@vocab": "", "ex": EX}, "ex:term2": ""}


# ---------------------------------------------------------------------------
# property-scoped context applies BEFORE input_ctx capture (reference
# jsonld.py:1447-1451 vs 1502): a nested node under a term with a scoped
# "@context": null emits its @type as a full IRI, because the nullified
# context is what @type VALUES compact against. Found by the round-4
# framing soak (fresh-entropy wave); verified against the reference.

def test_scoped_null_context_uncompacts_nested_type():
    ctx = {"t": {"@id": "http://e/t", "@context": None}}
    expanded = [
        {"@id": "http://e/rn", "http://e/t": [{"@id": "_:b0", "@type": ["http://e/t"]}]}
    ]
    out = api.compact(json.loads(json.dumps(expanded)), ctx)
    assert out == {
        "@context": ctx,
        "@id": "http://e/rn",
        "t": {"@id": "_:b0", "@type": "http://e/t"},
    }


def test_scoped_null_context_framing_parity():
    # the original falsifying example from the framing soak
    ctx = {"t": {"@id": "http://e/t", "@context": None}}
    body = {"@context": ctx, "@type": "t", "@reverse": {"t": {"@id": "http://e/rn"}}}
    out = api.frame(json.loads(json.dumps(body)), {"@context": ctx})
    assert out == {
        "@context": ctx,
        "@graph": [
            {"@id": "_:b0", "@type": "t"},
            {"@id": "http://e/rn", "t": {"@id": "_:b0", "@type": "http://e/t"}},
        ],
    }


def test_scoped_nonnull_context_nested_type_still_compacts():
    # control: a non-nullifying scoped context keeps the term visible for
    # nested @type compaction (double-application is idempotent)
    ctx = {"t": {"@id": "http://e/t", "@context": {"x": "http://e/x"}}}
    expanded = [
        {"@id": "http://e/rn", "http://e/t": [{"@id": "_:b0", "@type": ["http://e/t"]}]}
    ]
    out = api.compact(json.loads(json.dumps(expanded)), ctx)
    assert out == {
        "@context": ctx,
        "@id": "http://e/rn",
        "t": {"@id": "_:b0", "@type": "t"},
    }


def test_reverse_node_reference_selects_id_container_term():
    # soak-found (round-4 tail): container candidates derive from the value
    # shape BEFORE the reverse branch (reference jsonld.py:5190-5205), so a
    # plain term with @container @id compacts a reverse property AND keys
    # its id map; we previously fell back to the full IRI inside @reverse
    ctx = [{"t": {"@container": "@id"}, "@vocab": "http://e/"}]
    doc = {"@context": {"@vocab": "http://e/"},
           "@reverse": {"t": {"@id": "http://e/rn"}}}
    out = api.compact(json.loads(json.dumps(doc)), ctx)
    assert out == {
        "@context": ctx[0],
        "@reverse": {"t": {"http://e/rn": {}}},
    }


def test_reverse_node_reference_type_container_term():
    # same shape through the @type-map container path
    ctx = [{"t": {"@container": "@type"}, "@vocab": "http://e/"}]
    doc = {"@context": {"@vocab": "http://e/"},
           "@reverse": {"t": {"@id": "http://e/rn", "@type": "http://e/T"}}}
    out = api.compact(json.loads(json.dumps(doc)), ctx)
    # the single remaining @id entry recompacts to a bare string
    # (reference type-map single-@id recompaction, jsonld.py:1934-1943)
    assert out == {
        "@context": ctx[0],
        "@reverse": {"t": {"T": "http://e/rn"}},
    }


def test_reverse_term_still_preferred_over_plain_container_term():
    # a true @reverse term must still win (and lift the property out of
    # the @reverse map) even when an @id-container term also matches
    ctx = [{"r": {"@reverse": "http://e/t"}, "@vocab": "http://e/"}]
    doc = {"@context": {"@vocab": "http://e/"},
           "@reverse": {"t": {"@id": "http://e/rn"}}}
    out = api.compact(json.loads(json.dumps(doc)), ctx)
    assert out == {"@context": ctx[0], "r": {"@id": "http://e/rn"}}


def test_link_memo_respects_scoped_context_per_occurrence():
    # soak-found (round-4 link axis): the @link compaction memo was keyed
    # by node identity alone, so a node shared between occurrences reused
    # the FIRST occurrence's compaction even when the second sat under a
    # term carrying "@context": null — the reference recomputes every
    # occurrence (its link cache is dead code), emitting the embedded
    # copy's @type as a full IRI
    ctx = [{"t": {"@id": "http://e/t", "@context": None}}]
    doc = {"@context": ctx,
           "@type": "t", "@reverse": {"t": {"@id": "http://e/rn"}}}
    out = api.link(json.loads(json.dumps(doc)), json.loads(json.dumps(ctx)))
    assert out == {
        "@context": {"t": {"@id": "http://e/t", "@context": None}},
        "@graph": [
            {"@type": "t"},
            {"@id": "http://e/rn", "t": {"@type": "http://e/t"}},
        ],
    }


def test_link_shared_node_under_two_scoped_contexts():
    # a node linked under two different properties compacts differently at
    # each site when one property nullifies the context.  The node map
    # merges the shared node first, so under the NULLIFIED scope ("a") its
    # expanded @type is a pair of full IRIs (the null-scope occurrence
    # expanded "t" vocab/base-relative), while under the normal scope ("b")
    # the in-context IRI compacts back to the term "t".  Expected output
    # pinned against reference jsonld.link with an identical base.
    base = "http://example.org/base/"
    ctx = [{"a": {"@id": "http://e/a", "@context": None},
            "b": {"@id": "http://e/b"},
            "t": "http://e/t"}]
    doc = {"@context": ctx, "@id": "http://e/n",
           "a": {"@id": "http://e/shared", "@type": "t"},
           "b": {"@id": "http://e/shared", "@type": "t"}}
    out = api.link(
        json.loads(json.dumps(doc)), json.loads(json.dumps(ctx)),
        {"base": base})
    graph = {n["@id"]: n for n in out["@graph"]}
    shared_under_a = graph["http://e/n"]["a"]
    shared_under_b = graph["http://e/n"]["b"]
    assert shared_under_a["@type"] == [
        "http://example.org/base/t", "http://e/t"]  # nullified scope
    assert shared_under_b["@type"] == [
        "http://example.org/base/t", "t"]           # normal scope


def test_link_cycle_still_graceful():
    # the in-flight cut must keep cutting cycles (reference RecursionErrors
    # here — documented divergence)
    ctx = {"p": {"@id": "http://e/p", "@type": "@id"}}
    doc = {"@context": ctx, "@id": "http://e/x",
           "p": {"@id": "http://e/y", "p": "http://e/x"}}
    out = api.link(json.loads(json.dumps(doc)), json.loads(json.dumps(ctx)))
    assert set(out) == {"@context", "@graph"}


def test_container_map_none_key_uses_alias():
    # soak-found (round-4 link axis, second find): a missing map key
    # compacts the @none KEYWORD — a term aliasing @none must win over the
    # literal "@none" (reference jsonld.py:1948 via the keyword-alias fast
    # path). Exercise all four non-graph container kinds.
    for cont, val in [
        ("@type", {"@id": "http://e/x"}),
        ("@language", {"@value": "plain"}),
        ("@index", {"@value": "plain"}),
        ("@id", {"http://e/v": [{"@value": 1}]}),
    ]:
        ctx = {"@vocab": "http://e/", "none": "@none",
               "t": {"@container": cont}}
        doc = [{"http://e/t": [val]}]
        out = api.compact(json.loads(json.dumps(doc)),
                          json.loads(json.dumps(ctx)))
        assert "none" in out["t"], (cont, out)
        assert "@none" not in out["t"], (cont, out)


def test_graph_id_map_keys_raw_iri_and_alias_fallback():
    # reference keys graph-id maps on the RAW expanded @id — no CURIE
    # compaction (jsonld.py:1788-1791); a missing id falls back to the
    # compacted @none keyword (alias-aware)
    ctx = {"@vocab": "http://e/", "ex": "http://example.org/",
           "none": "@none",
           "input": {"@id": "http://e/input",
                     "@container": ["@graph", "@id"]}}
    with_id = [{"http://e/input": [
        {"@graph": [{"http://e/v": [{"@value": 1}]}],
         "@id": "http://example.org/g1"}]}]
    out = api.compact(json.loads(json.dumps(with_id)),
                      json.loads(json.dumps(ctx)))
    assert out["input"] == {"http://example.org/g1": {"v": 1}}  # not ex:g1
    without_id = [{"http://e/input": [
        {"@graph": [{"http://e/v": [{"@value": 1}]}]}]}]
    out2 = api.compact(json.loads(json.dumps(without_id)),
                       json.loads(json.dumps(ctx)))
    assert out2["input"] == {"none": {"v": 1}}


def test_graph_index_map_none_alias_fallback():
    ctx = {"@vocab": "http://e/", "none": "@none",
           "input": {"@id": "http://e/input",
                     "@container": ["@graph", "@index"]}}
    doc = [{"http://e/input": [
        {"@graph": [{"http://e/v": [{"@value": 1}]}]}]}]
    out = api.compact(json.loads(json.dumps(doc)),
                      json.loads(json.dumps(ctx)))
    assert out["input"] == {"none": {"v": 1}}


def test_nested_list_items_compact_under_list_not_outer_term():
    # soak-found (round-4 compaction axis, wave N+5): a nested list routes
    # through generic node-object processing, so its items compact under
    # the '@list' key — the OUTER term's @type coercion must NOT apply
    # (reference jsonld.py:1485-1494 + the property loop; the engine
    # previously compacted inner items under the outer term)
    ctx = {"@vocab": "http://e/", "t": {"@type": "@none"}}
    out = api.compact({"@context": dict(ctx), "t": {"@list": [[""]]}},
                      json.loads(json.dumps(ctx)))
    assert out["t"] == {"@list": [{"@list": [""]}]}
    ctx2 = {"@vocab": "http://e/", "t": {"@type": "@id"}}
    out2 = api.compact(
        {"@context": dict(ctx2), "t": {"@list": [["http://e/x"]]}},
        json.loads(json.dumps(ctx2)))
    assert out2["t"] == {"@list": [{"@list": [{"@id": "http://e/x"}]}]}


def test_nested_list_under_list_container_compacts_bare():
    # '@list' in the active property's container → the nested list object
    # compacts to the bare inner array under the SAME property
    ctx = {"@vocab": "http://e/", "t": {"@container": "@list"}}
    out = api.compact({"@context": dict(ctx), "t": [["a", 1]]},
                      json.loads(json.dumps(ctx)))
    assert out["t"] == [["a", 1]]


def test_wrapped_nested_list_joins_container_maps_and_arrayifies():
    # a wrapped list item falls through to container maps (index map key
    # from the LIST object's @index) and the final-add arrayify rule
    # (expanded_property == '@list' always holds arrays)
    ctx = {"@vocab": "http://e/", "t": {"@container": "@index"}}
    out = api.compact(
        {"@context": dict(ctx), "t": [{"@list": [["x"]], "@index": "i"}]},
        json.loads(json.dumps(ctx)))
    assert out["t"] == {"i": {"@list": [{"@list": ["x"]}]}}
    deep = api.compact(
        {"@context": {"@vocab": "http://e/"},
         "t": {"@list": [[[["deep"]]]]}},
        {"@vocab": "http://e/"})
    assert deep["t"] == {
        "@list": [{"@list": [{"@list": [{"@list": ["deep"]}]}]}]}


def test_index_container_string_item_graceful():
    # soak-found (round-4 framing axis, wave N+8): a frame value pattern
    # can put a bare STRING item inside an index container (term @id
    # '@none' makes value expansion return the raw string). The reference
    # dies with a bare TypeError on the index-key assignment
    # (jsonld.py:3724-3741); this engine raises the spec error instead so
    # a poison doc quarantines rather than killing the stage (documented
    # graceful divergence). A string CONTAINING the index key follows the
    # reference's substring `in` semantics and is appended raw — parity.
    ctx = {"t": {"@id": "@none", "@container": "@index"}}
    frame = {"@context": json.loads(json.dumps(ctx)), "t": {"@value": "x"}}
    with pytest.raises(JsonLdError) as e:
        api.frame({"@context": json.loads(json.dumps(ctx))},
                  json.loads(json.dumps(frame)))
    assert e.value.code == "invalid value object"
    # substring path, byte-parity with the reference (it does not crash)
    frame2 = {"@context": json.loads(json.dumps(ctx)),
              "t": {"i": "@index inside"}}
    out = api.frame({"@context": json.loads(json.dumps(ctx))},
                    json.loads(json.dumps(frame2)))
    assert out == {"@context": ctx}


# ---------------------------------------------------------------------------
# round-4 compaction OPTIONS axis finds (compactArrays × graph fuzz)

def test_compact_arrays_false_empty_result_keeps_graph():
    # the empty-list → {} simplification is gated on compactArrays
    # (reference jsonld.py:527-533)
    out = api.compact({}, {}, {"compactArrays": False})
    assert out == {"@graph": []}
    assert api.compact({}, {}) == {}


def test_singleton_type_unwraps_even_without_compact_arrays():
    # the singleton-@type unwrap is NOT gated on compactArrays (reference
    # jsonld.py:1572-1590)
    out = api.compact({"@type": "t"}, {}, {"compactArrays": False,
                                           "base": "http://e/b/"})
    assert out["@graph"][0]["@type"] == "http://e/b/t"


def test_property_valued_index_extracts_recompacted_key():
    # the map key comes from the COMPACTED item under the RE-COMPACTED
    # index property (value-dependent term selection), not the raw IRI
    # (reference jsonld.py:1873-1908)
    ctx = [{"@vocab": "http://e/",
            "t": {"@type": "@id", "@container": ["@set", "@index"],
                  "@index": "http://e/idx"}}]
    body = {"@reverse": {"t": {"@id": "http://e/rn"}}}
    doc = {"@context": json.loads(json.dumps(ctx)), **body}
    out = api.compact(doc, json.loads(json.dumps(ctx)),
                      {"compactArrays": False})
    assert out["@graph"][0]["@reverse"]["t"] == {
        "@id": [{"@id": "http://e/rn"}]}


def test_direction_only_value_skips_language_map_terms():
    # a value with @direction but NO @language must not select a
    # @language-container term (reference jsonld.py:5271-5282: the
    # language containers are only added in the @language branch), and the
    # vocab suffix is unusable because 't' is already a term — the
    # property compacts to the full IRI
    ctx = {"@vocab": "http://e/", "@direction": "ltr",
           "t": {"@container": ["@language", "@set"]}}
    doc = {"@context": json.loads(json.dumps(ctx)), "t": ""}
    out = api.compact(doc, json.loads(json.dumps(ctx)),
                      {"compactArrays": False})
    assert out["@graph"][0] == {"http://e/t": [""]}


def test_null_scoped_context_nullifies_irreversibly():
    # nullification replaces the working context with a FRESH initial
    # context, previousContext included (reference jsonld.py:3277) — so a
    # null TYPE-scoped context survives the new-node-object revert and
    # reverse/property keys compact to full IRIs
    ctx = [{"t": {"@context": None}, "@vocab": "http://e/"}]
    body = {"@type": "t", "@reverse": {"t": {"@id": "http://e/rn"}}}
    doc = {"@context": json.loads(json.dumps(ctx)), **body}
    out = api.compact(doc, json.loads(json.dumps(ctx)))
    assert out["@reverse"] == {"http://e/t": {"@id": "http://e/rn"}}
    assert out["@type"] == "t"  # @type VALUES still compact via input_ctx


def test_index_map_node_item_is_not_unwrapped():
    # under a plain @index container, expansion turns {"@graph": [...]}
    # into an index-map entry: the inner NODE carries @index="@graph".
    # Compaction deletes the compacted @index entry but must NOT unwrap a
    # single-property node to its value (reference jsonld.py:1861-1870
    # has no such collapse; soak wave N+12)
    ctx = [{"@vocab": "http://e/", "t": {"@container": "@index"}}]
    doc = {"@context": json.loads(json.dumps(ctx)),
           "@id": "http://e/n", "t": {"@graph": [{"t": ""}]}}
    out = api.compact(doc, {"@context": json.loads(json.dumps(ctx))})
    assert out["t"] == {"@graph": {"t": {"@none": ""}}}


def test_set_keyed_node_is_not_a_blank_node():
    # reference _is_bnode (jsonld.py:678-691): an object with no @id but
    # an @set key — reachable only via @nest expansion garbage — is NOT a
    # blank node. It lands under key None in the node map, keeps only its
    # keyword entries and empty-array properties, and drops value-object
    # properties (no string subject to attach them to). Soak wave N+12.
    ctx = [{"t": "@nest", "@vocab": "http://e/"}]
    doc = {"@context": json.loads(json.dumps(ctx)),
           "@type": "t", "term2": "", "t": {"@set": []}}
    flat = api.flatten(json.loads(json.dumps(doc)))
    assert flat == [{"@id": None, "@set": [], "@type": ["@nest"]}]
    # the unmatched frame drops the node entirely (reference parity)
    framed = api.frame(json.loads(json.dumps(doc)),
                       {"@context": json.loads(json.dumps(ctx)), "term2": {}})
    assert framed == {"@context": {"t": "@nest", "@vocab": "http://e/"}}
    # graceful-divergence surface (reference crashes on all of these):
    # empty frame embeds the None node; RDF conversion skips it
    out = api.frame(json.loads(json.dumps(doc)),
                    {"@context": json.loads(json.dumps(ctx))})
    assert out["@id"] is None
    assert api.to_rdf(json.loads(json.dumps(doc))) == {"@default": []}


def test_empty_array_value_key_silently_vanishes():
    # reference add_value of an empty array adds NOTHING (jsonld.py:
    # 1195-1203), so "@value": [] never lands in the expanded parent and
    # the must-not-be-an-array validation (jsonld.py:2732) never fires:
    # the key vanishes and the leftover keys expand as a plain node
    # object. Non-empty arrays still error. Soak wave N+13.
    ctx = {"@vocab": "http://e/"}
    def ex(body):
        return api.expand({"@context": dict(ctx), "t": body})
    assert ex({"@value": []}) == [{"http://e/t": [{}]}]
    assert ex({"@value": [], "@language": "en"}) == []  # only-@language drop
    assert ex({"@value": [], "@index": "vi"}) == [
        {"http://e/t": [{"@index": "vi"}]}]
    assert ex({"@value": [], "@type": "http://e/dt"}) == [
        {"http://e/t": [{"@type": ["http://e/dt"]}]}]
    # @type @json keeps the raw [] as a JSON literal value
    assert ex({"@value": [], "@type": "@json"}) == [
        {"http://e/t": [{"@type": "@json", "@value": []}]}]
    # leftover property keys become a real embedded node
    assert ex({"@value": [], "t": "x"}) == [
        {"http://e/t": [{"http://e/t": [{"@value": "x"}]}]}]
    with pytest.raises(JsonLdError) as ei:
        ex({"@value": ["a"]})
    assert ei.value.code == "invalid value object value"


def test_type_map_keys_expand_under_scoped_context():
    # reference jsonld.py:3673-3680: in a @type-container map, each KEY's
    # type-scoped context is processed (propagate=False) into the map
    # context BEFORE expanding both the value and the key itself — and the
    # mutation is CUMULATIVE across the sorted keys. The map base context
    # is the term context's previous-context revert (jsonld.py:2637-2641).
    # Soak wave N+13.
    E = "http://e/"
    doc = {"@context": [{"t": {
        "@language": "en", "@id": E + "t", "@container": "@type",
        "@context": {"t": {"@id": E + "shadow", "@type": "@id"}}}}],
        "t": {"t": ""}}
    assert api.expand(json.loads(json.dumps(doc))) == [{
        "http://e/t": [{
            "@id": "http://example.org/base/",
            "@type": ["http://e/shadow"],
        }],
    }]
    # cumulative: key "a"'s scoped context defines "b" for the LATER key
    doc2 = {"@context": {"@vocab": E,
                         "a": {"@id": E + "a",
                               "@context": {"b": E + "bscoped"}},
                         "m": {"@id": E + "m", "@container": "@type"}},
            "m": {"a": {"x": "1"}, "b": {"x": "2"}}}
    out = api.expand(json.loads(json.dumps(doc2)))
    types = sorted(t for n in out[0]["http://e/m"] for t in n["@type"])
    assert types == ["http://e/a", "http://e/bscoped"]


def test_empty_default_frame_is_graceful():
    # a frame property with "@default": [] produces an EMPTY "@preserve"
    # array; the reference crashes on `input_['@preserve'][0]`
    # (jsonld.py:5004) with a bare IndexError — this engine stays graceful
    # and drops the empty value (documented divergence, soak wave N+15)
    doc = {"@context": [{"@vocab": "http://e/"}], "@type": "t"}
    frame = {"@context": [{"@vocab": "http://e/"}],
             "@id": [], "term2": {"@default": []}}
    out = api.frame(json.loads(json.dumps(doc)), json.loads(json.dumps(frame)))
    assert out == {"@context": {"@vocab": "http://e/"}, "@type": "t"}


def test_included_rejects_bare_subject_references():
    # reference _is_subject (jsonld.py:6412-6428): an object whose only
    # key is @id is a subject REFERENCE, not a subject — @included values
    # must expand to full node objects, so a child whose other properties
    # all dropped (no @vocab) is an error. Soak wave N+14.
    E = "http://e/"
    with pytest.raises(JsonLdError) as ei:
        api.expand({"@context": {"@vocab": E},
                    "@included": {"@id": E + "inc"}})
    assert ei.value.code == "invalid @included value"
    with pytest.raises(JsonLdError):
        api.expand({"@context": [{"t": E + "t"}],
                    "t": {"@id": E + "n",
                          "@included": {"@id": E + "inc", "dropped": ""}}})
    # a node with at least one real property is fine
    out = api.expand({"@context": {"@vocab": E},
                      "@included": {"@id": E + "inc", "p": "v"}})
    assert out[0]["@included"][0]["http://e/p"] == [{"@value": "v"}]


def test_null_nest_value_is_invalid():
    # reference arrayify (jsonld.py:1412) wraps a bare None as [None], so a
    # null @nest value hits the "nested value must be a node object" check
    # (jsonld.py:2750-2786) — it is NOT an empty collection. Our arrayify
    # maps None -> [], so _process_nests must arrayify reference-style.
    # Found by the round-4 framing soak (this session).
    for body in ({"t": None}, {"@nest": None, "a": 1}, {"t": [None]}):
        with pytest.raises(JsonLdError) as ei:
            api.expand({"@context": {"t": "@nest", "a": "http://e/a"},
                        **body})
        assert ei.value.code == "invalid @nest value"
    # an empty ARRAY nest value stays an empty collection — no error
    assert api.expand({"@context": {"t": "@nest"}, "t": []}) == []


def test_merged_alias_type_skips_set_list_validation():
    # reference jsonld.py:2213 gates the post-expansion ladder on a bare
    # `'@type' in rval` — when two ALIASED @type keys merged the value is
    # already a list, but the branch still fires and SKIPS the @set/@list
    # "at most @index besides it" validation at jsonld.py:2224-2231. So an
    # @list object that also carries a merged @type survives expansion.
    # Found by the round-4 opchain soak (this session).
    E = "http://e/"
    out = api.expand({
        "@context": {"t": "@type", "l": "@list", "p": E + "p"},
        "@id": E + "s",
        "p": {"t": E + "T1", "@type": E + "T2", "l": ["a"]},
    })
    assert out == [{"@id": E + "s", E + "p": [
        {"@list": [{"@value": "a"}], "@type": [E + "T2", E + "T1"]}]}]
    # single (non-merged) @type alongside @list also routes the same way
    out = api.expand({
        "@context": {"l": "@list", "p": E + "p"},
        "@id": E + "s",
        "p": {"@type": E + "T2", "l": ["a"]},
    })
    assert out == [{"@id": E + "s", E + "p": [
        {"@list": [{"@value": "a"}], "@type": [E + "T2"]}]}]
    # with no @type present the validation still fires
    with pytest.raises(JsonLdError) as ei:
        api.expand({"@context": {"p": E + "p", "x": E + "x"},
                    "@id": E + "s", "p": {"@list": ["a"], "x": "y"}})
    assert ei.value.code == "invalid set or list object"
