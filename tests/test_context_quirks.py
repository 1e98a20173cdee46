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
