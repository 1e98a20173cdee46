"""Regression pins for wave N+20: exotic term-name parity.

Three reference behaviors were mirrored exactly (all found by a directed
probe before the grammar extension, each verified against the reference
processor at /root/reference/lib/pyld/jsonld.py):

1. The "term in form of an IRI must expand to definition" gate is
   ``re.match(r'.*((:[^:])|/)', term)`` (jsonld.py:5722): a LEADING colon
   counts (":suf"), a double colon alone does not ("::"), and the dot-star
   cannot cross a newline ("x\n:y" escapes the gate).
2. The no-@id fallback ladder (jsonld.py:5751-5766) gates the prefix
   branch on ``find(':') > 0`` and maps the term to ITSELF unconditionally
   when the prefix is undefined — no absolute-IRI validation, and there is
   no term-with-slash branch at all.
3. The expansion property-keep rule is ``_is_absolute_iri`` (jsonld.py:2307,
   regex jsonld.py:6530), not colon-containment: whitespace anywhere drops
   the property, the empty scheme ":suf" drops, and the char class
   ``[A-Za-z0-9+-.]`` spells the RANGE 0x2B-0x2E so ',' is a legal scheme
   character.
"""

from __future__ import annotations

import pytest

from pyld_spark.jsonld import api
from pyld_spark.jsonld.errors import JsonLdError

EX = "http://example.com/"


def expand(ctx, body):
    return api.expand({"@context": ctx, **body})


def code(ctx, body):
    with pytest.raises(JsonLdError) as ei:
        expand(ctx, body)
    return ei.value.code


# --- 1. IRI-form gate ------------------------------------------------------

def test_leading_colon_term_with_mismatched_id_raises():
    # ":suf" matches the reference's `:[^:]` at position 0 → term must
    # expand to its own @id; ":suf" expands to itself, not EX+"x"
    assert code({":suf": EX + "x"}, {":suf": "v"}) == "invalid IRI mapping"
    assert code({":suf": {"@id": EX + "x"}}, {":suf": "v"}) == "invalid IRI mapping"
    assert code({":suf": "nope:z", "nope": EX + "n/"}, {":suf": "v"}) == (
        "invalid IRI mapping"
    )


def test_leading_colon_term_prefix_raises_iri_mapping_first():
    # the IRI-form check fires BEFORE @prefix validation, so the code is
    # 'invalid IRI mapping', not 'invalid term definition'
    assert code(
        {":suf": {"@id": EX + "y", "@prefix": True}}, {":suf": "v"}
    ) == "invalid IRI mapping"


def test_newline_term_escapes_iri_form_gate():
    # `.*` cannot cross '\n' → no IRI-form check; '@prefix' gate
    # (`.*(:|/)`) is equally blind, so @prefix is ACCEPTED on "x\n:y"
    out = expand(
        {"x\n:y": {"@id": EX + "nl", "@prefix": True}}, {"x\n:y": "v"}
    )
    assert out == [{EX + "nl": [{"@value": "v"}]}]


# --- 2. no-@id fallback ladder ---------------------------------------------

def test_self_id_term_takes_no_id_ladder():
    # @id == term is skipped entirely; "a:b" has find(':')>0, prefix "a"
    # undefined → maps to ITSELF (no absolute-IRI validation)
    out = expand({"a:b": {"@id": "a:b"}}, {"a:b": "v"})
    assert out == [{"a:b": [{"@value": "v"}]}]


def test_colon_only_term_uses_vocab_not_prefix_branch():
    # "::" has find(':') == 0 → NOT the prefix branch → @vocab concat
    out = expand({"@vocab": EX, "::": {"@id": "::"}}, {"::": "v"})
    assert out == [{EX + "::": [{"@value": "v"}]}]


def test_slash_term_without_vocab_raises():
    # the reference has NO term-with-slash branch: "./rel" without @vocab
    # hits the final raise, with @vocab it concatenates
    assert code({"./rel": {"@id": "./rel"}}, {"./rel": "v"}) == (
        "invalid IRI mapping"
    )
    out = expand({"@vocab": EX, "./rel": {"@id": "./rel"}}, {"./rel": "v"})
    assert out == [{EX + "./rel": [{"@value": "v"}]}]


# --- 3. property-keep rule --------------------------------------------------

def test_whitespace_in_expanded_property_drops():
    # vocab + "te rm" contains a space → fails _is_absolute_iri → dropped
    assert expand({"@vocab": EX, "te rm": {"@id": "te rm"}}, {"te rm": "v"}) == []
    assert expand({"@vocab": EX}, {"te rm": "v"}) == []
    assert expand({"@vocab": EX, "t\tb": "t\tb"}, {"t\tb": "v"}) == []


def test_newline_self_mapped_term_drops_at_use():
    # "x\n:y" maps to itself; '\n' is whitespace → dropped at expansion
    assert expand({"x\n:y": {"@id": "x\n:y"}}, {"x\n:y": "v"}) == []
    # but an explicit clean @id is kept
    assert expand({"x\n:y": EX + "ok"}, {"x\n:y": "v"}) == (
        [{EX + "ok": [{"@value": "v"}]}]
    )


def test_comma_scheme_is_absolute_per_reference_regex():
    out = expand({}, {"a,b:x": "v", "@id": EX + "s"})
    assert out == [{"@id": EX + "s", "a,b:x": [{"@value": "v"}]}]


def test_empty_scheme_key_drops():
    # ":s" drops (empty scheme), leaving an @id-only free-floating node,
    # which expansion then removes entirely — reference-verified
    assert expand({}, {":s": "v", "@id": EX + "s"}) == []


# --- 4. raw container storage (wave N+20b find) ------------------------------

def test_empty_container_array_makes_term_unselectable():
    # the reference stores the arrayified RAW @container list; [] keys the
    # inverse context as '' (not '@none'), so the term never compacts
    # (jsonld.py:6166) — found by the escalated frameopts soak
    out = api.frame(
        {"@context": [{"t": {"@id": EX + "t", "@container": []}}], "@type": "t"},
        {},
    )
    assert out["@type"] == EX + "t"


def test_duplicate_container_entries_key_verbatim():
    # ["@set","@set"] keys as '@set@set' — also unselectable, but the term
    # still APPLIES on the expansion side (membership checks)
    out = api.compact(
        {"@id": EX + "s", EX + "t": [{"@value": "a"}, {"@value": "b"}]},
        {"t": {"@id": EX + "t", "@container": ["@set", "@set"]}},
    )
    assert out == {
        "@context": {"t": {"@id": EX + "t", "@container": ["@set", "@set"]}},
        "@id": EX + "s",
        EX + "t": ["a", "b"],
    }


def test_duplicate_index_set_container_still_selects():
    # ['@index','@set'] and ['@set','@index'] both sort to '@index@set' —
    # selectable under either spelling
    for spelling in (["@index", "@set"], ["@set", "@index"]):
        out = api.compact(
            {"@id": EX + "s", EX + "t": [{"@value": "a", "@index": "i"}]},
            {"t": {"@id": EX + "t", "@container": spelling}},
        )
        assert out["t"] == {"i": ["a"]}, out


def test_reverse_map_keeps_empty_property_arrays():
    # expansion seeds every reversed property with [] before adding items
    # (reference add_value(reverse_map, prop, [], propertyIsArray=True),
    # jsonld.py:2572-2574): a type-container map that expands to nothing
    # still leaves "prop": [] under @reverse — found by the framing soak
    # (the empty subframe then raises 'invalid frame' in recursion)
    ctx = [{"t": {}, "@vocab": "http://e/"}, {"t": {"@container": "@type"}}]
    out = api.expand({"@context": ctx, "@reverse": {"t": {}}})
    assert out == [{"@reverse": {"http://e/t": []}}]
    with pytest.raises(JsonLdError) as ei:
        api.frame({"@context": ctx, "t": ""}, {"@context": ctx, "@reverse": {"t": {}}})
    assert ei.value.code == "invalid frame"


def test_relativize_roots_paths_like_reference():
    # unresolve uses the ROOTED dot-segment removal (always leading '/',
    # iri_resolver.py:18-94): against an authority-only base, the empty
    # base path roots to '/' and aligns with the first segment of '//abs',
    # so 'http://e//abs' relativizes to 'abs', not '/abs' — found by the
    # framing soak
    out = api.compact(
        [{"@id": "http://e//abs", "http://e/term2": [{"@value": ""}]}],
        {"@vocab": "http://e/", "@base": "http://e"},
    )
    assert out["@id"] == "abs"
