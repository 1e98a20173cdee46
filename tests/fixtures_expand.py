"""Expansion/toRDF fixture battery (shapes from FIXTURES.md §B1, modeled on
the W3C conformance categories the reference tests against)."""

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"

# name -> (input document, base_url or None)
EXPAND_FIXTURES: dict[str, tuple[dict, str | None]] = {
    "simple_term": (
        {"@context": {"name": EX + "name"}, "@id": EX + "a", "name": "Alice"},
        None,
    ),
    "vocab": (
        {"@context": {"@vocab": EX}, "@id": EX + "a", "name": "A", "age": 7},
        None,
    ),
    "curie": (
        {"@context": {"ex": EX}, "@id": "ex:a", "ex:p": {"@id": "ex:b"}},
        None,
    ),
    "base_relative": (
        {"@context": {"@base": EX, "p": EX + "p"}, "@id": "a", "p": {"@id": "b"}},
        None,
    ),
    "doc_base_relative": (
        {"@context": {"p": {"@id": EX + "p", "@type": "@id"}}, "@id": "a", "p": "b"},
        "http://base.example/dir/doc",
    ),
    "typed_value": (
        {
            "@context": {"d": {"@id": EX + "d", "@type": XSD + "date"}},
            "@id": EX + "a",
            "d": "2020-01-01",
        },
        None,
    ),
    "lang_value": (
        {
            "@context": {"@language": "EN", "t": EX + "t"},
            "@id": EX + "a",
            "t": "hi",
        },
        None,
    ),
    "lang_override_null": (
        {
            "@context": {"@language": "en", "t": {"@id": EX + "t", "@language": None}},
            "@id": EX + "a",
            "t": "hi",
        },
        None,
    ),
    "value_object_explicit": (
        {
            "@context": {"t": EX + "t"},
            "@id": EX + "a",
            "t": {"@value": "chat", "@language": "FR"},
        },
        None,
    ),
    "native_types": (
        {
            "@context": {"@vocab": EX},
            "@id": EX + "a",
            "i": 42,
            "d": 2.5,
            "b": True,
            "f": False,
        },
        None,
    ),
    "list_container": (
        {
            "@context": {"p": {"@id": EX + "p", "@container": "@list"}},
            "@id": EX + "a",
            "p": ["x", "y", "z"],
        },
        None,
    ),
    "explicit_list": (
        {"@context": {"p": EX + "p"}, "@id": EX + "a", "p": {"@list": [1, 2]}},
        None,
    ),
    "nested_list": (
        {
            "@context": {"p": {"@id": EX + "p", "@container": "@list"}},
            "@id": EX + "a",
            "p": [["x", "y"], ["z"]],
        },
        None,
    ),
    "set_container": (
        {
            "@context": {"p": {"@id": EX + "p", "@container": "@set"}},
            "@id": EX + "a",
            "p": "only",
        },
        None,
    ),
    "index_container": (
        {
            "@context": {"p": {"@id": EX + "p", "@container": "@index"}},
            "@id": EX + "a",
            "p": {"i1": "a", "i0": ["b", "c"]},
        },
        None,
    ),
    "language_map": (
        {
            "@context": {"p": {"@id": EX + "p", "@container": "@language"}},
            "@id": EX + "a",
            "p": {"en": "hello", "de": ["hallo", "guten tag"]},
        },
        None,
    ),
    "id_map": (
        {
            "@context": {
                "@vocab": EX,
                "p": {"@id": EX + "p", "@container": "@id"},
            },
            "@id": EX + "a",
            "p": {EX + "b": {"label": "B"}, EX + "c": {"label": "C"}},
        },
        None,
    ),
    "type_map": (
        {
            "@context": {
                "@vocab": EX,
                "p": {"@id": EX + "p", "@container": "@type"},
            },
            "@id": EX + "a",
            "p": {"T1": {"@id": EX + "b"}, "T2": {"@id": EX + "c"}},
        },
        None,
    ),
    "graph_container": (
        {
            "@context": {"p": {"@id": EX + "p", "@container": "@graph"}},
            "@id": EX + "a",
            "p": {"@id": EX + "b", EX + "q": "v"},
        },
        None,
    ),
    "reverse_term": (
        {
            "@context": {"children": {"@reverse": EX + "parent"}},
            "@id": EX + "a",
            "children": [{"@id": EX + "b"}, {"@id": EX + "c"}],
        },
        None,
    ),
    "reverse_keyword": (
        {
            "@context": {"@vocab": EX},
            "@id": EX + "a",
            "@reverse": {"parent": {"@id": EX + "b"}},
        },
        None,
    ),
    "nest": (
        {
            "@context": {"@vocab": EX, "meta": "@nest"},
            "@id": EX + "a",
            "meta": {"p": "v", "q": "w"},
        },
        None,
    ),
    "json_literal": (
        {
            "@context": {"p": {"@id": EX + "p", "@type": "@json"}},
            "@id": EX + "a",
            "p": {"b": [2, 1], "a": True, "z": None},
        },
        None,
    ),
    "type_coercion_vocab": (
        {
            "@context": {"@vocab": EX, "p": {"@id": EX + "p", "@type": "@vocab"}},
            "@id": EX + "a",
            "p": "term",
        },
        None,
    ),
    "scoped_property_ctx": (
        {
            "@context": {
                "@vocab": EX,
                "p": {"@id": EX + "p", "@context": {"inner": EX + "inner2"}},
            },
            "@id": EX + "a",
            "p": {"inner": "v"},
        },
        None,
    ),
    "scoped_type_ctx": (
        {
            "@context": {
                "@vocab": EX,
                "T": {"@id": EX + "T", "@context": {"q": EX + "scopedQ"}},
            },
            "@id": EX + "a",
            "@type": "T",
            "q": "v",
        },
        None,
    ),
    "type_aliased": (
        {
            "@context": {"type": "@type", "id": "@id", "@vocab": EX},
            "id": EX + "a",
            "type": "T",
            "p": "v",
        },
        None,
    ),
    "keyword_alias_value": (
        {
            "@context": {"v": "@value", "l": "@language", "t": EX + "t"},
            "@id": EX + "a",
            "t": {"v": "chat", "l": "fr"},
        },
        None,
    ),
    "graph_keyword": (
        {
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": EX + "a", "p": "1"},
                {"@id": EX + "b", "p": "2"},
            ],
        },
        None,
    ),
    "named_graph": (
        {
            "@context": {"@vocab": EX},
            "@id": EX + "g",
            "@graph": [{"@id": EX + "a", "p": "v"}],
        },
        None,
    ),
    "free_floating_dropped": (
        {
            "@context": {"@vocab": EX},
            "@graph": [{"@value": "x"}, {"@id": EX + "a", "p": "v"}, "scalar"],
        },
        None,
    ),
    "null_values_dropped": (
        {"@context": {"@vocab": EX}, "@id": EX + "a", "p": None, "q": "v"},
        None,
    ),
    "dropped_terms": (
        {"@id": EX + "a", "unmapped": "x", "@type": "AlsoRelative"},
        None,
    ),
    "direction": (
        {
            "@context": {"@direction": "rtl", "@language": "ar", "t": EX + "t"},
            "@id": EX + "a",
            "t": "x",
        },
        None,
    ),
    "propagate_false": (
        {
            "@context": {"@vocab": EX},
            "@id": EX + "a",
            "p": {
                "@context": {"@propagate": False, "q": EX + "innerQ"},
                "@id": EX + "b",
                "q": {"@id": EX + "c", "q": "deep"},
            },
        },
        None,
    ),
    "protected_ok": (
        {
            "@context": {"@protected": True, "p": EX + "p"},
            "@id": EX + "a",
            "p": "v",
        },
        None,
    ),
    "index_on_value": (
        {
            "@context": {"p": EX + "p"},
            "@id": EX + "a",
            "p": {"@value": 5, "@index": "idx0"},
        },
        None,
    ),
    "included": (
        {
            "@context": {"@vocab": EX},
            "@id": EX + "a",
            "p": "v",
            "@included": [{"@id": EX + "b", "p": "w"}],
        },
        None,
    ),
    "double_nesting": (
        {
            "@context": {"@vocab": EX},
            "@id": EX + "a",
            "p": {"q": {"r": {"@value": 1.5}}},
        },
        None,
    ),
    "empty_term_suffix_curie": (
        {"@context": {"ex": EX}, "@id": "ex:", "ex:p": "v"},
        None,
    ),
}

# negative fixtures: name -> (doc, expected spec error code)
EXPAND_ERROR_FIXTURES: dict[str, tuple[dict, str]] = {
    "invalid_value_object": (
        {"@context": {"t": "http://e/t"},
         "t": {"@value": "x", "@language": "en", "@type": "http://e/T"}},
        "invalid value object",
    ),
    "invalid_typed_value": (
        {"@context": {"t": "http://e/t"}, "t": {"@value": "x", "@type": "not an iri"}},
        "invalid typed value",
    ),
    "colliding_keywords": (
        {"@context": {"id1": "@id", "id2": "@id"}, "id1": "http://e/a", "id2": "http://e/b"},
        "colliding keywords",
    ),
    "invalid_id": ({"@id": 5}, "invalid @id value"),
    "invalid_reverse": (
        {"@context": {"@vocab": "http://e/"}, "@reverse": "notamap"},
        "invalid @reverse value",
    ),
    "invalid_reverse_value": (
        {"@context": {"children": {"@reverse": "http://e/parent"}},
         "children": [{"@value": "lit"}]},
        "invalid reverse property value",
    ),
    "invalid_language_map": (
        {"@context": {"p": {"@id": "http://e/p", "@container": "@language"}},
         "p": {"en": 5}},
        "invalid language map value",
    ),
    "keyword_redefinition": (
        {"@context": {"@id": "http://e/id"}, "x": "y"},
        "keyword redefinition",
    ),
    "cyclic_iri_mapping": (
        {"@context": {"a": "b:x", "b": "a:y"}, "a:p": "v"},
        "cyclic IRI mapping",
    ),
    "invalid_nest": (
        {"@context": {"@vocab": "http://e/", "n": "@nest"}, "n": {"@value": "x"}},
        "invalid @nest value",
    ),
}
