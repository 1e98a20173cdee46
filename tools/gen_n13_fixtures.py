"""Wave-N+13 conformance fixtures: node-scoped inline contexts and the
fuller value-object surface the round-4 grammar extension opened up.

The property-based axes now generate child node objects carrying their own
``@context`` (previous-context revert, @propagate=False restoration,
protected-term redefinition, term shadowing on the recursion path) plus
richer value objects (``@value: []`` add_value vanishing, @direction/
@language/@type interplay, @json literals, indexed values) and context
term NAMES that are absolute IRIs / compact IRIs / keyword-shaped. These
curated fixtures pin the same areas deterministically; expecteds come from
the reference at harness run time. Idempotent on the ``n13-`` id prefix.
"""

import json
import os

DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "conformance")

E = "http://e/"


def load(name):
    with open(os.path.join(DIR, f"{name}.json")) as f:
        return json.load(f)


def save(name, data):
    with open(os.path.join(DIR, f"{name}.json"), "w") as f:
        json.dump(data, f, indent=1, sort_keys=False)
        f.write("\n")


def replace_range(data, prefix, new_tests):
    data["tests"] = [t for t in data["tests"] if not t["id"].startswith(prefix)]
    data["tests"].extend(new_tests)


EXPAND = [
    # --- empty-array @value: add_value adds nothing (jsonld.py:1195-1203),
    # so the array validation at jsonld.py:2732 never fires ---
    {"id": "n13-ex-val-01", "name": "@value [] vanishes to empty node",
     "input": {"@context": {"@vocab": E}, "t": {"@value": []}}},
    {"id": "n13-ex-val-02", "name": "@value [] with @language drops entirely",
     "input": {"@context": {"@vocab": E},
               "t": {"@value": [], "@language": "en"}}},
    {"id": "n13-ex-val-03", "name": "@value [] keeps @index as node property",
     "input": {"@context": {"@vocab": E},
               "t": {"@value": [], "@index": "vi"}}},
    {"id": "n13-ex-val-04", "name": "@value [] with IRI @type becomes typed node",
     "input": {"@context": {"@vocab": E},
               "t": {"@value": [], "@type": E + "dt"}}},
    {"id": "n13-ex-val-05", "name": "@value [] under @type @json stays a JSON literal",
     "input": {"@context": {"@vocab": E},
               "t": {"@value": [], "@type": "@json"}}},
    {"id": "n13-ex-val-06", "name": "@value [] leftover properties expand as node",
     "input": {"@context": {"@vocab": E}, "t": {"@value": [], "t": "x"}}},
    {"id": "n13-ex-val-07", "name": "non-empty array @value still errors",
     "negative": True, "error": "invalid value object value",
     "input": {"@context": {"@vocab": E}, "t": {"@value": ["a"]}}},
    {"id": "n13-ex-val-08", "name": "@value [] free-floating drops",
     "input": {"@value": []}},
    # --- node-scoped inline contexts on the recursion path ---
    {"id": "n13-ex-nc-01", "name": "child @context overrides parent term",
     "input": {"@context": {"@vocab": E, "t": E + "t"},
               "t": {"@context": {"t": E + "override"}, "t": "v"}}},
    {"id": "n13-ex-nc-02", "name": "child null @context resets to initial",
     "input": {"@context": {"@vocab": E},
               "t": {"@context": None, "t": "dropped", "@id": E + "kept"}}},
    {"id": "n13-ex-nc-03", "name": "child @context term null hides term",
     "input": {"@context": {"@vocab": E, "t": E + "t"},
               "t": {"@context": {"t": None}, "t": "hidden",
                     "term2": "vocab-still-works"}}},
    {"id": "n13-ex-nc-04", "name": "child @context @vocab null drops vocab terms",
     "input": {"@context": {"@vocab": E},
               "t": {"@context": {"@vocab": None}, "t": "dropped",
                     "@id": E + "n"}}},
    {"id": "n13-ex-nc-05", "name": "child @context default language applies below",
     "input": {"@context": {"@vocab": E},
               "t": {"@context": {"@language": "fr", "@direction": "rtl"},
                     "t": "sous"}}},
    {"id": "n13-ex-nc-06", "name": "child @context @base rebases relative ids",
     "input": {"@context": {"@vocab": E, "@base": E},
               "t": {"@context": {"@base": E + "sub/"}, "@id": "rel",
                     "t": "v"}}},
    {"id": "n13-ex-nc-07", "name": "child @context array null-then-term",
     "input": {"@context": {"@vocab": E, "t": E + "t"},
               "t": {"@context": [None, {"t": E + "after-null"}],
                     "t": "v", "@id": E + "n"}}},
    {"id": "n13-ex-nc-08", "name": "protected term redefinition in child context",
     "negative": True, "error": "protected term redefinition",
     "input": {"@context": {"@vocab": E,
                            "term2": {"@id": E + "p", "@protected": True}},
               "t": {"@context": {"term2": E + "q"}, "term2": "v"}}},
    {"id": "n13-ex-nc-09", "name": "child @propagate false reverts one level down",
     "input": {"@context": {"@vocab": E, "t": E + "t"},
               "t": {"@context": {"@propagate": False, "t": E + "noprop"},
                     "t": {"t": "grandchild"}}}},
    {"id": "n13-ex-nc-10", "name": "child list-container term from inline context",
     "input": {"@context": {"@vocab": E},
               "t": {"@context": {"t": {"@id": E + "deep",
                                        "@container": "@list"}},
                     "t": ["a", "b"]}}},
    # --- context term names that are not simple words ---
    {"id": "n13-ex-tn-01", "name": "absolute-IRI term name must map to itself",
     "negative": True, "error": "invalid IRI mapping",
     "input": {"@context": {E + "t": E + "renamed"}, E + "t": "v",
               "@id": E + "n"}},
    {"id": "n13-ex-tn-02", "name": "absolute-IRI term name with type coercion",
     "input": {"@context": {E + "t": {"@type": "@id"}}, E + "t": "rel",
               "@id": E + "n"}},
    {"id": "n13-ex-tn-03", "name": "compact-IRI term name must match its expansion",
     "negative": True, "error": "invalid IRI mapping",
     "input": {"@context": {"ex": E, "ex:suf": E + "cdef"}, "ex:suf": "v",
               "@id": E + "n"}},
    {"id": "n13-ex-tn-04", "name": "compact-IRI term name null mapping",
     "input": {"@context": {"ex": E, "ex:suf": None}, "ex:suf": "v",
               "ex:other": "kept", "@id": E + "n"}},
    {"id": "n13-ex-tn-05", "name": "keyword-shaped term name is ignored",
     "input": {"@context": {"@vocab": E, "@reserved": E + "resv"},
               "@reserved": "dropped", "t": "kept"}},
    # --- @type-container maps: key-scoped context plumbing ---
    {"id": "n13-ex-tm-01", "name": "type-map key expands under its own scoped context",
     "input": {"@context": [{"t": {
         "@language": "en", "@id": E + "t", "@container": "@type",
         "@context": {"t": {"@id": E + "shadow", "@type": "@id"}}}}],
         "t": {"t": ""}}},
    {"id": "n13-ex-tm-02", "name": "type-map key scoped contexts accumulate across keys",
     "input": {"@context": {"@vocab": E,
                            "a": {"@id": E + "a",
                                  "@context": {"b": E + "bscoped"}},
                            "m": {"@id": E + "m", "@container": "@type"}},
               "m": {"a": {"x": "1"}, "b": {"x": "2"}}}},
    {"id": "n13-ex-tm-03", "name": "type map starts from previous-context revert",
     "input": {"@context": {"@vocab": E,
                            "m": {"@id": E + "m", "@container": "@type",
                                  "@context": {"@vocab": E + "inner/"}}},
               "m": {"T": {"p": "v"}}}},
    {"id": "n13-ex-tm-04", "name": "null scoped context on a type-map key nullifies",
     "input": {"@context": {"@vocab": E,
                            "T": {"@id": E + "T", "@context": None},
                            "m": {"@id": E + "m", "@container": "@type"}},
               "m": {"T": {"p": "v"}}}},
    {"id": "n13-ex-tm-05", "name": "id-map keys resolve under the term-scoped base",
     "input": {"@context": {"@vocab": E,
                            "m": {"@id": E + "m", "@container": "@id",
                                  "@context": {"@base": E + "sub/"}}},
               "m": {"rel": {"p": "v"}}}},
    # --- wave N+14: @included subject-reference validation ---
    {"id": "n14-ex-inc-01", "name": "@included rejects a bare subject reference",
     "negative": True, "error": "invalid @included value",
     "input": {"@context": {"@vocab": E}, "@included": {"@id": E + "inc"}}},
    {"id": "n14-ex-inc-02", "name": "@included node whose properties all drop errors",
     "negative": True, "error": "invalid @included value",
     "input": {"@context": [{"t": E + "t"}],
               "t": {"@id": E + "n",
                     "@included": {"@id": E + "inc", "dropped": ""}}}},
    {"id": "n14-ex-inc-03", "name": "@included full node passes",
     "input": {"@context": {"@vocab": E},
               "@included": {"@id": E + "inc", "p": "v"}}},
]

TORDF = [
    {"id": "n13-rdf-01", "name": "@value [] emits no literal triple",
     "input": {"@context": {"@vocab": E}, "@id": E + "s",
               "t": {"@value": []}, "term2": "kept"}},
    {"id": "n13-rdf-02", "name": "nested context changes predicate IRIs mid-tree",
     "input": {"@context": {"@vocab": E, "t": E + "t"}, "@id": E + "a",
               "t": {"@context": {"t": E + "override"}, "@id": E + "b",
                     "t": "v"}}},
    {"id": "n13-rdf-03", "name": "nested default language tags the deep literal",
     "input": {"@context": {"@vocab": E}, "@id": E + "a",
               "t": {"@context": {"@language": "fr"}, "@id": E + "b",
                     "t": "sous"}},
     "options": {"rdfDirection": "i18n-datatype"}},
    {"id": "n13-rdf-04", "name": "@json empty array literal canonicalizes",
     "input": {"@context": {"@vocab": E}, "@id": E + "s",
               "t": {"@value": [], "@type": "@json"}}},
]

COMPACT = [
    {"id": "n13-co-01", "name": "expanded empty node compacts to empty object",
     "ctx": {"@vocab": E},
     "input": [{E + "t": [{}]}]},
    {"id": "n13-co-02", "name": "@json array literal keeps raw value",
     "ctx": {"@vocab": E},
     "input": [{E + "t": [{"@type": "@json", "@value": []}]}]},
    {"id": "n13-co-03", "name": "direction-only value vs language term ladder",
     "ctx": {"@vocab": E,
             "tl": {"@id": E + "p", "@language": "en"},
             "td": {"@id": E + "p", "@direction": "ltr"}},
     "input": [{E + "p": [{"@value": "x", "@direction": "ltr"}]}]},
    {"id": "n13-co-04", "name": "indexed value object keeps @index through compaction",
     "ctx": {"@vocab": E},
     "input": [{E + "t": [{"@value": "x", "@index": "vi"}]}]},
]

FLATTEN = [
    {"id": "n13-fl-01", "name": "nested context node flattens with rebased ids",
     "input": {"@context": {"@vocab": E, "@base": E},
               "@id": "top",
               "t": {"@context": {"@base": E + "sub/"}, "@id": "rel",
                     "t": "v"}}},
    {"id": "n13-fl-02", "name": "@value [] node flattens to bnode with no props",
     "input": {"@context": {"@vocab": E}, "@id": E + "s",
               "t": {"@value": [], "@index": "vi"}}},
]


def main():
    for name, tests in [("expand", EXPAND), ("tordf", TORDF),
                        ("compact", COMPACT), ("flatten", FLATTEN)]:
        data = load(name)
        replace_range(data, "n13-", tests)
        save(name, data)
        print(f"{name}: {len(data['tests'])} tests")


if __name__ == "__main__":
    main()
