"""Author conformance fixtures for the reference's PENDING-list areas
(runtests.py:1007-1074) — the suite regions pyld itself marks as known-hard:

- te075/te122: blank-node predicates via ``@vocab: "_:"``
- te111/te112: relative @vocab resolution
- trt01:       canonical numeric literal forms
- twf05:       well-formed language tags / IRIs in toRdf
- tli12/tli14: @list edge cases (nested lists, lists with @index/coercion)
- normalize test060 (skipped id): duplicate input quads through c14n

Each fixture is INPUT-only; the harness computes the expected from the
reference at run time, so pinning these certifies parity exactly where the
reference's own test runner flags fragility. Idempotent: re-running replaces
the ``pend-``/``wf-``/``no-dup-`` id ranges it owns.
"""

import json
import os

DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "conformance")


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


# --------------------------------------------------------------- toRdf

TORDF = []

# -- te075/te122 area: blank-node predicates via @vocab ------------------
for i, (vocab, extra_opts) in enumerate([
    ("_:", {}),
    ("_:", {"produceGeneralizedRdf": True}),
    ("_:b", {}),
    ("_:b", {"produceGeneralizedRdf": True}),
]):
    TORDF.append({
        "id": f"pend-bnp-{i:02d}",
        "name": f"bnode predicate via @vocab {vocab} gen={bool(extra_opts)}",
        "options": extra_opts,
        "input": {
            "@context": {"@vocab": vocab},
            "@id": "http://example.org/s",
            "p": "plain",
            "q": {"@id": "http://example.org/o"},
        },
    })
TORDF.append({
    "id": "pend-bnp-04",
    "name": "explicit bnode-IRI term as predicate",
    "options": {"produceGeneralizedRdf": True},
    "input": {
        "@context": {"p": {"@id": "_:pred"}},
        "@id": "http://example.org/s",
        "p": "v",
    },
})
TORDF.append({
    "id": "pend-bnp-05",
    "name": "bnode predicate dropped without generalized flag",
    "input": {
        "@context": {"p": {"@id": "_:pred"}},
        "@id": "http://example.org/s",
        "p": "v",
        "http://example.org/keep": "kept",
    },
})

# -- te111/te112 area: relative @vocab ------------------------------------
for i, (vocab, base) in enumerate([
    ("", "http://example.org/base/"),
    ("#", "http://example.org/doc"),
    ("rel/", "http://example.org/dir/"),
    ("../up#", "http://example.org/a/b/"),
    ("", None),
]):
    opts = {"base": base} if base else {}
    TORDF.append({
        "id": f"pend-relvocab-{i:02d}",
        "name": f"relative @vocab {vocab!r} base={base}",
        "options": opts,
        "input": {
            "@context": {"@vocab": vocab},
            "@id": "http://example.org/s",
            "term": "value",
            "nested": {"inner": "x"},
        },
    })
# vocab-relative against a previous @vocab (1.1: resolved against @vocab)
TORDF.append({
    "id": "pend-relvocab-05",
    "name": "relative @vocab against prior @vocab",
    "input": {
        "@context": [{"@vocab": "http://example.org/v1/"},
                     {"@vocab": "sub/"}],
        "@id": "http://example.org/s",
        "term": "value",
    },
})

# -- trt01 area: canonical numeric forms ----------------------------------
_NUMERIC_CASES = [
    ("int-max64", 9223372036854775807),
    ("int-min64", -9223372036854775808),
    ("dbl-tiny", 5e-324),
    ("dbl-neg-zero", -0.0),
    ("dbl-pt1", 0.1),
    ("dbl-e21-exact", 1e21),
    ("dbl-e21-frac", 1.5e21),
    ("dbl-sub-one", 0.5),
    ("int-as-dbl", {"@value": 7, "@type": "http://www.w3.org/2001/XMLSchema#double"}),
    ("dbl-as-int", {"@value": 7.8, "@type": "http://www.w3.org/2001/XMLSchema#integer"}),
    ("str-as-dbl", {"@value": "NaNish", "@type": "http://www.w3.org/2001/XMLSchema#double"}),
    ("bool-as-int", {"@value": True, "@type": "http://www.w3.org/2001/XMLSchema#integer"}),
]
for tag, v in _NUMERIC_CASES:
    TORDF.append({
        "id": f"pend-num-{tag}",
        "name": f"canonical numeric lexical form: {tag}",
        "input": {"@id": "http://example.org/s",
                  "http://example.org/p": v if isinstance(v, dict) else {"@value": v}},
    })
TORDF.append({
    "id": "pend-num-native-list",
    "name": "native number mix in one list",
    "input": {"@id": "http://example.org/s",
              "http://example.org/p": {"@list": [1, 1.0, 1.5, -0.0, 1e100, True]}},
})

# -- twf05 area: well-formedness ------------------------------------------
_WF_CASES = [
    ("lang-space", {"@value": "x", "@language": "en US"}),
    ("lang-digitlead", {"@value": "x", "@language": "1en"}),
    ("lang-underscore", {"@value": "x", "@language": "en_US"}),
    ("lang-long", {"@value": "x", "@language": "abcdefghijklm"}),
    ("lang-empty-dir", {"@value": "x", "@language": "en--ltr"}),
]
for tag, v in _WF_CASES:
    TORDF.append({
        "id": f"pend-wf-{tag}",
        "name": f"ill-formed language tag: {tag}",
        "input": {"@id": "http://example.org/s", "http://example.org/p": v},
    })
for tag, iri in [
    ("iri-space", "http://example.org/has space"),
    ("iri-rel", "relative/iri"),
    ("iri-frag-only", "#frag"),
    ("iri-urn", "urn:example:ok"),
]:
    TORDF.append({
        "id": f"pend-wf-{tag}",
        "name": f"IRI well-formedness: {tag}",
        "input": {"@id": "http://example.org/s",
                  "http://example.org/p": {"@id": iri}},
    })

# -- tli12/tli14 area: list edge cases ------------------------------------
TORDF.extend([
    {
        "id": "pend-li-nested",
        "name": "nested @list (list of lists)",
        "input": {"@id": "http://example.org/s",
                  "http://example.org/p": {"@list": [{"@list": [1, 2]},
                                                     {"@list": []},
                                                     "tail"]}},
    },
    {
        "id": "pend-li-nested-deep",
        "name": "triply nested @list",
        "input": {"@id": "http://example.org/s",
                  "http://example.org/p": {"@list": [{"@list": [{"@list": ["x"]}]}]}},
    },
    {
        "id": "pend-li-empty",
        "name": "empty @list → rdf:nil",
        "input": {"@id": "http://example.org/s",
                  "http://example.org/p": {"@list": []}},
    },
    {
        "id": "pend-li-coerced",
        "name": "@list container with @type coercion",
        "input": {
            "@context": {"p": {"@id": "http://example.org/p",
                               "@container": "@list",
                               "@type": "@id"}},
            "@id": "http://example.org/s",
            "p": ["http://example.org/a", "rel", "_:b0"],
        },
    },
    {
        "id": "pend-li-of-nodes",
        "name": "@list of node objects with own properties",
        "input": {"@id": "http://example.org/s",
                  "http://example.org/p": {"@list": [
                      {"@id": "http://example.org/n1",
                       "http://example.org/q": "inner"},
                      {"http://example.org/q": "anon"},
                  ]}},
    },
    {
        "id": "pend-li-lang-container",
        "name": "@list container with @language",
        "input": {
            "@context": {"p": {"@id": "http://example.org/p",
                               "@container": "@list",
                               "@language": "de"}},
            "@id": "http://example.org/s",
            "p": ["eins", "zwei"],
        },
    },
])

# --------------------------------------------------------------- normalize

NORM_OPTS_2015 = {"algorithm": "URDNA2015",
                  "inputFormat": "application/n-quads",
                  "format": "application/n-quads"}
NORM_OPTS_2012 = {"algorithm": "URGNA2012",
                  "inputFormat": "application/n-quads",
                  "format": "application/n-quads"}

NORM = []
_DUP_DOCS = [
    ("exact-dup", "_:a <http://e/p> _:b .\n_:a <http://e/p> _:b .\n"),
    ("dup-ground", "<http://e/s> <http://e/p> \"v\" .\n"
                   "<http://e/s> <http://e/p> \"v\" .\n"
                   "_:a <http://e/q> <http://e/s> .\n"),
    ("dup-in-graph", "_:a <http://e/p> _:b _:g .\n_:a <http://e/p> _:b _:g .\n"),
    ("dup-asym", "_:a <http://e/p> _:b .\n_:b <http://e/p> _:a .\n"
                 "_:a <http://e/p> _:b .\n"),
]
for tag, doc in _DUP_DOCS:
    for alg, opts in (("2015", NORM_OPTS_2015), ("2012", NORM_OPTS_2012)):
        NORM.append({
            "id": f"no-dup-{tag}-{alg}",
            "name": f"duplicate quads through c14n ({tag}, URDNA{alg})",
            "options": dict(opts),
            "input": doc,
        })
# test060-adjacent: input labels already in the _:c14n namespace
NORM.append({
    "id": "no-dup-c14n-prefixed-2015",
    "name": "input labels already _:c14nN",
    "options": dict(NORM_OPTS_2015),
    "input": "_:c14n0 <http://e/p> _:c14n1 .\n_:c14n1 <http://e/p> \"leaf\" .\n",
})


def main():
    tordf = load("tordf")
    replace_range(tordf, "pend-", TORDF)
    save("tordf", tordf)
    norm = load("normalize")
    replace_range(norm, "no-dup-", NORM)
    save("normalize", norm)
    print(f"tordf: {len(tordf['tests'])} tests (+{len(TORDF)} pending-area)")
    print(f"normalize: {len(norm['tests'])} tests (+{len(NORM)} dup-area)")


if __name__ == "__main__":
    main()
