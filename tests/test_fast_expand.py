"""The plain-node expansion fast path must be byte-identical to the general
algorithm — asserted by running the same documents with the fast path forced
off (monkeypatched context-eligibility gate).

The round-3 fast path (expand._fast_expand_node) specializes dicts whose
keys are literal @id/@type plus simple terms with scalar values — the shape
of every transcript turn node. Anything else bails to the general path, so
equality on a battery that MIXES both shapes proves the dispatch boundary
is right, not just the happy path.
"""

from __future__ import annotations

import json

import pytest

import pyld_spark.jsonld.expand as ex
from pyld_spark.jsonld import api
from pyld_spark.transcripts import TRANSCRIPT_CONTEXT

E = "http://e/"

DOCS = [
    # transcript shape (the hot kernel path)
    {
        "@context": TRANSCRIPT_CONTEXT,
        "@id": "https://pyld-spark.example/conv/c1",
        "@type": "Conversation",
        "turns": {
            "@list": [
                {
                    "@id": f"https://pyld-spark.example/conv/c1/turn/{i}",
                    "@type": "Turn",
                    "turnIndex": i,
                    "role": "user",
                    "text": f"msg {i}",
                    "tool": "checkout" if i % 2 else None,
                    "ts": "2020-01-01T00:00:00.000000Z",
                }
                for i in range(4)
            ]
        },
    },
    # vocab-mapped keys, list values, null values, empty list values
    {
        "@context": {"@vocab": E},
        "@id": E + "n",
        "@type": ["T1", "T2"],
        "scalars": ["a", 1, 2.5, True, None],
        "nothing": None,
        "empty": [],
    },
    # keys that must bail: containers, @reverse, nested nodes, aliases
    {
        "@context": {
            "@vocab": E,
            "lst": {"@id": E + "lst", "@container": "@list"},
            "rev": {"@reverse": E + "r"},
            "id": "@id",
        },
        "id": E + "n2",
        "lst": ["x", "y"],
        "rev": {"@id": E + "other"},
        "nested": {"@id": E + "child", "p": "v"},
    },
    # dropped keys (relative IRI keys without vocab) mixed with kept ones
    {"@id": E + "n3", "keep:me": "v", "dropme": "gone"},
    # typed / language values through term definitions
    {
        "@context": {
            "@vocab": E,
            "when": {"@id": E + "when", "@type": E + "dt"},
            "label": {"@id": E + "label", "@language": "en"},
            "ref": {"@id": E + "ref", "@type": "@id"},
        },
        "@id": E + "n4",
        "when": "2020-01-01",
        "label": "hello",
        "ref": "rel-target",
    },
    # @json coercion and @index must bail
    {
        "@context": {"@vocab": E, "blob": {"@id": E + "blob", "@type": "@json"}},
        "@id": E + "n5",
        "blob": {"a": 1},
        "@index": "i0",
    },
]


@pytest.mark.parametrize("i", range(len(DOCS)))
def test_fast_path_matches_general(i, monkeypatch):
    doc = DOCS[i]
    fast = api.expand(json.loads(json.dumps(doc)))
    monkeypatch.setattr(ex, "_ctx_fast_eligible", lambda ctx: False)
    slow = api.expand(json.loads(json.dumps(doc)))
    assert json.dumps(fast, sort_keys=True) == json.dumps(slow, sort_keys=True)


def test_fast_path_taken_for_turn_nodes(monkeypatch):
    hits = {"fast": 0}
    orig = ex._fast_expand_node

    def spy(st, ctx, el):
        r = orig(st, ctx, el)
        if r is not ex._FAST_BAIL:
            hits["fast"] += 1
        return r

    monkeypatch.setattr(ex, "_fast_expand_node", spy)
    api.expand(json.loads(json.dumps(DOCS[0])))
    assert hits["fast"] >= 4  # every turn node took the fast path
