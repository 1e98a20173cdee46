"""Differential framing sweep vs the reference processor.

Enumerates composite frames — {@id} x {@type} x {property patterns} x
{requireAll} — over small multi-node documents and compares
``pyld_spark.jsonld.api.frame`` with the reference byte-for-byte (JSON with
sorted keys), including raised error codes.

Run standalone: ``python tools/frame_sweep.py`` prints the disagreement count
and the first few diffs. The pytest wrapper lives in
tests/test_frame_matcher_sweep.py.
"""

from __future__ import annotations

import itertools
import json
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

CTX = {"ex": "http://ex.org/"}

DOC_NODES = {
    "@context": CTX,
    "@graph": [
        {"@id": "ex:a", "@type": "ex:T", "ex:p": "yes", "ex:r": {"@id": "ex:c"}},
        {"@id": "ex:b", "@type": "ex:T", "ex:p": "no"},
        {"@id": "ex:c", "@type": "ex:U", "ex:p": "yes"},
        {"@id": "ex:d", "ex:q": "zzz"},
        {"@id": "ex:e", "@type": ["ex:T", "ex:V"], "ex:p": ["yes", "maybe"]},
        {"@id": "ex:f", "@type": "ex:V"},
    ],
}

DOC_VALUES = {
    "@context": CTX,
    "@graph": [
        {"@id": "ex:v1", "ex:p": {"@value": "x"}},
        {"@id": "ex:v2", "ex:p": {"@value": "x", "@type": "ex:DT"}},
        {"@id": "ex:v3", "ex:p": {"@value": "x", "@language": "en"}},
        {"@id": "ex:v4", "ex:p": {"@value": "x", "@language": "EN"}},
        {"@id": "ex:v5", "ex:p": {"@value": "y"}},
        {"@id": "ex:v6", "ex:p": 7},
    ],
}

DOC_LISTS = {
    "@context": CTX,
    "@graph": [
        {"@id": "ex:l1", "ex:p": {"@list": ["yes", "no"]}},
        {"@id": "ex:l2", "ex:p": {"@list": [{"@id": "ex:l1"}]}},
        {"@id": "ex:l3", "ex:p": {"@list": []}},
        {"@id": "ex:l4", "ex:p": ["yes"]},
    ],
}

ID_OPTS = [None, "ex:a", ["ex:a", "ex:c"], {}, "ex:zz"]
TYPE_OPTS = [None, "ex:T", [], {}, {"@default": "ex:D"}, "ex:ZZ", ["ex:T", "ex:V"]]
P_OPTS = [
    None,
    {"@value": "yes"},
    {},
    [],
    {"@default": "d"},
    {"@value": "nope"},
]
R_OPTS = [None, {"@id": "ex:c"}, {}, {"@id": "ex:zz"}, {"@type": "ex:U"}]

VALUE_PATTERNS = [
    {"@value": "x"},
    {"@value": "x", "@type": "ex:DT"},
    {"@value": "x", "@type": {}},
    {"@value": "x", "@language": "en"},
    {"@value": "x", "@language": "EN"},
    {"@value": "x", "@language": {}},
    {"@value": {}},
    {"@value": {}, "@language": "en"},
    {"@value": ["x", "y"]},
    {"@type": "ex:DT"},
    {"@language": "en"},
]

LIST_PATTERNS = [
    {"@list": [{"@value": "yes"}]},
    {"@list": [{}]},
    {"@list": [{"@id": "ex:l1"}]},
    {"@list": [{"@value": "absent"}]},
    {"@list": []},
    {"@list": [{"@type": {}}]},
]


def _run(framer, doc, frame, options):
    try:
        return json.dumps(framer(doc, frame, dict(options)), sort_keys=True)
    except Exception as e:  # noqa: BLE001 — error-code parity is part of it
        # the reference wraps frame-expansion failures in a code-less
        # jsonld.FrameError (jsonld.py:838-841); compare the cause's code
        code = getattr(e, "code", None)
        seen = 0
        cause = e
        while code is None and cause is not None and seen < 5:
            cause = getattr(cause, "cause", None) or getattr(cause, "__cause__", None)
            code = getattr(cause, "code", None)
            seen += 1
        if code is not None:
            return f"ERR:{code}"
        # an exception with no spec error code is a processor crash (the
        # reference raises bare IndexError on match-none [] patterns whose
        # early-return @type match admits nodes carrying the property) —
        # we intentionally do NOT mirror crashes; see sweep()
        return f"CRASH:{type(e).__name__}"


def generate_cases():
    """Yield (doc, frame, options) tuples for the sweep."""
    for id_o, ty_o, p_o, r_o, require_all in itertools.product(
        ID_OPTS, TYPE_OPTS, P_OPTS, R_OPTS, (False, True)
    ):
        frame = {"@context": CTX}
        if id_o is not None:
            frame["@id"] = id_o
        if ty_o is not None:
            frame["@type"] = ty_o
        if p_o is not None:
            frame["ex:p"] = p_o
        if r_o is not None:
            frame["ex:r"] = r_o
        yield DOC_NODES, frame, {"requireAll": require_all}

    for pat, require_all in itertools.product(VALUE_PATTERNS, (False, True)):
        yield DOC_VALUES, {"@context": CTX, "ex:p": pat}, {"requireAll": require_all}

    for pat, require_all in itertools.product(LIST_PATTERNS, (False, True)):
        yield DOC_LISTS, {"@context": CTX, "ex:p": pat}, {"requireAll": require_all}

    # flag interplay: explicit / omitDefault / embed over a composite frame
    for explicit, omit, embed in itertools.product(
        (False, True), (False, True), ("@once", "@always", "@never", "@link")
    ):
        yield (
            DOC_NODES,
            {
                "@context": CTX,
                "@type": "ex:T",
                "ex:p": {"@value": "yes"},
                "ex:missing": {"@default": "dflt"},
            },
            {"explicit": explicit, "omitDefault": omit, "embed": embed},
        )

    # @reverse frames (the reference's reverse recursion does NOT set the
    # embedded flag — 'embeded' typo at jsonld.py:4595)
    for embed, require_all in itertools.product(
        ("@once", "@always", "@never"), (False, True)
    ):
        yield (
            DOC_NODES,
            {
                "@context": CTX,
                "@id": "ex:c",
                "@reverse": {"ex:r": {"@embed": embed}},
            },
            {"requireAll": require_all},
        )
        yield (
            DOC_NODES,
            {"@context": CTX, "@type": "ex:U", "@reverse": {"ex:r": {}}},
            {"requireAll": require_all, "embed": embed},
        )

    # nested composite subframes: constraints two levels deep
    for require_all in (False, True):
        yield (
            DOC_NODES,
            {
                "@context": CTX,
                "@type": "ex:T",
                "ex:r": {"@type": "ex:U", "ex:p": {"@value": "yes"}},
            },
            {"requireAll": require_all},
        )
        yield (
            DOC_NODES,
            {"@context": CTX, "ex:r": {"@id": "ex:c", "ex:p": {"@value": "no"}}},
            {"requireAll": require_all},
        )

    # @value:null patterns and bnode-typed value objects
    for pat in ({"@value": None}, {"@value": "x", "@type": "_:b0"}):
        for require_all in (False, True):
            yield (
                DOC_VALUES,
                {"@context": CTX, "ex:p": pat},
                {"requireAll": require_all},
            )


def sweep(max_report: int = 10):
    from ref_oracle import get_reference_jsonld

    from pyld_spark.jsonld import api

    ref = get_reference_jsonld()
    total = 0
    ref_crashes = 0
    diffs = []
    for doc, frame, options in generate_cases():
        total += 1
        r = _run(ref.frame, doc, frame, options)
        m = _run(api.frame, doc, frame, options)
        if r.startswith("CRASH:"):
            # reference-processor bug: parity target is "handle gracefully",
            # i.e. we must neither crash nor raise
            ref_crashes += 1
            if m.startswith(("CRASH:", "ERR:")):
                diffs.append((frame, options, r, m))
        elif r != m:
            diffs.append((frame, options, r, m))
    return total, ref_crashes, diffs, max_report


if __name__ == "__main__":
    total, ref_crashes, diffs, max_report = sweep()
    print(f"{total} cases, {len(diffs)} disagree, {ref_crashes} reference crashes (graceful here)")
    for frame, options, r, m in diffs[:max_report]:
        print("FRAME", json.dumps(frame), "OPTS", options)
        print("  ref ", r[:240])
        print("  mine", m[:240])
    sys.exit(1 if diffs else 0)
