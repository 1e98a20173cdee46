"""Wave N+19 regressions: json-ld-1.0 processing mode across the
non-expansion ops (compact / flatten / frame / toRDF), found by the
``mode10ops`` differential axis.

The headline quirk: the reference's ``_clone_active_context``
(jsonld.py:6230-6247) does not copy ``processingMode``, and frame()'s
mode-specific defaults (omitGraph / pruneBlankNodeIdentifiers,
jsonld.py:817-822, and the is11 @embed gate at jsonld.py:847/4397-4405)
are derived from the PROCESSED frame context — so a frame context whose
first element carries ``@propagate: false`` silently upgrades the mode
to 1.1 mid-frame, flipping omitGraph to True even under
``processingMode=json-ld-1.0``.  Every case here was verified against
the reference before pinning.
"""

from __future__ import annotations

import pytest

from pyld_spark.jsonld import api
from pyld_spark.jsonld.errors import JsonLdError

K = "http://x/k"


def test_frame_10_wraps_in_graph_by_default():
    # plain 1.0 mode: omitGraph defaults to False -> @graph wrap
    out = api.frame({K: "b"}, {"@context": {}}, {"processingMode": "json-ld-1.0"})
    assert out == {"@graph": [{"@id": "_:b0", K: "b"}]}


def test_frame_10_propagate_false_upgrades_mode_and_omits_graph():
    # the frame context {"@propagate": false} triggers the reference's
    # propagate pre-loop clone (jsonld.py:3253-3256), which DROPS
    # processingMode; the per-context restore (jsonld.py:3329-3331) then
    # defaults it back to json-ld-1.1, so (a) the 1.0-mode 'invalid
    # context entry' raise for @propagate never fires, and (b) frame's
    # omitGraph default flips to True -> NO @graph wrap
    out = api.frame(
        {"@context": {"@propagate": False}},
        {"@context": {"@propagate": False}},
        {"processingMode": "json-ld-1.0"},
    )
    assert out == {"@context": {"@propagate": False}}


def test_frame_10_propagate_true_still_raises():
    # {"@propagate": true} does NOT trigger the pre-loop clone (the
    # reference only clones when propagate becomes False and there is no
    # previousContext yet), so the mode survives and the 1.0 raise fires
    with pytest.raises(JsonLdError) as ei:
        api.expand(
            {"@context": {"@propagate": True}, K: "b"},
            {"processingMode": "json-ld-1.0"},
        )
    assert ei.value.code == "invalid context entry"


def test_expand_10_propagate_false_disables_10_checks_for_later_contexts():
    # after the mode drop, a LATER dict context in the same array also
    # restores to 1.1 -> @direction no longer raises in "1.0" mode
    out = api.expand(
        {"@context": [{"@propagate": False}, {"@direction": "ltr"}], K: "b"},
        {"processingMode": "json-ld-1.0"},
    )
    assert out == [{K: [{"@value": "b", "@direction": "ltr"}]}]


def test_expand_10_null_context_restores_options_mode():
    # a null context resets to the INITIAL context built from the OPTIONS
    # processing mode (reference jsonld.py:3277) -- so 1.0 checks come
    # back even after an earlier @propagate:false upgraded the mode
    with pytest.raises(JsonLdError) as ei:
        api.expand(
            {
                "@context": [{"@propagate": False}, None, {"@propagate": False}],
                K: "b",
            },
            {"processingMode": "json-ld-1.0"},
        )
    assert ei.value.code == "invalid context entry"


def test_frame_10_allows_embed_first_and_last():
    # is11 False -> the 'invalid @embed value' raise for @first/@last
    # (jsonld.py:4397-4405) is skipped; @first behaves like @once and
    # @last keeps the LAST embed
    doc = {
        "@context": {"k": K},
        "@id": "http://x/a",
        "k": {"@id": "http://x/b", "k": {"@id": "http://x/a"}},
    }
    fr = {"@context": {"k": K}, "@embed": "@first"}
    out = api.frame(dict(doc), dict(fr), {"processingMode": "json-ld-1.0"})
    assert out == {
        "@context": {"k": K},
        "@graph": [
            {"@id": "http://x/a", "k": {"@id": "http://x/b", "k": {"@id": "http://x/a"}}},
            {"@id": "http://x/b", "k": {"@id": "http://x/a", "k": {"@id": "http://x/b"}}},
        ],
    }


def test_frame_11_still_rejects_embed_first():
    with pytest.raises(JsonLdError) as ei:
        api.frame(
            {"@context": {"k": K}, "@id": "http://x/a", "k": {"@id": "http://x/b"}},
            {"@context": {"k": K}, "@embed": "@first"},
            {},
        )
    assert ei.value.code == "invalid @embed value"


def test_frame_10_version_upgrade_flips_omit_graph():
    # @version:1.1 in the frame context raises 'processing mode conflict'
    # during frame expansion in 1.0 mode. The reference wraps it as an
    # UNCODED FrameError (jsonld.py:811-814 'Could not process context
    # before framing'); this engine surfaces the coded cause directly --
    # documented graceful-coded divergence, same class as elsewhere.
    with pytest.raises(JsonLdError) as ei:
        api.frame(
            {K: "b"},
            {"@context": {"@version": 1.1}},
            {"processingMode": "json-ld-1.0"},
        )
    assert ei.value.code == "processing mode conflict"


def test_compact_10_propagate_false_no_raise():
    out = api.compact(
        {"@context": {"@propagate": False}},
        {"@propagate": False},
        {"processingMode": "json-ld-1.0"},
    )
    assert out == {"@context": {"@propagate": False}}


def test_flatten_10_graph_shape():
    out = api.flatten(
        {"@context": {"k": K}, "@id": "http://x/a", "k": "v"},
        None,
        {"processingMode": "json-ld-1.0"},
    )
    assert out == [{"@id": "http://x/a", K: [{"@value": "v"}]}]
