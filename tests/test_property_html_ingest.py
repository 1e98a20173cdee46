"""Adversarial HTML-ingestion fuzz (round-3 verdict item 6).

lxml is not installed in this container, so the reference's real
``load_html`` (jsonld.py:6639-6738) cannot run — instead pages are GENERATED
with by-construction expectations that model its documented semantics:

- commented-out ``<script>`` blocks are comment nodes, never elements;
- type matching is ``starts-with(@type, "application/ld+json")`` — any
  suffix matches (profile params, junk);
- only the SELECTED script is parsed (``elements[0]`` or the
  fragment-addressed one) — invalid JSON elsewhere is invisible unless
  extractAllScripts;
- extractAllScripts extends top-level arrays into the merged result;
- ``<base href>`` resolves against the document URL.

Each generated page plants known payloads among adversarial noise
(decoy types, comments containing scripts, attribute order/quoting/case
variation, embedded ``<script`` text in JSON strings, malformed JSON in
decoys) and asserts exact recovery.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyld_spark.jsonld.errors import JsonLdError
from pyld_spark.sources.html_ingest import extract_scripts, html_base, load_html

_quotes = st.sampled_from(['"', "'"])
_type_suffix = st.sampled_from(["", ";profile=http://x", "-junk", ";charset=utf-8", "  "])
_type_case = st.sampled_from(["type", "TYPE", "Type"])
_ws = st.sampled_from(["", " ", "  ", "\n", "\t"])

_payloads = st.recursive(
    st.one_of(
        st.none(), st.booleans(), st.integers(-1000, 1000),
        st.text(alphabet="ab<>/script!-", max_size=12),
    ),
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.sampled_from(["@id", "@type", "p", "q"]), inner, max_size=3),
    ),
    max_leaves=6,
)


def _script_tag(payload_json, quote, tcase, suffix, ws, script_id=None,
                attrs_order_flip=False):
    type_attr = f'{tcase}={quote}application/ld+json{suffix}{quote}'
    id_attr = f'id={quote}{script_id}{quote}' if script_id else ""
    attrs = f"{id_attr} {type_attr}" if attrs_order_flip else f"{type_attr} {id_attr}"
    return f"<script {ws}{attrs.strip()}{ws}>{payload_json}</script>"


@st.composite
def _pages(draw):
    quote = draw(_quotes)
    tcase = draw(_type_case)
    n_planted = draw(st.integers(1, 4))
    planted = []
    parts = ["<html><head>"]
    base_href = draw(st.sampled_from([None, "sub/", "http://abs.example/b/", "#frag"]))
    if base_href is not None:
        parts.append(f"<base href={quote}{base_href}{quote}>")
    parts.append("</head><body>")
    for i in range(n_planted):
        payload = draw(_payloads)
        pj = json.dumps(payload)
        if "</script" in pj.lower():
            # HTML rule both sides share: script content ends at the first
            # close tag — such payloads can't round-trip; skip planting
            payload, pj = {"safe": i}, json.dumps({"safe": i})
        planted.append(payload)
        suffix = draw(_type_suffix)
        parts.append(_script_tag(
            pj, quote, tcase, suffix, draw(_ws),
            script_id=f"s{i}", attrs_order_flip=draw(st.booleans()),
        ))
        # adversarial noise after each planted script:
        noise_kind = draw(st.integers(0, 4))
        if noise_kind == 0:
            parts.append(f"<!-- <script type={quote}application/ld+json{quote}>"
                         f'{{"commented": true}}</script> -->')
        elif noise_kind == 1:
            parts.append(f"<script type={quote}text/javascript{quote}>"
                         f"var x = '<' + 'script';</script>")
        elif noise_kind == 2:
            parts.append(f"<script type={quote}application/json{quote}>"
                         "{not ld json}</script>")
        elif noise_kind == 3:
            parts.append("<p>text with a stray &lt;script&gt; entity</p>")
        # kind 4: nothing
    parts.append("</body></html>")
    return "".join(parts), planted, base_href


@settings(max_examples=500, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_pages())
def test_extraction_recovers_planted_scripts(page):
    html, planted, _base = page
    got = [json.loads(b) for b in extract_scripts(html)]
    assert got == planted

    # first-script-only semantics
    assert load_html(html, None, extract_all_scripts=False) == planted[0]

    # merged semantics: arrays extend
    merged = load_html(html, None, extract_all_scripts=True)
    want = []
    for p in planted:
        want.extend(p) if isinstance(p, list) else want.append(p)
    assert merged == want


@settings(max_examples=300, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_pages(), st.integers(0, 3))
def test_fragment_selection(page, frag_i):
    html, planted, _ = page
    if frag_i >= len(planted):
        with pytest.raises(JsonLdError) as ei:
            load_html(html, f"http://ex.org/page#s{frag_i}")
        assert ei.value.code == "loading document failed"
    else:
        got = load_html(html, f"http://ex.org/page#s{frag_i}")
        assert got == planted[frag_i]


@settings(max_examples=200, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_pages())
def test_base_resolution(page):
    html, _, base_href = page
    url = "http://ex.org/dir/page"
    got = html_base(html, url)
    if base_href is None:
        assert got == url
    elif base_href.startswith("http://"):
        assert got == base_href
    elif base_href == "sub/":
        assert got == "http://ex.org/dir/sub/"
    elif base_href == "#frag":
        assert got == "http://ex.org/dir/page#frag"


def test_invalid_json_in_unselected_script_is_invisible():
    html = (
        '<script type="application/ld+json">{"ok": 1}</script>'
        '<script type="application/ld+json">{broken</script>'
    )
    assert load_html(html, None, extract_all_scripts=False) == {"ok": 1}
    with pytest.raises(JsonLdError) as ei:
        load_html(html, None, extract_all_scripts=True)
    assert ei.value.code == "invalid script element"


def test_commented_out_script_is_not_an_element():
    html = (
        '<!-- <script type="application/ld+json">{"ghost": 1}</script> -->'
        '<script type="application/ld+json">{"real": 1}</script>'
    )
    assert [json.loads(b) for b in extract_scripts(html)] == [{"real": 1}]
    # commented-out base href is equally invisible
    h2 = '<!-- <base href="http://evil/"> --><base href="ok/">'
    assert html_base(h2, "http://ex.org/") == "http://ex.org/ok/"


def test_type_starts_with_semantics():
    html = (
        '<script type="application/ld+json-weird">{"a": 1}</script>'
        '<script type="application/ld+jsonx">{"b": 2}</script>'
        '<script type="application/ld+jso">{"c": 3}</script>'
    )
    got = [json.loads(b) for b in extract_scripts(html)]
    assert got == [{"a": 1}, {"b": 2}]
