from __future__ import annotations

import json

import pytest

from pyld_spark.jsonld.errors import JsonLdError
from pyld_spark.sources.html_ingest import (
    extract_scripts,
    html_base,
    html_to_documents,
    load_html,
)

HTML = """<!DOCTYPE html><html><head>
<base href="/sub/dir/">
<script type="application/ld+json">
{"@context": {"n": "http://e/n"}, "@id": "http://e/a", "n": "first"}
</script>
<script type="text/javascript">var x = 1;</script>
<script type="application/ld+json;profile=http://www.w3.org/ns/json-ld#expanded" id="second">
[{"@id": "http://e/b", "http://e/n": [{"@value": "second"}]}]
</script>
</head><body></body></html>"""

BAD_HTML = '<script type="application/ld+json">{not json</script>'


def test_extract_all_scripts():
    docs = load_html(HTML, extract_all_scripts=True)
    assert isinstance(docs, list) and len(docs) == 2
    assert docs[0]["@id"] == "http://e/a"
    assert docs[1]["@id"] == "http://e/b"


def test_extract_first_script_only():
    doc = load_html(HTML, extract_all_scripts=False)
    assert doc["@id"] == "http://e/a"


def test_fragment_selects_script_by_id():
    doc = load_html(HTML, url="http://site/page#second")
    assert doc[0]["@id"] == "http://e/b"
    with pytest.raises(JsonLdError) as ei:
        load_html(HTML, url="http://site/page#missing")
    assert ei.value.code == "loading document failed"


def test_base_href_resolved():
    assert html_base(HTML, "http://site/page") == "http://site/sub/dir/"


def test_invalid_json_error_code():
    # extraction itself is lazy (reference parses only the selected script);
    # the error surfaces when the bad script is actually parsed
    with pytest.raises(JsonLdError) as ei:
        load_html(BAD_HTML, None, extract_all_scripts=True)
    assert ei.value.code == "invalid script element"


def test_html_to_documents_stage(spark):
    pages = spark.createDataFrame(
        [(1, HTML, "http://site/page"), (2, BAD_HTML, "http://x/"),
         (3, "<html>no scripts</html>", None)],
        ["page_id", "html", "url"],
    )
    out = {r.doc_id: r for r in html_to_documents(pages, url_col="url").collect()}
    assert out["1"].error_code is None
    docs = json.loads(out["1"].doc)
    assert len(docs) == 2 and out["1"].base == "http://site/sub/dir/"
    assert out["2"].error_code == "invalid script element"
    assert out["3"].error_code == "loading document failed"

    # the extracted docs feed the triples stage directly
    from pyld_spark.operators.expand_stage import docs_to_triples, split_quarantine

    good = html_to_documents(pages, url_col="url").filter("error_code is null")
    triples, q = split_quarantine(
        docs_to_triples(good, id_col="doc_id", doc_col="doc")
    )
    vals = {r.obj_value for r in triples.collect() if r.obj_kind == "literal"}
    assert {"first", "second"} <= vals


def test_comment_start_inside_script_body_is_data():
    # html5 script-data state: "<!--" inside a script element is raw text,
    # not a comment start — found by the round-4 page fuzz when a planted
    # JSON payload contained "<!--" and the old strip-comments-first pass
    # ate the rest of the page
    from pyld_spark.sources.html_ingest import extract_scripts

    page = (
        '<html><body>'
        '<script type="application/ld+json" id="s0">"<!--"</script>'
        '<!-- <script type="application/ld+json">{"commented": 1}'
        '</script> -->'
        '<script type="application/ld+json" id="s1">[]</script>'
        '</body></html>'
    )
    got = extract_scripts(page)
    assert got == ['"<!--"', "[]"]


def test_unterminated_comment_hides_rest_of_page():
    from pyld_spark.sources.html_ingest import extract_scripts

    page = (
        '<script type="application/ld+json">1</script>'
        '<!-- unterminated '
        '<script type="application/ld+json">2</script>'
    )
    assert extract_scripts(page) == ["1"]


def test_api_load_html_reference_signature_and_profile_selection():
    # api.load_html mirrors the reference signature (input, url, profile,
    # options): profile-typed scripts preferred with plain-ld+json
    # fallback (jsonld.py:6697-6704), fragment-id selection wins over
    # profile, <base href> resolved against options['base'] (or the url)
    # is written back into options['base'] like the reference mutates it
    from pyld_spark.jsonld import api

    html = (
        '<html><head><base href="sub/x">\n'
        '<script type="application/ld+json;profile=http://p/">{"a": 1}'
        "</script>\n"
        '<script type="application/ld+json">{"b": 2}</script>\n'
        '<script type="application/ld+json" id="frag1">{"c": 3}</script>\n'
        "</head></html>"
    )
    opts = {}
    assert api.load_html(html, "http://h/doc", "http://p/", opts) == {"a": 1}
    assert opts["base"] == "http://h/sub/x"
    # unmatched profile falls back to ALL ld+json scripts, first wins
    assert api.load_html(html, "http://h/doc", "http://no/", {}) == {"a": 1}
    assert api.load_html(html, "http://h/doc#frag1", None, {}) == {"c": 3}
    assert api.load_html(
        html, "http://h/doc", None, {"extractAllScripts": True}
    ) == [{"a": 1}, {"b": 2}, {"c": 3}]
    opts = {"base": "http://other/dir/"}
    api.load_html(html, "http://h/doc", None, opts)
    assert opts["base"] == "http://other/dir/sub/x"
