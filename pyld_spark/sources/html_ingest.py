"""HTML JSON-LD ingestion (reference analogue: load_html,
/root/reference/lib/pyld/jsonld.py:6639-6738 — there lxml-based; here a
dependency-free regex extractor so executors need no native libs).

Semantics mirrored from the reference/spec:
- collect ``<script type="application/ld+json">`` blocks (type match is
  case-insensitive, ignores parameters like ``;profile=...``);
- ``extract_all_scripts=False`` → first script only (or the one addressed by
  a ``#fragment`` id on the document URL);
- ``extract_all_scripts=True`` → all scripts merged into one ``@graph``
  array (objects with ``@context`` are kept whole as array entries);
- honor ``<base href>`` for the document base when present;
- invalid JSON in a script → spec error ``invalid script element``.

Spark surface: :func:`html_to_documents` — a vectorized mapInPandas stage
over an HTML column, emitting one JSON-LD document string per page (+
quarantine rows).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from pyld_spark.jsonld.errors import JsonLdError

_SCRIPT_RE = re.compile(
    r"<script\b(?P<attrs>[^>]*)>(?P<body>.*?)</script\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TYPE_RE = re.compile(
    r"""\btype\s*=\s*["']application/ld\+json\s*(?:;[^"']*)?["']""",
    re.IGNORECASE,
)
_ID_RE = re.compile(r"""\bid\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
_BASE_RE = re.compile(
    r"""<base\b[^>]*\bhref\s*=\s*["']([^"']*)["']""", re.IGNORECASE
)


def extract_scripts(html: str, fragment: str | None = None) -> list:
    """All JSON-LD script payloads (parsed), in document order; with a
    ``fragment``, only the script whose id matches."""
    out = []
    for m in _SCRIPT_RE.finditer(html):
        attrs = m.group("attrs")
        if not _TYPE_RE.search(attrs):
            continue
        if fragment is not None:
            id_m = _ID_RE.search(attrs)
            if id_m is None or id_m.group(1) != fragment:
                continue
        body = m.group("body").strip()
        try:
            out.append(json.loads(body))
        except ValueError as e:
            raise JsonLdError(
                f"invalid JSON in ld+json script: {e}", "invalid script element"
            )
    if fragment is not None and not out:
        raise JsonLdError(
            f"no ld+json script with id={fragment}", "loading document failed"
        )
    return out


def html_base(html: str, document_url: str | None = None) -> str | None:
    m = _BASE_RE.search(html)
    if m:
        from pyld_spark.jsonld.iri import resolve_iri

        return resolve_iri(document_url, m.group(1))
    return document_url


def load_html(html: str, url: str | None = None,
              extract_all_scripts: bool = False):
    """HTML → JSON-LD document (reference load_html semantics)."""
    fragment = None
    if url and "#" in url:
        url, fragment = url.split("#", 1)
    scripts = extract_scripts(html, fragment or None)
    if not scripts:
        raise JsonLdError("no ld+json scripts found", "loading document failed")
    if fragment is not None or not extract_all_scripts:
        return scripts[0]
    merged = []
    for s in scripts:
        if isinstance(s, list):
            merged.extend(s)
        else:
            merged.append(s)
    return merged


HTML_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("doc", StringType(), True),
        StructField("base", StringType(), True),
        StructField("error_code", StringType(), True),
    ]
)


def html_to_documents(
    pages: DataFrame,
    id_col: str = "page_id",
    html_col: str = "html",
    url_col: str | None = None,
    extract_all_scripts: bool = True,
) -> DataFrame:
    """(page_id, html[, url]) → (doc_id, JSON-LD doc json, base, error_code).

    Vectorized mapInPandas; output feeds directly into
    ``expand_stage.docs_to_triples``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            urls = pdf[url_col] if url_col else [None] * len(pdf)
            for doc_id, html, url in zip(pdf[id_col], pdf[html_col], urls):
                try:
                    doc = load_html(html, url, extract_all_scripts)
                    base = html_base(html, url)
                    rows.append((str(doc_id), json.dumps(doc), base, None))
                except JsonLdError as e:
                    rows.append((str(doc_id), None, None, e.code))
                except Exception as e:  # noqa: BLE001
                    rows.append(
                        (str(doc_id), None, None,
                         f"internal error: {type(e).__name__}")
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "doc", "base", "error_code"])

    return pages.mapInPandas(run, HTML_DOC_SCHEMA)
