"""HTTP Link-header parsing for context discovery (reference parity:
parse_link_header, /root/reference/lib/pyld/jsonld.py:323-368).

Companion to the HTML ingestion source: a server may advertise a JSON-LD
context for a non-JSON-LD document via
``Link: <ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"``.
At corpus scale the headers ride along as a column of the fetched-page
table and this parser runs inside the same ingestion UDF; the discovered
context URL then resolves through the frozen document loader.

Behavioral notes mirrored from the reference (verified by differential
tests): entries split on unbracketed/unquoted commas; parameters keep the
last occurrence; *unquoted* parameter values parse as '' (the reference's
quoted-group branch always wins in its findall tuple) — kept for parity.
"""

from __future__ import annotations

import re

JSONLD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"

_ENTRY_RE = re.compile(r'(?:<[^>]*?>|"[^"]*?"|[^,])+')
_LINK_RE = re.compile(r"\s*<([^>]*?)>\s*(?:;\s*(.*))?")
_PARAM_RE = re.compile(r'(.*?)=(?:(?:"([^"]*?)")|([^"]*?))\s*(?:(?:;\s*)|$)')


def parse_link_header(header: str) -> dict:
    """Parse a Link header into a map keyed by each entry's ``rel``.

    A rel appearing more than once maps to a list of entries; each entry is
    ``{'target': <iri>, <param>: <value>, ...}``.
    """
    rval: dict = {}
    for entry in _ENTRY_RE.findall(header):
        match = _LINK_RE.search(entry)
        if not match:
            continue
        target, params = match.groups()
        result = {"target": target}
        for name, quoted, _unquoted in _PARAM_RE.findall(params or ""):
            # reference quirk: the quoted group participates as '' for
            # unquoted values and the reference always selects it
            result[name] = quoted
        rel = result.get("rel", "")
        if isinstance(rval.get(rel), list):
            rval[rel].append(result)
        elif rel in rval:
            rval[rel] = [rval[rel], result]
        else:
            rval[rel] = result
    return rval


def context_link_from_headers(headers: dict) -> str | None:
    """Extract the advertised JSON-LD context URL from response headers.

    Returns None when no context link is present; raises when the server
    sends more than one (spec: 'multiple context link headers')."""
    from pyld_spark.jsonld.errors import JsonLdError

    link = headers.get("Link") or headers.get("link")
    if not link:
        return None
    parsed = parse_link_header(link).get(JSONLD_CONTEXT_REL)
    if parsed is None:
        return None
    if isinstance(parsed, list):
        raise JsonLdError(
            "multiple context link headers", "multiple context link headers"
        )
    return parsed.get("target")
