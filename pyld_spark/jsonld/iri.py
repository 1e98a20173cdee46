"""RFC 3986 IRI resolution (resolve + relativize).

Reference parity: /root/reference/lib/pyld/iri_resolver.py (behavioral only —
this is a fresh implementation of RFC 3986 §5). Pure string functions, safe
to vectorize inside pandas UDF batches.
"""

from __future__ import annotations

import re
from functools import lru_cache

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_PARTS_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)

_ABSOLUTE_IRI_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*|_):[^\s]*$")


@lru_cache(maxsize=16384)
def _abs_iri_match(value: str) -> bool:
    return bool(_ABSOLUTE_IRI_RE.match(value))


def is_absolute_iri(value: str) -> bool:
    """Loose absolute-IRI test: scheme (or ``_`` for bnodes) + no whitespace.

    Hot path (every subject/predicate/object of every quad): IRIs repeat
    heavily across a corpus, so the regex result is LRU-cached per worker
    process."""
    return isinstance(value, str) and _abs_iri_match(value)


def parse_iri(iri: str):
    m = _PARTS_RE.match(iri)
    return m.groups()  # scheme, authority, path, query, fragment


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    if not path:
        return ""
    output: list[str] = []
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if output:
                output.pop()
        elif inp == "/..":
            inp = "/"
            if output:
                output.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            # move first path segment (incl. leading /) to output
            i = 0
            if inp.startswith("/"):
                i = 1
            j = inp.find("/", i)
            if j == -1:
                output.append(inp)
                inp = ""
            else:
                output.append(inp[:j])
                inp = inp[j:]
    return "".join(output)


def _remove_dot_segments_of_path(iri: str, colon_pos: int) -> str:
    """Dot-segment removal applied only to the path part (reference
    iri_resolver.remove_dot_segments_of_path, lines 92-126)."""
    if colon_pos >= 0:
        if (
            len(iri) > colon_pos + 2
            and iri[colon_pos + 1] == "/"
            and iri[colon_pos + 2] == "/"
        ):
            search_offset = colon_pos + 3
        else:
            search_offset = colon_pos + 1
    else:
        search_offset = 2 if len(iri) > 1 and iri[0] == "/" and iri[1] == "/" else 0
    path_separator = iri.find("/", search_offset)
    if path_separator < 0:
        return iri
    return iri[:path_separator] + remove_dot_segments(iri[path_separator:])


def resolve_iri(base: str | None, rel: str) -> str:
    """RFC 3986 §5.2 transform-references merge, with one deliberate
    reference-parity quirk: a relative IRI containing a colon ANYWHERE
    (except when it starts with '#' or '?') is treated as opaque/absolute
    and never resolved against the base — the reference resolver checks
    ``relative_iri.find(':') >= 0`` (iri_resolver.py:174-176), so '0#:',
    'a#b:c' and even '//host:80/p' skip base resolution entirely."""
    if rel is None:
        rel = ""
    if base is None or base == "":
        return rel
    if ":" in rel and not rel.startswith(("#", "?")):
        return _remove_dot_segments_of_path(rel, rel.find(":"))
    r_scheme, r_auth, r_path, r_query, r_frag = parse_iri(rel)
    b_scheme, b_auth, b_path, b_query, _ = parse_iri(base)
    if r_scheme is not None:
        scheme, auth, path, query = r_scheme, r_auth, remove_dot_segments(r_path), r_query
    else:
        scheme = b_scheme
        if r_auth is not None:
            auth, path, query = r_auth, remove_dot_segments(r_path), r_query
        else:
            if r_path == "":
                path = b_path
                query = r_query if r_query is not None else b_query
            else:
                if r_path.startswith("/"):
                    path = remove_dot_segments(r_path)
                else:
                    # merge paths (RFC 3986 §5.2.3)
                    if b_auth is not None and b_path == "":
                        merged = "/" + r_path
                    else:
                        merged = b_path[: b_path.rfind("/") + 1] + r_path
                    path = remove_dot_segments(merged)
                query = r_query
            auth = b_auth
    out = ""
    if scheme is not None:
        out += scheme + ":"
    if auth is not None:
        out += "//" + auth
    out += path
    if query is not None:
        out += "?" + query
    if r_frag is not None:
        out += "#" + r_frag
    return out


def _strip_default_port(parsed) -> str | None:
    """Authority with default http/https ports stripped (reference
    iri_resolver.parse_authority)."""
    auth = parsed.netloc or None
    try:
        port = parsed.port
    except Exception:  # noqa: BLE001 — invalid port strings
        port = None
    if (
        auth is not None
        and port is not None
        and (
            (parsed.scheme == "https" and port == 443)
            or (parsed.scheme == "http" and port == 80)
        )
    ):
        auth = auth.rsplit(":", 1)[0]
    return auth


def relativize_iri(base: str | None, iri: str) -> str:
    """Exact port of the reference's unresolve
    (iri_resolver.py:236-300), used by compaction: matching-segment
    removal, '../' per remaining base segment, './' for the empty result,
    './@...' guard, default-port-insensitive authority compare.

    One deliberate divergence: a scheme-less base raises ValueError in the
    reference (a crash at compaction time); we return the IRI unchanged.
    """
    if not base:
        return iri
    from urllib.parse import urlparse, urlunparse

    b = urlparse(base)
    if not b.scheme:
        # reference raises ValueError here — graceful divergence
        return iri
    r = urlparse(iri)
    if not (b.scheme == r.scheme and _strip_default_port(b) == _strip_default_port(r)):
        return iri

    base_segments = remove_dot_segments(b.path).split("/")
    iri_segments = remove_dot_segments(r.path).split("/")
    # do not consume the last segment unless a query/fragment follows
    last = 0 if (r.fragment or r.query) else 1
    while (
        base_segments
        and len(iri_segments) > last
        and base_segments[0] == iri_segments[0]
    ):
        base_segments.pop(0)
        iri_segments.pop(0)
    rval = ""
    if base_segments:
        # the last base segment is not a path level
        base_segments.pop()
        rval += "../" * len(base_segments)
    rval += "/".join(iri_segments)
    # relative IRIs must not look like keywords
    if rval and rval[0] == "@":
        rval = "./" + rval
    return urlunparse(("", "", rval, "", r.query or "", r.fragment or "")) or "./"
