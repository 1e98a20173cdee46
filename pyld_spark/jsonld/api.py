"""Public JSON-LD API surface, mirroring the reference processor's module
functions (/root/reference/lib/pyld/jsonld.py:177-301): expand, compact,
flatten, to_rdf, from_rdf, normalize (+ RDF parser registry).

These are driver-side/per-document entry points; the distributed versions of
the same stages live in pyld_spark.operators.
"""

from __future__ import annotations

from pyld_spark.jsonld.canon import canonize_quads
from pyld_spark.jsonld.compact import compact as _compact_alg
from pyld_spark.jsonld.compact import compact_iri
from pyld_spark.jsonld.context import (
    DEFAULT_BASE_IRI,
    UNSET,
    Context,
    DocumentLoader,
    arrayify,
    initial_context,
    process_context,
)
from pyld_spark.jsonld.errors import JsonLdError
from pyld_spark.jsonld.expand import expand as _expand_alg
from pyld_spark.jsonld.fromrdf import from_rdf as _from_rdf_alg
from pyld_spark.jsonld.nodemap import flatten as _flatten_alg
from pyld_spark.jsonld.nquads import parse_nquads, serialize_quads
from pyld_spark.jsonld.rdf import to_rdf as _to_rdf_alg
from pyld_spark.jsonld.rdf import to_rdf_dataset as _to_rdf_dataset

_rdf_parsers: dict = {"application/n-quads": parse_nquads,
                      "application/nquads": parse_nquads}


def register_rdf_parser(content_type: str, parser) -> None:
    """Pluggable input-parser registry (reference jsonld.py:410-432)."""
    _rdf_parsers[content_type] = parser


def unregister_rdf_parser(content_type: str) -> None:
    _rdf_parsers.pop(content_type, None)


def load_html(input_, url, profile, options):
    """Reference-signature HTML script extraction (jsonld.py:6639-6738):
    selects by URL fragment id, else by ``profile``-typed scripts with a
    plain-ld+json fallback, else first/all scripts per
    ``options['extractAllScripts']``; a ``<base href>`` resolved against
    ``options['base']`` (or the document url) is written back into
    ``options['base']`` exactly like the reference mutates it."""
    from pyld_spark.jsonld.iri import resolve_iri
    from pyld_spark.sources.html_ingest import _BASE_RE, _visible_html
    from pyld_spark.sources.html_ingest import load_html as _load

    options = options if options is not None else {}
    m = _BASE_RE.search(_visible_html(input_))
    if m:
        href = m.group(1)
        effective = options.get("base", url)
        if effective:
            href = resolve_iri(effective, href)
        options["base"] = href
    return _load(
        input_, url,
        extract_all_scripts=options.get("extractAllScripts", False),
        profile=profile,
    )


def parse_link_header(header: str):
    """Re-export of the Link-header parser (reference jsonld.py
    parse_link_header) under the reference's module-level name."""
    from pyld_spark.sources.link_header import parse_link_header as _p

    return _p(header)


def canonicalize(obj, utf8: bool = True):
    """RFC 8785 (JCS) canonical JSON of ``obj`` — the reference's
    module-level ``canonicalize`` (its vendored c14n package): UTF-8
    bytes by default, the text form with ``utf8=False``."""
    from pyld_spark.jsonld.jcs import canonicalize as _jcs

    text = _jcs(obj)
    return text.encode("utf-8") if utf8 else text


def parse_nquads_dataset(input_: str) -> dict:
    """N-Quads → the reference's RDF-dataset dict shape
    ({graph_name: [{subject, predicate, object}, ...]}, reference
    jsonld.py parse_nquads) — no default-graph seeding: an input with no
    default-graph quads has no '@default' key, exactly like the
    reference."""
    dataset: dict = {}
    for s, p, o, g in parse_nquads(input_):
        dataset.setdefault(g, []).append(
            {"subject": s, "predicate": p, "object": o}
        )
    return dataset


def serialize_nquad(triple: dict, graph_name: str | None = None) -> str:
    """One dataset-dict triple (+ optional graph name) → one N-Quad line
    (reference jsonld.py serialize_nquad)."""
    from pyld_spark.jsonld.nquads import serialize_quad

    return serialize_quad(
        (triple["subject"], triple["predicate"], triple["object"],
         graph_name or "@default")
    )


def serialize_nquads(dataset: dict) -> str:
    """Dataset dict → sorted N-Quads string (reference jsonld.py
    serialize_nquads: per-line sort then join)."""
    lines = [
        serialize_nquad(t, None if g == "@default" else g)
        for g, triples in dataset.items()
        for t in triples
    ]
    lines.sort()
    return "".join(lines)


def get_context_value(active_ctx: Context, key, type_=None):
    """Term-definition lookup on a processed context (reference
    JsonLdProcessor.get_context_value, jsonld.py:1271-1310): returns the
    ``type_`` entry of ``key``'s term definition — with the context-level
    default as the fallback for ``@language`` / ``@direction`` — or the
    whole :class:`TermDef` when ``type_`` is None. An explicitly nulled
    term (``"key": null``) returns None even for the defaulted types,
    exactly like the reference's early return on a None mapping."""
    rval = None
    if key is None:
        return None
    if type_ == "@language" and active_ctx.default_language is not None:
        rval = active_ctx.default_language
    if type_ == "@direction" and active_ctx.default_direction is not None:
        rval = active_ctx.default_direction
    if key in active_ctx.terms:
        term = active_ctx.terms[key]
        if term is None:
            return None
        if type_ is None:
            return term
        # TermDef stores "absent" as the UNSET sentinel where the reference
        # omits the dict key — both mean "fall through to the default"
        attr = {
            "@id": term.iri,
            "@type": term.type,
            "@language": term.language,
            "@direction": term.direction,
            "@container": list(term.container) if term.has_container else UNSET,
            "@context": term.context,
            "@nest": term.nest if term.nest is not None else UNSET,
            "@index": term.index if term.index is not None else UNSET,
            "reverse": term.reverse,
            # always present in reference entries (initialized at
            # jsonld.py:5605 alongside reverse/_prefix)
            "protected": term.protected,
            "_prefix": term.prefix,
        }.get(type_, UNSET)
        if attr is not UNSET and not (
            type_ in ("@id", "@type") and attr is None
        ):
            rval = attr
    return rval


def _options(options: dict | None) -> dict:
    o = dict(options or {})
    # mirror the reference's option domain (jsonld.py:486/632/692): an
    # ABSENT base becomes '' (→ DEFAULT_BASE_IRI fallback at resolve time),
    # while an EXPLICIT base=None disables document-relative resolution
    # entirely (the resolve ladder at jsonld.py:6100-6119 skips every
    # branch when base is None)
    o.setdefault("_base_absent", "base" not in o)
    o.setdefault("base", "")
    o.setdefault("processingMode", "json-ld-1.1")
    o.setdefault("documentLoader", None)
    return o


def _make_context(options: dict) -> Context:
    b = options.get("base")
    ctx = initial_context(
        base=(b or None), processing_mode=options["processingMode"]
    )
    if b is None:
        ctx.base_disabled = True
    return ctx


def _loader(options: dict) -> DocumentLoader | None:
    dl = options.get("documentLoader")
    if dl is None or isinstance(dl, DocumentLoader):
        return dl
    if isinstance(dl, dict):
        return DocumentLoader(dl)
    raise JsonLdError("invalid documentLoader", "invalid option")


def expand(document, options: dict | None = None) -> list:
    o = _options(options)
    loader = _loader(o)
    if isinstance(document, str):
        # a string input is the IRI of a remote document (reference
        # jsonld.py:690-725): fetch through the loader, defaulting the base
        # to the document URL
        if loader is None:
            raise JsonLdError(
                f"could not retrieve document: {document}",
                "loading document failed",
            )
        url = document
        remote = loader.load(url)
        document = remote.get("document", remote)
        if o.get("_base_absent"):
            # reference jsonld.py:632: setdefault only fires when the user
            # did not pass a base at all
            o["base"] = remote.get("documentUrl", url) or ""
    if document is None:
        # a None document — direct or loader-returned — raises the coded
        # loading error (reference jsonld.py:641-653: the NullRemoteDocument
        # wrap fires for NON-string inputs too, since every input becomes a
        # remote-doc envelope first)
        raise JsonLdError(
            "No remote document found at the given URL.",
            "loading document failed",
        )
    ctx = _make_context(o)
    if ctx.base is None and ctx.original_base is None and not ctx.base_disabled:
        # the default document base must exist BEFORE any context is
        # processed: a non-propagating context snapshots `previous` at
        # process time, and a late default would leave that snapshot
        # base-less (reference initializes base at option-parse time)
        ctx.base = DEFAULT_BASE_IRI
        ctx.original_base = DEFAULT_BASE_IRI
    if o.get("expandContext") is not None:
        ec = o["expandContext"]
        if isinstance(ec, dict) and "@context" in ec:
            ec = ec["@context"]
        ctx = process_context(ctx, ec, o.get("base"), loader=loader)
    doc = document
    local_ctx = None
    if isinstance(doc, dict) and "@context" in doc:
        local_ctx = doc["@context"]
    if local_ctx is not None:
        ctx = process_context(ctx, local_ctx, o.get("base"), loader=loader)
        doc = {k: v for k, v in doc.items() if k != "@context"}
    return _expand_alg(
        doc, context=ctx, base_url=o.get("base"), loader=loader,
        frame_expansion=o.get("isFrame", False),
        keep_free_floating=o.get("keepFreeFloatingNodes", False),
        on_dropped=o.get("onPropertyDropped"),
        context_preapplied=local_ctx is not None,
    )


def compact(document, ctx, options: dict | None = None) -> dict:
    if ctx is None:
        # reference parity (jsonld.py:760-766): the MODULE wrapper rejects a
        # null context before the processor method runs — so
        # compact(None, None) errors while compact(None, {}) is None
        raise JsonLdError(
            "the compaction context must not be null", "invalid local context"
        )
    if document is None:
        # "nothing to compact" early return (reference jsonld.py:480-482)
        return None
    o = _options(options)
    loader = _loader(o)
    expanded = document if o.get("skipExpansion") else expand(document, o)
    ctx_value = ctx.get("@context") if isinstance(ctx, dict) and "@context" in ctx else ctx
    active = process_context(_make_context(o), ctx_value, o.get("base"), loader=loader)
    compacted = _compact_alg(
        active, None, expanded,
        compact_arrays=o.get("compactArrays", True),
        ordered=True, base_url=o.get("base"), loader=loader,
        link_memo=o.get("_linkMemo"),
    )
    # graph option: always produce a @graph-wrapped result (reference
    # jsonld.py:527-536)
    if o.get("graph") and not isinstance(compacted, list):
        compacted = [compacted]
    if isinstance(compacted, list):
        # the empty-list → {} simplification is gated on compactArrays
        # (reference jsonld.py:527-533): with compactArrays=False an empty
        # result compacts to {'@graph': []} (soak-found, options axis)
        if (
            not compacted
            and not o.get("graph")
            and o.get("compactArrays", True)
        ):
            compacted = {}
        else:
            kw_graph = compact_iri(active, "@graph", vocab=True)
            compacted = {kw_graph: compacted}
    # output context: arrayify, drop empty-object entries, unwrap a
    # singleton; attach whenever any entry remains — including null
    # (reference jsonld.py:538-574: ctx={'@context': None} emits
    # '@context': null)
    out_ctx = ctx_value if isinstance(ctx_value, list) else [ctx_value]
    out_ctx = [v for v in out_ctx if not isinstance(v, dict) or len(v) > 0]
    if out_ctx:
        compacted = {
            "@context": out_ctx[0] if len(out_ctx) == 1 else out_ctx,
            **compacted,
        }
    return compacted


def flatten(document, ctx=None, options: dict | None = None):
    o = _options(options)
    expanded = expand(document, o)
    flattened = _flatten_alg(expanded)
    if ctx is None:
        return flattened
    # the reference forces the @graph-wrapped form when compacting a
    # flattened result (jsonld.py:716-718)
    return compact(flattened, ctx, {**o, "skipExpansion": True, "graph": True})


def to_rdf(document, options: dict | None = None):
    o = _options(options)
    expanded = expand(document, o)
    if o.get("format") in ("application/n-quads", "application/nquads"):
        quads = _to_rdf_alg(
            expanded,
            produce_generalized_rdf=o.get("produceGeneralizedRdf", False),
            rdf_direction=o.get("rdfDirection"),
        )
        return serialize_quads(quads)
    if o.get("format") is not None:
        # reference parity (jsonld.py:1047-1056): any other requested
        # serialization is an error, not a silent dataset-dict return
        raise JsonLdError("Unknown output format.", "jsonld.UnknownFormat")
    # no serialization requested: the reference returns the RDF-dataset
    # dict ({graph_name: [{subject, predicate, object}, ...]}) — the same
    # shape its parse_nquads produces and from_rdf accepts. Built from the
    # node map (not the quad list) so EMPTY named graphs keep their keys
    # exactly like the reference (jsonld.py:1040-1044)
    return _to_rdf_dataset(
        expanded,
        produce_generalized_rdf=o.get("produceGeneralizedRdf", False),
        rdf_direction=o.get("rdfDirection"),
    )


def from_rdf(dataset, options: dict | None = None) -> list:
    o = _options(options)
    if isinstance(dataset, str):
        fmt = o.get("format", "application/n-quads")
        if fmt not in _rdf_parsers:
            raise JsonLdError(f"unknown input format {fmt}", "unknown format")
        try:
            dataset = _rdf_parsers[fmt](dataset)
        except JsonLdError:
            raise
        except ValueError as e:
            # mirror the reference's API surface: parse failures come out
            # as (uncoded) JsonLdErrors, never bare ValueErrors
            # (reference nquads.py parse → JsonLdError 'invalid quad')
            raise JsonLdError(str(e), "invalid N-Quads") from e
    if isinstance(dataset, dict):
        # the reference's parsed RDF-dataset shape — what its parse_nquads
        # returns and registered custom parsers produce (a user-registered
        # reference-style parser lands here via the string branch above)
        # ({graph_name: [{subject, predicate, object}, ...]}); terms are
        # the same {'type', 'value', ...} dicts this engine uses, so only
        # the graph key moves into the quad tuple. Graph KEYS are kept
        # separately: an EMPTY named graph must still seed its node
        # (reference jsonld.py:2934-2937)
        graph_names = list(dataset)
        dataset = [
            (t["subject"], t["predicate"], t["object"], graph)
            for graph, triples in dataset.items()
            for t in triples
        ]
        return _from_rdf_alg(
            dataset,
            use_native_types=o.get("useNativeTypes", False),
            use_rdf_type=o.get("useRdfType", False),
            rdf_direction=o.get("rdfDirection"),
            processing_mode=o["processingMode"],
            graph_names=graph_names,
        )
    elif not isinstance(dataset, (list, tuple)):
        # the reference dies with a bare AttributeError on e.g. an int
        # dataset; quarantine-grade coded error here instead
        raise JsonLdError(
            f"dataset must be a string, parsed dataset dict, or quad list; "
            f"got {type(dataset).__name__}",
            "invalid input",
        )
    return _from_rdf_alg(
        dataset,
        use_native_types=o.get("useNativeTypes", False),
        use_rdf_type=o.get("useRdfType", False),
        rdf_direction=o.get("rdfDirection"),
        processing_mode=o["processingMode"],
    )


def frame(document, frame_doc, options: dict | None = None):
    """Frame API (reference jsonld.py:222-232, 727-870)."""
    from pyld_spark.jsonld.frame import frame_expanded

    o = _options(options)
    expanded = expand(document, o)
    if isinstance(frame_doc, str):
        # remote frame: fetched through the loader like a remote document
        loader = _loader(o)
        if loader is None:
            raise JsonLdError(
                f"could not retrieve frame: {frame_doc}", "loading document failed"
            )
        remote = loader.load(frame_doc)
        frame_doc = remote.get("document", remote)
    frame_ctx = (
        frame_doc.get("@context") if isinstance(frame_doc, dict) else None
    )
    expanded_frame = expand(
        frame_doc, {**o, "isFrame": True, "keepFreeFloatingNodes": True}
    )
    # Mode-specific defaults (omitGraph / pruneBlankNodeIdentifiers / the
    # is11 @embed gate) derive from the PROCESSED frame context's mode, not
    # the raw processingMode option (reference jsonld.py:806-848). This
    # matters because context processing can silently CHANGE the mode: the
    # reference's _clone_active_context drops processingMode, so a frame
    # context whose first element carries @propagate:false loses the 1.0
    # mode and restores to the default 1.1 (see the QUIRK PARITY note in
    # context.process_context) — flipping omitGraph to True even under
    # processingMode=json-ld-1.0. An @version:1.1 upgrade does the same.
    try:
        _fctx = process_context(
            _make_context(o),
            frame_ctx if frame_ctx is not None else {},
            o.get("base") or None,
            loader=_loader(o),
        )
        is11 = _fctx.processing_mode != "json-ld-1.0"
    except JsonLdError:
        # the reference wraps frame-context errors as an UNCODED FrameError
        # before any framing work; the coded error already surfaced from
        # the expand(frame_doc) call above, so this branch is unreachable
        # in practice — keep the option-derived default as a safety net
        is11 = o["processingMode"] != "json-ld-1.0"
    framing_opts = {
        "embed": o.get("embed", "@once"),
        "explicit": o.get("explicit", False),
        "requireAll": o.get("requireAll", False),
        "omitDefault": o.get("omitDefault", False),
        "is11": is11,
        "pruneBlankNodeIdentifiers": o.get(
            "pruneBlankNodeIdentifiers", is11
        ),
    }
    framed = frame_expanded(expanded, expanded_frame, framing_opts)
    # @link framing produces SHARED (possibly cyclic) structures: compact
    # with an identity memo so sharing survives, and skip the (cycle-unsafe,
    # no-op for wildcard link frames) @null cleanup
    linking = framing_opts["embed"] == "@link" or any(
        isinstance(f, dict) and arrayify(f.get("@embed")) == ["@link"]
        for f in expanded_frame
    )
    # the @graph wrapping is COMPACTION's graph option (reference
    # jsonld.py:832-837 forces options['graph'] = not omitGraph), not a
    # post-hoc dict surgery — only inside compact can "one empty node"
    # ([{}] stays [{}]) be told apart from "zero nodes" ([] stays []);
    # a post-hoc wrap of the already-simplified {} loses that distinction
    # (soak-found, round-4 framing-options axis)
    omit_graph = o.get("omitGraph", is11)
    compact_opts = {**o, "skipExpansion": True, "graph": not omit_graph}
    if linking:
        compact_opts["_linkMemo"] = {}
    compacted = compact(
        framed, frame_ctx if frame_ctx is not None else {}, compact_opts
    )
    compacted = _cleanup_null(compacted)
    if compacted is None:
        compacted = {}
    return compacted


def _cleanup_null(value, _memo: dict | None = None):
    """Map framing '@null' markers to JSON null, removing nulls from ARRAYS
    only — object keys keep explicit null values (reference _cleanup_null,
    jsonld.py:5041-5072: e.g. a compacted @json null literal stays as
    "prop": null). Identity-memoized so the shared/cyclic structures
    produced by @link framing keep their sharing and the walk terminates."""
    if _memo is None:
        _memo = {}
    if isinstance(value, list):
        key = id(value)
        if key in _memo:
            return _memo[key]
        out: list = []
        _memo[key] = out
        for v in value:
            c = _cleanup_null(v, _memo)
            if c is not None:
                out.append(c)
        return out
    if value == "@null":
        return None
    if isinstance(value, dict):
        key = id(value)
        if key in _memo:
            return _memo[key]
        outd: dict = {}
        _memo[key] = outd
        for k, v in value.items():
            outd[k] = _cleanup_null(v, _memo)
        return outd
    return value


def link(document, ctx, options: dict | None = None):
    """Link API: frame with a wildcard @link embed (reference
    jsonld.py:235-262)."""
    frame_doc: dict = {"@embed": "@link"}
    if ctx:
        frame_doc["@context"] = ctx
    return frame(document, frame_doc, options)


def normalize(document, options: dict | None = None):
    o = _options(options)
    algorithm = o.get("algorithm", "URGNA2012")
    if algorithm not in ("URDNA2015", "URGNA2012"):
        raise JsonLdError(f"unknown algorithm {algorithm}", "invalid option")
    if o.get("inputFormat") in ("application/n-quads", "application/nquads"):
        quads = parse_nquads(document)
    else:
        expanded = expand(document, o)
        quads = _to_rdf_alg(
            expanded,
            produce_generalized_rdf=False,
            rdf_direction=o.get("rdfDirection"),
        )
    result = canonize_quads(quads, algorithm)
    if o.get("format") in ("application/n-quads", "application/nquads"):
        return result
    # no output format: the reference returns the canonical quads re-parsed
    # into the RDF-dataset dict shape
    return parse_nquads_dataset(result)
