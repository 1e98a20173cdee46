"""JSON-LD 1.1 context processing: active contexts, term definitions, IRI
expansion (W3C JSON-LD 1.1 API §4.1, §4.2, §5.2).

Fresh implementation from the spec; behavioral parity target is the reference
processor's _process_context / _create_term_definition / _expand_iri
(/root/reference/lib/pyld/jsonld.py:3198-3581, 5500-6031, 6033-6120).

Spark role (SURVEY.md §2.2): this is *metadata prep*. Static pipeline contexts
are processed once on the driver and shipped to executors inside UDF closures
(Context is picklable); per-document dynamic contexts are processed inside the
pandas-UDF batch against a broadcast dict of pre-fetched context documents —
executors never touch the network.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from pyld_spark.jsonld.errors import JsonLdError
from pyld_spark.jsonld.iri import is_absolute_iri, resolve_iri

#: EXACT reference keyword set (jsonld.py:115-147): includes @first,
#: excludes @prefix/@null/@any — so '@prefix', '@null', '@any' document
#: keys are keyword-LIKE (warn + drop) while '@first' falls through the
#: generic keyword path
KEYWORDS = {
    "@base", "@container", "@context", "@default", "@direction", "@embed",
    "@explicit", "@first", "@graph", "@id", "@import", "@included",
    "@index", "@json", "@language", "@list", "@nest", "@none",
    "@omitDefault", "@propagate", "@protected", "@preserve", "@requireAll",
    "@reverse", "@set", "@type", "@value", "@version", "@vocab",
}

_KEYWORD_LIKE_RE = re.compile(r"^@[A-Za-z]+$")

MAX_CONTEXT_URLS = 10


class _Unset:
    """Picklable tri-state sentinel (absent vs explicit null vs value)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "UNSET"

    def __bool__(self):
        return False


UNSET = _Unset()


def is_keyword(value) -> bool:
    # hot path: the leading-char check short-circuits the set lookup for the
    # overwhelmingly common non-keyword case
    return (
        isinstance(value, str) and value.startswith("@") and value in KEYWORDS
    )


def is_keyword_like(value) -> bool:
    if not isinstance(value, str) or not value.startswith("@"):
        return False
    rest = value[1:]
    return bool(rest) and rest.isascii() and rest.isalpha()


def arrayify(value) -> list:
    if value is None:
        return []
    return value if isinstance(value, list) else [value]


@dataclass
class TermDef:
    iri: str | None = None
    reverse: bool = False
    type: str | None = None
    language: object = UNSET  # UNSET | None | str
    direction: object = UNSET  # UNSET | None | 'ltr' | 'rtl'
    # stored as the reference stores it (jsonld.py:5911): the ARRAYIFIED
    # RAW list, order and duplicates preserved — ["@set","@set"] keys the
    # inverse context as "@set@set" and is distinct from ["@set"] under
    # protected-redefinition equality. has_container distinguishes an
    # explicit empty array (inverse key "") from an absent @container
    # (inverse key "@none", reference jsonld.py:6166).
    container: tuple = ()
    has_container: bool = False
    context: object = UNSET  # scoped context value (raw)
    context_base: str | None = None
    nest: str | None = None
    prefix: bool = False
    protected: bool = False
    index: str | None = None

    def same_except_protected(self, other: "TermDef") -> bool:
        # context_base is excluded: the reference's mapping equality doesn't
        # track where a scoped context came from, so redefining a protected
        # term with the same definition from a DIFFERENT document (remote vs
        # inline) is allowed
        return replace(self, protected=False, context_base=None) == replace(
            other, protected=False, context_base=None
        )


#: The reference's synthetic document base when none is supplied
#: (jsonld.py:157, applied at jsonld.py:6114-6115 whenever document-relative
#: resolution runs with base '').
DEFAULT_BASE_IRI = "http://example.org/base/"


@dataclass
class Context:
    terms: dict = field(default_factory=dict)
    base: str | None = None
    #: True after an explicit {"@base": null} — distinguishes "nulled"
    #: (keep IRIs relative) from "never set" (reference falls back to
    #: DEFAULT_BASE_IRI for document-relative expansion)
    base_nulled: bool = False
    #: True when the API was called with an EXPLICIT base=None option —
    #: the reference's resolve ladder (jsonld.py:6100-6119) then skips
    #: every branch (including the in-context @base one, which requires
    #: `base is not None`), so ALL document-relative resolution is off
    base_disabled: bool = False
    original_base: str | None = None
    vocab: str | None = None
    default_language: str | None = None
    default_direction: str | None = None
    previous: "Context | None" = None
    processing_mode: str = "json-ld-1.1"
    # cache slot for the inverse context (built lazily by compaction)
    _inverse: dict | None = field(default=None, compare=False, repr=False)
    # runtime key→expanded-IRI memo (expansion hot path). Safe because term
    # definitions only mutate during process_context, which always works on
    # a clone() — and clones start with a fresh cache.
    _rt_cache: dict = field(default_factory=dict, compare=False, repr=False)

    def clone(self) -> "Context":
        return Context(
            terms=dict(self.terms),
            base=self.base,
            base_nulled=self.base_nulled,
            base_disabled=self.base_disabled,
            original_base=self.original_base,
            vocab=self.vocab,
            default_language=self.default_language,
            default_direction=self.default_direction,
            previous=self.previous,
            processing_mode=self.processing_mode,
        )

    def has_protected_terms(self) -> bool:
        return any(t.protected for t in self.terms.values())


def initial_context(base: str | None = None, processing_mode: str = "json-ld-1.1") -> Context:
    return Context(base=base, original_base=base, processing_mode=processing_mode)


class DocumentLoader:
    """Hermetic loader: a dict of pre-fetched documents keyed by URL.

    The scale-out model (SURVEY.md §2.1, frozen-loader pattern): contexts are
    fetched/bundled ahead of time on the driver and broadcast; executors only
    ever hit this dict. Unknown URLs raise ``loading remote context failed``.
    """

    def __init__(self, documents: dict | None = None):
        self.documents = documents or {}

    def load(self, url: str) -> dict:
        if url not in self.documents:
            raise JsonLdError(
                f"context URL not in preloaded set: {url}", "loading remote context failed"
            )
        return {"document": self.documents[url], "documentUrl": url}


_EMPTY_LOADER = DocumentLoader()


def _resolve_import_targets(loader: DocumentLoader, url, base, cycles: set) -> list:
    """Follow a remote context URL to its LEAF payloads, mirroring the
    reference resolver's flattening (context_resolver.py:44-98,120-207):
    a remote document whose ``@context`` is a string is followed (relative
    URLs resolve against that document's URL); lists flatten; leaves are
    context dicts or None/False. Cycle/overflow checks use the 1.1
    'context overflow' code (the @import path is 1.1-only)."""
    url = resolve_iri(base, url)
    if url in cycles:
        raise JsonLdError(f"cyclic context: {url}", "context overflow")
    if len(cycles) > MAX_CONTEXT_URLS:
        raise JsonLdError("too many remote contexts", "context overflow")
    cycles.add(url)
    loaded = loader.load(url)
    doc = loaded["document"]
    if not isinstance(doc, dict):
        raise JsonLdError(
            f"remote context is not an object: {url}", "invalid remote context"
        )
    doc_url = loaded.get("documentUrl", url)
    payload = doc.get("@context", {})
    leaves: list = []
    for el in payload if isinstance(payload, list) else [payload]:
        if isinstance(el, str):
            leaves.extend(_resolve_import_targets(loader, el, doc_url, cycles))
        elif el is None or el is False or isinstance(el, dict):
            leaves.append(el)
        else:
            raise JsonLdError(
                "@context must be object/string/null", "invalid local context"
            )
    return leaves


def process_context(
    active: Context,
    local,
    base_url: str | None = None,
    *,
    loader: DocumentLoader | None = None,
    remote_contexts: list | None = None,
    override_protected: bool = False,
    propagate: bool = True,
    validate_scoped: bool = True,
    cycles: set | None = None,
    _allow_propagate_override: bool = True,
) -> Context:
    """Context Processing Algorithm (JSON-LD 1.1 API §4.1.2)."""
    loader = loader or _EMPTY_LOADER
    remote_contexts = list(remote_contexts or [])
    if cycles is None:
        cycles = set()
    result = active.clone()

    items = local if isinstance(local, list) else [local]
    # propagate override: FIRST RESOLVED context only, bool values only
    # (reference jsonld.py:3242-3246 — the resolver flattens remote chains,
    # so an @propagate on a NON-first element, however deeply chained, is
    # error-checked but has no effect; _allow_propagate_override=False in
    # the recursion for non-first remote elements mirrors that)
    _first = items[0] if items else None
    if (
        _allow_propagate_override
        and isinstance(_first, dict)
        and isinstance(_first.get("@propagate"), bool)
    ):
        propagate = _first["@propagate"]
    mode_dropped = False
    if propagate is False and result.previous is None:
        result.previous = active
        # QUIRK PARITY: the reference's _clone_active_context drops
        # processingMode (jsonld.py:6230-6247), so after this clone
        # (jsonld.py:3253-3256) every dict context in this call restores the
        # mode to the DEFAULT 'json-ld-1.1' (jsonld.py:3329-3331) — silently
        # disabling 1.0-mode checks (e.g. {"@propagate": false} never raises
        # 'invalid context entry' in 1.0 mode, while {"@propagate": true}
        # does). Mirrored via this flag.
        mode_dropped = True

    for idx, context in enumerate(items):
        if context is None:
            # reference checks the context built SO FAR (jsonld.py:3267-3276):
            # a protected term defined earlier in the same context array also
            # blocks nullification
            if not override_protected and result.has_protected_terms():
                raise JsonLdError(
                    "tried to nullify a context with protected terms",
                    "invalid context nullification",
                )
            # nullification replaces the working context with a FRESH
            # initial context — previousContext included: the reference's
            # `rval = self._get_initial_context(options)` (jsonld.py:3277)
            # drops the previous context the propagate=False pre-loop set,
            # so a null TYPE-scoped context (stored as False,
            # jsonld.py:5934) nullifies IRREVERSIBLY — the later
            # new-node-object revert is a no-op and reverse/property keys
            # compact to full IRIs (soak-found, round-4 options axis)
            result = initial_context(
                base=active.original_base, processing_mode=active.processing_mode
            )
            result.original_base = active.original_base
            continue

        if isinstance(context, str):
            url = resolve_iri(base_url, context)
            if url in remote_contexts:
                # reference parity: cyclic inclusion reports the 1.1 code
                # "context overflow" (the 1.0-era "recursive context
                # inclusion" code is gone from the modern processor)
                raise JsonLdError(f"cyclic context: {url}", "context overflow")
            if len(remote_contexts) >= MAX_CONTEXT_URLS:
                raise JsonLdError("too many remote contexts", "context overflow")
            remote_contexts.append(url)
            loaded = loader.load(url)
            doc = loaded["document"]
            if not isinstance(doc, dict) or "@context" not in doc:
                raise JsonLdError(
                    f"remote context missing @context: {url}",
                    "invalid remote context",
                )
            if mode_dropped:
                result = result.clone()
                result.processing_mode = "json-ld-1.1"
                mode_dropped = False
            result = process_context(
                result,
                doc["@context"],
                loaded.get("documentUrl", url),
                loader=loader,
                remote_contexts=remote_contexts,
                validate_scoped=validate_scoped,
                # only a FIRST-element remote chain may carry the propagate
                # override (reference resolver flattening semantics)
                _allow_propagate_override=_allow_propagate_override and idx == 0,
            )
            continue

        if not isinstance(context, dict):
            raise JsonLdError("@context must be object/string/null", "invalid local context")

        if mode_dropped:
            # the reference's per-context restoration falls back to the
            # default 1.1 (see QUIRK PARITY note above); @version's conflict
            # check therefore also no-ops after the drop
            result.processing_mode = "json-ld-1.1"
            mode_dropped = False

        # QUIRK PARITY: the reference clones the active context before
        # processing EVERY dict context (jsonld.py:3301), and its
        # _clone_active_context copies only mappings/@base/previousContext/
        # @language/@vocab (jsonld.py:6230-6247) — the default @direction is
        # silently DROPPED each time (while @language survives). A context
        # array [{"@direction": "ltr"}, {...}] therefore ends with no
        # default direction.
        result.default_direction = None

        # @version — handled BEFORE the @import merge (reference order,
        # jsonld.py:3306-3327); an @version arriving ONLY via @import is not
        # marked handled and falls into the term loop, where the keyword
        # check raises 'keyword redefinition'
        version_handled = "@version" in context
        if version_handled:
            if context["@version"] != 1.1:
                raise JsonLdError(
                    f"unsupported @version: {context['@version']}", "invalid @version value"
                )
            if result.processing_mode == "json-ld-1.0":
                raise JsonLdError("@version in 1.0 mode", "processing mode conflict")

        # @import — the reference resolves the value through its context
        # RESOLVER (jsonld.py:3352-3364 → context_resolver.resolve), which
        # flattens remote string CHAINS (an imported document whose @context
        # is itself a URL is followed, against that document's URL) and
        # errors with 'invalid remote context' only when the flattened
        # resolution is not exactly one context (soak wave N+24 find)
        if "@import" in context:
            if result.processing_mode == "json-ld-1.0":
                raise JsonLdError("@import in 1.0 mode", "invalid context entry")
            imp = context["@import"]
            if not isinstance(imp, str):
                raise JsonLdError("@import must be a string", "invalid @import value")
            leaves = _resolve_import_targets(loader, imp, base_url, set())
            if len(leaves) != 1:
                raise JsonLdError(
                    "@import must reference a single context", "invalid remote context"
                )
            imported = leaves[0]
            if not isinstance(imported, dict):
                # a null leaf crashes the reference with a bare TypeError
                # (`'@import' in False`, jsonld.py:3375) — coded here
                raise JsonLdError("@import must reference a context object", "invalid remote context")
            if "@import" in imported:
                raise JsonLdError("imported context has @import", "invalid context entry")
            context = {**imported, **context}

        # NOTE: the reference applies @base from REMOTE contexts too (no
        # remote gate in its _process_context, unlike the W3C algorithm)
        if "@base" in context:
            value = context["@base"]
            if value is None:
                result.base = None
                result.base_nulled = True
            elif isinstance(value, str):
                result.base_nulled = False
                if is_absolute_iri(value):
                    result.base = value
                elif result.base is not None:
                    result.base = resolve_iri(result.base, value)
                else:
                    # a relative @base against a null base is KEPT RAW
                    # (reference jsonld.py:3405-3407 — _is_relative_iri is
                    # just a string check)
                    result.base = value
            else:
                raise JsonLdError("@base must be string or null", "invalid base IRI")

        if "@vocab" in context:
            value = context["@vocab"]
            if value is None:
                result.vocab = None
            elif isinstance(value, str):
                if (
                    result.processing_mode == "json-ld-1.0"
                    and not is_absolute_iri(value)
                ):
                    # only 1.0 requires an absolute @vocab (reference
                    # jsonld.py:3436-3446); 1.1 resolves relative values
                    raise JsonLdError(
                        "@vocab must be an absolute IRI in 1.0",
                        "invalid vocab mapping",
                    )
                # a relative @vocab resolves document-relatively: context
                # @base if set, else the API base, else DEFAULT_BASE_IRI
                # (fresh-process reference behavior; its in-process context
                # cache can replay a context resolved under a DIFFERENT base
                # option, but that is cache poisoning, not semantics)
                expanded = expand_iri(
                    result, value, vocab=True, document_relative=True
                )
                result.vocab = expanded
            else:
                raise JsonLdError("@vocab must be string or null", "invalid vocab mapping")

        if "@language" in context:
            value = context["@language"]
            if value is None:
                result.default_language = None
            elif isinstance(value, str):
                result.default_language = value.lower()
            else:
                raise JsonLdError("@language must be string or null", "invalid default language")

        if "@direction" in context:
            if result.processing_mode == "json-ld-1.0":
                raise JsonLdError("@direction in 1.0 mode", "invalid context entry")
            value = context["@direction"]
            if value is None:
                result.default_direction = None
            elif value in ("ltr", "rtl"):
                result.default_direction = value
            else:
                raise JsonLdError("@direction must be ltr/rtl/null", "invalid base direction")

        if "@propagate" in context:
            if result.processing_mode == "json-ld-1.0":
                raise JsonLdError("@propagate in 1.0 mode", "invalid context entry")
            if not isinstance(context["@propagate"], bool):
                raise JsonLdError("@propagate must be boolean", "invalid @propagate value")

        protected = context.get("@protected", False)
        if protected and result.processing_mode == "json-ld-1.0":
            raise JsonLdError("@protected in 1.0 mode", "invalid context entry")

        defined: dict = {}
        skip = {
            "@base", "@vocab", "@language", "@direction", "@propagate",
            "@import", "@protected",
        }
        if version_handled:
            skip.add("@version")
        for term in context:
            if term in skip:
                continue
            create_term_definition(
                result,
                context,
                term,
                defined,
                base_url=base_url,
                protected=protected,
                override_protected=override_protected,
                remote_contexts=remote_contexts,
                validate_scoped=validate_scoped,
                loader=loader,
            )
            # scoped-context validation runs AFTER the definition completes
            # (reference jsonld.py:3535-3561), guarded against string-URL
            # cycles; the processed result is discarded
            v = context[term]
            if isinstance(v, dict) and "@context" in v:
                key_ctx = v["@context"]
                process = True
                if isinstance(key_ctx, str):
                    url = resolve_iri(base_url, key_ctx)
                    if url in cycles:
                        process = False
                    else:
                        cycles.add(url)
                if process:
                    try:
                        process_context(
                            result, key_ctx, base_url,
                            loader=loader,
                            override_protected=True,
                            cycles=cycles,
                        )
                    except JsonLdError as e:
                        raise JsonLdError(
                            f"invalid scoped context for {term}: {e.message}",
                            "invalid scoped context",
                        )
    return result


_CONTAINER_KEYWORDS = {"@list", "@set", "@index", "@id", "@type", "@language", "@graph"}


def create_term_definition(
    active: Context,
    local_ctx: dict,
    term: str,
    defined: dict,
    *,
    base_url: str | None = None,
    protected: bool = False,
    override_protected: bool = False,
    remote_contexts: list | None = None,
    validate_scoped: bool = True,
    loader: DocumentLoader | None = None,
) -> None:
    """Create Term Definition (JSON-LD 1.1 API §4.2.2)."""
    loader = loader or _EMPTY_LOADER
    if term in defined:
        if defined[term]:
            return
        raise JsonLdError(f"cyclic IRI mapping: {term}", "cyclic IRI mapping")
    if term == "":
        raise JsonLdError("empty term", "invalid term definition")
    defined[term] = False
    value = local_ctx[term]
    mode = active.processing_mode

    if term == "@type" and mode != "json-ld-1.0":
        if not isinstance(value, dict) or not value or not set(value) <= {
            "@container", "@id", "@protected"
        } or value.get("@container", "@set") != "@set":
            raise JsonLdError("invalid @type redefinition", "keyword redefinition")
    elif is_keyword(term):
        raise JsonLdError(f"cannot redefine keyword {term}", "keyword redefinition")
    elif is_keyword_like(term):
        return  # warn + ignore per spec

    previous = active.terms.pop(term, None)

    simple_term = False
    if value is None or isinstance(value, str):
        value = {"@id": value}
        simple_term = True
    elif not isinstance(value, dict):
        raise JsonLdError(f"invalid term value for {term}", "invalid term definition")

    # a term definition may only contain expected keywords; the 1.1-only
    # keys are invalid in 1.0 mode (reference jsonld.py:5608-5620)
    valid_keys = {"@container", "@id", "@language", "@reverse", "@type"}
    if mode != "json-ld-1.0":
        valid_keys |= {
            "@context", "@direction", "@index", "@nest", "@prefix", "@protected",
        }
    for kw in value:
        if kw not in valid_keys:
            raise JsonLdError(
                f"term definition must not contain {kw}", "invalid term definition"
            )

    definition = TermDef(protected=protected)
    if "@protected" in value:
        # truthiness only — the reference performs no type validation here
        # (jsonld.py:5782-5784)
        definition.protected = bool(value["@protected"])

    if "@reverse" in value:
        if "@id" in value or "@nest" in value:
            raise JsonLdError("@reverse with @id/@nest", "invalid reverse property")
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError("@reverse must be string", "invalid IRI mapping")
        if is_keyword_like(rev):
            # warn + ignore, restoring any previous definition
            # (reference jsonld.py:5652-5664)
            if previous is not None:
                active.terms[term] = previous
            return
        iri = expand_iri(active, rev, vocab=True, local_ctx=local_ctx, defined=defined)
        if not isinstance(iri, str) or not is_absolute_iri(iri):
            raise JsonLdError("@reverse must expand to IRI", "invalid IRI mapping")
        definition.iri = iri
        definition.reverse = True
        # @type/@container/... processing continues below — the reference
        # does not return here (jsonld.py:5681-5682)
    elif "@id" in value and value["@id"] != term:
        vid = value["@id"]
        if vid is None:
            definition.iri = None
        else:
            if not isinstance(vid, str):
                raise JsonLdError("@id mapping must be string", "invalid IRI mapping")
            if not is_keyword(vid) and is_keyword_like(vid):
                # warn + ignore, restoring any previous definition
                # (reference jsonld.py:5694-5705)
                if previous is not None:
                    active.terms[term] = previous
                return
            iri = expand_iri(active, vid, vocab=True, local_ctx=local_ctx, defined=defined)
            if not (is_keyword(iri) or (isinstance(iri, str) and (
                is_absolute_iri(iri) or iri.startswith("_:")
            ))):
                raise JsonLdError(f"invalid IRI mapping for {term}", "invalid IRI mapping")
            definition.iri = iri
            # "term in form of an IRI must expand to definition" — the
            # reference gates this on re.match(r'.*((:[^:])|/)', term)
            # (jsonld.py:5722): a colon followed by a NON-colon anywhere
            # (including position 0, so ":suf" counts) or any slash; "::"
            # alone does NOT count, and the dot-star cannot cross a newline
            if re.match(r".*((:[^:])|/)", term):
                defined[term] = True
                if expand_iri(active, term, vocab=True, local_ctx=local_ctx, defined=defined) != iri:
                    raise JsonLdError(
                        f"term {term} expands to different IRI", "invalid IRI mapping"
                    )
            if (
                simple_term
                and isinstance(iri, str)
                # reference `_term_has_colon` is find(':') > 0 — a leading
                # colon does not count (jsonld.py:5623-5624, 5742-5749)
                and term.find(":") <= 0
                and (iri.startswith("_:") or iri[-1:] in "/?#[]@:")
            ):
                definition.prefix = True
    elif term.find(":") > 0:
        # no-@id ladder (reference jsonld.py:5751-5766). The gate is
        # find(':') > 0 — a LEADING colon ("::", ":a:b") does not count and
        # falls through to the @vocab branch. When the prefix is undefined
        # the term itself becomes the IRI mapping UNCONDITIONALLY (no
        # absolute-IRI validation — "x\n:y" maps to itself); and the
        # reference has no term-with-slash branch at all.
        prefix, suffix = term.split(":", 1)
        if prefix in local_ctx:
            create_term_definition(
                active, local_ctx, prefix, defined,
                base_url=base_url, protected=protected,
                override_protected=override_protected, loader=loader,
            )
        if prefix in active.terms and active.terms[prefix].iri:
            definition.iri = active.terms[prefix].iri + suffix
        else:
            definition.iri = term
    elif term == "@type":
        definition.iri = "@type"
    elif active.vocab is not None:
        definition.iri = active.vocab + term
    else:
        raise JsonLdError(
            f"no @vocab to expand term {term}", "invalid IRI mapping"
        )

    # @type mapping is validated AFTER the IRI mapping resolves — a term
    # with neither @id nor @vocab raises 'invalid IRI mapping' first
    # (reference order: jsonld.py:5626-5779 then 5786-5827)
    if "@type" in value:
        t = value["@type"]
        if not isinstance(t, str):
            raise JsonLdError("@type mapping must be string", "invalid type mapping")
        expanded_type = expand_iri(active, t, vocab=True, local_ctx=local_ctx, defined=defined)
        if expanded_type in ("@json", "@none") and mode == "json-ld-1.0":
            raise JsonLdError(f"{expanded_type} in 1.0 mode", "invalid type mapping")
        if expanded_type not in ("@id", "@vocab", "@json", "@none") and not (
            isinstance(expanded_type, str) and is_absolute_iri(expanded_type)
        ):
            raise JsonLdError(f"invalid type mapping: {t}", "invalid type mapping")
        if isinstance(expanded_type, str) and expanded_type.startswith("_:"):
            # an @type mapping must be an IRI, not a blank node
            # (reference jsonld.py:5818-5826)
            raise JsonLdError(f"blank node type mapping: {t}", "invalid type mapping")
        definition.type = expanded_type

    if "@container" in value:
        # container validation parity (reference jsonld.py:5829-5911): the
        # @type-container type check raises BEFORE the overall validity
        # raise; @graph combos allow {@graph,@id,@index,@set} freely;
        # duplicates are tolerated (deduped by the frozenset)
        raw = value["@container"]
        container = raw if isinstance(raw, list) else [raw]
        valid_containers = {"@list", "@set", "@index", "@language"}
        is_valid = True
        has_set = "@set" in container
        if mode != "json-ld-1.0":
            valid_containers |= {"@graph", "@id", "@type"}
            if "@list" in container:
                if len(container) != 1:
                    raise JsonLdError(
                        "@container @list must have no other values",
                        "invalid container mapping",
                    )
            elif "@graph" in container:
                if any(
                    kw not in ("@graph", "@id", "@index", "@set")
                    for kw in container
                ):
                    raise JsonLdError(
                        "invalid @graph container combo", "invalid container mapping"
                    )
            else:
                is_valid = is_valid and len(container) <= (2 if has_set else 1)
            if "@type" in container:
                if definition.type is None:
                    definition.type = "@id"
                if definition.type not in ("@id", "@vocab"):
                    raise JsonLdError(
                        "@type container needs @id/@vocab type", "invalid type mapping"
                    )
        else:
            is_valid = is_valid and isinstance(raw, str)
        is_valid = is_valid and all(
            isinstance(kw, str) and kw in valid_containers for kw in container
        )
        is_valid = is_valid and not (has_set and "@list" in container)
        if not is_valid:
            raise JsonLdError(
                f"invalid @container: {raw!r}", "invalid container mapping"
            )
        if definition.reverse and any(
            kw not in ("@index", "@set") for kw in container
        ):
            raise JsonLdError(
                "reverse property container must be @set/@index",
                "invalid reverse property",
            )
        definition.container = tuple(container)
        definition.has_container = True

    if "@index" in value:
        if "@container" not in value or "@index" not in definition.container:
            raise JsonLdError("@index needs @index container", "invalid term definition")
        idx = value["@index"]
        # string not starting with '@' (reference jsonld.py:5922-5929)
        if not isinstance(idx, str) or idx.startswith("@"):
            raise JsonLdError("invalid @index value", "invalid term definition")
        definition.index = idx

    if "@context" in value:
        # store only; validation happens in process_context's term loop
        # AFTER the definition completes (reference jsonld.py:3535-3561) —
        # so e.g. an invalid @nest in the same definition raises first
        definition.context = value["@context"]
        definition.context_base = base_url

    if "@language" in value and "@type" not in value:
        lang = value["@language"]
        if lang is not None and not isinstance(lang, str):
            raise JsonLdError("@language must be string/null", "invalid language mapping")
        definition.language = lang.lower() if isinstance(lang, str) else None

    if "@prefix" in value:
        # reference order: compact-IRI-term check, then keyword-@id check
        # (unconditional), then boolean validation (jsonld.py:5955-5975);
        # the gate is re.match(r'.*(:|/)', term) — dot-star cannot cross a
        # newline, so a colon/slash after '\n' does NOT disqualify the term
        if re.match(r".*(:|/)", term):
            raise JsonLdError("@prefix not allowed here", "invalid term definition")
        if is_keyword(definition.iri):
            raise JsonLdError("keyword cannot be a prefix", "invalid term definition")
        if not isinstance(value["@prefix"], bool):
            raise JsonLdError("@prefix must be boolean", "invalid @prefix value")
        definition.prefix = value["@prefix"]

    if "@direction" in value:
        # no '@type not in value' gate, unlike @language (jsonld.py:5976-5986)
        d = value["@direction"]
        if d and d not in ("ltr", "rtl"):
            raise JsonLdError("@direction must be ltr/rtl/null", "invalid base direction")
        definition.direction = d

    if "@nest" in value:
        nest = value["@nest"]
        if not isinstance(nest, str) or (nest != "@nest" and nest.startswith("@")):
            raise JsonLdError("invalid @nest value", "invalid @nest value")
        definition.nest = nest

    # @context and @preserve cannot be aliased (reference jsonld.py:6003-6011)
    if definition.iri in ("@context", "@preserve"):
        raise JsonLdError("cannot alias @context/@preserve", "invalid keyword alias")

    if previous is not None and previous.protected and not override_protected:
        if not definition.same_except_protected(previous):
            raise JsonLdError(
                f"protected term redefinition: {term}", "protected term redefinition"
            )
        definition = previous

    active.terms[term] = definition
    defined[term] = True


def expand_iri(
    active: Context,
    value,
    *,
    document_relative: bool = False,
    vocab: bool = False,
    local_ctx: dict | None = None,
    defined: dict | None = None,
):
    """IRI Expansion (JSON-LD 1.1 API §5.2.2)."""
    if value is None or is_keyword(value):
        return value
    if not isinstance(value, str):
        return value
    if is_keyword_like(value):
        return None  # warn + ignore
    if local_ctx is not None and value in local_ctx and defined is not None and defined.get(value) is not True:
        create_term_definition(active, local_ctx, value, defined)
    defn = active.terms.get(value)
    if defn is not None and is_keyword(defn.iri):
        return defn.iri
    if vocab and defn is not None:
        return defn.iri
    if ":" in value[1:]:
        prefix, suffix = value.split(":", 1)
        if prefix == "_" or suffix.startswith("//"):
            return value
        if local_ctx is not None and prefix in local_ctx and defined is not None and defined.get(prefix) is not True:
            create_term_definition(active, local_ctx, prefix, defined)
        pdef = active.terms.get(prefix)
        if pdef is not None and pdef.iri and pdef.prefix:
            return pdef.iri + suffix
        if is_absolute_iri(value):
            return value
    if vocab and active.vocab is not None:
        return active.vocab + value
    if document_relative:
        if active.base_disabled:
            # explicit API base=None: the reference ladder keeps values
            # relative even when the context carries an absolute @base
            return value
        if active.base is not None:
            base = active.base
            if not is_absolute_iri(base):
                # a RAW relative @base (stored when the active base was
                # null, reference jsonld.py:3400-3407) is lazily resolved
                # against the API base at EVERY document-relative
                # resolution (jsonld.py:6105-6110: resolved_base =
                # resolve(ctx_base, base)); with an absent/'' API base the
                # reference ValueErrors — this engine anchors on its
                # synthetic document base instead (graceful divergence,
                # same class as the other bare-resolve crashes)
                anchor = active.original_base or DEFAULT_BASE_IRI
                base = resolve_iri(anchor, base)
            return resolve_iri(base, value)
        if not active.base_nulled:
            # no @base anywhere and no API base: the reference falls back to
            # its synthetic document base (jsonld.py:6112-6115, the
            # `base == ''` branch); an explicit {"@base": null} instead
            # KEEPS the value relative (jsonld.py:6102-6104)
            return resolve_iri(DEFAULT_BASE_IRI, value)
    return value
