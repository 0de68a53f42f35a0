"""JSON-LD context fix-ups.

Replicates gleanerio/gleaner ``internal/summoner/acquire/jsonutils.go``:

* ``fixContextString`` (87-96): string ``@context`` → ``{"@vocab": s}``
* ``fixContextArray`` (133-143): array ``@context`` → the standardized
  16-prefix context (165-214)
* ``fixContextUrl`` (101-128): force ``@vocab`` to exist; normalize
  schema.org context values — strip ``www.`` and replace any schema.org
  string shorter than 20 chars with ``https://schema.org/`` (the length
  heuristic at 116-118)
* ``fixId`` (149-161): relative top-level ``@id`` with no ``@base`` →
  ``file://`` prefix
* strict gate (``ProcessJson``, 236-269; per-source FixContextOption
  enum at ``internal/config/sources.go:24-54``)

These are pure ``str → str`` JSON rewrites so they unit-test against the
reference approval files and batch cleanly inside a pandas UDF.
"""

from __future__ import annotations

import json
from urllib.parse import urlparse

HTTP_CONTEXT = "http://schema.org/"
HTTPS_CONTEXT = "https://schema.org/"

# jsonutils.go:165-181
STANDARD_HTTPS_CONTEXT = {
    "@vocab": "https://schema.org/",
    "adms": "https://www.w3.org/ns/adms#",
    "dcat": "https://www.w3.org/ns/dcat#",
    "dct": "https://purl.org/dc/terms/",
    "foaf": "https://xmlns.com/foaf/0.1/",
    "gsp": "https://www.opengis.net/ont/geosparql#",
    "locn": "https://www.w3.org/ns/locn#",
    "owl": "https://www.w3.org/2002/07/owl#",
    "rdf": "https://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "https://www.w3.org/2000/01/rdf-schema#",
    "schema": "https://schema.org/",
    "skos": "https://www.w3.org/2004/02/skos/core#",
    "spdx": "https://spdx.org/rdf/terms#",
    "time": "https://www.w3.org/2006/time",
    "vcard": "https://www.w3.org/2006/vcard/ns#",
    "xsd": "https://www.w3.org/2001/XMLSchema#",
}

# jsonutils.go:183-200
STANDARD_HTTP_CONTEXT = {
    k: v.replace("https://", "http://") for k, v in STANDARD_HTTPS_CONTEXT.items()
}

# ContextOption names (config/sources.go:36-54)
STRICT = "strict"
HTTPS = "https"
HTTP = "http"
STANDARDIZED_HTTPS = "standardizedHttps"
STANDARDIZED_HTTP = "standardizedHttp"


def _loads(jsonld: str):
    return json.loads(jsonld)


def _dumps(doc) -> str:
    # sjson edits preserve the original layout; we re-serialize compactly.
    # Downstream (normalization/milling) re-parses, so byte layout of the
    # *fixed* doc is not part of the parity contract — the extracted raw
    # text is (that invariant lives in core.extract).
    return json.dumps(doc, ensure_ascii=False, separators=(",", ":"))


def fix_context_string(doc: dict) -> dict:
    """string @context → {"@vocab": ctx} (jsonutils.go:87-96)."""
    ctx = doc.get("@context")
    if isinstance(ctx, str):
        doc["@context"] = {"@vocab": ctx}
    return doc


def fix_context_array(doc: dict, option: str = STANDARDIZED_HTTPS) -> dict:
    """array @context → standardized context (jsonutils.go:133-143)."""
    ctx = doc.get("@context")
    if isinstance(ctx, list):
        doc["@context"] = dict(
            STANDARD_HTTP_CONTEXT if option == STANDARDIZED_HTTP
            else STANDARD_HTTPS_CONTEXT
        )
    return doc


def fix_context_url(doc: dict, ctx_schema_org: str = HTTPS_CONTEXT) -> dict:
    """Ensure @vocab exists; standardize schema.org context strings
    (jsonutils.go:101-128).  Operates on the @context *object* — the
    reference's gjson ``.Map()`` yields nothing for non-object contexts,
    but the @vocab insertion still applies (sjson creates the object)."""
    ctx = doc.get("@context")
    if not isinstance(ctx, dict):
        if isinstance(ctx, (str, list)):
            # gjson.Map() of a non-object is empty; sjson then sets
            # @context.@vocab, turning the context into an object.
            doc["@context"] = {"@vocab": HTTPS_CONTEXT}
            return doc
        ctx = {}
        doc["@context"] = ctx
    if "@vocab" not in ctx:
        ctx["@vocab"] = HTTPS_CONTEXT
    for ns, c in list(ctx.items()):
        if not isinstance(c, str):
            continue
        context = c
        if "schema.org" in context:
            if "www." in context:
                # reference quirk (jsonutils.go:110-114): the www branch
                # prepends ctx to the slice FROM "schema.org", yielding
                # e.g. "https://schema.org/schema.org/" — replicated
                # verbatim for parity (no reference test covers it, the
                # code is the spec)
                i = context.index("schema.org")
                context = ctx_schema_org + context[i:]
            if len(context) < 20:  # shorter than "https://schema.org/"
                context = ctx_schema_org
        ctx[ns] = context
    return doc


def fix_id(doc: dict) -> dict:
    """Relative top-level @id without @base → file:// (jsonutils.go:149-161)."""
    jid = doc.get("@id")
    if not isinstance(jid, str):
        return doc
    ctx = doc.get("@context")
    base = ctx.get("@base", "") if isinstance(ctx, dict) else ""
    scheme = urlparse(jid).scheme
    if base == "" and scheme == "":
        doc["@id"] = "file://" + jid
    return doc


def fix_all(jsonld: str, fix_option: str = HTTPS) -> str:
    """``ProcessJson``'s fix sequence (jsonutils.go:247-269): string-fix,
    array-fix, url-fix, id-fix — bypassed entirely under strict."""
    if fix_option == STRICT:
        return jsonld
    doc = _loads(jsonld)
    if not isinstance(doc, dict):
        return jsonld
    ctx_schema_org = (
        HTTP_CONTEXT if fix_option in (HTTP, STANDARDIZED_HTTP) else HTTPS_CONTEXT
    )
    doc = fix_context_string(doc)
    doc = fix_context_array(
        doc,
        STANDARDIZED_HTTP if fix_option in (HTTP, STANDARDIZED_HTTP)
        else STANDARDIZED_HTTPS,
    )
    doc = fix_context_url(doc, ctx_schema_org)
    doc = fix_id(doc)
    return _dumps(doc)
