"""Content-derived document identifiers.

Replicates gleanerio/gleaner's identifier generation byte-for-byte:

* ``GetSHA`` — sha1 hex of a string (``internal/common/calcShaNorm.go:14-19``)
* ``GetNormSHA`` — sha1 of the URDNA2015-normalized n-quads, with the
  empty-normalization *double-hex* quirk: when normalization yields "",
  the reference returns ``fmt.Sprintf("%x", GetSHA(jsonld))`` — the hex
  encoding of the hex string, 80 chars (``calcShaNorm.go:46-52``; blessed
  by goldens at ``internal/common/identifier_test.go:510,522``)
* the JSONPath identifier cascade (``internal/common/identifier.go``),
  including Go ``fmt.Sprint([]string)`` formatting — ``"[v1 v2]"`` —
  and lexicographic sort of multi-matches before hashing
  (``identifier.go:62-70,148``; golden ``identifier_test.go:161``)
* ``MoveToFront`` per-source path override semantics, including the
  reference's drop-last-when-absent behaviour
  (``internal/config/utils.go:14-33``)

Plus the north-rule addition: ``graph_urn`` uses SHA-256 of the
normalized document (``urn:{bucket}:{source}:{sha}`` shape from
``internal/summoner/acquire/prov.go:96``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from .jsonld import JsonLdError, normalize

# IdentifierType constants (internal/config/sources.go:16-21)
IDENTIFIER_SHA = "identifiersha"
JSON_SHA = "jsonsha"
NORMALIZED_JSON_SHA = "normalizedjsonsha"
IDENTIFIER_STRING = "identifierstring"
SOURCE_URL = "sourceurl"

# default cascade (internal/common/identifier.go:32)
JSON_PATHS_DEFAULT = [
    "$['@graph'][?(@['@type']=='schema:Dataset')]['@id']",
    "$.identifier[?(@.propertyID=='https://registry.identifiers.org/registry/doi')].value",
    "$.identifier.value",
    "$.identifier",
    "$['@id']",
    "$.url",
]

_PATH_CACHE: dict[str, object] = {}


def _compile_path(path: str):
    expr = _PATH_CACHE.get(path)
    if expr is None:
        from jsonpath_ng.ext import parse

        expr = parse(path)
        _PATH_CACHE[path] = expr
    return expr


@dataclass
class Identifier:
    unique_id: str = ""
    identifier_type: str = ""
    matched_path: str = ""
    matched_string: str = ""
    json_sha: str = ""
    error: str | None = None


def get_sha(s: str) -> str:
    """sha1 hex — ``GetSHA`` (calcShaNorm.go:14-19)."""
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def get_sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def get_norm_sha(jsonld: str) -> tuple[str, bool]:
    """``GetNormSHA`` parity: returns (sha, norm_was_empty).

    Empty normalization → hex-of-hex 80-char quirk (calcShaNorm.go:46-52).
    Raises JsonLdError/ValueError on unparseable JSON.
    """
    doc = json.loads(jsonld)
    normalized = normalize(doc)
    if normalized == "":
        return get_sha(jsonld).encode("utf-8").hex(), True
    return get_sha(normalized), False


def go_sprint_list(values: list[str]) -> str:
    """Go ``fmt.Sprint([]string{...})`` → ``"[a b]"`` (identifier.go:148)."""
    return "[" + " ".join(values) + "]"


def move_to_front(needle: str, haystack: list[str]) -> list[str]:
    """Exact ``config.MoveToFront`` semantics incl. drop-last-if-absent
    (internal/config/utils.go:14-33)."""
    if haystack and haystack[0] == needle:
        return haystack
    out = list(haystack)
    prev = needle
    for i, elem in enumerate(out):
        if i == 0:
            out[0] = needle
            prev = elem
        elif elem == needle:
            out[i] = prev
            return out
        else:
            out[i] = prev
            prev = elem
    return out


def get_identifier_by_path(json_path: str, jsonld: str | dict) -> list[str]:
    """``GetIdentifierByPath``: match, keep strings, stable lexicographic
    sort (identifier.go:51-71).

    Dict inputs are deep-copied: jsonpath_ng's ``find`` MUTATES the
    searched document on some filter paths (observed: an ``identifier``
    object flattened to its value list), which silently corrupts every
    later path in the cascade.  String inputs re-parse per call and were
    never exposed."""
    if isinstance(jsonld, (str, bytes)):
        doc = json.loads(jsonld)
    else:
        import copy

        doc = copy.deepcopy(jsonld)
    expr = _compile_path(json_path)
    matches = [m.value for m in expr.find(doc)]
    strings = [v for v in matches if isinstance(v, str)]
    return sorted(strings)


def get_identifier_by_paths(
    json_paths: list[str], jsonld: str | dict
) -> tuple[list[str], str] | None:
    """``GetIdentiferByPaths``: first path whose matches are non-empty
    (identifier.go:92-109)."""
    for path in json_paths:
        try:
            values = get_identifier_by_path(path, jsonld)
        except Exception:
            continue
        if values:
            return values, path
    return None


def _normalized_identifier(jsonld: str) -> Identifier:
    """``GenerateNormalizedSha`` (identifier.go:161-188).

    Note the reference's inverted-looking typing: a successful
    normalization is labelled ``jsonsha``; the empty-normalization
    fallback is labelled ``normalizedjsonsha``.
    """
    try:
        sha, was_empty = get_norm_sha(jsonld)
    except Exception as e:  # unparseable JSON
        return Identifier(error=f"json parse: {e}")
    if was_empty:
        return Identifier(unique_id=sha, identifier_type=NORMALIZED_JSON_SHA,
                          json_sha=sha)
    return Identifier(unique_id=sha, identifier_type=JSON_SHA, json_sha=sha)


def _file_sha_identifier(jsonld: str) -> Identifier:
    sha = get_sha(jsonld)
    return Identifier(unique_id=sha, identifier_type=JSON_SHA, json_sha=sha)


def _identifier_sha(jsonld: str, identifier_paths: str = "") -> Identifier:
    """``GenerateIdentifierSha`` (identifier.go:124-160)."""
    paths = list(JSON_PATHS_DEFAULT)
    if identifier_paths:
        for p in identifier_paths.split(","):
            paths = move_to_front(p, paths)
    base = _normalized_identifier(jsonld)
    found = get_identifier_by_paths(paths, jsonld)
    if found is not None:
        values, matched_path = found
        matched = go_sprint_list(values)
        return Identifier(
            unique_id=get_sha(matched),
            identifier_type=IDENTIFIER_SHA,
            matched_path=matched_path,
            matched_string=matched,
            json_sha=base.json_sha,
        )
    return base


def generate_identifier(
    jsonld: str,
    identifier_type: str = JSON_SHA,
    identifier_paths: str = "",
) -> Identifier:
    """``GenerateIdentifier`` dispatch (identifier.go:34-48)."""
    if identifier_type == IDENTIFIER_STRING:
        ident = _identifier_sha(jsonld, identifier_paths)
        if ident.matched_string:
            ident.unique_id = ident.matched_string
            ident.identifier_type = IDENTIFIER_STRING
        return ident
    if identifier_type == IDENTIFIER_SHA:
        return _identifier_sha(jsonld, identifier_paths)
    if identifier_type == NORMALIZED_JSON_SHA:
        return _normalized_identifier(jsonld)
    return _file_sha_identifier(jsonld)


def generate_identifier_from(
    raw: str,
    normalized: str,
    identifier_type: str = JSON_SHA,
    identifier_paths: str = "",
) -> Identifier:
    """``generate_identifier`` with a PRE-computed URDNA2015
    normalization — the fused single-expansion path (core/process.py).
    The path cascade re-parses ``raw`` per path exactly like the
    string-input API (µs; also sidesteps jsonpath_ng's input mutation —
    see get_identifier_by_path).  Byte-identical results to
    ``generate_identifier``; unit-tested against it."""
    if normalized == "":
        base = Identifier(
            unique_id=get_sha(raw).encode("utf-8").hex(),
            identifier_type=NORMALIZED_JSON_SHA,
        )
        base.json_sha = base.unique_id
    else:
        sha = get_sha(normalized)
        base = Identifier(unique_id=sha, identifier_type=JSON_SHA,
                          json_sha=sha)

    if identifier_type == NORMALIZED_JSON_SHA:
        return base
    if identifier_type in (IDENTIFIER_SHA, IDENTIFIER_STRING):
        paths = list(JSON_PATHS_DEFAULT)
        if identifier_paths:
            for p in identifier_paths.split(","):
                paths = move_to_front(p, paths)
        found = get_identifier_by_paths(paths, raw)
        if found is not None:
            values, matched_path = found
            matched = go_sprint_list(values)
            ident = Identifier(
                unique_id=get_sha(matched),
                identifier_type=IDENTIFIER_SHA,
                matched_path=matched_path,
                matched_string=matched,
                json_sha=base.json_sha,
            )
            if identifier_type == IDENTIFIER_STRING and ident.matched_string:
                ident.unique_id = ident.matched_string
                ident.identifier_type = IDENTIFIER_STRING
            return ident
        return base
    # jsonsha / default: sha of the literal string
    sha = get_sha(raw)
    return Identifier(unique_id=sha, identifier_type=JSON_SHA, json_sha=sha)


def graph_urn(bucket: str, source: str, sha: str) -> str:
    """``urn:{bucket}:{source}:{sha}`` (acquire/prov.go:96)."""
    return f"urn:{bucket}:{source}:{sha}"


def norm_sha256(jsonld: str) -> str:
    """North-rule graph id: SHA-256 of the URDNA2015-normalized document
    (falls back to sha256 of the raw string when normalization is empty)."""
    try:
        doc = json.loads(jsonld)
        normalized = normalize(doc)
    except Exception:
        return get_sha256(jsonld)
    return get_sha256(normalized) if normalized else get_sha256(jsonld)
