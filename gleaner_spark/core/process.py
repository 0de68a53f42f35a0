"""Fused per-document processing: fix-ups + validity + identifiers +
URDNA2015 graph id + milled quads in ONE parse / ONE expansion / ONE
canonicalization.

The reference runs these as separate passes (summon validates and
identifies, ``jsonutils.go``/``identifier.go``; mill re-parses and
re-expands every stored object, ``graphng.go:96-162``) because they are
separate processes over an object store.  In a single engine the
two-pass layout doubles the dominant Python cost — JSON-LD expansion +
URDNA2015 — so the pipeline's hot path uses this fused function; the
individual core functions remain the unit-testable per-piece contracts
and this module is tested byte-identical against composing them.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .contextfix import fix_all
from .ids import (
    JSON_SHA,
    Identifier,
    generate_identifier_from,
    get_sha,
    get_sha256,
)
from .jsonld import CanonicalizationBudgetError, to_rdf, urdna2015
from .mill import QuadRow, skolemize, term_to_nq_rows

# "Don't normalize big files" (reference sitegraph.go:50: sitegraph docs
# always take GetSHA(raw) and skip normalization entirely).  We bound by
# byte size instead of source type so a crawler hitting a multi-MB
# embedded JSON-LD gets the same protection; URDNA2015 is the dominant
# per-byte Python cost and its n-degree path is additionally budgeted
# inside urdna2015 itself (jsonld.MAX_NDEGREE_*).
MAX_NORMALIZE_BYTES = 2 * 1024 * 1024


@dataclass
class ProcessedDoc:
    jsonld_fixed: str
    valid: bool
    error: str | None = None
    doc_sha1: str | None = None
    id_type: str | None = None
    matched_path: str | None = None
    json_sha: str | None = None
    norm_sha256: str | None = None
    raw_sha1: str = ""
    quads: list[QuadRow] = field(default_factory=list)


def process_document(
    raw: str,
    fix_option: str = "https",
    identifier_type: str = "jsonsha",
    identifier_paths: str = "",
    max_normalize_bytes: int = MAX_NORMALIZE_BYTES,
) -> ProcessedDoc:
    """The full per-document contract (P2-P7, H1-H4, R1-R3) in one pass.

    Pipeline: fix context/ids → parse → to_rdf (one expansion) →
    urdna2015 (one canonicalization) → identifier cascade on the parsed
    doc + precomputed normalization → skolemized quad rows from the SAME
    expansion.  Invalid documents return valid=False with the error, raw
    sha only (isValid filter semantics, jsonutils.go:35-51).

    Oversized docs (``max_normalize_bytes``, 0 = unlimited) and docs
    whose canonicalization exceeds the n-degree budget skip
    normalization and take the filesha identifier — the reference's
    sitegraph shape (``sha := common.GetSHA(d) // Don't normalize big
    files``, sitegraph.go:50); triples are still milled in full.
    """
    raw_sha1 = get_sha(raw)
    try:
        fixed = fix_all(raw, fix_option or "https")
        doc = json.loads(fixed)
        quads = to_rdf(doc)
        normalized: str | None
        if max_normalize_bytes and len(fixed) > max_normalize_bytes:
            normalized = None
        else:
            try:
                normalized = urdna2015(quads)
            except CanonicalizationBudgetError:
                normalized = None
        if normalized is None:
            sha = get_sha(fixed)
            ident = Identifier(unique_id=sha, identifier_type=JSON_SHA,
                               json_sha=sha)
            n256 = get_sha256(fixed)
        else:
            ident = generate_identifier_from(
                fixed, normalized, identifier_type or "jsonsha",
                identifier_paths or "",
            )
            if ident.error:
                raise ValueError(ident.error)
            n256 = get_sha256(normalized) if normalized else get_sha256(fixed)
        rows = term_to_nq_rows(skolemize(quads, ident.unique_id))
        return ProcessedDoc(
            jsonld_fixed=fixed,
            valid=True,
            doc_sha1=ident.unique_id,
            id_type=ident.identifier_type,
            matched_path=ident.matched_path,
            json_sha=ident.json_sha,
            norm_sha256=n256,
            raw_sha1=raw_sha1,
            quads=rows,
        )
    except Exception as e:
        return ProcessedDoc(
            jsonld_fixed=raw,
            valid=False,
            error=f"{type(e).__name__}: {e}",
            raw_sha1=raw_sha1,
        )
