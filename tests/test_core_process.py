"""Fused per-document processing (core/process.py) must be
byte-identical to composing the individual core functions — same
identifiers, same sha256 graph ids, same skolemized quads — across every
document variant in the synthetic corpus (all context-fix cases,
identifier types, invalid docs, raw-JSON pages)."""

from __future__ import annotations

import pytest

from gleaner_spark.core import extract as ce
from gleaner_spark.core import ids as ci
from gleaner_spark.core import mill as cm
from gleaner_spark.core.contextfix import fix_all
from gleaner_spark.core.process import process_document
from gleaner_spark.sources.pages import page_row, sources_rows


def _cases(n=200):
    host_cfg = {r["domain"]: r for r in sources_rows() if r["active"]}
    for i in range(n):
        row = page_row(i)
        cfg = host_cfg.get(row["url"].split("/")[2], {})
        for b in ce.extract_jsonld_strings(row["html"].decode(), row["url"]):
            yield (
                b,
                cfg.get("fixcontextoption", "https"),
                cfg.get("identifiertype", "jsonsha"),
                cfg.get("identifierpath", ""),
            )


def test_fused_matches_composed_over_corpus():
    checked = 0
    for raw, fix_opt, id_type, id_path in _cases():
        p = process_document(raw, fix_opt, id_type, id_path)
        try:
            fixed = fix_all(raw, fix_opt)
            ident = ci.generate_identifier(fixed, id_type, id_path)
            ok = not ident.error
        except Exception:
            ok = False
        assert p.valid == ok, (raw[:80], p.error)
        if not ok:
            continue
        assert p.jsonld_fixed == fixed
        assert p.doc_sha1 == ident.unique_id
        assert p.id_type == ident.identifier_type
        assert (p.matched_path or "") == (ident.matched_path or "")
        assert p.json_sha == ident.json_sha
        assert p.norm_sha256 == ci.norm_sha256(fixed)
        old = [(q.subject, q.predicate, q.object)
               for q in cm.mill(fixed, ident.unique_id, "")]
        new = [(q.subject, q.predicate, q.object) for q in p.quads]
        assert old == new
        checked += 1
    assert checked > 150


def test_invalid_doc_returns_error():
    p = process_document('{"@context": "https://schema.org/", broken')
    assert not p.valid and p.error and p.quads == []
    assert p.raw_sha1


def test_identifier_string_type_passthrough():
    doc = ('{"@context": {"@vocab": "https://schema.org/"}, '
           '"@id": "https://x.org/1", "@type": "Dataset", "name": "d"}')
    p = process_document(doc, "https", "identifierstring", "")
    q = ci.generate_identifier(fix_all(doc, "https"), "identifierstring", "")
    assert p.doc_sha1 == q.unique_id and p.id_type == q.identifier_type


def test_budget_exceeded_falls_back_to_filesha():
    """A doc flooding URDNA2015's n-degree path with isomorphic bnodes
    must still process — filesha identifier, full quads (the reference's
    sitegraph shape, sitegraph.go:50)."""
    import json

    doc = json.dumps({
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/ds",
        "knows": [{"name": "same"} for _ in range(12)],
    })
    p = process_document(doc)
    assert p.valid
    fixed_sha = ci.get_sha(p.jsonld_fixed)
    assert p.doc_sha1 == fixed_sha
    assert p.id_type == ci.JSON_SHA
    assert p.norm_sha256 == ci.get_sha256(p.jsonld_fixed)
    # triples still milled in full: 12 knows + 12 names
    assert len(p.quads) == 24


def test_big_doc_skips_normalization():
    import json

    big = json.dumps({
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/big",
        "name": "Big",
        "description": "x" * (3 * 1024 * 1024),
    })
    import time

    t0 = time.time()
    p = process_document(big)
    assert time.time() - t0 < 10.0  # bounded: no URDNA2015 over 3 MB
    assert p.valid
    assert p.doc_sha1 == ci.get_sha(p.jsonld_fixed)
    assert p.id_type == ci.JSON_SHA
    assert any("description" in q.predicate for q in p.quads)

    assert p.norm_sha256 == ci.get_sha256(p.jsonld_fixed)  # raw, not norm

    # ...and the identical doc under the limit normalizes normally
    small = big.replace("x" * (3 * 1024 * 1024), "x")
    ps = process_document(small)
    assert ps.valid and ps.id_type == ci.JSON_SHA
    # graph id comes from the URDNA2015 normalization, not the raw bytes
    assert ps.norm_sha256 != ci.get_sha256(ps.jsonld_fixed)
