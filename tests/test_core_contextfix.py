"""Context fix-up parity tests.

Semantics from gleanerio/gleaner ``internal/summoner/acquire/jsonutils.go``
(string fix 87-96, array fix 133-143 + standard context 165-214, url fix
101-128 incl. the <20-chars heuristic, relative-@id fix 149-161, strict
gate 236-269) and the approval files under
``internal/summoner/acquire/testdata/``.
"""

import json

from gleaner_spark.core.contextfix import (
    HTTPS_CONTEXT,
    STANDARD_HTTPS_CONTEXT,
    STRICT,
    fix_all,
    fix_context_array,
    fix_context_string,
    fix_context_url,
    fix_id,
)


def test_string_context_becomes_vocab():
    doc = {"@context": "http://schema.org/", "@type": "Dataset"}
    out = fix_context_string(doc)
    assert out["@context"] == {"@vocab": "http://schema.org/"}


def test_object_context_unchanged_by_string_fix():
    doc = {"@context": {"@vocab": "https://schema.org/"}}
    assert fix_context_string(dict(doc)) == doc


def test_array_context_standardized():
    doc = {"@context": ["https://schema.org/", {"dc": "http://purl.org/dc/terms/"}]}
    out = fix_context_array(doc)
    assert out["@context"] == STANDARD_HTTPS_CONTEXT
    assert out["@context"]["@vocab"] == "https://schema.org/"
    assert len(out["@context"]) == 16


def test_url_fix_adds_vocab_when_missing():
    doc = {"@context": {"schema": "https://schema.org/"}}
    out = fix_context_url(doc)
    assert out["@context"]["@vocab"] == HTTPS_CONTEXT


def test_url_fix_short_schema_org_replaced():
    # len("http://schema.org") < 20 → wholesale replacement (116-118)
    for bad in ("http://schema.org", "http://schema.org/", "https://schema.org"):
        doc = {"@context": {"@vocab": bad}}
        out = fix_context_url(dict(doc))
        assert out["@context"]["@vocab"] == HTTPS_CONTEXT, bad


def test_url_fix_www_branch_reference_quirk():
    # the Go www branch (jsonutils.go:110-114) prepends ctx to the slice
    # from "schema.org": https://www.schema.org/ → https://schema.org/schema.org/
    doc = {"@context": {"@vocab": "https://www.schema.org/"}}
    out = fix_context_url(doc)
    assert out["@context"]["@vocab"] == HTTPS_CONTEXT + "schema.org/"


def test_url_fix_non_schema_org_untouched():
    doc = {"@context": {"@vocab": "https://example.org/vocab/",
                        "dc": "http://purl.org/dc/terms/"}}
    out = fix_context_url(dict(doc))
    assert out["@context"]["@vocab"] == "https://example.org/vocab/"
    assert out["@context"]["dc"] == "http://purl.org/dc/terms/"


def test_fix_id_relative_gets_file_prefix():
    doc = {"@context": {"@vocab": HTTPS_CONTEXT}, "@id": "my/relative/id"}
    assert fix_id(doc)["@id"] == "file://my/relative/id"


def test_fix_id_absolute_untouched():
    doc = {"@id": "https://example.org/x"}
    assert fix_id(dict(doc))["@id"] == "https://example.org/x"


def test_fix_id_respects_base():
    doc = {"@context": {"@base": "https://example.org/"}, "@id": "rel"}
    assert fix_id(dict(doc))["@id"] == "rel"


def test_fix_all_pipeline():
    raw = json.dumps({"@context": "http://schema.org", "@type": "Dataset",
                      "@id": "rel-id", "name": "x"})
    fixed = json.loads(fix_all(raw))
    assert fixed["@context"]["@vocab"] == HTTPS_CONTEXT
    assert fixed["@id"] == "file://rel-id"


def test_fix_all_strict_bypasses():
    raw = json.dumps({"@context": "http://schema.org", "@id": "rel-id"})
    assert fix_all(raw, STRICT) == raw


def test_fixed_doc_normalizes_with_vocab():
    from gleaner_spark.core.jsonld import normalize

    raw = json.dumps({"@context": "http://schema.org", "@type": "Dataset",
                      "@id": "https://example.org/ds", "name": "x"})
    norm = normalize(fix_all(raw))
    assert "<https://schema.org/name>" in norm
    assert "<https://schema.org/Dataset>" in norm
