"""URDNA2015 / toRDF parity with the reference's approval goldens.

Golden values come from gleanerio/gleaner
``internal/common/ldproc_test.go:39-101`` and the committed approval files
``internal/common/testdata/ldproc_test.TestNormalizeTriple.*.approved.txt``.
The three inline documents below are the reference's own unit-test inputs.
"""

import json

from gleaner_spark.core.jsonld import (
    Quad,
    RdfTerm,
    normalize,
    serialize_nquads,
    to_rdf,
    urdna2015,
)

JSON_NO_CONTEXT = """{
"@type":"bar",
"@id":"idenfitier",
"url": "http://example.com/",
"identifier": [\t
\t{
\t"@type": "PropertyValue",
\t"@id": "https://doi.org/10.1575/1912/bco-dmo.2343.1",
\t"propertyID": "https://registry.identifiers.org/registry/doi",
\t"value": "doi:10.1575/1912/bco-dmo.2343.1",
\t"url": "https://doi.org/10.1575/1912/bco-dmo.2343.1"
\t}
\t
]

}"""

JSON_NO_CONTEXT_SIMPLE = '{"@type":"bar","SO:name":"Some type in a graph"}'

JSON_GRAPH_FIRST = (
    '{"@graph":[{"@context":{"SO":"http://schema.org/"},'
    '"@type":"bar","SO:name":"Some type in a graph"}]}'
)


def test_normalize_no_context_is_empty():
    # properties without a vocab are dropped in expansion; the remaining
    # quad has a relative subject IRI, which json-gold drops → ""
    assert normalize(JSON_NO_CONTEXT) == ""


def test_normalize_no_context_simple_golden():
    expected = (
        '_:c14n0 <SO:name> "Some type in a graph" .\n'
        "_:c14n0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <bar> .\n"
    )
    assert normalize(JSON_NO_CONTEXT_SIMPLE) == expected


def test_normalize_graph_first_golden():
    expected = (
        '_:c14n0 <http://schema.org/name> "Some type in a graph" .\n'
        "_:c14n0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <bar> .\n"
    )
    assert normalize(JSON_GRAPH_FIRST) == expected


def test_vocab_expansion_and_typed_values():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/ds/1",
        "@type": "Dataset",
        "name": "N",
        "version": 3,
        "isAccessibleForFree": True,
        "score": 1.5,
    }
    lines = serialize_nquads(to_rdf(doc)).splitlines()
    assert (
        "<https://example.org/ds/1> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<https://schema.org/Dataset> ." in lines
    )
    assert '<https://example.org/ds/1> <https://schema.org/name> "N" .' in lines
    assert (
        '<https://example.org/ds/1> <https://schema.org/version> '
        '"3"^^<http://www.w3.org/2001/XMLSchema#integer> .' in lines
    )
    assert (
        '<https://example.org/ds/1> <https://schema.org/isAccessibleForFree> '
        '"true"^^<http://www.w3.org/2001/XMLSchema#boolean> .' in lines
    )
    assert (
        '<https://example.org/ds/1> <https://schema.org/score> '
        '"1.5E0"^^<http://www.w3.org/2001/XMLSchema#double> .' in lines
    )


def test_nested_nodes_and_blank_nodes():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@type": "Dataset",
        "creator": {"@type": "Person", "name": "Ada"},
        "publisher": {"@type": "Organization", "name": "Org"},
    }
    quads = to_rdf(doc)
    bnodes = {q.s.value for q in quads if q.s.kind == "blank"}
    assert len(bnodes) == 3  # root + creator + publisher
    norm = normalize(json.dumps(doc))
    assert norm.count("_:c14n") >= 6
    # canonicalization is stable under key reordering
    doc2 = json.loads(json.dumps(doc))
    doc2["publisher"], doc2["creator"] = doc2.pop("publisher"), doc2.pop("creator")
    assert normalize(json.dumps(doc2)) == norm


def test_list_emission():
    doc = {
        "@context": {"@vocab": "https://schema.org/",
                     "steps": {"@id": "https://schema.org/step",
                               "@container": "@list"}},
        "@id": "https://example.org/r",
        "steps": ["a", "b"],
    }
    nq = serialize_nquads(to_rdf(doc))
    assert "rdf-syntax-ns#first" in nq and "rdf-syntax-ns#rest" in nq
    assert "rdf-syntax-ns#nil" in nq


def test_language_literals():
    doc = {
        "@context": {"@vocab": "https://schema.org/", "@language": "en"},
        "@id": "https://example.org/x",
        "name": "hello",
    }
    nq = serialize_nquads(to_rdf(doc))
    assert '"hello"@en' in nq


def test_named_graph_quads():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/g1",
        "@graph": [{"@id": "https://example.org/a", "name": "x"}],
    }
    quads = to_rdf(doc)
    assert any(q.g is not None and q.g.value == "https://example.org/g1"
               for q in quads)


def test_literal_escaping():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/x",
        "name": 'a "quoted"\nline\\end\ttab',
    }
    nq = serialize_nquads(to_rdf(doc))
    assert '"a \\"quoted\\"\\nline\\\\end\\ttab"' in nq


def test_urdna_distinguishes_isomorphic_bnodes():
    # two interlinked bnodes require the n-degree hashing path
    q = [
        Quad(RdfTerm("blank", "_:a"), RdfTerm("iri", "http://p/knows"),
             RdfTerm("blank", "_:b"), None),
        Quad(RdfTerm("blank", "_:b"), RdfTerm("iri", "http://p/knows"),
             RdfTerm("blank", "_:a"), None),
        Quad(RdfTerm("blank", "_:a"), RdfTerm("iri", "http://p/name"),
             RdfTerm("literal", "x", None, None), None),
    ]
    out = urdna2015(q)
    assert out.count("\n") == 3
    assert "_:c14n0" in out and "_:c14n1" in out


def test_schema_org_string_context_prefixes_only():
    # the schema.org vocabulary file's @context is prefix-only: plain
    # terms do NOT expand, prefixed ones do
    doc = {
        "@context": "https://schema.org/",
        "@id": "https://example.org/x",
        "name": "dropped",
        "rdfs:label": "kept",
    }
    nq = serialize_nquads(to_rdf(doc))
    assert "schema.org/name" not in nq
    assert "<http://www.w3.org/2000/01/rdf-schema#label>" in nq


# ---------------------------------------------------------------------------
# round 2: @reverse / containers / @nest / @included / registry / budget
# ---------------------------------------------------------------------------

def test_reverse_keyword_emits_reversed_triple():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/ds",
        "@reverse": {"about": {"@id": "https://example.org/page"}},
    }
    nq = serialize_nquads(to_rdf(doc))
    assert nq == (
        "<https://example.org/page> <https://schema.org/about> "
        "<https://example.org/ds> .\n"
    )


def test_reverse_term_definition():
    doc = {
        "@context": {
            "@vocab": "https://schema.org/",
            "isAboutOf": {"@reverse": "about"},
        },
        "@id": "https://example.org/ds",
        "isAboutOf": [
            {"@id": "https://example.org/p1"},
            {"@id": "https://example.org/p2"},
        ],
    }
    nq = serialize_nquads(to_rdf(doc))
    assert ("<https://example.org/p1> <https://schema.org/about> "
            "<https://example.org/ds> .") in nq
    assert ("<https://example.org/p2> <https://schema.org/about> "
            "<https://example.org/ds> .") in nq
    assert nq.count("\n") == 2


def test_reverse_literal_values_dropped():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/ds",
        "@reverse": {"about": "just a string"},
    }
    assert to_rdf(doc) == []


def test_index_container_values_recovered():
    doc = {
        "@context": {
            "@vocab": "https://schema.org/",
            "dist": {"@id": "https://schema.org/distribution",
                     "@container": "@index"},
        },
        "@id": "https://example.org/ds",
        "dist": {
            "csv": {"@id": "https://example.org/d.csv"},
            "json": {"@id": "https://example.org/d.json"},
        },
    }
    nq = serialize_nquads(to_rdf(doc))
    assert "<https://example.org/d.csv>" in nq
    assert "<https://example.org/d.json>" in nq
    assert nq.count("distribution") == 2


def test_language_map_container():
    doc = {
        "@context": {
            "@vocab": "https://schema.org/",
            "label": {"@id": "https://schema.org/name",
                      "@container": "@language"},
        },
        "@id": "https://example.org/ds",
        "label": {"en": "Dataset", "DE": ["Datensatz"]},
    }
    nq = serialize_nquads(to_rdf(doc))
    assert '"Dataset"@en' in nq
    assert '"Datensatz"@de' in nq


def test_nest_merges_properties():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/ds",
        "@nest": {"name": "Nested name"},
    }
    nq = serialize_nquads(to_rdf(doc))
    assert ("<https://example.org/ds> <https://schema.org/name> "
            '"Nested name" .') in nq


def test_included_emits_sibling_nodes():
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/ds",
        "name": "Main",
        "@included": [
            {"@id": "https://example.org/other", "name": "Other"},
        ],
    }
    nq = serialize_nquads(to_rdf(doc))
    assert '<https://example.org/ds> <https://schema.org/name> "Main" .' in nq
    assert ('<https://example.org/other> <https://schema.org/name> "Other" .'
            in nq)


def test_remote_context_registry_roundtrip():
    from gleaner_spark.core.jsonld import (
        REMOTE_CONTEXTS,
        JsonLdError,
        register_remote_context,
    )

    url = "https://example.org/contexts/test-dataset.jsonld"
    doc = {
        "@context": url,
        "@id": "https://example.org/ds",
        "title": "T",
    }
    # unregistered → invalid document (offline executors never fetch)
    import pytest as _pytest

    with _pytest.raises(JsonLdError, match="offline"):
        to_rdf(doc)
    register_remote_context(url, {"title": "https://purl.org/dc/terms/title"})
    try:
        nq = serialize_nquads(to_rdf(doc))
        assert ("<https://example.org/ds> <https://purl.org/dc/terms/title> "
                '"T" .') in nq
    finally:
        REMOTE_CONTEXTS.pop(url.rstrip("/"), None)


def test_remote_context_trailing_slash_and_cycle():
    from gleaner_spark.core.jsonld import (
        REMOTE_CONTEXTS,
        JsonLdError,
        register_remote_context,
    )

    url = "https://example.org/ctx/"
    register_remote_context(url, {"@vocab": "https://example.org/v#"})
    try:
        doc = {"@context": "https://example.org/ctx", "@id": "https://x.org/a",
               "p": "v"}
        nq = serialize_nquads(to_rdf(doc))
        assert "<https://example.org/v#p>" in nq
    finally:
        REMOTE_CONTEXTS.pop("https://example.org/ctx", None)

    import pytest as _pytest

    register_remote_context("https://example.org/loop", "https://example.org/loop")
    try:
        with _pytest.raises(JsonLdError, match="cyclic"):
            to_rdf({"@context": "https://example.org/loop", "@id": "https://x.org/a"})
    finally:
        REMOTE_CONTEXTS.pop("https://example.org/loop", None)


def test_urdna_budget_raises_on_isomorphic_bnode_flood():
    from gleaner_spark.core.jsonld import CanonicalizationBudgetError

    import pytest as _pytest

    # 10 mutually-indistinguishable bnodes → one first-degree hash group
    # of 10 → permutation search would be 10! — the budget must raise
    doc = {
        "@context": {"@vocab": "https://schema.org/"},
        "@id": "https://example.org/ds",
        "knows": [{"name": "same"} for _ in range(10)],
    }
    with _pytest.raises(CanonicalizationBudgetError):
        urdna2015(to_rdf(doc))
