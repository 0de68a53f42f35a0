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
