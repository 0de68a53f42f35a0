"""Microdata / RDFa Lite extraction unit tests (core/structured.py).

The Go reference has no microdata/RDFa path (its harvest is JSON-LD
script blocks only); these semantics follow the public WHATWG microdata
model and RDFa Lite 1.1, restricted to the subset a schema.org web
harvester meets in the wild.
"""

from gleaner_spark.core.structured import (
    microdata_triples,
    parse_html,
    rdfa_triples,
    structured_triples,
)

SCHEMA = "https://schema.org/"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


# ---------------------------------------------------------------------------
# tree builder
# ---------------------------------------------------------------------------

def test_parse_html_basic_tree_and_text():
    root = parse_html("<div><p>hello <b>world</b></p><p>two</p></div>")
    div = root.children[0]
    assert div.tag == "div"
    assert [c.tag for c in div.children] == ["p", "p"]
    assert div.text() == "hello worldtwo"


def test_parse_html_void_and_self_closing():
    root = parse_html('<div><img src="x.png"><br/><span>t</span></div>')
    div = root.children[0]
    assert [c.tag for c in div.children] == ["img", "br", "span"]
    # void elements take no children — span is a sibling, not a child of br
    assert div.children[0].children == []


def test_parse_html_unclosed_and_stray_closers():
    root = parse_html("<div><p>a<p>b</div></section><em>c")
    div = root.children[0]
    # both <p> auto-recover; stray </section> is ignored; trailing <em>
    # is auto-closed at EOF
    assert div.text() == "ab"
    assert root.children[1].tag == "em"
    assert root.children[1].text() == "c"


def test_parse_html_script_is_raw_text():
    root = parse_html('<script>if (a < b) { x("<div>"); }</script><p>t</p>')
    script = root.children[0]
    assert script.tag == "script"
    assert script.text() == 'if (a < b) { x("<div>"); }'
    assert root.children[1].tag == "p"


def test_parse_html_comment_removed():
    root = parse_html("<div><!-- <span itemscope> --><i>x</i></div>")
    assert [c.tag for c in root.children[0].children
            if not isinstance(c, str)] == ["i"]


# ---------------------------------------------------------------------------
# microdata
# ---------------------------------------------------------------------------

def test_microdata_flat_item():
    html = (
        '<div itemscope itemtype="https://schema.org/Dataset">'
        '<span itemprop="name">My data</span>'
        '<a itemprop="url" href="https://ex.org/d">link text</a>'
        "</div>"
    )
    t = microdata_triples(html)
    assert ("_:md0", RDF_TYPE, f"<{SCHEMA}Dataset>") in t
    assert ("_:md0", f"<{SCHEMA}name>", '"My data"') in t
    assert ("_:md0", f"<{SCHEMA}url>", "<https://ex.org/d>") in t
    assert len(t) == 3


def test_microdata_itemid_and_meta_img_time_data():
    html = (
        '<article itemscope itemtype="https://schema.org/Article"'
        ' itemid="https://ex.org/a1">'
        '<meta itemprop="position" content="3">'
        '<img itemprop="image" src="https://ex.org/i.png">'
        '<time itemprop="datePublished" datetime="2026-01-02">Jan 2</time>'
        '<data itemprop="size" value="42">forty-two</data>'
        "</article>"
    )
    t = microdata_triples(html)
    s = "<https://ex.org/a1>"
    assert (s, RDF_TYPE, f"<{SCHEMA}Article>") in t
    assert (s, f"<{SCHEMA}position>", '"3"') in t
    assert (s, f"<{SCHEMA}image>", "<https://ex.org/i.png>") in t
    assert (s, f"<{SCHEMA}datePublished>", '"2026-01-02"') in t
    assert (s, f"<{SCHEMA}size>", '"42"') in t


def test_microdata_nested_item_is_object_and_props_dont_leak():
    html = (
        '<div itemscope itemtype="https://schema.org/Book">'
        '<span itemprop="name">B</span>'
        '<div itemprop="author" itemscope'
        ' itemtype="https://schema.org/Person">'
        '<span itemprop="name">A. Author</span>'
        "</div></div>"
    )
    t = microdata_triples(html)
    # outer item gets the nested node as object, NOT the inner name
    assert ("_:md0", f"<{SCHEMA}author>", "_:md1") in t
    assert ("_:md0", f"<{SCHEMA}name>", '"B"') in t
    assert ("_:md1", f"<{SCHEMA}name>", '"A. Author"') in t
    assert ("_:md0", f"<{SCHEMA}name>", '"A. Author"') not in t


def test_microdata_itemref_pulls_external_subtree():
    html = (
        '<div itemscope itemtype="https://schema.org/Event" itemref="x y">'
        "</div>"
        '<p id="x"><span itemprop="name">Show</span></p>'
        '<meta id="y" itemprop="duration" content="PT2H">'
    )
    t = microdata_triples(html)
    assert ("_:md0", f"<{SCHEMA}name>", '"Show"') in t
    assert ("_:md0", f"<{SCHEMA}duration>", '"PT2H"') in t


def test_microdata_multiple_names_and_absolute_iri_prop():
    html = (
        '<div itemscope itemtype="https://schema.org/Thing">'
        '<span itemprop="name alternateName">X</span>'
        '<span itemprop="http://purl.org/dc/terms/title">Y</span>'
        "</div>"
    )
    t = microdata_triples(html)
    assert ("_:md0", f"<{SCHEMA}name>", '"X"') in t
    assert ("_:md0", f"<{SCHEMA}alternateName>", '"X"') in t
    assert ("_:md0", "<http://purl.org/dc/terms/title>", '"Y"') in t


def test_microdata_no_itemtype_drops_unqualified_props():
    html = (
        "<div itemscope>"
        '<span itemprop="name">dropped</span>'
        '<span itemprop="https://ex.org/p">kept</span>'
        "</div>"
    )
    t = microdata_triples(html)
    assert t == [("_:md0", "<https://ex.org/p>", '"kept"')]


def test_microdata_hash_vocab_base():
    html = (
        '<div itemscope itemtype="http://ex.org/vocab#Type">'
        '<span itemprop="p">v</span></div>'
    )
    t = microdata_triples(html)
    assert ("_:md0", "<http://ex.org/vocab#p>", '"v"') in t


def test_microdata_literal_escaping():
    html = (
        '<div itemscope itemtype="https://schema.org/Thing">'
        '<span itemprop="name">say "hi"\\now</span></div>'
    )
    t = microdata_triples(html)
    assert ("_:md0", f"<{SCHEMA}name>", '"say \\"hi\\"\\\\now"') in t


# ---------------------------------------------------------------------------
# RDFa Lite
# ---------------------------------------------------------------------------

def test_rdfa_vocab_typeof_property():
    html = (
        '<div vocab="https://schema.org/" typeof="Person">'
        '<span property="name">Alice</span>'
        '<a property="url" href="https://alice.example/">home</a>'
        "</div>"
    )
    t = rdfa_triples(html)
    assert ("_:ra0", RDF_TYPE, f"<{SCHEMA}Person>") in t
    assert ("_:ra0", f"<{SCHEMA}name>", '"Alice"') in t
    assert ("_:ra0", f"<{SCHEMA}url>", "<https://alice.example/>") in t


def test_rdfa_resource_subject_and_content_attr():
    html = (
        '<div vocab="https://schema.org/" typeof="Dataset"'
        ' resource="https://ex.org/ds1">'
        '<meta property="version" content="2.1">'
        "</div>"
    )
    t = rdfa_triples(html)
    s = "<https://ex.org/ds1>"
    assert (s, RDF_TYPE, f"<{SCHEMA}Dataset>") in t
    assert (s, f"<{SCHEMA}version>", '"2.1"') in t


def test_rdfa_chaining_property_plus_typeof():
    html = (
        '<div vocab="https://schema.org/" typeof="Book"'
        ' resource="https://ex.org/b">'
        '<div property="author" typeof="Person">'
        '<span property="name">A</span>'
        "</div></div>"
    )
    t = rdfa_triples(html)
    assert ("<https://ex.org/b>", f"<{SCHEMA}author>", "_:ra0") in t
    assert ("_:ra0", RDF_TYPE, f"<{SCHEMA}Person>") in t
    assert ("_:ra0", f"<{SCHEMA}name>", '"A"') in t


def test_rdfa_prefix_and_curie():
    html = (
        '<div prefix="ex: https://ex.org/ns#" vocab="https://schema.org/"'
        ' typeof="ex:Widget">'
        '<span property="ex:label">w1</span>'
        '<span property="dc:title">t1</span>'
        "</div>"
    )
    t = rdfa_triples(html)
    assert ("_:ra0", RDF_TYPE, "<https://ex.org/ns#Widget>") in t
    assert ("_:ra0", "<https://ex.org/ns#label>", '"w1"') in t
    # dc: comes from the initial context
    assert ("_:ra0", "<http://purl.org/dc/terms/title>", '"t1"') in t


def test_rdfa_vocab_inherits_and_overrides():
    html = (
        '<div vocab="https://schema.org/" typeof="Thing">'
        '<div vocab="http://ex.org/v/">'
        '<span property="p">inner</span>'
        "</div>"
        '<span property="name">outer</span>'
        "</div>"
    )
    t = rdfa_triples(html)
    assert ("_:ra0", "<http://ex.org/v/p>", '"inner"') in t
    assert ("_:ra0", f"<{SCHEMA}name>", '"outer"') in t


def test_rdfa_property_without_subject_is_dropped():
    # no typeof/vocab ancestor established a subject — nothing to attach to
    assert rdfa_triples('<span property="name">x</span>') == []


def test_rdfa_unresolvable_term_dropped():
    html = '<div typeof="Person"><span property="name">x</span></div>'
    # no vocab → 'Person'/'name' cannot resolve; the typeof still opens a
    # subject scope but emits no type triple and the property is dropped
    assert rdfa_triples(html) == []


# ---------------------------------------------------------------------------
# combined
# ---------------------------------------------------------------------------

def test_structured_triples_tags_syntax_and_keeps_order():
    html = (
        '<div itemscope itemtype="https://schema.org/Thing">'
        '<span itemprop="name">md</span></div>'
        '<div vocab="https://schema.org/" typeof="Thing">'
        '<span property="name">ra</span></div>'
    )
    rows = structured_triples(html)
    syntaxes = [r[3] for r in rows]
    assert syntaxes == ["microdata", "microdata", "rdfa", "rdfa"]
    assert ("_:md0", f"<{SCHEMA}name>", '"md"', "microdata") in rows
    assert ("_:ra0", f"<{SCHEMA}name>", '"ra"', "rdfa") in rows


def test_structured_triples_plain_page_empty():
    assert structured_triples("<html><body><p>no data</p></body></html>") == []


# ---------------------------------------------------------------------------
# pipeline contract: content sha + skolemization
# ---------------------------------------------------------------------------

def test_page_structured_sha_and_skolemization():
    from gleaner_spark.core.structured import page_structured

    html = (
        '<div itemscope itemtype="https://schema.org/Thing">'
        '<span itemprop="name">md</span></div>'
    )
    sha, trips = page_structured(html)
    assert len(sha) == 64
    # blank labels carry the content sha (the mill's _:b{sha}_ shape)
    assert trips == [
        ("_:b%s_md0" % sha,
         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         "<https://schema.org/Thing>", "microdata"),
        ("_:b%s_md0" % sha, "<https://schema.org/name>", '"md"',
         "microdata"),
    ]
    # content-addressed: identical markup → identical sha; any change →
    # a different sha (and thus a different graph + blank namespace)
    assert page_structured(html)[0] == sha
    assert page_structured(html.replace("md", "x"))[0] != sha


def test_page_structured_empty_page():
    from gleaner_spark.core.structured import page_structured

    assert page_structured("<p>plain</p>") == ("", [])
