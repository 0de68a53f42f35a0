"""HTML → JSON-LD extraction byte-identity tests.

Contract from gleanerio/gleaner ``internal/summoner/acquire/acquire.go:216-252``
(goquery select + whole-body JSON fallback) and BASELINE.json's
"byte-identical extracted text per url" invariant.
"""

from gleaner_spark.core.extract import (
    document_text,
    extract_jsonld_strings,
    find_script_blocks,
    url_path_is_json,
)

JSONLD = '{"@context":"https://schema.org/","@type":"Dataset","name":"d1"}'


def page(*blocks: str, decoy: bool = True) -> str:
    scripts = "".join(
        f'<script type="application/ld+json">{b}</script>' for b in blocks
    )
    d = '<script type="text/javascript">var x = "<b>not json</b>";</script>' if decoy else ""
    return f"<html><head>{d}{scripts}</head><body><p>hi</p></body></html>"


def test_single_block_verbatim():
    assert find_script_blocks(page(JSONLD)) == [JSONLD]


def test_multiple_blocks_in_order():
    b2 = '{"@type":"Person"}'
    assert find_script_blocks(page(JSONLD, b2)) == [JSONLD, b2]


def test_no_blocks():
    assert find_script_blocks(page(decoy=True)) == []


def test_whitespace_and_newlines_preserved_verbatim():
    content = "\n  {\n    \"@type\": \"Dataset\"\n  }\n  "
    html = f'<script type="application/ld+json">{content}</script>'
    assert find_script_blocks(html) == [content]


def test_entities_not_decoded_in_script():
    # script is a raw-text element: &amp; stays &amp;
    content = '{"name":"A &amp; B"}'
    html = f'<script type="application/ld+json">{content}</script>'
    assert find_script_blocks(html) == [content]


def test_attribute_quoting_variants():
    for tag in (
        "<script type='application/ld+json'>",
        "<script type=application/ld+json>",
        '<script async type="application/ld+json" id="x">',
        '<SCRIPT TYPE="application/ld+json">',  # tag/attr name case-insensitive
    ):
        html = f"{tag}{JSONLD}</script>"
        assert find_script_blocks(html) == [JSONLD], tag


def test_type_value_match_is_exact():
    # goquery attribute selector value match is case-sensitive/exact
    html = f'<script type="application/LD+JSON">{JSONLD}</script>'
    assert find_script_blocks(html) == []
    html2 = f'<script type="application/ld+json; charset=utf-8">{JSONLD}</script>'
    assert find_script_blocks(html2) == []


def test_commented_out_script_skipped():
    html = f"<!-- <script type=\"application/ld+json\">{JSONLD}</script> -->" + page(JSONLD)
    assert find_script_blocks(html) == [JSONLD]


def test_content_stops_at_close_tag():
    content = '{"a":"</scr"}'  # embedded partial close is fine
    html = f'<script type="application/ld+json">{content}</script>trailing'
    assert find_script_blocks(html) == [content]


def test_unclosed_script_runs_to_eof():
    html = f'<script type="application/ld+json">{JSONLD}'
    assert find_script_blocks(html) == [JSONLD]


def test_url_extension_check():
    assert url_path_is_json("https://x.org/data/file.json")
    assert url_path_is_json("https://x.org/data/file.jsonld?v=1")
    assert not url_path_is_json("https://x.org/data/file.json.html")
    assert not url_path_is_json("https://x.org/file.html")


def test_whole_body_json_verbatim():
    raw = '{\n "@context": "https://schema.org/",\n "@type": "Dataset"\n}'
    assert document_text(raw) == raw
    assert extract_jsonld_strings(raw, "https://x.org/d.json") == [raw]
    assert extract_jsonld_strings(raw, "https://x.org/d",
                                  "application/ld+json") == [raw]
    assert extract_jsonld_strings(raw, "https://x.org/d",
                                  "application/json; charset=utf-8") == [raw]


def test_html_page_routes_to_script_extraction():
    assert extract_jsonld_strings(page(JSONLD), "https://x.org/p.html") == [JSONLD]


class TestInlineJsonldRecovery:
    """S5 headless-gap fallback: conservative JSON-LD recovery from plain
    <script> JS (core/extract.py:find_inline_jsonld; reference reaches
    these shapes only via headless Chrome, headlessNG.go:302-349)."""

    HTML = (
        '<html><head>'
        '<script type="text/javascript">\n'
        '// a decoy comment with {"@type": "Nope"}\n'
        'var schemaData = {"@context": "https://schema.org/",'
        ' "@type": "Dataset", "name": "JS dataset {braces} ok"};\n'
        'render(schemaData);\n'
        'function f() { var other = {"plain": 1};'
        ' if (x) { return {"@type": "Person", "name": "Inner"}; } }\n'
        '</script>'
        # a whole ld+json tag built inside a JS string literal, with JS
        # escapes (\' and <\/script>) the recovery must unescape
        + "<script>"
        + r"""document.head.insertAdjacentHTML('beforeend', '<script type="application/ld+json">{"@context": "https://schema.org/", "@type": "Event", "name": "Injected \'quoted\'"}<\/script>');"""
        + "</script>"
        '<script>var p = JSON.parse(\'{"@context": "https://schema.org/",'
        ' "@type": "Organization", "name": "Parsed"}\');</script>'
        '<!-- <script type="application/ld+json">{"decoy": true}</script> -->'
        '<!-- commented js: <script>var c = {"@type": "Commented"};</script> -->'
        '<script type="application/ld+json">{"@type": "Static"}</script>'
        '</head><body></body></html>'
    )

    def test_recovers_all_three_js_shapes_in_order(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        got = find_inline_jsonld(self.HTML)
        assert [g.split('"@type": "')[1].split('"')[0] for g in got] == [
            "Dataset", "Person", "Event", "Organization"
        ]

    def test_never_recovers_decoys_comments_or_plain_objects(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        got = " ".join(find_inline_jsonld(self.HTML))
        for bad in ("decoy", "Commented", "Nope", '"plain"', "Static"):
            assert bad not in got, bad

    def test_static_extraction_untouched(self):
        from gleaner_spark.core.extract import find_script_blocks

        assert find_script_blocks(self.HTML) == ['{"@type": "Static"}']

    def test_verbatim_substring_and_dedup(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        doc = '{"@context": "https://schema.org/", "@type": "Thing"}'
        html = f"<script>var a = {doc}; var b = {doc};</script>"
        assert find_inline_jsonld(html) == [doc]

    def test_parse_budget_bounds_adversarial_pages(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        many = "".join(
            f'var v{i} = {{"@type": "T{i}"}};' for i in range(200)
        )
        got = find_inline_jsonld(f"<script>{many}</script>")
        assert len(got) <= 64  # max_parse_attempts cap

    def test_no_scripts_or_empty(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        assert find_inline_jsonld("<html><body>x</body></html>") == []
        assert find_inline_jsonld("") == []


class TestJsInlineConcatenation:
    """Round-3 VERDICT #3: statically-recoverable shapes the rendered
    DOM would show joined — '+'-concatenated string payloads,
    document.write of a (split-closer) ld+json tag, and cross-shape
    dedup of the same document."""

    DOC = '{"@context": "https://schema.org/", "@type": "Dataset", "name": "C1"}'

    def test_concatenated_json_parse_payload(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        a, b = self.DOC[:25], self.DOC[25:]
        html = (f"<script>var d = JSON.parse('{a}' + '{b}');"
                "render(d);</script>")
        assert find_inline_jsonld(html) == [self.DOC]

    def test_document_write_split_script_tag(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        html = (
            "<script>document.write("
            "'<script type=\"application/ld+json\">' + "
            f"'{self.DOC[:30]}' + '{self.DOC[30:]}' + "
            "'</scr' + 'ipt>');</script>"
        )
        assert find_inline_jsonld(html) == [self.DOC]

    def test_concat_across_comments_and_newlines(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        a, b = self.DOC[:20], self.DOC[20:]
        html = (f"<script>var d = JSON.parse('{a}' /* mid */ +\n"
                f"  // second half\n  '{b}');</script>")
        assert find_inline_jsonld(html) == [self.DOC]

    def test_same_doc_object_literal_and_string_deduped(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        spaced = self.DOC.replace(": ", ":  ")  # same parsed doc
        html = (f"<script>var a = {self.DOC};"
                f" var b = JSON.parse('{spaced}');</script>")
        assert find_inline_jsonld(html) == [self.DOC]

    def test_distinct_docs_both_kept_in_order(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        d2 = '{"@context": "https://schema.org/", "@type": "Person"}'
        html = (f"<script>var a = {self.DOC};"
                f" var b = JSON.parse('{d2}');</script>")
        assert find_inline_jsonld(html) == [self.DOC, d2]

    def test_plain_string_concat_not_jsonld_ignored(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        html = "<script>var s = 'hello ' + 'world' + 1;</script>"
        assert find_inline_jsonld(html) == []


class TestJsInlineIndirection:
    """Round-5 VERDICT #7: the last static shapes short of execution —
    single-assignment variable indirection in concat chains and
    template-literal ${name} interpolation — plus the safety rails
    (reassigned or unknown variables must cause a MISSED recovery,
    never a wrong one)."""

    DOC = '{"@context": "https://schema.org/", "@type": "Dataset", "name": "V1"}'

    def test_var_indirection_in_write_chain(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        a, b = self.DOC[:30], self.DOC[30:]
        html = (
            f"<script>var p1 = '{a}';\nvar p2 = '{b}';\n"
            "document.write('<script type=\"application/ld+json\">'"
            " + p1 + p2 + '</scr' + 'ipt>');</script>"
        )
        assert find_inline_jsonld(html) == [self.DOC]

    def test_template_literal_interpolation(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        html = (
            f"<script>var jd = '{self.DOC}';\n"
            "var tag = `<script type=\"application/ld+json\">"
            "${jd}</scr` + 'ipt>';\n"
            "document.body.insertAdjacentHTML('beforeend', tag);</script>"
        )
        assert find_inline_jsonld(html) == [self.DOC]

    def test_template_literal_whitespace_in_interp(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        html = (
            f"<script>const jd = '{self.DOC}';"
            "var t = `<script type=\"application/ld+json\">${ jd }"
            "</scr` + 'ipt>';</script>"
        )
        assert find_inline_jsonld(html) == [self.DOC]

    def test_reassigned_var_never_resolves(self):
        """A name written twice is execution-order-dependent: splicing
        either value could fabricate a document the rendered DOM never
        shows — the group must end before it (missed, not wrong)."""
        from gleaner_spark.core.extract import find_inline_jsonld

        a, b = self.DOC[:30], self.DOC[30:]
        html = (
            f"<script>var p = '{a}';\np = 'OTHER';\n"
            "document.write('<script type=\"application/ld+json\">'"
            f" + p + '{b}' + '</scr' + 'ipt>');</script>"
        )
        assert find_inline_jsonld(html) == []

    def test_unknown_var_ends_group_before_it(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        html = (
            "<script>document.write("
            "'<script type=\"application/ld+json\">{\"@context\": \"x\", '"
            " + userData + '\"@type\": \"Dataset\"}' + '</scr' + 'ipt>');"
            "</script>"
        )
        assert find_inline_jsonld(html) == []

    def test_unresolved_interpolation_left_verbatim(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        html = (
            "<script>var t = `<script type=\"application/ld+json\">"
            "{\"@context\": \"https://schema.org/\", \"name\": \"${user.n}\"}"
            "</scr` + 'ipt>';</script>"
        )
        # ${user.n} is not a bare resolvable name: stays verbatim, and
        # the resulting text is parseable JSON whose value contains the
        # raw interpolation — NOT silently-wrong data.  It lacks @type/
        # @graph plus a real @context payload?  It HAS @context, so it
        # IS recovered with the literal "${user.n}" value — acceptable
        # only if visibly literal; assert exactly that.
        out = find_inline_jsonld(html)
        assert len(out) == 1 and "${user.n}" in out[0]

    def test_non_string_declaration_never_resolves(self):
        from gleaner_spark.core.extract import find_inline_jsonld

        html = (
            "<script>var p = fetch('/x');\n"
            "document.write('<script type=\"application/ld+json\">'"
            f" + p + '{self.DOC}' + '</scr' + 'ipt>');</script>"
        )
        # p is not a static string, so the tag is NOT stitched through
        # it — but the complete JSON-LD string literal after p is still
        # recovered on its own (standalone-payload semantics, same as a
        # JSON.parse argument).  The important property: nothing is
        # FABRICATED across the unresolvable term.
        assert find_inline_jsonld(html) == [self.DOC]
