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
