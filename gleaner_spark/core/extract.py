"""JSON-LD extraction from raw HTML.

Re-expresses the reference's page-scrape projection (gleanerio/gleaner
``internal/summoner/acquire/acquire.go:216-252`` — goquery select of
``script[type='application/ld+json']`` + whole-body fallback for JSON
content) as a pure function so it can be unit-tested byte-for-byte and
wrapped in a vectorized pandas UDF.

Parity contract (BASELINE.json input_hint): the extracted text per url is
byte-identical to what the Go reference produces.  goquery's ``.Text()``
on a ``<script>`` element returns the element's raw character data
verbatim (HTML5 treats script as a raw-text element: no entity decoding,
content runs to the first ``</script`` sequence), so we implement a small
raw-text scanner instead of a DOM parser — no lxml/bs4 dependency.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

JSONLD_TYPE = "application/ld+json"

# attribute parser: name [= value] with double/single/unquoted values
_ATTR_RE = re.compile(
    r"""([^\s/>=]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?""",
)

_SCRIPT_OPEN_RE = re.compile(r"<script(?=[\s/>])", re.IGNORECASE)
_SCRIPT_CLOSE_RE = re.compile(r"</script", re.IGNORECASE)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>", re.DOTALL)


def _parse_attrs(tag_body: str) -> dict[str, str]:
    """Parse attributes from the inside of an open tag.

    Mirrors net/html tokenizer behaviour: attribute *names* are
    lower-cased, values keep their case; first occurrence of a name wins.
    """
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(tag_body):
        name = m.group(1).lower()
        if name.endswith("/"):
            name = name.rstrip("/")
            if not name:
                continue
        val = m.group(2)
        if val is None:
            val = ""
        elif val[:1] in {'"', "'"}:
            val = val[1:-1]
        if name not in attrs:
            attrs[name] = val
    return attrs


def find_script_blocks(html: str, script_type: str = JSONLD_TYPE) -> list[str]:
    """Return the verbatim inner text of every ``<script type=...>`` block.

    Equivalent shape to goquery ``doc.Find("script[type='...']").Text()``
    per element (reference ``acquire.go:240-249``): the attribute value
    match is exact/case-sensitive, the content is the raw bytes between
    the open tag and the next ``</script`` sequence, untouched.  HTML
    comments are skipped the way a real tree parser would skip
    commented-out markup.
    """
    # Blank out comments so commented-out <script> tags aren't matched,
    # while preserving offsets for verbatim slicing.
    scan = html
    for m in _COMMENT_RE.finditer(html):
        scan = scan[: m.start()] + " " * (m.end() - m.start()) + scan[m.end():]

    out: list[str] = []
    pos = 0
    while True:
        m = _SCRIPT_OPEN_RE.search(scan, pos)
        if not m:
            break
        tag_end = scan.find(">", m.end())
        if tag_end == -1:
            break
        tag_body = scan[m.end(): tag_end]
        self_closing = tag_body.rstrip().endswith("/")
        attrs = _parse_attrs(tag_body)
        content_start = tag_end + 1
        if self_closing:
            pos = content_start
            if attrs.get("type") == script_type:
                out.append("")
            continue
        close = _SCRIPT_CLOSE_RE.search(scan, content_start)
        content_end = close.start() if close else len(scan)
        if attrs.get("type") == script_type:
            # slice from the ORIGINAL html: byte-identical contract
            out.append(html[content_start:content_end])
        pos = close.end() if close else len(scan)
    return out


def document_text(html: str) -> str:
    """Whole-document text, the goquery ``doc.Text()`` fallback used when
    the response *is* JSON (reference ``acquire.go:228-237``).

    For a raw JSON body (no markup) net/html yields the body verbatim;
    for markup we strip tags/comments and concatenate character data.
    """
    if "<" not in html:
        return html
    no_comment = _COMMENT_RE.sub("", html)
    return _TAG_RE.sub("", no_comment)


def url_path_is_json(url: str) -> bool:
    """``fileExtensionIsJson`` (reference ``acquire.go:313-319``)."""
    try:
        path = urlparse(url).path
    except ValueError:
        return False
    return path.endswith(".json") or path.endswith(".jsonld")


def extract_jsonld_strings(
    html: str,
    url: str = "",
    content_type: str = "",
) -> list[str]:
    """Full extraction decision tree of ``FindJSONInResponse``
    (reference ``acquire.go:216-252``): JSON content-type or ``.json`` /
    ``.jsonld`` URL suffix → whole body; otherwise every
    ``script[type='application/ld+json']`` block.

    Validity filtering happens downstream (``isValid`` equivalent in the
    normalize stage) so the byte-identity of extraction is testable on
    its own.
    """
    ct = content_type or ""
    if JSONLD_TYPE in ct or "application/json" in ct or url_path_is_json(url):
        return [document_text(html)]
    return find_script_blocks(html)
