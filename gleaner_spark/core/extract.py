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

import json
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


def _iter_script_blocks(html: str):
    """Yield ``(attrs, content)`` for every non-commented ``<script>``
    element, content sliced verbatim from the ORIGINAL html (self-closing
    tags yield ``""``).  Shared scanner under both the typed extraction
    (:func:`find_script_blocks`) and the JS-inline recovery
    (:func:`find_inline_jsonld`)."""
    # Blank out comments so commented-out <script> tags aren't matched,
    # while preserving offsets for verbatim slicing.
    scan = html
    for m in _COMMENT_RE.finditer(html):
        scan = scan[: m.start()] + " " * (m.end() - m.start()) + scan[m.end():]

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
            yield attrs, ""
            continue
        close = _SCRIPT_CLOSE_RE.search(scan, content_start)
        content_end = close.start() if close else len(scan)
        yield attrs, html[content_start:content_end]
        pos = close.end() if close else len(scan)


def find_script_blocks(html: str, script_type: str = JSONLD_TYPE) -> list[str]:
    """Return the verbatim inner text of every ``<script type=...>`` block.

    Equivalent shape to goquery ``doc.Find("script[type='...']").Text()``
    per element (reference ``acquire.go:240-249``): the attribute value
    match is exact/case-sensitive, the content is the raw bytes between
    the open tag and the next ``</script`` sequence, untouched.  HTML
    comments are skipped the way a real tree parser would skip
    commented-out markup.
    """
    return [
        content
        for attrs, content in _iter_script_blocks(html)
        if attrs.get("type") == script_type
    ]


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


# ---------------------------------------------------------------------------
# JS-inline JSON-LD recovery (S5 headless-gap fallback)
#
# The reference reaches script-injected JSON-LD only by rendering the page
# in headless Chrome and polling the DOM
# (``internal/summoner/acquire/headlessNG.go:302-349`` — injected JS that
# querySelectorAlls 'script[type="application/ld+json"]' after the page's
# own scripts ran).  Without a browser we can still recover the common
# static shapes: a JSON-LD object literal assigned in plain JS
# (``var x = {"@context": ...};``), a JSON.parse('...') payload, and a
# whole <script type="application/ld+json"> tag built inside a JS string
# (insertAdjacentHTML / document.write) — including the tag/payload
# CONCATENATED from several ``+``-joined literals with a split
# ``'</scr' + 'ipt>'`` closer.  Anything that requires actually
# executing JS (fetch + DOM insert, computed objects) stays a measured
# gap — see operators/stats.py headless counters.
# ---------------------------------------------------------------------------

_JS_ESC_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|x[0-9a-fA-F]{2}|.)", re.DOTALL)

_JS_ESC_MAP = {"n": "\n", "t": "\t", "r": "\r", "b": "\b",
               "f": "\f", "v": "\v", "0": "\0"}


def _js_unescape(s: str) -> str:
    """Minimal JS string-literal unescape (\\" \\' \\/ \\\\ \\n \\uXXXX…)."""

    def rep(m):
        e = m.group(1)
        if e[0] == "u":
            return chr(int(e[1:], 16))
        if e[0] == "x":
            return chr(int(e[1:], 16))
        return _JS_ESC_MAP.get(e, e)

    return _JS_ESC_RE.sub(rep, s)


def _skip_ws_comments(text: str, i: int) -> int:
    """Index of the next token after whitespace and ``//``/``/* */``
    comments starting at ``i``."""
    n = len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "/" and i + 1 < n:
            if text[i + 1] == "/":
                j = text.find("\n", i)
                i = n if j == -1 else j + 1
                continue
            if text[i + 1] == "*":
                j = text.find("*/", i + 2)
                i = n if j == -1 else j + 2
                continue
        break
    return i


_IDENT_RE = re.compile(r"[A-Za-z_$][\w$]*")

#: ``${name}`` template-literal interpolation of a bare identifier —
#: anything more complex is left verbatim (json.loads then rejects it:
#: a missed recovery, never a wrong one)
_TPL_RE = re.compile(r"\$\{\s*([A-Za-z_$][\w$]*)\s*\}")

_ASSIGN_RE = re.compile(r"\b(?:var|let|const)\s+([A-Za-z_$][\w$]*)\s*=")


def _read_string_group(text: str, i: int, names: dict[str, str] | None):
    """Read a string CONCATENATION GROUP starting at the quote at ``i``:
    adjacent terms joined by ``+`` (whitespace/comments between), where
    a term is a string literal OR — when ``names`` resolves it — a
    single-assignment string variable.  ``${name}`` interpolations in
    template literals substitute resolved names.  Returns
    ``(joined, resume_index)``; an unresolvable term ends the group
    BEFORE it (emitting what was joined so far — the downstream
    json.loads validation means a truncated group is a missed recovery,
    never a silently-wrong one)."""
    n = len(text)
    parts: list[str] = []
    pos = i
    while True:
        c0 = text[pos] if pos < n else ""
        if c0 in ('"', "'", "`"):
            q = c0
            ii = pos + 1
            start = ii
            while ii < n:
                if text[ii] == "\\":
                    ii += 2
                    continue
                if text[ii] == q:
                    break
                ii += 1
            raw = text[start:ii]
            if q == "`" and names:
                raw = _TPL_RE.sub(
                    lambda m: names.get(m.group(1), m.group(0)), raw
                )
            parts.append(raw)
            pos = ii + 1  # past the closing quote
        else:
            m = _IDENT_RE.match(text, pos)
            if m and names and m.group(0) in names:
                parts.append(names[m.group(0)])
                pos = m.end()
            else:
                break  # unresolvable term: group ends before it
        j = _skip_ws_comments(text, pos)
        if j < n and text[j] == "+":
            k = _skip_ws_comments(text, j + 1)
            if k < n:
                pos = k
                continue
        break
    return "".join(parts), pos


def _single_assign_strings(text: str) -> dict[str, str]:
    """NAME → joined string value for every ``var/let/const NAME =
    <string-literal group>`` whose NAME is (re)assigned exactly once in
    the script — the static single-assignment subset a rendered DOM
    would see regardless of execution order.  One level only: a value
    may not reference another variable."""
    out: dict[str, str] = {}
    for m in _ASSIGN_RE.finditer(text):
        name = m.group(1)
        i = _skip_ws_comments(text, m.end())
        if i >= len(text) or text[i] not in ('"', "'", "`"):
            out.pop(name, None)     # declared non-string: never resolve
            continue
        val, _end = _read_string_group(text, i, None)
        # any second write (including +=, -=, …) makes the final value
        # execution-dependent — drop it
        writes = len(re.findall(
            rf"\b{re.escape(name)}\s*[+\-*/]?=(?!=)", text))
        if writes == 1 and name not in out:
            out[name] = val
        else:
            out.pop(name, None)
    return out


def _brace_spans_and_strings(text: str, names: dict[str, str] | None = None):
    """One pass over JS source: balanced ``{...}`` spans OUTSIDE string
    literals and comments, plus the raw contents of every string
    CONCATENATION GROUP — adjacent literals joined only by ``+`` (and
    whitespace/comments) are returned as one joined string, the shape
    ``document.write('<script…>' + '{"@context"…' + '…}</scr' +
    'ipt>')`` pages use to dodge naive scanners (headlessNG.go's
    rendered DOM sees them joined; a single literal is a group of one).
    With ``names`` (see :func:`_single_assign_strings`) a group term may
    also be a resolved variable, and template literals substitute
    ``${name}``.  Regex literals are not tracked (a ``/…{…/`` regex
    could unbalance a span — the json.loads validation downstream
    rejects any resulting garbage, so the failure mode is a missed
    recovery, not a wrong one)."""
    spans: list[tuple[int, int]] = []
    strings: list[str] = []
    stack: list[int] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in ('"', "'", "`"):
            joined, i = _read_string_group(text, i, names)
            strings.append(joined)
            continue
        if c == "/" and i + 1 < n:
            if text[i + 1] == "/":
                j = text.find("\n", i)
                i = n if j == -1 else j + 1
                continue
            if text[i + 1] == "*":
                j = text.find("*/", i + 2)
                i = n if j == -1 else j + 2
                continue
        if c == "{":
            stack.append(i)
        elif c == "}" and stack:
            p = stack.pop()
            spans.append((p, i + 1))
        i += 1
    # preorder: parents before children so acceptance is top-down
    spans.sort(key=lambda s: (s[0], -s[1]))
    return spans, strings


def _looks_jsonld(v) -> bool:
    return isinstance(v, dict) and (
        "@context" in v or "@type" in v or "@graph" in v
    )


def _scan_js_candidates(text: str, out: list[str], seen: set[str],
                        budget: list[int], max_span: int,
                        depth: int = 0) -> None:
    if depth > 2 or budget[0] <= 0:
        return
    marker = ('"@context"' in text or '"@type"' in text
              or JSONLD_TYPE in text)
    if not marker:
        return
    spans, strings = _brace_spans_and_strings(
        text, _single_assign_strings(text)
    )
    accepted: list[tuple[int, int]] = []
    for a, b in spans:
        if any(a >= x and b <= y for x, y in accepted):
            continue  # inside an already-recovered document
        frag = text[a:b]
        if len(frag) > max_span or (
            '"@context"' not in frag and '"@type"' not in frag
        ):
            continue
        if budget[0] <= 0:
            break
        budget[0] -= 1
        try:
            v = json.loads(frag)
        except ValueError:
            continue  # JS code block, not a JSON literal — try children
        if _looks_jsonld(v):
            accepted.append((a, b))
            # dedup on the PARSED document, not the raw text: the same
            # JSON-LD often appears once as an object literal and again
            # as a differently-whitespaced string payload on one page
            key = json.dumps(v, sort_keys=True, separators=(",", ":"))
            if key not in seen:
                seen.add(key)
                out.append(frag)
    # string-literal payloads: a whole ld+json <script> tag built in JS,
    # or a JSON.parse('{"@context": ...}') argument
    for s in strings:
        if JSONLD_TYPE in s:
            u = _js_unescape(s)
            for blk in find_script_blocks(u):
                if budget[0] <= 0:
                    return
                budget[0] -= 1
                try:
                    v = json.loads(blk)
                except ValueError:
                    continue
                if _looks_jsonld(v):
                    key = json.dumps(v, sort_keys=True,
                                     separators=(",", ":"))
                    if key not in seen:
                        seen.add(key)
                        out.append(blk)
        elif '"@context"' in s or '"@type"' in s:
            _scan_js_candidates(_js_unescape(s), out, seen, budget,
                                max_span, depth + 1)


def find_inline_jsonld(
    html: str,
    max_parse_attempts: int = 64,
    max_span_bytes: int = 1 << 20,
) -> list[str]:
    """Conservatively recover JSON-LD embedded in PLAIN ``<script>``
    code (no ``type="application/ld+json"``), in document order.

    A candidate is accepted only if it parses as strict JSON *and* is an
    object carrying ``@context`` / ``@type`` / ``@graph`` — so arbitrary
    JS object literals and the reference's commented-out decoys never
    leak through.  Budgets bound worst-case work on adversarial pages:
    at most ``max_parse_attempts`` json.loads calls and ``max_span_bytes``
    per candidate.  Returns verbatim JSON substrings (deduplicated,
    document order) ready for the same normalize/mill path as statically
    extracted blocks."""
    out: list[str] = []
    seen: set[str] = set()
    budget = [max_parse_attempts]
    for attrs, content in _iter_script_blocks(html):
        if attrs.get("type") == JSONLD_TYPE or not content:
            continue
        _scan_js_candidates(content, out, seen, budget, max_span_bytes)
        if budget[0] <= 0:
            break
    return out
