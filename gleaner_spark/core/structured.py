"""Microdata and RDFa Lite extraction from raw HTML.

The Go reference harvests ONLY ``<script type="application/ld+json">``
blocks (gleanerio/gleaner ``internal/summoner/acquire/acquire.go:216-252``
— there is no microdata/RDFa path anywhere in the reference tree).  The
north-star input contract for this engine, however, names "microdata/RDFa
from raw HTML" as part of triple extraction, so this module extends the
extraction surface beyond reference parity: schema.org-style HTML
microdata (WHATWG HTML §5.2, the ``itemscope``/``itemtype``/``itemprop``
/``itemid``/``itemref`` model) and RDFa Lite 1.1 (``vocab``/``typeof``/
``property``/``resource``/``prefix``) are parsed into the same
``(subject, predicate, object)`` term shape the JSON-LD mill emits, so
the downstream URDNA/sink/entity-linking stages are shared.

Like ``core/extract.py`` this is a dependency-free scanner (no lxml/bs4
in the container): a small stack-based tree builder over the tag
tokenizer, then two tree walks.  Everything is a pure function wrapped by
a vectorized pandas UDF in ``functions/udfs.py`` — no per-row Python in
the Spark plan.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from .extract import _parse_attrs

__all__ = [
    "parse_html",
    "microdata_triples",
    "rdfa_triples",
    "structured_triples",
    "page_structured",
]

# ---------------------------------------------------------------------------
# minimal HTML tree
# ---------------------------------------------------------------------------

_TAG_TOKEN_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)

# HTML5 void elements: never have children, never need a closer.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
# Raw-text elements: content runs to the matching closer, not parsed.
_RAW_TEXT = {"script", "style"}


@dataclass
class Element:
    tag: str
    attrs: dict[str, str]
    children: list = field(default_factory=list)  # Element | str (text)
    parent: "Element | None" = None

    def iter(self):
        """Pre-order walk including self."""
        yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.iter()

    def text(self) -> str:
        """Concatenated character data of the subtree (tag-stripped,
        whitespace preserved verbatim — same contract as goquery
        ``.Text()`` which the JSON-LD path already mirrors)."""
        parts: list[str] = []
        stack: list = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                parts.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(parts)


def parse_html(html: str) -> Element:
    """Build a forgiving element tree.

    Error handling is the pragmatic subset a streaming harvester needs:
    unknown closers are ignored, unclosed elements are auto-closed at
    EOF, mismatched closers pop to the nearest matching open element
    (or are dropped when none is open).  Comments are removed first;
    script/style content is captured as raw text (no tag parsing inside,
    matching the raw-text scanner in core/extract.py)."""
    html = _COMMENT_RE.sub("", html)
    root = Element("#root", {})
    cur = root
    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_TOKEN_RE.search(html, pos)
        if not m:
            if pos < n:
                cur.children.append(html[pos:])
            break
        if m.start() > pos:
            cur.children.append(html[pos:m.start()])
        closing, tag, body = m.group(1), m.group(2).lower(), m.group(3)
        pos = m.end()
        if closing:
            # pop to the nearest matching open element, if any
            node = cur
            while node is not root and node.tag != tag:
                node = node.parent
            if node is not root:
                cur = node.parent
            continue
        attrs = _parse_attrs(body)
        el = Element(tag, attrs, parent=cur)
        cur.children.append(el)
        self_closing = body.rstrip().endswith("/")
        if tag in _RAW_TEXT and not self_closing:
            close = re.compile(r"</%s" % tag, re.IGNORECASE).search(html, pos)
            end = close.start() if close else n
            if end > pos:
                el.children.append(html[pos:end])
            if close:
                gt = html.find(">", close.end())
                pos = n if gt == -1 else gt + 1
            else:
                pos = n
            continue
        if tag not in _VOID and not self_closing:
            cur = el
    return root


# ---------------------------------------------------------------------------
# term formatting — same surface shape as core/mill.py's n-quads terms
# ---------------------------------------------------------------------------

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _iri(v: str) -> str:
    return "<" + v + ">"


def _lit(v: str) -> str:
    return '"' + v.replace("\\", "\\\\").replace('"', '\\"') \
                  .replace("\n", "\\n").replace("\r", "\\r") \
                  .replace("\t", "\\t") + '"'


# ---------------------------------------------------------------------------
# microdata → triples (WHATWG HTML §5.2 / microdata-to-RDF essentials)
# ---------------------------------------------------------------------------

# value extraction per element kind (WHATWG "property value" table)
_URL_PROP_ATTR = {
    "a": "href", "area": "href", "link": "href",
    "audio": "src", "embed": "src", "iframe": "src", "img": "src",
    "source": "src", "track": "src", "video": "src",
}


def _md_vocab(itemtype: str) -> str:
    """Vocabulary base for unqualified property names: the itemtype IRI
    up to (and including) the last '/' or '#' (the microdata-to-RDF
    note's vocabulary expansion, which for schema.org types yields
    'https://schema.org/')."""
    for sep in ("#", "/"):
        i = itemtype.rfind(sep)
        if i > len("https:/"):
            return itemtype[: i + 1]
    return itemtype


def _md_value(el: Element):
    """(is_iri, value) for a property element WITHOUT itemscope."""
    tag = el.tag
    if tag == "meta":
        return False, el.attrs.get("content", "")
    if tag in ("a", "area", "link"):
        return True, el.attrs.get("href", "")
    if tag in _URL_PROP_ATTR and tag not in ("a", "area", "link"):
        return True, el.attrs.get("src", "")
    if tag == "object":
        return True, el.attrs.get("data", "")
    if tag == "data":
        return False, el.attrs.get("value", el.text())
    if tag == "time":
        return False, el.attrs.get("datetime", el.text())
    return False, el.text()


def _collect_prop_elements(scope: Element, by_id: dict[str, Element]):
    """Property elements of an item: descendants of the itemscope element
    (not crossing nested itemscopes' own descendants) plus the subtrees
    referenced by itemref, in document order."""
    roots: list[Element] = [scope]
    for ref in scope.attrs.get("itemref", "").split():
        tgt = by_id.get(ref)
        if tgt is not None:
            roots.append(tgt)
    out: list[Element] = []
    for root_el in roots:
        # a referenced element may itself carry itemprop
        if root_el is not scope and "itemprop" in root_el.attrs:
            out.append(root_el)
        stack = [c for c in reversed(root_el.children) if isinstance(c, Element)]
        while stack:
            el = stack.pop()
            if "itemprop" in el.attrs:
                out.append(el)
            if "itemscope" not in el.attrs:
                stack.extend(
                    c for c in reversed(el.children) if isinstance(c, Element))
    return out


def microdata_triples(html: str) -> list[tuple[str, str, str]]:
    """Extract (subject, predicate, object) term triples from microdata
    markup.  Blank nodes are labelled ``_:mdN`` in document order of
    their itemscope element; itemid (when an absolute IRI) wins over a
    blank label.  Unqualified itemprop names resolve against the item's
    itemtype vocabulary; absolute-IRI names pass through; items with no
    itemtype contribute only absolute-IRI-named properties (no
    vocabulary to resolve against — dropped, per the microdata-to-RDF
    note's @vocab-less behaviour)."""
    root = parse_html(html)
    by_id: dict[str, Element] = {}
    scopes: list[Element] = []
    for el in root.iter():
        if el.tag == "#root":
            continue
        eid = el.attrs.get("id")
        if eid and eid not in by_id:
            by_id[eid] = el
        if "itemscope" in el.attrs:
            scopes.append(el)
    labels: dict[int, str] = {}
    counter = 0
    for el in scopes:
        itemid = el.attrs.get("itemid", "")
        if itemid and _ABS_IRI_RE.match(itemid):
            labels[id(el)] = _iri(itemid)
        else:
            labels[id(el)] = "_:md%d" % counter
            counter += 1
    triples: list[tuple[str, str, str]] = []
    for el in scopes:
        subj = labels[id(el)]
        types = el.attrs.get("itemtype", "").split()
        vocab = _md_vocab(types[0]) if types else None
        for t in types:
            if _ABS_IRI_RE.match(t):
                triples.append(
                    (subj,
                     "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
                     _iri(t)))
        for pel in _collect_prop_elements(el, by_id):
            names = pel.attrs.get("itemprop", "").split()
            if not names:
                continue
            if "itemscope" in pel.attrs:
                obj = labels[id(pel)]
            else:
                is_iri, raw = _md_value(pel)
                obj = _iri(raw) if is_iri and raw else _lit(raw)
            for name in names:
                if _ABS_IRI_RE.match(name):
                    pred = _iri(name)
                elif vocab is not None:
                    pred = _iri(vocab + name)
                else:
                    continue
                triples.append((subj, pred, obj))
    return triples


# ---------------------------------------------------------------------------
# RDFa Lite 1.1 → triples
# ---------------------------------------------------------------------------

_RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

# RDFa initial context (the handful of prefixes a schema.org harvester
# actually meets; a page's @prefix attribute extends/overrides these).
_INITIAL_PREFIXES = {
    "schema": "https://schema.org/",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "og": "http://ogp.me/ns#",
}

_PREFIX_ATTR_RE = re.compile(r"([^\s:]+):\s+(\S+)")


def _resolve_term(term: str, vocab: str | None,
                  prefixes: dict[str, str]) -> str | None:
    """CURIE / vocab-term / absolute-IRI resolution (RDFa Lite rules)."""
    if not term:
        return None
    if ":" in term:
        pfx, local = term.split(":", 1)
        base = prefixes.get(pfx)
        if base is not None and not local.startswith("//"):
            return base + local
        if _ABS_IRI_RE.match(term):
            return term
        return None
    if vocab:
        return vocab + term
    return None


def _rdfa_resource(attrs: dict[str, str]) -> str | None:
    for a in ("resource", "about", "href", "src"):
        v = attrs.get(a)
        if v and _ABS_IRI_RE.match(v):
            return v
    return None


def rdfa_triples(html: str) -> list[tuple[str, str, str]]:
    """Extract triples from RDFa Lite 1.1 markup: ``vocab``, ``prefix``,
    ``typeof``, ``property``, ``resource``/``about``/``href``/``src``.

    Subject chaining follows the Lite subset: an element with ``typeof``
    starts a new subject (its resource if any, else a fresh ``_:raN``
    blank node); a ``property`` on that same element links the PARENT
    subject to the new one; ``property`` without ``typeof`` emits a
    literal (``content`` attr > resource attrs > text content) against
    the nearest ancestor subject.  ``vocab`` and ``prefix`` inherit down
    the tree and may be overridden mid-tree."""
    root = parse_html(html)
    triples: list[tuple[str, str, str]] = []
    counter = [0]

    def fresh() -> str:
        label = "_:ra%d" % counter[0]
        counter[0] += 1
        return label

    def walk(el: Element, subj: str | None, vocab: str | None,
             prefixes: dict[str, str]):
        for child in el.children:
            if not isinstance(child, Element):
                continue
            a = child.attrs
            v = a.get("vocab", "").strip() or vocab
            p = prefixes
            if "prefix" in a:
                p = dict(prefixes)
                for m in _PREFIX_ATTR_RE.finditer(a["prefix"]):
                    p[m.group(1)] = m.group(2)
            cur = subj
            type_terms = [
                t for t in (
                    _resolve_term(t, v, p)
                    for t in a.get("typeof", "").split())
                if t]
            props = [
                t for t in (
                    _resolve_term(t, v, p)
                    for t in a.get("property", "").split())
                if t]
            if "typeof" in a:
                res = _rdfa_resource(a)
                new_subj = _iri(res) if res else fresh()
                for t in type_terms:
                    triples.append((new_subj, _RDF_TYPE, _iri(t)))
                if props and subj is not None:
                    # chaining: parent --property--> new subject
                    for pr in props:
                        triples.append((subj, _iri(pr), new_subj))
                cur = new_subj
            elif props and subj is not None:
                res = a.get("resource") or a.get("href") or a.get("src")
                if res is not None and _ABS_IRI_RE.match(res):
                    obj = _iri(res)
                elif "content" in a:
                    obj = _lit(a["content"])
                else:
                    obj = _lit(child.text())
                for pr in props:
                    triples.append((subj, _iri(pr), obj))
            walk(child, cur, v, p)

    walk(root, None, None, dict(_INITIAL_PREFIXES))
    return triples


def structured_triples(html: str) -> list[tuple[str, str, str, str]]:
    """Both syntaxes over one page: microdata triples tagged
    ``'microdata'`` then RDFa triples tagged ``'rdfa'``.  One combined
    entry point so the pandas UDF parses the tree once per syntax and
    the Spark plan stays a single projection."""
    out = [(s, p, o, "microdata") for s, p, o in microdata_triples(html)]
    out.extend((s, p, o, "rdfa") for s, p, o in rdfa_triples(html))
    return out


def page_structured(html: str) -> tuple[str, list[tuple[str, str, str, str]]]:
    """Pipeline-facing per-page contract: ``(content_sha, triples)`` with
    blank nodes skolemized the same way the mill skolemizes document
    blanks (``_:b{sha}_{label}``, core/mill.py), so structured triples
    can be unioned into the shared (subject, predicate, object, graph)
    relation without cross-page blank-label collisions.

    The sha is SHA-256 over the sorted pre-skolemization term lines —
    content-addressed exactly like the JSON-LD graph URNs (north rule's
    "SHA-256-of-normalized-document"): two pages carrying identical
    markup map to one graph and the materialize dedup collapses them,
    mirroring the doc-sha dedup on the JSON-LD path."""
    trips = structured_triples(html)
    if not trips:
        return "", []
    lines = sorted(f"{s} {p} {o}" for (s, p, o, _x) in trips)
    sha = hashlib.sha256("\n".join(lines).encode("utf-8")).hexdigest()
    pre = f"_:b{sha}_"

    def sk(term: str) -> str:
        return pre + term[2:] if term.startswith("_:") else term

    return sha, [(sk(s), p, sk(o), x) for (s, p, o, x) in trips]
