"""Fast HTML tokenizer → same Element tree as ``xhs_ocr_ray.html.parser``.

One compiled regex tokenizes tags/comments/doctype; attributes are parsed
lazily (only when the tag carries any); entities are decoded only when an
``&`` is present. Produces byte-identical extraction results to the stdlib
parser (asserted by tests over the golden corpus and the synthetic pages) at
roughly 3× the speed — this is the hot 60% of per-document extraction cost.

Tolerance rules mirror parser.py exactly: unmatched end tags ignored,
unclosed elements closed by ancestors, void elements childless, self-nesting
tags (p/li/tr/td/th/option) implicitly closed, depth capped at MAX_DEPTH,
script/style consume raw text to their closing tag.
"""

from __future__ import annotations

import html as html_mod
import re

from xhs_ocr_ray.html.parser import (
    MAX_DEPTH,
    VOID_TAGS,
    Element,
    _SELF_NESTING_CLOSERS,
)

_TOKEN = re.compile(
    r"<!--.*?(?:-->|$)"                       # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"             # cdata
    r"|<![^>]*>"                              # doctype / other decls
    r"|<\?[^>]*>"                             # processing instruction
    r"|</\s*([a-zA-Z][-\w.:]*)[^>]*>"          # end tag      (group 1)
    # start tag (2,3,4) — the attr body gulps RUNS of unquoted chars via an
    # UNROLLED loop, normal*(special normal*)*: iteration boundaries are
    # unambiguous (every special starts with a quote, normal runs can't
    # contain one), so a truncated tag with no closing > fails in linear
    # time. The naive (?:[^'\">]+|\"...\"|'...')* form nests + inside * and
    # backtracks exponentially on exactly that input (a hang, unlike an
    # exception, is never quarantined by the row-tolerance wrapper).
    r"|<([a-zA-Z][-\w.:]*)([^'\">]*(?:(?:\"[^\"]*\"|'[^']*')[^'\">]*)*)(/?)>",
    re.DOTALL,
)
_ATTR = re.compile(
    r"([a-zA-Z][-\w.:]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)
# The extractor only ever reads class and id (pruning + span-mask
# selectors); parsing just those two is ~5x cheaper than a full attr scan.
# (?<![-\w]) — NOT \b — so data-class= / item-id= never match as class/id.
_CLASS_ATTR = re.compile(r"""(?<![-\w])class\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)""", re.IGNORECASE)
_ID_ATTR = re.compile(r"""(?<![-\w])id\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)""", re.IGNORECASE)
_RAW_END = {
    "script": re.compile(r"</script[^>]*>", re.IGNORECASE),
    "style": re.compile(r"</style[^>]*>", re.IGNORECASE),
}


def _parse_attrs(raw: str) -> dict[str, str]:
    """Full attribute parse (used only by callers needing every attr)."""
    attrs: dict[str, str] = {}
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        if name in attrs:
            continue
        val = m.group(2) or ""
        if val[:1] in ("'", '"'):
            val = val[1:-1]
        if "&" in val:
            val = html_mod.unescape(val)
        attrs[name] = val
    return attrs


def _parse_class_id(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for key, pat in (("class", _CLASS_ATTR), ("id", _ID_ATTR)):
        m = pat.search(raw)
        if m:
            val = m.group(1)
            if val[:1] in ("'", '"'):
                val = val[1:-1]
            if "&" in val:
                val = html_mod.unescape(val)
            attrs[key] = val
    return attrs


def fast_parse_html(html: bytes | str) -> Element:
    """Drop-in replacement for :func:`xhs_ocr_ray.html.parser.parse_html`."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    root = Element("#document", {}, None)
    stack: list[Element] = [root]
    pos = 0
    n = len(html)
    # hot-loop locals: ~560 tokens/doc × 10^12 docs — attribute lookups in
    # this loop are measurable (profiled; see tests/test_fast_parser.py for
    # the byte-equivalence guard)
    search = _TOKEN.search
    unescape = html_mod.unescape
    top = root
    while pos < n:
        m = search(html, pos)
        if m is None:
            text = html[pos:]
            if text:
                if "&" in text:
                    text = unescape(text)
                top.children.append(text)
            break
        start = m.start()
        if start > pos:
            text = html[pos:start]
            if "&" in text:
                text = unescape(text)
            top.children.append(text)
        pos = m.end()
        end_tag, start_tag, attr_raw, self_close = m.group(1, 2, 3, 4)
        if not self_close and attr_raw:
            # The greedy attr group eats a trailing "/": it marks
            # self-closing only when preceded by a quote/whitespace/nothing
            # (stdlib semantics — an unquoted value like href=x/ keeps it).
            ar = attr_raw.rstrip()
            if ar.endswith("/") and ar[-2:-1] in ('"', "'", "", " ", "\t"):
                self_close = "/"
                attr_raw = ar[:-1]
        if end_tag is not None:
            tag = end_tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    top = stack[-1]
                    break
        elif start_tag is not None:
            tag = start_tag.lower()
            if tag in _SELF_NESTING_CLOSERS and top.tag == tag:
                stack.pop()
                top = stack[-1]
            if attr_raw and ("class" in attr_raw or "id" in attr_raw):
                attrs = _parse_class_id(attr_raw)
            else:
                attrs = {}
            el = Element(tag, attrs, top)
            top.children.append(el)
            if tag in _RAW_END and not self_close:
                # Raw-text element: consume to the closing tag verbatim.
                # (A self-closed <script/> has no raw content — consuming
                # would swallow the rest of the document.)
                rm = _RAW_END[tag].search(html, pos)
                if rm is None:
                    # Unterminated raw-text element: stdlib HTMLParser stays
                    # in CDATA mode and DROPS the tail — mirror that (never
                    # leak raw markup into extraction, e.g. inside <pre>).
                    pos = n
                else:
                    if rm.start() > pos:
                        el.children.append(html[pos : rm.start()])
                    pos = rm.end()
            elif not self_close and tag not in VOID_TAGS and len(stack) < MAX_DEPTH:
                stack.append(el)
                top = el
        # else: comment/doctype/PI — dropped
    return root


def parse_html_safe(html: bytes | str) -> Element:
    """Fast parse with stdlib fallback on any internal error (tolerance
    guarantee: never raise on malformed markup)."""
    try:
        return fast_parse_html(html)
    except Exception:
        from xhs_ocr_ray.html.parser import parse_html

        return parse_html(html)
