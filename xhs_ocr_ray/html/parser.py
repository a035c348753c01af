"""Tolerant HTML → element-tree parser on stdlib ``html.parser``.

lxml is not available in this environment, so we build a small, deterministic
DOM: elements with ``tag``, ``attrs``, ``children`` (elements and text
strings). Unmatched end tags are ignored; unclosed elements are closed when an
ancestor closes; void elements never take children. Entity refs are decoded by
``HTMLParser(convert_charrefs=True)``.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
MAX_DEPTH = 256
# Tags that implicitly close an open element of the same tag (tolerance for
# common unclosed-markup patterns in crawled HTML).
_SELF_NESTING_CLOSERS = frozenset(("p", "li", "tr", "td", "th", "option"))


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | str] = []
        self.parent = parent

    def attr(self, name: str) -> str:
        return self.attrs.get(name) or ""

    def iter_elements(self):
        """Pre-order element traversal including self."""
        yield self
        for ch in self.children:
            if isinstance(ch, Element):
                yield from ch.iter_elements()

    def text_content(self) -> str:
        parts: list[str] = []
        for ch in self.children:
            if isinstance(ch, str):
                parts.append(ch)
            else:
                parts.append(ch.text_content())
        return "".join(parts)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.tag} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None)
        self.stack: list[Element] = [self.root]

    # -- helpers ---------------------------------------------------------
    def _open(self) -> Element:
        return self.stack[-1]

    # -- HTMLParser hooks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]):
        tag = tag.lower()
        if tag in _SELF_NESTING_CLOSERS and self._open().tag == tag:
            self.stack.pop()
        el = Element(tag, {k: (v or "") for k, v in attrs}, self._open())
        self._open().children.append(el)
        # MAX_DEPTH bounds the tree depth so hostile deeply-nested pages
        # can't blow the recursion limit downstream; deeper elements attach
        # flat (content is kept, structure degrades gracefully).
        if tag not in VOID_TAGS and len(self.stack) < MAX_DEPTH:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]):
        tag = tag.lower()
        el = Element(tag, {k: (v or "") for k, v in attrs}, self._open())
        self._open().children.append(el)

    def handle_endtag(self, tag: str):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # Unmatched end tag: ignore.

    def handle_data(self, data: str):
        if data:
            self._open().children.append(data)


def parse_html(html: bytes | str) -> Element:
    """Parse HTML into an element tree; never raises on malformed markup.

    Bytes are decoded as UTF-8 with replacement (Common-Crawl reality:
    charset sniffing is out of scope; our corpus is UTF-8).
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass  # keep whatever tree was built — row-level tolerance
    return builder.root
