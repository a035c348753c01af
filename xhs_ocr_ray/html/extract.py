"""Main-content extraction: density scoring, boilerplate pruning, rendering.

The graft analog of the reference's alpha-mask + OCR + reading-order loop
(SURVEY.md §3 E1): instead of pixels we score DOM nodes by text mass vs link
mass (boilerpipe / Arc90-style), prune navigation chrome, select the deepest
high-scoring container as main content, and render its blocks to deterministic
text:

- one output line per block element (p, h1-h6, li, blockquote, ...);
- ``<pre>`` content preserved verbatim (whitespace intact);
- table rows are one line each, cells joined by TAB, nested-table rows
  emitted after their enclosing row (pre-order);
- inline fragments joined with CJK-aware separators
  (:func:`xhs_ocr_ray.layout.separators.word_separator`) only where source
  whitespace existed — ``foo<b>bar</b>`` stays ``foobar``;
- extracted text = ``"\\n".join(lines) + "\\n"``.

All thresholds are frozen constants: they define the golden bytes that the
pipeline must reproduce byte-identically per url.
"""

from __future__ import annotations

import re

from xhs_ocr_ray.html.fast_parser import parse_html_safe as parse_html
from xhs_ocr_ray.html.parser import Element
from xhs_ocr_ray.layout.separators import is_cjk_char

PRUNE_TAGS = frozenset(
    "script style noscript nav header footer aside form iframe button svg "
    "select template object link meta head title".split()
)
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li blockquote dt dd figcaption caption".split()
)
CONTAINER_TAGS = frozenset("div section article main body td ul ol figure".split())
CANDIDATE_TAGS = frozenset("article main body div section td".split())
INLINE_TAGS = frozenset(
    "a b i em strong span code u s small sub sup mark abbr cite q time label "
    "font big tt var kbd samp ins del".split()
)

_BOILER_CLASS = re.compile(
    r"nav|menu|footer|head(er|line)?-bar|sidebar|side-bar|\bads?\b|advert|banner"
    r"|breadcrumb|promo|share|social|related|recommend|copyright|cookie|comment",
    re.IGNORECASE,
)
_WS = re.compile(r"\s+")

# Candidate-selection constants (frozen).
SCORE_KEEP_RATIO = 0.9
LINK_DENSITY_DROP = 0.66
SHORT_LINK_BLOCK = 40


def _is_pruned(el: Element) -> bool:
    if el.tag in PRUNE_TAGS:
        return True
    if not el.attrs:  # fast path: most elements carry no class/id at all
        return False
    if el.tag in ("article", "main", "body"):
        return False
    marker = el.attr("class") + " " + el.attr("id")
    return bool(marker.strip()) and bool(_BOILER_CLASS.search(marker))


class _InlineAssembler:
    """Builds one or more lines from an inline run, tracking anchor chars."""

    def __init__(self) -> None:
        self.lines: list[str] = []
        self.cur: list[str] = []
        self.cur_last = ""  # last char of current line
        self.pending_ws = False
        self.chars = 0
        self.link_chars = 0

    def word(self, w: str, in_link: bool) -> None:
        if not w:
            return
        if self.cur_last:
            if self.pending_ws:
                # Source whitespace is authoritative in HTML: it collapses to
                # one space, except between CJK-family chars where markup
                # whitespace is spurious (word_separator's CJK rule). The
                # punctuation/hyphen rules apply only on the OCR/layout path,
                # where whitespace is unreliable.
                if is_cjk_char(self.cur_last) and is_cjk_char(w[0]):
                    sep = ""
                else:
                    sep = " "
            else:
                sep = ""
            if sep:
                self.cur.append(sep)
        self.cur.append(w)
        self.cur_last = w[-1]
        self.pending_ws = False
        self.chars += len(w)
        if in_link:
            self.link_chars += len(w)

    def text(self, data: str, in_link: bool) -> None:
        if not data:
            return
        if data[0].isspace() and self.cur_last:
            self.pending_ws = True
        for w in _WS.split(data):
            if w:
                self.word(w, in_link)
            else:
                continue
            self.pending_ws = True
        if not data[-1].isspace():
            self.pending_ws = False

    def br(self) -> None:
        self.flush_line()

    def flush_line(self) -> None:
        if self.cur:
            self.lines.append("".join(self.cur))
        self.cur = []
        self.cur_last = ""
        self.pending_ws = False

    def finish(self) -> list[str]:
        self.flush_line()
        return self.lines


def _assemble_inline(el: Element, asm: _InlineAssembler, in_link: bool,
                     skip_tables: bool) -> None:
    for ch in el.children:
        if isinstance(ch, str):
            asm.text(ch, in_link)
        elif ch.tag == "br":
            asm.br()
        elif ch.tag == "table" and skip_tables:
            continue
        elif _is_pruned(ch):
            continue
        else:
            _assemble_inline(ch, asm, in_link or ch.tag == "a", skip_tables)


def _inline_lines(el: Element, skip_tables: bool = False) -> tuple[list[str], int, int]:
    asm = _InlineAssembler()
    _assemble_inline(el, asm, el.tag == "a", skip_tables)
    lines = asm.finish()
    return lines, asm.chars, asm.link_chars


def _pre_text(el: Element) -> str:
    """Verbatim text of a <pre> subtree, skipping PRUNE_TAGS descendants
    (text_content() would leak nested script/style bodies into output)."""
    parts: list[str] = []

    def walk(e: Element) -> None:
        for ch in e.children:
            if isinstance(ch, str):
                parts.append(ch)
            elif ch.tag not in PRUNE_TAGS:
                walk(ch)

    walk(el)
    return "".join(parts)


def _pre_lines(el: Element) -> list[str]:
    raw = _pre_text(el).replace("\r\n", "\n").replace("\r", "\n")
    raw = raw.strip("\n")
    return raw.split("\n") if raw else []


def _table_lines(table: Element, out: list[str]) -> None:
    """One line per <tr> (pre-order over nested tables), cells TAB-joined."""
    for el in table.iter_elements():
        if el.tag != "tr" or _is_pruned(el):
            continue
        cells: list[str] = []
        for ch in el.children:
            if isinstance(ch, Element) and ch.tag in ("td", "th") and not _is_pruned(ch):
                lines, _, _ = _inline_lines(ch, skip_tables=True)
                cells.append(" ".join(lines))
        if any(c for c in cells):
            out.append("\t".join(cells))


def _emit_block(el: Element, out: list[str]) -> None:
    lines, chars, link_chars = _inline_lines(el)
    if not lines:
        return
    if chars and link_chars / chars > LINK_DENSITY_DROP and chars < SHORT_LINK_BLOCK:
        return  # link-crumb block (nav remnants)
    out.extend(lines)


def _render_container(el: Element, out: list[str]) -> None:
    inline_run: list[Element | str] = []

    def flush_run() -> None:
        if not inline_run:
            return
        holder = Element("#run", {}, el)
        holder.children = list(inline_run)
        inline_run.clear()
        _emit_block(holder, out)

    for ch in el.children:
        if isinstance(ch, str):
            # Whitespace-only nodes matter *inside* a run (they separate
            # adjacent inline elements) but must not start one.
            if ch.strip() or inline_run:
                inline_run.append(ch)
            continue
        if _is_pruned(ch):
            continue
        if ch.tag in INLINE_TAGS or ch.tag == "br":
            inline_run.append(ch)
        elif ch.tag == "pre":
            flush_run()
            out.extend(_pre_lines(ch))
        elif ch.tag == "table":
            flush_run()
            _table_lines(ch, out)
        elif ch.tag in BLOCK_TAGS:
            flush_run()
            _emit_block(ch, out)
        else:
            flush_run()
            _render_container(ch, out)
    flush_run()


def _text_stats(el: Element, memo: dict[int, tuple[int, int]], in_link: bool = False
                ) -> tuple[int, int]:
    """(text_chars, link_chars) of the non-pruned subtree, memoized by id."""
    key = id(el)
    if key in memo:
        return memo[key]
    chars = link = 0
    for ch in el.children:
        if isinstance(ch, str):
            n = len(_WS.sub("", ch))
            chars += n
            if in_link:
                link += n
        elif not _is_pruned(ch):
            c, l = _text_stats(ch, memo, in_link or ch.tag == "a")
            chars += c
            link += l
    memo[key] = (chars, link)
    return memo[key]


def select_main(root: Element) -> Element | None:
    """Deepest candidate whose content score is within SCORE_KEEP_RATIO of
    the best. Score = text chars minus link chars (boilerpipe-flavored)."""
    memo: dict[int, tuple[int, int]] = {}
    scored: list[tuple[float, int, int, Element]] = []  # (score, depth, order, el)
    order = 0
    stack: list[tuple[Element, int]] = [(root, 0)]
    while stack:
        el, depth = stack.pop()
        order += 1
        # "#document" as candidate = fallback for fragment pages without a
        # body/container element (depth 0, so real containers win the
        # deepest-eligible rule whenever they exist).
        if (el.tag in CANDIDATE_TAGS or el.tag == "#document") and not _is_pruned(el):
            chars, link = _text_stats(el, memo)
            score = float(chars - link)
            if el.tag in ("article", "main"):
                score *= 1.2
            if score > 0:
                scored.append((score, depth, order, el))
        for ch in reversed(el.children):
            if isinstance(ch, Element) and not _is_pruned(ch):
                stack.append((ch, depth + 1))
    if not scored:
        return None
    best = max(s for s, _, _, _ in scored)
    eligible = [t for t in scored if t[0] >= SCORE_KEEP_RATIO * best]
    eligible.sort(key=lambda t: (-t[1], t[2]))  # deepest, then document order
    return eligible[0][3]


def extract_main_text(html: bytes | str) -> str | None:
    """Extract main-content text from HTML; ``None`` when nothing extractable.

    Returns ``"\\n".join(lines) + "\\n"`` — the byte-exact contract verified
    by the golden tests.
    """
    root = parse_html(html)
    main = select_main(root)
    if main is None:
        return None
    lines: list[str] = []
    _render_container(main, lines)
    if not lines:
        return None
    return "\n".join(lines) + "\n"
