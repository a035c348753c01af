"""Hand-written golden fixture corpus (FIXTURES.md §1 golden cases).

Each case is ``(url, html_payload)``; expected extracted bytes are frozen in
``goldens/{key}.txt`` (key = last url path segment). The masked-span case uses
the profile library below, whose first profile deliberately fails the field
cardinality check so the fallback profile must fire (the reference's
mask-fallback loop, core/run.py:377-501).
"""

from __future__ import annotations

import json

from xhs_ocr_ray.profiles import Profile, ProfileLibrary
from xhs_ocr_ray.sources.pages import BASE_TS_US, DAY_US

_BOILERPLATE_HTML = """
<html><head><title>Boilerplate case</title></head><body>
<header class="site-header"><nav><a href="/">Home</a> <a href="/x">More</a></nav></header>
<div class="ad-banner">Subscribe now <a href="/sub">here</a>!</div>
<div id="page">
  <article>
    <h1>The Actual Headline</h1>
    <p>This is the first paragraph of the main article body, which carries
    the real content that an extractor must keep.</p>
    <p>A second paragraph with a <a href="/ref">reference link</a> inside
    keeps flowing as ordinary prose.</p>
  </article>
  <aside class="sidebar"><ul><li><a href="/t/1">Trending one</a></li>
  <li><a href="/t/2">Trending two</a></li></ul></aside>
</div>
<footer><p>© 2024 Example <a href="/terms">Terms</a></p></footer>
</body></html>
"""

_NESTED_TABLES_HTML = """
<html><body><article>
<h1>Quarterly results</h1>
<table>
  <tr><th>Region</th><th>Detail</th></tr>
  <tr><td>North</td><td>
    <table>
      <tr><td>Q1</td><td>100</td></tr>
      <tr><td>Q2</td><td>110</td></tr>
    </table>
  </td></tr>
  <tr><td>South</td><td>flat</td></tr>
</table>
<p>Numbers are unaudited.</p>
</article></body></html>
"""

_CJK_HTML = """
<html><body><article>
<h1>中文标题与<span>内联</span>片段</h1>
<p>这是第一段<b>中文</b>文本，片段之间 不应有空格。</p>
<p>Latin words <span>stay</span> spaced, 但中文 紧凑。</p>
<p>日本語の<span>テキスト</span>も同様です。한국어 텍스트도 붙습니다。</p>
<p>Mixed 中文 and English 保持 correct spacing rules.</p>
</article></body></html>
"""

_MASKED_SPAN_HTML = """
<html><body>
<div class="metrics-panel">
  <div class="metric"><span class="label">views</span> <span class="value">1024</span></div>
  <div class="metric"><span class="label">likes</span> <span class="value">55</span></div>
  <div class="metric"><span class="label">shares</span> <span class="value">7</span></div>
</div>
<div class="chatter"><p>Unrelated page chatter that profile 1 would wrongly
capture, and which has no numeric metrics at all.</p></div>
</body></html>
"""

_PARAGRAPHS_HTML = """
<html><body><article>
<h2>A heading line</h2>
<p>First paragraph sentence one. Sentence two continues the thought and
wraps onto another source line.</p>
<p>Second paragraph is short.</p>
<h2>Another heading</h2>
<p>Closing paragraph after the second heading.</p>
</article></body></html>
"""

_CODE_BLOCK_HTML = """
<html><body><article>
<h1>Install guide</h1>
<p>Run the following:</p>
<pre>def main():
    if ready:
        launch()   # fire
    return 0</pre>
<p>Then restart the service.</p>
</article></body></html>
"""

_EMPTY_HTML = "<html><body><div>   </div></body></html>"


def _pdf_basic() -> bytes:
    """Two-page PDF exercising the operator surface: Tm/Td/TD/T* positioning,
    Tj / ' / TJ text ops, literal escapes (parens, backslash, octal), a hex
    string, paragraph-merge geometry, and one raw + one Flate stream."""
    from xhs_ocr_ray.pdf.writer import build_pdf

    page1 = (
        b"BT /F1 12 Tf\n"
        b"1 0 0 1 72 720 Tm (A PDF heading line) Tj\n"
        # two-line paragraph: tight leading via TD then ' (next-line + show)
        b"1 0 0 1 72 680 Tm 0 -14 TD (First paragraph starts here and) Tj\n"
        b"(continues on a second line.) '\n"
        # separate paragraph after a big gap; octal + paren escapes
        b"1 0 0 1 72 600 Tm (Escapes: \\(parens\\), back\\\\slash, \\101BC octal.) Tj\n"
        # TJ array with kerning numbers + hex string
        b"1 0 0 1 72 560 Tm [(Kerned ) -20 (array ) -20 (text.)] TJ\n"
        b"1 0 0 1 72 520 Tm <48657820737472696E672E> Tj\n"
        b"ET"
    )
    page2 = (
        b"BT /F1 12 Tf\n"
        b"1 0 0 1 72 720 Tm (Second page begins.) Tj\n"
        b"1 0 0 1 72 680 Tm (And ends the document.) Tj\n"
        b"ET"
    )
    return build_pdf([page1, page2], compress=[True, False])


def _pdf_cjk() -> bytes:
    """Identity-H composite-font PDF (CID hex strings + ToUnicode CMap) —
    the structure of real CJK PDFs; extraction must round-trip the unicode
    through the CMap and the layout parsers."""
    from xhs_ocr_ray.pdf.writer import build_cjk_text_pdf

    return build_cjk_text_pdf(
        [
            "中文文档的标题行",
            "这是第一段正文，通过 Identity-H 复合字体编码。",
            "日本語の段落もそのまま抽出されます。",
            "Mixed 中英 paragraph keeps every character.",
        ]
    )


def _layout_two_column() -> bytes:
    """A two-column layout payload: reading order must finish the left column
    before the right column (gap-tree semantics)."""
    left = ["Left column line one", "continues on line two", "and ends here."]
    right = ["Right column starts", "with its own flow", "read after the left."]
    blocks = []
    y = 10.0
    for txt in left:
        blocks.append({"box": [[10, y], [200, y], [200, y + 12], [10, y + 12]],
                       "score": 0.9, "text": txt})
        y += 14.0
    y = 10.0
    for txt in right:
        blocks.append({"box": [[260, y], [450, y], [450, y + 12], [260, y + 12]],
                       "score": 0.9, "text": txt})
        y += 14.0
    return b"%LAYOUT1\n" + json.dumps({"parser": "multi_para", "blocks": blocks}).encode()


GOLDEN_PROFILES = ProfileLibrary()
# Profile 1 for the metrics doc_class: expects FOUR numeric fields → fails on
# three-metric pages, forcing fallback to profile 2 (three fields).
GOLDEN_PROFILES.add(
    Profile(
        doc_class="metrics",
        profile_id=1,
        keep_selectors=("div.metrics-panel",),
        field_names=("views", "likes", "shares", "comments"),
        field_regexes=(
            r"^views (\d+)$", r"^likes (\d+)$", r"^shares (\d+)$", r"^comments (\d+)$",
        ),
    )
)
GOLDEN_PROFILES.add(
    Profile(
        doc_class="metrics",
        profile_id=2,
        keep_selectors=("div.metrics-panel",),
        field_names=("views", "likes", "shares"),
        field_regexes=(r"^views (\d+)$", r"^likes (\d+)$", r"^shares (\d+)$"),
    )
)


def golden_corpus() -> list[dict]:
    """Rows (pages schema) for every golden case; keys are url tail segments."""
    cases: list[tuple[str, bytes]] = [
        ("boilerplate", _BOILERPLATE_HTML.encode()),
        ("nested-tables", _NESTED_TABLES_HTML.encode()),
        ("cjk", _CJK_HTML.encode()),
        ("masked-span", _MASKED_SPAN_HTML.encode()),
        ("paragraphs", _PARAGRAPHS_HTML.encode()),
        ("code-block", _CODE_BLOCK_HTML.encode()),
        ("two-column-layout", _layout_two_column()),
        ("pdf-basic", _pdf_basic()),
        ("pdf-cjk", _pdf_cjk()),
        ("pdf-broken", b"%PDF-1.7\nfake"),
        ("empty", _EMPTY_HTML.encode()),
    ]
    rows = []
    for i, (key, payload) in enumerate(cases):
        doc_class = "metrics" if key == "masked-span" else "golden"
        rows.append(
            {
                "url": f"https://golden.example.com/{doc_class}/{key}",
                "warc_ts": BASE_TS_US + i * DAY_US,
                "html": payload,
                "text": "",
                "lang": "zh" if key == "cjk" else "en",
            }
        )
    return rows


def golden_key(url: str) -> str:
    return url.rsplit("/", 1)[-1]
