"""Deterministic synthetic `pages` corpus (BASELINE.json input_hint shape).

Two generators:

1. :func:`golden_corpus` — a small hand-written HTML/layout fixture set, one
   per golden case in FIXTURES.md §1 (boilerplate, nested tables, CJK,
   masked-span with profile fallback, paragraphs, code block, layout payload,
   PDF stub, empty). Golden expected bytes live in ``goldens/``.

2. :func:`pages_from_documents` — scales the corpus: wraps every row of the
   driver's ``documents.parquet`` into a full synthetic page
   ``(url, warc_ts, html, text, lang)``. Fully deterministic in ``doc_id``:

   - ``doc_id % 17 == 3``  → %LAYOUT1 text-box payload (layout/PDF path);
   - ``doc_id % 23 == 5``  → a real PDF of the text's paragraphs (PDF
     decode path, ``xhs_ocr_ray.pdf``), stream encoding cycling
     Flate / ASCII85+Flate / RunLength / LZW by ``doc_id``;
   - ``doc_id % 29 == 13`` → metrics-panel page (masked-span profile path:
     the first profile fails its field-count check, the fallback binds
     views/likes/shares — the reference's mask-fallback loop at scale);
   - ``doc_id % 50 == 7``  → the row is emitted TWICE (same url, +1h
     timestamp) to exercise exact per-url dedup;
   - ``doc_id % 199 == 11`` → replica 0 is a genuinely oversized page (body
     repeated 2500× ≈ 1.3 MB — crosses the OVERSIZED_HTML routing threshold);
     other replicas are normal-size;
   - otherwise            → boilerplate-wrapped HTML article.

   Runs as a ``map_batches`` transform so corpus generation itself is a Ray
   pipeline; :func:`ensure_pages_parquet` materializes + caches it under /tmp
   (generation is never part of timed benchmark sections).
"""

from __future__ import annotations

import html as html_mod
import json
import os
import tempfile

import pyarrow as pa

from xhs_ocr_ray.functions.arrow import read_parquet_clean

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Realistically heavy page chrome: Common-Crawl pages average 10-30KB of
# nav/menu/footer/ad markup around the article. The extractor must prune all
# of it; the weight also keeps the benchmark honest (parse compute dominates,
# as it does on real crawl data).
_MENU_ITEMS = "".join(
    f'<li class="menu-item"><a href="/section/{i}">Section {i} news and '
    f'extended coverage</a><ul>' + "".join(
        f'<li><a href="/section/{i}/{j}">Subsection {i}.{j} daily digest</a></li>'
        for j in range(4)
    ) + "</ul></li>"
    for i in range(8)
)
_NAV = (
    '<header class="site-header"><div class="logo">ExampleNews</div>'
    f'<nav><ul class="menu">{_MENU_ITEMS}</ul></nav>'
    '<div class="header-tools"><a href="/login">Log in</a> '
    '<a href="/subscribe">Subscribe</a> <a href="/newsletter">Newsletter</a></div>'
    "</header>"
)
_SIDEBAR = (
    '<aside class="sidebar"><h3>Trending</h3><ul>'
    + "".join(
        f'<li><a href="/a/{i}">Trending headline number {i} with a fairly '
        f"long teaser line to mimic real markup</a></li>"
        for i in range(12)
    )
    + '</ul><div class="promo">Limited offer! <a href="/deal">Deal</a></div>'
    '<ul class="related">'
    + "".join(f'<li><a href="/rel/{i}">Related story {i}</a></li>' for i in range(8))
    + "</ul></aside>"
)
_FOOTER = (
    '<footer><div class="footer-links">'
    + "".join(
        f'<ul><li><a href="/f/{i}/{j}">Footer link {i}.{j}</a></li></ul>'
        for i in range(6)
        for j in range(5)
    )
    + '</div><p class="copyright">© 2024 Example Corp. '
    '<a href="/terms">Terms</a> <a href="/privacy">Privacy</a> '
    '<a href="/cookies">Cookies</a></p></footer>'
)
_ADS = (
    '<div class="ad-banner">Buy more compute! <a href="/buy">click</a></div>'
    '<div class="ad-banner side-ad"><span>Sponsored:</span> '
    '<a href="/sponsor">Great product</a> you absolutely need today</div>'
    '<script>window.trackingBlob = {"id": 12345, "flags": [1,2,3]};'
    "function init() { console.log('tracker'); }</script>"
    "<style>.menu li { display: inline-block; padding: 4px; }"
    ".sidebar { float: right; width: 300px; }</style>"
)
_COMMENTS = (
    '<section class="comment-section"><h4>Comments</h4>'
    + "".join(
        f'<div class="comment"><span class="author">user{i}</span>'
        f"<p>Commentary text number {i} that should never appear in the "
        f"extracted main content at all.</p></div>"
        for i in range(6)
    )
    + "</section>"
)

WORDS_PER_PARA = 24


def _paragraphs(text: str) -> list[str]:
    words = text.split()
    if not words:
        return []
    return [
        " ".join(words[i : i + WORDS_PER_PARA])
        for i in range(0, len(words), WORDS_PER_PARA)
    ]


def build_article_html(title: str, text: str, repeat: int = 1) -> bytes:
    paras = _paragraphs(text) * repeat
    body = "".join(f"<p>{html_mod.escape(p)}</p>" for p in paras)
    page = (
        "<html><head><title>" + html_mod.escape(title) + "</title>"
        '<meta charset="utf-8"><link rel="stylesheet" href="/site.css">'
        "</head><body>"
        + _NAV + _ADS + '<div class="content-wrap"><article><h1>'
        + html_mod.escape(title) + "</h1>" + body + "</article>"
        + _COMMENTS + _SIDEBAR + "</div>" + _FOOTER + "</body></html>"
    )
    return page.encode("utf-8")


def build_metrics_html(doc_id: int, title: str) -> bytes:
    """A metrics-panel page (the masked-span doc class): numbers derived
    deterministically from doc_id; wrapped in the same heavy chrome."""
    views, likes, shares = doc_id * 37 % 100000, doc_id * 13 % 5000, doc_id * 7 % 500
    panel = (
        '<div class="metrics-panel">'
        f'<div class="metric"><span class="label">views</span> <span class="value">{views}</span></div>'
        f'<div class="metric"><span class="label">likes</span> <span class="value">{likes}</span></div>'
        f'<div class="metric"><span class="label">shares</span> <span class="value">{shares}</span></div>'
        "</div>"
    )
    page = (
        "<html><head><title>" + html_mod.escape(title) + "</title></head><body>"
        + _NAV + _ADS + '<div class="content-wrap">' + panel + "</div>"
        + _SIDEBAR + _FOOTER + "</body></html>"
    )
    return page.encode("utf-8")


def build_layout_payload(text: str, parser: str = "multi_para") -> bytes:
    """Arrange the text's paragraphs as one text-box per line on a page grid."""
    blocks = []
    y = 10.0
    for para in _paragraphs(text):
        words = para.split()
        # Two fragments per visual line, 6 words each → exercises line merge.
        for i in range(0, len(words), 12):
            left = " ".join(words[i : i + 6])
            right = " ".join(words[i + 6 : i + 12])
            if left:
                blocks.append(
                    {"box": [[10, y], [300, y], [300, y + 12], [10, y + 12]],
                     "score": 0.99, "text": left}
                )
            if right:
                blocks.append(
                    {"box": [[308, y], [600, y], [600, y + 12], [308, y + 12]],
                     "score": 0.98, "text": right}
                )
            y += 14.0
        y += 20.0  # paragraph gap
    doc = {"parser": parser, "blocks": blocks}
    return b"%LAYOUT1\n" + json.dumps(doc, ensure_ascii=False).encode("utf-8")


def _title_of(text: str, doc_id: int) -> str:
    return " ".join(text.split()[:6]) or f"doc {doc_id}"


def pages_from_documents(batch: pa.Table, replicas: int = 1) -> pa.Table:
    """map_batches transform: documents(doc_id, text, lang, source) → pages.

    ``replicas > 1`` amplifies the corpus deterministically for benchmarks:
    each document yields ``replicas`` pages with distinct urls (``/r{r}``
    suffix) and shifted timestamps; the payload-kind routing stays keyed by
    doc_id so the mix of html/layout/pdf/dup/oversized rows is preserved.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    out_text: list[str] = []
    out_lang: list[str] = []

    def emit(url: str, t_us: int, payload: bytes, text: str, lang: str) -> None:
        urls.append(url)
        ts.append(t_us)
        htmls.append(payload)
        out_text.append(text)
        out_lang.append(lang)

    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        text = text or ""
        title = _title_of(text, doc_id)
        t_us = BASE_TS_US + (doc_id % 30) * DAY_US + (doc_id % 24) * HOUR_US
        if doc_id % 17 == 3:
            kind, payload = "layout", build_layout_payload(text)
        elif doc_id % 23 == 5:
            from xhs_ocr_ray.pdf import build_text_pdf

            # cycle the stream encoding so the flagship exercises every
            # supported /Filter at corpus scale (text is identical either
            # way — the extraction oracle is encoding-independent)
            filt: bool | list = [
                True, ["ASCII85Decode", "FlateDecode"],
                ["RunLengthDecode"], ["LZWDecode"],
            ][(doc_id // 23) % 4]
            kind, payload = "pdf", build_text_pdf(_paragraphs(text),
                                                  compress=filt)
        elif doc_id % 29 == 13:
            kind, payload = "metrics", build_metrics_html(doc_id, title)
        elif doc_id % 199 == 11:
            kind, payload = "article", build_article_html(title, text, repeat=2500)
        else:
            kind, payload = "article", build_article_html(title, text)
        for r in range(replicas):
            if doc_id % 199 == 11 and r == 1:
                # only replica 0 stays oversized; the rest are normal pages
                payload = build_article_html(title, text)
            suffix = f"/r{r}" if r else ""
            url = f"https://{source}.example.com/{kind}/{doc_id}{suffix}"
            rt = t_us + r * 60_000_000
            emit(url, rt, payload, text, lang)
            if doc_id % 50 == 7:
                emit(url, rt + HOUR_US, payload, text, lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


GENERATOR_VERSION = 8  # bump to invalidate /tmp page caches


def ensure_pages_parquet(sf_dir: str, cache_root: str = "/tmp/xhs_pages_cache",
                         replicas: int = 1) -> str:
    """Materialize the pages corpus for ``sf_dir`` once; return its directory.

    Atomic: generates into a temp dir and renames. Safe to call from multiple
    fresh processes (the bench runs at two parallelism levels).
    """
    import ray.data  # deferred: keep module importable without a Ray session

    # Include a short hash of the absolute path: two corpora sharing a
    # basename (a/sf0.1 vs b/sf0.1) must never reuse each other's cache.
    import hashlib

    path_tag = hashlib.blake2b(
        os.path.abspath(sf_dir).encode("utf-8"), digest_size=4
    ).hexdigest()
    tag = (os.path.basename(os.path.normpath(sf_dir))
           + f"_{path_tag}_v{GENERATOR_VERSION}_r{replicas}")
    out_dir = os.path.join(cache_root, tag)
    done_marker = os.path.join(out_dir, "_GENERATED")
    if os.path.exists(done_marker):
        return out_dir
    os.makedirs(cache_root, exist_ok=True)
    tmp_dir = tempfile.mkdtemp(prefix=tag + ".", dir=cache_root)
    (
        read_parquet_clean(os.path.join(sf_dir, "documents.parquet"))
        .map_batches(pages_from_documents, batch_format="pyarrow", batch_size=512,
                     fn_kwargs={"replicas": replicas})
        .write_parquet(tmp_dir, min_rows_per_file=4096)
    )
    with open(os.path.join(tmp_dir, "_GENERATED"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)  # a concurrent generator won
    return out_dir
