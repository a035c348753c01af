"""PDF decode path: writer → parser round trips, operator coverage, and
row-local tolerance (a malformed PDF must return None, never raise)."""

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from xhs_ocr_ray.layout.paragraph import render
from xhs_ocr_ray.layout.parsers import get_parser
from xhs_ocr_ray.pdf import build_pdf, build_text_pdf, extract_pdf_blocks, page_content
from xhs_ocr_ray.pdf.parser import _scan_literal, _tokenize


def _text_of(pdf: bytes) -> str | None:
    blocks = extract_pdf_blocks(pdf)
    if not blocks:
        return None
    return render(get_parser("multi_para")(blocks))


def test_round_trip_multipage_compressed():
    paras = [f"paragraph number {i} with deterministic words" for i in range(40)]
    assert _text_of(build_text_pdf(paras)) == "\n".join(paras) + "\n"


def test_round_trip_uncompressed_and_mixed():
    paras = ["first line here", "second line there"]
    assert _text_of(build_text_pdf(paras, compress=False)) == "\n".join(paras) + "\n"
    streams = [page_content([(72.0, 720.0, "page one")]),
               page_content([(72.0, 720.0, "page two")])]
    assert _text_of(build_pdf(streams, compress=[True, False])) == "page one\npage two\n"


def test_all_stream_filters_extract_identically():
    """Every supported /Filter chain yields byte-identical extraction to the
    Flate baseline (decoders: LZW, ASCIIHex, ASCII85, RunLength, chains)."""
    paras = [f"filter paragraph {i} some words repeated words" for i in range(30)]
    stream = page_content([(72.0, 720.0 - 34.0 * i, t)
                           for i, t in enumerate(paras[:18])])
    for chain in (["LZWDecode"], ["ASCIIHexDecode"], ["ASCII85Decode"],
                  ["RunLengthDecode"], ["ASCII85Decode", "FlateDecode"],
                  ["ASCIIHexDecode", "LZWDecode"],
                  ["RunLengthDecode", "FlateDecode"]):
        got = _text_of(build_pdf([stream], compress=[chain]))
        assert got == "\n".join(paras[:18]) + "\n", chain
    # mixed chains across pages of one document
    streams = [page_content([(72.0, 720.0, "alpha page")]),
               page_content([(72.0, 720.0, "beta page")]),
               page_content([(72.0, 720.0, "gamma page")])]
    got = _text_of(build_pdf(
        streams, compress=[["LZWDecode"], True, ["ASCII85Decode", "FlateDecode"]]
    ))
    assert got == "alpha page\nbeta page\ngamma page\n"


def test_unknown_filter_skipped_not_fatal():
    """A DCTDecode (JPEG) stream is skipped; the document still fails soft
    (None) rather than raising."""
    body = (b"%PDF-1.4\n1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n"
            b"2 0 obj << /Filter /DCTDecode /Length 4 >>\n"
            b"stream\n\xff\xd8\xff\xe0\nendstream endobj\n")
    assert extract_pdf_blocks(body) is None


def test_lzw_long_stream_clear_codes():
    """LZW streams long enough to force table clears still roundtrip through
    the full PDF path."""
    paras = [f"wordy line {i} w{i} " + " ".join(f"t{j}" for j in range(60))
             for i in range(18)]
    stream = page_content([(72.0, 720.0 - 34.0 * i, t)
                           for i, t in enumerate(paras)])
    assert len(stream) > 4000  # forces multiple table resets in the encoder
    got = _text_of(build_pdf([stream], compress=[["LZWDecode"]]))
    assert got == "\n".join(paras) + "\n"


def test_escapes_and_hex_and_tj():
    content = (
        b"BT /F1 12 Tf\n"
        b"1 0 0 1 72 720 Tm (Escape \\(x\\) back\\\\slash \\101) Tj\n"
        b"1 0 0 1 72 680 Tm <41424321> Tj\n"
        b"1 0 0 1 72 640 Tm [(a) -20 (b) -20 (c)] TJ\n"
        b"ET"
    )
    assert _text_of(build_pdf([content])) == "Escape (x) back\\slash A\nABC!\nabc\n"


def test_td_tstar_quote_newlines():
    content = (
        b"BT /F1 12 Tf 14 TL\n"
        b"1 0 0 1 72 720 Tm (line one) Tj\n"
        b"(line two) '\n"          # ' = T* + Tj → one leading down
        b"T* (line three) Tj\n"
        b"ET"
    )
    # 14pt leading ≤ 1.2×12pt? No: 14 ≤ 14.4 → same paragraph, joined by space
    assert _text_of(build_pdf([content])) == "line one line two line three\n"


def test_nested_parens_literal():
    s, _ = _scan_literal(b"(outer (inner) tail)", 0)
    assert s == b"outer (inner) tail"


def test_tokenizer_skips_dicts_and_inline_images():
    toks = list(_tokenize(b"<< /G1 gs >> BI /W 2 ID \x00\x01 EI (kept) Tj"))
    assert ("str", b"kept") in toks
    assert all(t[0] != "str" or t[1] == b"kept" for t in toks)


def test_fallback_no_page_objects():
    # a bare stream containing BT, no catalog/page structure at all
    content = b"BT /F1 12 Tf 1 0 0 1 10 700 Tm (orphan stream) Tj ET"
    pdf = (b"%PDF-1.4\n9 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert _text_of(pdf) == "orphan stream\n"


def test_truncated_flate_tolerated():
    content = b"BT /F1 12 Tf 1 0 0 1 10 700 Tm (partially ok) Tj ET"
    data = zlib.compress(content)[:-4]  # cut the tail
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
           + str(len(data)).encode() + b" >>\nstream\n" + data
           + b"\nendstream\nendobj\n")
    out = _text_of(pdf)
    assert out is not None and "partially ok" in out


def test_garbage_returns_none():
    assert extract_pdf_blocks(b"%PDF-1.7\nfake") is None
    assert extract_pdf_blocks(b"") is None
    assert extract_pdf_blocks(b"%PDF-1.4\n1 0 obj << >> endobj") is None


@given(st.binary(max_size=1024))
@settings(max_examples=80, deadline=2000)
def test_parser_never_raises(junk):
    extract_pdf_blocks(b"%PDF-1.4\n" + junk)


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=60).map(str.strip).filter(bool), min_size=1, max_size=25))
@settings(max_examples=40, deadline=5000)
def test_round_trip_arbitrary_ascii(paras):
    # collapse inner whitespace: the layout join is whitespace-normalizing
    paras = [" ".join(p.split()) for p in paras]
    paras = [p for p in paras if p]
    if not paras:
        return
    assert _text_of(build_text_pdf(paras)) == "\n".join(paras) + "\n"
