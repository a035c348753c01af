"""Minimal deterministic PDF writer (corpus generator + test fixtures).

Produces standards-valid PDF 1.4 bytes: catalog → pages → page(s), one
Flate-compressed (or raw) content stream per page, a correct xref table and
trailer. Used by the synthetic pages corpus (``doc_id % 23`` rows) and the
golden fixtures so the parser is exercised against real structure — any
conforming reader opens these files.

CJK support: ``build_cjk_text_pdf`` emits a composite Type0 font
(``/Encoding /Identity-H``, CIDFontType2 descendant) with a ToUnicode CMap
mapping document-local CIDs back to Unicode, and shows text as 2-byte-CID
hex strings — the structure real CJK PDFs use. The descendant carries no
embedded glyphs (these are extraction fixtures, not rendering targets).
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612, 792
MARGIN_X, TOP_Y = 72.0, 720.0
FONT_SIZE = 12.0
PARA_STEP = 34.0  # > LINE_SPACING_FACTOR × font size → one paragraph per line


def _lzw_encode(data: bytes) -> bytes:
    """PDF LZWDecode-compatible encoder. Emits a CLEAR whenever the table
    nears the 9-bit ceiling, so every code stays 9 bits wide — valid LZW
    (encoders may clear at will) that sidesteps the EarlyChange width
    ambiguity entirely."""
    out = bytearray()
    buf = nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << 9) | code
        nbits += 9
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)
    w = b""
    for i in range(len(data)):
        ch = data[i:i + 1]
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = ch
        if next_code >= 500:  # stay comfortably under the 9-bit ceiling
            emit(256)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _runlength_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j > i + 1:  # run of ≥3 → repeat form
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        j = i + 1  # literal run up to 128, stopping before a ≥3 repeat
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)
    return bytes(out)


def encode_stream(content: bytes, filters: list[str]) -> bytes:
    """Encode ``content`` so that applying the ``/Filter`` chain ``filters``
    (decode order) recovers it — encoders run in reverse order."""
    import base64

    for name in reversed(filters):
        if name == "FlateDecode":
            content = zlib.compress(content)
        elif name == "LZWDecode":
            content = _lzw_encode(content)
        elif name == "ASCIIHexDecode":
            content = content.hex().encode("ascii") + b">"
        elif name == "ASCII85Decode":
            content = base64.a85encode(content) + b"~>"
        elif name == "RunLengthDecode":
            content = _runlength_encode(content)
        else:
            raise ValueError(f"no encoder for {name}")
    return content


def _esc(text: str) -> bytes:
    return (
        text.encode("latin-1", errors="replace")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def page_content(lines: list[tuple[float, float, str]],
                 font_size: float = FONT_SIZE) -> bytes:
    """Content stream placing each (x, y, text) line via Tm + Tj."""
    parts = [b"BT", b"/F1 %.1f Tf" % font_size]
    for x, y, text in lines:
        parts.append(b"1 0 0 1 %.1f %.1f Tm" % (x, y))
        parts.append(b"(" + _esc(text) + b") Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def _tounicode_cmap(charmap: dict[str, int]) -> bytes:
    """ToUnicode CMap stream body: CID → UTF-16BE bfchar entries (chunked at
    the spec's 100-entries-per-section limit)."""
    entries = [
        f"<{cid:04X}> <{ch.encode('utf-16-be').hex().upper()}>"
        for ch, cid in sorted(charmap.items(), key=lambda kv: kv[1])
    ]
    sections = []
    for i in range(0, len(entries), 100):
        chunk = entries[i : i + 100]
        sections.append(
            f"{len(chunk)} beginbfchar\n" + "\n".join(chunk) + "\nendbfchar"
        )
    body = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n"
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        + "\n".join(sections)
        + "\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    )
    return body.encode("ascii")


def build_pdf(content_streams: list[bytes], *,
              compress: bool | list[bool] = True,
              cid_charmap: dict[str, int] | None = None) -> bytes:
    """Assemble a valid PDF: one page per content stream. ``compress`` may
    be a per-page list (mixed streams in one file); each entry is a bool
    (False=raw, True=Flate) or an explicit filter-name chain in decode
    order, e.g. ``["ASCII85Decode", "FlateDecode"]`` or ``["LZWDecode"]``.

    ``cid_charmap`` (char → CID) adds an ``/F2`` Identity-H Type0 font with
    a ToUnicode CMap; content streams may then show text as 2-byte-CID hex
    strings (:func:`cid_page_content`).
    """
    n_pages = len(content_streams)
    comp_flags = (compress if isinstance(compress, list)
                  else [compress] * n_pages)
    # object numbering: 1=catalog, 2=pages, 3=font,
    # per page i: page obj (4+2i), content obj (5+2i);
    # optional CID font objects appended after the pages.
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               ).encode("ascii")
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    fonts = "/F1 3 0 R"
    if cid_charmap is not None:
        t0_num = 4 + 2 * n_pages
        desc_num, uni_num = t0_num + 1, t0_num + 2
        objs[t0_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-Identity "
            f"/Encoding /Identity-H /DescendantFonts [{desc_num} 0 R] "
            f"/ToUnicode {uni_num} 0 R >>"
        ).encode("ascii")
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth-Identity "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /DW 1000 >>"
        )
        cmap = _tounicode_cmap(cid_charmap)
        objs[uni_num] = (
            b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
        )
        fonts += f" /F2 {t0_num} 0 R"
    for i, content in enumerate(content_streams):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources << /Font << {fonts} >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("ascii")
        flag = comp_flags[i]
        if isinstance(flag, (list, tuple)):  # explicit filter chain
            data = encode_stream(content, list(flag))
            names = " ".join(f"/{n}" for n in flag)
            filt = (f"/Filter [{names}] " if len(flag) > 1
                    else f"/Filter /{flag[0]} ").encode("ascii")
        else:
            data = zlib.compress(content) if flag else content
            filt = b"/Filter /FlateDecode " if flag else b""
        objs[cont_num] = (
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(data)
            + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_obj, xref_at))
    return bytes(out)


def cid_page_content(lines: list[tuple[float, float, str]],
                     charmap: dict[str, int],
                     font_size: float = FONT_SIZE) -> bytes:
    """Content stream showing each (x, y, text) line as a 2-byte-CID hex
    string under the /F2 Identity-H font."""
    parts = [b"BT", b"/F2 %.1f Tf" % font_size]
    for x, y, text in lines:
        hexstr = "".join(f"{charmap[ch]:04X}" for ch in text)
        parts.append(b"1 0 0 1 %.1f %.1f Tm" % (x, y))
        parts.append(b"<" + hexstr.encode("ascii") + b"> Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def build_cjk_text_pdf(paragraphs: list[str], *, paras_per_page: int = 18,
                       compress: bool = True) -> bytes:
    """One CID-encoded text line per paragraph (same frozen geometry as
    :func:`build_text_pdf`): extracted text is ``"\\n".join(paragraphs)``.
    CIDs are document-local (assigned in sorted char order — deterministic);
    the ToUnicode CMap carries the inverse mapping."""
    chars = sorted({ch for p in paragraphs for ch in p})
    charmap = {ch: i + 1 for i, ch in enumerate(chars)}
    streams: list[bytes] = []
    for start in range(0, len(paragraphs), paras_per_page):
        chunk = paragraphs[start : start + paras_per_page]
        lines = [
            (MARGIN_X, TOP_Y - i * PARA_STEP, text)
            for i, text in enumerate(chunk)
        ]
        streams.append(cid_page_content(lines, charmap))
    if not streams:
        streams = [cid_page_content([], charmap)]
    return build_pdf(streams, compress=compress, cid_charmap=charmap)


def build_text_pdf(paragraphs: list[str], *, paras_per_page: int = 18,
                   compress: bool | list = True) -> bytes:
    """One text line per paragraph, top-down, paginated. ``compress`` may
    also be a filter-name chain (see :func:`build_pdf`) applied to every
    page stream.

    Geometry contract (frozen — the corpus oracle depends on it): each
    paragraph renders as ONE line at x=72 stepping PARA_STEP down, so the
    ``multi_para`` layout parser emits exactly one output line per
    paragraph → extracted text is ``"\\n".join(paragraphs) + "\\n"``.
    """
    streams: list[bytes] = []
    for start in range(0, len(paragraphs), paras_per_page):
        chunk = paragraphs[start : start + paras_per_page]
        lines = [
            (MARGIN_X, TOP_Y - i * PARA_STEP, text)
            for i, text in enumerate(chunk)
        ]
        streams.append(page_content(lines))
    if not streams:
        streams = [page_content([])]
    if isinstance(compress, list):
        compress = [compress] * len(streams)
    return build_pdf(streams, compress=compress)
