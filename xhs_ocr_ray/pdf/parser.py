"""Pure-Python PDF text extraction (stdlib only — no PDF libs in the env).

The payload-decode analog of the reference's OCR engine turning pixels into
positioned text blocks (core/ppocr_api.py:100-111 returns ``[{box, score,
text}]``): here a PDF byte payload is decoded into the SAME block shape and
fed to the tbpu-analog layout parsers (``xhs_ocr_ray.layout``), completing
the "PDF/layout parse for binary payloads" path of the north rule.

Scope (documented, deliberate):

- object discovery by tolerant ``N G obj … endobj`` scan — works with or
  without a valid xref table (crawled PDFs are routinely truncated);
- stream filters: none, ``/FlateDecode`` (stdlib zlib, with raw-deflate and
  truncated-tail fallbacks), ``/LZWDecode``, ``/ASCIIHexDecode``,
  ``/ASCII85Decode``, ``/RunLengthDecode`` — including ``[/A /B]`` filter
  chains applied in order; image-only filters (DCT, JBIG2, JPX) are skipped;
- text operators: BT/ET, Tf, TL, Tm, Td, TD, T*, Tj, ', ", TJ;
- strings: literal ``(…)`` with nesting/escapes/octal and hex ``<…>``.
  Simple fonts decode as Latin-1 (correct for the Standard/WinAnsi
  encodings in the ASCII range); composite fonts with ``/ToUnicode`` CMaps
  (Identity-H CJK PDFs) decode 2-byte CIDs through the CMap's
  bfchar/bfrange entries — ``Tf`` tracks the active font per text run;
- positions: the text matrix is tracked as (x, y) translation + font size;
  PDF's bottom-left origin is flipped to the top-left coordinates the
  layout parsers expect, and successive pages stack vertically with a gap
  so one document renders as one continuous flow.

Everything degrades row-local: any malformed structure returns ``None`` and
the engine quarantines the row as ``failed_parse`` (never raises).
"""

from __future__ import annotations

import re
import zlib

DEFAULT_PAGE_HEIGHT = 792.0
PAGE_GAP = 50.0
CHAR_WIDTH_EM = 0.6  # Helvetica-ish average advance per char (in em)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.DOTALL)
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages(?![a-zA-Z])")
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_FILTER_SPEC_RE = re.compile(
    rb"/Filter\s*(\[(?:\s*/[A-Za-z0-9]+)+\s*\]|/[A-Za-z0-9]+)"
)
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_OR_BRACKET_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _inflate(data: bytes) -> bytes | None:
    """zlib with fallbacks: whole-stream, raw deflate, truncated tail."""
    for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
        try:
            return zlib.decompress(data, wbits)
        except zlib.error:
            try:
                d = zlib.decompressobj(wbits)
                out = d.decompress(data)
                if out:
                    return out
            except zlib.error:
                continue
    return None


def _lzw_decode(data: bytes, early: int = 1) -> bytes | None:
    """PDF LZWDecode (spec 7.4.4): 9→12-bit variable-width codes, clear=256,
    EOD=257, EarlyChange width bumps per the common reader convention
    (pdfminer/pdf.js): width grows when table size + early reaches 2^bits."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits, buf, nbits = 9, 0, 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= bits:
            nbits -= bits
            code = (buf >> nbits) & ((1 << bits) - 1)
            if code == 256:
                del table[258:]
                bits, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 257:
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) + early >= (1 << bits) and bits < 12:
                bits += 1
            if len(table) > 4096:
                return None
    return bytes(out)  # tolerate a missing EOD (truncated tail)


def _ascii_hex_decode(data: bytes) -> bytes | None:
    body = data.split(b">", 1)[0]
    digits = bytes(c for c in body if not chr(c).isspace())
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        return None


def _ascii85_decode(data: bytes) -> bytes | None:
    import base64

    body = data.split(b"~>", 1)[0]
    try:
        return base64.a85decode(bytes(
            c for c in body if not chr(c).isspace()
        ))
    except ValueError:
        return None


def _runlength_decode(data: bytes) -> bytes | None:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        if l == 128:  # EOD
            return bytes(out)
        if l < 128:
            out += data[i + 1:i + 2 + l]
            i += 2 + l
        else:
            if i + 1 >= n:
                return None
            out += data[i + 1:i + 2] * (257 - l)
            i += 2
    return bytes(out)


_STREAM_DECODERS = {
    b"FlateDecode": _inflate, b"Fl": _inflate,
    b"LZWDecode": _lzw_decode, b"LZW": _lzw_decode,
    b"ASCIIHexDecode": _ascii_hex_decode, b"AHx": _ascii_hex_decode,
    b"ASCII85Decode": _ascii85_decode, b"A85": _ascii85_decode,
    b"RunLengthDecode": _runlength_decode, b"RL": _runlength_decode,
}


def decode_stream(body: bytes, data: bytes) -> bytes | None:
    """Apply the ``/Filter`` chain named in object ``body`` to stream
    ``data``. Unknown filters (DCTDecode, JBIG2, crypt, …) → None."""
    fm = _FILTER_SPEC_RE.search(body)
    if fm is None:
        return data
    for name in _FILTER_NAME_RE.findall(fm.group(1)):
        dec = _STREAM_DECODERS.get(name)
        if dec is None:
            return None
        data = dec(data)
        if data is None:
            return None
    return data


def _scan_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Scan a ``(…)`` literal string starting at ``i`` (at the '(')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
            elif e in b"()\\":
                out.append(e)
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = [e]
                for _ in range(2):
                    if i + 1 < n and 0x30 <= data[i + 1] <= 0x37:
                        i += 1
                        oct_digits.append(data[i])
                out.append(int(bytes(oct_digits), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:
                out.append(e)
        elif c == 0x28:
            depth += 1
            out.append(c)
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
        else:
            out.append(c)
        i += 1
    return bytes(out), i  # unterminated: keep what we have


def _scan_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Scan a ``<…>`` hex string starting at ``i`` (at the '<')."""
    j = data.find(b">", i + 1)
    if j < 0:
        j = len(data)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


def _tokenize(content: bytes):
    """Yield ('str', bytes) / ('num', float) / ('name', str) / ('op', str) /
    ('[',) / (']',) tokens from a content stream. Inline images (BI…EI) and
    dictionaries are skipped."""
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
            continue
        if c == 0x25:  # % comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x28:
            s, i = _scan_literal(content, i)
            yield ("str", s)
            continue
        if c == 0x3C:
            if content[i : i + 2] == b"<<":  # dict: skip to matching >>
                depth = 1
                i += 2
                while i < n and depth:
                    if content[i : i + 2] == b"<<":
                        depth += 1
                        i += 2
                    elif content[i : i + 2] == b">>":
                        depth -= 1
                        i += 2
                    else:
                        i += 1
                continue
            s, i = _scan_hex(content, i)
            yield ("str", s)
            continue
        if c == 0x5B:
            yield ("[",)
            i += 1
            continue
        if c == 0x5D:
            yield ("]",)
            i += 1
            continue
        if c == 0x2F:  # /Name
            m = re.match(rb"/[^\s/<>\[\]()%]*", content[i:])
            yield ("name", m.group(0)[1:].decode("latin-1"))
            i += m.end()
            continue
        m = _NUM_RE.match(content, i)
        if m and (c in b"+-.0123456789"):
            yield ("num", float(m.group(0)))
            i = m.end()
            continue
        m = _OP_RE.match(content, i)
        if m:
            op = m.group(0).decode("latin-1")
            if op == "BI":  # inline image: skip to EI
                j = content.find(b"EI", i)
                i = n if j < 0 else j + 2
                continue
            yield ("op", op)
            i = m.end()
            continue
        i += 1  # unknown byte: tolerate


def _utf16be(b: bytes) -> str:
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return b.decode("utf-16-be", errors="ignore")


def _parse_tounicode(stream: bytes) -> dict[int, str]:
    """CID → unicode map from a ToUnicode CMap stream (bfchar + bfrange,
    including the ``[<dst> …]`` array form of bfrange)."""
    cmap: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(stream):
        toks = [t for t in _HEX_OR_BRACKET_RE.findall(m.group(1)) if t[0]]
        for i in range(0, len(toks) - 1, 2):
            src = int(toks[i][0], 16)
            cmap[src] = _utf16be(bytes.fromhex(toks[i + 1][0].decode("ascii")))
    for m in _BFRANGE_RE.finditer(stream):
        toks = _HEX_OR_BRACKET_RE.findall(m.group(1))
        i, n = 0, len(toks)
        while i + 1 < n and toks[i][0] and toks[i + 1][0]:
            lo, hi = int(toks[i][0], 16), int(toks[i + 1][0], 16)
            i += 2
            if i < n and toks[i][1]:  # '[' — per-CID dst array
                i += 1
                cid = lo
                while i < n and toks[i][0]:
                    cmap[cid] = _utf16be(
                        bytes.fromhex(toks[i][0].decode("ascii")))
                    cid += 1
                    i += 1
                if i < n and toks[i][2]:  # ']'
                    i += 1
            elif i < n and toks[i][0]:  # incrementing dst base
                base = bytes.fromhex(toks[i][0].decode("ascii"))
                start = int.from_bytes(base, "big")
                for off in range(hi - lo + 1):
                    cmap[lo + off] = _utf16be(
                        (start + off).to_bytes(len(base), "big"))
                i += 1
            else:
                break
    return cmap


def _page_text_blocks(content: bytes, page_h: float, y_off: float,
                      fonts: dict[str, dict[int, str] | None] | None = None,
                      ) -> list[dict]:
    """Interpret one page's content stream into positioned text blocks.

    ``fonts`` maps resource font names (e.g. ``F2``) to a CID→unicode map
    for composite fonts (or None for simple fonts); ``Tf`` switches the
    active map, so one page can mix Latin-1 and CID text runs."""
    blocks: list[dict] = []
    fs = 12.0
    leading = 0.0
    line_x = line_y = 0.0
    cur_x = cur_y = 0.0
    stack: list = []
    fonts = fonts or {}
    cur_map: dict[int, str] | None = None

    def emit(raw: bytes) -> None:
        nonlocal cur_x
        if cur_map is not None:
            # composite font: 2-byte CIDs through the ToUnicode map; CJK
            # glyphs advance a full em
            text = "".join(
                cur_map.get((raw[i] << 8) | raw[i + 1], "")
                for i in range(0, len(raw) - 1, 2)
            )
            em = 1.0
        else:
            text = raw.decode("latin-1")
            em = CHAR_WIDTH_EM
        # floor at 1 em: a box taller than wide would fool the layout
        # preprocessor's long-edge rotation estimate
        w = max(em * fs * len(text), fs)
        if text.strip():
            y_top = y_off + (page_h - cur_y) - fs
            blocks.append(
                {
                    "box": [[cur_x, y_top], [cur_x + w, y_top],
                            [cur_x + w, y_top + fs], [cur_x, y_top + fs]],
                    "score": 1.0,
                    "text": text,
                }
            )
        cur_x += w

    def newline() -> None:
        nonlocal line_y, cur_x, cur_y
        line_y -= leading
        cur_x, cur_y = line_x, line_y

    arr: list | None = None
    for tok in _tokenize(content):
        kind = tok[0]
        if kind == "[":
            arr = []
            continue
        if kind == "]":
            stack.append(arr or [])
            arr = None
            continue
        if kind in ("str", "num", "name"):
            (arr if arr is not None else stack).append(tok[1])
            continue
        op = tok[1]
        if op == "BT":
            line_x = line_y = cur_x = cur_y = 0.0
        elif op == "Tf" and stack:
            if isinstance(stack[-1], float):
                fs = stack[-1] or fs
            if len(stack) >= 2 and isinstance(stack[-2], str):
                cur_map = fonts.get(stack[-2])
        elif op == "TL" and stack:
            if isinstance(stack[-1], float):
                leading = stack[-1]
        elif op == "Tm" and len(stack) >= 6:
            e, f = stack[-2], stack[-1]
            if isinstance(e, float) and isinstance(f, float):
                line_x = cur_x = e
                line_y = cur_y = f
        elif op in ("Td", "TD") and len(stack) >= 2:
            tx, ty = stack[-2], stack[-1]
            if isinstance(tx, float) and isinstance(ty, float):
                line_x += tx
                line_y += ty
                cur_x, cur_y = line_x, line_y
                if op == "TD":
                    leading = -ty
        elif op == "T*":
            newline()
        elif op == "Tj" and stack and isinstance(stack[-1], bytes):
            emit(stack[-1])
        elif op == "'" and stack and isinstance(stack[-1], bytes):
            newline()
            emit(stack[-1])
        elif op == '"' and stack and isinstance(stack[-1], bytes):
            newline()
            emit(stack[-1])
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            emit(b"".join(x for x in stack[-1] if isinstance(x, bytes)))
        stack.clear()
    return blocks


def extract_pdf_blocks(payload: bytes) -> list[dict] | None:
    """Decode a PDF byte payload into layout-parser text blocks.

    Returns ``None`` when nothing text-like could be decoded (the engine
    maps that to ``status='failed_parse'``). Never raises on garbage.
    """
    try:
        objects: dict[int, bytes] = {}
        order: list[int] = []
        for m in _OBJ_RE.finditer(payload):
            num = int(m.group(1))
            if num not in objects:
                order.append(num)
            objects[num] = m.group(3)

        def stream_of(body: bytes) -> bytes | None:
            sm = _STREAM_RE.search(body)
            if sm is None:
                return None
            return decode_stream(body, sm.group(1))

        # Composite fonts: any object with /ToUnicode gets its CMap parsed
        # once; pages resolve their /Resources /Font names against these.
        font_cmaps: dict[int, dict[int, str]] = {}
        for n in order:
            tm = _TOUNICODE_RE.search(objects[n])
            if tm and int(tm.group(1)) in objects:
                s = stream_of(objects[int(tm.group(1))])
                if s:
                    cm = _parse_tounicode(s)
                    if cm:
                        font_cmaps[n] = cm

        def fonts_of(body: bytes) -> dict[str, dict[int, str]]:
            """Resource font name → CID map (composite fonts only; simple
            fonts fall through to the Latin-1 path). Handles both inline
            /Resources dicts and indirect /Resources N 0 R."""
            space = body
            rm = _RESOURCES_REF_RE.search(body)
            if rm and int(rm.group(1)) in objects:
                space = body + objects[int(rm.group(1))]
            out: dict[str, dict[int, str]] = {}
            fm = _FONT_DICT_RE.search(space)
            if fm:
                for name, num in _FONT_ENTRY_RE.findall(fm.group(1)):
                    if int(num) in font_cmaps:
                        out[name.decode("latin-1")] = font_cmaps[int(num)]
            return out

        # Page discovery: Kids order when a /Type /Pages node exists, else
        # file order of /Type /Page objects, else any stream containing BT.
        page_nums = [n for n in order if _TYPE_PAGE_RE.search(objects[n])]
        for n in order:
            if _TYPE_PAGES_RE.search(objects[n]):
                km = _KIDS_RE.search(objects[n])
                if km:
                    kids = [int(r) for r in _REF_RE.findall(km.group(1))]
                    if all(k in objects for k in kids):
                        page_nums = [k for k in kids
                                     if _TYPE_PAGE_RE.search(objects[k])]
                break

        pages: list[tuple[bytes, float, dict]] = []  # (content, height, fonts)
        for pn in page_nums:
            body = objects[pn]
            refs: list[int] = []
            am = _CONTENTS_ARR_RE.search(body)
            if am:
                refs = [int(r) for r in _REF_RE.findall(am.group(1))]
            else:
                rm = _CONTENTS_REF_RE.search(body)
                if rm:
                    refs = [int(rm.group(1))]
            parts = []
            for r in refs:
                if r in objects:
                    s = stream_of(objects[r])
                    if s:
                        parts.append(s)
            mb = _MEDIABOX_RE.search(body)
            page_h = float(mb.group(4)) if mb else DEFAULT_PAGE_HEIGHT
            if parts:
                pages.append((b"\n".join(parts), page_h, fonts_of(body)))

        if not pages:  # tolerant fallback: any stream with a BT text block
            # no page dict to resolve resources from → offer every named
            # composite font found anywhere in the file
            all_fonts: dict[str, dict[int, str]] = {}
            for n in order:
                all_fonts.update(fonts_of(objects[n]))
            for n in order:
                s = stream_of(objects[n])
                if s and b"BT" in s:
                    pages.append((s, DEFAULT_PAGE_HEIGHT, all_fonts))

        blocks: list[dict] = []
        y_off = 0.0
        for content, page_h, fonts in pages:
            blocks.extend(_page_text_blocks(content, page_h, y_off, fonts))
            y_off += page_h + PAGE_GAP
        return blocks or None
    except Exception:  # noqa: BLE001 — row-local tolerance, never raise
        return None
