"""Pure-Python GIF codec (stdlib-only), companion to ``xhs_ocr_ray.png``.

Decoder: GIF87a/89a, global or local color table, non-interlaced single
image; extensions are skipped. The LZW stream is the GIF variant — codes
packed LSB-first with variable width 3..12 bits, CLEAR/EOI specials, width
bump when the table fills (the PDF LZWDecode in ``xhs_ocr_ray.pdf`` is the
MSB-first cousin with EarlyChange; the two do NOT share bit order). A
grayscale palette (r==g==b for every used entry) decodes to (H, W) uint8,
anything else to (H, W, 3).

Encoder (fixture writer, like ``pdf/writer.py``): grayscale 256-entry
palette, 8-bit min code size, REAL LZW compression by default (width-bump
rule kept in lockstep with the decoder: the decoder's table is one entry
behind the encoder's, so the encoder bumps when ``next_code - 1`` fills the
current width) — so every fixture exercises the decoder's dictionary
growth, KwKwK case and 10/11/12-bit widths. ``compress=False`` falls back
to the literal "uncompressed GIF" stream (CLEAR every 254 symbols, 9-bit).
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = b"\x3b"


def _lzw_compress_gif(pixels: list[int], mcs: int = 8) -> bytes:
    """Standard GIF LZW, LSB-first variable-width codes. The width-bump
    mirrors the decoder exactly: decoder table size == encoder
    ``next_code - 1`` (it appends one entry per code, one code late), so
    bump when ``next_code - 1`` reaches ``1 << width``."""
    clear = 1 << mcs
    eoi = clear + 1
    acc = 0
    nbits = 0
    data = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    cur = b""
    for px in pixels:
        nxt = cur + bytes((px,))
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        cur = nxt[-1:]
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def encode_gif(arr: np.ndarray, *, compress: bool = True) -> bytes:
    """(H, W) uint8 grayscale → GIF89a bytes (deterministic)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"encode_gif: expected 2-D grayscale, got {arr.shape}")
    h, w = a.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0b1111_0111)  # GCT present, 8-bit color res, 256 entries
    out.append(0)            # background color index
    out.append(0)            # pixel aspect ratio
    for v in range(256):     # grayscale palette
        out += bytes((v, v, v))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(8)            # LZW minimum code size

    if compress:
        data = bytearray(_lzw_compress_gif(a.reshape(-1).tolist()))
    else:
        # uncompressed-GIF literal stream: 9-bit codes, CLEAR every 254
        clear, eoi = 256, 257
        codes: list[int] = [clear]
        for i, px in enumerate(a.reshape(-1).tolist()):
            if i and i % 254 == 0:
                codes.append(clear)
            codes.append(px)
        codes.append(eoi)
        acc = 0
        nbits = 0
        data = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += 9
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
    for off in range(0, len(data), 255):
        block = data[off : off + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out += _TRAILER
    return bytes(out)


def _lzw_decode_gif(data: bytes, mcs: int, n_pixels: int) -> bytearray:
    """GIF LZW: LSB-first, width mcs+1..12, CLEAR resets, EOI ends."""
    clear = 1 << mcs
    eoi = clear + 1
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: int | None = None
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: tolerate, return what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                # corrupt first-code-after-CLEAR: keep the codec's documented
                # ValueError contract (an IndexError here would escape the
                # row-tolerance wrappers and fail the whole Ray task)
                raise ValueError(f"GIF LZW: code {code} beyond table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(table[prev] + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = code
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W) uint8 if the used palette is grayscale, else
    (H, W, 3). First image frame only; interlace unsupported."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    sw, sh, flags, _bg, _par = struct.unpack_from("<HHBBB", data, pos)
    pos += 7
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            pal = gct
            if iflags & 0x80:
                size = 2 << (iflags & 0x07)
                pal = np.frombuffer(data, np.uint8, size * 3, pos) \
                    .reshape(size, 3)
                pos += size * 3
            if pal is None:
                raise ValueError("GIF image without a color table")
            mcs = data[pos]
            pos += 1
            chunks = bytearray()
            while data[pos]:
                ln = data[pos]
                chunks += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                bytes(_lzw_decode_gif(bytes(chunks), mcs, w * h)), np.uint8
            )
            if len(idx) < w * h:
                idx = np.concatenate(
                    [idx, np.zeros(w * h - len(idx), np.uint8)])
            idx = idx[: w * h]
            rgb = pal[idx].reshape(h, w, 3)
            if (rgb[:, :, 0] == rgb[:, :, 1]).all() and \
                    (rgb[:, :, 1] == rgb[:, :, 2]).all():
                return np.ascontiguousarray(rgb[:, :, 0])
            return rgb
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")
