"""Pure-Python PNG codec (stdlib zlib + numpy — no image libs in the env).

The pixel-decode analog of the reference's PIL/cv2 ingestion
(core/run.py:660-676 ``Image.open`` → ``np.asarray``): a PNG byte payload
becomes a uint8 ndarray that the multimodal feature stages consume. This
retires the last ``fake=True`` stub in :mod:`xhs_ocr_ray.stages.multimodal`
for the dominant screenshot format.

Scope (documented, deliberate):

- bit depth 8 only; color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha) and 6 (RGBA); interlace 0 (no Adam7);
- all five scanline filters (None/Sub/Up/Average/Paeth) — None/Sub/Up
  unfilter vectorized per row (Sub is a per-lane modular cumsum), the
  rarely-emitted Average/Paeth fall back to a per-pixel loop;
- chunk CRCs are verified; any structural violation raises ``ValueError``
  (callers degrade row-locally, the engine pattern).

The encoder exists for the deterministic synthetic corpus and fixtures:
it emits standards-valid files (signature, IHDR/IDAT/IEND, correct CRCs)
with a per-row choice of filter 0/1/2 so decoders — ours included — are
exercised against real filter structure.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filters: int | list[int] = 0,
               level: int = 6) -> bytes:
    """uint8 array → PNG bytes. 2D → grayscale; (H, W, 3) → RGB;
    (H, W, 4) → RGBA. ``filters`` is a filter type (0/1/2) applied to every
    row, or a per-row list — deterministic output either way."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, h, w, ch = 0, a.shape[0], a.shape[1], 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, (h, w, ch) = 2, a.shape
    elif a.ndim == 3 and a.shape[2] == 4:
        color, (h, w, ch) = 6, a.shape
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    row_filters = filters if isinstance(filters, list) else [filters] * h
    if len(row_filters) != h:
        raise ValueError("per-row filter list length != height")
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        row = a[y]
        f = row_filters[y]
        if f == 0:
            filt = row
        elif f == 1:  # Sub: delta vs the previous pixel in the row
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            filt = row - left  # uint8 wraparound == mod-256 delta
        elif f == 2:  # Up: delta vs the same pixel of the previous row
            filt = row - prev
        else:
            raise ValueError(f"encoder supports filters 0/1/2, got {f}")
        raw.append(f)
        raw += filt.tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT payload length mismatch")
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = data[:, 0]
    rows = data[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        row = rows[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub — per-lane modular prefix sum, vectorized
            lanes = row.reshape(w, ch).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up — uint8 wraparound add, vectorized
            rec = row + prev
        elif f == 3:  # Average — sequential in x (left-neighbor dependency)
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                if pa_ <= pb_ and pa_ <= pc_:
                    pred = left
                elif pb_ <= pc_:
                    pred = up
                else:
                    pred = ul
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, ch)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 ndarray: (H, W) for grayscale, (H, W, C) otherwise
    (palette images are expanded to RGB). Raises ``ValueError`` on anything
    structurally invalid or out of the documented scope."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace method")
    if w == 0 or h == 0:
        raise ValueError("zero-sized image")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, w, h, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = px.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if ch == 1:
        return px.reshape(h, w)
    return px
