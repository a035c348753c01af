"""Pure-Python BMP codec (stdlib-only): the uncompressed sibling of
``xhs_ocr_ray.png`` / ``xhs_ocr_ray.gif``. Decoder handles BITMAPINFOHEADER
8-bpp palette and 24-bpp BGR, bottom-up or top-down, 4-byte row padding;
encoder writes 8-bpp grayscale (fixture writer)."""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W) uint8 grayscale → 8-bpp palette BMP (bottom-up)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"encode_bmp: expected 2-D grayscale, got {arr.shape}")
    h, w = a.shape
    stride = (w + 3) & ~3
    palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
    rows = bytearray()
    pad = b"\x00" * (stride - w)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += a[y].tobytes() + pad
    off = 14 + 40 + len(palette)
    header = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows),
                      2835, 2835, 256, 0)
    return header + dib + palette + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H, W) uint8 (grayscale palette) or (H, W, 3) RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h = struct.unpack_from("<Iii", data, 14)
    if hsize < 40:
        raise NotImplementedError("BITMAPCOREHEADER unsupported")
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (method {comp}) unsupported")
    top_down = h < 0
    h = abs(h)
    stride = ((w * bpp + 31) // 32) * 4
    px = np.frombuffer(data, np.uint8, stride * h, off) \
        .reshape(h, stride)
    if not top_down:
        px = px[::-1]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal = np.frombuffer(data, np.uint8, n_colors * 4, 14 + hsize) \
            .reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRx -> RGB
        idx = px[:, :w]
        rgb = pal[idx]
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() and \
                (rgb[:, :, 1] == rgb[:, :, 2]).all():
            return np.ascontiguousarray(rgb[:, :, 0])
        return rgb
    if bpp == 24:
        row = px[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(row[:, :, ::-1])  # BGR -> RGB
    raise NotImplementedError(f"{bpp}-bpp BMP unsupported")
