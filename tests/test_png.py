"""PNG codec: hand-built spec fixtures (all five filters), round trips,
palette expansion, structural error handling, and the real ImageDecode path.

The all-filters fixture is constructed BY HAND from the PNG spec's filter
definitions (not via encode_png), so decoder and encoder cannot share a
common bug on the filter math.
"""

import struct
import zlib

import numpy as np
import pytest

from xhs_ocr_ray.png import decode_png, encode_png


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _png(w, h, color, raw, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


# 3×5 grayscale, one row per filter type; filtered bytes derived by hand
# from the spec: Sub/Up/Average/Paeth predictors applied to these targets.
_WANT = np.array(
    [[10, 20, 30],
     [5, 250, 7],
     [15, 0, 200],
     [100, 110, 120],
     [1, 2, 3]], dtype=np.uint8)
_RAW = bytes(
    [0, 10, 20, 30,          # None
     1, 5, 245, 13,          # Sub:   5, 250-5, 7-250 (mod 256)
     2, 10, 6, 193,          # Up:    15-5, 0-250, 200-7 (mod 256)
     3, 93, 60, 221,         # Average: x-(left+up)//2
     4, 157, 1, 1])          # Paeth


def test_decode_all_filters_hand_fixture():
    got = decode_png(_png(3, 5, 0, _RAW))
    assert got.dtype == np.uint8 and got.shape == (5, 3)
    assert (got == _WANT).all()


def test_decode_palette():
    # 2×2 palette image: indices [[0,1],[2,0]], filter 0 rows
    raw = bytes([0, 0, 1, 0, 2, 0])
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    got = decode_png(_png(2, 2, 3, raw, plte=plte))
    assert got.shape == (2, 2, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]


@pytest.mark.parametrize("shape", [(7, 5), (4, 9, 3), (3, 3, 4)])
@pytest.mark.parametrize("filt", [0, 1, 2])
def test_roundtrip(shape, filt):
    rng = np.random.default_rng(hash((shape, filt)) & 0xFFFF)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(encode_png(arr, filters=filt))
    want = arr if arr.ndim > 2 else arr
    assert got.shape == (want.shape if want.ndim > 2 else want.shape)
    assert (got == want).all()


def test_roundtrip_mixed_row_filters():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    filters = [0, 1, 2, 2, 1, 0]
    assert (decode_png(encode_png(arr, filters=filters)) == arr).all()


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((2, 2), np.uint8))
    corrupt = bytearray(good)
    corrupt[-6] ^= 0xFF  # flip a byte inside IEND CRC
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated
    # 16-bit depth out of scope
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad)


def test_image_decode_real_png_batch():
    """ImageDecode consumes real PNG payloads with no fake= needed and
    reports exact decoded dims + mean."""
    import pyarrow as pa

    from xhs_ocr_ray.stages.multimodal import MEDIA_SCHEMA, ImageDecode

    imgs = [
        np.full((4, 6), 10, np.uint8),
        np.arange(60, dtype=np.uint8).reshape(5, 4, 3),
    ]
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array([encode_png(i, filters=1) for i in imgs],
                                pa.binary()),
            "width": pa.array([0, 0], pa.int32()),   # declared dims ignored
            "height": pa.array([0, 0], pa.int32()),
            "duration_ms": pa.array([0, 0], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = ImageDecode()(batch)
    assert out.column("dec_width").to_pylist() == [6, 4]
    assert out.column("dec_height").to_pylist() == [4, 5]
    means = out.column("mean_val").to_pylist()
    assert means[0] == 10.0
    assert means[1] == float(imgs[1].sum()) / imgs[1].size
    assert all(len(f) == 64 for f in out.column("feature").to_pylist())


def test_png_media_source_closed_form():
    """The synthetic PNG corpus decodes back to its closed-form geometry
    and mean (the oracle contract of the png_features query)."""
    import pyarrow as pa

    from xhs_ocr_ray.sources.media import png_media_from_documents
    from xhs_ocr_ray.stages.multimodal import ImageDecode

    docs = pa.table({"doc_id": pa.array(list(range(40)), pa.int64())})
    media = png_media_from_documents(docs)
    out = ImageDecode()(media)
    for i, doc_id in enumerate(range(40)):
        w, h = 16 + doc_id % 7, 12 + doc_id % 5
        c1, c2 = doc_id % 256, (doc_id * 7) % 251
        assert out.column("dec_width")[i].as_py() == w
        assert out.column("dec_height")[i].as_py() == h
        want = (c1 * (w // 2) * h + c2 * (w - w // 2) * h) / (w * h)
        assert out.column("mean_val")[i].as_py() == want


def test_render_overlay_png():
    """L15 image overlay: boxes outline + order-ramped corner markers."""
    from xhs_ocr_ray.stages.debug_sink import render_overlay_png

    blocks = [
        {"box": [[2, 2], [20, 2], [20, 10], [2, 10]], "score": 1.0, "text": "a"},
        {"box": [[2, 14], [20, 14], [20, 22], [2, 22]], "score": 1.0, "text": "b"},
    ]
    img = decode_png(render_overlay_png(blocks))
    assert img[2, 8:21].max() <= 90          # top outline of box 0 (past marker)
    assert img[14, 8:21].max() <= 90         # top outline of box 1 (past marker)
    assert img[0, 0] == 255                  # background untouched
    assert img[3, 3] < img[15, 3]            # order marker: earlier = darker
    assert decode_png(render_overlay_png([])).shape == (16, 16)
