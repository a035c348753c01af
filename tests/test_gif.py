"""GIF codec (xhs_ocr_ray/gif) + ImageDecode GIF path."""

import numpy as np
import pyarrow as pa
import pytest


def test_gif_roundtrip_compressed_and_literal():
    from xhs_ocr_ray.gif import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 256, (12, 16)),       # incompressible
        rng.integers(0, 4, (64, 64)),          # deep dictionary
        np.tile(np.arange(100, dtype=np.uint8), (50, 3))[:, :250],
        np.zeros((80, 80), np.uint8),          # KwKwK runs
        rng.integers(0, 2, (200, 200)),        # 10/11/12-bit widths + 4096 cap
        np.array([[7]], np.uint8),
    ]
    for img in cases:
        img = img.astype(np.uint8)
        assert (decode_gif(encode_gif(img)) == img).all()
        assert (decode_gif(encode_gif(img, compress=False)) == img).all()


def test_gif_decode_rejects_garbage_and_interlace():
    from xhs_ocr_ray.gif import decode_gif, encode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" * 4)
    gif = bytearray(encode_gif(np.zeros((4, 4), np.uint8)))
    # image descriptor = 6 (header) + 7 (LSD) + 768 (palette); flip interlace
    idx = 6 + 7 + 768
    assert gif[idx] == 0x2C
    gif[idx + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(gif))


def test_image_decode_handles_gif_payloads():
    from xhs_ocr_ray.gif import encode_gif
    from xhs_ocr_ray.stages.multimodal import ImageDecode

    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_gif(img)], pa.binary()),
        "width": pa.array([8], pa.int32()),
        "height": pa.array([6], pa.int32()),
    })
    out = ImageDecode()(batch).to_pandas()
    assert out.dec_width.tolist() == [8] and out.dec_height.tolist() == [6]
    assert out.mean_val.tolist() == [float(img.sum()) / img.size]


def test_bmp_roundtrip_and_image_decode():
    from xhs_ocr_ray.bmp import decode_bmp, encode_bmp
    from xhs_ocr_ray.stages.multimodal import ImageDecode

    rng = np.random.default_rng(5)
    for shape in [(12, 16), (5, 7), (3, 1)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
    with pytest.raises(ValueError):
        decode_bmp(b"XX nope")
    img = np.arange(35, dtype=np.uint8).reshape(5, 7)
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_bmp(img)], pa.binary()),
        "width": pa.array([7], pa.int32()),
        "height": pa.array([5], pa.int32()),
    })
    out = ImageDecode()(batch).to_pandas()
    assert out.dec_width.tolist() == [7] and out.dec_height.tolist() == [5]
    assert out.mean_val.tolist() == [float(img.sum()) / img.size]
