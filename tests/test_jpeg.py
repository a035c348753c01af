"""Pure-Python baseline JPEG codec + ImageDecode integration."""

import numpy as np
import pyarrow as pa
import pytest

from xhs_ocr_ray.jpeg import decode_jpeg, encode_jpeg


def test_block_uniform_gray_roundtrips_exactly():
    """Every 8×8 block uniform + flat quant ⇒ DC-only blocks with exact
    integer coefficients ⇒ bit-exact decode (the jpeg_features oracle)."""
    for doc_id in (0, 5, 13, 250, 1234):
        w, h = 16 + doc_id % 7, 12 + doc_id % 5
        img = np.full((h, w), (doc_id * 7) % 251, dtype=np.uint8)
        img[:, :8] = doc_id % 256
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (h, w)
        assert np.array_equal(out, img), doc_id


def test_random_gray_quant1_within_one_level():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (37, 41), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_quantization_actually_compresses_and_degrades_gracefully():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    fine = encode_jpeg(img, quant=1)
    coarse = encode_jpeg(img, quant=32)
    assert len(coarse) < len(fine)  # coarser table → shorter stream
    out = decode_jpeg(coarse)
    assert out.shape == img.shape  # lossy but structurally intact


def test_color_444_and_420():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 28, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling="444"))
    assert out.shape == (24, 28, 3)
    # color conversion round-trips within a few levels at quant=1
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
    flat = np.full((20, 26, 3), (90, 160, 30), dtype=np.uint8)
    out420 = decode_jpeg(encode_jpeg(flat, subsampling="420"))
    assert out420.shape == (20, 26, 3)
    assert np.abs(out420.astype(int) - flat.astype(int)).max() <= 1


def test_restart_intervals_roundtrip():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (33, 50), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img))
    with_rst = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_odd_dimensions_crop_correctly():
    img = np.arange(9 * 11, dtype=np.uint8).reshape(9, 11) % 200
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (9, 11)


def test_corrupt_and_unsupported_raise_valueerror():
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(good[:30])  # truncated in the header segments
    # progressive SOF2 is rejected loudly, not mis-decoded
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))


def test_image_decode_routes_jpeg_without_fake():
    from xhs_ocr_ray.stages.multimodal import MEDIA_SCHEMA, ImageDecode

    img = np.full((12, 16), 7, dtype=np.uint8)
    img[:, :8] = 201
    payload = encode_jpeg(img)
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["image"], pa.string()),
            "payload": pa.array([payload], pa.binary()),
            "width": pa.array([16], pa.int32()),
            "height": pa.array([12], pa.int32()),
            "duration_ms": pa.array([0], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = ImageDecode()(batch).to_pandas()  # no fake= needed for JPEG
    assert out.iloc[0]["status"] == "ok"
    assert out.iloc[0]["dec_width"] == 16 and out.iloc[0]["dec_height"] == 12
    want_mean = (201 * 8 * 12 + 7 * 8 * 12) / (16 * 12)
    assert out.iloc[0]["mean_val"] == want_mean
