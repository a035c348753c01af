"""Ray-free unit tests for capture-dir url reconstruction and the
row-local image-decode tolerance contract."""

import numpy as np
import pyarrow as pa
import pytest

from xhs_ocr_ray.sources.capture import _url_of


def test_url_of_index_component_maps_to_dir():
    assert _url_of("host.com/index.html") == "https://host.com/"
    assert _url_of("host.com/a/b/index.html") == "https://host.com/a/b/"


def test_url_of_index_suffix_stems_not_mangled():
    # myindex.html and my.html are DIFFERENT pages — a suffix-based strip
    # would collide them on url and first-wins dedup would drop one.
    assert _url_of("host.com/myindex.html") == "https://host.com/myindex"
    assert _url_of("host.com/reindex.html") == "https://host.com/reindex"
    assert _url_of("host.com/my.html") == "https://host.com/my"


def test_url_of_plain_paths():
    assert _url_of("host.com/a/b.html") == "https://host.com/a/b"
    assert _url_of("host.com") == "https://host.com/"


def test_naive_capture_ts_is_utc(monkeypatch):
    # A naive ISO --capture-ts must mean UTC regardless of host TZ.
    import os
    import time

    from xhs_ocr_ray.sources.capture import _ts_us_of

    monkeypatch.setenv("TZ", "America/New_York")
    time.tzset()
    try:
        # 2024-01-02T03:04:05 UTC == 1704164645 s since epoch, exactly
        assert _ts_us_of("2024-01-02T03:04:05") == 1704164645 * 1_000_000
        # explicit offset still honored
        assert _ts_us_of("2024-01-02T03:04:05+02:00") == (
            1704164645 - 7200) * 1_000_000
        # ints pass through as µs
        assert _ts_us_of(42) == 42
    finally:
        os.environ.pop("TZ", None)
        time.tzset()


def test_gif_lzw_bad_first_code_raises_valueerror():
    from xhs_ocr_ray.gif.codec import _lzw_decode_gif

    # mcs=2 → codes 0..3 data, 4=clear, 5=eoi, table size 6. A first code
    # beyond the table (7) must raise the codec's ValueError, not IndexError.
    # 3-bit codes LSB-first: clear(4)=100, then 7=111 → byte 0b00111100=0x3C.
    with pytest.raises(ValueError):
        _lzw_decode_gif(bytes([0x3C]), mcs=2, n_pixels=4)


def test_image_decode_quarantines_corrupt_payload_row_locally():
    from xhs_ocr_ray.stages.multimodal import ImageDecode
    from xhs_ocr_ray.sources.media import png_media_from_documents

    good = png_media_from_documents(pa.table({"doc_id": pa.array([1, 2], pa.int64())}))
    # corrupt: valid PNG signature, garbage body → codec ValueError
    bad_payload = b"\x89PNG\r\n\x1a\x08" + b"\x00" * 16  # broken sig tail
    corrupt = b"\x89PNG\r\n\x1a\n" + b"junk" * 4
    tbl = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array(
            [good.column("payload")[0].as_py(), corrupt,
             good.column("payload")[1].as_py()], pa.binary()),
        "width": pa.array([0, 0, 0], pa.int32()),
        "height": pa.array([0, 0, 0], pa.int32()),
    })
    out = ImageDecode()(tbl)
    status = out.column("status").to_pylist()
    assert status == ["ok", "failed_decode", "ok"]
    assert out.column("mean_val").to_pylist()[1] is None
    assert out.column("dec_width").to_pylist()[1] == 0
    # healthy rows unaffected
    assert out.column("mean_val").to_pylist()[0] is not None
    assert bad_payload  # silence lint on helper
