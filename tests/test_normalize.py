from xhs_ocr_ray.functions.normalize import (
    canonical_doc_class,
    content_type_of,
    normalize_lines,
    pair_lines,
    parse_cn_number,
)


def test_normalize_strips_cjk_then_replaces():
    assert normalize_lines(["播放量1024"]) == ["1024"]
    assert normalize_lines(["12 秒"]) == ["12"]
    assert normalize_lines(["1o24"]) == ["1024"]
    assert normalize_lines(["<b>55</b>"]) == ["55"]


def test_normalize_drops_empty_lines():
    assert normalize_lines(["中文", "42"]) == ["42"]


def test_normalize_keep_cjk():
    assert normalize_lines(["中文42"], strip_cjk=False) == ["中文42"]


def test_pair_lines():
    assert pair_lines(["a", "1", "b", "2"], expected=4) == ["a:1|b:2"]
    assert pair_lines(["a", "1", "b"], expected=4) == []
    assert pair_lines(["a"], expected=1) == []  # odd expected → nothing


def test_doc_class_helpers():
    assert canonical_doc_class("video12") == "video"
    assert content_type_of("video_top") == "video"
    assert content_type_of("note") == "article"


def test_parse_cn_number():
    assert parse_cn_number("1.5万") == 15000.0
    assert parse_cn_number("3亿") == 300000000.0
    assert parse_cn_number("7") == 7.0
    assert parse_cn_number("2k") == 2000.0
    assert parse_cn_number("") == 0.0
    assert parse_cn_number("n/a") == 0.0
