import math

from xhs_ocr_ray.layout.gap_tree import group_nodes, reading_order
from xhs_ocr_ray.layout.lines import get_lines, line_text
from xhs_ocr_ray.layout.paragraph import render, set_ends, split_paragraphs
from xhs_ocr_ray.layout.parsers import get_parser, simple_sort
from xhs_ocr_ray.layout.preprocess import (
    box_angle_deg,
    estimate_rotation_deg,
    preprocess_blocks,
)


def tb(x0, y0, x1, y1, text="t", score=1.0):
    return {
        "box": [[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
        "score": score,
        "text": text,
    }


def test_preprocess_sorts_and_bboxes():
    blocks = [tb(0, 20, 10, 30, "b"), tb(0, 0, 10, 10, "a")]
    out = preprocess_blocks(blocks)
    assert [b["text"] for b in out] == ["a", "b"]
    assert out[0]["normalized_bbox"] == (0, 0, 10, 10)


def test_rotation_estimation_and_correction():
    # Boxes rotated by 10° around origin.
    theta = math.radians(10)
    c, s = math.cos(theta), math.sin(theta)

    def rot(p):
        return [p[0] * c - p[1] * s, p[0] * s + p[1] * c]

    blocks = []
    for y in (0, 20, 40):
        pts = [[0, y], [100, y], [100, y + 10], [0, y + 10]]
        blocks.append({"box": [rot(p) for p in pts], "score": 1.0, "text": str(y)})
    assert abs(estimate_rotation_deg(blocks) - 10) < 0.5
    out = preprocess_blocks(blocks)
    # After correction the boxes are ~axis-aligned and sorted by y.
    assert [b["text"] for b in out] == ["0", "20", "40"]
    for b in out:
        x0, y0, x1, y1 = b["normalized_bbox"]
        assert (y1 - y0) < 14  # no longer inflated by rotation


def test_box_angle_normalized_range():
    assert -90 <= box_angle_deg([[0, 0], [10, 0], [10, 2], [0, 2]]) < 90


def test_simple_sort_rows():
    blocks = [tb(50, 2, 60, 10, "b"), tb(0, 0, 10, 10, "a"), tb(0, 40, 10, 50, "c")]
    assert [b["text"] for b in simple_sort(blocks)] == ["a", "b", "c"]


def test_gap_tree_two_columns():
    left = [tb(0, i * 14, 100, i * 14 + 10, f"L{i}") for i in range(3)]
    right = [tb(160, i * 14, 260, i * 14 + 10, f"R{i}") for i in range(3)]
    order = [b["text"] for b in reading_order(left + right)]
    assert order == ["L0", "L1", "L2", "R0", "R1", "R2"]


def test_gap_tree_single_column_untouched():
    blocks = [tb(0, i * 14, 100, i * 14 + 10, f"B{i}") for i in range(4)]
    assert [b["text"] for b in reading_order(blocks)] == ["B0", "B1", "B2", "B3"]


def test_gap_tree_full_width_header_then_columns():
    header = tb(0, 0, 260, 10, "H")
    left = [tb(0, 20 + i * 14, 100, 30 + i * 14, f"L{i}") for i in range(2)]
    right = [tb(160, 20 + i * 14, 260, 30 + i * 14, f"R{i}") for i in range(2)]
    order = [b["text"] for b in reading_order([header] + left + right)]
    assert order == ["H", "L0", "L1", "R0", "R1"]


def test_group_nodes_groups_columns():
    left = [tb(0, i * 14, 100, i * 14 + 10, f"L{i}") for i in range(2)]
    right = [tb(160, i * 14, 260, i * 14 + 10, f"R{i}") for i in range(2)]
    groups = group_nodes(left + right)
    texts = [[b["text"] for b in g] for g in groups]
    assert texts == [["L0", "L1"], ["R0", "R1"]]


def test_get_lines_merges_fragments():
    a = tb(0, 0, 50, 10, "hello")
    b = tb(55, 1, 100, 11, "world")
    c = tb(0, 30, 60, 40, "below")
    lines = get_lines([c, a, b])
    assert len(lines) == 2
    assert line_text(lines[0]) == "hello world"
    assert line_text(lines[1]) == "below"


def test_line_text_wide_gap_forces_space():
    a = tb(0, 0, 30, 10, "中文")
    b = tb(100, 0, 130, 10, "文本")  # gap 70 > 1.5*10
    assert line_text([a, b]) == "中文 文本"
    b2 = tb(32, 0, 62, 10, "文本")
    assert line_text([a, b2]) == "中文文本"


def test_paragraph_grouping_and_render():
    # Two 2-line paragraphs separated by a large vertical gap.
    p1 = [tb(0, 0, 200, 10, "line one"), tb(0, 12, 200, 22, "line two")]
    p2 = [tb(0, 60, 200, 70, "line three"), tb(0, 72, 200, 82, "line four")]
    paras = split_paragraphs(p1 + p2)
    assert [len(p) for p in paras] == [2, 2]
    out = set_ends(p1 + p2)
    assert render(out) == "line one line two\nline three line four\n"


def test_paragraph_short_line_breaks():
    blocks = [
        tb(0, 0, 200, 10, "full width line"),
        tb(0, 12, 60, 22, "short end."),
        tb(0, 24, 200, 34, "new para starts"),
    ]
    paras = split_paragraphs(blocks)
    # The short second line terminates its paragraph.
    assert [len(p) for p in paras] == [2, 1]


def test_parser_registry_fallback():
    assert get_parser("nope") is get_parser("unknown")
    blocks = [tb(0, 0, 10, 10, "x")]
    out = get_parser("none")(blocks)
    assert out[0]["end"] == "\n"


def test_multi_para_two_columns_end_to_end():
    left = [tb(0, i * 14, 100, i * 14 + 10, f"left{i}") for i in range(2)]
    right = [tb(160, i * 14, 260, i * 14 + 10, f"right{i}") for i in range(2)]
    out = get_parser("multi_para")(left + right)
    assert render(out) == "left0 left1\nright0 right1\n"


def test_single_code_preserves_indent():
    blocks = [
        tb(0, 0, 100, 10, "def f():"),
        tb(20, 14, 120, 24, "return 1"),
    ]
    out = get_parser("single_code")(blocks)
    text = render(out)
    assert text == "def f():\n  return 1\n" or text == "def f():\n    return 1\n"
