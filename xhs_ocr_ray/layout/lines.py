"""Greedy line assembly for single-column block streams (SURVEY.md §2.4 L6).

Fragments on the same visual line are merged left-to-right; a fragment joins
the current line when it vertically overlaps within half a line height, its
height is comparable (≤1.5×), and it does not start left of the previous
fragment's right edge minus one line height. An oversized horizontal gap
(>1.5× line height) forces a ``" "`` separator regardless of CJK rules.

Fresh implementation of the behavior of tbpu/parser_single_line.py:13-62.
"""

from __future__ import annotations

from xhs_ocr_ray.layout.preprocess import Block, bbox_of
from xhs_ocr_ray.layout.separators import word_separator

WIDE_GAP_FACTOR = 1.5
HEIGHT_RATIO_MAX = 1.5
VCENTER_TOL_FACTOR = 0.5


def get_lines(blocks: list[Block]) -> list[list[Block]]:
    """Group blocks into visual lines; lines sorted by top, fragments by left."""
    if not blocks:
        return []
    ordered = sorted(blocks, key=lambda tb: (bbox_of(tb)[1], bbox_of(tb)[0]))
    lines: list[list[Block]] = []
    for tb in ordered:
        x0, y0, x1, y1 = bbox_of(tb)
        h = y1 - y0
        cy = (y0 + y1) / 2.0
        placed = False
        for line in lines:
            px0, py0, px1, py1 = bbox_of(line[-1])
            ph = py1 - py0
            pcy = (py0 + py1) / 2.0
            ref_h = max(h, ph, 1e-9)
            if (
                abs(cy - pcy) <= VCENTER_TOL_FACTOR * ref_h
                and max(h, ph) <= HEIGHT_RATIO_MAX * max(min(h, ph), 1e-9)
                and x0 >= px1 - ref_h
            ):
                line.append(tb)
                placed = True
                break
        if not placed:
            lines.append([tb])
    lines.sort(key=lambda ln: bbox_of(ln[0])[1])
    for line in lines:
        line.sort(key=lambda tb: bbox_of(tb)[0])
    return lines


def line_text(line: list[Block]) -> str:
    """Merge one line's fragments, forcing ``" "`` across oversized gaps."""
    parts: list[str] = []
    prev: Block | None = None
    for tb in line:
        if prev is not None:
            _, py0, px1, py1 = bbox_of(prev)
            x0, y0, _, y1 = bbox_of(tb)
            h = max(py1 - py0, y1 - y0, 1e-9)
            if x0 - px1 > WIDE_GAP_FACTOR * h:
                sep = " "
            else:
                sep = word_separator(prev["text"], tb["text"])
            if sep:
                parts.append(sep)
        parts.append(tb["text"])
        prev = tb
    return "".join(parts)
