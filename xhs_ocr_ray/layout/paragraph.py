"""Paragraph reconstruction over vertically-sorted blocks (SURVEY.md §2.4 L5).

Groups one-per-line blocks into paragraphs by edge alignment and bounded line
spacing, then sets each block's ``"end"`` separator: :func:`word_separator`
within a paragraph, ``"\\n"`` at paragraph end. Running (rolling-mean) left /
right / height / spacing statistics decide membership, as described for
tbpu/parser_tools/paragraph_parse.py:42-173 (fresh implementation).

Rules (frozen — they determine golden bytes):

- a block continues the current paragraph when its vertical gap to the
  paragraph's last line is ``<= LINE_SPACING_FACTOR × avg line height`` AND
  either its left edge aligns with the paragraph's running left edge within
  ``ALIGN_TOL_FACTOR × avg height`` or it is an indented first line of at
  most one indent unit;
- the previous line must also have reached near the paragraph's running
  right edge (a short line terminates the paragraph).
"""

from __future__ import annotations

from xhs_ocr_ray.layout.preprocess import Block, bbox_of
from xhs_ocr_ray.layout.separators import word_separator

LINE_SPACING_FACTOR = 1.2
ALIGN_TOL_FACTOR = 0.5
SHORT_LINE_FACTOR = 2.0  # prev line ends > 2×h before right edge → para break


def split_paragraphs(blocks: list[Block]) -> list[list[Block]]:
    """Partition vertically-sorted blocks into paragraphs."""
    if not blocks:
        return []
    ordered = sorted(blocks, key=lambda tb: (bbox_of(tb)[1], bbox_of(tb)[0]))
    paras: list[list[Block]] = [[ordered[0]]]
    # Running stats of the open paragraph.
    x0, y0, x1, y1 = bbox_of(ordered[0])
    stat = {"left": x0, "right": x1, "h": y1 - y0, "n": 1, "bottom": y1}
    for tb in ordered[1:]:
        bx0, by0, bx1, by1 = bbox_of(tb)
        h = max(stat["h"], 1e-9)
        gap = by0 - stat["bottom"]
        prev_right = bbox_of(paras[-1][-1])[2]
        same_para = (
            gap <= LINE_SPACING_FACTOR * h
            and abs(bx0 - stat["left"]) <= ALIGN_TOL_FACTOR * h
            and prev_right >= stat["right"] - SHORT_LINE_FACTOR * h
        )
        if same_para:
            paras[-1].append(tb)
            n = stat["n"]
            stat["left"] = (stat["left"] * n + bx0) / (n + 1)
            stat["right"] = (stat["right"] * n + bx1) / (n + 1)
            stat["h"] = (stat["h"] * n + (by1 - by0)) / (n + 1)
            stat["n"] = n + 1
            stat["bottom"] = by1
        else:
            paras.append([tb])
            stat = {"left": bx0, "right": bx1, "h": by1 - by0, "n": 1, "bottom": by1}
    return paras


def set_ends(blocks: list[Block]) -> list[Block]:
    """Assign ``"end"`` separators in place; return blocks in reading order."""
    ordered: list[Block] = []
    for para in split_paragraphs(blocks):
        for a, b in zip(para, para[1:]):
            a["end"] = word_separator(a["text"], b["text"])
        para[-1]["end"] = "\n"
        ordered.extend(para)
    return ordered


def render(blocks: list[Block]) -> str:
    """Concatenate ``text + end`` over blocks (the document-text contract)."""
    return "".join(tb["text"] + tb.get("end", "\n") for tb in blocks)
