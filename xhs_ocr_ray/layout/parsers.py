"""Layout-parser registry (SURVEY.md §2.4 L1, L7-L14).

Each parser is a pure function ``blocks -> blocks`` that orders blocks and
assigns each block's ``"end"`` separator; document text is then
``"".join(tb.text + tb.end)``. The registry mirrors the reference's parser
keys (tbpu/__init__.py:14-29): ``none, multi_para, multi_line, multi_none,
single_para, single_line, single_none, single_code`` — this is the
user-extension surface (register your own with :func:`register_parser`).
"""

from __future__ import annotations

from collections.abc import Callable

from xhs_ocr_ray.layout import gap_tree, lines as lines_mod, paragraph
from xhs_ocr_ray.layout.preprocess import (
    Block,
    bbox_of,
    bbox_to_box,
    preprocess_blocks,
    union_bbox,
)
from xhs_ocr_ray.layout.separators import join_fragments, word_separator

Parser = Callable[[list[Block]], list[Block]]

SAME_ROW_TOL = 20.0  # px tolerance of the simple y-then-x sort (L14)


def simple_sort(blocks: list[Block], tol: float = SAME_ROW_TOL) -> list[Block]:
    """y-then-x reading order: blocks whose tops differ by ≤ ``tol`` are one
    row, sorted by x within the row (reference: core/ocr.py:58-108)."""
    if not blocks:
        return blocks
    ordered = sorted(blocks, key=lambda tb: bbox_of(tb)[1])
    rows: list[list[Block]] = [[ordered[0]]]
    row_top = bbox_of(ordered[0])[1]
    for tb in ordered[1:]:
        top = bbox_of(tb)[1]
        if top - row_top <= tol:
            rows[-1].append(tb)
        else:
            rows.append([tb])
            row_top = top
    out: list[Block] = []
    for row in rows:
        row.sort(key=lambda tb: bbox_of(tb)[0])
        out.extend(row)
    return out


def parser_none(blocks: list[Block]) -> list[Block]:
    for tb in blocks:
        tb.setdefault("end", "\n")
    return blocks


def multi_para(blocks: list[Block]) -> list[Block]:
    blocks = preprocess_blocks(blocks)
    out: list[Block] = []
    for grp in gap_tree.group_nodes(blocks):
        out.extend(paragraph.set_ends(grp))
    return out


def multi_line(blocks: list[Block]) -> list[Block]:
    blocks = preprocess_blocks(blocks)
    out = gap_tree.reading_order(blocks)
    for tb in out:
        tb["end"] = "\n"
    return out


def multi_none(blocks: list[Block]) -> list[Block]:
    blocks = preprocess_blocks(blocks)
    out = gap_tree.reading_order(blocks)
    for a, b in zip(out, out[1:]):
        a["end"] = word_separator(a["text"], b["text"])
    if out:
        out[-1]["end"] = "\n"
    return out


def _lines_as_blocks(blocks: list[Block]) -> list[Block]:
    """Assemble visual lines, each wrapped as one pseudo-block."""
    out: list[Block] = []
    for line in lines_mod.get_lines(blocks):
        bb = union_bbox(line)
        out.append(
            {
                "box": bbox_to_box(bb),
                "normalized_bbox": bb,
                "score": (sum(tb.get("score", 1.0) for tb in line) / len(line)),
                "text": lines_mod.line_text(line),
            }
        )
    return out


def single_para(blocks: list[Block]) -> list[Block]:
    blocks = preprocess_blocks(blocks)
    return paragraph.set_ends(_lines_as_blocks(blocks))


def single_line(blocks: list[Block]) -> list[Block]:
    blocks = preprocess_blocks(blocks)
    out = _lines_as_blocks(blocks)
    for tb in out:
        tb["end"] = "\n"
    return out


def single_none(blocks: list[Block]) -> list[Block]:
    blocks = preprocess_blocks(blocks)
    out = _lines_as_blocks(blocks)
    for a, b in zip(out, out[1:]):
        a["end"] = word_separator(a["text"], b["text"])
    if out:
        out[-1]["end"] = "\n"
    return out


def single_code(blocks: list[Block]) -> list[Block]:
    """Whitespace-preserving code layout (tbpu/parser_single_code.py:9-74).

    Merges each visual line inserting ``"  " × round(gap / line_height)``
    between fragments, then reconstructs indentation by bucketing line starts
    into line-height-spaced levels.
    """
    blocks = preprocess_blocks(blocks)
    vlines = lines_mod.get_lines(blocks)
    merged: list[Block] = []
    for line in vlines:
        bb = union_bbox(line)
        h = max(bb[3] - bb[1], 1e-9)
        parts: list[str] = []
        prev_right = None
        for tb in line:
            x0, _, x1, _ = bbox_of(tb)
            if prev_right is not None:
                parts.append("  " * max(0, round((x0 - prev_right) / h)))
            parts.append(tb["text"])
            prev_right = x1
        merged.append(
            {
                "box": bbox_to_box(bb),
                "normalized_bbox": bb,
                "score": sum(tb.get("score", 1.0) for tb in line) / len(line),
                "text": "".join(parts),
                "end": "\n",
            }
        )
    if not merged:
        return merged
    # Indent levels: bucket left edges into line-height-spaced levels.
    h_med = sorted(bb[3] - bb[1] for bb in (bbox_of(tb) for tb in merged))[len(merged) // 2]
    h_med = max(h_med, 1e-9)
    left0 = min(bbox_of(tb)[0] for tb in merged)
    for tb in merged:
        level = round((bbox_of(tb)[0] - left0) / h_med)
        tb["text"] = "  " * max(0, level) + tb["text"]
    return merged


def multi_none_joined(blocks: list[Block]) -> str:
    """Convenience: reading order + separator join into one string."""
    out = multi_none(blocks)
    return join_fragments([tb["text"] for tb in out])


PARSER_REGISTRY: dict[str, Parser] = {
    "none": parser_none,
    "multi_para": multi_para,
    "multi_line": multi_line,
    "multi_none": multi_none,
    "single_para": single_para,
    "single_line": single_line,
    "single_none": single_none,
    "single_code": single_code,
}


def register_parser(name: str, fn: Parser) -> None:
    PARSER_REGISTRY[name] = fn


def get_parser(name: str) -> Parser:
    """Parser lookup; unknown names fall back to ``none`` (reference
    behavior of GetParser)."""
    return PARSER_REGISTRY.get(name, parser_none)
