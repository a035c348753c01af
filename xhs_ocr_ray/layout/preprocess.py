"""Text-block pre-normalization (SURVEY.md §2.4 L2).

Estimates page rotation as the *median* of per-box long-edge angles; if it
exceeds a threshold, rotates all boxes back, translates coordinates to be
non-negative, attaches ``normalized_bbox = (x0, y0, x1, y1)`` to each block,
and returns blocks sorted by top edge then left edge.

Reference behavior: tbpu/parser_tools/line_preprocessing.py:8-95 (fresh
implementation from the description in SURVEY.md).
"""

from __future__ import annotations

import math
import statistics

Block = dict
Point = tuple[float, float]

ROTATION_THRESHOLD_DEG = 3.0


def _edge_len(a: Point, b: Point) -> float:
    return math.hypot(b[0] - a[0], b[1] - a[1])


def box_angle_deg(box: list[Point]) -> float:
    """Angle of the box's long edge, normalized into [-90, 90)."""
    p0, p1, p2 = box[0], box[1], box[2]
    # Quad points are corner-ordered; edges p0->p1 and p1->p2 are adjacent.
    if _edge_len(p0, p1) >= _edge_len(p1, p2):
        a, b = p0, p1
    else:
        a, b = p1, p2
    ang = math.degrees(math.atan2(b[1] - a[1], b[0] - a[0]))
    while ang >= 90.0:
        ang -= 180.0
    while ang < -90.0:
        ang += 180.0
    return ang


def estimate_rotation_deg(blocks: list[Block]) -> float:
    """Median long-edge angle over all blocks (0.0 for an empty list)."""
    if not blocks:
        return 0.0
    return statistics.median(box_angle_deg(tb["box"]) for tb in blocks)


def _rotate_point(p: Point, theta_rad: float) -> Point:
    c, s = math.cos(theta_rad), math.sin(theta_rad)
    return (p[0] * c - p[1] * s, p[0] * s + p[1] * c)


def preprocess_blocks(blocks: list[Block]) -> list[Block]:
    """Normalize boxes in place; return blocks sorted by (top, left).

    Adds ``normalized_bbox`` to every block. Mutates the input dicts (the
    per-document convention throughout this package).
    """
    if not blocks:
        return blocks
    rot = estimate_rotation_deg(blocks)
    if abs(rot) > ROTATION_THRESHOLD_DEG:
        theta = math.radians(-rot)
        for tb in blocks:
            tb["box"] = [list(_rotate_point((x, y), theta)) for x, y in tb["box"]]
    min_x = min(x for tb in blocks for x, _ in tb["box"])
    min_y = min(y for tb in blocks for _, y in tb["box"])
    shift_x = -min_x if min_x < 0 else 0.0
    shift_y = -min_y if min_y < 0 else 0.0
    for tb in blocks:
        if shift_x or shift_y:
            tb["box"] = [[x + shift_x, y + shift_y] for x, y in tb["box"]]
        xs = [p[0] for p in tb["box"]]
        ys = [p[1] for p in tb["box"]]
        tb["normalized_bbox"] = (min(xs), min(ys), max(xs), max(ys))
    blocks.sort(key=lambda tb: (tb["normalized_bbox"][1], tb["normalized_bbox"][0]))
    return blocks


def bbox_of(tb: Block) -> tuple[float, float, float, float]:
    """The block's normalized bbox, computing it on demand if absent."""
    nb = tb.get("normalized_bbox")
    if nb is None:
        xs = [p[0] for p in tb["box"]]
        ys = [p[1] for p in tb["box"]]
        nb = (min(xs), min(ys), max(xs), max(ys))
        tb["normalized_bbox"] = nb
    return nb


def union_bbox(blocks: list[Block]) -> tuple[float, float, float, float]:
    boxes = [bbox_of(tb) for tb in blocks]
    return (
        min(b[0] for b in boxes),
        min(b[1] for b in boxes),
        max(b[2] for b in boxes),
        max(b[3] for b in boxes),
    )


def bbox_to_box(bb: tuple[float, float, float, float]) -> list[list[float]]:
    x0, y0, x1, y1 = bb
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
