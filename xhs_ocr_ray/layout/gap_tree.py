"""Gap-tree multi-column reading order (SURVEY.md §2.4 L3).

Given text blocks with ``normalized_bbox``, produce human reading order for
multi-column layouts: scan rows top-down (vertically-overlapping blocks form
one row), compute per-row horizontal *gap intervals* (spans of whitespace
between blocks, bounded by the page edges), intersect gaps across consecutive
rows into persistent vertical *cut lines*, split the region into column
sub-regions at those cuts, and recurse — emitting columns left-to-right,
regions top-to-bottom.

Fresh implementation of the algorithm described for
tbpu/parser_tools/gap_tree.py:9-330; also exposes the per-column-block
grouping (``group_nodes``) that the paragraph parser consumes.
"""

from __future__ import annotations

from xhs_ocr_ray.layout.preprocess import Block, bbox_of

Interval = tuple[float, float]

# A gap narrower than this fraction of the median block height is noise,
# not a column separator.
MIN_GAP_FACTOR = 1.0


def _rows_of(blocks: list[Block]) -> list[list[Block]]:
    """Group blocks into rows: a block joins the current row while its top is
    above the row's running bottom (vertical overlap)."""
    if not blocks:
        return []
    ordered = sorted(blocks, key=lambda tb: (bbox_of(tb)[1], bbox_of(tb)[0]))
    rows: list[list[Block]] = [[ordered[0]]]
    row_bottom = bbox_of(ordered[0])[3]
    for tb in ordered[1:]:
        x0, y0, x1, y1 = bbox_of(tb)
        if y0 < row_bottom:
            rows[-1].append(tb)
            row_bottom = max(row_bottom, y1)
        else:
            rows.append([tb])
            row_bottom = y1
    for row in rows:
        row.sort(key=lambda tb: bbox_of(tb)[0])
    return rows


def _row_gaps(row: list[Block], min_gap: float) -> list[Interval]:
    """Interior whitespace intervals of one row (page-edge margins excluded:
    a margin is not a column separator between blocks)."""
    gaps: list[Interval] = []
    prev_end = None
    for tb in row:
        x0, _, x1, _ = bbox_of(tb)
        if prev_end is not None and x0 - prev_end >= min_gap:
            gaps.append((prev_end, x0))
        prev_end = x1 if prev_end is None else max(prev_end, x1)
    return gaps


def _intersect(a: list[Interval], b: list[Interval]) -> list[Interval]:
    out: list[Interval] = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo < hi:
            out.append((lo, hi))
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def _median_height(blocks: list[Block]) -> float:
    hs = sorted(bbox_of(tb)[3] - bbox_of(tb)[1] for tb in blocks)
    return hs[len(hs) // 2] if hs else 1.0


def group_nodes(blocks: list[Block], _depth: int = 0) -> list[list[Block]]:
    """Reading-order groups of blocks (each group ≈ one column segment).

    Top-level contract of the reference's ``get_nodes_text_blocks``: a flat
    list of block groups in reading order; concatenating the groups yields the
    full reading order.
    """
    if not blocks:
        return []
    if len(blocks) == 1 or _depth > 8:
        return [list(blocks)]
    rows = _rows_of(blocks)
    min_gap = MIN_GAP_FACTOR * _median_height(blocks)
    row_gaps = [_row_gaps(r, min_gap) for r in rows]

    groups: list[list[Block]] = []
    i = 0
    while i < len(rows):
        if not row_gaps[i]:
            # Single-column row: its own group (merge consecutive gapless
            # rows into one group so paragraphs stay together).
            seg = list(rows[i])
            i += 1
            while i < len(rows) and not row_gaps[i]:
                seg.extend(rows[i])
                i += 1
            groups.append(seg)
            continue
        # Extend a run of consecutive rows whose gap intersection persists.
        common = row_gaps[i]
        j = i + 1
        while j < len(rows):
            nxt = _intersect(common, row_gaps[j])
            if not nxt:
                break
            common = nxt
            j += 1
        run_blocks = [tb for r in rows[i:j] for tb in r]
        if j - i < 2:
            # A gap in one isolated row is layout noise, not a column cut.
            groups.append(sorted(run_blocks, key=lambda tb: bbox_of(tb)[0]))
        else:
            cuts = sorted((lo + hi) / 2.0 for lo, hi in common)
            bounds = [float("-inf"), *cuts, float("inf")]
            for lo, hi in zip(bounds, bounds[1:]):
                col = [tb for tb in run_blocks if lo <= _center_x(tb) < hi]
                if col:
                    groups.extend(group_nodes(col, _depth + 1))
        i = j
    return groups


def _center_x(tb: Block) -> float:
    x0, _, x1, _ = bbox_of(tb)
    return (x0 + x1) / 2.0


def reading_order(blocks: list[Block]) -> list[Block]:
    """Flatten :func:`group_nodes` into one reading-order block list."""
    return [tb for grp in group_nodes(blocks) for tb in grp]
