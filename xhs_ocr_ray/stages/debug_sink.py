"""Debug artifact sink (SURVEY.md §2.4 L15 analog).

The reference's ``visualize`` draws box/text/order overlays on the
screenshot (core/ppocr_visualize.py:8-159). Two analogs here:

- :func:`write_debug_artifacts` — per-partition *annotated text artifact*:
  url, status, profile id and the extracted lines numbered in reading
  order (always available).
- :func:`render_overlay_png` — an IMAGE overlay via the pure-Python PNG
  codec (:mod:`xhs_ocr_ray.png`): box outlines + shaded interiors + a
  reading-order corner marker whose darkness ramps with order. The
  reference's *text* layer is not replicated (no font rasterizer in this
  container); box and order layers are real.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def render_overlay_png(blocks: list[dict], *, margin: int = 8) -> bytes:
    """Draw layout blocks (the ``[{box, score, text}]`` shape every payload
    decoder emits) as a grayscale PNG overlay: 1-px box outlines, lightened
    interiors, and a filled order marker in each box's top-left corner
    (darker = earlier in reading order — the box/order layers of
    core/ppocr_visualize.py:8-159)."""
    from xhs_ocr_ray.png import encode_png

    if not blocks:
        return encode_png(np.full((16, 16), 255, np.uint8))
    xs = [p[0] for b in blocks for p in b["box"]]
    ys = [p[1] for b in blocks for p in b["box"]]
    w = int(max(xs)) + margin + 1
    h = int(max(ys)) + margin + 1
    canvas = np.full((h, w), 255, dtype=np.uint8)
    n = len(blocks)
    for i, b in enumerate(blocks):
        bx = [p[0] for p in b["box"]]
        by = [p[1] for p in b["box"]]
        x0, x1 = max(int(min(bx)), 0), min(int(max(bx)), w - 1)
        y0, y1 = max(int(min(by)), 0), min(int(max(by)), h - 1)
        canvas[y0 : y1 + 1, x0 : x1 + 1] = np.minimum(
            canvas[y0 : y1 + 1, x0 : x1 + 1], 235
        )
        canvas[y0, x0 : x1 + 1] = 90
        canvas[y1, x0 : x1 + 1] = 90
        canvas[y0 : y1 + 1, x0] = 90
        canvas[y0 : y1 + 1, x1] = 90
        shade = 20 + int(160 * i / max(n - 1, 1))  # order ramp
        my, mx = min(y0 + 3, y1), min(x0 + 3, x1)
        canvas[y0 : my + 1, x0 : mx + 1] = shade
    return encode_png(canvas, filters=2)


def _annotate(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    texts = batch.column("extracted_text").to_pylist()
    statuses = batch.column("status").to_pylist()
    pids = batch.column("profile_id").to_pylist()
    arts = []
    for url, text, status, pid in zip(urls, texts, statuses, pids):
        lines = (text or "").split("\n")
        numbered = "\n".join(f"{i:4d}| {ln}" for i, ln in enumerate(lines) if ln)
        arts.append(
            f"=== {url}\nstatus={status} profile={pid} n_lines={len(lines)}\n"
            f"{numbered}\n"
        )
    return pa.table({"url": pa.array(urls, pa.string()),
                     "artifact": pa.array(arts, pa.string())})


def write_debug_artifacts(extracted_ds, out_dir: str):
    """Write per-partition annotated artifacts (JSON rows: url, artifact)."""
    extracted_ds.map_batches(_annotate, batch_format="pyarrow").write_json(out_dir)
    return out_dir
