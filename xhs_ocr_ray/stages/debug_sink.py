"""Debug artifact sink (SURVEY.md §2.4 L15 analog).

The reference's ``visualize`` draws box/text/order overlays on the
screenshot (core/ppocr_visualize.py:8-159). Without image libraries, the
analog is a per-partition *annotated text artifact*: for each document, the
url, status, profile id and the extracted lines numbered in reading order —
enough to eyeball extraction decisions per partition.
"""

from __future__ import annotations

import pyarrow as pa


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
