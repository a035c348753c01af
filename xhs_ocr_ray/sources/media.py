"""Deterministic synthetic PNG media corpus (multimodal-column fixture).

``png_media_from_documents`` wraps every documents row into a real PNG
payload whose geometry and pixels are closed-form in ``doc_id`` — so the
decode → feature pipeline has an exact SQL oracle:

- width  = 16 + doc_id % 7, height = 12 + doc_id % 5 (grayscale);
- left half (x < width//2) is constant ``c1 = doc_id % 256``, right half is
  ``c2 = (doc_id * 7) % 251``;
- the scanline filter cycles 0/1/2 with doc_id, so decoding exercises the
  real unfilter paths (the decoded pixels are identical regardless);
- mean pixel value = (c1·(w//2)·h + c2·(w−w//2)·h) / (w·h) — one integer
  ratio, bit-exact between numpy and SQL doubles.

Runs as a ``map_batches`` transform (corpus generation is itself a Ray
pipeline stage, like :mod:`xhs_ocr_ray.sources.pages`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xhs_ocr_ray.png import encode_png
from xhs_ocr_ray.stages.multimodal import MEDIA_SCHEMA


def png_media_from_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id, …) → media rows with real PNG payloads."""
    doc_ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    widths: list[int] = []
    heights: list[int] = []
    for doc_id in doc_ids:
        w = 16 + doc_id % 7
        h = 12 + doc_id % 5
        img = np.full((h, w), (doc_id * 7) % 251, dtype=np.uint8)
        img[:, : w // 2] = doc_id % 256
        payloads.append(encode_png(img, filters=doc_id % 3))
        widths.append(w)
        heights.append(h)
    n = len(doc_ids)
    return pa.table(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def jpeg_media_from_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id, …) → media rows with real baseline-JPEG payloads.

    Same geometry as the PNG corpus but the value split is BLOCK-ALIGNED
    (x < 8 → c1, else c2) so every 8×8 DCT block is uniform: with the
    flat all-1s quant table each block is DC-only with an exact integer
    coefficient and decodes bit-exactly — mean pixel value
    ``(c1·8·h + c2·(w−8)·h) / (w·h)`` is one integer ratio, the same SQL
    oracle shape as png_features."""
    from xhs_ocr_ray.jpeg import encode_jpeg

    doc_ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    widths: list[int] = []
    heights: list[int] = []
    for doc_id in doc_ids:
        w = 16 + doc_id % 7
        h = 12 + doc_id % 5
        img = np.full((h, w), (doc_id * 7) % 251, dtype=np.uint8)
        img[:, :8] = doc_id % 256
        payloads.append(encode_jpeg(img, restart_interval=(doc_id % 3) or 0))
        widths.append(w)
        heights.append(h)
    n = len(doc_ids)
    return pa.table(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def wav_media_from_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id, …) → media rows with real 16-bit PCM WAV payloads
    whose samples are a closed-form square wave in ``doc_id``:

    - rate 8000 Hz, ``n = 8000 + (doc_id % 5)·2000`` samples;
    - amplitude ``A = 1000 + doc_id % 100``, half-period
      ``hp = 4 + doc_id % 4``: ``x[i] = ±A`` flipping every ``hp`` samples.

    Per 500 ms window the features are exact integers: rms = A (perfect
    square), peak = A, zero_crossings = (end−1)//hp − start//hp — one SQL
    expression per column, so the decode → window → feature pipeline has a
    bit-exact oracle."""
    from xhs_ocr_ray.wav import encode_wav

    doc_ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    durs: list[int] = []
    rate = 8000
    for doc_id in doc_ids:
        n = 8000 + (doc_id % 5) * 2000
        amp = 1000 + doc_id % 100
        hp = 4 + doc_id % 4
        i = np.arange(n)
        x = np.where((i // hp) % 2 == 0, amp, -amp).astype(np.int16)
        payloads.append(encode_wav(x, rate))
        durs.append(n * 1000 // rate)
    n_rows = len(doc_ids)
    return pa.table(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["audio"] * n_rows, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * n_rows, pa.int32()),
            "height": pa.array([0] * n_rows, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def gif_media_from_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id, …) → media rows with real GIF payloads (same
    closed-form geometry/pixels as the PNG corpus, so the same SQL oracle
    holds; the LZW-compressed stream exercises the real GIF decode path)."""
    from xhs_ocr_ray.gif import encode_gif

    doc_ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    widths: list[int] = []
    heights: list[int] = []
    for doc_id in doc_ids:
        w = 16 + doc_id % 7
        h = 12 + doc_id % 5
        img = np.full((h, w), (doc_id * 7) % 251, dtype=np.uint8)
        img[:, : w // 2] = doc_id % 256
        payloads.append(encode_gif(img))
        widths.append(w)
        heights.append(h)
    n = len(doc_ids)
    return pa.table(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
