"""xhs_ocr_ray — a Ray-Data-native main-content extraction engine.

From-scratch rebuild of the *capabilities* of Fun-Fox/XHS-OCR (reference at
/root/reference, see SURVEY.md) as an idiomatic Ray Data pipeline over Parquet
tables of Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``:

- stateless ``map_batches`` DOM parse + text-density/link-density boilerplate
  pruning (``xhs_ocr_ray.html``),
- an actor-pool stage of warmed extractor engines with ordered fallback
  extraction profiles (``xhs_ocr_ray.engine``, analog of the reference's mask
  library + OCR subprocess, core/run.py:363-501 / core/ppocr_api.py),
- reading-order / paragraph assembly for layout payloads
  (``xhs_ocr_ray.layout``, analog of tbpu/),
- exact + near dedup, related/unrelated merges, per-prefix lineage manifests
  and resumable per-partition checkpoints (``xhs_ocr_ray.stages``,
  ``xhs_ocr_ray.state``).

Nothing here calls ``ray.init()``; sessions are owned by bench.py / tests.
"""

__version__ = "0.1.0"
