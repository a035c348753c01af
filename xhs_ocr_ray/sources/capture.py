"""Capture-directory ingestion — the S6 fetcher analog, offline.

The reference's headless-browser fetcher (S6) walks a target list, renders
each page and drops artifacts into per-site/per-day directories that the
OCR loop later scans. This container has no network, so the graft keeps the
CONTRACT and swaps the transport: a "capture" is any directory tree of raw
HTML files (`<capture_dir>/<host>/<path...>.html`, the layout a crawler or
`wget -r` produces), and :func:`ingest_capture_dir` turns it into the
pipeline's canonical pages table::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

- ``url`` is reconstructed from the relative path (`https://<host>/<path>`
  with the ``.html`` suffix dropped; ``index.html`` maps to the directory
  url), mirroring the reference's path→identity convention (S2).
- ``warc_ts`` is an explicit capture timestamp argument — never file
  mtime, which does not survive copies and would break idempotent re-runs.
- ``text`` / ``lang`` are left empty ('' — unknown at fetch time); the
  extraction pipeline fills them downstream.

Streaming end to end: ``read_binary_files(include_paths=True)`` →
one vectorized projection → partitioned parquet (or the returned Dataset
feeds ``pipelines.extract_pages`` directly).
"""

from __future__ import annotations

import pyarrow as pa


def _url_of(rel_path: str) -> str:
    parts = rel_path.replace("\\", "/").strip("/").split("/", 1)
    host = parts[0]
    tail = parts[1] if len(parts) > 1 else ""
    if tail.endswith(".html"):
        tail = tail[: -len(".html")]
    # Only a path COMPONENT exactly named "index" maps to the directory
    # url — a stem that merely ends in "index" (myindex.html, reindex.html)
    # must keep its name, or distinct pages collide on url and the
    # flagship's first-wins exact dedup silently drops one.
    if tail == "index" or tail.endswith("/index"):
        tail = tail[: -len("index")]
    return f"https://{host}/{tail}" if tail else f"https://{host}/"


def _ts_us_of(warc_ts) -> int:
    """Capture time (datetime / ISO string / int µs) → µs since epoch.

    A NAIVE datetime or ISO string is UTC by convention — ``.timestamp()``
    on a naive datetime would apply the host's LOCAL zone, so the same
    ``--capture-ts`` would yield different ``warc_ts`` values on different
    hosts, breaking the idempotent-re-run contract.
    """
    import datetime as _dt

    if isinstance(warc_ts, str):
        warc_ts = _dt.datetime.fromisoformat(warc_ts)
    if isinstance(warc_ts, _dt.datetime):
        if warc_ts.tzinfo is None:
            warc_ts = warc_ts.replace(tzinfo=_dt.timezone.utc)
        return int(warc_ts.timestamp() * 1_000_000)
    return int(warc_ts)


def ingest_capture_dir(capture_dir: str, *, warc_ts,
                       out_parquet: str | None = None):
    """Capture tree → pages Dataset (optionally also written as parquet).

    ``warc_ts`` is the capture time (``datetime`` or ISO string) applied to
    every row — one capture run, one timestamp, re-runs idempotent.
    Returns the pages Dataset either way.
    """
    import os

    import ray.data

    root = os.path.abspath(capture_dir)
    ts_us = _ts_us_of(warc_ts)

    def project(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        urls = [_url_of(os.path.relpath(p, root)) for p in paths]
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([ts_us] * n, pa.int64())
                .cast(pa.timestamp("us")),
            "html": batch.column("bytes").cast(pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array([""] * n, pa.string()),
        })

    ds = ray.data.read_binary_files(
        capture_dir, include_paths=True, file_extensions=["html", "htm"]
    ).map_batches(project, batch_format="pyarrow")
    if out_parquet:
        ds = ds.materialize()
        ds.write_parquet(out_parquet)
    return ds
