"""WARC source — Common-Crawl-style ingestion (stdlib-only).

The input_hint's pages table is "Common-Crawl-style web pages"; the
wire format those actually arrive in is WARC (ISO 28500): length-delimited
records of WARC headers + an HTTP response payload, usually as per-record
gzip members concatenated into one ``.warc.gz``. :func:`read_warc_pages`
turns WARC file(s) into the pipeline's canonical pages table::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

- Only ``WARC-Type: response`` (and ``resource``) records become rows;
  request/metadata/warcinfo records are skipped — the Common Crawl layout.
- The HTTP envelope (status line + headers) is stripped; ``html`` is the
  raw body bytes. ``warc_ts`` comes from ``WARC-Date``.
- Per-record gzip members are handled transparently (``gzip.decompress``
  walks concatenated members); plain ``.warc`` too.
- Tolerance: a malformed record ends parsing of THAT file at the damage
  point with rows already parsed kept (same never-crash stance as the
  tolerant JSONL/CSV sources).

Parallelism is per WARC file (``read_binary_files`` + one flat-map batch) —
the Common Crawl convention of ~1 GiB segment files makes the file the
natural work unit; finer streaming would need range-indexed gzip, which the
format does not provide.

The fixture writer :func:`encode_warc` emits standards-shaped records
(used by tests and the warc_source oracle query).
"""

from __future__ import annotations

import datetime as _dt
import gzip

import pyarrow as pa

_CRLF = b"\r\n"


def encode_warc(records: list[tuple[str, str, bytes]], *,
                per_record_gzip: bool = True) -> bytes:
    """[(url, iso_date, body_bytes)] → WARC bytes (response records with a
    minimal HTTP/1.1 200 envelope; per-record gzip members by default —
    the Common Crawl layout)."""
    out = bytearray()
    for url, date, body in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(body)).encode() + _CRLF
                + _CRLF + body)
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               + b"WARC-Target-URI: " + url.encode() + _CRLF
               + b"WARC-Date: " + date.encode() + _CRLF
               + b"Content-Type: application/http;msgtype=response\r\n"
               + b"Content-Length: " + str(len(http)).encode() + _CRLF
               + _CRLF)
        rec = hdr + http + _CRLF + _CRLF
        out += gzip.compress(rec) if per_record_gzip else rec
    return bytes(out)


def _parse_warc(data: bytes):
    """Yield (url, ts_us, body_bytes) for response/resource records."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return  # damaged tail: keep what we have
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        wtype = headers.get("warc-type", "")
        if wtype in ("response", "resource"):
            url = headers.get("warc-target-uri", "")
            date = headers.get("warc-date", "")
            try:
                ts = _dt.datetime.fromisoformat(date.replace("Z", "+00:00"))
                ts_us = int(ts.timestamp() * 1_000_000)
            except ValueError:
                ts_us = 0
            body = block
            if wtype == "response":
                split = block.find(_CRLF + _CRLF)
                body = block[split + 4 :] if split >= 0 else b""
            yield url, ts_us, body


def read_warc_pages(paths, **read_kwargs):
    """WARC file(s) (``.warc`` / ``.warc.gz``) → pages Dataset."""
    import ray.data

    def records(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        bodies: list[bytes] = []
        for data in batch.column("bytes").to_pylist():
            # magic-byte check, NOT extension: Arrow's filesystem layer
            # already auto-decompresses ``.gz`` paths at read time
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)  # walks concatenated members
            for url, ts_us, body in _parse_warc(data):
                urls.append(url)
                tss.append(ts_us)
                bodies.append(body)
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array([""] * n, pa.string()),
        })

    return ray.data.read_binary_files(paths, **read_kwargs).map_batches(
        records, batch_format="pyarrow")
