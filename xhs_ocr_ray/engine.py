"""Warmed extractor engine — the actor-pool stage (SURVEY.md §2.3 A1-A5).

The reference keeps ONE warmed OCR subprocess and feeds it one image at a
time (core/ppocr_api.py:15-176, core/run.py:27-46). Here the analog is a
callable class handed to ``Dataset.map_batches(ExtractorEngine,
concurrency=N, batch_size=B)``: everything expensive — the profile library,
compiled field regexes, compiled boilerplate patterns — is built once per
actor in ``__init__`` and reused across batches; ``__call__`` processes a
zero-copy Arrow batch and never touches the driver.

Payload routing per row (the engine-selection analog of GetOcrApi,
ppocr_api.py:322-338):

- ``%LAYOUT1\\n`` + JSON text boxes → layout path: reading-order + paragraph
  assembly via the tbpu-analog parsers (``xhs_ocr_ray.layout``);
- ``%PDF`` → pure-Python PDF decode (``xhs_ocr_ray.pdf``): object scan,
  Flate inflate, BT/ET text-operator interpretation with positions; the
  positioned blocks feed the SAME layout parsers as the %LAYOUT1 path (the
  analog of the reference's OCR engine emitting ``[{box, score, text}]``,
  core/ppocr_api.py:100-111). Undecodable PDFs are quarantined row-local as
  ``status='failed_parse'`` and kept for lineage;
- anything else → HTML path: profile-masked main-content extraction with the
  per-document fallback loop (``xhs_ocr_ray.profiles``).
"""

from __future__ import annotations

import json
import re
import urllib.parse

import pyarrow as pa
import pyarrow.compute as pc

from xhs_ocr_ray.functions.normalize import canonical_doc_class
from xhs_ocr_ray.layout.paragraph import render as render_blocks
from xhs_ocr_ray.layout.parsers import get_parser
from xhs_ocr_ray.pdf import extract_pdf_blocks
from xhs_ocr_ray.profiles import (
    DEFAULT_PROFILE,
    ExtractionResult,
    Profile,
    ProfileLibrary,
    extract_with_profiles,
)

LAYOUT_MAGIC = b"%LAYOUT1\n"
PDF_MAGIC = b"%PDF"

OUTPUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("doc_class", pa.string()),
        ("extracted_text", pa.large_string()),
        ("fields", pa.string()),
        ("profile_id", pa.int32()),
        ("status", pa.string()),
        ("n_chars", pa.int64()),
        ("n_lines", pa.int64()),
        ("html_bytes", pa.int64()),
    ]
)


def doc_class_of(url: str) -> str:
    """First path segment, digit-stripped (M9 analog) — the ``tag``."""
    try:
        path = urllib.parse.urlsplit(url).path
    except ValueError:
        return "default"
    seg = path.strip("/").split("/", 1)[0] if path.strip("/") else ""
    return canonical_doc_class(seg) or "default"


# First path segment of a scheme://host/... url, ONE RE2 pass per batch.
# Charset deliberately stricter than urlsplit (no space/control chars in
# host or segment, the segment must end at / ? # or EOS, no control chars
# anywhere after it): anything urlsplit would normalize away (\t\n\r are
# stripped mid-url, C0+space trimmed at the ends) fails the match and takes
# the exact per-row fallback instead — equivalence is property-tested.
# '[' and ']' are excluded from the HOST charset: urlsplit raises on
# unbalanced brackets in the authority (and doc_class_of then returns
# "default"), so any bracketed host — valid IPv6 or malformed — must take
# the exact per-row fallback rather than the fast path.
_SEG_PATTERN = (r"(?i)^https?://[^\x00-\x20/?#\[\]]*/+"
                r"(?P<seg>[^\x00-\x20/?#]+)(?:[/?#][^\x00-\x1f]*)?$")


def batch_doc_classes(url_arr, memo: dict[str, str]) -> list[str]:
    """Vectorized ``doc_class_of`` over a url column: the RE2 extract pulls
    the first path segment for well-formed http(s) urls (the whole corpus
    in practice); the digit-strip canonicalization is memoized per unique
    segment; non-matching rows fall back to the exact per-row function."""
    urls = (url_arr.combine_chunks()
            if isinstance(url_arr, pa.ChunkedArray) else url_arr)
    ext = pc.extract_regex(urls, _SEG_PATTERN)
    # non-matching rows are null STRUCTS; .field() alone would surface the
    # child's placeholder "" — mask through the struct validity
    segs = pc.if_else(ext.is_valid(), ext.field("seg"),
                      pa.scalar(None, pa.string())).to_pylist()
    out: list[str] = []
    url_list: list | None = None
    for i, s in enumerate(segs):
        if s is not None:
            dc = memo.get(s)
            if dc is None:
                dc = canonical_doc_class(s) or "default"
                memo[s] = dc
            out.append(dc)
        else:
            if url_list is None:
                url_list = urls.to_pylist()
            out.append(doc_class_of(url_list[i] or ""))
    return out


def extract_layout_payload(payload: bytes, parser_name: str) -> str | None:
    """Parse a %LAYOUT1 JSON box payload and assemble reading-order text."""
    try:
        doc = json.loads(payload[len(LAYOUT_MAGIC):].decode("utf-8"))
        blocks = doc.get("blocks", [])
        name = doc.get("parser", parser_name)
    except (ValueError, UnicodeDecodeError):
        return None
    if not blocks:
        return None
    ordered = get_parser(name)(blocks)
    return render_blocks(ordered)


class ExtractorEngine:
    """Stateful extractor: construct once per actor, call per Arrow batch."""

    def __init__(self, library: ProfileLibrary | None = None,
                 default_layout_parser: str = "multi_para"):
        self.library = library or ProfileLibrary()
        self.default_layout_parser = default_layout_parser
        # Warm-up: precompile every profile's field regexes once (the
        # engine-handshake analog; never per batch).
        self.compiled: dict[int, list[re.Pattern]] = {}
        for profs in self.library.profiles.values():
            for p in profs:
                if p.field_regexes:
                    self.compiled[id(p)] = [
                        re.compile(rx, re.MULTILINE) for rx in p.field_regexes
                    ]
        # per-actor memo: first-path-segment → canonical doc_class
        self._class_memo: dict[str, str] = {}

    # -- per-row core (also used directly by golden tests) ----------------
    def extract_row(self, url: str, payload: bytes,
                    dc: str | None = None) -> ExtractionResult:
        if dc is None:
            dc = doc_class_of(url)
        if payload.startswith(LAYOUT_MAGIC):
            profs = self.library.for_class(dc)
            parser_name = profs[0].layout_parser if profs else self.default_layout_parser
            text = extract_layout_payload(payload, parser_name)
            if text is None:
                return ExtractionResult(None, None, -1, "failed_all_profiles")
            pid = profs[0].profile_id if profs else DEFAULT_PROFILE.profile_id
            return ExtractionResult(text, None, pid, "ok")
        if payload.startswith(PDF_MAGIC):
            blocks = extract_pdf_blocks(payload)
            if not blocks:
                return ExtractionResult(None, None, -1, "failed_parse")
            profs = self.library.for_class(dc)
            parser_name = profs[0].layout_parser if profs else self.default_layout_parser
            text = render_blocks(get_parser(parser_name)(blocks))
            if not text:
                return ExtractionResult(None, None, -1, "failed_parse")
            pid = profs[0].profile_id if profs else DEFAULT_PROFILE.profile_id
            return ExtractionResult(text, None, pid, "ok")
        return extract_with_profiles(payload, self.library.for_class(dc), self.compiled)

    # -- batch entry -------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        url_arr = batch.column("url").combine_chunks()
        urls = url_arr.to_pylist()
        html_arr = batch.column("html").combine_chunks()
        htmls = html_arr.to_pylist()
        ts = batch.column("warc_ts")
        langs = (
            batch.column("lang")
            if "lang" in batch.column_names
            else pa.array([""] * len(urls), pa.string())
        )
        # doc-class routing hoisted out of the per-row loop: one vectorized
        # RE2 pass + per-actor memo (previously urlsplit ran TWICE per row)
        classes = batch_doc_classes(url_arr, self._class_memo)
        texts: list[str | None] = []
        fields: list[str | None] = []
        pids: list[int] = []
        statuses: list[str] = []
        for url, payload, dc in zip(urls, htmls, classes):
            res = self.extract_row(url, payload or b"", dc)
            texts.append(res.text)
            fields.append(res.fields_json)
            pids.append(res.profile_id)
            statuses.append(res.status)
        # size metrics via Arrow kernels, not per-row len()/count()
        # (null text → 0, matching the old `if res.text else 0`; "" also
        # yields 0 through length/count directly)
        text_arr = pa.array(texts, pa.large_string())
        n_chars = pc.cast(pc.fill_null(pc.utf8_length(text_arr), 0), pa.int64())
        n_lines = pc.cast(
            pc.fill_null(pc.count_substring(text_arr, "\n"), 0), pa.int64())
        html_bytes = pc.cast(
            pc.fill_null(pc.binary_length(html_arr), 0), pa.int64())
        return pa.table(
            {
                "url": pc.cast(url_arr, pa.string()),
                "warc_ts": ts,
                "lang": pc.cast(langs, pa.string()),
                "doc_class": pa.array(classes, pa.string()),
                "extracted_text": text_arr,
                "fields": pa.array(fields, pa.string()),
                "profile_id": pa.array(pids, pa.int32()),
                "status": pa.array(statuses, pa.string()),
                "n_chars": n_chars,
                "n_lines": n_lines,
                "html_bytes": html_bytes,
            },
            schema=OUTPUT_SCHEMA,
        )
