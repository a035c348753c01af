"""Deterministic sampling for training-data pipelines.

:func:`stratified_hash_sample` — per-stratum downsampling by CONTENT hash:
row kept iff ``md5(content)[:4] < threshold[stratum]`` (a 4-hex-digit
threshold ⇒ sampling rate ``int(threshold, 16) / 65536``). Content-hash
(not RNG) sampling is the reproducibility contract of web-scale corpus
work: the same document keeps/drops identically across runs, engines,
cluster sizes and shard layouts, and the SQL oracle is exact
(``substr(md5(text), 1, 4)`` in DuckDB). The common use: rebalance a
multilingual crawl ("keep 50% of en, 25% of zh, 6% of everything else").

Pure per-row map — no shuffle, no state; the md5 per row is the same
hot-path cost profile as ``hash_split`` (__ray_entry__) and
``fingerprint_batch``.
"""

from __future__ import annotations

import pyarrow as pa

from xhs_ocr_ray.functions.hashing import md5_hex

_HEX4 = frozenset("0123456789abcdef")


def _check_threshold(t: str) -> str:
    if len(t) != 4 or not set(t) <= _HEX4:
        raise ValueError(
            f"stratified_hash_sample: threshold must be 4 lowercase hex "
            f"digits (rate = value/65536), got {t!r}")
    return t


def stratified_hash_sample(ds, *, strata_col: str, content_col: str,
                           thresholds: dict[str, str],
                           default: str = "0000"):
    """Keep each row iff ``md5(row[content_col])`` starts below its
    stratum's 4-hex-digit threshold. ``default`` applies to strata not in
    ``thresholds`` (``"0000"`` = drop, ``"ffff"`` ≈ keep all but 1/65536;
    use an explicit per-stratum ``"ffff"``+ passthrough upstream if an
    exact keep-all stratum is needed)."""
    for t in thresholds.values():
        _check_threshold(t)
    _check_threshold(default)

    def keep(batch: pa.Table) -> pa.Table:
        strata = batch.column(strata_col).to_pylist()
        texts = batch.column(content_col).to_pylist()
        mask = [
            md5_hex(t or "")[:4] < thresholds.get(s, default)
            for s, t in zip(strata, texts)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")
