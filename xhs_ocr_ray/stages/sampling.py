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


def target_mix_sample(ds, *, group_col: str, content_col: str,
                      targets: dict[str, float], counts: dict | None = None):
    """Rebalance a multi-source corpus to target mix PROPORTIONS with
    maximum retention (the "domain mixing" step of LLM corpus assembly —
    e.g. ``{"web": 0.6, "code": 0.3, "wiki": 0.1}``).

    1. Per-group counts via per-block partial ``value_counts`` reduced on
       the driver — bounded by the number of DOMAINS (the documented
       domain-sized-reduce contract), never the corpus. Pass ``counts``
       explicitly to skip this pass (the dataset is otherwise consumed
       twice — materialize expensive upstreams first).
    2. Max-retention solve: ``scale = min_g count_g / target_g``;
       group acceptance rate ``target_g * scale / count_g`` (the binding
       group keeps everything, the rest downsample to proportion).
    3. Deterministic content-hash acceptance: keep iff
       ``int(md5(content)[:4], 16) < floor(rate * 65536)`` — same row
       kept on every run / engine / cluster size, exact in SQL as
       ``('0x' || substr(md5(content), 1, 4))::INT < floor(rate * 65536)``.

    Groups absent from ``targets`` (or with target 0) are dropped.
    """
    import math

    import pandas as pd

    if not targets or any(v <= 0 for v in targets.values()):
        raise ValueError("target_mix_sample: targets must be positive")

    if counts is None:
        def partial(batch: pa.Table) -> pa.Table:
            vc = pd.Series(
                batch.column(group_col).to_pylist()).value_counts()
            return pa.table({"g": pa.array(vc.index.astype(str)),
                             "n": pa.array(vc.values, pa.int64())})

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        counts = {}
        for r in rows:
            counts[r["g"]] = counts.get(r["g"], 0) + r["n"]

    present = {g: t for g, t in targets.items() if counts.get(g)}
    if not present:
        raise ValueError(
            f"target_mix_sample: no target group present in data "
            f"(targets={sorted(targets)}, seen={sorted(counts)[:8]}...)")
    scale = min(counts[g] / t for g, t in present.items())
    thresholds = {
        g: int(math.floor(t * scale / counts[g] * 65536))
        for g, t in present.items()
    }

    def keep(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        texts = batch.column(content_col).to_pylist()
        mask = [
            int(md5_hex(t or "")[:4], 16) < thresholds.get(g, 0)
            for g, t in zip(groups, texts)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")
