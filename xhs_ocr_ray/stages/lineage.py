"""Per-prefix lineage manifests + extraction metrics (north_rule requirement).

``groupby(url_prefix).aggregate`` with a **partial-aggregation** shape: the
per-batch combiner inside ``map_batches`` collapses each Arrow batch to one
row per (prefix, status) before the shuffle, so the all-to-all exchange moves
O(prefixes × statuses) rows, not O(documents) — the SURVEY §4 scale rule.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from xhs_ocr_ray.functions.arrow import arrow_from_pandas


def add_url_prefix(batch: pa.Table) -> pa.Table:
    """Vectorized host extraction: strip scheme, cut at first '/'."""
    urls = batch.column("url")
    no_scheme = pc.replace_substring_regex(urls, pattern=r"^[a-z][a-z0-9+.-]*://", replacement="")
    host = pc.replace_substring_regex(no_scheme, pattern=r"[/?#].*$", replacement="")
    return batch.append_column("url_prefix", host)


def _partial(batch: pa.Table) -> pa.Table:
    """Combiner: one row per (url_prefix, status, profile_id) per batch."""
    df = pd.DataFrame(
        {
            "url_prefix": batch.column("url_prefix").to_pylist(),
            "status": batch.column("status").to_pylist(),
            "profile_id": batch.column("profile_id").to_pylist(),
            "html_bytes": batch.column("html_bytes").to_pylist(),
            "n_chars": batch.column("n_chars").to_pylist(),
        }
    )
    agg = (
        df.groupby(["url_prefix", "status", "profile_id"], sort=True, dropna=False)
        .agg(n_docs=("status", "size"), bytes_in=("html_bytes", "sum"),
             chars_out=("n_chars", "sum"))
        .reset_index()
    )
    return arrow_from_pandas(agg)


def lineage_metrics(extracted_ds):
    """Dataset of per-(url_prefix, status, profile_id) lineage rows:
    n_docs, bytes_in, chars_out. Input: the extract stage's output."""
    from ray.data.aggregate import Sum

    return (
        extracted_ds.map_batches(add_url_prefix, batch_format="pyarrow")
        .map_batches(_partial, batch_format="pyarrow")
        # collapse the per-block partial slivers to a few blocks: the native
        # Aggregate partitions by input block count, and with groups ≪
        # blocks the empty partitions emit schema-less bundles (the
        # RefBundle-warning class)
        .repartition(8)
        .groupby(["url_prefix", "status", "profile_id"])
        .aggregate(Sum("n_docs", alias_name="n_docs_sum"),
                   Sum("bytes_in", alias_name="bytes_in_sum"),
                   Sum("chars_out", alias_name="chars_out_sum"))
    )


def prefix_summary(extracted_ds):
    """Coarser per-prefix manifest row: totals + ok/failed splits."""

    def _split(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "url_prefix": batch.column("url_prefix").to_pylist(),
                "ok": pc.equal(batch.column("status"), "ok").to_pylist(),
                "html_bytes": batch.column("html_bytes").to_pylist(),
                "n_chars": batch.column("n_chars").to_pylist(),
            }
        )
        agg = (
            df.groupby("url_prefix", sort=True, dropna=False)
            .agg(
                n_docs=("ok", "size"),
                n_ok=("ok", "sum"),
                bytes_in=("html_bytes", "sum"),
                chars_out=("n_chars", "sum"),
            )
            .reset_index()
        )
        agg["n_failed"] = agg["n_docs"] - agg["n_ok"]
        return arrow_from_pandas(agg)

    from ray.data.aggregate import Sum

    return (
        extracted_ds.map_batches(add_url_prefix, batch_format="pyarrow")
        .map_batches(_split, batch_format="pyarrow")
        .repartition(8)  # see lineage_metrics: avoid empty Aggregate partitions
        .groupby("url_prefix")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_ok", alias_name="n_ok"),
            Sum("n_failed", alias_name="n_failed"),
            Sum("bytes_in", alias_name="bytes_in"),
            Sum("chars_out", alias_name="chars_out"),
        )
    )
