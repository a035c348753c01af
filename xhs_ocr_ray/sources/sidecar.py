"""JSON sidecar metadata source (SURVEY.md §2.1 S4, §2.5 J3).

The reference reads per-document ``{title}.json`` sidecars inline during the
scan (core/run.py:345-359). Ray-Data-first shape: sidecars are ONE side
table (``read_json``) joined onto the pages stream by url — broadcast when
small, hash-join when not.
"""

from __future__ import annotations

SIDECAR_COLUMNS = ("url", "title", "account_id", "device_ip", "collect_date")


def read_sidecar(path_or_paths):
    """Read sidecar JSON(L) into a Dataset (columns: SIDECAR_COLUMNS…)."""
    import ray.data

    return ray.data.read_json(path_or_paths)


def join_sidecar(pages_ds, sidecar_ds, *, fields: dict[str, str] | None = None):
    """Attach sidecar metadata to pages by url (broadcast; sidecars ≪ pages).

    ``fields`` maps sidecar column → output column (default: title,
    account_id, device_ip as-is). Pages without a sidecar are kept (the
    reference tolerates missing sidecars) — implemented as an inner+anti
    union to preserve all rows.
    """
    from xhs_ocr_ray.stages.merge import broadcast_join

    fields = fields or {"title": "title", "account_id": "account_id",
                        "device_ip": "device_ip"}
    matched = broadcast_join(pages_ds, sidecar_ds, on="url", select=fields)
    unmatched = broadcast_join(pages_ds, sidecar_ds, on="url", select={},
                               how="anti")

    import pyarrow as pa

    def pad(batch: pa.Table) -> pa.Table:
        out = batch
        for dst in fields.values():
            out = out.append_column(dst, pa.array([""] * batch.num_rows, pa.string()))
        return out

    return matched.union(unmatched.map_batches(pad, batch_format="pyarrow"))
