"""The repo-wide distributed-groupby idiom: one coarse hash-bucket shuffle,
then VECTORIZED per-bucket work (pandas/numpy) — never one Python dispatch
per key, which melts at 10^8 keys.

Shared by dedup, merges, windows, connected components; re-exported from
``xhs_ocr_ray.stages.dedup`` for backward compatibility.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

NUM_KEY_BUCKETS = 256  # legacy fixed default; prefer default_num_buckets()


def default_num_buckets() -> int:
    """Bucket count sized to cluster parallelism: 4× total CPUs, floor 32.

    The bucket count is internal (it never affects output values) but it
    sets the block count of every bucketed shuffle stage: too few starves a
    big cluster, too many drowns a small session in per-block task overhead
    (measured: a 500-row sort-groupby costs 8.5 s from 256 input blocks vs
    0.4 s from 8). 4× CPUs keeps per-bucket skew bounded while tracking the
    actual machine."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus:
                return max(32, 4 * cpus)
    except Exception:  # pragma: no cover - ray import/startup edge
        pass
    return max(32, 4 * (os.cpu_count() or 8))


def _add_key_bucket(batch: pa.Table, key_cols: list[str],
                    num_buckets: int | None = None) -> pa.Table:
    """Coarse stable hash bucket of the key columns (shuffle key).

    Vectorized via ``pd.util.hash_pandas_object`` (siphash with a FIXED key —
    deterministic across processes/machines, never Python's salted ``hash``);
    ~13× faster than a per-row Python crc32 loop. The bucket id is internal
    (dropped before any output), so the hash only needs stability, not any
    particular value.

    ``num_buckets`` should be resolved ONCE on the driver (pass it via
    ``fn_kwargs``): every task of one shuffle must agree on the count or
    same-key rows split across buckets. The ``None`` fallback resolves per
    worker and is only safe because the cluster size is fixed for the run.
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()
    h = pd.util.hash_pandas_object(
        batch.select(key_cols).to_pandas(), index=False
    ).to_numpy()
    return batch.append_column(
        "__kb", pa.array((h % num_buckets).astype("int32"))
    )


def group_apply(fn, *, batch_format: str = "pandas"):
    """Per-``__kb``-group UDF wrapper for ``sort("__kb").map_batches(...,
    batch_size=None, batch_format=None)`` — the repo's replacement for
    ``groupby("__kb").map_groups(fn)`` with STABLE empty-block schemas.

    Ray's ``map_groups`` wrapper yields NOTHING for an empty sorted
    partition, so the task emits a zero-column block; downstream operators
    pass such blocks through unprojected and the executor logs "RefBundle
    with a different schema" — the warning class that produced real bugs in
    r02 (CLAUDE.md typed-empty-frame rule). This wrapper is the same
    per-group apply, but an empty TYPED input block runs ``fn`` on the
    empty batch (every per-bucket kernel in this repo handles empty
    chunks), so every output block carries the output schema. Column-less
    input blocks (already-degenerate upstream empties) are dropped.

    Note: the streaming executor skips map tasks for 0-row bundles, so a
    sort's empty partitions may pass through as 0-row 0-column bundles
    regardless — harmless (verified warning-free across the full oracle
    gate); the typed-empty branch here covers the cases where an empty
    block IS delivered to the task.
    """
    from ray.data.block import BlockAccessor

    def apply_groups(block):
        acc = BlockAccessor.for_block(block)
        if acc.num_rows() == 0:
            if len(acc.schema().names) > 0:
                yield fn(acc.to_batch_format(batch_format))
            return
        bounds = acc._get_group_boundaries_sorted(["__kb"])
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = BlockAccessor.for_block(acc.slice(s, e, copy=False))
            yield fn(g.to_batch_format(batch_format))

    apply_groups.__name__ = getattr(fn, "__name__", "group_apply")
    return apply_groups


def bucket_map_groups(ds, fn, *, batch_format: str = "pandas"):
    """Function form of :func:`group_apply`:
    ``bucket_map_groups(ds, fn)`` ≡ the chained
    ``ds.sort("__kb").map_batches(group_apply(fn), batch_size=None,
    batch_format=None)``."""
    return ds.sort("__kb").map_batches(
        group_apply(fn, batch_format=batch_format),
        batch_size=None, batch_format=None)
