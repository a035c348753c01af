"""The flagship pipeline (SURVEY.md §3 "Graft lifecycle").

Two phases, both resumable via per-bucket manifests:

1. :func:`bucketize` — one-time ingest: read raw pages parquet, compute
   ``bucket = crc32(url) % B`` (the explicit repartition-by-url-hash), split
   oversized rows to their own path tag, and write hive-partitioned
   ``bucket=i/`` parquet. Same url → same bucket, so later per-bucket dedup
   is globally correct.
2. :func:`run_extract` — per pending bucket group: read → actor-pool
   extraction (warmed :class:`~xhs_ocr_ray.engine.ExtractorEngine`) → per-url
   exact dedup (first-wins by warc_ts) → write ``out/data/<group>/`` +
   lineage parquet + atomic manifests. Buckets whose manifests match the
   input fingerprint are skipped without reading a byte.

Scale notes: the html column is projected away at the extract stage (never
carried past it); reads prune to the 4 needed columns; the only all-to-all
exchanges are the bucketize write and the per-url dedup groupby (which runs
*within* a job whose buckets partition the url space).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from xhs_ocr_ray.engine import ExtractorEngine
from xhs_ocr_ray.functions.arrow import read_parquet_clean
from xhs_ocr_ray.profiles import ProfileLibrary
from xhs_ocr_ray.stages.dedup import exact_dedup
from xhs_ocr_ray.stages.lineage import prefix_summary
from xhs_ocr_ray.state import checkpoint as ckpt

OVERSIZED_HTML = 1 << 20  # 1 MiB: route giant rows to a dedicated tag


def _max_actors(concurrency: int | tuple) -> int:
    return concurrency[1] if isinstance(concurrency, tuple) else int(concurrency)


def _read_override(paths: list[str]) -> int | None:
    """Read parallelism: Ray plans read tasks from COMPRESSED file sizes, so
    a few big well-compressed files collapse into ~2 serial read tasks that
    cap the pipeline — force one block per file then. Never exceed the file
    count (finer blocks re-read whole row groups = amplification), and leave
    many-small-file layouts to the planner (it fuses them sensibly)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if 0 < len(paths) < cpus:
        return len(paths)
    return None


# Bump whenever add_bucket's hash or routing changes: the staged hive layout
# moves under the same input fingerprint, so the version folds into the
# _bucketize fingerprint to force stale staged dirs to regenerate.
BUCKET_LAYOUT_VERSION = 2


def add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Stable url-hash bucket, fully vectorized (the repo bucketing idiom:
    ``hash_pandas_object`` siphash with a fixed key — process-independent).

    Skew guard: oversized html rows (≥ OVERSIZED_HTML bytes) are routed to a
    DEDICATED bucket range ``[num_buckets, num_buckets + num_buckets//8)``
    so the extract job can give them their own small-batch path without
    re-reading the normal files.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    h = pd.util.hash_pandas_object(
        batch.column("url").to_pandas(), index=False
    ).to_numpy()
    sizes = pc.fill_null(
        pc.binary_length(batch.column("html")), 0
    ).to_numpy(zero_copy_only=False)
    n_big = max(1, num_buckets // 8)
    buckets = np.where(
        sizes >= OVERSIZED_HTML, num_buckets + h % n_big, h % num_buckets
    ).astype("int32")
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def bucketize(input_paths: list[str] | str, staged_dir: str, *,
              num_buckets: int = 16) -> str:
    """Repartition raw pages by url hash into hive ``bucket=i/`` dirs.

    Idempotent: skipped when the staged manifest matches the input
    fingerprint.
    """
    import ray.data

    if isinstance(input_paths, str):
        input_paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
    # layout version folds into the fingerprint: a hash/routing change in
    # add_bucket invalidates previously staged dirs even for identical inputs
    fp = ckpt.input_fingerprint(input_paths) + f":L{BUCKET_LAYOUT_VERSION}"
    if ckpt.is_complete(staged_dir, "_bucketize", fp):
        return staged_dir
    data_dir = os.path.join(staged_dir, "data")
    with ckpt.atomic_output_dir(data_dir) as tmp:
        (
            read_parquet_clean(
                input_paths, override_num_blocks=_read_override(input_paths)
            )
            .map_batches(add_bucket, batch_format="pyarrow",
                         fn_kwargs={"num_buckets": num_buckets})
            # min_rows_per_file keeps each bucket dir at a few real files
            # instead of one sliver per (input block × bucket).
            .write_parquet(tmp, partition_cols=["bucket"],
                           min_rows_per_file=8192)
        )
    ckpt.commit_manifest(staged_dir, "_bucketize",
                         {"fingerprint": fp, "status": "ok",
                          "num_buckets": num_buckets})
    return staged_dir


def _num_buckets_of(staged_dir: str) -> int:
    """Normal-bucket count recorded by bucketize (ids ≥ this are the
    dedicated oversized-row buckets)."""
    m = ckpt.read_manifest(staged_dir, "_bucketize") or {}
    return int(m.get("num_buckets", 16))


def _bucket_dirs(staged_dir: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for d in sorted(glob.glob(os.path.join(staged_dir, "data", "bucket=*"))):
        sid = os.path.basename(d).split("=", 1)[1]
        out[sid] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return out


def run_extract(staged_dir: str, out_dir: str, *,
                library: ProfileLibrary | None = None,
                since_ts=None,
                concurrency: int | tuple = (1, 8),
                batch_size: int = 64,
                buckets_per_job: int | None = None) -> dict:
    """Extract + dedup + lineage over pending buckets; returns run metrics.

    ``buckets_per_job=None`` processes all buckets in one streaming job
    (fastest; coarse resume). Small values give finer resume granularity.

    Groups are STATIC partitions of the full bucket list (not of the pending
    subset), and each group owns its output dir + manifest: recomputing a
    stale group atomically replaces exactly its own rows, never leaving
    stale rows in a differently-shaped old group dir. Changing
    ``buckets_per_job`` between runs changes the layout → the whole output
    is invalidated (recorded in the ``_layout`` manifest).
    """
    import shutil

    import pyarrow.compute as pc
    import ray.data

    buckets = _bucket_dirs(staged_dir)
    all_ids = sorted(buckets, key=int)
    group_size = buckets_per_job or len(all_ids)
    groups_all = [all_ids[i : i + group_size]
                  for i in range(0, len(all_ids), group_size)]

    layout = {"group_size": group_size, "bucket_ids": all_ids}
    prior = ckpt.read_manifest(out_dir, "_layout")
    if prior is not None and (
        prior.get("group_size") != group_size
        or prior.get("bucket_ids") != all_ids
    ):
        # Different grouping → old group dirs don't align; start clean.
        for sub in ("data", "lineage", "_manifests"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    ckpt.commit_manifest(out_dir, "_layout", dict(layout, status="ok"))

    def gid_of(group: list[str]) -> str:
        return f"{group[0]}-{group[-1]}"

    fingerprints = {
        gid_of(g): ckpt.input_fingerprint([f for sid in g for f in buckets[sid]])
        for g in groups_all
    }
    groups = [
        g for g in groups_all
        if not ckpt.is_complete(out_dir, f"group-{gid_of(g)}", fingerprints[gid_of(g)])
    ]
    skipped = [gid_of(g) for g in groups_all if g not in groups]
    if not groups:
        return {"rows_written": 0, "processed": [], "skipped": skipped}

    total_rows = 0
    for group in groups:
        # Oversized rows live in their own bucket range (see add_bucket):
        # disjoint file sets → two extraction paths with zero double-read.
        num_buckets = _num_buckets_of(staged_dir)
        normal_files = [
            f for sid in group for f in buckets[sid] if int(sid) < num_buckets
        ]
        big_files = [
            f for sid in group for f in buckets[sid] if int(sid) >= num_buckets
        ]
        small_ds = read_parquet_clean(
            normal_files, columns=["url", "warc_ts", "html", "lang"],
            override_num_blocks=_read_override(normal_files),
        ) if normal_files else None
        big_ds = read_parquet_clean(
            big_files, columns=["url", "warc_ts", "html", "lang"],
        ) if big_files else None
        if since_ts is not None:
            # Window filter (the OCR_RECENT_DAYS analog): vectorized inside
            # map_batches — cheaper than row-wise Dataset.filter.
            def window(b, cut=since_ts):
                return b.filter(pc.greater_equal(b.column("warc_ts"), cut))

            small_ds = small_ds.map_batches(window, batch_format="pyarrow") if small_ds else None
            big_ds = big_ds.map_batches(window, batch_format="pyarrow") if big_ds else None
        parts = []
        if small_ds is not None:
            parts.append(
                small_ds.map_batches(
                    ExtractorEngine,
                    fn_constructor_kwargs={"library": library},
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    concurrency=concurrency,
                )
            )
        if big_ds is not None:
            parts.append(
                big_ds.map_batches(
                    ExtractorEngine,
                    fn_constructor_kwargs={"library": library},
                    batch_format="pyarrow",
                    batch_size=4,  # few MB per batch even at MB-sized rows
                    concurrency=(1, max(2, _max_actors(concurrency) // 4)),
                )
            )
        extracted = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
        # Materialize between the actor-pool map and the dedup sort: in one
        # streaming graph the sort's resource reservation backpressures the
        # actor pool (~1.5x wall). The pin holds only the extracted columns
        # (html already projected away) and spills to disk if needed.
        extracted = extracted.materialize()
        deduped = exact_dedup(extracted, ["url"], "warc_ts")
        gid = gid_of(group)
        data_dir = os.path.join(out_dir, "data", f"group={gid}")
        with ckpt.atomic_output_dir(data_dir) as tmp:
            deduped.write_parquet(tmp)
        # Lineage over the materialized extract output (pre-dedup): counts
        # every processed document incl. dropped duplicates, and avoids a
        # disk read-back of the written partition.
        lineage_dir = os.path.join(out_dir, "lineage", f"group={gid}")
        lineage_ds = prefix_summary(extracted)
        with ckpt.atomic_output_dir(lineage_dir) as tmp:
            lineage_ds.write_parquet(tmp)
        n = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(data_dir, "*.parquet"))
        )
        total_rows += n
        ckpt.commit_manifest(
            out_dir, f"group-{gid}",
            {"fingerprint": fingerprints[gid], "status": "ok",
             "buckets": group, "rows": n},
        )
    return {
        "rows_written": total_rows,
        "processed": [gid_of(g) for g in groups],
        "skipped": skipped,
    }


def extract_dataset(pages_ds, *, library: ProfileLibrary | None = None,
                    concurrency: int | tuple = (1, 8), batch_size: int = 64,
                    ray_remote_args: dict | None = None):
    """Library form: pages Dataset → extracted Dataset (no checkpointing).

    Used by the driver's ``entry()``/``queries()`` and by tests.

    ``ray_remote_args`` is the remote-engine placement knob (the A2/A5
    analog of the reference's ``remote://ip:port`` engine mode,
    core/ppocr_api.py:178-319): pass ``{"num_gpus": 1}``, ``{"num_cpus": 2}``
    or ``{"resources": {"engine_node": 1}}`` to pin extractor actors onto
    the nodes that host the heavyweight engine runtime.
    """
    return pages_ds.map_batches(
        ExtractorEngine,
        fn_constructor_kwargs={"library": library},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **(ray_remote_args or {}),
    )
