"""CLI entry point — the ``ray job submit`` surface (north_rule).

Usage::

    ray job submit -- python -m xhs_ocr_ray.run \
        --input /data/pages/ --staged /data/staged --out /data/out \
        [--since 2024-01-05T00:00:00] [--num-buckets 64] \
        [--buckets-per-job 8] [--concurrency 32] [--batch-size 32]

Re-running after a failure skips every bucket whose manifest matches the
input fingerprint (per-partition resume). This script owns its Ray session
when run standalone (guarded init; the driver/job-submit environment may
already have one).
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="xhs_ocr_ray extraction pipeline")
    p.add_argument("--input", required=True, help="raw pages input dir/file")
    p.add_argument("--input-format",
                   choices=("parquet", "warc", "capture", "jsonl"),
                   default="parquet",
                   help="parquet = canonical pages table; warc = "
                        ".warc/.warc.gz files (Common-Crawl wire format); "
                        "capture = directory tree of raw HTML files")
    p.add_argument("--capture-ts", default="2024-01-01T00:00:00+00:00",
                   help="warc_ts stamped on capture-format rows (ISO)")
    p.add_argument("--staged", required=True, help="url-hash bucketized staging dir")
    p.add_argument("--out", required=True, help="output dir (data/lineage/_manifests)")
    p.add_argument("--since", default=None, help="ISO timestamp window filter")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--buckets-per-job", type=int, default=None)
    p.add_argument("--concurrency", type=int, default=None,
                   help="max extractor actors (default: cluster CPUs)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--profiles", default=None, metavar="PATH",
                   help="extraction-profile config (JSON or INI; see "
                        "ProfileLibrary.from_config) — default: the "
                        "built-in library")
    p.add_argument("--every", type=float, default=None, metavar="SECONDS",
                   help="run on an interval with restart catch-up (E2 "
                        "scheduler analog); state in <out>/_manifests")
    p.add_argument("--at", default=None, metavar="HH:MM",
                   help="run daily at HH:MM local time (the reference's "
                        "daily mode) with the same restart catch-up; "
                        "mutually exclusive with --every")
    p.add_argument("--max-runs", type=int, default=None,
                   help="stop after N scheduled runs (with --every/--at)")
    args = p.parse_args(argv)
    if args.every and args.at:
        p.error("--every and --at are mutually exclusive")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from xhs_ocr_ray.pipelines.extract_pages import bucketize, run_extract
    from xhs_ocr_ray.profiles import ProfileLibrary, default_library

    library = (ProfileLibrary.from_config(args.profiles) if args.profiles
               else default_library())

    max_actors = args.concurrency or int(ray.cluster_resources().get("CPU", 8))
    since_ts = (
        datetime.datetime.fromisoformat(args.since) if args.since else None
    )
    def ingest() -> str:
        """Non-parquet inputs are converted ONCE into a canonical pages
        parquet dir under the staging area (fingerprinted + atomic, so
        re-runs skip it), then flow through the identical pipeline."""
        if args.input_format == "parquet":
            return args.input
        import glob as _glob
        import os

        from xhs_ocr_ray.state import checkpoint as ckpt

        files = sorted(
            f for f in _glob.glob(os.path.join(args.input, "**", "*"),
                                  recursive=True) if os.path.isfile(f)
        ) or [args.input]
        fp = ckpt.input_fingerprint(files) + f":{args.input_format}"
        ingest_dir = os.path.join(args.staged, "_ingested")
        if not ckpt.is_complete(args.staged, "_ingest", fp):
            if args.input_format == "warc":
                from xhs_ocr_ray.sources.warc import read_warc_pages

                ds = read_warc_pages(args.input)
            elif args.input_format == "jsonl":
                from xhs_ocr_ray.sources.jsonl import read_jsonl_pages

                ds = read_jsonl_pages(files)
            else:
                from xhs_ocr_ray.sources.capture import ingest_capture_dir

                ds = ingest_capture_dir(args.input,
                                        warc_ts=args.capture_ts)
            with ckpt.atomic_output_dir(ingest_dir) as tmp:
                ds.write_parquet(tmp)
            ckpt.commit_manifest(args.staged, "_ingest",
                                 {"fingerprint": fp, "status": "ok"})
        return ingest_dir

    def one_run(_tick: float | None = None) -> dict:
        bucketize(ingest(), args.staged, num_buckets=args.num_buckets)
        res = run_extract(
            args.staged,
            args.out,
            library=library,
            since_ts=since_ts,
            concurrency=(1, max_actors),
            batch_size=args.batch_size,
            buckets_per_job=args.buckets_per_job,
        )
        print(json.dumps(res))
        return res

    if args.every or args.at:
        import os
        import time

        from xhs_ocr_ray.scheduler import daily_anchor, run_periodic

        if args.at:
            every_s, anchor = 86400.0, daily_anchor(args.at, now=time.time())
        else:
            every_s, anchor = args.every, 0.0
        os.makedirs(os.path.join(args.out, "_manifests"), exist_ok=True)
        run_periodic(
            one_run, every_s, anchor=anchor, max_runs=args.max_runs,
            state_path=os.path.join(args.out, "_manifests", "_schedule.json"),
        )
    else:
        one_run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
