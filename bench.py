"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the flagship pipeline — bucketize(url-hash repartition) →
actor-pool extraction → per-url dedup → lineage → partitioned parquet write —
over the deterministic pages corpus derived from ``$GRAFT_SF_DIR`` documents
(amplified ×``$BENCH_REPLICAS``, default 8). Corpus generation and an OS
page-cache warm-up read are untimed.

``--scaling``: runs the identical job in fresh processes at two parallelism
levels (default N=4 and 4N=16; see BASELINE.md for the hardware rationale),
interleaved best-of-``BENCH_SCALE_REPS``, and reports throughputs plus
efficiency = (docs/s@4N / docs/s@N) / 4 — the sandbox substitute for the
north rule's N-vs-4N-node criterion.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("BENCH_REPLICAS", "64"))

# Every queries() entry is benched except the pages-corpus pair, whose cost
# is the headline pipeline itself. Derived dynamically so a new query can
# never be silently left out of BENCH_r{N}.
BENCH_EXCLUDED = {"extract_pages", "lineage_pages"}


def query_names() -> list[str]:
    import __ray_entry__ as entrymod

    return [n for n in entrymod.queries() if n not in BENCH_EXCLUDED]


def run_headline() -> tuple[float, int]:
    """Timed seconds + docs written for the full pipeline."""
    from xhs_ocr_ray.pipelines.extract_pages import bucketize, run_extract
    from xhs_ocr_ray.sources.pages import ensure_pages_parquet

    pages_dir = ensure_pages_parquet(SF_DIR, replicas=REPLICAS)  # untimed

    # Warm the OS page cache (untimed) so we measure compute+shuffle.
    import ray.data

    ray.data.read_parquet(pages_dir, columns=["url"]).count()

    work = f"/tmp/bench_work_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    staged, out = os.path.join(work, "staged"), os.path.join(work, "out")
    t0 = time.perf_counter()
    bucketize(pages_dir, staged, num_buckets=max(NUM_CPUS, 8))
    # Pool floor at half the CPUs: skips the slow autoscaling ramp but always
    # leaves CPUs for the read/shuffle/write stages (a floor == num_cpus
    # deadlocks the pipeline).
    from xhs_ocr_ray.profiles import default_library

    res = run_extract(
        staged, out,
        library=default_library(),
        concurrency=(max(1, NUM_CPUS // 2), NUM_CPUS),
        batch_size=128,
    )
    dt = time.perf_counter() - t0
    shutil.rmtree(work, ignore_errors=True)
    return dt, res["rows_written"]


def run_queries() -> dict[str, float]:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in query_names():
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    sec, docs = run_headline()
    queries = {} if os.environ.get("BENCH_SKIP_QUERIES") else run_queries()
    print(
        json.dumps(
            {
                "metric": "extract_pipeline_sec",
                "value": round(sec, 3),
                "unit": "sec",
                "docs_written": docs,
                "docs_per_sec": round(docs / sec, 1),
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "replicas": REPLICAS,
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    """Fresh process per parallelism level; identical input (shared cache).

    Levels default to N=4 vs 4N=16: this VM exposes 32 logical CPUs but
    delivers only ~20 effective cores under full load (hypervisor ceiling,
    measured with an all-core burn test — see BASELINE.md), so 8→32 can never
    be linear regardless of the software. 4 and 16 both sit inside the
    machine's linear region, making the measurement about the PIPELINE's
    scaling, which is what the north rule's N-vs-4N-node criterion targets.
    """
    lo_n = int(os.environ.get("BENCH_SCALE_LO", "4"))
    hi_n = int(os.environ.get("BENCH_SCALE_HI", str(lo_n * 4)))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SKIP_QUERIES="1")
        # Larger corpus for scaling runs: per-process constants (ray.init,
        # actor spawn, job setup ≈10s) must be small vs the timed work or
        # they dominate the ratio.
        env.setdefault("BENCH_REPLICAS", "128")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # The VM's effective CPU capacity drifts ±40% over hours (hypervisor
    # bursting — measured with burn tests). Interleave the levels and take
    # the best run per level so host drift doesn't masquerade as (anti-)
    # scaling. One pass each way ≈ controls a monotone drift.
    reps = int(os.environ.get("BENCH_SCALE_REPS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run(lo_n))
        hi_runs.append(run(hi_n))
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    eff = (lo["docs_per_sec"] and hi["docs_per_sec"] / lo["docs_per_sec"] / (hi_n / lo_n))
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "cpus_lo": lo_n,
                "cpus_hi": hi_n,
                f"docs_per_sec_{lo_n}": lo["docs_per_sec"],
                f"docs_per_sec_{hi_n}": hi["docs_per_sec"],
                f"sec_{lo_n}": lo["value"],
                f"sec_{hi_n}": hi["value"],
                "sf": SF_DIR,
                "replicas": lo["replicas"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
