"""Per-stage profiling for any ``queries()`` entry.

Usage: ``python tools/profile_query.py <query> [sf_dir] [num_cpus]``

Runs one query and prints Ray Data's per-operator stats (task counts, wall
and UDF time, peak heap) — the feedback loop for "is wall-time dominated by
useful compute": find the stage whose remote wall time is far below
(tasks × mean) of the total, and that's the straggler/overhead to attack.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    fn = entry.queries()[name]
    t0 = time.perf_counter()
    res = fn(sf_dir)
    if hasattr(res, "materialize"):
        res = res.materialize()
        n = res.count()
    else:
        n = len(res)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.2f}s, {n} rows, num_cpus={cpus}, sf={sf_dir}")
    if hasattr(res, "stats"):
        wanted = ("Operator", "Remote wall time", "Remote cpu time",
                  "UDF time", "Peak heap")
        for line in res.stats().splitlines():
            if any(k in line for k in wanted):
                print(" ", line.strip()[:160])
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
