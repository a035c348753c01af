"""Interval scheduler with catch-up (SURVEY.md E2 analog).

The reference runs its pipeline on a wall-clock loop — every N minutes or
daily at a fixed time (core/social_ocr.py:118-152). The Ray-native mapping
is "one ``ray job submit`` per window" (each run resumes from manifests and
skips finished partitions), and this module is the loop driving it:

- :func:`due_runs` — pure catch-up arithmetic: which scheduled ticks have
  elapsed since the last recorded run (a restart after downtime re-runs the
  missed windows, newest-bounded by ``max_catchup``);
- :func:`run_periodic` — drives a job callable on the schedule, persisting
  the last-run tick to ``state_path`` so catch-up survives process restarts.

The clock is injectable; tests never sleep.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections.abc import Callable

_LOG = logging.getLogger("xhs_ocr_ray.scheduler")


def due_runs(last_run: float | None, now: float, every_s: float,
             *, anchor: float = 0.0, max_catchup: int = 24) -> list[float]:
    """Tick times in ``(last_run, now]`` on the ``anchor + k*every_s`` grid.

    ``last_run=None`` → only the most recent tick (first launch does not
    replay history). A long outage replays at most ``max_catchup`` newest
    ticks; older missed ticks are dropped WITH a logged count (the repo's
    no-silent-caps duty) — re-run with an explicit ``--since`` window to
    backfill beyond the cap.
    """
    if every_s <= 0:
        raise ValueError("every_s must be positive")
    latest = anchor + ((now - anchor) // every_s) * every_s
    if latest > now:  # float guard
        latest -= every_s
    if last_run is None:
        return [latest] if latest <= now else []
    ticks: list[float] = []
    t = latest
    while t > last_run and len(ticks) < max_catchup:
        ticks.append(t)
        t -= every_s
    if t > last_run:
        n_dropped = int((t - last_run) // every_s) + (1 if (t - last_run) % every_s else 0)
        _LOG.warning(
            "catch-up capped at %d ticks; %d older missed windows dropped "
            "(backfill with an explicit --since window)", max_catchup, n_dropped,
        )
    ticks.reverse()
    return ticks


def daily_anchor(at_hhmm: str, *, now: float) -> float:
    """Epoch seconds of today's ``HH:MM`` LOCAL time — the grid anchor for
    the daily-at-time mode (reference: the daily branch of the scheduler
    loop, core/social_ocr.py:132-141). Any point on the grid anchors it, so
    "today" vs "yesterday" is irrelevant; with ``every_s=86400`` ticks land
    at HH:MM each day. (A fixed 86400 s grid drifts ±1 h across DST changes
    — acceptable for a batch window; run under TZ=UTC to avoid it.)
    """
    import datetime

    try:
        hh, mm = at_hhmm.split(":")
        h, m = int(hh), int(mm)
        if not (0 <= h < 24 and 0 <= m < 60):
            raise ValueError
    except ValueError:
        raise ValueError(f"--at must be HH:MM (24h), got {at_hhmm!r}") from None
    local = datetime.datetime.fromtimestamp(now)
    return local.replace(hour=h, minute=m, second=0, microsecond=0).timestamp()


def _load_state(path: str | None) -> float | None:
    if path and os.path.exists(path):
        try:
            with open(path) as f:
                return float(json.load(f)["last_run"])
        except (ValueError, KeyError, OSError):
            return None
    return None


def _save_state(path: str | None, tick: float) -> None:
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_run": tick}, f)
    os.replace(tmp, path)


def run_periodic(job: Callable[[float], object], every_s: float, *,
                 anchor: float = 0.0, max_runs: int | None = None,
                 state_path: str | None = None,
                 now: Callable[[], float] = time.time,
                 sleep: Callable[[float], None] = time.sleep) -> int:
    """Run ``job(tick_time)`` on every due tick; returns the run count.

    Catch-up first (missed ticks from ``state_path``), then steady-state:
    sleep to the next grid tick. The grid is ``anchor + k*every_s`` — pass
    ``anchor=daily_anchor("06:30", now=...)`` with ``every_s=86400`` for
    the reference's daily-at-HH:MM mode. ``max_runs`` bounds the loop
    (tests and one-shot catch-up invocations)."""
    runs = 0
    last = _load_state(state_path)
    while max_runs is None or runs < max_runs:
        for tick in due_runs(last, now(), every_s, anchor=anchor):
            job(tick)
            last = tick
            _save_state(state_path, tick)
            runs += 1
            if max_runs is not None and runs >= max_runs:
                return runs
        current = now()
        next_tick = anchor + ((current - anchor) // every_s + 1) * every_s
        sleep(max(0.0, next_tick - current))
    return runs
