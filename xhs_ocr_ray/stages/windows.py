"""Event-time windowing over keyed streams (guide: "Streaming-shaped
workloads" — Ray Data has no watermarks; windows are a per-key groupby over
ts-sorted groups).

- :func:`sessionize` — gap-based session windows per key (the canonical
  training-data "user session" reconstruction). One 256-way key-bucket
  shuffle; per-bucket pandas is fully vectorized (diff/cumsum, no Python
  loop per event).
- :func:`hopping_counts` — overlapping (hopping) windows: each event lands
  in ``window/slide`` windows via a vectorized per-batch explode, then a
  partial-agg groupby.

Ordering assumption (documented per the custom-operator contract): events
are sorted per key *inside* each shuffle bucket before sessionization —
global cross-key order is never needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from xhs_ocr_ray.functions.arrow import arrow_from_pandas

from xhs_ocr_ray.stages.dedup import (
    _add_key_bucket,
    default_num_buckets,
    group_apply,
)


def sessionize(ds, key_col: str, ts_col: str, gap_us: int,
               order_cols: tuple[str, ...] = ()):
    """Sessions per key: a new session starts when the gap to the previous
    event (per key, ts order with ``order_cols`` tie-break) exceeds
    ``gap_us`` microseconds. Returns one row per (key, session_id) with
    n_events, session_start, session_end."""

    def bucket_sessions(chunk: pd.DataFrame) -> pd.DataFrame:
        df = chunk.drop(columns="__kb").sort_values(
            [key_col, ts_col, *order_cols], kind="mergesort"
        )
        ts = df[ts_col].astype("datetime64[us]")
        same_key = df[key_col].eq(df[key_col].shift())
        gap = (ts - ts.shift()).dt.total_seconds() * 1_000_000
        brk = (~same_key) | (gap > gap_us)
        df = df.assign(__session=brk.cumsum(), **{ts_col: ts})
        out = (
            df.groupby([key_col, "__session"], sort=False)
            .agg(
                n_events=(ts_col, "size"),
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
            )
            .reset_index()
        )
        # Renumber sessions 1..n within each key (bucket-local cumsum is
        # globally correct because a key lives in exactly one bucket).
        out["session_id"] = out.groupby(key_col, sort=False).cumcount() + 1
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        out["session_end"] = out["session_end"].astype("datetime64[us]")
        out["n_events"] = out["n_events"].astype("int64")
        return out.drop(columns="__session")[
            [key_col, "session_id", "n_events", "session_start", "session_end"]
        ]

    return (
        ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                       fn_kwargs={"key_cols": [key_col],
                                  "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(bucket_sessions),
                       batch_size=None, batch_format=None)
    )


def hopping_counts(ds, key_col: str, ts_col: str, *, window_us: int,
                   slide_us: int):
    """Events per (key, hopping window): window w covers
    ``[w*slide, w*slide + window)``; each event explodes into
    ``window/slide`` rows, then a partial-agg groupby sums counts."""
    n_windows = max(1, window_us // slide_us)

    def explode(batch: pa.Table) -> pa.Table:
        """Fully vectorized event→window explode: np.repeat each event
        n_windows times, subtract a tiled offset ramp, mask w < 0."""
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        hi = ts // slide_us
        w = np.repeat(hi, n_windows) - np.tile(
            np.arange(n_windows, dtype=np.int64), len(hi)
        )
        mask = w >= 0
        df = pd.DataFrame(
            {key_col: np.repeat(keys, n_windows)[mask], "window_id": w[mask]}
        )
        agg = df.groupby([key_col, "window_id"], sort=False).size().reset_index(name="n")
        return arrow_from_pandas(agg)

    # (key, window) cardinality is users x windows — near-unique at web
    # scale, so the reduce goes through the bucketed exchange, not the
    # native per-group sort-groupby
    from xhs_ocr_ray.stages.analytics import _merge_level
    from xhs_ocr_ray.stages.bucketing import default_num_buckets

    partial = ds.map_batches(explode, batch_format="pyarrow").map_batches(
        lambda b: b.rename_columns(
            [key_col, "window_id", "n_events"]), batch_format="pyarrow")
    return _merge_level(partial, [key_col, "window_id"],
                        {"n_events": ("n_events", "sum")},
                        default_num_buckets())


def tumbling_counts(ds, key_col: str, ts_col: str, *, window_us: int):
    """Non-overlapping special case (slide == window)."""
    return hopping_counts(ds, key_col, ts_col, window_us=window_us,
                          slide_us=window_us)
