"""Keyed window analytics and hierarchical (rollup) aggregation.

- :func:`keyed_window` — per-key ordered window functions (``lag`` /
  ``lead`` / ``cumsum`` / ``row_number`` / ``rolling_mean``), the SQL
  ``... OVER (PARTITION BY key ORDER BY order)`` family. The canonical
  training-data feature-engineering step ("previous event per user",
  "running total per account").
- :func:`rollup_aggregate` — ``GROUP BY ROLLUP(a, b, ...)``: one row per
  group at every prefix level, collapsed columns emitted as typed nulls.

Both follow the repo-wide distributed-groupby idiom (one coarse
``_add_key_bucket`` shuffle + vectorized pandas per bucket — see
``stages/bucketing.py``; never a per-key dispatch, never a driver-side
collection).

Scale notes (the custom-operator contract):

- ``keyed_window`` assumes each key's full history fits one bucket worker
  (same contract as ``windows.sessionize``); window functions cannot be
  pre-reduced, so the exchange ships the projected input once.
- ``rollup_aggregate`` pre-reduces inside ``map_batches`` (partial groupby
  per block) so the shuffle carries one row per (block, finest key), then
  derives each coarser level by re-aggregating the PREVIOUS level's (much
  smaller) result — level N is never recomputed from the raw input, so the
  raw data is scanned exactly once no matter how many rollup levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from xhs_ocr_ray.functions.arrow import arrow_from_pandas
from xhs_ocr_ray.stages.bucketing import _add_key_bucket, default_num_buckets

_WINDOW_OPS = ("lag", "lead", "cumsum", "row_number", "rolling_mean")


def _shift_keep_type(grouped, col_dtype, n: int):
    """Per-group shift that keeps integer columns integral (pandas would
    upcast to float64 on the NaN pad, corrupting ids >= 2^53 — same class
    of bug as the assign_clusters float round-trip fixed in round 3)."""
    shifted = grouped.shift(n)
    if pd.api.types.is_integer_dtype(col_dtype):
        return shifted.astype("Int64")
    return shifted


def keyed_window(ds, key_cols: list[str], order_cols: list[str],
                 specs: list[tuple]):
    """Append per-key ordered window columns.

    ``specs`` entries (SQL equivalent in comments):

    - ``("lag", col, n, out)``      — ``lag(col, n) OVER w``
    - ``("lead", col, n, out)``     — ``lead(col, n) OVER w``
    - ``("cumsum", col, out)``      — ``sum(col) OVER (w ROWS UNBOUNDED
      PRECEDING)``
    - ``("row_number", out)``       — ``row_number() OVER w``
    - ``("rolling_mean", col, n, out)`` — ``avg(col) OVER (w ROWS n-1
      PRECEDING)``

    with ``w = PARTITION BY key_cols ORDER BY order_cols``. For
    deterministic (oracle-hashable) output, ``order_cols`` must be a unique
    total order within each key. Output = all input columns + the new ones,
    in input row set (order is engine-defined, as for any shuffle).
    """
    for s in specs:
        if s[0] not in _WINDOW_OPS:
            raise ValueError(f"keyed_window: unknown op {s[0]!r}")

    def bucket_window(chunk: pd.DataFrame) -> pd.DataFrame:
        df = chunk.drop(columns="__kb").sort_values(
            [*key_cols, *order_cols], kind="mergesort"
        )
        g = df.groupby(key_cols, sort=False)
        out = {}
        for s in specs:
            op = s[0]
            if op == "lag":
                _, col, n, name = s
                out[name] = _shift_keep_type(g[col], df[col].dtype, n)
            elif op == "lead":
                _, col, n, name = s
                out[name] = _shift_keep_type(g[col], df[col].dtype, -n)
            elif op == "cumsum":
                _, col, name = s
                out[name] = g[col].cumsum()
            elif op == "row_number":
                _, name = s
                out[name] = (g.cumcount() + 1).astype("int64")
            elif op == "rolling_mean":
                _, col, n, name = s
                # groups are contiguous after the key sort, so the rolling
                # result concatenates back in row order
                out[name] = g[col].rolling(n, min_periods=1).mean() \
                    .reset_index(drop=True).to_numpy()
        # hand back ARROW (metadata-stripped): the nullable Int64 shift
        # columns become plain int64-with-nulls blocks — the same typed-null
        # convention as stages/joins.py — instead of a pandas extension
        # dtype that survives round-trips and diverges from SQL engines'
        # null representation.
        return arrow_from_pandas(df.assign(**out))

    return (
        ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                       fn_kwargs={"key_cols": key_cols,
                                  "num_buckets": default_num_buckets()})
        .groupby("__kb")
        .map_groups(bucket_window, batch_format="pandas")
    )


_ROLLUP_AGGS = ("sum", "count", "min", "max")


def _agg_frame(df: pd.DataFrame, keys: list[str],
               specs: dict[str, tuple[str, str]], *,
               reagg: bool) -> pd.DataFrame:
    """One vectorized pandas groupby applying every spec. ``reagg=True``
    re-aggregates already-partial results (count becomes sum of counts)."""
    gb = df.groupby(keys, sort=False, dropna=False)
    parts = {}
    for name, (col, how) in specs.items():
        src = name if reagg else col
        fn = "sum" if (reagg and how == "count") else how
        parts[name] = gb[src].agg(fn)
    out = pd.DataFrame(parts).reset_index()
    for name, (col, how) in specs.items():
        if how == "count":
            out[name] = out[name].astype("int64")
    return out


def rollup_aggregate(ds, group_cols: list[str],
                     specs: dict[str, tuple[str, str]],
                     num_buckets: int | None = None):
    """``GROUP BY ROLLUP(group_cols)`` with aggregates ``specs``
    (``out_name -> (value_col, how)``, ``how`` in sum/count/min/max —
    the decomposable aggregates; ``count`` counts rows like ``count(*)``).

    Plan: per-block partial groupby (map_batches combiner) → ONE bucketed
    exchange on the finest key → exact finest level; each coarser level
    re-aggregates the previous level's result (strictly smaller), with the
    collapsed key emitted as a typed null — so a k-level rollup costs one
    scan of the data plus k-1 shuffles over shrinking aggregate sets.
    Grand-total level reduces to a handful of per-bucket rows merged in one
    final single-block pass.
    """
    for name, (col, how) in specs.items():
        if how not in _ROLLUP_AGGS:
            raise ValueError(f"rollup_aggregate: unsupported agg {how!r}")
    nb = num_buckets or default_num_buckets()
    value_cols = sorted({col for col, how in specs.values()})

    def combiner(batch: pa.Table) -> pa.Table:
        df = batch.select(
            [*group_cols, *[c for c in value_cols if c not in group_cols]]
        ).to_pandas()
        return arrow_from_pandas(_agg_frame(df, group_cols, specs, reagg=False))

    def bucket_agg(keys: list[str]):
        def _f(chunk: pd.DataFrame) -> pd.DataFrame:
            return _agg_frame(chunk.drop(columns="__kb"), keys, specs,
                              reagg=True)
        return _f

    def merge_level(level_ds, keys: list[str]):
        return (
            level_ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                                 fn_kwargs={"key_cols": keys,
                                            "num_buckets": nb})
            .groupby("__kb")
            .map_groups(bucket_agg(keys), batch_format="pandas")
        )

    schema = ds.schema()
    key_types = {n: t for n, t in zip(schema.names, schema.types)
                 if n in group_cols}
    out_names = [*group_cols, *specs.keys()]

    def normalize(b: pa.Table) -> pa.Table:
        """Every level emits the SAME schema: all group cols (typed nulls
        where collapsed) + aggregate cols, in one canonical order — union
        and the streaming executor's schema dedup both depend on it."""
        cols = {}
        for c in group_cols:
            cols[c] = (b.column(c) if c in b.schema.names
                       else pa.nulls(b.num_rows, key_types[c]))
        for name in specs:
            cols[name] = b.column(name)
        return pa.table(cols)

    partial = ds.map_batches(combiner, batch_format="pyarrow")
    finest = merge_level(partial, group_cols)
    levels = [finest.map_batches(normalize, batch_format="pyarrow")]
    prev = finest
    for depth in range(len(group_cols) - 1, 0, -1):
        keys = group_cols[:depth]
        prev = merge_level(prev, keys)
        levels.append(prev.map_batches(normalize, batch_format="pyarrow"))
    # grand total: per-bucket partials are already tiny — one single-block
    # reduce (repartition(1) of an aggregate set, not of the data)
    total = (
        prev.map_batches(
            lambda b: arrow_from_pandas(
                _agg_frame(b.to_pandas().assign(__g=0), ["__g"],
                           specs, reagg=True)),
            batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda b: arrow_from_pandas(
                _agg_frame(b.to_pandas(), ["__g"], specs,
                           reagg=True).drop(columns="__g")),
            batch_format="pyarrow")
        .map_batches(normalize, batch_format="pyarrow")
    )
    levels.append(total)
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out
