"""Grouped ranking / order statistics — the window-function family.

- :func:`grouped_topk` — top-k rows per key with a ``row_number()``-style
  rank (``PARTITION BY key ORDER BY order_col [DESC], tie_cols``). The
  canonical training-data "best N documents per domain" selector.
- :func:`grouped_quantiles` — EXACT per-key discrete quantiles with
  DuckDB ``quantile_disc`` semantics (the element at 1-based rank
  ``ceil(q*n)`` of the key's sorted values — verified empirically against
  DuckDB, no interpolation, so results hash-match an oracle bit-for-bit).

Both follow the repo-wide distributed-groupby idiom (one coarse key-bucket
shuffle + vectorized pandas per bucket, see ``stages/bucketing.py``) and both
pre-reduce inside ``map_batches`` before the shuffle so the exchange volume
is bounded:

- top-k ships at most ``k`` rows per (key, input block) — the combiner is
  the same sort+head kernel as the final pass;
- quantiles cannot be pre-reduced exactly, so the combiner projects to the
  two needed columns only; the per-key partitioning assumption (one key's
  rows fit one bucket worker) is the same as ``windows.sessionize``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from xhs_ocr_ray.functions.arrow import arrow_from_pandas
from xhs_ocr_ray.stages.bucketing import (
    _add_key_bucket,
    default_num_buckets,
    group_apply,
)


def _topk_kernel(df: pd.DataFrame, key_cols: list[str], order_col: str,
                 k: int, descending: bool, tie_cols: list[str],
                 rank_col: str | None) -> pd.DataFrame:
    """Vectorized per-frame top-k: one mergesort + groupby.head — never a
    Python loop per key. Deterministic: ties broken by ``tie_cols`` asc."""
    df = df.sort_values(
        [*key_cols, order_col, *tie_cols],
        ascending=[*([True] * len(key_cols)), not descending,
                   *([True] * len(tie_cols))],
        kind="mergesort",
    )
    out = df.groupby(key_cols, sort=False).head(k)
    if rank_col is not None:
        out = out.assign(
            **{rank_col: out.groupby(key_cols, sort=False).cumcount() + 1}
        )
        out[rank_col] = out[rank_col].astype("int64")
    return out


def grouped_topk(ds, key_cols: list[str], order_col: str, k: int, *,
                 descending: bool = True, tie_cols: tuple[str, ...] = (),
                 rank_col: str = "rnk"):
    """Top-``k`` rows per key, ranked 1..k.

    Equivalent SQL: ``row_number() OVER (PARTITION BY key ORDER BY order_col
    [DESC], tie_cols) <= k``. Two phases: a per-batch combiner keeps only the
    local top-k per key (the global top-k per key is a subset of every
    block's local top-k, so this is lossless and bounds shuffle volume to
    ``k`` rows per key per block), then one key-bucket shuffle with the same
    vectorized kernel per bucket emitting the rank.
    """
    ties = list(tie_cols)

    def combiner(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return arrow_from_pandas(
            _topk_kernel(df, key_cols, order_col, k, descending, ties, None)
        )

    def bucket_topk(chunk: pd.DataFrame) -> pd.DataFrame:
        return _topk_kernel(chunk.drop(columns="__kb"), key_cols, order_col,
                            k, descending, ties, rank_col)

    return (
        ds.map_batches(combiner, batch_format="pyarrow")
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": key_cols,
                                "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(bucket_topk),
                       batch_size=None, batch_format=None)
    )


def grouped_quantiles(ds, key_cols: list[str], val_col: str,
                      qs: dict[str, float]):
    """Exact discrete quantiles per key: one output row per key with one
    column per entry of ``qs`` (name → quantile in (0, 1]).

    Semantics = DuckDB ``quantile_disc(val, q)``: the element at 1-based
    rank ``ceil(q * n)`` of the key's ascending-sorted values. Fully
    vectorized per bucket: one sort, per-key offsets via cumsum, positional
    take per quantile. Partitioning assumption: each key's rows fit one
    bucket worker (per-key stats, not a global quantile — for a global
    quantile over 100 TB use an iterative rank-bracket refinement, which
    this module deliberately does not fake with a single hot bucket).
    """

    def bucket_quants(chunk: pd.DataFrame) -> pd.DataFrame:
        df = chunk.drop(columns="__kb").sort_values(
            [*key_cols, val_col], kind="mergesort"
        )
        sizes = df.groupby(key_cols, sort=False).size()
        starts = np.concatenate(([0], np.cumsum(sizes.to_numpy())[:-1]))
        vals = df[val_col].to_numpy()
        data = {c: df.iloc[starts][c].to_numpy() for c in key_cols}
        n = sizes.to_numpy()
        for name, q in qs.items():
            idx = starts + np.maximum(np.ceil(q * n).astype(np.int64), 1) - 1
            data[name] = vals[idx]
        return pd.DataFrame(data)

    return (
        ds.select_columns([*key_cols, val_col])
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": key_cols,
                                "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(bucket_quants),
                       batch_size=None, batch_format=None)
    )


def grouped_ntile(ds, key_cols: list[str], order_col: str, k: int, *,
                  descending: bool = False, tie_cols: tuple[str, ...] = (),
                  out_col: str = "tile"):
    """``NTILE(k) OVER (PARTITION BY key ORDER BY order_col [DESC],
    tie_cols)`` — equal-count buckets per key, the CCNet head/middle/tail
    split shape (Wenzek et al. 2020 bucket corpora by per-language
    perplexity terciles).

    One key-bucket exchange; per bucket a single mergesort + vectorized
    searchsorted over the standard NTILE bucket bounds (first ``n % k``
    tiles get the extra row — DuckDB/ANSI semantics, so the oracle is
    exact). A key's full row set must co-locate (inherent to exact
    windowed ranking, as in :func:`grouped_topk`); for skew-critical
    corpora use threshold-based assignment from
    :func:`grouped_quantiles` instead.
    """
    if k < 1:
        raise ValueError("grouped_ntile: k must be >= 1")
    ties = list(tie_cols)

    def bucket_ntile(chunk: pd.DataFrame) -> pd.DataFrame:
        df = chunk.drop(columns="__kb")
        if not len(df):
            out = df.copy()
            out[out_col] = pd.Series((), dtype="int64")
            return out
        df = df.sort_values(
            [*key_cols, order_col, *ties],
            ascending=[*([True] * len(key_cols)), not descending,
                       *([True] * len(ties))],
            kind="mergesort",
        )
        rn = df.groupby(key_cols, sort=False).cumcount().to_numpy()
        n_of = df.groupby(key_cols, sort=False)[order_col] \
            .transform("size").to_numpy()
        base, extra = n_of // k, n_of % k
        # tile t (0-based) holds rows with rn < (t+1)*base + min(t+1, extra)
        # → invert: t = rn // (base+1) while rn < extra*(base+1), else
        #   t = extra + (rn - extra*(base+1)) // base
        cut = extra * (base + 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                rn < cut,
                rn // np.maximum(base + 1, 1),
                extra + np.where(base > 0, (rn - cut) // np.maximum(base, 1),
                                 0),
            )
        df[out_col] = (tile + 1).astype("int64")
        return df

    return (
        ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                       fn_kwargs={"key_cols": key_cols,
                                  "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(bucket_ntile),
                     batch_size=None, batch_format=None)
    )
