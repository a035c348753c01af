"""Related / unrelated merge operators (SURVEY.md §2.5 J1/J2).

Reference semantics preserved exactly (db/data_dms.py:166-253):

- **related_merge**: n-way full outer join on a composite key over the union
  of all columns; for each key, cell value = **last non-empty** in
  table-list order ("write if target empty or source non-empty",
  data_dms.py:213-217). A table *missing the key columns* is skipped with a
  note; a table that is absent (``None``) **aborts** the merge
  (data_dms.py:74-77 vs 192-196).
- **unrelated_merge**: union-all over the unified column set, absent cells
  padded with ``""``; absent (``None``) tables are tolerated and skipped
  (data_dms.py:78-81).

Ray-Data-first shape: schema-align + ``union`` (narrow), then ONE
``groupby(key).map_groups`` shuffle for the coalesce. The coalesce is
vectorized pandas (ffill over per-table frames in order), not a row loop.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


class MissingTableError(ValueError):
    """A listed input table is absent → the related merge aborts."""


_SRC_COL = "__src_order"


def _unified_columns(tables: list) -> list[str]:
    cols: list[str] = []
    for ds in tables:
        for name in ds.schema().names:
            if name not in cols and name != _SRC_COL:
                cols.append(name)
    return cols


def _align(ds, cols: list[str], src: int, empty_value: str = ""):
    """Add missing columns (empty-string padded) + the source-order column."""
    have = set(ds.schema().names)
    schema = ds.schema()

    def fill(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays, names = [], []
        for c in cols:
            if c in have:
                arrays.append(batch.column(c))
            else:
                arrays.append(pa.array([empty_value] * n, pa.string()))
            names.append(c)
        arrays.append(pa.array([src] * n, pa.int32()))
        names.append(_SRC_COL)
        return pa.table(dict(zip(names, arrays)))

    _ = schema  # schema() already forced the metadata fetch
    return ds.map_batches(fill, batch_format="pyarrow")


def unrelated_merge(tables: list):
    """Union-all with column alignment; ``None`` entries skipped (J2)."""
    present = [t for t in tables if t is not None]
    if not present:
        raise MissingTableError("unrelated_merge: no input tables present")
    cols = _unified_columns(present)
    aligned = [_align(t, cols, i) for i, t in enumerate(present)]
    out = aligned[0]
    for t in aligned[1:]:
        out = out.union(t)
    return out.drop_columns([_SRC_COL])


def related_merge(tables: list, key_cols: list[str]):
    """Full outer join on ``key_cols`` + last-non-empty-wins coalesce (J1).

    ``None`` table → :class:`MissingTableError` (abort). A present table
    lacking any key column is skipped (with the reference's skip semantics).
    One output row per distinct key.
    """
    if any(t is None for t in tables):
        raise MissingTableError("related_merge: a listed input table is absent")
    usable = [t for t in tables if set(key_cols) <= set(t.schema().names)]
    if not usable:
        raise MissingTableError("related_merge: no table carries the key columns")
    cols = _unified_columns(usable)
    aligned = [_align(t, cols, i) for i, t in enumerate(usable)]
    unioned = aligned[0]
    for t in aligned[1:]:
        unioned = unioned.union(t)

    value_cols = [c for c in cols if c not in key_cols]

    def coalesce_bucket(chunk: pd.DataFrame) -> pd.DataFrame:
        """Vectorized last-non-empty-wins over one key-hash bucket: '' → NaN,
        sort by table order, groupby(key).last() (skips NaN), NaN → ''.
        One pandas groupby per ~256-way bucket — no per-key Python calls."""
        g = chunk.sort_values(_SRC_COL, kind="mergesort")
        vals = g[value_cols].mask(g[value_cols] == "")
        out = (
            pd.concat([g[key_cols], vals], axis=1)
            .groupby(key_cols, sort=False, dropna=False)
            .last()
            .reset_index()
        )
        out[value_cols] = out[value_cols].fillna("")
        return out

    from xhs_ocr_ray.stages.dedup import (
        _add_key_bucket,
        default_num_buckets,
        group_apply,
    )

    return (
        unioned.map_batches(_add_key_bucket, batch_format="pyarrow",
                            fn_kwargs={"key_cols": key_cols,
                                       "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(
            group_apply(lambda c: coalesce_bucket(c.drop(columns="__kb"))),
            batch_size=None, batch_format=None)
    )


def related_key_count(tables: list, key_cols: list[str]):
    """G1 metric: number of keys contributed by ≥2 tables."""
    usable = [t for t in tables if t is not None and set(key_cols) <= set(t.schema().names)]
    cols = list(key_cols)
    aligned = [_align(t.select_columns(cols), cols, i) for i, t in enumerate(usable)]
    unioned = aligned[0]
    for t in aligned[1:]:
        unioned = unioned.union(t)

    from xhs_ocr_ray.stages.dedup import (
        _add_key_bucket,
        default_num_buckets,
        group_apply,
    )

    def bucket_counts(chunk: pd.DataFrame) -> pd.DataFrame:
        per_key = chunk.groupby(key_cols, sort=False)[_SRC_COL].nunique()
        return pd.DataFrame({"n_multi": [int((per_key >= 2).sum())]})

    per_bucket = (
        unioned.map_batches(_add_key_bucket, batch_format="pyarrow",
                            fn_kwargs={"key_cols": key_cols,
                                       "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(bucket_counts),
                     batch_size=None, batch_format=None)
    )
    return int(sum(r["n_multi"] for r in per_bucket.take_all()))


BROADCAST_MAX_ROWS = 5_000_000  # small-side guard: ~hundreds of MB of keys


def broadcast_join(big_ds, small_ds, on: str, select: dict[str, str],
                   how: str = "inner", right_on: str | None = None,
                   max_rows: int = BROADCAST_MAX_ROWS):
    """Broadcast hash join: the small side is ``ray.put`` once and looked up
    inside every ``map_batches`` task — no shuffle (SURVEY.md §2.5 J3, the
    sidecar-lookup analog; also the semi/anti-join building block).

    ``select`` maps small-side column → output name. ``how``: "inner" keeps
    matching rows, "semi" keeps matching big rows unchanged, "anti" keeps
    non-matching big rows unchanged. ``right_on`` names the small side's key
    column when it differs from ``on``. Duplicate keys on the small side
    resolve first-wins (the reference's dedup convention, D1), so a repeated
    sidecar record can never expand the big side.
    """
    import pandas as pd
    import ray

    try:
        small_df = small_ds.to_pandas(limit=max_rows)
    except ValueError as exc:
        raise ValueError(
            f"broadcast_join: small side exceeds {max_rows} rows — it would "
            "materialize on the driver. Use a shuffle join (bucketed "
            "groupby, e.g. related_merge / _bucket_attach) instead, or "
            "raise max_rows explicitly if the driver can hold it."
        ) from exc
    small_df = small_df.set_index(right_on or on)
    small_df = small_df[~small_df.index.duplicated(keep="first")]
    small_ref = ray.put(small_df)

    def join_batch(batch: pa.Table) -> pa.Table:
        sm = ray.get(small_ref)
        keys = pd.Index(batch.column(on).to_pylist())
        member = sm.index.get_indexer(keys) != -1  # vectorized membership
        if how == "semi":
            return batch.filter(pa.array(member))
        if how == "anti":
            return batch.filter(pa.array(~member))
        batch = batch.filter(pa.array(member))
        keys = keys[member]
        out = batch
        for src, dst in select.items():
            vals = sm[src].reindex(keys).tolist() if len(keys) else []
            out = out.append_column(dst, pa.array(vals))
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow")
