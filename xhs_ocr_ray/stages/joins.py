"""Joins Ray Data lacks natively: as-of join, range join, and a
large×large shuffle hash join.

All follow the repo's shuffle doctrine (CLAUDE.md): one bucketed exchange
keyed by ``_add_key_bucket`` for the as-of and shuffle joins; a ``ray.put``
broadcast for the (small) range table — never a per-key ``map_groups``
dispatch and never a driver-side row loop.

As-of join partitioning assumption: both sides hash-bucket on the equality
key, so every key's full left+right history lands in one bucket and the
per-bucket ``pd.merge_asof`` (a vectorized sorted-merge) is exact. Skewed
keys cost what they cost — a single key's history must be co-located for
as-of semantics; salt upstream if one key dominates.

Range join assumption: the range table is SMALL (config/calendar-sized).
It is broadcast once per run via ``ray.put`` and every batch matches against
it with one numpy comparison matrix — O(batch × ranges) with no Python
loop. For range tables too large to broadcast, compose instead: bucket both
sides by a coarse time grid and run this kernel per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from xhs_ocr_ray.stages.bucketing import (
    _add_key_bucket,
    bucket_map_groups,
    default_num_buckets,
    group_apply,
)

_KIND = "__kind"
_RTS = "__rts"
_RVAL = "__rval"


def _pad_like(field: pa.Field, n: int) -> pa.Array:
    """A null-free filler column of ``field``'s type (sentinels, never read:
    the per-bucket kernel splits on ``__kind`` before touching payloads).
    Nulls would do semantically, but an int64 column with nulls turns
    float64 at the pandas boundary and silently corrupts ids ≥ 2^53."""
    t = field.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.array([""] * n, t)
    if pa.types.is_timestamp(t):
        return pa.array(np.zeros(n, dtype="int64"), pa.int64()).cast(t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.array([b""] * n, t)
    return pa.array(np.zeros(n, dtype="int64"), pa.int64()).cast(t)


def asof_join(left_ds, right_ds, *, by_col: str, ts_col: str,
              right_val_col: str | None = None,
              direction: str = "backward",
              out_ts: str = "asof_ts", out_val: str = "asof_val",
              num_buckets: int | None = None):
    """Attach to every left row the nearest right row per ``by_col``
    (``direction='backward'``: latest right ``ts_col`` ≤ left ``ts_col``;
    ``'forward'``: earliest ≥). Unmatched left rows keep null ``out_ts``.

    Left payload columns pass through unchanged. ``right_val_col``
    additionally carries one right-side value column into ``out_val``.
    Equal right timestamps within a key are tie-broken by max
    ``right_val_col`` (or arbitrarily when no value column) — callers
    needing exact oracle parity should make the value a function of the
    timestamp.

    Both inputs must carry Arrow schemas (parquet reads / pyarrow
    map_batches do; pandas-block datasets report Python types — convert
    with a pyarrow map_batches pass first).
    """
    def _arrow_fields(ds) -> list[pa.Field]:
        s = ds.schema()
        fields = []
        for n, t in zip(s.names, s.types):
            if not isinstance(t, pa.DataType):
                raise TypeError(
                    f"asof_join needs an Arrow schema; column {n!r} reports "
                    f"{t!r} (pandas-block input? add a pyarrow map_batches)"
                )
            fields.append(pa.field(n, t))
        return fields

    left_fields = _arrow_fields(left_ds)
    right_schema = pa.schema(_arrow_fields(right_ds))
    payload = [f for f in left_fields if f.name != by_col]
    nb = num_buckets or default_num_buckets()

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {by_col: b.column(by_col)}
        for f in payload:
            cols[f.name] = b.column(f.name)
        cols[_RTS] = _pad_like(pa.field(_RTS, b.schema.field(ts_col).type),
                               b.num_rows)
        if right_val_col:
            cols[_RVAL] = _pad_like(
                pa.field(_RVAL, right_schema.field(right_val_col).type),
                b.num_rows)
        cols[_KIND] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {by_col: b.column(by_col)}
        for f in payload:
            cols[f.name] = _pad_like(f, b.num_rows)
        cols[_RTS] = b.column(ts_col)
        if right_val_col:
            cols[_RVAL] = b.column(right_val_col)
        cols[_KIND] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    payload_names = [f.name for f in payload]

    def bucket_asof(chunk: pd.DataFrame) -> pd.DataFrame:
        l = chunk[chunk[_KIND] == 0]
        r = chunk[chunk[_KIND] == 1]
        lf = l[[by_col, *payload_names]].sort_values(ts_col, kind="mergesort")
        rcols = [by_col, _RTS] + ([_RVAL] if right_val_col else [])
        # deterministic tie-break on equal right ts: merge_asof takes the
        # LAST right row in sort order, so order ties by the value column
        rsort = [_RTS, _RVAL] if right_val_col else [_RTS]
        rf = r[rcols].sort_values(rsort, kind="mergesort")
        if lf.empty:
            out = lf.assign(**{_RTS: rf[_RTS].iloc[:0]})
            if right_val_col:
                out = out.assign(**{_RVAL: rf[_RVAL].iloc[:0]})
        else:
            out = pd.merge_asof(
                lf, rf, left_on=ts_col, right_on=_RTS, by=by_col,
                direction=direction, allow_exact_matches=True,
            )
        ren = {_RTS: out_ts}
        if right_val_col:
            ren[_RVAL] = out_val
        return out.rename(columns=ren)

    tagged = (
        left_ds.map_batches(tag_left, batch_format="pyarrow")
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": [by_col], "num_buckets": nb})
    )
    return tagged.sort("__kb").map_batches(group_apply(bucket_asof),                batch_size=None, batch_format=None)


def shuffle_join(left_ds, right_ds, *, on: str | list[str],
                 right_on: str | list[str] | None = None,
                 how: str = "inner", num_buckets: int | None = None):
    """Large×large distributed hash join (``broadcast_join``'s complement:
    use it when NEITHER side fits the 5M-row broadcast guard).

    Both sides take ONE bucketed exchange on the join key; every key's rows
    from both sides land in the same bucket, and each bucket joins locally
    with ``pyarrow.Table.join`` — a vectorized Arrow hash join that keeps
    exact types for null-padded unmatched rows (an int64 right column stays
    int64-with-nulls on a left join; no pandas float64 upcast can corrupt
    large ids). ``how``: ``"inner"``, ``"left"``, ``"right"`` or ``"outer"``
    (full outer; unmatched rows from either side keep typed-null payloads
    and the coalesced key).

    Non-key column names must be disjoint across the two sides — rename
    upstream (``select_columns`` / an Arrow map_batches) rather than rely on
    engine-invented suffixes. Null join keys never match (SQL semantics).

    Scale notes: skewed keys concentrate in one bucket — salt the hot key
    upstream if one key dominates; output row fan-out is (left×right)
    matches per key, as in any join. Both inputs must carry Arrow schemas
    (parquet reads / pyarrow map_batches do).
    """
    join_types = {"inner": "inner", "left": "left outer",
                  "right": "right outer", "outer": "full outer"}
    if how not in join_types:
        raise ValueError(
            f"shuffle_join: how must be one of {sorted(join_types)}, got {how!r}")
    left_keys = [on] if isinstance(on, str) else list(on)
    right_keys = (left_keys if right_on is None
                  else [right_on] if isinstance(right_on, str) else list(right_on))

    def _arrow_fields(ds) -> list[pa.Field]:
        s = ds.schema()
        fields = []
        for n, t in zip(s.names, s.types):
            if not isinstance(t, pa.DataType):
                raise TypeError(
                    f"shuffle_join needs an Arrow schema; column {n!r} reports "
                    f"{t!r} (pandas-block input? add a pyarrow map_batches)"
                )
            fields.append(pa.field(n, t))
        return fields

    left_fields = _arrow_fields(left_ds)
    right_fields = _arrow_fields(right_ds)
    left_payload = [f for f in left_fields if f.name not in left_keys]
    right_payload = [f for f in right_fields if f.name not in right_keys]
    clash = ({f.name for f in left_payload} & {f.name for f in right_payload})
    clash |= set(left_keys) & {f.name for f in right_payload}
    if clash:
        raise ValueError(
            f"shuffle_join: column names collide across sides: {sorted(clash)} "
            "— rename one side upstream"
        )
    key_fields = [f for f in left_fields if f.name in left_keys]
    nb = num_buckets or default_num_buckets()

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {f.name: b.column(f.name) for f in key_fields + left_payload}
        for f in right_payload:
            cols[f.name] = _pad_like(f, b.num_rows)
        cols[_KIND] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {lk.name: b.column(rk) for lk, rk in zip(key_fields, right_keys)}
        for f in left_payload:
            cols[f.name] = _pad_like(f, b.num_rows)
        for f in right_payload:
            cols[f.name] = b.column(f.name)
        cols[_KIND] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    left_names = [f.name for f in key_fields] + [f.name for f in left_payload]
    right_names = [f.name for f in key_fields] + [f.name for f in right_payload]
    join_type = join_types[how]

    def bucket_join(chunk: pa.Table) -> pa.Table:
        kind = chunk.column(_KIND)
        l = chunk.filter(pc.equal(kind, 0)).select(left_names)
        r = chunk.filter(pc.equal(kind, 1)).select(right_names)
        out = l.join(r, keys=[f.name for f in key_fields], join_type=join_type)
        # column order is join-impl-defined; restore the declared contract
        return out.select(left_names + [f.name for f in right_payload])

    tagged = (
        left_ds.map_batches(tag_left, batch_format="pyarrow")
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": [f.name for f in key_fields],
                                "num_buckets": nb})
    )
    return tagged.sort("__kb").map_batches(group_apply(bucket_join, batch_format="pyarrow"),                batch_size=None, batch_format=None)


def range_join_broadcast(left_ds, ranges: pa.Table, *, ts_col: str,
                         start_col: str, end_col: str,
                         range_cols: list[str]):
    """Inner-join every left row to every range with
    ``start <= ts < end`` (ranges may overlap → row fan-out). The range
    table is broadcast once via ``ray.put``; each batch computes one
    vectorized comparison matrix and gathers matching (row, range) pairs."""
    import ray

    starts = ranges.column(start_col).cast(pa.int64()).to_numpy()
    ends = ranges.column(end_col).cast(pa.int64()).to_numpy()
    carried = {c: ranges.column(c) for c in range_cols}
    ranges_ref = ray.put((starts, ends, carried))

    def match(batch: pa.Table) -> pa.Table:
        s, e, rc = ray.get(ranges_ref)
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        # (batch × ranges) bool matrix — the broadcast contract bounds the
        # range count, so this stays a few MB per batch
        mask = (ts[:, None] >= s[None, :]) & (ts[:, None] < e[None, :])
        li, ri = np.nonzero(mask)
        out = {name: batch.column(name).take(pa.array(li, pa.int64()))
               for name in batch.column_names}
        for name, col in rc.items():
            out[name] = col.take(pa.array(ri, pa.int64()))
        return pa.table(out)

    return left_ds.map_batches(match, batch_format="pyarrow")


def range_join_shuffle(left_ds, ranges_ds, *, ts_col: str, start_col: str,
                       end_col: str, range_cols: list[str], grid_us: int,
                       num_buckets: int | None = None):
    """Distributed interval join (``range_join_broadcast``'s complement:
    use it when the range table does NOT fit a broadcast). Inner-joins
    every left row to every range with ``start <= ts < end``.

    Time is cut into fixed cells of ``grid_us`` microseconds: each left row
    lands in exactly ONE cell (``ts // grid``), each range fans out to
    every cell its ``[start, end)`` span overlaps. ONE bucketed exchange on
    the cell id co-locates rows with all candidate ranges; per cell the
    match is the same vectorized comparison matrix as the broadcast
    variant. Each (row, range) match occurs in exactly one cell — no
    cross-cell duplicates.

    Choose ``grid_us`` near the typical range length: replication factor =
    span/grid + 1 per range, while the per-cell matrix stays
    (rows-in-cell × ranges-overlapping-cell). A pathologically hot cell
    concentrates in one bucket — the standard trade of grid-partitioned
    interval/spatial joins; the output is exact (no caps).
    """
    nb = num_buckets or default_num_buckets()
    ls = left_ds.schema()
    left_fields = [pa.field(n, t) for n, t in zip(ls.names, ls.types)]
    rs_ = ranges_ds.schema()
    r_types = dict(zip(rs_.names, rs_.types))
    range_fields = [pa.field(c, r_types[c]) for c in range_cols]
    lnames = [f.name for f in left_fields]
    rnames = [f.name for f in range_fields]
    if set(lnames) & set(rnames):
        raise ValueError("range_join_shuffle: column names collide: "
                         f"{sorted(set(lnames) & set(rnames))}")

    def tag_left(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()
        cols = {f.name: b.column(f.name) for f in left_fields}
        for f in range_fields:
            cols[f.name] = _pad_like(f, b.num_rows)
        cols["__ts"] = pa.array(ts)
        cols["__rs"] = pa.array(np.zeros(b.num_rows, np.int64))
        cols["__re"] = pa.array(np.zeros(b.num_rows, np.int64))
        cols["__gc"] = pa.array(ts // grid_us)
        cols[_KIND] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_ranges(b: pa.Table) -> pa.Table:
        s = b.column(start_col).cast(pa.int64()).to_numpy()
        e = b.column(end_col).cast(pa.int64()).to_numpy()
        first = s // grid_us
        # empty ranges (end <= start) still emit one cell; they match nothing
        last = np.maximum(first, (e - 1) // grid_us)
        counts = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), counts)
        offs = (np.arange(int(counts.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
        take = pa.array(idx, pa.int64())
        cols = {}
        for f in left_fields:
            cols[f.name] = _pad_like(f, len(idx))
        for f in range_fields:
            cols[f.name] = b.column(f.name).take(take)
        cols["__ts"] = pa.array(np.zeros(len(idx), np.int64))
        cols["__rs"] = pa.array(s[idx])
        cols["__re"] = pa.array(e[idx])
        cols["__gc"] = pa.array(first[idx] + offs)
        cols[_KIND] = pa.array(np.ones(len(idx), dtype=np.int8))
        return pa.table(cols)

    def cell_join(chunk: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd_

        out = []
        for _, g in chunk.groupby("__gc", sort=False):
            l = g[g[_KIND] == 0]
            r = g[g[_KIND] == 1]
            if not len(l) or not len(r):
                continue
            tsv = l["__ts"].to_numpy()
            rs = r["__rs"].to_numpy()
            re_ = r["__re"].to_numpy()
            mask = (tsv[:, None] >= rs[None, :]) & (tsv[:, None] < re_[None, :])
            li, ri = np.nonzero(mask)
            if not len(li):
                continue
            frame = l.iloc[li][lnames].reset_index(drop=True)
            for c in rnames:
                frame[c] = r.iloc[ri][c].to_numpy()
            out.append(frame)
        if not out:
            empty = chunk.iloc[:0]  # typed empty (dtype-preserving slice)
            frame = empty[lnames].copy()
            for c in rnames:
                frame[c] = empty[c]
            return frame
        return pd_.concat(out, ignore_index=True)

    tagged = (
        left_ds.map_batches(tag_left, batch_format="pyarrow")
        .union(ranges_ds.map_batches(tag_ranges, batch_format="pyarrow"))
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": ["__gc"], "num_buckets": nb})
    )
    return bucket_map_groups(tagged, cell_join)
