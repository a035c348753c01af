"""Row-tolerant JSONL and CSV sources.

The reference's sidecar readers parse JSON payloads row-tolerantly (bad
rows are quarantined with ``status='invalid'``, never crash the job —
`core/run.py:208-341` walks dicts defensively). This source applies the
same contract to newline-delimited JSON FILES: each line either parses and
projects onto a declared Arrow schema (missing fields → typed nulls,
numeric strings coerced) or becomes a quarantined row with every payload
column null. One malformed line in a 100 TB crawl must cost one row, not a
task retry loop.

Built on ``ray.data.read_text`` (streaming, per-block line batches) + one
``map_batches``; the JSON parse is per-line by nature, everything else is
columnar.
"""

from __future__ import annotations

import json

import pyarrow as pa


def read_jsonl_tolerant(paths, schema: dict[str, pa.DataType], *,
                        status_col: str = "status", **read_kwargs):
    """Dataset over JSONL file(s) with columns = ``schema`` keys plus
    ``status_col`` (``'ok'`` | ``'invalid'``). Invalid JSON, non-object
    lines, and uncoercible field values quarantine the row/field rather
    than raising."""
    import ray.data

    names = list(schema)

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        cols: dict[str, list] = {n: [] for n in names}
        status = []
        for line in lines:
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
            except Exception:
                for n in names:
                    cols[n].append(None)
                status.append("invalid")
                continue
            ok = True
            row = {}
            for n, typ in schema.items():
                v = obj.get(n)
                if v is not None:
                    try:
                        if pa.types.is_integer(typ):
                            v = int(v)
                        elif pa.types.is_floating(typ):
                            v = float(v)
                        elif pa.types.is_string(typ):
                            v = v if isinstance(v, str) else json.dumps(v)
                    except (TypeError, ValueError):
                        v, ok = None, False
                row[n] = v
            for n in names:
                cols[n].append(row[n])
            status.append("ok" if ok else "invalid")
        arrays = {n: pa.array(cols[n], schema[n]) for n in names}
        arrays[status_col] = pa.array(status, pa.string())
        return pa.table(arrays)

    return ray.data.read_text(paths, **read_kwargs).map_batches(
        parse, batch_format="pyarrow")


def read_csv_tolerant(paths, schema: dict[str, pa.DataType], *,
                      sep: str = ",", header: bool = True,
                      status_col: str = "status", **read_kwargs):
    """Headered CSV with the same quarantine contract as
    :func:`read_jsonl_tolerant`: wrong field count or uncoercible values →
    ``status='invalid'`` (fields null), never a raised row. Quoting follows
    the csv module's default dialect. ``header=True`` drops any line that
    exactly equals the schema's column header (the header line lands in
    SOME block after the parallel text read — matching by content keeps the
    parse order-independent)."""
    import csv
    import io

    import ray.data

    names = list(schema)
    header_line = sep.join(names)

    def parse(batch: pa.Table) -> pa.Table:
        lines = [l for l in batch.column("text").to_pylist()
                 if not (header and l == header_line)]
        cols: dict[str, list] = {n: [] for n in names}
        status = []
        for line in lines:
            try:
                fields = next(csv.reader(io.StringIO(line),
                                         delimiter=sep))
            except (csv.Error, StopIteration):
                fields = None
            if fields is None or len(fields) != len(names):
                for n in names:
                    cols[n].append(None)
                status.append("invalid")
                continue
            ok = True
            for n, v in zip(names, fields):
                typ = schema[n]
                try:
                    if v == "":
                        v = None
                    elif pa.types.is_integer(typ):
                        v = int(v)
                    elif pa.types.is_floating(typ):
                        v = float(v)
                except ValueError:
                    v, ok = None, False
                cols[n].append(v)
            status.append("ok" if ok else "invalid")
        arrays = {n: pa.array(cols[n], schema[n]) for n in names}
        arrays[status_col] = pa.array(status, pa.string())
        return pa.table(arrays)

    return ray.data.read_text(paths, **read_kwargs).map_batches(
        parse, batch_format="pyarrow")


def read_arrow_ipc_tolerant(paths, schema: dict[str, pa.DataType], *,
                            status_col: str = "status"):
    """File-tolerant Arrow IPC (``.arrow`` / Feather v2) source with the
    same projection contract as :func:`read_jsonl_tolerant`: declared
    columns are cast onto ``schema`` (missing → typed nulls, extra
    dropped). IPC corruption is detected per FILE (the format has no
    line-level recovery point), so a broken shard costs exactly one
    quarantined ``'invalid'`` row — never a task retry loop.

    Built on ``read_binary_files`` (one shard = one block row), so IPC
    shards must be block-sized — the same contract as the WARC source.
    """
    import ray.data

    names = list(schema)

    def parse(batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        for buf in batch.column("bytes"):
            try:
                t = pa.ipc.open_file(pa.BufferReader(buf.as_py())).read_all()
                arrays = {}
                for n, typ in schema.items():
                    if n in t.column_names:
                        arrays[n] = t.column(n).cast(typ)
                    else:
                        arrays[n] = pa.nulls(t.num_rows, typ)
                arrays[status_col] = pa.array(
                    ["ok"] * t.num_rows, pa.string())
                out.append(pa.table(arrays))
            except Exception:  # noqa: BLE001 — shard-local quarantine
                arrays = {n: pa.nulls(1, typ) for n, typ in schema.items()}
                arrays[status_col] = pa.array(["invalid"], pa.string())
                out.append(pa.table(arrays))
        if not out:
            arrays = {n: pa.nulls(0, typ) for n, typ in schema.items()}
            arrays[status_col] = pa.array([], pa.string())
            return pa.table(arrays)
        return pa.concat_tables(out)

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")


def read_jsonl_pages(paths, *, drop_invalid: bool = True):
    """JSONL → the canonical pages schema
    ``(url: string, warc_ts: timestamp[us], html: binary, lang: string)``.

    Line contract: ``{"url": ..., "warc_ts": "YYYY-MM-DDTHH:MM:SS",
    "html": ..., "lang": ...}``; timestamps are naive-UTC (the same
    explicit-timestamp convention as the capture source). Malformed lines
    or unparseable timestamps quarantine row-locally; ``drop_invalid``
    removes them (CLI ingestion), ``False`` keeps them with a ``status``
    column for auditing."""
    import pyarrow.compute as pc

    raw = read_jsonl_tolerant(paths, {
        "url": pa.string(),
        "warc_ts": pa.string(),
        "html": pa.string(),
        "lang": pa.string(),
    })

    def to_pages(batch: pa.Table) -> pa.Table:
        ts = pc.strptime(pc.fill_null(batch.column("warc_ts"), ""),
                         format="%Y-%m-%dT%H:%M:%S", unit="us",
                         error_is_null=True)
        status = pc.if_else(
            pc.and_(pc.equal(batch.column("status"), "ok"),
                    pc.is_valid(ts)),
            pa.scalar("ok", pa.string()), pa.scalar("invalid", pa.string()))
        out = pa.table({
            "url": pc.fill_null(batch.column("url"), ""),
            "warc_ts": ts,
            "html": pc.fill_null(batch.column("html"), "").cast(pa.binary()),
            "lang": pc.fill_null(batch.column("lang"), ""),
            "status": status,
        })
        if drop_invalid:
            out = out.filter(pc.equal(out.column("status"), "ok")) \
                     .drop_columns(["status"])
        return out

    return raw.map_batches(to_pages, batch_format="pyarrow")
