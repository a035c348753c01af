"""Small Arrow interop helpers shared by the stages.

``arrow_from_pandas`` exists because of a pyarrow-16 sharp edge:
``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema-metadata entry, and
a schema carrying metadata is UNHASHABLE (``hash(schema)`` raises
"unhashable type: 'dict'").  Ray Data hashes schemas to deduplicate them at
every block concat / unify (``transform_pyarrow.unify_schemas``), so one
metadata-carrying table poisons schema dedup for the whole downstream
pipeline and floods logs with "Failed to hash the schemas" warnings.
Stripping the metadata costs nothing (we never round-trip through the
pandas metadata) and restores the early-exit fast path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def arrow_from_pandas(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas`` with a hashable (metadata-free) schema."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Drop schema metadata (no-op when absent) so ``hash(schema)`` works."""
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


def list_matrix(col, dtype=np.float32) -> np.ndarray:
    """``(n, dim)`` matrix of an equal-width ``list<numeric>`` column read
    from the flattened Arrow values buffer — one C-level ``flatten()`` +
    ``reshape``, no ``to_pylist()`` per-row Python objects (that round-trip
    was the ANN-ingest hot spot; the binary-column twin is
    ``stages.dedup._binary_matrix``).  Ragged or null-bearing columns fall
    back to the slow path so callers keep their existing error behavior.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    t = arr.type
    if arr.null_count == 0:
        if pa.types.is_fixed_size_list(t):
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(n, t.list_size).astype(dtype, copy=False)
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            widths = np.diff(np.asarray(arr.offsets))
            if (widths == widths[0]).all():
                flat = arr.flatten().to_numpy(zero_copy_only=False)
                return flat.reshape(n, int(widths[0])).astype(dtype, copy=False)
    return np.asarray(arr.to_pylist(), dtype=dtype)


def bytes_rows(mat: np.ndarray) -> pa.Array:
    """``(n, dim)`` numpy matrix → Arrow ``binary`` column, one row per
    matrix row, built straight from buffers (one ``tobytes()`` for the whole
    matrix + an arithmetic offsets vector) — no ``[v.tobytes() for v in m]``
    per-row loop.  The inverse of ``stages.dedup._binary_matrix``; binary
    beats ``fixed_size_list`` because fixed-length lists get promoted to Ray
    tensor-extension types that break shuffle block normalization."""
    n = mat.shape[0]
    row_nbytes = int(mat.dtype.itemsize * int(np.prod(mat.shape[1:], dtype=np.int64)))
    if n * row_nbytes >= 2**31:
        # int32 offsets would silently wrap and corrupt the column; callers
        # must batch smaller (every stage here batches well below 2 GiB).
        raise ValueError(
            f"bytes_rows: batch matrix is {n * row_nbytes} bytes, "
            "exceeding binary-column int32 offsets; reduce batch_size")
    values = pa.py_buffer(np.ascontiguousarray(mat).tobytes())
    offsets = pa.py_buffer(
        (np.arange(n + 1, dtype=np.int32) * row_nbytes).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, values])


def read_parquet_clean(paths, **kwargs):
    """``ray.data.read_parquet`` + metadata strip.

    Parquet files written via pandas embed a ``b'pandas'`` schema-metadata
    blob in the footer; every downstream pyarrow op preserves it, so the
    strip must happen once at the read boundary.  The extra ``map_batches``
    fuses with the read task (metadata-only, zero-copy).
    """
    import ray.data

    return ray.data.read_parquet(paths, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
