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
