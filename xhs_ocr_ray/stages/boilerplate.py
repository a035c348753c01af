"""Corpus-level boilerplate line removal (CCNet-style).

A web crawl repeats navigation/footer/cookie-banner lines across every page
of a host; LLM corpus pipelines drop a line when it appears in ≥ ``min_docs``
DISTINCT documents of the same group (host/source). This is the distributed
form of that pass over a ``(id, group, text)`` table:

1. **Explode** each document into ``(group, line, id, line_idx)`` rows —
   fully vectorized (``pc.split_pattern`` + ``list_parent_indices``; no
   per-row Python splitting).
2. **Exchange 1** — bucket by ``(group, line)`` (the repo's
   ``_add_key_bucket`` idiom): each bucket holds every occurrence of its
   lines, so the distinct-doc count per line is local; rows come back
   flagged ``keep = n_distinct_docs < min_docs``.
3. **Exchange 2** — bucket by ``id``: reassemble each document from its
   kept lines in ``line_idx`` order, emit per-doc stats.

Both exchanges move narrow line rows, never whole documents next to their
duplicates; the per-bucket work is vectorized pandas. At 100 TB the line
table is the corpus itself once — the same cost shape as a tokenization
pass — and banned-line detection needs no driver state at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from xhs_ocr_ray.functions.arrow import arrow_from_pandas
from xhs_ocr_ray.stages.bucketing import _add_key_bucket, default_num_buckets


def _explode_lines(batch: pa.Table, *, text_col: str, id_col: str,
                   group_col: str) -> pa.Table:
    """(id, group, text) → one row per line: (id, group, line_idx, line)."""
    texts = batch.column(text_col).combine_chunks()
    split = pc.split_pattern(
        pc.coalesce(texts, pa.scalar("", texts.type)), pattern="\n")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split)
    offs = np.asarray(split.offsets)
    parent_np = parent.to_numpy(zero_copy_only=False)
    line_idx = np.arange(len(flat), dtype=np.int64) - offs[:-1][parent_np]
    return pa.table(
        {
            id_col: batch.column(id_col).take(parent),
            group_col: batch.column(group_col).take(parent),
            "__line_idx": pa.array(line_idx),
            "__line": pc.cast(flat, pa.string()),
        }
    )


def boilerplate_line_filter(ds, *, text_col: str, id_col: str,
                            group_col: str, min_docs: int,
                            num_buckets: int | None = None):
    """Drop every line occurring in ≥ ``min_docs`` distinct documents of
    the same ``group_col``; returns ``(id_col, clean_text, n_kept,
    n_removed)`` — ``clean_text`` is the surviving lines joined by ``\\n``
    in original order (may be ``""`` when everything was boilerplate)."""
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    nb = num_buckets or default_num_buckets()

    def flag(chunk: pd.DataFrame) -> pd.DataFrame:
        out = chunk.drop(columns=["__kb", group_col])
        if not len(chunk):
            out["__keep"] = pd.Series((), dtype=bool)
            return out
        nd = chunk.groupby([group_col, "__line"])[id_col].transform("nunique")
        out["__keep"] = (nd < min_docs).to_numpy()
        return out

    def rebuild(chunk: pd.DataFrame) -> pa.Table:
        if not len(chunk):
            empty = pd.DataFrame({
                id_col: chunk[id_col].iloc[:0],
                "clean_text": pd.Series((), dtype="string"),
                "n_kept": pd.Series((), dtype="int64"),
                "n_removed": pd.Series((), dtype="int64"),
            })
            return arrow_from_pandas(empty)
        chunk = chunk.sort_values([id_col, "__line_idx"], kind="mergesort")
        grp = chunk.groupby(id_col, sort=True)
        kept = chunk[chunk["__keep"]]
        clean = kept.groupby(id_col, sort=True)["__line"].agg("\n".join)
        n_total = grp.size()
        n_kept = grp["__keep"].sum().astype("int64")
        out = pd.DataFrame({
            id_col: n_total.index,
            "clean_text": clean.reindex(n_total.index, fill_value="")
                               .astype("string").to_numpy(),
            "n_kept": n_kept.to_numpy(),
            "n_removed": (n_total - n_kept).astype("int64").to_numpy(),
        })
        return arrow_from_pandas(out)

    lines = ds.map_batches(
        _explode_lines, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col,
                   "group_col": group_col},
    )
    flagged = (
        lines.map_batches(_add_key_bucket, batch_format="pyarrow",
                          fn_kwargs={"key_cols": [group_col, "__line"],
                                     "num_buckets": nb})
        .groupby("__kb")
        .map_groups(flag, batch_format="pandas")
    )
    return (
        flagged.map_batches(_add_key_bucket, batch_format="pyarrow",
                            fn_kwargs={"key_cols": [id_col],
                                       "num_buckets": nb})
        .groupby("__kb")
        .map_groups(lambda c: rebuild(c.drop(columns=["__kb"])),
                    batch_format="pandas")
    )
