"""Deduplication stages (SURVEY.md §2.8 D1 + training-data near-dup family).

- :func:`exact_dedup` — first-wins per key (the reference's INSERT OR IGNORE
  semantics, db/__init__.py:97,110-120): hash-shuffle groupby + per-group
  min-by-order-column. Deterministic winner: smallest ``order_col``; ties
  broken by the remaining columns' values.
- :func:`minhash_lsh_dedup` — MinHash + banded LSH near-dup clustering
  (shingle → signature → band buckets → candidate pairs → signature-verify →
  connected components).
- :func:`simhash_dedup` — 64-bit SimHash, banded into 4×16-bit chunks.
- :func:`embedding_dedup` — cosine near-dup over an embedding column via
  random-hyperplane LSH buckets.

Scale notes (100 TB): every variant pre-computes signatures in one
vectorized ``map_batches`` pass; only (bucket_key, doc_id, signature) rows —
not documents — enter the shuffle. MinHash signatures spill to parquet (they
are consumed twice — band explode + pair verification — and must not pin the
object store at 10^12 docs); candidate pairs stay a distributed Dataset end
to end: dedup, signature attach, and verification are bucketed shuffles, and
clustering is distributed min-label propagation
(:mod:`xhs_ocr_ray.stages.components`) — nothing is ever collected on the
driver. Hot LSH buckets are capped at ``max_bucket`` docs (truncation with a
logged drop count) so one degenerate bucket cannot O(n²) a task.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from xhs_ocr_ray.functions.arrow import read_parquet_clean
from xhs_ocr_ray.functions.hashing import (
    minhash_permutations,
    minhash_signature,
    shingles,
    simhash64,
)

MAX_BUCKET = 256  # max docs considered per LSH bucket (skew guard)

_LOG = logging.getLogger("xhs_ocr_ray.dedup")


def _log_truncation(stage: str, cap: int, n_dropped: int, n_buckets: int) -> None:
    """The 'no silent caps' duty: every skew-cap drop is surfaced."""
    if n_dropped:
        _LOG.warning(
            "%s: skew cap max_bucket=%d dropped %d docs across %d hot buckets "
            "(recall reduced; raise max_bucket or salt the key to recover)",
            stage, cap, n_dropped, n_buckets,
        )


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

# Shared groupby idiom lives in bucketing.py (also used by components/merge/
# windows); re-exported here for backward compatibility.
from xhs_ocr_ray.stages.bucketing import (  # noqa: E402
    NUM_KEY_BUCKETS,
    _add_key_bucket,
    default_num_buckets,
    group_apply,
)


def _first_wins(df: pd.DataFrame, key_cols: list[str],
                order_col: str) -> pd.DataFrame:
    """Keep the globally-winning row per key within ``df``: smallest
    ``order_col``, ties broken lexicographically on the remaining columns.
    Deterministic, so applying it per block and again per bucket is
    LOSSLESS — the local winner is the only candidate for global winner."""
    other = [c for c in df.columns if c not in (*key_cols, "__kb")]
    ordered = df.sort_values(
        [order_col, *[c for c in other if c != order_col]], kind="mergesort"
    )
    return ordered.drop_duplicates(subset=key_cols, keep="first")


def combine_first_wins(ds, key_cols: list[str], order_col: str):
    """Per-block first-wins combiner: narrow map that bounds the rows a
    subsequent key exchange ships to ≤ 1 per key per input block — a key
    duplicated millions of times (hot url / cookie-banner paragraph) no
    longer lands entirely in one bucket task's input (VERDICT r04 #1).
    Exposed separately so the skew test can count post-combine rows.

    Arrow-native: the block sorts with ``pc.sort_indices`` under the SAME
    total order as the bucket reducer (so the local winner IS the only
    global-winner candidate), and only the KEY columns round-trip through
    pandas for the duplicated-mask — a full-table pandas conversion here
    cost the flagship +11% wall (measured same-window A/B at sf0.1)."""
    import pyarrow.compute as pc_

    def block_combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 1:
            return batch
        other = [c for c in batch.column_names if c not in key_cols]
        sort_keys = [(order_col, "ascending")] + [
            (c, "ascending") for c in other if c != order_col]
        idx = pc_.sort_indices(batch, sort_keys=sort_keys)
        mask = ~batch.select(key_cols).take(idx).to_pandas() \
            .duplicated(keep="first").to_numpy()
        # gather winners only — never materialize the sorted full block
        return batch.take(idx.filter(pa.array(mask)))

    return ds.map_batches(block_combine, batch_format="pyarrow")


def exact_dedup(ds, key_cols: list[str], order_col: str):
    """First-wins per key: keep the row with the smallest ``order_col`` in
    each key group (ties → lexicographic on the remaining columns).

    Per-block lossless combiner (≤ 1 row per key per block crosses the
    exchange) → one shuffle on a 256-way key-hash bucket → a single
    vectorized ``drop_duplicates`` per bucket — no per-key Python dispatch,
    no hot-key concentration.
    """

    def bucket_dedup(group: pd.DataFrame) -> pd.DataFrame:
        return _first_wins(group, key_cols, order_col).drop(columns="__kb")

    return (
        combine_first_wins(ds, key_cols, order_col)
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": key_cols,
                                "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(bucket_dedup),
                       batch_size=None, batch_format=None)
    )


def paragraph_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    sep: str = "\n", out_col: str = "text_dedup"):
    """Corpus-level paragraph dedup (RefinedWeb / CCNet line-dedup family):
    explode each document into its ``sep``-separated paragraphs, keep only
    the globally FIRST occurrence of each distinct paragraph (order =
    ``(doc_id, paragraph index)``), and reassemble every surviving document
    from its remaining paragraphs in original order.

    Three narrow stages: explode (pure map, ships ``(id, pidx, para)``
    rows only) → first-wins :func:`exact_dedup` keyed on the paragraph
    text (one bucketed exchange) → ordered reassembly via
    :func:`~xhs_ocr_ray.stages.analytics.grouped_string_agg` (second
    exchange, keyed on ``id_col``). Empty paragraphs are dropped on
    explode; a document whose every paragraph was a duplicate disappears
    from the output (SQL GROUP BY semantics — filter upstream if lossless
    doc retention is needed).
    """
    from xhs_ocr_ray.stages.analytics import grouped_string_agg

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_pidx, out_para = [], [], []
        for i, t in zip(ids, texts):
            for j, p in enumerate((t or "").split(sep)):
                if p:
                    out_id.append(i)
                    out_pidx.append(j)
                    out_para.append(p)
        id_type = batch.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(out_id, id_type),
            "pidx": pa.array(out_pidx, pa.int64()),
            "para": pa.array(out_para, pa.string()),
        })

    paras = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")
    kept = exact_dedup(paras, ["para"], id_col)
    return grouped_string_agg(
        kept, [id_col], "para", ["pidx"], sep=sep, out_col=out_col)


# --------------------------------------------------------------------------
# MinHash-LSH near dedup
# --------------------------------------------------------------------------

def _union_find(pairs: list[tuple]) -> dict:
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _binary_matrix(col, width: int) -> np.ndarray:
    """``(n, width)`` uint8 matrix of a fixed-width binary column, read
    straight from the Arrow buffers — no ``to_pylist()`` / per-row bytes
    objects (that round-trip was the minhash verify hot spot). Callers
    reinterpret with ``.view(np.uint64)`` / ``.view(np.float32)``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, width), dtype=np.uint8)
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    if int(offs[-1]) - int(offs[0]) == n * width:
        flat = data[int(offs[0]) : int(offs[-1])]
    else:  # defensive: rows not uniformly packed → gather
        idx = (offs[:-1].astype(np.int64)[:, None]
               + np.arange(width, dtype=np.int64)[None, :]).ravel()
        flat = data[idx]
    return np.ascontiguousarray(flat).reshape(n, width)


def _arrow_schema(ds) -> pa.Schema:
    """The pyarrow schema of a Dataset whose blocks are Arrow-backed."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _filler(n: int, dtype: pa.DataType) -> pa.Array:
    """Type-preserving padding for schema-aligned unions: ZERO values, never
    nulls (an int64 column with nulls degrades to float64 in pandas and the
    dtype drift would leak into cluster ids)."""
    if pa.types.is_integer(dtype) or pa.types.is_floating(dtype):
        return pa.array(np.zeros(n, dtype=dtype.to_pandas_dtype()))
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return pa.array([""] * n, dtype)
    if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
        return pa.array([b""] * n, dtype)
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype):
        return pa.array([[]] * n, dtype)
    return pa.nulls(n, dtype)


def _bucket_attach(left_ds, key_col: str, right_ds, right_key: str,
                   val_col: str, out_name: str, *,
                   left_schema: pa.Schema, val_type: pa.DataType,
                   dedup_left: bool = False):
    """Distributed inner hash-join appending ``right[val_col]`` to each left
    row where ``left[key_col] == right[right_key]`` — one bucketed shuffle,
    vectorized pandas merge per bucket, no driver collection.

    The two sides union into one schema (each padded with the other's
    columns via :func:`_filler`) so the join co-locates by key through the
    repo's standard 256-way bucket groupby. ``left_schema``/``val_type`` are
    passed explicitly (introspecting a pandas-block Dataset's schema yields
    Python types, not Arrow types).
    """
    left_names = list(left_schema.names)
    left_types = {f.name: f.type for f in left_schema}

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {n: b.column(n) for n in left_names}
        cols["__jk"] = b.column(key_col)
        cols[out_name] = _filler(b.num_rows, val_type)
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {name: _filler(n, left_types[name]) for name in left_names}
        cols["__jk"] = b.column(right_key)
        cols[out_name] = b.column(val_col)
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    def join_bucket(chunk: pd.DataFrame) -> pd.DataFrame:
        left = chunk[chunk["__side"] == 0].drop(columns=[out_name, "__side", "__kb"])
        if dedup_left:
            # identical left rows always share a bucket (same join key), so
            # cross-partition dedup is exact here — saves a dedicated
            # dedup shuffle stage for callers with duplicated left rows
            left = left.drop_duplicates()
        right = chunk[chunk["__side"] == 1][["__jk", out_name]]
        return left.merge(right, on="__jk", how="inner").drop(columns=["__jk"])

    return (
        left_ds.map_batches(tag_left, batch_format="pyarrow")
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": ["__jk"],
                                "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(join_bucket),
                       batch_size=None, batch_format=None)
    )


def minhash_lsh_dedup(ds, text_col: str, id_col: str, *, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5, threshold: float = 0.7,
                      max_bucket: int = MAX_BUCKET,
                      sig_spill_dir: str | None = None,
                      broadcast_sigs: int = 200_000):
    """Near-dup clusters: returns a Dataset ``(id_col, cluster_id)`` where
    ``cluster_id`` is the smallest member id of the duplicate cluster
    (singletons map to themselves).

    Fully distributed (no unbounded driver materialization): signatures
    spill to parquet (consumed twice — band explode and pair verification),
    the candidate-pair set stays a Dataset through dedup → signature attach
    → verification, and clustering is min-label propagation
    (:func:`xhs_ocr_ray.stages.components.connected_components`).

    ``broadcast_sigs``: when the corpus has at most this many documents, the
    signature table (num_perm×8 B + id per doc) is broadcast once via
    ``ray.put`` and pairs verify against it inside ``map_batches`` — saving
    the two bucketed attach shuffles whose fixed latency dominates small
    runs. Above the threshold the distributed attach path runs (the 100-TB
    shape); 0 forces it (tests do). The threshold is an explicit, bounded
    small-side guard — the same doctrine as ``merge.broadcast_join``.
    """
    import os
    import tempfile
    import uuid

    import ray

    import ray.data

    from xhs_ocr_ray.stages.components import assign_clusters, connected_components

    a_coef, b_coef = minhash_permutations(num_perm)
    rows_per_band = num_perm // bands
    nb = default_num_buckets()  # resolved ONCE on the driver per run

    def sig_rows(batch: pa.Table) -> pa.Table:
        """(id, sig) — ONE row per document; signatures never enter the
        band shuffle (16× lighter than attaching sig to every band row).
        Stored as raw BYTES (num_perm × uint64-LE): a plain binary column
        shuffles cleanly — a fixed-length list column would be promoted to
        a Ray tensor-extension type that breaks block normalization."""
        texts = batch.column(text_col).to_pylist()
        sigs = [
            minhash_signature(shingles(t or "", shingle_k), a_coef, b_coef).tobytes()
            for t in texts
        ]
        return pa.table(
            {id_col: batch.column(id_col), "sig": pa.array(sigs, pa.binary())}
        )

    # Spill signatures to parquet: they are read twice, and at 10^12 docs a
    # .materialize() would pin num_perm×8 B/doc in the object store.
    spill = sig_spill_dir or os.path.join(
        tempfile.gettempdir(), "xhs_sig_spill", uuid.uuid4().hex
    )
    ds.map_batches(sig_rows, batch_format="pyarrow",
                   batch_size=256).write_parquet(spill)
    import glob as _glob_mod
    if not _glob_mod.glob(os.path.join(spill, "*.parquet")):
        # empty corpus writes no spill files (a daily-crawl edge): typed
        # empty result, same (int64 id, int64 cluster) schema as the repo's
        # id convention
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))
    sig_ds = read_parquet_clean(spill)

    def band_rows(batch: pa.Table) -> pa.Table:
        """(band_key, kb, id) — narrow rows for the candidate shuffle.

        Vectorized end to end: one uint64 view of every signature, a
        multiply-xor fold over each band's columns (equal band chunks →
        equal key; the key is internal, it only needs stable uniformity),
        ids gathered with an Arrow ``take`` — no per-row Python, no
        per-band hashlib call."""
        n = batch.num_rows
        id_arr = batch.column(id_col).combine_chunks()
        if n == 0:
            return pa.table({"band_key": pa.array([], pa.uint64()),
                             "__kb": pa.array([], pa.int32()),
                             id_col: id_arr})
        sigs = _binary_matrix(batch.column("sig"), num_perm * 8).view(np.uint64)
        chunks = sigs.reshape(n, bands, rows_per_band)
        h = np.broadcast_to(
            (np.arange(bands, dtype=np.uint64) + np.uint64(1))
            * np.uint64(0x9E3779B97F4A7C15),
            (n, bands),
        ).copy()  # seed per band index keeps bands' key spaces apart
        for r in range(rows_per_band):
            h = (h ^ chunks[:, :, r]) * np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
        bk = h.ravel()  # row-major: matches np.repeat(ids, bands)
        take_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "band_key": pa.array(bk),
                "__kb": pa.array((bk % np.uint64(nb)).astype("int32")),
                id_col: id_arr.take(take_idx),
            }
        )

    def coarse_candidates(chunk: pd.DataFrame) -> pd.DataFrame:
        """Unique candidate pairs per 256-way bucket (no verification here —
        pairs are verified once, not once per colliding band)."""
        seen: set[tuple] = set()
        n_dropped = n_hot = 0
        sizes = chunk.groupby("band_key")["band_key"].transform("size")
        for _, group in chunk[sizes >= 2].groupby("band_key"):
            ids_full = group[id_col].tolist()
            if len(ids_full) > max_bucket:
                n_dropped += len(ids_full) - max_bucket
                n_hot += 1
            ids = sorted(ids_full[:max_bucket])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    seen.add((ids[i], ids[j]))
        _log_truncation("minhash_lsh_dedup", max_bucket, n_dropped, n_hot)
        if not seen:
            # preserve the id dtype in empty frames (a float64 empty block
            # would poison downstream schema unification)
            empty = chunk[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty})
        arr = list(zip(*sorted(seen)))
        return pd.DataFrame({"a": arr[0], "b": arr[1]})

    cand = (
        sig_ds.map_batches(band_rows, batch_format="pyarrow")
        .sort("__kb")
        .map_batches(group_apply(coarse_candidates),
                       batch_size=None, batch_format=None)
    )
    # The same pair can surface from several band buckets; dedup is folded
    # into the first attach (pairs co-locate by their "a" join key there),
    # saving a dedicated shuffle stage. (Broadcast path: duplicates are
    # verified twice — cheap — and are harmless to label propagation.)

    n_docs = sig_ds.count()  # parquet metadata only, no scan
    if n_docs <= broadcast_sigs:
        # Small-side verify: ship the whole signature table once (ray.put,
        # zero-copy numpy on read) and verify pairs inside map_batches — no
        # attach shuffles. Bounded by construction: broadcast_sigs docs ×
        # (num_perm×8 B + id).
        import pyarrow.parquet as pq_mod

        sig_tbl = pq_mod.read_table(spill)
        idx = pd.Index(sig_tbl.column(id_col).to_pandas())
        mat = _binary_matrix(sig_tbl.column("sig"), num_perm * 8).view(np.uint64)
        handle = ray.put((idx, mat))

        def verify_small(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"a": batch.column("a"), "b": batch.column("b")})
            sidx, smat = ray.get(handle)
            ia = sidx.get_indexer(batch.column("a").to_pandas())
            ib = sidx.get_indexer(batch.column("b").to_pandas())
            ok = (ia >= 0) & (ib >= 0)
            est = np.zeros(batch.num_rows)
            est[ok] = (smat[ia[ok]] == smat[ib[ok]]).mean(axis=1)
            keep = pa.array(est >= threshold)
            return pa.table({"a": batch.column("a").filter(keep),
                             "b": batch.column("b").filter(keep)})

        edges = cand.map_batches(verify_small, batch_format="pyarrow")
    else:
        # Scale path: attach both signatures by bucketed join, compare
        # vectorized per batch — pairs never leave the cluster. (Schema from
        # sig_ds: probing ds.schema() could execute the upstream pipeline.)
        id_type = {f.name: f.type for f in _arrow_schema(sig_ds)}[id_col]
        pair_schema = pa.schema([("a", id_type), ("b", id_type)])
        with_a = _bucket_attach(cand, "a", sig_ds, id_col, "sig", "sig_a",
                                left_schema=pair_schema, val_type=pa.binary(),
                                dedup_left=True)
        with_ab = _bucket_attach(
            with_a, "b", sig_ds, id_col, "sig", "sig_b",
            left_schema=pair_schema.append(pa.field("sig_a", pa.binary())),
            val_type=pa.binary(),
        )

        def verify(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"a": batch.column("a"), "b": batch.column("b")})
            sa = _binary_matrix(batch.column("sig_a"), num_perm * 8).view(np.uint64)
            sb = _binary_matrix(batch.column("sig_b"), num_perm * 8).view(np.uint64)
            est = (sa == sb).mean(axis=1)
            keep = pa.array(est >= threshold)
            return pa.table(
                {"a": batch.column("a").filter(keep),
                 "b": batch.column("b").filter(keep)}
            )

        edges = with_ab.map_batches(verify, batch_format="pyarrow")
    # Cluster assignment reads ids from the spilled signature set (column-
    # pruned read, 8 B+id per doc) — NEVER from ``ds``: the input pipeline
    # is consumed exactly once, so an expensive upstream (a derived corpus,
    # a full extract) is not re-executed for the id column.
    ids_ds = sig_ds.select_columns([id_col]).materialize()
    labels = connected_components(edges)
    # connected_components materializes the whole pair pipeline and ids_ds
    # is pinned, so the sig parquet is fully consumed by this point: reclaim
    # an auto-created spill dir immediately (repeated bench/driver runs must
    # not accumulate num_perm×8 B/doc of /tmp parquet per invocation).
    # Caller-provided dirs are caller-owned and left alone.
    if sig_spill_dir is None:
        import shutil

        shutil.rmtree(spill, ignore_errors=True)
    return assign_clusters(ids_ds, id_col, labels)


# --------------------------------------------------------------------------
# SimHash near dedup
# --------------------------------------------------------------------------

def simhash_dedup(ds, text_col: str, id_col: str, *, max_hamming: int = 3,
                  max_bucket: int = MAX_BUCKET):
    """Near-dup clusters by 64-bit SimHash; 4×16-bit band buckets guarantee
    recall for hamming ≤ 3 (pigeonhole over 4 bands). Pairs and clustering
    stay distributed (min-label propagation, no driver collection).

    The input is consumed exactly ONCE: the narrow (id, sig) set is
    materialized (16 B/doc — the bounded frontier, not the corpus) and both
    the band explode and the final cluster assignment read from it, so an
    expensive upstream pipeline is never re-executed."""
    from xhs_ocr_ray.stages.components import assign_clusters, connected_components

    nb = default_num_buckets()  # resolved ONCE on the driver per run

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks()
        texts = batch.column(text_col).to_pylist()
        sigs = np.fromiter(
            (simhash64((t or "").split()) for t in texts),
            dtype=np.uint64, count=len(texts),
        )
        return pa.table({id_col: ids, "sig": pa.array(sigs)})

    sig_ds = ds.map_batches(
        sig_rows, batch_format="pyarrow", batch_size=1024
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        """4 narrow rows per doc — vectorized band/bucket arithmetic."""
        n = batch.num_rows
        id_arr = batch.column(id_col).combine_chunks()
        if n == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             id_col: id_arr,
                             "sig": batch.column("sig"),
                             "__kb": pa.array([], pa.int32())})
        sig = batch.column("sig").to_numpy(zero_copy_only=False)
        b_idx = np.arange(4, dtype=np.uint64)
        chunks = (sig[:, None] >> (np.uint64(16) * b_idx[None, :])) & np.uint64(0xFFFF)
        bk = ((b_idx[None, :] << np.uint64(16)) | chunks).astype(np.int64).ravel()
        take_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        return pa.table(
            {
                "band_key": pa.array(bk, pa.int64()),
                id_col: id_arr.take(take_idx),
                "sig": pa.array(np.repeat(sig, 4)),
                "__kb": pa.array((bk % nb).astype("int32")),
            }
        )

    def coarse_pairs(chunk: pd.DataFrame) -> pd.DataFrame:
        out = []
        n_dropped = n_hot = 0
        sizes = chunk.groupby("band_key")["band_key"].transform("size")
        for _, group in chunk[sizes >= 2].groupby("band_key"):
            if len(group) > max_bucket:
                n_dropped += len(group) - max_bucket
                n_hot += 1
            ids = group[id_col].tolist()[:max_bucket]
            sigs = group["sig"].tolist()[:max_bucket]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                    if d <= max_hamming:
                        a, b = ids[i], ids[j]
                        out.append((min(a, b), max(a, b)))
        _log_truncation("simhash_dedup", max_bucket, n_dropped, n_hot)
        if not out:
            empty = chunk[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty})
        arr = list(zip(*out))
        return pd.DataFrame({"a": arr[0], "b": arr[1]})

    pair_ds = (
        sig_ds.map_batches(band_rows, batch_format="pyarrow")
        .sort("__kb")
        .map_batches(group_apply(coarse_pairs),
                       batch_size=None, batch_format=None)
    )
    # duplicate pairs across band buckets are harmless to min-label
    # propagation — no dedup shuffle needed before clustering.
    labels = connected_components(pair_ds)
    return assign_clusters(sig_ds, id_col, labels)


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, within blocking key)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, text_col: str, id_col: str, block_cols: list[str],
                        *, n: int = 3, threshold: float = 0.5,
                        max_bucket: int = MAX_BUCKET):
    """Exact word-n-gram Jaccard over pairs that share a blocking key.

    The blocking key bounds the quadratic comparison (docs sharing e.g.
    (lang, source)); returns ``(a, b, jaccard)`` pairs ≥ threshold. Routed
    through the 256-way key-hash bucket (the repo groupby idiom) so high
    blocking-key cardinality never means one Python dispatch per key.
    """

    def coarse_blocks(chunk: pd.DataFrame) -> pd.DataFrame:
        outs = [
            block_pairs(g)
            for _, g in chunk.drop(columns="__kb").groupby(
                block_cols, sort=False, dropna=False
            )
        ]
        outs = [o for o in outs if len(o)]  # empty frames would promote
        if not outs:                        # the id dtype to float64
            empty = chunk[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty,
                                 "jaccard": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > max_bucket:
            _log_truncation("ngram_jaccard_pairs", max_bucket,
                            len(group) - max_bucket, 1)
        rows = group.head(max_bucket)
        ids = rows[id_col].tolist()
        grams = []
        for t in rows[text_col].tolist():
            toks = (t or "").split()
            grams.append({tuple(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))})
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                gi, gj = grams[i], grams[j]
                if not gi and not gj:
                    continue
                jac = len(gi & gj) / len(gi | gj)
                if jac >= threshold:
                    a, b = ids[i], ids[j]
                    out.append((min(a, b), max(a, b), jac))
        if not out:
            empty = group[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty,
                                 "jaccard": pd.Series([], dtype="float64")})
        arr = list(zip(*out))
        return pd.DataFrame({"a": arr[0], "b": arr[1], "jaccard": arr[2]})

    return (
        ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                       fn_kwargs={"key_cols": block_cols,
                                  "num_buckets": default_num_buckets()})
        .sort("__kb")
        .map_batches(group_apply(coarse_blocks),
                       batch_size=None, batch_format=None)
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dedup(ds, vec_col: str, id_col: str, *, threshold: float = 0.95,
                    num_planes: int = 12, seed: int = 7,
                    max_bucket: int = MAX_BUCKET, num_tables: int = 1):
    """Near-dup clusters over an embedding column via random-hyperplane LSH.

    Vectors are L2-normalized; bucket = sign pattern under ``num_planes``
    fixed hyperplanes; exact cosine verifies within-bucket pairs. Single-
    table recall is probabilistic; ``num_tables > 1`` ORs several
    independent hyperplane tables (a pair is a candidate if it collides in
    ANY table — miss probability decays exponentially in the table count)
    at the cost of ``num_tables`` band rows per vector in the shuffle.
    Duplicate pairs across tables are harmless to min-label propagation.
    Pairs and clustering stay distributed.
    """
    from xhs_ocr_ray.stages.components import assign_clusters, connected_components

    nb = default_num_buckets()  # resolved ONCE on the driver per run

    def unit_rows(batch: pa.Table) -> pa.Table:
        """(id, unit) one narrow row per vector; unit = L2-normalized
        float32 BYTES (a fixed-length list column would be promoted to a
        tensor-extension type that breaks shuffle block normalization)."""
        from xhs_ocr_ray.functions.arrow import bytes_rows, list_matrix

        ids = batch.column(id_col).combine_chunks()
        vecs = list_matrix(batch.column(vec_col), dtype=np.float32)
        if vecs.ndim != 2 or vecs.shape[0] == 0 or vecs.shape[1] == 0:
            return pa.table({id_col: ids.take(pa.array([], pa.int64())),
                             "unit": pa.array([], pa.binary())})
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = (vecs / norms).astype(np.float32)
        return pa.table({id_col: ids, "unit": bytes_rows(unit)})

    # The input is consumed exactly ONCE: the normalized vectors are
    # materialized (dim×4 B/doc) and reused by the band explode and the
    # final cluster assignment — an expensive upstream pipeline never
    # re-executes. (At extreme scale swap this for a parquet spill, as
    # minhash_lsh_dedup does for its signatures.)
    unit_ds = ds.map_batches(
        unit_rows, batch_format="pyarrow", batch_size=1024
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        id_arr = batch.column(id_col).combine_chunks()
        unit_arr = batch.column("unit").combine_chunks()
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: id_arr, "unit": unit_arr,
                             "__kb": pa.array([], pa.int32())})
        unit = _binary_matrix(
            unit_arr, len(unit_arr[0].as_py())
        ).view(np.float32)
        # one (dim, num_planes) block per table, all from one fixed seed
        planes = np.random.default_rng(seed).standard_normal(
            (num_tables, unit.shape[1], num_planes)
        ).astype(np.float32)
        out_bucket: list[np.ndarray] = []
        for t in range(num_tables):
            signs = (unit @ planes[t]) > 0
            codes = (signs.astype(np.int64) * (1 << np.arange(num_planes))).sum(axis=1)
            # table index in the high bits keeps tables' buckets disjoint
            out_bucket.append(codes + (np.int64(t) << np.int64(num_planes)))
        bucket = np.concatenate(out_bucket)
        take_idx = pa.array(np.tile(np.arange(n, dtype=np.int64), num_tables))
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                id_col: id_arr.take(take_idx),
                "unit": unit_arr.take(take_idx),
                "__kb": pa.array((bucket % nb).astype("int32")),
            }
        )

    def coarse_pairs(chunk: pd.DataFrame) -> pd.DataFrame:
        out = []
        n_dropped = n_hot = 0
        sizes = chunk.groupby("bucket")["bucket"].transform("size")
        for _, group in chunk[sizes >= 2].groupby("bucket"):
            if len(group) > max_bucket:
                n_dropped += len(group) - max_bucket
                n_hot += 1
            rows = group.head(max_bucket)
            ids = rows[id_col].tolist()
            mat = np.frombuffer(
                b"".join(rows["unit"]), dtype=np.float32
            ).reshape(len(ids), -1)
            sims = mat @ mat.T
            idx_a, idx_b = np.triu_indices(len(ids), k=1)
            hits = sims[idx_a, idx_b] >= threshold
            for i, j in zip(idx_a[hits], idx_b[hits]):
                a, b = ids[i], ids[j]
                out.append((min(a, b), max(a, b)))
        _log_truncation("embedding_dedup", max_bucket, n_dropped, n_hot)
        if not out:
            empty = chunk[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty})
        arr = list(zip(*out))
        return pd.DataFrame({"a": arr[0], "b": arr[1]})

    pair_ds = (
        unit_ds.map_batches(band_rows, batch_format="pyarrow")
        .sort("__kb")
        .map_batches(group_apply(coarse_pairs),
                       batch_size=None, batch_format=None)
    )
    labels = connected_components(pair_ds)
    return assign_clusters(unit_ds, id_col, labels)


# --------------------------------------------------------------------------
# Cross-run incremental dedup against a persisted fingerprint index
# --------------------------------------------------------------------------

def _bucket_index_files(index_dir: str, bucket: int) -> list[str]:
    """All persisted fingerprint files for ONE key bucket across every
    completed run — the per-task read set (never the whole index)."""
    import glob as _glob
    import os

    return sorted(_glob.glob(
        os.path.join(index_dir, "run_*", f"kb={bucket}", "*.parquet")))


def incremental_exact_dedup(new_ds, index_dir: str, *, fp_col: str,
                            id_col: str, num_buckets: int | None = None):
    """Dedup a NEW batch of rows against a persisted fingerprint index —
    the cross-run shape of ``exact_dedup``: yesterday's crawl is already
    deduped and its fingerprints live as parquet under ``index_dir``; today's
    batch must drop (a) rows whose ``fp_col`` is already indexed and
    (b) all-but-the-first duplicate within itself (first = smallest
    ``id_col`` per fingerprint).

    Scale design: the index is persisted HIVE-PARTITIONED BY KEY BUCKET —
    ``index_dir/run_<k>/kb=<b>/*.parquet`` — under a bucket count fixed at
    bootstrap (``_meta.json``; it must never change across runs or old rows
    land in the wrong partition). Each run shuffles only the NEW batch by
    ``fp_col`` bucket; every bucket's group task then reads ONLY its own
    ``run_*/kb=<b>/`` index files. The cumulative index is never shuffled
    and never read outside its bucket, so per-run cost scales with the new
    batch plus the touched index partitions — at 100-TB daily-crawl shape
    the index dwarfs the batch, and the previous design (union + re-bucket
    the whole index per run) paid an index-sized exchange every run.

    Per bucket: vectorized first-wins ``drop_duplicates`` + ``isin``
    anti-filter — no per-key dispatch, no driver-side set. Survivors'
    fingerprints are written inside the same task to a staging dir, which
    the driver atomically renames to a NEW ``run_<k>/`` once ALL buckets
    completed (materialize = barrier). Completed runs are never rewritten;
    a re-run after a crash either sees the completed run dir or re-creates
    it — the same idempotent-append contract as the pipeline checkpoints.
    (A retried task writes an extra staging file; duplicate fps in the
    index are harmless — the index has set semantics.)

    Returns the surviving rows as a MATERIALIZED dataset (bounded by the
    new batch, not the corpus: the index append must happen exactly once,
    so the pipeline is forced here).

    On the very first run (``index_dir`` absent/empty) this degrades to
    plain within-batch ``exact_dedup`` + index bootstrap. Pre-bucketed
    indexes are required: a legacy flat ``run_*/ *.parquet`` layout (no
    ``_meta.json``) is rejected loudly rather than silently re-read whole.
    """
    import glob as _glob
    import json
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    meta_path = os.path.join(index_dir, "_meta.json")
    existing_runs = _glob.glob(os.path.join(index_dir, "run_*"))
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            nb = int(json.load(f)["num_buckets"])
    elif existing_runs:
        raise ValueError(
            f"fingerprint index at {index_dir} has run dirs but no "
            "_meta.json — not a bucket-partitioned index; rebuild it "
            "(legacy flat indexes are not supported)")
    else:
        nb = num_buckets or default_num_buckets()
        os.makedirs(index_dir, exist_ok=True)
        tmp_meta = meta_path + f".tmp{uuid.uuid4().hex}"
        with open(tmp_meta, "w") as f:
            json.dump({"num_buckets": nb, "fp_col": fp_col}, f)
        os.replace(tmp_meta, meta_path)

    # Sweep staging dirs orphaned by a driver crash after bucket tasks wrote
    # files but before os.replace promoted the dir to run_<k> (ADVICE r04).
    # Safe: _bucket_index_files never reads _staging_* dirs, and any LIVE
    # staging dir belongs to a concurrently-running driver — the contract
    # (as with all the repo's manifest sinks) is one writer per index_dir.
    for stale in _glob.glob(os.path.join(index_dir, "_staging_*")):
        shutil.rmtree(stale, ignore_errors=True)

    staging = os.path.join(index_dir, f"_staging_{uuid.uuid4().hex}")

    def bucket_anti(chunk: pd.DataFrame) -> pd.DataFrame:
        if not len(chunk):
            return chunk.drop(columns=["__kb"])
        b = int(chunk["__kb"].iloc[0])
        keep = (chunk.sort_values([id_col], kind="mergesort")
                .drop_duplicates(subset=[fp_col], keep="first"))
        files = _bucket_index_files(index_dir, b)
        if files:
            # one Arrow-level membership test against the concatenated index
            # column — no Python-object set round-trip (VERDICT r04 #3)
            seen_col = pa.concat_tables(
                [pq.read_table(fpath, columns=[fp_col]) for fpath in files]
            ).column(fp_col).combine_chunks()
            mask = pc.is_in(pa.Array.from_pandas(keep[fp_col]),
                            value_set=seen_col)
            keep = keep[~mask.to_numpy(zero_copy_only=False)]
        keep = keep.drop(columns=["__kb"])
        if len(keep):
            kb_dir = os.path.join(staging, f"kb={b}")
            os.makedirs(kb_dir, exist_ok=True)
            pq.write_table(
                pa.table({fp_col: pa.Array.from_pandas(keep[fp_col])}),
                os.path.join(kb_dir, f"part-{uuid.uuid4().hex}.parquet"))
        return keep

    survivors = (
        new_ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                           fn_kwargs={"key_cols": [fp_col], "num_buckets": nb})
        .sort("__kb")
        .map_batches(group_apply(bucket_anti),
                       batch_size=None, batch_format=None)
    ).materialize()

    runs = [int(os.path.basename(d).split("_")[1]) for d in existing_runs]
    next_run = os.path.join(index_dir, f"run_{max(runs, default=-1) + 1}")
    try:
        os.makedirs(staging, exist_ok=True)  # zero-survivor runs still append
        os.replace(staging, next_run)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return survivors


def repeated_window_signals(ds, *, text_col: str = "text",
                            id_col: str = "doc_id", window: int = 50):
    """Corpus-internal repeated-substring detection — the detection core of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"), approximated at token-window
    granularity: for every document, how many of its distinct
    ``window``-token runs also appear in ANOTHER document.

    Stages (all narrow, compaction per the tiny-block rule):
    tokenize → distinct window md5-60-bit hashes per doc (one row per (doc,
    hash), materialized once — consumed by the count pass AND the attach)
    → cross-doc frequency via partial counts + ``Sum`` (one hash-keyed
    exchange; a window's row set is distinct per doc, so the count IS the
    distinct-doc count) → hashes with count ≥ 2 attached back with the
    bucketed join (never broadcast — at corpus scale the dup-window set is
    unbounded) → per-doc partial sums + tiny ``Sum`` groupby.

    Output: ``(id, n_windows, n_dup_windows, dup_frac)`` per doc with ≥ 1
    window; ``dup_frac`` is a single IEEE division (oracle-exact).
    """
    import pyarrow.compute as pc

    from xhs_ocr_ray.functions.arrow import arrow_from_pandas
    from xhs_ocr_ray.functions.hashing import md5_hex
    from xhs_ocr_ray.stages.components import _compact

    def win_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_h = [], []
        for i, t in zip(ids, texts):
            ws = [w for w in (t or "").split(" ") if w]
            # 60-bit md5 prefix: stays inside int64 (uint64 values above
            # 2^63 break the pandas leg of the bucket shuffle)
            hs = {
                int(md5_hex(" ".join(ws[j:j + window]))[:15], 16)
                for j in range(len(ws) - window + 1)
            }
            out_id.extend([i] * len(hs))
            out_h.extend(hs)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "h": pa.array(out_h, pa.int64()),
        })

    win = _compact(ds.select_columns([id_col, text_col]).map_batches(
        win_rows, batch_format="pyarrow").materialize())

    # cross-doc frequency: window hashes are near-unique (≈ one group per
    # hash), so Ray's native sort-groupby pays per-GROUP cost — use the
    # repo's 256-way bucketed exchange instead (CLAUDE.md rule; the native
    # groupby took 24.7 s vs ~1.5 s for this exact stage at sf0.1)
    def bucket_sum(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("h", sort=False).size().reset_index(name="n")

    def typed_counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "h": pc.cast(batch.column("h"), pa.int64()),
            "n": pc.cast(batch.column("n"), pa.int64()),
        })

    cnt = (win.select_columns(["h"])
           .map_batches(_add_key_bucket, batch_format="pyarrow",
                        fn_kwargs={"key_cols": ["h"],
                                   "num_buckets": default_num_buckets()})
           .sort("__kb")
           .map_batches(group_apply(bucket_sum),
                          batch_size=None, batch_format=None)
           .map_batches(typed_counts, batch_format="pyarrow"))

    # every window hash matches its own count row (count >= 1 by
    # construction), so _bucket_attach's inner join preserves ALL windows
    joined = _bucket_attach(
        win, "h", cnt, "h", "n", "doc_n",
        left_schema=pa.schema([(id_col, pa.int64()), ("h", pa.int64())]),
        val_type=pa.int64())

    def partial_doc(batch: pa.Table) -> pa.Table:
        doc_n = batch.column("doc_n").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            id_col: batch.column(id_col).to_pylist(),
            "n_windows": np.ones(batch.num_rows, dtype=np.int64),
            "n_dup_windows": (doc_n >= 2).astype(np.int64),
        })
        return arrow_from_pandas(
            df.groupby(id_col, sort=False).sum().reset_index())

    # per-doc reduce through the bucketed exchange (doc ids are near-
    # unique keys — native sort-groupby pays per-GROUP cost at scale)
    from xhs_ocr_ray.stages.analytics import _merge_level

    agg = _merge_level(
        joined.map_batches(partial_doc, batch_format="pyarrow"),
        [id_col],
        {"n_windows": ("n_windows", "sum"),
         "n_dup_windows": ("n_dup_windows", "sum")},
        default_num_buckets())

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_windows"), pa.int64())
        d = pc.cast(batch.column("n_dup_windows"), pa.int64())
        return pa.table({
            id_col: batch.column(id_col),
            "n_windows": n,
            "n_dup_windows": d,
            "dup_frac": pc.divide(pc.cast(d, pa.float64()),
                                  pc.cast(n, pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def repeated_window_removal(ds, *, text_col: str = "text",
                            id_col: str = "doc_id", window: int = 50,
                            min_docs: int = 2,
                            out_col: str = "clean_text"):
    """Corpus-internal repeated-substring REMOVAL — the action half of
    suffix-array substring dedup (Lee et al. 2022) at token-window
    granularity, extending :func:`repeated_window_signals` (detection)
    the way the reference DROPS rather than annotates duplicates
    (reference db/__init__.py:110-120).

    A ``window``-token run is *banned* when it occurs in ≥ ``min_docs``
    DISTINCT documents; every token covered by a banned window occurrence
    is cut from its document, and the survivors are reassembled in
    original order joined by single spaces (tokenization is
    whitespace-normalizing: ``text.split(' ')`` with empties dropped,
    the DuckDB ``string_split`` contract used corpus-wide).

    Output: ``(id_col, out_col, n_tokens, n_removed)`` for every document
    with ≥ 1 token (token-less docs vanish — SQL GROUP BY semantics).
    Documents shorter than ``window`` tokens pass through intact.

    Scale shape (all idioms already load-bearing elsewhere in this file):
    window-start rows ``(id, j, h)`` are materialized once and consumed by
    both legs; the distinct-doc count runs per-block partial distinct →
    one h-bucketed exchange (exact: all copies of an ``(id, h)`` pair
    share a bucket); banned hashes attach back through the bucketed
    ``_bucket_attach`` join (never broadcast — the banned set is
    corpus-unbounded); the rebuild co-locates each doc's text with its
    banned starts via one id-bucketed exchange. Token cut positions use a
    cumsum-of-deltas coverage mask (``np.add.at``), not per-start loops.
    """
    from xhs_ocr_ray.functions.arrow import arrow_from_pandas
    from xhs_ocr_ray.functions.hashing import md5_hex
    from xhs_ocr_ray.stages.components import _compact

    nb = default_num_buckets()

    def occ_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_j, out_h = [], [], []
        for i, t in zip(ids, texts):
            ws = [w for w in (t or "").split(" ") if w]
            for j in range(len(ws) - window + 1):
                out_id.append(i)
                out_j.append(j)
                # 60-bit md5 prefix: int64-safe through the pandas leg
                out_h.append(
                    int(md5_hex(" ".join(ws[j:j + window]))[:15], 16))
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "j": pa.array(out_j, pa.int64()),
            "h": pa.array(out_h, pa.int64()),
        })

    occ = _compact(ds.select_columns([id_col, text_col]).map_batches(
        occ_rows, batch_format="pyarrow").materialize())

    # distinct-doc count per window hash: per-block partial distinct
    # (combiner) → h-bucketed exchange → exact distinct + count
    def block_distinct(batch: pa.Table) -> pa.Table:
        df = pa.table({id_col: batch.column(id_col),
                       "h": batch.column("h")}).to_pandas()
        return arrow_from_pandas(df.drop_duplicates([id_col, "h"]))

    def bucket_count(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates([id_col, "h"])
        out = d.groupby("h", sort=False).size().reset_index(name="n")
        out = out[out["n"] >= min_docs]
        out["n"] = out["n"].astype("int64")
        return out[["h", "n"]]

    banned_cnt = (
        occ.map_batches(block_distinct, batch_format="pyarrow")
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": ["h"], "num_buckets": nb})
        .sort("__kb")
        .map_batches(group_apply(bucket_count),
                       batch_size=None, batch_format=None)
        .map_batches(lambda b: pa.table({
            "h": pc.cast(b.column("h"), pa.int64()),
            "n": pc.cast(b.column("n"), pa.int64())}),
            batch_format="pyarrow")
    )

    # inner join: only occurrences of banned windows survive → (id, j)
    banned_starts = _bucket_attach(
        occ, "h", banned_cnt, "h", "n", "__doc_n",
        left_schema=pa.schema([(id_col, pa.int64()), ("j", pa.int64()),
                               ("h", pa.int64())]),
        val_type=pa.int64())

    # rebuild: union docs (side 0) with banned starts (side 1), one
    # id-bucketed exchange, per-doc coverage mask + reassembly per bucket
    def tag_doc(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "__text": pc.cast(batch.column(text_col), pa.string()),
            "j": pa.array(np.full(n, -1, dtype=np.int64)),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def tag_start(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "__text": pa.array([""] * n, pa.string()),
            "j": pc.cast(batch.column("j"), pa.int64()),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        })

    def rebuild(chunk: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            id_col: pd.Series((), dtype="int64"),
            out_col: pd.Series((), dtype="string"),
            "n_tokens": pd.Series((), dtype="int64"),
            "n_removed": pd.Series((), dtype="int64"),
        })
        if not len(chunk):
            return arrow_from_pandas(empty)
        docs = chunk[chunk["__side"] == 0]
        starts = chunk[chunk["__side"] == 1]
        starts_by_id = {k: g["j"].to_numpy()
                        for k, g in starts.groupby(id_col, sort=False)}
        out_id, out_text, out_nt, out_nr = [], [], [], []
        for did, text in zip(docs[id_col].to_numpy(), docs["__text"]):
            ws = [w for w in (text or "").split(" ") if w]
            n = len(ws)
            if n == 0:
                continue
            js = starts_by_id.get(did)
            if js is None or not len(js):
                out_id.append(did)
                out_text.append(" ".join(ws))
                out_nt.append(n)
                out_nr.append(0)
                continue
            delta = np.zeros(n + 1, dtype=np.int64)
            np.add.at(delta, js, 1)
            np.add.at(delta, np.minimum(js + window, n), -1)
            covered = np.cumsum(delta[:-1]) > 0
            kept = [w for w, c in zip(ws, covered) if not c]
            out_id.append(did)
            out_text.append(" ".join(kept))
            out_nt.append(n)
            out_nr.append(int(covered.sum()))
        if not out_id:
            return arrow_from_pandas(empty)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            out_col: pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_nt, pa.int64()),
            "n_removed": pa.array(out_nr, pa.int64()),
        })

    docs_tagged = ds.select_columns([id_col, text_col]).map_batches(
        tag_doc, batch_format="pyarrow")
    starts_tagged = banned_starts.map_batches(
        lambda b: tag_start(
            pa.table({id_col: b.column(id_col), "j": b.column("j")})
            if isinstance(b, pa.Table) else b),
        batch_format="pyarrow")
    return (
        docs_tagged.union(starts_tagged)
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": [id_col], "num_buckets": nb})
        .sort("__kb")
        .map_batches(group_apply(lambda c: rebuild(c.drop(columns=["__kb"]))),
                       batch_size=None, batch_format=None)
    )


def incremental_minhash_dedup(new_ds, index_dir: str, *, text_col: str,
                              id_col: str, num_perm: int = 64,
                              bands: int = 16, shingle_k: int = 5,
                              threshold: float = 0.7,
                              num_buckets: int | None = None):
    """Near-dup a NEW batch against a persisted MinHash-LSH band index —
    the cross-run shape of :func:`minhash_lsh_dedup`, completing the
    daily-crawl contract :func:`incremental_exact_dedup` provides for
    exact fingerprints (VERDICT r04 missing #2).

    Index layout mirrors the exact-fp index: ``index_dir/_meta.json`` pins
    ``(num_perm, bands, shingle_k, num_buckets)`` at bootstrap (changing
    the LSH geometry would orphan old rows — rejected loudly), and each
    completed run appends hive-partitioned band rows
    ``run_<k>/bb=<b>/*.parquet`` with columns ``(band_key:int64,
    id:int64, sig:binary)`` (``bb = band_key % num_buckets``; keys stored
    as int64 BIT VIEWS of the uint64 fold — uint64 ≥ 2^63 dies in the
    pandas leg of the bucket shuffle, CLAUDE.md).

    Per run only the NEW batch shuffles: its band rows exchange once on
    ``bb``; each bucket task reads ONLY its own ``run_*/bb=<b>/`` index
    partitions, joins on ``band_key`` and verifies collisions with the
    vectorized signature comparison (estimate ≥ ``threshold``). The
    cumulative index is never re-shuffled. Survivors' band rows are
    written to a staging dir inside the same second exchange and the
    driver atomically promotes it to ``run_<k+1>/`` (materialize =
    barrier; stale ``_staging_*`` dirs from crashed drivers are swept at
    entry — the :func:`incremental_exact_dedup` contract).

    Survivor rule: a new doc survives iff (a) no band collision with an
    indexed doc verifies at ≥ ``threshold``, and (b) it is the smallest
    id of its within-batch near-dup cluster (:func:`minhash_lsh_dedup`).
    For corpora whose near-dups are equal-text families (signature
    similarity 1.0) this is exactly "first writer wins across runs";
    for borderline non-transitive near-dups it is the standard
    conservative approximation (a doc dropped against a dropped doc
    stays dropped).

    Returns the surviving ``(id_col, text_col)`` rows MATERIALIZED (the
    index append must happen exactly once, so the pipeline is forced
    here, as in the exact variant).
    """
    import glob as _glob
    import json
    import os
    import shutil
    import tempfile
    import uuid

    import pyarrow.parquet as pq

    from xhs_ocr_ray.functions.arrow import arrow_from_pandas

    meta_path = os.path.join(index_dir, "_meta.json")
    existing_runs = _glob.glob(os.path.join(index_dir, "run_*"))
    geometry = {"num_perm": num_perm, "bands": bands,
                "shingle_k": shingle_k}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        nb = int(meta["num_buckets"])
        for k, v in geometry.items():
            if int(meta[k]) != v:
                raise ValueError(
                    f"minhash index at {index_dir} was built with "
                    f"{k}={meta[k]}, got {v} — LSH geometry is pinned at "
                    "bootstrap; rebuild the index to change it")
    elif existing_runs:
        raise ValueError(
            f"minhash index at {index_dir} has run dirs but no _meta.json "
            "— not a valid band index; rebuild it")
    else:
        nb = num_buckets or default_num_buckets()
        os.makedirs(index_dir, exist_ok=True)
        tmp_meta = meta_path + f".tmp{uuid.uuid4().hex}"
        with open(tmp_meta, "w") as f:
            json.dump({"num_buckets": nb, **geometry}, f)
        os.replace(tmp_meta, meta_path)

    for stale in _glob.glob(os.path.join(index_dir, "_staging_*")):
        shutil.rmtree(stale, ignore_errors=True)
    staging = os.path.join(index_dir, f"_staging_{uuid.uuid4().hex}")

    rows_per_band = num_perm // bands

    # -- within-batch clustering (reuses the sig spill for the probe) ------
    spill = os.path.join(tempfile.gettempdir(), "xhs_sig_spill",
                         uuid.uuid4().hex)
    clusters = minhash_lsh_dedup(
        new_ds, text_col, id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, threshold=threshold, sig_spill_dir=spill)
    if not _glob.glob(os.path.join(spill, "*.parquet")):
        # empty NEW batch: keep the append contract (a run dir per call,
        # so run numbering stays monotone) and return a typed empty
        import ray.data

        runs0 = [int(os.path.basename(d).split("_")[1])
                 for d in existing_runs]
        nxt = os.path.join(index_dir, f"run_{max(runs0, default=-1) + 1}")
        os.makedirs(staging, exist_ok=True)
        os.replace(staging, nxt)
        shutil.rmtree(spill, ignore_errors=True)
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            text_col: pa.array([], pa.string())}))
    sig_ds = read_parquet_clean(spill)  # (id, sig) of the whole new batch

    def band_rows_i64(batch: pa.Table) -> pa.Table:
        """(band_key:int64, id, sig) + __kb = band bucket (index layout)."""
        n = batch.num_rows
        id_arr = batch.column(id_col).combine_chunks()
        if n == 0:
            return pa.table({
                "band_key": pa.array([], pa.int64()),
                id_col: id_arr,
                "sig": pa.array([], pa.binary()),
                "__kb": pa.array([], pa.int32()),
            })
        sigs = _binary_matrix(batch.column("sig"), num_perm * 8).view(np.uint64)
        chunks = sigs.reshape(n, bands, rows_per_band)
        h = np.broadcast_to(
            (np.arange(bands, dtype=np.uint64) + np.uint64(1))
            * np.uint64(0x9E3779B97F4A7C15),
            (n, bands),
        ).copy()
        for r in range(rows_per_band):
            h = (h ^ chunks[:, :, r]) * np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
        bk = h.ravel()
        take_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table({
            "band_key": pa.array(bk.view(np.int64)),
            id_col: id_arr.take(take_idx),
            "sig": batch.column("sig").combine_chunks().take(take_idx),
            "__kb": pa.array((bk % np.uint64(nb)).astype("int32")),
        })

    def _index_files(bucket: int) -> list[str]:
        return sorted(_glob.glob(os.path.join(
            index_dir, "run_*", f"bb={bucket}", "*.parquet")))

    def probe_bucket(chunk: pd.DataFrame) -> pd.DataFrame:
        """Matched new-doc ids in this band bucket (distinct)."""
        out_empty = pd.DataFrame({id_col: pd.Series((), dtype="int64")})
        if not len(chunk):
            return out_empty
        b = int(chunk["__kb"].iloc[0])
        files = _index_files(b)
        if not files:
            return out_empty
        idx = pa.concat_tables([pq.read_table(f) for f in files])
        old = idx.to_pandas()
        m = chunk.merge(old, on="band_key", how="inner",
                        suffixes=("", "_old"))
        if not len(m):
            return out_empty
        sn = _binary_matrix(
            pa.array(m["sig"].to_numpy(), pa.binary()),
            num_perm * 8).view(np.uint64)
        so = _binary_matrix(
            pa.array(m["sig_old"].to_numpy(), pa.binary()),
            num_perm * 8).view(np.uint64)
        est = (sn == so).mean(axis=1)
        hit = m.loc[est >= threshold, [id_col]].drop_duplicates()
        return hit.astype({id_col: "int64"})

    from xhs_ocr_ray.stages.components import _compact

    band_ds = sig_ds.map_batches(
        band_rows_i64, batch_format="pyarrow").materialize()
    # compact every bucketed-exchange output feeding a later sort: an
    # un-compacted 128-block sliver stream costs the consumer's sort
    # ~linear in block count (the CLAUDE.md tiny-block rule — this was
    # 19→6 s per incremental run when first measured)
    matched = _compact(
        band_ds
        .sort("__kb")
        .map_batches(group_apply(probe_bucket),
                     batch_size=None, batch_format=None)
        .materialize()
    )

    # -- survivors: cluster reps minus index hits, resolved in ONE narrow
    # id-keyed exchange over (new rows ⊎ rep ids ⊎ matched ids ⊎ sig rows);
    # the bucket task sees everything it needs per id, so survivors come
    # back WITH their signature attached — no extra join for the append ----
    def tag_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            text_col: pc.cast(b.column(text_col), pa.string()),
            "sig": pa.array([b""] * b.num_rows, pa.binary()),
            "__side": pa.array(np.zeros(b.num_rows, np.int8)),
        })

    def tag_ids(side: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                id_col: pc.cast(b.column(id_col), pa.int64()),
                text_col: pa.array([""] * b.num_rows, pa.string()),
                "sig": pa.array([b""] * b.num_rows, pa.binary()),
                "__side": pa.array(np.full(b.num_rows, side, np.int8)),
            })
        return f

    def tag_sigs(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            text_col: pa.array([""] * b.num_rows, pa.string()),
            "sig": b.column("sig"),
            "__side": pa.array(np.full(b.num_rows, 3, np.int8)),
        })

    reps = _compact(clusters.map_batches(
        lambda b: b.filter(pc.equal(b.column(id_col),
                                    b.column("cluster_id"))),
        batch_format="pyarrow").materialize())

    def pick_survivors(chunk: pd.DataFrame) -> pa.Table:
        rows = chunk[chunk["__side"] == 0]
        rep_ids = set(chunk.loc[chunk["__side"] == 1, id_col])
        hit_ids = set(chunk.loc[chunk["__side"] == 2, id_col])
        sig_of = (chunk[chunk["__side"] == 3]
                  .drop_duplicates(id_col).set_index(id_col)["sig"])
        keep = rows[rows[id_col].isin(rep_ids - hit_ids)]
        sigs = sig_of.reindex(keep[id_col])
        # explicit arrow types: an EMPTY object column would infer as null
        # type and split the schema; typed blocks also skip Ray's
        # object-dtype size estimation warnings
        return pa.table({
            id_col: pa.array(keep[id_col].to_numpy(), pa.int64()),
            text_col: pa.array(keep[text_col].tolist(), pa.string()),
            "sig": pa.array(sigs.tolist(), pa.binary()),
        })

    survivors = (
        new_ds.map_batches(tag_rows, batch_format="pyarrow")
        .union(reps.map_batches(tag_ids(1), batch_format="pyarrow"))
        .union(matched.map_batches(tag_ids(2), batch_format="pyarrow"))
        .union(sig_ds.map_batches(tag_sigs, batch_format="pyarrow"))
        .map_batches(_add_key_bucket, batch_format="pyarrow",
                     fn_kwargs={"key_cols": [id_col], "num_buckets": nb})
        .sort("__kb")
        .map_batches(group_apply(pick_survivors),
                     batch_size=None, batch_format=None)
    ).materialize()
    survivors = _compact(survivors)

    # -- append survivors' band rows atomically as run_<k+1>: recompute the
    # band fold from the attached sigs (narrow map), exchange once on the
    # band bucket, each task writes only its own staging partition ---------
    def write_bucket(chunk: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: pd.Series((), dtype="int64")})
        if not len(chunk):
            return out
        b = int(chunk["__kb"].iloc[0])
        bb_dir = os.path.join(staging, f"bb={b}")
        os.makedirs(bb_dir, exist_ok=True)
        pq.write_table(
            arrow_from_pandas(
                chunk[["band_key", id_col, "sig"]]
                .astype({"band_key": "int64", id_col: "int64"})),
            os.path.join(bb_dir, f"part-{uuid.uuid4().hex}.parquet"))
        return out

    append_run = (
        survivors.map_batches(band_rows_i64, batch_format="pyarrow")
        .sort("__kb")
        .map_batches(group_apply(write_bucket),
                     batch_size=None, batch_format=None)
    )

    runs = [int(os.path.basename(d).split("_")[1]) for d in existing_runs]
    next_run = os.path.join(index_dir, f"run_{max(runs, default=-1) + 1}")
    try:
        os.makedirs(staging, exist_ok=True)
        append_run.materialize()  # barrier: all bucket files written
        os.replace(staging, next_run)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(spill, ignore_errors=True)
    return survivors.select_columns([id_col, text_col])
