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
not documents — enter the shuffle. Candidate pairs are assumed ≪ corpus size
(the standard LSH operating point); components run min-label union-find on
the pairs only. Hot LSH buckets are capped at ``MAX_BUCKET`` docs (salt-free
truncation with a logged drop count) so one degenerate bucket cannot O(n²)
a task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from xhs_ocr_ray.functions.hashing import (
    minhash_permutations,
    minhash_signature,
    shingles,
    simhash64,
    stable_hash64,
)

MAX_BUCKET = 256  # max docs considered per LSH bucket (skew guard)


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

NUM_KEY_BUCKETS = 256


def _add_key_bucket(batch: pa.Table, key_cols: list[str],
                    num_buckets: int = NUM_KEY_BUCKETS) -> pa.Table:
    """Coarse stable hash bucket of the key columns (shuffle key).

    The scalable groupby idiom used throughout: shuffle once on ~256 buckets,
    then do the real per-key work VECTORIZED (pandas) inside each bucket —
    instead of one Python call per key, which melts at 10^8 keys.
    """
    import zlib

    cols = [batch.column(c).to_pylist() for c in key_cols]
    buckets = [
        zlib.crc32("\x1f".join(str(v) for v in vals).encode("utf-8")) % num_buckets
        for vals in zip(*cols)
    ]
    return batch.append_column("__kb", pa.array(buckets, pa.int32()))


def exact_dedup(ds, key_cols: list[str], order_col: str):
    """First-wins per key: keep the row with the smallest ``order_col`` in
    each key group (ties → lexicographic on the remaining columns).

    One shuffle on a 256-way key-hash bucket; per-bucket dedup is a single
    vectorized ``drop_duplicates`` — no per-key Python dispatch.
    """

    def bucket_dedup(group: pd.DataFrame) -> pd.DataFrame:
        other = [c for c in group.columns if c not in (*key_cols, "__kb")]
        ordered = group.sort_values(
            [order_col, *[c for c in other if c != order_col]], kind="mergesort"
        )
        return ordered.drop_duplicates(subset=key_cols, keep="first").drop(
            columns="__kb"
        )

    return (
        ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                       fn_kwargs={"key_cols": key_cols})
        .groupby("__kb")
        .map_groups(bucket_dedup, batch_format="pandas")
    )


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


def minhash_lsh_dedup(ds, text_col: str, id_col: str, *, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5, threshold: float = 0.7):
    """Near-dup clusters: returns a Dataset ``(id_col, cluster_id)`` where
    ``cluster_id`` is the smallest member id of the duplicate cluster
    (singletons map to themselves).

    Partitioning assumption: candidate pairs fit on the driver (LSH operating
    point); everything before pair collection is distributed.
    """
    import ray

    a_coef, b_coef = minhash_permutations(num_perm)
    rows_per_band = num_perm // bands

    def sig_rows(batch: pa.Table) -> pa.Table:
        """(id, sig) — ONE row per document; signatures never enter the
        band shuffle (16× lighter than attaching sig to every band row)."""
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        sigs = [
            minhash_signature(shingles(t or "", shingle_k), a_coef, b_coef).tolist()
            for t in texts
        ]
        return pa.table(
            {id_col: batch.column(id_col), "sig": pa.array(sigs, pa.list_(pa.uint64()))}
        )

    def band_rows(batch: pa.Table) -> pa.Table:
        """(band_key, kb, id) — narrow rows for the candidate shuffle."""
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column("sig").to_pylist()
        out_band: list[int] = []
        out_id: list = []
        for i, sig in zip(ids, sigs):
            arr = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = arr[b * rows_per_band : (b + 1) * rows_per_band]
                out_band.append(stable_hash64(bytes([b]) + chunk.tobytes()))
                out_id.append(i)
        bk = np.asarray(out_band, dtype=np.uint64)
        return pa.table(
            {
                "band_key": pa.array(bk),
                "__kb": pa.array((bk % NUM_KEY_BUCKETS).astype("int32")),
                id_col: pa.array(out_id),
            }
        )

    def coarse_candidates(chunk: pd.DataFrame) -> pd.DataFrame:
        """Unique candidate pairs per 256-way bucket (no verification here —
        pairs are verified once, not once per colliding band)."""
        seen: set[tuple] = set()
        sizes = chunk.groupby("band_key")["band_key"].transform("size")
        for _, group in chunk[sizes >= 2].groupby("band_key"):
            ids = sorted(group[id_col].tolist()[:MAX_BUCKET])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    seen.add((ids[i], ids[j]))
        if not seen:
            return pd.DataFrame({"a": [], "b": []})
        arr = list(zip(*sorted(seen)))
        return pd.DataFrame({"a": arr[0], "b": arr[1]})

    # sig_ds is consumed twice (band explode + verification fetch);
    # materialize to avoid recomputing signatures. Sigs are num_perm×8B per
    # doc — at 10^12 docs you would write them to parquet instead of pinning.
    sig_ds = ds.map_batches(sig_rows, batch_format="pyarrow", batch_size=256).materialize()
    cand_df = (
        sig_ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(coarse_candidates, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()  # same pair can surface from several __kb buckets
    )

    # One vectorized verification pass: fetch only the involved signatures
    # (assumed driver-small — the LSH operating point; at larger candidate
    # volumes this becomes a hash join on id instead).
    pairs: list[tuple] = []
    if len(cand_df):
        involved = set(cand_df["a"]).union(cand_df["b"])
        inv_ref = ray.put(involved)

        def keep_involved(batch: pa.Table) -> pa.Table:
            want = ray.get(inv_ref)
            mask = [i in want for i in batch.column(id_col).to_pylist()]
            return batch.filter(pa.array(mask))

        kept = sig_ds.map_batches(keep_involved, batch_format="pyarrow").take_all()
        uniq = [r[id_col] for r in kept]
        index = {v: i for i, v in enumerate(uniq)}
        sig_mat = np.array([r["sig"] for r in kept], dtype=np.uint64)
        ia = cand_df["a"].map(index).to_numpy(dtype=np.int64)
        ib = cand_df["b"].map(index).to_numpy(dtype=np.int64)
        a_vals = cand_df["a"].to_numpy()
        b_vals = cand_df["b"].to_numpy()
        chunk_sz = 200_000  # bound the (chunk × num_perm) compare matrices
        for s in range(0, len(ia), chunk_sz):
            est = (sig_mat[ia[s : s + chunk_sz]] == sig_mat[ib[s : s + chunk_sz]]).mean(axis=1)
            for k in np.nonzero(est >= threshold)[0]:
                i = s + int(k)
                pairs.append((a_vals[i], b_vals[i], float(est[k])))
    labels = _union_find(pairs)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster_id": pa.array([labels.get(i, i) for i in ids]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash near dedup
# --------------------------------------------------------------------------

def simhash_dedup(ds, text_col: str, id_col: str, *, max_hamming: int = 3):
    """Near-dup clusters by 64-bit SimHash; 4×16-bit band buckets guarantee
    recall for hamming ≤ 3 (pigeonhole over 4 bands)."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_band, out_id, out_sig = [], [], []
        for i, text in zip(ids, texts):
            sh = simhash64((text or "").split())
            for b in range(4):
                chunk = (sh >> (16 * b)) & 0xFFFF
                out_band.append((b << 16) | chunk)
                out_id.append(i)
                out_sig.append(sh)
        return pa.table(
            {
                "band_key": pa.array(out_band, pa.int64()),
                id_col: pa.array(out_id),
                "sig": pa.array(out_sig, pa.uint64()),
            }
        )

    def coarse_pairs(chunk: pd.DataFrame) -> pd.DataFrame:
        out = []
        sizes = chunk.groupby("band_key")["band_key"].transform("size")
        for _, group in chunk[sizes >= 2].groupby("band_key"):
            ids = group[id_col].tolist()[:MAX_BUCKET]
            sigs = group["sig"].tolist()[:MAX_BUCKET]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                    if d <= max_hamming:
                        a, b = ids[i], ids[j]
                        out.append((min(a, b), max(a, b), float(d)))
        if not out:
            return pd.DataFrame({"a": [], "b": [], "est": []})
        arr = list(zip(*out))
        return pd.DataFrame({"a": arr[0], "b": arr[1], "est": arr[2]})

    pair_ds = (
        ds.map_batches(sig_rows, batch_format="pyarrow", batch_size=1024)
        .map_batches(
            lambda b: b.append_column(
                "__kb", pa.array((b.column("band_key").to_numpy(zero_copy_only=False)
                                  % NUM_KEY_BUCKETS).astype("int32"))
            ),
            batch_format="pyarrow",
        )
        .groupby("__kb")
        .map_groups(coarse_pairs, batch_format="pandas")
    )
    pairs = [(r["a"], r["b"], r["est"]) for r in pair_ds.take_all()]
    labels = _union_find(pairs)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster_id": pa.array([labels.get(i, i) for i in ids]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, within blocking key)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, text_col: str, id_col: str, block_cols: list[str],
                        *, n: int = 3, threshold: float = 0.5):
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
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        return pd.concat(outs, ignore_index=True)

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.head(MAX_BUCKET)
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
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        arr = list(zip(*out))
        return pd.DataFrame({"a": arr[0], "b": arr[1], "jaccard": arr[2]})

    return (
        ds.map_batches(_add_key_bucket, batch_format="pyarrow",
                       fn_kwargs={"key_cols": block_cols})
        .groupby("__kb")
        .map_groups(coarse_blocks, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dedup(ds, vec_col: str, id_col: str, *, threshold: float = 0.95,
                    num_planes: int = 12, seed: int = 7):
    """Near-dup clusters over an embedding column via random-hyperplane LSH.

    Vectors are L2-normalized; bucket = sign pattern under ``num_planes``
    fixed hyperplanes; exact cosine verifies within-bucket pairs. Recall is
    probabilistic (single table) — the scale path would OR several tables.
    """
    planes: np.ndarray | None = None  # lazily sized from the first batch

    def sig_rows(batch: pa.Table) -> pa.Table:
        nonlocal planes
        ids = batch.column(id_col).to_pylist()
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float32)
        if vecs.ndim != 2 or vecs.shape[0] == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], batch.schema.field(id_col).type),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal(
                (vecs.shape[1], num_planes)
            ).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        signs = (unit @ planes) > 0
        buckets = (signs.astype(np.int64) * (1 << np.arange(num_planes))).sum(axis=1)
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int64()),
                id_col: pa.array(ids),
                "vec": pa.array([v.tolist() for v in unit], pa.list_(pa.float32())),
            }
        )

    def coarse_pairs(chunk: pd.DataFrame) -> pd.DataFrame:
        out = []
        sizes = chunk.groupby("bucket")["bucket"].transform("size")
        for _, group in chunk[sizes >= 2].groupby("bucket"):
            rows = group.head(MAX_BUCKET)
            ids = rows[id_col].tolist()
            mat = np.stack([np.asarray(v, dtype=np.float32) for v in rows["vec"]])
            sims = mat @ mat.T
            idx_a, idx_b = np.triu_indices(len(ids), k=1)
            hits = sims[idx_a, idx_b] >= threshold
            for i, j, s in zip(idx_a[hits], idx_b[hits], sims[idx_a, idx_b][hits]):
                a, b = ids[i], ids[j]
                out.append((min(a, b), max(a, b), float(s)))
        if not out:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        arr = list(zip(*out))
        return pd.DataFrame({"a": arr[0], "b": arr[1], "cosine": arr[2]})

    pair_ds = (
        ds.map_batches(sig_rows, batch_format="pyarrow", batch_size=1024)
        .map_batches(
            lambda b: b.append_column(
                "__kb", pa.array((b.column("bucket").to_numpy(zero_copy_only=False)
                                  % NUM_KEY_BUCKETS).astype("int32"))
            ),
            batch_format="pyarrow",
        )
        .groupby("__kb")
        .map_groups(coarse_pairs, batch_format="pandas")
    )
    pairs = [(r["a"], r["b"], r["cosine"]) for r in pair_ds.take_all()]
    labels = _union_find(pairs)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster_id": pa.array([labels.get(i, i) for i in ids]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
