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

import numpy as np
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    vals = col.to_pylist()
    return np.asarray(vals, dtype=np.float32)


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
        ids = batch.column(id_col).to_pylist()
        mat = _as_matrix(batch.column(vec_col)).astype(np.float64)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                             "sim": pa.array([], pa.float64())})
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qv) / norms
        order = np.lexsort((np.asarray(ids), -sims))[:k]
        return pa.table(
            {
                id_col: pa.array([ids[i] for i in order]),
                "sim": pa.array([float(sims[i]) for i in order], pa.float64()),
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


class LshIndexSearch:
    """Random-hyperplane LSH ANN: build once over a Dataset, probe per query.

    The scale path: the corpus is hashed into ``2**num_planes`` buckets (a
    groupby-shaped shuffle once); a query probes its own bucket plus all
    buckets within ``probe_hamming`` code distance. Recall/latency trade via
    ``num_planes`` / ``probe_hamming``.
    """

    def __init__(self, ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                 num_planes: int = 8, probe_hamming: int = 1, seed: int = 11):
        self.vec_col, self.id_col = vec_col, id_col
        self.num_planes = num_planes
        self.probe_hamming = probe_hamming
        self.seed = seed
        self.planes: np.ndarray | None = None
        self.buckets: dict[int, tuple[list, np.ndarray]] = {}
        self._build(ds)

    def _codes(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return (signs.astype(np.int64) * (1 << np.arange(self.num_planes))).sum(axis=1)

    def _build(self, ds) -> None:
        seed, num_planes = self.seed, self.num_planes
        vec_col, id_col = self.vec_col, self.id_col

        def bucketize(batch: pa.Table) -> pa.Table:
            mat = _as_matrix(batch.column(vec_col))
            if mat.size == 0:
                return pa.table({"code": pa.array([], pa.int64()),
                                 id_col: batch.column(id_col),
                                 "unit": pa.array([], pa.list_(pa.float32()))})
            planes = np.random.default_rng(seed).standard_normal(
                (mat.shape[1], num_planes)
            ).astype(np.float32)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = mat / norms
            signs = (unit @ planes) > 0
            codes = (signs.astype(np.int64) * (1 << np.arange(num_planes))).sum(axis=1)
            return pa.table(
                {
                    "code": pa.array(codes, pa.int64()),
                    id_col: batch.column(id_col),
                    "unit": pa.array([v.tolist() for v in unit], pa.list_(pa.float32())),
                }
            )

        rows = ds.map_batches(bucketize, batch_format="pyarrow").take_all()
        if rows:
            dim = len(rows[0]["unit"])
            self.planes = np.random.default_rng(seed).standard_normal(
                (dim, num_planes)
            ).astype(np.float32)
        grouped: dict[int, tuple[list, list]] = {}
        for r in rows:
            ids, vecs = grouped.setdefault(int(r["code"]), ([], []))
            ids.append(r[self.id_col])
            vecs.append(np.asarray(r["unit"], dtype=np.float32))
        self.buckets = {
            c: (ids, np.stack(vecs)) for c, (ids, vecs) in grouped.items()
        }

    def _probe_codes(self, code: int) -> list[int]:
        codes = [code]
        if self.probe_hamming >= 1:
            codes += [code ^ (1 << b) for b in range(self.num_planes)]
        if self.probe_hamming >= 2:
            for b1 in range(self.num_planes):
                for b2 in range(b1 + 1, self.num_planes):
                    codes.append(code ^ (1 << b1) ^ (1 << b2))
        return codes

    def search(self, query_vec, k: int = 10) -> list[tuple]:
        """[(id, sim)] sorted desc; probes bucket + hamming neighbors."""
        q = np.asarray(query_vec, dtype=np.float32)
        q = q / (np.linalg.norm(q) or 1.0)
        code = int(self._codes(q[None, :])[0])
        cand: list[tuple] = []
        for c in self._probe_codes(code):
            if c in self.buckets:
                ids, mat = self.buckets[c]
                sims = mat @ q
                cand.extend(zip(ids, sims.tolist()))
        cand.sort(key=lambda t: (-t[1], t[0]))
        return cand[:k]


class IvfIndexSearch:
    """IVF (inverted-file) ANN: k-means coarse quantizer + per-centroid
    posting lists; queries probe the ``nprobe`` nearest centroids.

    Build is Ray-distributed: centroids are trained with a few Lloyd
    iterations over a deterministic sample (driver-side numpy — centroids
    are tiny), then ONE ``map_batches`` pass assigns every vector and emits
    (centroid_id, id, unit_vec) rows that group into posting lists. The
    scale path for the posting lists is a groupby write; here they are
    collected (bench corpus is driver-small) — documented trade-off.
    """

    def __init__(self, ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                 n_centroids: int = 16, nprobe: int = 3, iters: int = 5,
                 sample: int = 2048, seed: int = 13):
        self.vec_col, self.id_col = vec_col, id_col
        self.nprobe = nprobe
        sample_vals = ds.limit(sample).select_columns([vec_col]).to_pandas()[vec_col]
        mat = np.asarray(sample_vals.tolist(), dtype=np.float32)
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
                                 "unit": pa.array([], pa.list_(pa.float32()))})
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            u = m / nrm
            cid = (u @ cents.T).argmax(axis=1).astype(np.int32)
            return pa.table(
                {
                    "cid": pa.array(cid),
                    id_col: batch.column(id_col),
                    "unit": pa.array([v.tolist() for v in u], pa.list_(pa.float32())),
                }
            )

        rows = ds.map_batches(assign_rows, batch_format="pyarrow").take_all()
        lists: dict[int, tuple[list, list]] = {}
        for r in rows:
            ids, vecs = lists.setdefault(int(r["cid"]), ([], []))
            ids.append(r[self.id_col])
            vecs.append(np.asarray(r["unit"], dtype=np.float32))
        self.postings = {c: (ids, np.stack(vs)) for c, (ids, vs) in lists.items()}

    def search(self, query_vec, k: int = 10) -> list[tuple]:
        q = np.asarray(query_vec, dtype=np.float32)
        q = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ q))[: self.nprobe]
        cand: list[tuple] = []
        for c in order:
            got = self.postings.get(int(c))
            if got:
                ids, mat = got
                sims = mat @ q
                cand.extend(zip(ids, sims.tolist()))
        cand.sort(key=lambda t: (-t[1], t[0]))
        return cand[:k]
