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

    q = np.asarray(query_vec, dtype=np.float32)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch.column(id_col).to_pylist()
        mat = _as_matrix(batch.column(vec_col))
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
