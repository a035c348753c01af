"""Broadcast Bloom-filter pre-filtering for selective shuffle joins.

At 100 TB the dominant cost of ``shuffle_join(big, selective)`` is shipping
the big side through the exchange — including every row whose key has no
match at all. A Bloom filter of the selective side's keys (a few MiB of
bits, built with one pass + a sketch-sized reduce, broadcast once via
``ray.put``) lets the big side drop definitively-unmatched rows BEFORE the
shuffle. False positives only cost wasted shipping (the exact join removes
them), never wrong results; false negatives cannot occur, so the composed
result is exactly the unfiltered join.

Hashing is the repo's deterministic vectorized siphash
(``pd.util.hash_pandas_object`` with fixed keys — the same primitive as
``bucketing._add_key_bucket``), double-hashed into ``k`` probe positions
(Kirsch-Mitzenmacher): build and probe stay fully vectorized, no per-row
Python in either pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_KEY1 = "xhsbloomhashkey1"  # hash_pandas_object requires 16-byte keys
_KEY2 = "xhsbloomhashkey2"


def _hash_pair(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    s = col.to_pandas()
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY1).to_numpy()
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_KEY2).to_numpy()
    return h1, (h2 | 1)  # odd step -> full-period probing for power-of-2 m


def _positions(h1: np.ndarray, h2: np.ndarray, i: int,
               n_bits: int) -> np.ndarray:
    return (h1 + np.uint64(i) * h2) % np.uint64(n_bits)


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    w = words[(pos >> np.uint64(6)).astype(np.int64)]
    return (w >> (pos & np.uint64(63))) & np.uint64(1) != 0


def build_bloom(ds, col: str, *, n_bits: int = 1 << 23,
                k: int = 4) -> np.ndarray:
    """One pass over ``ds[col]`` → a ``n_bits``-bit filter as uint64 words.

    Per-block bitmaps (``n_bits/8`` bytes each — size the filter, not the
    data) are OR-reduced through a single-block stage; the driver receives
    ONE bitmap. ~1.2 bytes/key at 1% FPR with k=4; default 1 MiB ≈ 8M bits
    ≈ 6-7M keys at useful FPR."""
    if n_bits & (n_bits - 1):
        raise ValueError("build_bloom: n_bits must be a power of two")
    n_words = n_bits // 64

    def block_bitmap(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        if batch.num_rows:
            h1, h2 = _hash_pair(batch.column(col))
            for i in range(k):
                _set_bits(words, _positions(h1, h2, i, n_bits))
        return pa.table({"bm": pa.array([words.tobytes()], pa.large_binary())})

    def or_reduce(batch: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for bm in batch.column("bm").to_pylist():
            acc |= np.frombuffer(bm, dtype=np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.large_binary())})

    # two-level tree reduce: at 10^5 input blocks a direct repartition(1)
    # would funnel 10^5 × n_bits/8 bytes through ONE node; the fan-in stage
    # cuts that to ≤32 bitmaps before the final OR
    rows = (
        ds.map_batches(block_bitmap, batch_format="pyarrow")
        .repartition(32)
        .map_batches(or_reduce, batch_format="pyarrow")
        .repartition(1)  # ≤32 sketch-sized rows
        .map_batches(or_reduce, batch_format="pyarrow")
        .take(2)
    )
    assert len(rows) == 1
    return np.frombuffer(rows[0]["bm"], dtype=np.uint64).copy()


def bloom_prefilter(ds, col: str, words: np.ndarray, *,
                    n_bits: int | None = None, k: int = 4):
    """Keep only rows whose ``col`` MIGHT be in the filter (never drops a
    true match). Broadcast the words once via ``ray.put``; each batch does
    k vectorized probes."""
    import ray

    nb = n_bits if n_bits is not None else len(words) * 64
    if nb != len(words) * 64:
        raise ValueError("bloom_prefilter: n_bits inconsistent with words")
    ref = ray.put(words)

    def probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        w = ray.get(ref)
        h1, h2 = _hash_pair(batch.column(col))
        mask = np.ones(batch.num_rows, dtype=bool)
        for i in range(k):
            mask &= _test_bits(w, _positions(h1, h2, i, nb))
        return batch.filter(pa.array(mask))

    return ds.map_batches(probe, batch_format="pyarrow")
