"""Stable hashing primitives (pure stdlib/numpy — no external hash libs).

Everything here must be deterministic across processes and machines: these
hashes drive dedup keys, partition assignment, MinHash/SimHash signatures and
document fingerprints. Python's builtin ``hash`` is salted per process and is
NEVER used.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE_61 = (1 << 61) - 1


def stable_hash64(data: bytes | str) -> int:
    """64-bit stable hash (blake2b-8)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def stable_hash64_seeded(data: bytes | str, seed: int) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little")).digest(),
        "little",
    )


def md5_hex(data: bytes | str) -> str:
    """Hex MD5 — matches DuckDB's ``md5()`` for oracle-checked fingerprints."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.md5(data).hexdigest()


def minhash_permutations(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficients for ``num_perm`` universal-hash
    permutations ``(a*x + b) mod p``, p = 2^61-1. Coefficients and shingle
    hashes are kept < 2^32 so every product fits in uint64 exactly."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle 32-bit hashes of ``text`` (unique), vectorized.

    One utf-32 view of the text → sliding codepoint windows → a polynomial
    uint64 fold over the k columns + a splitmix64 avalanche, truncated to
    32 bits. No per-shingle hashlib call (that was the per-document hot
    loop of minhash signing); identical shingles hash identically on every
    process/machine (pure arithmetic, no salted state)."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if len(cp) < k:
        win = cp[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(cp, k)
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(win.shape[1]):  # k iterations, each vectorized over rows
        h = h * np.uint64(0x100000001B3) + win[:, j]  # uint64 wraparound fold
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return np.unique(h & np.uint64(0xFFFFFFFF))


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a 32-bit shingle-hash set.

    Fully vectorized: one (num_perm × n_shingles) uint64 matmul-shaped op.
    """
    if shingle_hashes.size == 0:
        return np.full(a.shape[0], np.uint64(_MERSENNE_61), dtype=np.uint64)
    x = shingle_hashes[None, :]  # (1, n) uint64, values < 2^32
    vals = (a[:, None] * x + b[:, None]) % np.uint64(_MERSENNE_61)
    return vals.min(axis=1)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (unit weights), vectorized."""
    if not tokens:
        return 0
    hs = np.fromiter((stable_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    mask = acc > 0
    return int(np.sum(np.where(mask, np.uint64(1) << shifts, np.uint64(0)), dtype=np.uint64))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_window_hashes(text: str, window: int = 8) -> list[int]:
    """Polynomial rolling hash of every ``window``-char substring.

    ``hashes[j]`` depends ONLY on ``text[j:j+window]`` — identical windows at
    different offsets hash identically (the winnowing property). The outgoing
    char is removed with coefficient ``base**window`` because the removal
    happens *after* the multiply-append (it entered ``window`` steps ago at
    coefficient ``base**(window-1)`` and has been multiplied once more since).
    """
    base, mod = 1_000_003, _MERSENNE_61
    power = pow(base, window, mod)
    h = 0
    out: list[int] = []
    for i, ch in enumerate(text):
        h = (h * base + ord(ch)) % mod
        if i >= window:
            h = (h - ord(text[i - window]) * power) % mod
        if i >= window - 1:
            out.append(h)
    return out


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> int:
    """Winnowing-style document fingerprint: polynomial rolling hash over a
    sliding character window; XOR-fold the hashes that are ≡0 (mod
    ``keep_mod``). Stable under small edits elsewhere in the document
    (each kept window hash depends only on its own ``window`` chars)."""
    if not text:
        return 0
    hashes = rolling_window_hashes(text, window)
    if not hashes:  # text shorter than the window: hash the whole prefix
        base, mod = 1_000_003, _MERSENNE_61
        h = 0
        for ch in text:
            h = (h * base + ord(ch)) % mod
        return h
    out = 0
    n_kept = 0
    for h in hashes:
        if h % keep_mod == 0:
            out ^= h
            n_kept += 1
    return out if n_kept else hashes[-1]
