"""Deterministic Mersenne-61 hashing kernels shared by dedup/fingerprinting.

All dedup/fingerprint operators (MinHash, SimHash, winnowing) hash through
the same primitive: a Karp-Rabin polynomial hash base 257 over raw bytes,
reduced **exactly** modulo the Mersenne prime M61 = 2^61 - 1, plus the
universal permutation family ``(a*h + b) mod M61``.

Why M61 and not plain uint64 wrap: the multiply ``a*h`` of two ~2^61 values
overflows uint64, silently degrading the advertised universal family to a
wrapped-multiply mixer (round-1 advice finding). The kernels here do the
multiply via 31-bit limb splitting so the arithmetic is the real
``mod 2^61-1`` — which also makes every hash *SQL-expressible* (DuckDB
HUGEINT is 128-bit, so ``(a*h+b) % M61`` is one expression), letting the
driver's DuckDB oracle recompute MinHash/SimHash/winnow values independently.

Everything is vectorized numpy over uint64 arrays; no per-element Python in
any hot path.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "M61",
    "mod61",
    "mulmod61",
    "perm61",
    "rolling_kgram_hashes",
    "bytes_hashes",
]

M61 = np.uint64((1 << 61) - 1)
_M61_INT = (1 << 61) - 1


def mod61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values (< 2^63) modulo M61 without division."""
    x = x.astype(np.uint64, copy=False)
    r = (x & M61) + (x >> np.uint64(61))
    return np.where(r >= M61, r - M61, r)


def mulmod61(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Exact (x * y) mod M61 for x, y < M61, fully vectorized.

    31-bit limb split: x = x1*2^31 + x0, y = y1*2^31 + y0, using
    2^61 = 1 (mod M61) so 2^62 = 2 and m*2^31 folds via another split.
    Every intermediate stays < 2^63, so uint64 arithmetic is exact.
    """
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    lo_mask = np.uint64((1 << 31) - 1)
    x1, x0 = x >> np.uint64(31), x & lo_mask
    y1, y0 = y >> np.uint64(31), y & lo_mask
    t2 = x1 * y1  # < 2^60; *2^62 == *2 (mod M61)
    m = x1 * y0 + x0 * y1  # < 2^62, fits
    m1, m0 = m >> np.uint64(30), m & np.uint64((1 << 30) - 1)
    # m * 2^31 = m1*2^61 + m0*2^31 == m1 + m0*2^31  (mod M61)
    s = mod61(t2 * np.uint64(2)) + mod61(m1 + (m0 << np.uint64(31))) + mod61(x0 * y0)
    return mod61(s)


def perm61(a: np.ndarray, b: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Universal permutation (a*h + b) mod M61; broadcasts a/b against h."""
    return mod61(mulmod61(a, h) + np.asarray(b, dtype=np.uint64))


def _step257(h: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(h*257 + c) mod M61 for h < M61, c < 2^8 — cheap shift-based form."""
    # h*256 = (h<<8); 2^61 == 1 so the top 8 bits fold around as (h >> 53)
    h = h.astype(np.uint64, copy=False)
    t = ((h << np.uint64(8)) & M61) + (h >> np.uint64(53)) + h + c.astype(np.uint64)
    return mod61(t)


def rolling_kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """KR polynomial hashes (base 257 mod M61) of every k-gram of ``data``.

    h(i) = sum_{j<k} data[i+j] * 257^(k-1-j)  mod M61 — computed in k
    vectorized passes over the position array.
    """
    a = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = a.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = _step257(h, a[j : j + n])
    return h


def bytes_hashes(items: list[bytes]) -> np.ndarray:
    """KR polynomial hash (base 257 mod M61) of each variable-length bytes.

    Vectorized across items: pack into a padded 2D byte matrix and run one
    ``_step257`` pass per column with a length mask (cost = max_len passes
    over the item array — items are typically short tokens).
    """
    m = len(items)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in items), dtype=np.int64, count=m)
    maxlen = int(lens.max()) if m else 0
    if maxlen == 0:
        return np.zeros(m, dtype=np.uint64)
    buf = np.frombuffer(
        b"".join(t.ljust(maxlen, b"\x00") for t in items), dtype=np.uint8
    ).reshape(m, maxlen)
    h = np.zeros(m, dtype=np.uint64)
    for j in range(maxlen):
        active = j < lens
        h = np.where(active, _step257(h, buf[:, j].astype(np.uint64)), h)
    return h
