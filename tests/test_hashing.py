"""Exactness tests for the Mersenne-61 hashing kernels.

The whole point of functions/hashing.py is that the arithmetic is EXACT
``mod 2^61-1`` (not uint64-wrapped), so every kernel is pinned against
arbitrary-precision Python ints here.
"""

import numpy as np
import pytest

from fulltextsearch_spark.functions.hashing import (
    M61,
    bytes_hashes,
    mulmod61,
    perm61,
    rolling_kgram_hashes,
)

M = (1 << 61) - 1


def _poly(data: bytes) -> int:
    h = 0
    for c in data:
        h = (h * 257 + c) % M
    return h


def test_mulmod61_exact_random():
    rng = np.random.default_rng(7)
    x = rng.integers(0, M, 5000, dtype=np.uint64)
    y = rng.integers(0, M, 5000, dtype=np.uint64)
    expected = np.array([(int(a) * int(b)) % M for a, b in zip(x, y)], dtype=np.uint64)
    assert np.array_equal(mulmod61(x, y), expected)


def test_mulmod61_boundaries():
    vals = np.array([0, 1, 2, M - 1, M - 2, (1 << 31) - 1, 1 << 31], dtype=np.uint64)
    for a in vals:
        got = mulmod61(np.full(vals.size, a, dtype=np.uint64), vals)
        exp = np.array([(int(a) * int(v)) % M for v in vals], dtype=np.uint64)
        assert np.array_equal(got, exp)


def test_perm61_exact():
    rng = np.random.default_rng(3)
    a = rng.integers(1, M, 64, dtype=np.uint64)
    b = rng.integers(0, M, 64, dtype=np.uint64)
    h = rng.integers(0, M, 64, dtype=np.uint64)
    exp = np.array([(int(x) * int(v) + int(y)) % M for x, y, v in zip(a, b, h)], dtype=np.uint64)
    assert np.array_equal(perm61(a, b, h), exp)


@pytest.mark.parametrize("k", [1, 3, 8])
def test_rolling_kgram_matches_naive(k):
    data = b"the quick brown fox jumps over 13 lazy dogs $%&+@" * 3
    got = rolling_kgram_hashes(data, k)
    exp = np.array([_poly(data[i : i + k]) for i in range(len(data) - k + 1)], dtype=np.uint64)
    assert np.array_equal(got, exp)
    assert got.size == len(data) - k + 1
    assert (got < np.uint64(M)).all()


def test_rolling_kgram_short_input():
    assert rolling_kgram_hashes(b"ab", 8).size == 0


def test_bytes_hashes_matches_naive():
    items = [b"key", b"", b"a", b"sparkling", b"\x00\x01\xff", b"x" * 100]
    got = bytes_hashes(items)
    exp = np.array([_poly(t) for t in items], dtype=np.uint64)
    assert np.array_equal(got, exp)
    assert bytes_hashes([]).size == 0


def test_wrap_would_have_been_wrong():
    # Demonstrate the round-1 bug: uint64-wrapped (h*257+c) % M diverges from
    # the exact value for large h — our kernel must take the exact branch.
    h = M - 5
    with np.errstate(over="ignore"):
        wrapped = ((np.uint64(h) * np.uint64(257)) + np.uint64(65)) % M61  # wraps at 2^64
    exact = (h * 257 + 65) % M
    assert int(wrapped) != exact  # the old arithmetic really was wrong
    data = bytes([255] * 16)
    got = rolling_kgram_hashes(data, 8)
    exp = np.array([_poly(data[i : i + 8]) for i in range(9)], dtype=np.uint64)
    assert np.array_equal(got, exp)
