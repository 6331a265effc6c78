"""Vectorized 64-bit hashing utilities (pure numpy, no Spark).

Design: the hot path computes the base 64-bit hash **JVM-side** via
``F.xxhash64(col, seed)`` (Spark's built-in, whole-stage-codegen'd);
Python kernels receive int64 arrays and only do index math. A second
"independent" hash is derived in numpy via SplitMix64 finalization, and
k probe positions come from Kirsch–Mitzenmacher double hashing
``h_i = h1 + i*h2 (mod m)`` — the clean version of the reference's
"std::hash + i" family (Bloom_project/src/core/DynamicBloomFilter.hpp:88-94).

For Spark-free unit tests and driver-side probes we also provide a
stable bytes→uint64 hash (blake2b-folded; NOT the hot path).

Reference hash family for parity notes:
Bloom_project/src/hash/HashFunctions.cpp:13-20 (poly31), :28-34 (poly37),
:81-137 (murmur3_32), :42-70 (sha256/md5 folds). We intentionally do not
reproduce cryptographic per-element hashing in the hot path (§4 of
SURVEY.md); poly31/37 are provided for parity tests only.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain constants). uint64 in/out."""
    z = x.astype(_U64, copy=True)
    z += _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    z = z ^ (z >> _U64(31))
    return z


def to_u64(h: np.ndarray) -> np.ndarray:
    """Reinterpret Spark's signed int64 xxhash64 output as uint64."""
    return np.asarray(h).astype(np.int64, copy=False).view(_U64)


def derive_h2(h1: np.ndarray) -> np.ndarray:
    """Second hash for Kirsch–Mitzenmacher, derived without re-hashing.

    Forced odd so that h2 is invertible mod 2^w and never collapses the
    probe sequence to a single index.
    """
    return splitmix64(h1) | _U64(1)


def km_indices(h1: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) probe index matrix via double hashing, values in [0, m)."""
    h1 = to_u64(h1)
    h2 = derive_h2(h1)
    i = np.arange(k, dtype=_U64)
    # uint64 arithmetic wraps mod 2^64, which is exactly what we want
    return ((h1[:, None] + i[None, :] * h2[:, None]) % _U64(m)).astype(np.int64)


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0). Branchless binary search;
    avoids float64 rounding traps near powers of two."""
    x = x.astype(_U64, copy=True)
    r = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x >= (_U64(1) << _U64(shift))
        r[mask] += shift
        x[mask] >>= _U64(shift)
    r[x > 0] += 1
    return r


def hash64_bytes(items, seed: int = 0) -> np.ndarray:
    """Stable bytes/str → uint64 (blake2b-8 folded). Slow path: tests,
    driver-side sizing, fixtures. Hot path uses JVM F.xxhash64."""
    out = np.empty(len(items), dtype=_U64)
    skey = seed.to_bytes(8, "little", signed=False)
    for i, it in enumerate(items):
        b = it.encode("utf-8") if isinstance(it, str) else bytes(it)
        out[i] = int.from_bytes(
            hashlib.blake2b(b, digest_size=8, key=skey).digest(), "little"
        )
    return out


# --- reference-parity scalar hashes (tests only) ---------------------------

def poly_hash(s: str, base: int) -> int:
    """Polynomial string hash, parity with
    Bloom_project/src/hash/HashFunctions.cpp:13-20 (base 31) / :28-34 (37)."""
    h = 0
    for c in s:
        h = (h * base + ord(c)) & 0xFFFFFFFFFFFFFFFF
    return h
