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


_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes | str, seed: int = 0) -> int:
    """MurmurHash3 x86_32 — parity with the reference's H3
    (Bloom_project/src/hash/HashFunctions.cpp:81-137; seed-0 wrapper
    :145-150). Spark's built-in ``F.hash()`` is the same function at
    seed 42 for 4-byte-aligned inputs (Spark deviates on tail bytes —
    asserted in tests), so the reference's primary hash family is
    natively available JVM-side; this scalar exists for byte-for-byte
    parity vectors."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = data[4 * nblocks:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def sha256_fold(s: str) -> int:
    """H4 parity: SHA-256 hex digest folded by h = h*271 + ord(c)
    (Bloom_project/src/hash/HashFunctions.cpp:42-52)."""
    hexd = hashlib.sha256(s.encode("utf-8")).hexdigest()
    h = 0
    for c in hexd:
        h = (h * 271 + ord(c)) & 0xFFFFFFFFFFFFFFFF
    return h


def md5_fold(s: str) -> int:
    """H5 parity: MD5 hex digest folded by h = h*131 + ord(c)
    (Bloom_project/src/hash/HashFunctions.cpp:60-70)."""
    hexd = hashlib.md5(s.encode("utf-8")).hexdigest()
    h = 0
    for c in hexd:
        h = (h * 131 + ord(c)) & 0xFFFFFFFFFFFFFFFF
    return h


def ascii_sum_hash(s: str, m: int) -> int:
    """H7 parity: the reference cuckoo's ``hash1`` — sum of the
    string's character codes mod the bucket count
    (Bloom_project/src/core/CuckooNonProbability.hpp:153-159). Kept as
    a parity DIAGNOSTIC only: no operator uses it (anagram sets
    collide wholesale — the fingerprint + partial-key hashing in
    kernels/cuckoo.py is the production path). JVM-side twin:
    ``aggregate(split(s, ''), 0, (acc, c) -> acc + ascii(c)) % m`` —
    no UDF needed."""
    return sum(ord(c) for c in s) % m


def ascii_sq_sum_hash(s: str, m: int) -> int:
    """H7 parity: the reference cuckoo's ``hash2`` — sum of SQUARED
    character codes mod the bucket count
    (Bloom_project/src/core/CuckooNonProbability.hpp:171-177). Parity
    diagnostic only, like ``ascii_sum_hash``."""
    return sum(ord(c) * ord(c) for c in s) % m


# --- vectorized XXH64 (Spark F.xxhash64 parity for long/int inputs) --------
# Constants and per-type block logic follow the public xxHash spec as
# used by Spark's XXH64 (seed 42, streaming one value per expression:
# hash_n = step(value_n, hash_{n-1}), hash_0 = seed).
_P64_1 = _U64(0x9E3779B185EBCA87)
_P64_2 = _U64(0xC2B2AE3D27D4EB4F)
_P64_3 = _U64(0x165667B19E3779F9)
_P64_4 = _U64(0x85EBCA77C2B2AE63)
_P64_5 = _U64(0x27D4EB2F165667C5)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _xx_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P64_2
    h = h ^ (h >> _U64(29))
    h = h * _P64_3
    h = h ^ (h >> _U64(32))
    return h


def xxh64_long(value: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashLong — parity with one LongType input of F.xxhash64.
    uint64 in/out; ``seed`` may be scalar or array (chained hashing)."""
    # uint64 wraparound (mod 2^64) is the hash's arithmetic, not an
    # error — numpy only warns for 0-d scalars, arrays wrap silently
    with np.errstate(over="ignore"):
        v = np.atleast_1d(np.asarray(value)).astype(
            np.int64, copy=False).view(_U64)
        h = np.asarray(seed, dtype=_U64) + _P64_5 + _U64(8)
        h = h ^ (_rotl64(v * _P64_2, 31) * _P64_1)
        h = _rotl64(h, 27) * _P64_1 + _P64_4
        return _xx_fmix(h)


def xxh64_int(value: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashInt — parity with one IntegerType input of F.xxhash64."""
    with np.errstate(over="ignore"):
        v = (np.atleast_1d(np.asarray(value)).astype(
            np.int64, copy=False).view(_U64) & _U64(0xFFFFFFFF))
        h = np.asarray(seed, dtype=_U64) + _P64_5 + _U64(4)
        h = h ^ (v * _P64_1)
        h = _rotl64(h, 23) * _P64_2 + _P64_3
        return _xx_fmix(h)
