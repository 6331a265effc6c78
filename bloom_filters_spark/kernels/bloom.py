"""Bloom filter as a mergeable aggregator (vectorized numpy kernel).

Semantics parity with the reference's classic Bloom
(insert: Bloom_project/src/core/BloomFilter.cpp:17-28,
 exists: :31-39, size: :78-91) and the capacity-sized DynBloom ctor
(Bloom_project/src/core/DynamicBloomFilter.hpp:53-97) — using the clean
sizing formulas m* = ⌈−n·lnP/ln²2⌉, k* = max(1, round(ln2·m/n))
(displayed by the reference at Bloom_project/src/core/Bloom_project.cpp:3717,1093).

Differences from the reference (deliberate, documented in SURVEY.md §7):
- probe positions come from Kirsch–Mitzenmacher double hashing over one
  64-bit base hash (computed JVM-side by F.xxhash64) instead of four
  cryptographic string hashes per element;
- no per-element instrumentation maps (the reference's elementIndices map
  makes its "filter" linear in input size, BloomFilter.cpp:27); collision
  metrics are computed relationally (operators/collisions.py).

Merge = bitwise OR → commutative, associative, idempotent monoid.
"""

from __future__ import annotations

import math

import numpy as np

from .base import pack, register
from .hashing import km_indices, to_u64


def bloom_fpr(k: int, n: int, m: int) -> float:
    """P = (1 − e^(−kn/m))^k — Bloom_project/src/core/Bloom_project.cpp:3716."""
    if m <= 0:
        return 1.0
    return (1.0 - math.exp(-k * n / m)) ** k


def optimal_m(n: int, p: float) -> int:
    """m* = ⌈−n·lnP / ln²2⌉ — Bloom_project/src/core/Bloom_project.cpp:1093."""
    return max(8, int(math.ceil(-n * math.log(p) / (math.log(2) ** 2))))


def optimal_k(m: int, n: int) -> int:
    """k* = round(ln2·m/n) — Bloom_project/src/core/Bloom_project.cpp:3717."""
    return max(1, int(round(math.log(2) * m / max(1, n))))


@register("bloom")
class BloomSketch:
    """Fixed-size bit array; update via np.bitwise_or.at on whole batches."""

    __slots__ = ("m", "k", "bits", "n_inserted")

    def __init__(self, m: int, k: int, bits: np.ndarray | None = None,
                 n_inserted: int = 0):
        self.m = int(m)
        self.k = int(k)
        self.bits = (np.zeros((m + 7) // 8, dtype=np.uint8)
                     if bits is None else bits)
        self.n_inserted = int(n_inserted)

    @classmethod
    def from_capacity(cls, n: int, p: float) -> "BloomSketch":
        m = optimal_m(n, p)
        return cls(m, optimal_k(m, n))

    # -- aggregator protocol -------------------------------------------------
    def update_hashes(self, h1) -> None:
        h1 = to_u64(np.asarray(h1))
        if h1.size == 0:
            return
        idx = km_indices(h1, self.k, self.m).ravel()
        np.bitwise_or.at(self.bits, idx >> 3,
                         np.uint8(1) << (idx & 7).astype(np.uint8))
        self.n_inserted += int(h1.size)

    def contains_hashes(self, h1) -> np.ndarray:
        h1 = to_u64(np.asarray(h1))
        if h1.size == 0:
            return np.zeros(0, dtype=bool)
        idx = km_indices(h1, self.k, self.m)
        probed = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return probed.all(axis=1)

    def merge(self, other: "BloomSketch") -> "BloomSketch":
        assert (self.m, self.k) == (other.m, other.k), "incompatible sketches"
        return BloomSketch(self.m, self.k, np.bitwise_or(self.bits, other.bits),
                           self.n_inserted + other.n_inserted)

    # -- introspection (reference getSizeInBytes/countCollisions analogues) --
    @property
    def size_bytes(self) -> int:
        return int(self.bits.nbytes)

    def bits_set(self) -> int:
        # lookup-table popcount: unpackbits would materialize an 8x
        # transient (8 GB for a 1 GB filter)
        return int(_POPCOUNT[self.bits].sum(dtype=np.int64))

    def fill_ratio(self) -> float:
        return self.bits_set() / self.m

    def expected_fpr(self) -> float:
        """Realized FPR estimate from fill ratio: (bits_set/m)^k."""
        return self.fill_ratio() ** self.k

    def theoretical_fpr(self) -> float:
        return bloom_fpr(self.k, self.n_inserted, self.m)

    # -- serde ----------------------------------------------------------------
    def _set_bit_indices(self) -> np.ndarray:
        """Positions of set bits without materializing an m-byte temp:
        expand only the nonzero BYTES (memory O(set bytes), not O(m))."""
        nz = np.flatnonzero(self.bits)
        if nz.size == 0:
            return np.zeros(0, dtype=np.int64)
        mask = ((self.bits[nz][:, None] >> np.arange(8, dtype=np.uint8))
                & 1).astype(bool)
        return ((nz[:, None].astype(np.int64) << 3)
                + np.arange(8, dtype=np.int64))[mask]

    def to_bytes(self) -> bytes:
        """Content-adaptive: a lightly-filled partial (per-partition
        fill is k·n/P bits « the design fill) ships as set-bit indices;
        a near-design-fill final filter stays a dense bit array —
        whichever is fewer bytes. Cuts the partial-merge shuffle of a
        large-m build by ~m/(64·nnz) without changing any semantics:
        encoding is a pure function of content, so merge-order and
        resume byte-identity still hold."""
        idx_dtype = np.uint32 if self.m <= 0xFFFFFFFF else np.int64
        nnz = self.bits_set()
        if nnz * np.dtype(idx_dtype).itemsize < self.bits.nbytes:
            return pack("bloom", {"m": self.m, "k": self.k,
                                  "n": self.n_inserted, "sparse": 1},
                        self._set_bit_indices().astype(idx_dtype))
        return pack("bloom", {"m": self.m, "k": self.k, "n": self.n_inserted},
                    self.bits)

    @classmethod
    def _from_state(cls, params: dict, bufs) -> "BloomSketch":
        if params.get("sparse"):
            bits = np.zeros((params["m"] + 7) // 8, dtype=np.uint8)
            idx = bufs[0].astype(np.int64)
            np.bitwise_or.at(bits, idx >> 3,
                             np.uint8(1) << (idx & 7).astype(np.uint8))
            return cls(params["m"], params["k"], bits, params["n"])
        return cls(params["m"], params["k"], bufs[0], params["n"])


@register("bloomq20")
class K20QuirkBloom(BloomSketch):
    """Opt-in twin reproducing the reference's DynBloomHLL quirk (K20).

    The constructor copy inside DynamicBloomHLLFilter.hpp shifts every
    registration branch up by one (i==1 → hash1, i==2 → hash2,
    i==3 → murmur, i>3 → std::hash+i) and registers NOTHING at i==0
    (Bloom_project/src/core/DynamicBloomHLLFilter.hpp:70-95), so the
    filter runs with k−1 effective hash functions while
    ``hash_f_counter`` still reports k. This class reproduces that
    observable in our Kirsch–Mitzenmacher family: probe slots 1..k−1
    (slot 0 dropped), ``self.k`` still the advertised k. Algebraic
    consequence pinned by tests and the ``bloom_contract`` oracle row:
        quirk.bits | BloomSketch(m, 1).bits == BloomSketch(m, k).bits
    (a k=1 standard filter is exactly the dropped slot 0).

    Production code must keep using :class:`BloomSketch`; this exists
    for parity/diagnosis only, hence the separate serde kind.
    """

    __slots__ = ()

    def effective_k(self) -> int:
        """Hash functions that actually probe: k−1 (min 0) — the quirk."""
        return max(0, self.k - 1)

    def _quirk_indices(self, h1: np.ndarray) -> np.ndarray:
        # slots 1..k-1 of the same K-M family the standard kernel uses
        return km_indices(h1, self.k, self.m)[:, 1:]

    def update_hashes(self, h1) -> None:
        h1 = to_u64(np.asarray(h1))
        if h1.size == 0 or self.effective_k() == 0:
            self.n_inserted += int(h1.size)
            return
        idx = self._quirk_indices(h1).ravel()
        np.bitwise_or.at(self.bits, idx >> 3,
                         np.uint8(1) << (idx & 7).astype(np.uint8))
        self.n_inserted += int(h1.size)

    def contains_hashes(self, h1) -> np.ndarray:
        h1 = to_u64(np.asarray(h1))
        if h1.size == 0:
            return np.zeros(0, dtype=bool)
        if self.effective_k() == 0:
            # zero registered functions: every probe passes vacuously,
            # matching the reference's all-of-empty loop
            return np.ones(h1.size, dtype=bool)
        idx = self._quirk_indices(h1)
        probed = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return probed.all(axis=1)

    def merge(self, other: "K20QuirkBloom") -> "K20QuirkBloom":
        assert (self.m, self.k) == (other.m, other.k), "incompatible sketches"
        return K20QuirkBloom(self.m, self.k,
                             np.bitwise_or(self.bits, other.bits),
                             self.n_inserted + other.n_inserted)

    def expected_fpr(self) -> float:
        return self.fill_ratio() ** self.effective_k()

    def theoretical_fpr(self) -> float:
        return bloom_fpr(self.effective_k(), self.n_inserted, self.m)

    def to_bytes(self) -> bytes:
        idx_dtype = np.uint32 if self.m <= 0xFFFFFFFF else np.int64
        nnz = self.bits_set()
        if nnz * np.dtype(idx_dtype).itemsize < self.bits.nbytes:
            return pack("bloomq20", {"m": self.m, "k": self.k,
                                     "n": self.n_inserted, "sparse": 1},
                        self._set_bit_indices().astype(idx_dtype))
        return pack("bloomq20",
                    {"m": self.m, "k": self.k, "n": self.n_inserted},
                    self.bits)


_POPCOUNT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
