"""Invertible Bloom filter (IBF / IBLT) — listable set sketch.

The reference's "InvertibleBloomFilter" is a counting filter that stores
the FIRST element to touch each cell in a side map
(Bloom_project/src/core/InvertibleBloomFilter.hpp:86-101 insert,
:179-213 getValue/getAllValues) — a simplification that is neither
mergeable nor reliably invertible. We implement the published IBLT
(Eppstein, Goodrich, Uyeda, Varghese, SIGCOMM'11): per cell
(count, keyXor, checkXor); peeling recovers cells, and merge /
subtract are cellwise ops → associative. The reference's getValue /
getAllValues surface is recovered relationally: peel the key hashes,
then join back to the source DataFrame to materialize the values
(operators/agg.py ibf_recover) — the Spark-first replacement for its
in-memory valueMap.

Contract parity kept: insert → exists True; remove → exists False
(Bloom_project/src/core/Bloom_project.cpp:4299-4306);
count==1-cell listing ≈ getAllValues (:4313-4323).
"""

from __future__ import annotations

import numpy as np

from .base import pack, register
from .hashing import splitmix64, to_u64

_U64 = np.uint64
_CHECK_SEED = _U64(0xA5A5A5A55A5A5A5A)


def _check(h: np.ndarray) -> np.ndarray:
    return splitmix64(h ^ _CHECK_SEED)


_GOLDEN = _U64(0x9E3779B97F4A7C15)


def _ibf_indices(h1: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) cell indices: k DISJOINT subtables of m//k cells with an
    independent hash each (the published IBLT construction).

    NOT Kirsch–Mitzenmacher: KM's probe set is a function of just
    (h1 mod m, h2 mod m), so two keys draw an IDENTICAL cell set with
    probability ~2/m² per pair — at a few hundred items per filter
    that is a likely unpeelable 2-cycle (measured: ~4% per 200-item
    shard at m=1024, recurring stalls in reconciliation). Disjoint
    subtables with per-subtable splitmix64 keep the identical-set
    probability at (k/m)^k and guarantee a key's k cells are distinct,
    so a singleton always peels. KM stays the right choice for
    Bloom/counting/count-min, where only the per-probe FPR matters."""
    h1 = to_u64(h1)
    base = m // k
    if base < 1:
        raise ValueError(f"m={m} too small for k={k} subtables")
    i = np.arange(k, dtype=_U64)
    hs = splitmix64(h1[:, None] + (_GOLDEN * (i + _U64(1)))[None, :])
    return (i[None, :] * _U64(base) + hs % _U64(base)).astype(np.int64)


@register("ibf")
class InvertibleBloomSketch:
    __slots__ = ("m", "k", "count", "key_xor", "chk_xor", "n_inserted")

    def __init__(self, m: int, k: int = 3, count=None, key_xor=None,
                 chk_xor=None, n_inserted: int = 0):
        self.m = int(m)
        self.k = int(k)
        self.count = np.zeros(m, dtype=np.int64) if count is None else count
        self.key_xor = np.zeros(m, dtype=_U64) if key_xor is None else key_xor
        self.chk_xor = np.zeros(m, dtype=_U64) if chk_xor is None else chk_xor
        self.n_inserted = int(n_inserted)

    def _apply(self, h1, sign: int) -> None:
        h = to_u64(np.asarray(h1))
        if h.size == 0:
            return
        idx = _ibf_indices(h, self.k, self.m)        # (n, k)
        chk = _check(h)
        flat = idx.ravel()
        np.add.at(self.count, flat, sign)
        # xor is its own inverse → same op for insert and remove
        np.bitwise_xor.at(self.key_xor, flat, np.repeat(h, self.k))
        np.bitwise_xor.at(self.chk_xor, flat, np.repeat(chk, self.k))
        self.n_inserted += sign * int(h.size)

    def update_hashes(self, h1) -> None:
        self._apply(h1, 1)

    def remove_hashes(self, h1) -> None:
        self._apply(h1, -1)

    def contains_hashes(self, h1) -> np.ndarray:
        """Probe: all k cells nonzero (reference exists semantics,
        InvertibleBloomFilter.hpp:115-123). Same FP behavior as CBF."""
        h = to_u64(np.asarray(h1))
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        idx = _ibf_indices(h, self.k, self.m)
        return (self.count[idx] != 0).all(axis=1)

    def merge(self, other: "InvertibleBloomSketch") -> "InvertibleBloomSketch":
        assert (self.m, self.k) == (other.m, other.k)
        return InvertibleBloomSketch(
            self.m, self.k, self.count + other.count,
            self.key_xor ^ other.key_xor, self.chk_xor ^ other.chk_xor,
            self.n_inserted + other.n_inserted)

    def subtract(self, other: "InvertibleBloomSketch") -> "InvertibleBloomSketch":
        """Set-difference sketch: peel(self − other) lists keys unique to
        each side (counts +1 / −1)."""
        assert (self.m, self.k) == (other.m, other.k)
        return InvertibleBloomSketch(
            self.m, self.k, self.count - other.count,
            self.key_xor ^ other.key_xor, self.chk_xor ^ other.chk_xor,
            self.n_inserted - other.n_inserted)

    def get_value(self, idx: int):
        """Single-cell point lookup (reference getValue,
        InvertibleBloomFilter.hpp:179-185): a PURE cell (|count| == 1
        and the checksum matches) yields its key hash; any other cell
        holds an XOR of several keys and is unreadable — returns None.
        ``peel`` is the iterated closure of this accessor."""
        if not (0 <= idx < self.m):
            raise IndexError(f"cell {idx} out of range [0, {self.m})")
        if abs(int(self.count[idx])) != 1:
            return None
        key = self.key_xor[idx].reshape(1).astype(_U64)
        if _check(key)[0] != self.chk_xor[idx]:
            return None
        return int(key[0])

    def peel(self, max_iters: int = 10_000):
        """Recover (key_hash, sign) pairs; the distributed getAllValues.
        Returns (recovered_uint64s, signs, fully_decoded).

        Wave-based: each iteration harvests EVERY currently-pure cell
        (|count| == 1 and checksum match), dedupes the recovered keys (a
        key with several pure cells must be removed once), and removes
        the whole wave in vectorized numpy ops. Equivalent to the
        textbook one-cell-at-a-time peel — a pure cell holds exactly one
        net key, so removing each distinct recovered key once is valid
        regardless of wave order — but O(d/m)× fewer full-array scans:
        cost is O(m × waves) instead of O(m × d), and random IBLTs decode
        in O(log d) waves."""
        count = self.count.copy()
        key_xor = self.key_xor.copy()
        chk_xor = self.chk_xor.copy()
        out_keys: list[np.ndarray] = []
        out_signs: list[np.ndarray] = []
        for _ in range(max_iters):
            pure = np.flatnonzero(
                ((count == 1) | (count == -1))
                & (_check(key_xor) == chk_xor))
            if pure.size == 0:
                break
            keys, first = np.unique(key_xor[pure], return_index=True)
            signs = count[pure][first].astype(np.int64)
            out_keys.append(keys)
            out_signs.append(signs)
            idx = _ibf_indices(keys, self.k, self.m).ravel()
            np.add.at(count, idx, -np.repeat(signs, self.k))
            np.bitwise_xor.at(key_xor, idx, np.repeat(keys, self.k))
            np.bitwise_xor.at(chk_xor, idx,
                              np.repeat(_check(keys), self.k))
        # zero counts alone are NOT proof of full decode: a +1/-1 key
        # pair whose k cells fully collide cancels every count but
        # leaves key_xor = A^B behind — without the residual-xor check
        # that pair would be silently reported as in-sync (probability
        # ~(k/m)^k per opposing pair, real at fleet scale)
        decoded = bool((count == 0).all() and (key_xor == 0).all()
                       and (chk_xor == 0).all())
        keys = (np.concatenate(out_keys) if out_keys
                else np.zeros(0, dtype=_U64))
        signs = (np.concatenate(out_signs) if out_signs
                 else np.zeros(0, dtype=np.int64))
        return keys, signs, decoded

    @property
    def size_bytes(self) -> int:
        return int(self.count.nbytes + self.key_xor.nbytes
                   + self.chk_xor.nbytes)

    def to_bytes(self) -> bytes:
        return pack("ibf", {"m": self.m, "k": self.k, "n": self.n_inserted},
                    self.count, self.key_xor, self.chk_xor)

    @classmethod
    def _from_state(cls, params, bufs):
        return cls(params["m"], params["k"], bufs[0], bufs[1], bufs[2],
                   params["n"])
