"""Counting Bloom filter — supports delete; merge = elementwise add.

Parity target: Bloom_project/src/core/CounterBloom.hpp:34-68
(insert: counters++; exists: all counters > 0; remove: counters-- with
floor 0). Batched with np.add.at; counters are int64 partials clipped at
read so batch-remove of previously-inserted items matches the
reference's per-cell floor semantics.
"""

from __future__ import annotations

import numpy as np

from .base import pack, register
from .hashing import km_indices, to_u64


@register("cbf")
class CountingBloomSketch:
    __slots__ = ("m", "k", "counters", "n_inserted")

    def __init__(self, m: int, k: int, counters: np.ndarray | None = None,
                 n_inserted: int = 0):
        self.m = int(m)
        self.k = int(k)
        self.counters = (np.zeros(m, dtype=np.int64)
                         if counters is None else counters)
        self.n_inserted = int(n_inserted)

    def _idx(self, h1) -> np.ndarray:
        return km_indices(to_u64(np.asarray(h1)), self.k, self.m)

    def update_hashes(self, h1) -> None:
        h1 = np.asarray(h1)
        if h1.size == 0:
            return
        np.add.at(self.counters, self._idx(h1).ravel(), 1)
        self.n_inserted += int(h1.size)

    def remove_hashes(self, h1) -> None:
        """Batched decrement — SIGNED, clipped at read (contains is
        ``counters > 0``), never at write. That is what makes delete
        distributed-correct: a removal folded into a DIFFERENT partial
        than the insertion carries a −1 that the merge-sum reconciles;
        a write-time floor would erase it and resurrect deleted items.
        Contract (as in the reference's interactive delete checks,
        Bloom_project/src/core/Bloom_project.cpp:4146-4154): only
        remove items previously inserted — then the GLOBAL post-merge
        counters are non-negative and semantics match
        CounterBloom.hpp:58-68 exactly (the reference's floor exists
        for over-removal, a caller error in both designs)."""
        h1 = np.asarray(h1)
        if h1.size == 0:
            return
        np.add.at(self.counters, self._idx(h1).ravel(), -1)
        self.n_inserted -= int(h1.size)

    def contains_hashes(self, h1) -> np.ndarray:
        h1 = np.asarray(h1)
        if h1.size == 0:
            return np.zeros(0, dtype=bool)
        return (self.counters[self._idx(h1)] > 0).all(axis=1)

    def merge(self, other: "CountingBloomSketch") -> "CountingBloomSketch":
        assert (self.m, self.k) == (other.m, other.k)
        return CountingBloomSketch(self.m, self.k,
                                   self.counters + other.counters,
                                   self.n_inserted + other.n_inserted)

    @property
    def size_bytes(self) -> int:
        return int(self.counters.nbytes)

    def to_bytes(self) -> bytes:
        """Content-adaptive: a lightly-filled partial (nonzero counters
        ≈ k·n/P « m) ships as (index, count) pairs; a design-fill final
        filter stays dense — whichever is fewer bytes. Pure function of
        content, so merge-order/resume byte-identity hold."""
        idx_dtype = np.uint32 if self.m <= 0xFFFFFFFF else np.int64
        nz = np.flatnonzero(self.counters)
        pair = np.dtype(idx_dtype).itemsize + 8
        if nz.size * pair < self.counters.nbytes:
            return pack("cbf", {"m": self.m, "k": self.k,
                                "n": self.n_inserted, "sparse": 1},
                        nz.astype(idx_dtype), self.counters[nz])
        return pack("cbf", {"m": self.m, "k": self.k, "n": self.n_inserted},
                    self.counters)

    @classmethod
    def _from_state(cls, params, bufs):
        if params.get("sparse"):
            counters = np.zeros(params["m"], dtype=np.int64)
            counters[bufs[0].astype(np.int64)] = bufs[1]
            return cls(params["m"], params["k"], counters, params["n"])
        return cls(params["m"], params["k"], bufs[0], params["n"])
