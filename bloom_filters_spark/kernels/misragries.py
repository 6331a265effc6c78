"""Misra-Gries frequent-items summary — mergeable heavy-hitter sketch.

The bounded-memory complement to count-min (`kernels/countmin.py`):
count-min answers point-frequency queries but cannot LIST the heavy
hitters without a second structure; a Misra-Gries summary of capacity
``c`` carries at most ``c`` (key, counter) pairs and guarantees

    f(x) - n/(c+1)  <=  estimate(x)  <=  f(x)        for every x,

so every key with true frequency f(x) > n/(c+1) is retained — no
false negatives above the bound. The merge (add counters, then trim by
subtracting the (c+1)-th largest counter and dropping non-positive
ones) preserves the same bound over the TOTAL stream (Agarwal,
Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS'12),
which is exactly what the partial→tree-merge build in
``operators/agg.build_sketch`` needs: per-partition summaries shuffle
``c`` rows each instead of the token stream.

Keys are 64-bit hashes (house convention): original values are
recovered relationally by joining the candidate hashes back to the
source — see ``operators/frequent.heavy_hitters``, which turns this
summary into an EXACT heavy-hitter list with one candidate-filtered
recount pass.

The reference repo has no frequent-items structure; this extends the
sketch family the same way count-min / KLL / t-digest do (north_rule
extensions).
"""

from __future__ import annotations

import numpy as np

from .base import pack, register
from .hashing import to_u64

_U64 = np.uint64


def _combine(keys_a, counts_a, keys_b, counts_b):
    """Sum counters of the concatenated (key, count) multiset."""
    keys = np.concatenate([keys_a, keys_b])
    counts = np.concatenate([counts_a, counts_b])
    uk, inv = np.unique(keys, return_inverse=True)
    uc = np.zeros(uk.size, dtype=np.int64)
    np.add.at(uc, inv, counts)
    return uk, uc


@register("mg")
class MisraGriesSketch:
    """Counter-based frequent-items summary over 64-bit key hashes.

    State: parallel arrays (keys u64, counts i64), |keys| <= capacity;
    ``n_total`` items absorbed; ``decrement_total`` = the summed trim
    thresholds, which IS the summary's current max undercount (always
    <= n_total/(capacity+1))."""

    __slots__ = ("capacity", "keys", "counts", "n_total", "decrement_total")

    def __init__(self, capacity: int, keys=None, counts=None,
                 n_total: int = 0, decrement_total: int = 0):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        keys = (np.zeros(0, dtype=_U64) if keys is None
                else to_u64(np.asarray(keys)))
        counts = (np.zeros(0, dtype=np.int64) if counts is None
                  else np.asarray(counts, dtype=np.int64))
        # estimate_hashes binary-searches keys; internal state is always
        # np.unique-sorted, but guard caller-provided arrays too
        if keys.size > 1 and not (keys[:-1] < keys[1:]).all():
            order = np.argsort(keys)
            keys, counts = keys[order], counts[order]
        self.keys = keys
        self.counts = counts
        self.n_total = int(n_total)
        self.decrement_total = int(decrement_total)

    def _trim(self) -> None:
        if self.keys.size <= self.capacity:
            return
        # Misra-Gries step, batched: subtract the (capacity+1)-th
        # largest counter from everyone; >= capacity+1 counters go to
        # <= 0 and are dropped, so <= capacity survive. Each unit of
        # subtraction burns capacity+1 units of total count, hence
        # decrement_total <= n_total/(capacity+1).
        cut = int(np.partition(self.counts, -(self.capacity + 1))
                  [-(self.capacity + 1)])
        keep = self.counts > cut
        self.keys = self.keys[keep]
        self.counts = self.counts[keep] - cut
        self.decrement_total += cut

    def update_hashes(self, h1) -> None:
        h = to_u64(np.asarray(h1))
        if h.size == 0:
            return
        uk, uc = np.unique(h, return_counts=True)
        self.keys, self.counts = _combine(self.keys, self.counts,
                                          uk, uc.astype(np.int64))
        self.n_total += int(h.size)
        self._trim()

    def merge(self, other: "MisraGriesSketch") -> "MisraGriesSketch":
        assert self.capacity == other.capacity
        keys, counts = _combine(self.keys, self.counts,
                                other.keys, other.counts)
        out = MisraGriesSketch(
            self.capacity, keys, counts,
            self.n_total + other.n_total,
            self.decrement_total + other.decrement_total)
        out._trim()
        return out

    @property
    def error_bound(self) -> int:
        """Current max undercount of any counter (exact, not a bound
        formula): a key's true count minus its counter is at most the
        sum of trims it lived through."""
        return self.decrement_total

    def estimate_hashes(self, h1) -> np.ndarray:
        """Lower-bound counts for a batch of key hashes (0 if absent)."""
        h = to_u64(np.asarray(h1))
        idx = np.searchsorted(self.keys, h)
        idx = np.clip(idx, 0, max(self.keys.size - 1, 0))
        if self.keys.size == 0:
            return np.zeros(h.size, dtype=np.int64)
        hit = self.keys[idx] == h
        return np.where(hit, self.counts[idx], 0).astype(np.int64)

    @property
    def size_bytes(self) -> int:
        return int(self.keys.nbytes + self.counts.nbytes)

    def to_bytes(self) -> bytes:
        return pack("mg", {"c": self.capacity, "n": self.n_total,
                           "d": self.decrement_total},
                    self.keys, self.counts)

    @classmethod
    def _from_state(cls, params, bufs):
        return cls(params["c"], bufs[0], bufs[1], params["n"], params["d"])
