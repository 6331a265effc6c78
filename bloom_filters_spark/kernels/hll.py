"""HyperLogLog — registers uint8; update = np.maximum.at; merge = max.

Estimator parity with Bloom_project/src/core/HyperLogLog.cpp:27-50:
  E = α_m · m² / Σ 2^(−reg); if E ≤ 2.5m and V>0 zero registers →
  linear counting m·ln(m/V); no large-range correction.
α constants per HyperLogLog.cpp:69-77 (published Flajolet values).

Deliberate fix (SURVEY.md §7 risk): the reference derives the register
index as hash % m and rho from trailing zeros of the SAME hash
(HyperLogLog.cpp:16-19,57-67), which correlates index and rank bits and
breaks the ±1.04/√m bound. We use the published bit-split: top p bits →
index, leading-zero rank of the remaining 64−p bits → rho. The north
rule requires the published bound, so the published algorithm wins.

Merge = elementwise max → commutative, associative, idempotent.
"""

from __future__ import annotations

import math

import numpy as np

from .base import pack, register
from .hashing import bit_length_u64, to_u64

_U64 = np.uint64


def _alpha(m: int) -> float:
    """Bloom_project/src/core/HyperLogLog.cpp:69-77."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@register("hll")
class HLLSketch:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = (np.zeros(self.m, dtype=np.uint8)
                          if registers is None else registers)

    @property
    def relative_error(self) -> float:
        """Published std error 1.04/√m."""
        return 1.04 / math.sqrt(self.m)

    def update_hashes(self, h1) -> None:
        h = to_u64(np.asarray(h1))
        if h.size == 0:
            return
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        w = h & ((_U64(1) << _U64(64 - self.p)) - _U64(1))   # low 64−p bits
        # rho = (#leading zeros in the 64−p bit word) + 1
        rho = ((64 - self.p) - bit_length_u64(w) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        assert self.p == other.p
        return HLLSketch(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        """Estimator shape per HyperLogLog.cpp:27-50."""
        regs = self.registers.astype(np.float64)
        raw = _alpha(self.m) * self.m * self.m / np.power(2.0, -regs).sum()
        if raw <= 2.5 * self.m:
            zeros = int((self.registers == 0).sum())
            if zeros > 0:
                return self.m * math.log(self.m / zeros)
        return float(raw)

    @property
    def size_bytes(self) -> int:
        return int(self.registers.nbytes)

    def to_bytes(self) -> bytes:
        """Content-adaptive (HLL++-style sparse mode for the wire): a
        partial whose nonzero registers number < m/5 ships as
        (index:uint32, rho:uint8) pairs — the common case for grouped
        per-host partials where a group saw a handful of rows in a
        partition but the bank is 2^p bytes. Dense otherwise. Encoding
        is a pure function of content → merge-order/resume byte-identity
        hold; in-memory representation stays dense (merge = np.maximum)."""
        nz = np.flatnonzero(self.registers)
        if nz.size * 5 < self.m:
            return pack("hll", {"p": self.p, "sparse": 1},
                        nz.astype(np.uint32), self.registers[nz])
        return pack("hll", {"p": self.p}, self.registers)

    @classmethod
    def _from_state(cls, params, bufs):
        if params.get("sparse"):
            regs = np.zeros(1 << params["p"], dtype=np.uint8)
            regs[bufs[0].astype(np.int64)] = bufs[1]
            return cls(params["p"], regs)
        return cls(params["p"], bufs[0])
