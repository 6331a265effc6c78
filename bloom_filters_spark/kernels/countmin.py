"""Count-min sketch — heavy-hitter counts; merge = matrix add.

No reference counterpart (required by BASELINE.json north_rule; built
from Cormode & Muthukrishnan 2005). Guarantees, for total weight N:
  true ≤ est  and  P[est > true + ε·N] ≤ δ,  ε = e/width, δ = e^−depth.
Rows use Kirsch–Mitzenmacher-style per-row index derivation from one
64-bit base hash.
"""

from __future__ import annotations

import math

import numpy as np

from .base import pack, register
from .hashing import derive_h2, to_u64

_U64 = np.uint64


@register("cms")
class CountMinSketch:
    __slots__ = ("depth", "width", "table", "total")

    def __init__(self, depth: int, width: int,
                 table: np.ndarray | None = None, total: int = 0):
        self.depth = int(depth)
        self.width = int(width)
        self.table = (np.zeros((depth, width), dtype=np.int64)
                      if table is None else table)
        self.total = int(total)

    @classmethod
    def from_error(cls, eps: float, delta: float) -> "CountMinSketch":
        return cls(depth=max(1, math.ceil(math.log(1.0 / delta))),
                   width=max(8, math.ceil(math.e / eps)))

    @property
    def eps(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    def _indices(self, h1) -> np.ndarray:
        """(depth, n) index matrix."""
        h1 = to_u64(np.asarray(h1))
        h2 = derive_h2(h1)
        j = np.arange(self.depth, dtype=_U64)
        return ((h1[None, :] + j[:, None] * h2[None, :])
                % _U64(self.width)).astype(np.int64)

    def update_hashes(self, h1, weights=None) -> None:
        h1 = np.asarray(h1)
        if h1.size == 0:
            return
        idx = self._indices(h1)
        if weights is None:
            for j in range(self.depth):
                np.add.at(self.table[j], idx[j], 1)
            self.total += int(h1.size)
        else:
            w = np.asarray(weights, dtype=np.int64)
            for j in range(self.depth):
                np.add.at(self.table[j], idx[j], w)
            self.total += int(w.sum())

    def estimate_hashes(self, h1) -> np.ndarray:
        h1 = np.asarray(h1)
        if h1.size == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._indices(h1)
        rows = np.arange(self.depth)[:, None]
        return self.table[rows, idx].min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        return CountMinSketch(self.depth, self.width,
                              self.table + other.table,
                              self.total + other.total)

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size / inner-product estimate (Cormode & Muthukrishnan
        2005 §4.2): for frequency vectors a, b sketched with the SAME
        (depth, width, hash family — guaranteed here by the shared
        Kirsch–Mitzenmacher derivation), min over rows of the row dot
        products satisfies  a·b ≤ est  and
        P[est > a·b + ε·‖a‖₁·‖b‖₁] ≤ δ.  a·b IS |A ⋈ B| when a and b
        are the key-frequency vectors of the two join sides — the
        classic sketch answer to "how big is this join / can I
        broadcast the result"."""
        assert (self.depth, self.width) == (other.depth, other.width)
        return int((self.table * other.table).sum(axis=1).min())

    @property
    def size_bytes(self) -> int:
        return int(self.table.nbytes)

    def to_bytes(self) -> bytes:
        return pack("cms", {"d": self.depth, "w": self.width, "n": self.total},
                    self.table)

    @classmethod
    def _from_state(cls, params, bufs):
        return cls(params["d"], params["w"], bufs[0], params["n"])
