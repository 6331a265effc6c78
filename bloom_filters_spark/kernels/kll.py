"""KLL quantile sketch (deterministic-compaction variant); merge = level-wise.

No reference counterpart (required by north_rule; from Karnin, Lang &
Liberty, FOCS 2016 — see PAPERS.md "KLL±"). Items at level i carry weight
2^i; level capacities shrink geometrically (c = 2/3) toward the top.

Determinism note (SURVEY.md §7): canonical KLL picks the compaction
offset randomly. We alternate the offset per level (a published
derandomization that preserves O(1/k) rank error up to constants) so a
given multiset of inputs inserted in a fixed order always yields the
same sketch — reproducible tests, stable benchmarks. Rank error after
arbitrary merge orders stays within the tested tolerance (ε ≈ 3/k is
asserted in tests with a 2× safety margin); byte-identity under merge
reordering is NOT claimed (documented — only OR/max/add sketches are
byte-stable monoids).
"""

from __future__ import annotations

import numpy as np

from .base import pack, register

_C = 2.0 / 3.0


@register("kll")
class KLLSketch:
    __slots__ = ("k", "levels", "parities", "n")

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None,
                 parities: list[int] | None = None, n: int = 0):
        self.k = int(k)
        self.levels: list[np.ndarray] = (
            [np.empty(0, dtype=np.float64)] if levels is None
            else [np.asarray(l, dtype=np.float64) for l in levels])
        self.parities = [0] * len(self.levels) if parities is None else list(parities)
        self.n = int(n)

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (_C ** depth))))

    def update_values(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if self.levels[i].size > self._capacity(i):
                buf = np.sort(self.levels[i])
                off = self.parities[i] & 1
                self.parities[i] += 1
                promoted = buf[off::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self.parities.append(0)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        assert self.k == other.k
        depth = max(len(self.levels), len(other.levels))
        levels, parities = [], []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            levels.append(np.concatenate([a, b]).astype(np.float64))
            pa = self.parities[i] if i < len(self.parities) else 0
            pb = other.parities[i] if i < len(other.parities) else 0
            parities.append(pa + pb)
        out = KLLSketch(self.k, levels, parities, self.n + other.n)
        out._compress()
        return out

    # -- queries ---------------------------------------------------------
    def _weighted_items(self):
        vals, wts = [], []
        for i, buf in enumerate(self.levels):
            if buf.size:
                vals.append(buf)
                wts.append(np.full(buf.size, 1 << i, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(i, v.size - 1)])

    def rank(self, x: float) -> float:
        """Estimated fraction of items ≤ x."""
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        i = int(np.searchsorted(v, x, side="right"))
        return float(np.cumsum(w)[i - 1] / w.sum()) if i > 0 else 0.0

    @property
    def size_bytes(self) -> int:
        return int(sum(l.nbytes for l in self.levels))

    def to_bytes(self) -> bytes:
        lens = np.array([l.size for l in self.levels], dtype=np.int64)
        pars = np.array(self.parities, dtype=np.int64)
        flat = (np.concatenate(self.levels) if self.levels
                else np.empty(0, dtype=np.float64))
        return pack("kll", {"k": self.k, "n": self.n}, lens, pars,
                    flat.astype(np.float64))

    @classmethod
    def _from_state(cls, params, bufs):
        lens, pars, flat = bufs
        levels, off = [], 0
        for ln in lens.astype(int):
            levels.append(flat[off:off + ln].copy())
            off += ln
        return cls(params["k"], levels, [int(p) for p in pars], params["n"])
