"""t-digest (merging variant) — quantiles with strong tail accuracy.

No reference counterpart (required by north_rule; from Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests").
K1 scale function k(q) = δ/(2π)·asin(2q−1); merge = concatenate
centroids + re-compress. Deterministic given input order; estimates
(not bytes) are stable under merge reordering within tested tolerance.
"""

from __future__ import annotations

import math

import numpy as np

from .base import pack, register


@register("tdigest")
class TDigest:
    __slots__ = ("delta", "means", "weights", "total", "vmin", "vmax", "_buf")

    def __init__(self, delta: float = 100.0, means=None, weights=None,
                 total: float = 0.0, vmin: float = math.inf,
                 vmax: float = -math.inf):
        self.delta = float(delta)
        self.means = (np.empty(0, dtype=np.float64) if means is None
                      else np.asarray(means, dtype=np.float64))
        self.weights = (np.empty(0, dtype=np.float64) if weights is None
                        else np.asarray(weights, dtype=np.float64))
        self.total = float(total)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self._buf: list[np.ndarray] = []

    # -- scale function (K1) ----------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        q = np.clip(q, 0.0, 1.0)
        return self.delta / (2.0 * math.pi) * np.arcsin(2.0 * q - 1.0)

    def update_values(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._buf.append(v)
        if sum(b.size for b in self._buf) >= 10_000:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        v = np.concatenate(self._buf)
        self._buf = []
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._compress(np.concatenate([self.means, v]),
                       np.concatenate([self.weights,
                                       np.ones(v.size, dtype=np.float64)]))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Merging-digest compression, fully vectorized.

        The absorb test at item i is k(q1) − k(q0) ≤ 1 with
        q1 = Σ w[0..i] / total (emitted + current weight is always the
        full prefix), so ONE arcsin pass over the cumulative-weight
        vector yields every k the pass needs; and because k(q) is
        monotone in q, each centroid's end is a searchsorted for
        k0 + 1 — O(centroids·log n) control flow plus prefix-sum
        segment means, instead of a per-ITEM Python loop with two
        single-element arcsin calls per input row."""
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = float(weights.sum())
        n = means.size
        cumw = np.cumsum(weights)
        kq = self._k(cumw / total)
        starts = []
        i = 0
        k0 = float(self._k(np.array([0.0]))[0])
        while i < n:
            j = max(int(np.searchsorted(kq, k0 + 1.0, side="right")),
                    i + 1)
            starts.append(i)
            if j < n:
                k0 = float(kq[j - 1])
            i = j
        idx = np.asarray(starts, dtype=np.int64)
        # segment sums via reduceat, NOT differences of global prefix
        # sums: a prefix-sum segment mean cancels catastrophically when
        # a segment's values are tiny relative to the running prefix
        # (e.g. [-1.0, 5e-261] collapsed the second centroid to 0.0);
        # reduceat keeps every segment's arithmetic local
        seg_w = np.add.reduceat(weights, idx)
        self.means = np.add.reduceat(means * weights, idx) / seg_w
        self.weights = seg_w
        self.total = total

    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta
        self._flush()
        other._flush()
        out = TDigest(self.delta, vmin=min(self.vmin, other.vmin),
                      vmax=max(self.vmax, other.vmax))
        if self.means.size + other.means.size:
            out._compress(np.concatenate([self.means, other.means]),
                          np.concatenate([self.weights, other.weights]))
        return out

    @staticmethod
    def _lerp(a: float, b: float, t: float) -> float:
        """Interpolation that is EXACT at t∈{0,1}, exact for a == b,
        and never leaves [min(a,b), max(a,b)]. Neither naive form has
        all three: a + t·(b−a) rounds b away when |b| ≪ ulp(|a|)
        (means [−1.0, −3e-17] at t=1 returned 0.0 — a full rank
        position of error from pure float cancellation), while
        (1−t)·a + t·b drifts off a tied pair by one ulp (two equal
        centroids at t=0.6 returned a value BELOW both). Both were
        caught by the t-digest hypothesis property test."""
        if t <= 0.0:
            return float(a)
        if t >= 1.0:
            return float(b)
        lo, hi = (a, b) if a <= b else (b, a)
        return float(min(max((1.0 - t) * a + t * b, lo), hi))

    def quantile(self, q: float) -> float:
        self._flush()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        target = q * self.total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            t = max(0.0, target / cum[0])
            return self.vmin if q <= 0 else self._lerp(
                self.vmin, float(self.means[0]), t)
        if target >= cum[-1]:
            rem = self.total - cum[-1]
            if rem <= 0:
                return self.vmax
            t = min(1.0, (target - cum[-1]) / rem)
            return self._lerp(float(self.means[-1]), self.vmax, t)
        i = int(np.searchsorted(cum, target) - 1)
        t = (target - cum[i]) / (cum[i + 1] - cum[i])
        return self._lerp(float(self.means[i]), float(self.means[i + 1]), t)

    @property
    def size_bytes(self) -> int:
        return int(self.means.nbytes + self.weights.nbytes)

    def to_bytes(self) -> bytes:
        self._flush()
        return pack("tdigest",
                    {"delta": self.delta, "total": self.total,
                     "vmin": self.vmin if math.isfinite(self.vmin) else None,
                     "vmax": self.vmax if math.isfinite(self.vmax) else None},
                    self.means, self.weights)

    @classmethod
    def _from_state(cls, params, bufs):
        vmin = params["vmin"] if params["vmin"] is not None else math.inf
        vmax = params["vmax"] if params["vmax"] is not None else -math.inf
        return cls(params["delta"], bufs[0], bufs[1], params["total"],
                   vmin, vmax)
