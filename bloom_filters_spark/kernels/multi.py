"""MultiSketch — build several sketches in ONE pass over the data.

The production shape at 10^12 rows: a table scan is the expensive part,
so all per-column sketches (HLL distinct + CMS frequency + Bloom
seen-before + ...) update from the same batch stream and merge
member-wise. Each member must follow the aggregator protocol
(update_hashes/update_values, merge, to_bytes).

Member-wise merge preserves associativity iff every member is
associative (property-tested with the members we ship).
"""

from __future__ import annotations

import numpy as np

from .base import pack, register, sketch_from_bytes


@register("multi")
class MultiSketch:
    __slots__ = ("members",)

    def __init__(self, members: list):
        self.members = list(members)

    def update_hashes(self, h1) -> None:
        for m in self.members:
            m.update_hashes(h1)

    def update_values(self, vals) -> None:
        for m in self.members:
            m.update_values(vals)

    def merge(self, other: "MultiSketch") -> "MultiSketch":
        assert len(self.members) == len(other.members)
        return MultiSketch([a.merge(b)
                            for a, b in zip(self.members, other.members)])

    def __getitem__(self, i: int):
        return self.members[i]

    @property
    def size_bytes(self) -> int:
        return sum(m.size_bytes for m in self.members)

    def to_bytes(self) -> bytes:
        blobs = [m.to_bytes() for m in self.members]
        lens = np.array([len(b) for b in blobs], dtype=np.int64)
        flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        return pack("multi", {"count": len(blobs)}, lens, flat)

    @classmethod
    def _from_state(cls, params, bufs):
        lens, flat = bufs
        raw = flat.tobytes()
        members, off = [], 0
        for ln in lens.astype(int):
            members.append(sketch_from_bytes(raw[off:off + ln]))
            off += ln
        return cls(members)
