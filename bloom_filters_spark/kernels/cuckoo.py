"""Cuckoo filter — fingerprint/partial-key design (Fan et al., CoNEXT'14).

Replaces both reference variants (whole-item tables,
Bloom_project/src/core/CuckooFilter.hpp:71-242, and the 1000-bucket
string-table "CuckooFilterN", src/core/CuckooNonProbability.hpp:57-139)
with the standard space-efficient design while preserving the exposed
contract the reference checks interactively
(Bloom_project/src/core/Bloom_project.cpp:4599-4665):
insert → contains is True (no false negatives); remove → contains is
False; bounded eviction (reference: 500 attempts, CuckooFilter.hpp:183).

Layout: 2^b buckets × 4 slots of uint16 fingerprints (0 = empty);
bucket2 = bucket1 XOR hash(fp) — so either bucket derives the other.

NOT a monoid: deletion-capable cuckoo filters don't merge associatively
(SURVEY.md §7). The distributed path keeps a bank of per-partition
filters (CuckooBank): probe = OR over members. Bloom/CBF/HLL/CMS stay
the true monoids.
"""

from __future__ import annotations

import numpy as np

from .base import pack, register, sketch_from_bytes, unpack
from .hashing import splitmix64, to_u64

_U64 = np.uint64
_SLOTS = 4
_MAX_KICKS = 500  # parity: Bloom_project/src/core/CuckooFilter.hpp:183
_MAX_STASH = 8    # homeless victims parked before "full" raises


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """Nonzero uint16 fingerprints from the top hash bits."""
    fp = (h >> _U64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


@register("cuckoo")
class CuckooFilter:
    __slots__ = ("nbuckets", "table", "n_items", "_rng_state", "stash")

    def __init__(self, capacity: int = 1024, table: np.ndarray | None = None,
                 n_items: int = 0):
        if table is not None:
            self.nbuckets = table.shape[0]
            self.table = table
        else:
            need = max(8, int(capacity / (_SLOTS * 0.95)) + 1)
            self.nbuckets = 1 << int(np.ceil(np.log2(need)))
            self.table = np.zeros((self.nbuckets, _SLOTS), dtype=np.uint16)
        self.n_items = int(n_items)
        self._rng_state = _U64(0x6A09E667F3BCC908)
        # homeless victims from exhausted kick chains: a kick chain that
        # hits the bound has ALREADY swapped the new fp in and popped a
        # victim out — parking the victim here keeps every inserted key
        # answering "present" (the no-false-negatives contract) even on
        # the failure path, instead of corrupting the filter mid-raise
        self.stash: list[tuple[int, int]] = []

    # -- bucket derivation -------------------------------------------------
    def _b1(self, h: np.ndarray) -> np.ndarray:
        return (h % _U64(self.nbuckets)).astype(np.int64)

    def _alt(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = splitmix64(fp.astype(_U64))
        return ((b.astype(_U64) ^ mix) % _U64(self.nbuckets)).astype(np.int64)

    def _next_rand(self) -> int:
        self._rng_state = splitmix64(np.array([self._rng_state]))[0]
        return int(self._rng_state)

    # -- single-item ops (eviction is inherently sequential) ----------------
    def _insert_or_evict(self, b1: int, fp: int):
        """Place ``fp``; on success return None. When the kick bound is
        exceeded, the item's fp HAS been swapped into the table and some
        victim fingerprint is homeless — return ``(bucket, victim_fp)``
        so a caller (CuckooBank) can relocate the victim into a fresh
        same-shaped member without losing it (no false negatives).
        n_items is unchanged on eviction: one identity swapped, the
        victim's count moves with it to wherever it is re-homed."""
        b2 = int(self._alt(np.array([b1]), np.array([fp], dtype=np.uint16))[0])
        for b in (b1, b2):
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.n_items += 1
                return None
        # evict: random-walk cuckoo kicks, bounded like the reference
        b = b1 if (self._next_rand() & 1) else b2
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = self._next_rand() % _SLOTS
            cur, self.table[b, slot] = self.table[b, slot], cur
            b = int(self._alt(np.array([b]),
                              np.array([cur], dtype=np.uint16))[0])
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                self.n_items += 1
                return None
        return (b, int(cur))

    def _insert_one(self, b1: int, fp: int) -> bool:
        homeless = self._insert_or_evict(b1, fp)
        if homeless is not None:
            # complete the insert by parking the victim: the filter
            # stays consistent whether or not the caller catches the
            # raise below (a mid-eviction raise would otherwise leave a
            # previously-inserted key answering "absent")
            self.stash.append((int(homeless[0]), int(homeless[1])))
            self.n_items += 1
            if len(self.stash) > _MAX_STASH:
                raise RuntimeError(
                    "cuckoo filter full (max kicks exceeded, stash "
                    "exhausted) — rebuild with a larger capacity; the "
                    "filter remains consistent: every inserted key "
                    "still answers present")
        return True

    # -- batch API -----------------------------------------------------------
    def _bulk_wave(self, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Place as many (bucket, fp) items as fit in the FREE slots of
        their given bucket, whole-batch (no evictions): items are
        stably bucket-sorted, ranked within bucket, and the first
        ``free`` per bucket land in that bucket's empty slots — distinct
        ranks map to distinct slots, so the scatter write is
        conflict-free. Returns the positions (into ``buckets``) of the
        items that did NOT fit. Deterministic (stable sort, no RNG)."""
        n = buckets.size
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        order = np.argsort(buckets, kind="stable")
        c = buckets[order]
        grp = np.empty(n, dtype=bool)
        grp[0] = True
        np.not_equal(c[1:], c[:-1], out=grp[1:])
        starts = np.flatnonzero(grp)
        rank = np.arange(n) - np.repeat(starts, np.diff(
            np.append(starts, n)))
        rows = self.table[c]
        free = _SLOTS - (rows != 0).sum(axis=1)
        accept = rank < free
        arows = c[accept]
        # empty slots of each accepted row, ascending (stable argsort
        # puts the False==empty positions first, in slot order)
        es = np.argsort(self.table[arows] != 0, axis=1, kind="stable")
        slots = es[np.arange(arows.size), rank[accept]]
        self.table[arows, slots] = fps[order[accept]]
        self.n_items += int(accept.sum())
        return order[~accept]

    def _bulk_place(self, b1s: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Vectorized b1-then-b2 placement; returns positions of items
        needing the eviction path (both buckets full)."""
        left = self._bulk_wave(b1s, fps)
        if left.size == 0:
            return left
        b2 = self._alt(b1s[left], fps[left])
        left2 = self._bulk_wave(b2, fps[left])
        return np.sort(left[left2])

    def update_hashes(self, h1) -> None:
        h = to_u64(np.asarray(h1))
        fps = _fingerprints(h)
        b1s = self._b1(h)
        # the common case is whole-batch (free slots in b1 or b2);
        # only the contended tail walks the sequential kick chains
        for i in self._bulk_place(b1s, fps).tolist():
            self._insert_one(int(b1s[i]), int(fps[i]))

    def contains_hashes(self, h1) -> np.ndarray:
        h = to_u64(np.asarray(h1))
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        fps = _fingerprints(h)
        b1 = self._b1(h)
        b2 = self._alt(b1, fps)
        in1 = (self.table[b1] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2] == fps[:, None]).any(axis=1)
        out = in1 | in2
        for sb, sfp in self.stash:
            out |= (fps == np.uint16(sfp)) & ((b1 == sb) | (b2 == sb))
        return out

    def remove_hashes(self, h1) -> np.ndarray:
        """Remove one fingerprint copy per item; returns per-item success
        (parity: CuckooFilter.hpp:157-168 erases from any holding table)."""
        h = to_u64(np.asarray(h1))
        fps = _fingerprints(h)
        b1 = self._b1(h)
        b2 = self._alt(b1, fps)
        out = np.zeros(h.size, dtype=bool)
        for i in range(h.size):
            for b in (int(b1[i]), int(b2[i])):
                slots = np.flatnonzero(self.table[b] == fps[i])
                if slots.size:
                    self.table[b, slots[0]] = 0
                    self.n_items -= 1
                    out[i] = True
                    break
            if not out[i]:
                for j, (sb, sfp) in enumerate(self.stash):
                    if sfp == int(fps[i]) and sb in (int(b1[i]),
                                                     int(b2[i])):
                        del self.stash[j]
                        self.n_items -= 1
                        out[i] = True
                        break
        return out

    @property
    def load_factor(self) -> float:
        return self.n_items / (self.nbuckets * _SLOTS)

    @property
    def size_bytes(self) -> int:
        return int(self.table.nbytes)

    def to_bytes(self) -> bytes:
        # the stash buffer is emitted ONLY when occupied, so every
        # pre-stash payload (and every healthy filter) stays
        # byte-identical to the previous wire format
        if self.stash:
            st = np.array(self.stash, dtype=np.int64)
            return pack("cuckoo", {"n": self.n_items, "stash": 1},
                        self.table, st)
        return pack("cuckoo", {"n": self.n_items}, self.table)

    @classmethod
    def _from_state(cls, params, bufs):
        cf = cls(table=bufs[0].reshape(-1, _SLOTS), n_items=params["n"])
        if params.get("stash"):
            cf.stash = [(int(b), int(fp))
                        for b, fp in bufs[1].reshape(-1, 2)]
        return cf


@register("cuckoo_bank")
class CuckooBank:
    """Union of per-partition cuckoo filters for the distributed path.

    merge = list concatenation (associative & commutative up to member
    order; probes are order-invariant). Deletions are only valid against
    the member that inserted the key — the bank therefore exposes
    insert/contains; distributed delete goes through CountingBloomSketch.

    AUTO-GROWS: when the active member exceeds its kick bound, a fresh
    member with the SAME bucket count is appended, the homeless victim
    fingerprint is relocated into it (bucket indices stay valid because
    the shapes match), and inserts continue there — so a partition of
    any size builds without hard-failing, degrading to more members
    rather than raising (the reference only bounds kicks per filter,
    CuckooFilter.hpp:183; the bank keeps that per-member bound).

    AUTO-COMPACTS: concat-merge alone would grow the bank as
    O(P × seed_size) for P partitions regardless of item count. But
    same-shaped members make stored entries portable: a fingerprint
    occupying bucket ``b`` is valid at ``b`` or ``alt(b, fp)`` in ANY
    member with the same bucket count (the XOR bucket derivation is an
    involution, so the pair {b, alt} survives re-homing). ``merge``
    therefore re-packs all entries into as few members as possible once
    the concatenated bank reaches ``_COMPACT_AT`` members — the final
    bank is O(n items), and every merge level stays within the fan-in
    memory bound like the true-monoid sketches.
    """

    __slots__ = ("members", "_packed_len")

    _COMPACT_AT = 8          # concat up to this many members, then re-pack

    def __init__(self, members: list[CuckooFilter] | None = None):
        self.members = members or []
        # member count after the last compaction: once a bank genuinely
        # needs >= _COMPACT_AT members, re-packing on EVERY merge would
        # make a sequential fold O(steps x total items); instead the
        # next compaction waits until the bank doubles past this mark
        # (geometric amortization -> O(total items) re-insert work per
        # fold, while the bank stays within 2x of optimally packed)
        self._packed_len = 0

    @classmethod
    def wrap(cls, cf: CuckooFilter) -> "CuckooBank":
        return cls([cf])

    def update_hashes(self, h1) -> None:
        """Batch insert into this bank's active (last) member, appending
        fresh same-shaped members whenever the active one fills — the
        per-partition build path (build_sketch partials insert locally,
        merge concats)."""
        if not self.members:
            raise ValueError(
                "CuckooBank must be seeded via wrap(CuckooFilter(...)) so "
                "the build's configured capacity is explicit")
        m = self.members[-1]
        h = to_u64(np.asarray(h1))
        fps = _fingerprints(h)
        b1s = (h % _U64(m.nbuckets)).astype(np.int64)
        self._bulk_into(m, b1s, fps)

    def _bulk_into(self, m: CuckooFilter, b1s: np.ndarray,
                   fps: np.ndarray) -> None:
        """Bulk-place into the active member; the contended tail walks
        kick chains one item at a time until the member rolls over,
        then the remainder bulk-places into the fresh (empty) member."""
        pend = m._bulk_place(b1s, fps)
        while pend.size:
            i = int(pend[0])
            pend = pend[1:]
            homeless = m._insert_or_evict(int(b1s[i]), int(fps[i]))
            if homeless is not None:
                hb, hfp = homeless
                fresh = CuckooFilter(table=np.zeros_like(m.table))
                fresh._insert_one(hb, hfp)   # re-home the victim
                self.members.append(fresh)
                m = fresh
                if pend.size:
                    pend = pend[m._bulk_place(b1s[pend], fps[pend])]

    def contains_hashes(self, h1) -> np.ndarray:
        h1 = np.asarray(h1)
        out = np.zeros(h1.size, dtype=bool)
        for m in self.members:
            out |= m.contains_hashes(h1)
        return out

    def merge(self, other: "CuckooBank") -> "CuckooBank":
        merged = CuckooBank(self.members + other.members)
        floor = max(self._packed_len, other._packed_len)
        if len(merged.members) >= max(self._COMPACT_AT, 2 * floor):
            return merged.compacted()
        merged._packed_len = floor
        return merged

    def compacted(self) -> "CuckooBank":
        """Re-pack all entries into as few same-shaped members as
        possible (grouped by bucket count if shapes ever mix). Each
        occupied (bucket, fp) slot re-inserts via the normal
        kick-bounded placement, so load reaches the design ~95% before
        a fresh member is opened — bank size becomes O(n items)."""
        if len(self.members) <= 1:
            return self
        by_shape: dict[int, list[CuckooFilter]] = {}
        for m in self.members:
            by_shape.setdefault(m.nbuckets, []).append(m)
        out: list[CuckooFilter] = []
        for nbuckets, group in by_shape.items():
            shape = group[0].table.shape
            sub = CuckooBank(
                [CuckooFilter(table=np.zeros(shape, dtype=np.uint16))])
            for m in group:
                bs, ss = np.nonzero(m.table)
                fps = m.table[bs, ss]
                # a stored bucket is one of the entry's two homes, and
                # alt() is an involution — so it serves as "b1" for the
                # bulk re-insert unchanged
                sub._bulk_into(sub.members[-1], bs.astype(np.int64), fps)
                # stash entries are live members too: a repack that read
                # only the table would drop them (false negatives)
                for b, fp in m.stash:
                    sub._bulk_into(sub.members[-1],
                                   np.array([b], dtype=np.int64),
                                   np.array([fp], dtype=np.uint16))
            out.extend(p for p in sub.members if p.n_items > 0)
        bank = CuckooBank(out or self.members[:1])
        bank._packed_len = len(bank.members)
        return bank

    @property
    def size_bytes(self) -> int:
        return sum(m.size_bytes for m in self.members)

    def to_bytes(self) -> bytes:
        blobs = [m.to_bytes() for m in self.members]
        lens = np.array([len(b) for b in blobs], dtype=np.int64)
        flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        # packed_len must survive the wire: tree-merge partials cross
        # every level as bytes, and a bank deserialized with
        # _packed_len=0 would re-compact on its next merge — per-entry
        # re-insert work at every level, defeating the geometric
        # amortization exactly on the distributed path.
        return pack("cuckoo_bank",
                    {"count": len(blobs), "packed_len": self._packed_len},
                    lens, flat)

    @classmethod
    def _from_state(cls, params, bufs):
        lens, flat = bufs
        raw = flat.tobytes()
        members, off = [], 0
        for ln in lens.astype(int):
            members.append(sketch_from_bytes(raw[off:off + ln]))
            off += ln
        bank = cls(members)
        bank._packed_len = int(params.get("packed_len", 0))
        return bank
