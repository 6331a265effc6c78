"""K20: the reference's DynBloomHLL constructor quirk, reproduced opt-in.

The DynBloomFilter copy inside DynamicBloomHLLFilter.hpp registers hash
functions at loop indices i==1,2,3 and i>3 but NOTHING at i==0
(Bloom_project/src/core/DynamicBloomHLLFilter.hpp:70-95), so the filter
probes with k-1 functions while reporting k. K20QuirkBloom pins that
observable against the standard kernel.
"""

import numpy as np
import pytest

from bloom_filters_spark.kernels.base import sketch_from_bytes
from bloom_filters_spark.kernels.bloom import (
    BloomSketch, K20QuirkBloom, bloom_fpr, optimal_k, optimal_m)
from bloom_filters_spark.kernels.hashing import hash64_bytes


def _keys(n, tag):
    return hash64_bytes([f"{tag}-{i}" for i in range(n)]).view(np.int64)


def test_quirk_probes_one_fewer_slot():
    n, p = 5000, 0.01
    m = optimal_m(n, p)
    k = optimal_k(m, n)
    assert k >= 2
    keys = _keys(n, "quirk")
    quirk = K20QuirkBloom(m, k)
    quirk.update_hashes(keys)
    std_k = BloomSketch(m, k)
    std_k.update_hashes(keys)
    slot0 = BloomSketch(m, 1)  # k=1 standard filter IS the dropped slot 0
    slot0.update_hashes(keys)
    # the algebraic identity: quirk ∪ slot0 == full k-slot filter
    assert bytes(np.bitwise_or(quirk.bits, slot0.bits)) == bytes(std_k.bits)
    # and the quirk really dropped bits (strictly lighter than standard)
    assert quirk.bits_set() < std_k.bits_set()
    assert quirk.effective_k() == k - 1
    assert quirk.k == k  # still REPORTS k, like hash_f_counter


def test_quirk_contract_no_false_negatives_and_fpr():
    n, p = 20000, 0.01
    quirk = K20QuirkBloom(optimal_m(n, p), optimal_k(optimal_m(n, p), n))
    keys = _keys(n, "members")
    quirk.update_hashes(keys)
    assert quirk.contains_hashes(keys).all()
    absent = _keys(40000, "absent")
    fpr = float(quirk.contains_hashes(absent).mean())
    # realized FPR tracks the EFFECTIVE k-1, not the advertised k
    assert fpr <= 2.0 * bloom_fpr(quirk.effective_k(), n, quirk.m)


def test_quirk_serde_and_merge_associativity():
    n = 3000
    m = optimal_m(n, 0.01)
    k = optimal_k(m, n)
    a, b, c = (_keys(n, t) for t in "abc")
    parts = []
    for chunk in (a, b, c):
        s = K20QuirkBloom(m, k)
        s.update_hashes(chunk)
        parts.append(s)
    left = parts[0].merge(parts[1]).merge(parts[2])
    right = parts[0].merge(parts[1].merge(parts[2]))
    assert left.to_bytes() == right.to_bytes()
    rt = sketch_from_bytes(left.to_bytes())
    assert isinstance(rt, K20QuirkBloom)
    assert rt.to_bytes() == left.to_bytes()
    assert rt.contains_hashes(np.concatenate([a, b, c])).all()


def test_quirk_k1_degenerates_to_zero_functions():
    # k=1 under the quirk registers NOTHING: the reference's exists()
    # all-of-empty loop returns true for every probe (vacuous truth)
    quirk = K20QuirkBloom(1024, 1)
    quirk.update_hashes(_keys(10, "x"))
    assert quirk.bits_set() == 0
    assert quirk.contains_hashes(_keys(5, "y")).all()
    assert quirk.effective_k() == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
