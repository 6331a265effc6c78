"""Hypothesis property tests over the pure-numpy kernels.

Randomized-input counterparts of the fixed-vector contracts in
test_kernels.py: for ARBITRARY key multisets (including duplicates,
extremes, and adversarial splits) the monoid laws and the published
per-sketch guarantees must hold. No Spark — these pin the kernel
algebra the distributed partial→merge plans rely on: if merge is
associative/commutative on every input, any tree shape and partition
layout gives the same sketch.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from bloom_filters_spark.kernels import (
    BloomSketch, CountingBloomSketch, CountMinSketch, CuckooFilter,
    HLLSketch, InvertibleBloomSketch, KLLSketch, ThetaSketch,
    sketch_from_bytes)

keys = st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=0, max_size=400)
SET = settings(max_examples=30, deadline=None)


def _arr(xs):
    return np.asarray(xs, dtype=np.int64)


def _fresh(factory, xs):
    sk = factory()
    if len(xs):
        sk.update_hashes(_arr(xs))
    return sk


MONOID_FACTORIES = [
    ("bloom", lambda: BloomSketch.from_capacity(2048, 0.01)),
    ("counting", lambda: CountingBloomSketch(1 << 12, 4)),
    ("hll", lambda: HLLSketch(10)),
    ("cms", lambda: CountMinSketch(4, 1 << 10)),
    ("theta", lambda: ThetaSketch(64)),
    ("ibf", lambda: InvertibleBloomSketch(512, 3)),
]


@SET
@given(a=keys, b=keys, c=keys)
def test_merge_associative_commutative_byte_identical(a, b, c):
    """(A+B)+C == A+(B+C) and A+B == B+A, BYTE-identical, for every
    fixed-size monoid sketch — the law that makes any partition layout
    and any merge-tree shape give the same final artifact."""
    for name, factory in MONOID_FACTORIES:
        sa, sb, sc = (_fresh(factory, x) for x in (a, b, c))
        left = sa.merge(sb).merge(sc).to_bytes()
        right = sa.merge(sb.merge(sc)).to_bytes()
        assert left == right, name
        assert sa.merge(sb).to_bytes() == sb.merge(sa).to_bytes(), name


@SET
@given(xs=keys, split=st.integers(min_value=0, max_value=400))
def test_partition_invariance(xs, split):
    """Building from any split of the input equals one whole build —
    the partial-per-partition plan is layout-independent."""
    split = min(split, len(xs))
    for name, factory in MONOID_FACTORIES:
        whole = _fresh(factory, xs)
        parts = _fresh(factory, xs[:split]).merge(_fresh(factory, xs[split:]))
        assert whole.to_bytes() == parts.to_bytes(), name


@SET
@given(xs=keys)
def test_bloom_never_false_negative(xs):
    sk = _fresh(lambda: BloomSketch.from_capacity(2048, 0.01), xs)
    if len(xs):
        assert sk.contains_hashes(_arr(xs)).all()


@SET
@given(xs=keys)
def test_cms_never_underestimates(xs):
    sk = _fresh(lambda: CountMinSketch(4, 1 << 10), xs)
    if not len(xs):
        return
    uniq, counts = np.unique(_arr(xs), return_counts=True)
    assert (sk.estimate_hashes(uniq) >= counts).all()


@SET
@given(xs=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                   min_size=1, max_size=200, unique=True))
def test_cuckoo_insert_contains_remove(xs):
    """K11-K13 contract under arbitrary distinct keys: inserted keys
    all probe present; after removing them all, n_items is 0 and
    (fingerprints being gone) nothing of the removed set remains."""
    sk = CuckooFilter(capacity=512)
    h = _arr(xs)
    sk.update_hashes(h)
    assert sk.contains_hashes(h).all()
    res = sk.remove_hashes(h)
    assert res.all()
    assert sk.n_items == 0
    assert not sk.contains_hashes(h).any()


@SET
@given(xs=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                   min_size=0, max_size=60, unique=True))
def test_ibf_peels_everything_at_low_load(xs):
    """K9/K10: at load << m the IBF must fully decode and return
    exactly the inserted key hashes."""
    sk = _fresh(lambda: InvertibleBloomSketch(1024, 3), xs)
    rec, signs, done = sk.peel()
    assert done
    expected = {int(np.uint64(x)) for x in _arr(xs)} if xs else set()
    assert set(int(r) for r in rec) == expected


@SET
@given(xs=keys)
def test_serde_roundtrip_byte_identical(xs):
    for name, factory in MONOID_FACTORIES + [
            ("kll", lambda: KLLSketch(200)),
            ("cuckoo", lambda: CuckooFilter(capacity=1024))]:
        if name == "cuckoo":
            vals = list(dict.fromkeys(xs))      # cuckoo wants distinct
            sk = CuckooFilter(capacity=1024)
            if vals:
                sk.update_hashes(_arr(vals))
        elif name == "kll":
            sk = KLLSketch(200)
            if xs:
                sk.update_values(np.asarray(xs, dtype=np.float64))
        else:
            sk = _fresh(factory, xs)
        blob = sk.to_bytes()
        assert sketch_from_bytes(blob).to_bytes() == blob, name


@SET
@given(xs=st.lists(st.floats(min_value=-1e12, max_value=1e12,
                             allow_nan=False), min_size=1, max_size=500),
       split=st.integers(min_value=0, max_value=500))
def test_kll_rank_error_survives_any_merge_split(xs, split):
    """KLL guarantee (rank error <= eps) must hold for the MERGED
    sketch of any split of the input, not just a whole build."""
    split = min(split, len(xs))
    a, b = KLLSketch(200), KLLSketch(200)
    if xs[:split]:
        a.update_values(np.asarray(xs[:split], dtype=np.float64))
    if xs[split:]:
        b.update_values(np.asarray(xs[split:], dtype=np.float64))
    sk = a.merge(b)
    srt = np.sort(np.asarray(xs, dtype=np.float64))
    n = len(srt)
    for q in (0.1, 0.5, 0.9):
        est = sk.quantile(q)
        # ties give the estimate a rank INTERVAL [lo, hi]; the bound
        # holds when that interval comes within eps of q
        lo = np.searchsorted(srt, est, side="left") / n
        hi = np.searchsorted(srt, est, side="right") / n
        assert lo - 0.15 <= q <= hi + 0.15, (q, lo, hi, est)
