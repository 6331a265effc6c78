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
from hypothesis import example, given, settings, strategies as st

from bloom_filters_spark.kernels import (
    BloomSketch, CountingBloomSketch, CountMinSketch, CuckooFilter,
    HLLSketch, InvertibleBloomSketch, KLLSketch, MisraGriesSketch,
    TDigest, ThetaSketch, sketch_from_bytes)

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
@given(xs=st.lists(st.integers(min_value=1, max_value=40),
                   min_size=1, max_size=2000),
       cap=st.integers(min_value=2, max_value=48),
       cuts=st.lists(st.integers(min_value=0, max_value=2000),
                     max_size=5))
def test_mg_retention_and_bounds_under_any_merge(xs, cap, cuts):
    """Misra-Gries mergeable-summaries guarantee for ARBITRARY splits
    and merge orders: every key with true frequency > n/(cap+1)
    survives the merged summary, and each retained estimate lies in
    [f − n/(cap+1), f] — the two facts heavy_hitters' exactness rests
    on (under-estimation direction matters: Space-Saving inverts it)."""
    h = np.asarray(xs, dtype=np.int64)
    n = h.size
    cuts = sorted(min(c, n) for c in cuts)
    parts = np.split(h, cuts)
    sks = []
    for p in parts:
        sk = MisraGriesSketch(cap)
        if p.size:
            sk.update_hashes(p)
        sks.append(sk)
    merged = sks[-1]                      # reversed merge order
    for sk in reversed(sks[:-1]):
        merged = merged.merge(sk)
    uniq, counts = np.unique(h, return_counts=True)
    floor = n / (cap + 1)
    summ = {int(k): int(c) for k, c in
            zip(merged.keys.astype(np.uint64), merged.counts)}
    for u, f in zip(uniq.astype(np.uint64), counts):
        if f > floor:
            assert int(u) in summ, (u, f, floor)
    true = {int(u): int(f) for u, f in zip(uniq.astype(np.uint64), counts)}
    for k, est in summ.items():
        f = true.get(k, 0)
        assert f - floor - 1e-9 <= est <= f, (k, est, f, floor)


@SET
@given(xs=st.lists(st.floats(min_value=-1e9, max_value=1e9,
                             allow_nan=False), min_size=2, max_size=1000),
       cuts=st.lists(st.integers(min_value=0, max_value=1000), max_size=4))
# pinned regressions: prefix-sum segment means cancelled the tiny
# centroid to 0.0 (first), and each naive lerp form failed one of
# endpoint-exactness / tied-pair-exactness (second & third)
@example(xs=[4.845733282921825e-261, -1.0], cuts=[])
@example(xs=[0.0, -1.0, -2.7755575615628914e-17], cuts=[])
@example(xs=[0.87499, 0.87499], cuts=[])
def test_tdigest_rank_error_survives_any_merge_split(xs, cuts):
    """t-digest(100) rank error at the probed quantiles stays small for
    the MERGE of any split of the input (the vectorized _compress must
    preserve the k-size invariant through merges, not just one build)."""
    arr = np.asarray(xs, dtype=np.float64)
    n = arr.size
    cuts = sorted(min(c, n) for c in cuts)
    merged = None
    for p in np.split(arr, cuts):
        td = TDigest(100)
        if p.size:
            td.update_values(p)
        merged = td if merged is None else merged.merge(td)
    srt = np.sort(arr)
    # the 1/n term absorbs discreteness of tied/tiny inputs (same
    # absorb the quantile_bounds oracle documents): interpolating
    # between a tied mass and an outlier legitimately lands strictly
    # between values, costing up to one rank position
    tol = 0.1 + 1.0 / n
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        lo = np.searchsorted(srt, est, side="left") / n
        hi = np.searchsorted(srt, est, side="right") / n
        assert lo - tol <= q <= hi + tol, (q, lo, hi, est)


@SET
@given(seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_counting_bloom_interleaved_distributed_deletes(seed):
    """Signed-partial delete semantics under a RANDOM interleaving:
    inserts and removals (removals ≤ inserts per key, as the contract
    requires) scattered over random partials must, after the merge,
    still answer present for every key with a positive net count —
    regardless of which partial each ±1 landed in."""
    rng = np.random.default_rng(seed)
    keys = rng.integers(-2**62, 2**62, size=64, dtype=np.int64)
    keys = np.unique(keys)
    ins = rng.integers(1, 4, size=keys.size)
    rem = np.array([rng.integers(0, c + 1) for c in ins])
    partials = [CountingBloomSketch(1 << 12, 4) for _ in range(4)]
    for x, c in zip(keys, ins):
        for _ in range(int(c)):
            partials[rng.integers(0, 4)].update_hashes(np.array([x]))
    for x, c in zip(keys, rem):
        for _ in range(int(c)):
            partials[rng.integers(0, 4)].remove_hashes(np.array([x]))
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.merge(p)
    survivors = keys[rem < ins]
    if survivors.size:
        assert merged.contains_hashes(survivors).all()


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


@given(st.lists(
    st.tuples(
        st.one_of(st.integers(0, 3).map(float), st.just(float("nan"))),
        st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=6)),
    min_size=1, max_size=20),
    st.data())
@settings(max_examples=60, deadline=None)
def test_batched_grouped_merge_equals_naive_fold(partials, data):
    """operators/agg._merge_grouped (the batched reduce side of
    build_grouped_sketches) over ANY split of the partial rows into
    Arrow batches must equal the naive per-group left-to-right fold of
    the same rows in the same order — payload bytes AND n_rows — with
    NaN group keys accumulating into ONE group across batches."""
    import pandas as pd
    from bloom_filters_spark.operators.agg import _merge_grouped

    # partial rows in arrival order: (key, payload bytes, n_rows)
    rows = []
    for key, hashes in partials:
        sk = HLLSketch(6)
        sk.update_hashes(np.array(hashes, dtype=np.int64))
        rows.append((key, sk.to_bytes(), len(hashes)))

    # naive reference: per-group ordered fold (NaN keys canonicalized)
    ref: dict = {}
    for key, payload, n in rows:
        ck = "__na__" if key != key else key
        sk, total, _ = ref.get(ck, (None, 0, key))
        from bloom_filters_spark.kernels import sketch_from_bytes
        part = sketch_from_bytes(payload)
        sk = part if sk is None else sk.merge(part)
        ref[ck] = (sk, total + n, key)

    # drive the batched fold with an arbitrary batch split
    cuts = sorted(data.draw(st.lists(
        st.integers(1, max(1, len(rows) - 1)), max_size=4,
        unique=True))) if len(rows) > 1 else []
    pieces, prev = [], 0
    for c in cuts + [len(rows)]:
        if c > prev:
            pieces.append(rows[prev:c])
            prev = c
    batches = [pd.DataFrame({"g": [r[0] for r in piece],
                             "payload": [r[1] for r in piece],
                             "n_rows": [r[2] for r in piece]})
               for piece in pieces]
    out = list(_merge_grouped(["g"])(iter(batches)))
    assert len(out) == 1
    got = {}
    for _, r in out[0].iterrows():
        ck = "__na__" if r["g"] != r["g"] else r["g"]
        assert ck not in got          # exactly one row per group
        got[ck] = (bytes(r["payload"]), int(r["n_rows"]))
    assert set(got) == set(ref)
    for ck, (sk, total, _) in ref.items():
        assert got[ck] == (sk.to_bytes(), total)
