"""Bloom-accelerated joins: the classic distributed use of the
reference's filters (membership tests that make a join cheaper), as
library operators.

The reference exposes Bloom membership as an end-user query
(Bloom_project/src/core/BloomFilter.cpp:31-39 ``exists``); at cluster
scale the highest-value application of exactly that probe is inside a
join: build a compact Bloom over the SMALL side's join keys, broadcast
it (KBs–MBs, vs broadcasting the rows themselves which may not fit),
and pre-filter the BIG side before any shuffle. Results are EXACT:

- semi join: the filter passes all true matches (no false negatives)
  plus an fpp-fraction of non-matches; the real join afterwards
  removes the false positives. The win is shuffle volume — at 1%
  selectivity and p=0.01, ~98% of the 100 TB side never shuffles.
- anti join: rows the filter REJECTS are definite non-members (no
  false negatives) and skip the join entirely; only the ~(sel + fpp)
  fraction the filter passes joins to be disambiguated. The two
  streams union back together.

Spark's AQE can inject a runtime bloom filter for some shuffle joins,
but only behind cost heuristics and never for the anti-join split;
these operators make the plan explicit and deterministic, with the
filter built by the library's partial→tree-merge aggregation (so the
build itself never shuffles the small side's rows).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..kernels import BloomSketch
from .agg import build_sketch, probe_membership

_PROBE_COL = "__bloom_probe_seen"


def _small_side_filter(small: DataFrame, key_small: str, fpp: float,
                       seed: int, capacity: int | None):
    """Distributed Bloom build over the small side's distinct keys.

    ``capacity`` sizes the filter without an extra count job; when
    None, one count of the distinct keys picks it (exact sizing, one
    cheap pre-job over the SMALL side only)."""
    keys = small.select(key_small).distinct()
    if capacity is None:
        capacity = max(keys.count(), 1)
    sk, _ = build_sketch(
        keys, key_small,
        lambda: BloomSketch.from_capacity(capacity, fpp), seed=seed)
    return sk


def bloom_semijoin(big: DataFrame, small: DataFrame, key_big: str,
                   key_small: str | None = None, *, fpp: float = 0.01,
                   seed: int = 0, capacity: int | None = None) -> DataFrame:
    """EXACT left semi join of ``big`` against ``small``'s keys, with a
    broadcast Bloom pre-filter so non-matching big-side rows are
    dropped at the scan instead of crossing the shuffle.

    Plan: build Bloom(small keys) via partial→tree merge → broadcast
    bytes once → vectorized probe column on ``big`` → filter → left
    semi join (removes the fpp false positives). At 100 TB the semi
    join's shuffle input is ``(selectivity + fpp)`` of the big side
    rather than all of it; the filter payload is ~1.2 MB per million
    keys at p=0.01, broadcastable where the small side's rows are not.
    """
    key_small = key_small or key_big
    sk = _small_side_filter(small, key_small, fpp, seed, capacity)
    candidates = (probe_membership(big, key_big, sk, seed=seed,
                                   out_col=_PROBE_COL)
                  .where(F.col(_PROBE_COL)).drop(_PROBE_COL))
    return candidates.join(
        small.select(F.col(key_small).alias(key_big)).distinct(),
        on=key_big, how="left_semi")


def bloom_antijoin(big: DataFrame, small: DataFrame, key_big: str,
                   key_small: str | None = None, *, fpp: float = 0.01,
                   seed: int = 0, capacity: int | None = None) -> DataFrame:
    """EXACT left anti join of ``big`` against ``small``'s keys.

    No false negatives ⇒ a row the filter rejects is CERTAIN to have
    no match: it bypasses the join entirely (a map-only filter). Only
    the ``selectivity + fpp`` fraction the filter passes runs the real
    anti join to weed out false positives. The output is the union of
    the two streams — bit-identical to ``big.join(small, 'left_anti')``
    but with the join's shuffle shrunk by the rejected fraction.
    """
    key_small = key_small or key_big
    sk = _small_side_filter(small, key_small, fpp, seed, capacity)
    probed = probe_membership(big, key_big, sk, seed=seed,
                              out_col=_PROBE_COL)
    certain_miss = probed.where(~F.col(_PROBE_COL)).drop(_PROBE_COL)
    candidates = probed.where(F.col(_PROBE_COL)).drop(_PROBE_COL)
    survivors = candidates.join(
        small.select(F.col(key_small).alias(key_big)).distinct(),
        on=key_big, how="left_anti")
    return certain_miss.unionByName(survivors)


def estimate_join_size(left: DataFrame, key_left: str,
                       right: DataFrame, key_right: str, *,
                       eps: float = 1e-3, delta: float = 0.01,
                       seed: int = 0) -> dict:
    """Sketch-based equi-join cardinality estimate — the planner
    primitive behind "how big is A ⋈ B / can the result broadcast",
    answered WITHOUT running the join.

    Each side is scanned ONCE into a count-min sketch of its key
    frequencies (partial→tree merge, only sketch matrices shuffle);
    the estimate is the CMS inner product (Cormode & Muthukrishnan
    2005 §4.2): for key-frequency vectors a, b

        |A ⋈ B| = a·b ≤ estimate,
        P[estimate > a·b + ε·|A|·|B|] ≤ δ.

    Never underestimates — safe for "skip the broadcast if the
    estimate is too big" decisions (the failure mode of
    UNDER-estimation, a broadcast OOM, cannot happen). At 100 TB the
    two scans are map-only with a KB-scale merge; no shuffle of either
    table and no join execution.

    Returns ``{"estimate": int, "bound_slack": int, "n_left": int,
    "n_right": int, "eps": float, "delta": float}`` where
    ``bound_slack`` = ε·|A|·|B| (the additive error budget at
    confidence 1−δ).
    """
    from ..kernels.countmin import CountMinSketch

    factory = lambda: CountMinSketch.from_error(eps, delta)  # noqa: E731
    sa, na = build_sketch(left.select(key_left), key_left, factory,
                          seed=seed)
    sb, nb = build_sketch(right.select(key_right), key_right, factory,
                          seed=seed)
    est = sa.inner_product(sb)
    return {"estimate": int(est),
            "bound_slack": int(math.ceil(sa.eps * na * nb)),
            "n_left": int(na), "n_right": int(nb),
            "eps": sa.eps, "delta": sa.delta}
