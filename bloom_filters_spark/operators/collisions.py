"""Collision analytics — the reference's diagnostics, done relationally.

The reference carries O(n·k) instrumentation maps inside every filter
(collisionMap / elementIndices, Bloom_project/src/core/BloomFilter.hpp:14-15)
and an O(n²) pair scan for "absolute collisions"
(BloomFilter.cpp:132-159). Here both are DataFrame aggregations over the
probe-index relation, so they cost one shuffle and scale linearly:

- relative collisions (K5, BloomFilter.cpp:106-116): Σ over bit cells set
  c>1 times of (c−1)  ≡  k·n − distinct_bits_touched.
- absolute collisions (K6): #unordered pairs of distinct elements with
  identical full index signatures ≡ Σ C(c,2) over signature groups —
  O(n) via groupBy instead of the reference's O(n²) loop.
- parameter sweeps (D1–D3, src/analysis/CollisionAnalyzer.cpp:21-202):
  driver loops over k / m re-using ONE cached hash relation — the
  xxhash64 pass (k/m-independent) runs once per sweep, only the cheap
  index derivation re-runs per point.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels.hashing import km_indices


def _hashed(df: DataFrame, col: str, seed: int) -> DataFrame:
    # NULLs are dropped to match every sketch-build path (a NULL child
    # makes xxhash64 return the seed-only constant — a phantom element
    # that would inflate collision metrics relative to the real filter)
    return (df.where(F.col(col).isNotNull())
            .select(F.xxhash64(F.col(col), F.lit(seed)).alias("h")))


def _indices_from_hashes(hdf: DataFrame, k: int, m: int) -> DataFrame:
    def to_idx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64)
            idx = km_indices(h, k, m)
            yield pd.DataFrame({"h": h, "indices": list(idx)})

    return hdf.mapInPandas(to_idx, schema="h long, indices array<long>")


def probe_indices(df: DataFrame, col: str, k: int, m: int,
                  seed: int = 0) -> DataFrame:
    """→ (element-hash, array<long> of its k probe indices). The same
    Kirsch–Mitzenmacher derivation the Bloom kernel uses, exposed as a
    relation (the reference's getIndices, BloomFilter.cpp:51-63)."""
    return _indices_from_hashes(_hashed(df, col, seed), k, m)


def _relative_from_hashes(hdf: DataFrame, k: int, m: int) -> DataFrame:
    idx = _indices_from_hashes(hdf, k, m)
    cell_counts = (idx.select(F.explode("indices").alias("cell"))
                   .groupBy("cell").agg(F.count("*").alias("c")))
    return cell_counts.agg(
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
        .cast("long").alias("relative_collisions"))


def relative_collisions(df: DataFrame, col: str, k: int, m: int,
                        seed: int = 0, distinct: bool = True) -> DataFrame:
    """K5: Σ_{cells set c>1 times} (c−1), i.e. wasted bit-sets."""
    src = df.select(col).distinct() if distinct else df
    return _relative_from_hashes(_hashed(src, col, seed), k, m)


def absolute_collisions(df: DataFrame, col: str, k: int, m: int,
                        seed: int = 0) -> DataFrame:
    """K6: #pairs of distinct elements sharing the FULL index signature.
    groupBy(signature) → Σ C(c,2); linear, not the reference's O(n²)."""
    idx = probe_indices(df.select(col).distinct(), col, k, m, seed)
    sig_counts = (idx.groupBy(F.col("indices").cast("array<long>")
                              .alias("sig"))
                  .agg(F.count("*").alias("c")))
    return sig_counts.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long")
        .alias("absolute_collisions"))


def collision_sweep_k(df: DataFrame, col: str, m: int,
                      ks=range(1, 6), seed: int = 0) -> list[dict]:
    """D1: relative collisions for k = 1..5 at fixed m
    (src/analysis/CollisionAnalyzer.cpp:21-70)."""
    hdf = _hashed(df.select(col).distinct(), col, seed).cache()
    out = []
    try:
        for k in ks:
            rc = _relative_from_hashes(hdf, k, m).first()[0]
            out.append({"k": k, "m": m, "relative_collisions": int(rc or 0)})
    finally:
        hdf.unpersist()
    return out


def collision_sweep_m(df: DataFrame, col: str, k: int = 3,
                      ms=range(1000, 30001, 5000), seed: int = 0) -> list[dict]:
    """D3: sweep m at fixed k (src/analysis/CollisionAnalyzer.cpp:152-202)."""
    hdf = _hashed(df.select(col).distinct(), col, seed).cache()
    out = []
    try:
        for m in ms:
            rc = _relative_from_hashes(hdf, k, m).first()[0]
            out.append({"k": k, "m": m, "relative_collisions": int(rc or 0)})
    finally:
        hdf.unpersist()
    return out
