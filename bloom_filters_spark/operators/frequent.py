"""Exact heavy hitters at scale — Misra-Gries candidates + one recount.

The classic two-pass frequent-items plan that never shuffles the
token stream:

1. Pass 1: ``agg.build_sketch`` folds each partition into a
   capacity-c Misra-Gries summary (`kernels/spacesaving.py`) and
   tree-merges the partials — the only data moving is c counter rows
   per partition. The merged summary retains EVERY key with true
   frequency > n/(c+1) (mergeable-summaries guarantee), so its ≤ c
   keys are a complete candidate set for any threshold ≥ n/(c+1).
2. Pass 2: re-scan with the ≤ c candidate hashes broadcast as a semi
   filter, count exactly (`groupBy` over a stream that is already
   ~zero rows for non-candidates), keep counts > threshold.

The result is EXACT — complete by the MG retention guarantee, correct
counts by the recount — at the cost of two scans and zero full-width
shuffles; a naive exact top-frequency query shuffles every token once.
A count-min + driver-side heap can't make the completeness claim; this
can, which is why training-data pipelines use it for stopword /
boilerplate discovery over 100 TB corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernels.spacesaving import MisraGriesSketch
from .agg import build_sketch, hash_col


def heavy_hitters(df: DataFrame, col: str, *, capacity: int = 256,
                  threshold: float | None = None, seed: int = 0,
                  out_col: str = "cnt") -> DataFrame:
    """→ DataFrame(col, cnt): every value with exact count > threshold.

    ``threshold`` defaults to n/(capacity+1) — the smallest value for
    which the Misra-Gries candidate set is provably complete; anything
    smaller raises (the summary may have evicted a qualifying key, and
    a silently-incomplete "exact" result is worse than an error).
    Returns the exact counts, not the summary's lower bounds."""
    mg, n = build_sketch(df, col, lambda: MisraGriesSketch(capacity),
                         seed=seed)
    floor = n / (capacity + 1)
    if threshold is None:
        threshold = floor
    if threshold < floor:
        raise ValueError(
            f"threshold {threshold} is below the completeness floor "
            f"n/(capacity+1) = {floor:.1f}; raise capacity to "
            f"{int(n / threshold)} or more for this threshold")
    spark = df.sparkSession
    cand = spark.createDataFrame(
        [(int(k),) for k in mg.keys.view("int64")], "key_hash long")
    return (df.where(F.col(col).isNotNull())
            .withColumn("__h", hash_col(F.col(col), seed))
            .join(F.broadcast(cand),
                  F.col("__h") == F.col("key_hash"), "left_semi")
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias(out_col))
            .where(F.col(out_col) > F.lit(float(threshold))))
