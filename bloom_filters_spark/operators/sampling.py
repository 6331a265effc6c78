"""Deterministic sampling & splitting for training-data pipelines.

Everything here is CONTENT-ADDRESSED (hash-of-key based), never
`rand()`-based: a row's split/sample membership is a pure function of
its key and the seed, so results are reproducible across runs,
partitionings, cluster sizes, and retries — the property a training
pipeline needs (the same doc must never hop between train and val),
and what makes these operators exactly SQL-checkable.

- ``hash_split``: fractional train/val/test splits by hash bucket.
- ``deterministic_sample``: keep a uniform ~fraction of rows.
- ``stratified_take``: exactly n rows per group, chosen by hash order
  (window rank over xxhash64 — a deterministic "random" n-per-group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def _bucket(key_col, seed: int):
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                  F.lit(_BUCKETS))


def hash_split(df: DataFrame, key_col: str, fractions: dict[str, float],
               *, seed: int = 0,
               out_col: str = "split") -> DataFrame:
    """Label each row with a split name by hash bucket.

    ``fractions`` maps name → fraction (must sum to ≤ 1; remainder
    falls into the LAST listed split). A key always lands in the same
    split for a given seed, regardless of data layout."""
    total = sum(fractions.values())
    assert 0 < total <= 1.0 + 1e-9, "fractions must sum to <= 1"
    b = _bucket(key_col, seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = b < int(acc * _BUCKETS)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         *, seed: int = 0) -> DataFrame:
    """Keep a uniform ~``fraction`` of rows, content-addressed: the
    same keys are kept on every run / layout / cluster size."""
    assert 0 < fraction <= 1.0
    return df.where(_bucket(key_col, seed) < int(fraction * _BUCKETS))


def stratified_take(df: DataFrame, group_cols: list[str], n: int, *,
                    key_col: str, seed: int = 0) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by hash order
    of ``key_col`` — a deterministic per-group random sample (window
    rank over xxhash64; tie-broken by the key itself)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64(F.col(key_col), F.lit(seed)), F.col(key_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n).drop("__rk"))
