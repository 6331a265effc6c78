"""The small relational surface the reference exposes (SURVEY.md §2.1/§2.6).

All pure Catalyst compositions — listed here so the operator inventory
has named, tested entry points with pushdown-friendly shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sort_limit(df: DataFrame, order_col: str, n: int = 20,
               desc: bool = True) -> DataFrame:
    """S4: SELECT * ... ORDER BY col DESC LIMIT n
    (Bloom_project/src/core/Bloom_project.cpp:2771-2797). Spark plans
    this as TakeOrderedAndProject — no global sort materialization."""
    key = F.desc(order_col) if desc else F.asc(order_col)
    return df.orderBy(key).limit(n)


def count_rows(df: DataFrame) -> int:
    """S5 / A4 (Bloom_project/src/core/Bloom_project.cpp:3804-3815)."""
    return df.count()


def count_nonempty(df: DataFrame, col: str) -> int:
    """P4: non-empty-line predicate count
    (Bloom_project/src/core/Bloom_project.cpp:4777-4783)."""
    return df.where(F.length(F.col(col)) > 0).count()


def successor(df: DataFrame, col: str, key) -> DataFrame:
    """O1/O2: Y-fast-trie successor ≡ min(col ≥ key)
    (Bloom_project/src/data_structures/YFastTrie.hpp:474-485). At scale
    the ≥ predicate prunes row groups via parquet min/max stats — the
    columnar analogue of the trie's level search."""
    return (df.where(F.col(col) >= key)
            .agg(F.min(col).alias("successor")))


def predecessor(df: DataFrame, col: str, key) -> DataFrame:
    """O1/O2: predecessor ≡ max(col ≤ key)
    (Bloom_project/src/data_structures/YFastTrie.hpp:494-507)."""
    return (df.where(F.col(col) <= key)
            .agg(F.max(col).alias("predecessor")))


def top_k_by_count(df: DataFrame, group_col, k: int = 20) -> DataFrame:
    """Heavy-hitter report: groupBy().count() (partial aggregation =
    map-side combine for free) → TakeOrderedAndProject. Deterministic
    tie-break on the group value."""
    return (df.groupBy(group_col)
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc_nulls_last(group_col))
            .limit(k))


def distinct_count(df: DataFrame, col: str) -> int:
    """A1-A3 exact distinct (Bloom_project/src/core/Utils.cpp:29-74)."""
    return df.select(col).distinct().count()


def exact_membership(df: DataFrame, col: str, probes: DataFrame,
                     probe_col: str | None = None,
                     out_col: str = "present") -> DataFrame:
    """O3/O4: the reference's EXACT membership baselines (skip list /
    linked list ``exists``, Bloom_project/src/data_structures/
    MyLinkedList.hpp:92-101, SkipList.hpp) as their Spark-first
    equivalent: probe keys against the exact key set via a left join
    on distinct keys — no sketch, no error, the ground truth the
    probabilistic probes are benchmarked against (the reference races
    linked-list scans vs Bloom probes the same way).

    Plan: distinct(keys) is an exact shuffle dedup; the probe join
    broadcasts whichever side is small (AQE). O(n) per probe in the
    reference becomes O(1) amortized per probe here — the relational
    layout IS the better data structure at scale."""
    probe_col = probe_col or col
    keys = (df.where(F.col(col).isNotNull())
            .select(F.col(col).alias(probe_col)).distinct()
            .withColumn(out_col, F.lit(True)))
    return (probes.join(keys, on=probe_col, how="left")
            .na.fill({out_col: False}))
