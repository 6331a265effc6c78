"""Bloom-accelerated joins: exactness (false positives removed, no
false negatives ever) and the scale property (the pre-filter actually
drops non-matching rows before the join)."""

import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.operators.joins import (
    bloom_antijoin, bloom_semijoin)


@pytest.fixture(scope="module")
def sides(spark):
    # big: keys 0..9999; small: every 25th key in [0, 5000) → 200
    # matches, 2% selectivity. Padding column proves payloads survive.
    big = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("row"), F.col("id")).alias("payload"))
    small = spark.range(200).select(
        (F.col("id") * 25).alias("k"), F.lit("dim").alias("d"))
    return big, small


def _ids(df):
    return sorted(r["k"] for r in df.select("k").collect())


def test_semijoin_exact(spark, sides):
    big, small = sides
    got = bloom_semijoin(big, small, "k")
    exact = big.join(small.select("k").distinct(), "k", "left_semi")
    assert _ids(got) == _ids(exact)
    assert got.columns == big.columns


def test_semijoin_exact_under_heavy_false_positives(spark, sides):
    """A deliberately undersized filter (capacity 10 for 200 keys →
    saturated, fpr near 1) must still give the exact answer — the
    real semi join removes every false positive."""
    big, small = sides
    got = bloom_semijoin(big, small, "k", fpp=0.5, capacity=10)
    exact = big.join(small.select("k").distinct(), "k", "left_semi")
    assert _ids(got) == _ids(exact)


def test_antijoin_exact(spark, sides):
    big, small = sides
    got = bloom_antijoin(big, small, "k")
    exact = big.join(small.select("k").distinct(), "k", "left_anti")
    assert _ids(got) == _ids(exact)
    assert got.columns == big.columns


def test_antijoin_exact_under_heavy_false_positives(spark, sides):
    big, small = sides
    got = bloom_antijoin(big, small, "k", fpp=0.5, capacity=10)
    exact = big.join(small.select("k").distinct(), "k", "left_anti")
    assert _ids(got) == _ids(exact)


def test_different_key_names_and_duplicate_small_keys(spark):
    big = spark.range(1000).select(F.col("id").alias("bk"))
    small = spark.createDataFrame(
        [(7,), (7,), (13,), (13,), (999,)], "sk long")
    got = bloom_semijoin(big, small, "bk", "sk")
    assert _ids_col(got, "bk") == [7, 13, 999]
    anti = bloom_antijoin(big, small, "bk", "sk")
    assert anti.count() == 997


def _ids_col(df, col):
    return sorted(r[col] for r in df.select(col).collect())


def test_prefilter_drops_nonmatches_before_join(spark, sides):
    """The scale property: at p=0.01 and 2% selectivity, the Bloom
    pre-filter must pass only ~(sel + fpp) of the big side — i.e. the
    join's probe-side input is ~3% of the rows, not 100%. Measured via
    the operator's own probe stage (same filter, same seed)."""
    from bloom_filters_spark.kernels import BloomSketch
    from bloom_filters_spark.operators.agg import (
        build_sketch, probe_membership)
    big, small = sides
    keys = small.select("k").distinct()
    sk, _ = build_sketch(keys, "k",
                         lambda: BloomSketch.from_capacity(200, 0.01))
    passed = probe_membership(big, "k", sk).where("seen").count()
    # 200 true matches + fpr*9800 false positives; fpr ≤ ~2.5x design p
    assert passed < 200 + 0.025 * 9_800


def test_estimate_join_size_brackets_exact(spark):
    """CMS inner-product join-size estimate: never below the exact
    |A ⋈ B|, within the ε·|A|·|B| slack, and multiplicity-aware
    (a key appearing a times left and b times right contributes a·b)."""
    from bloom_filters_spark.operators.joins import estimate_join_size

    left = spark.range(0, 3000).select((F.col("id") % 600).alias("k"))
    right = spark.range(0, 2000).select((F.col("id") % 500).alias("k"))
    exact = left.join(right, "k").count()
    js = estimate_join_size(left, "k", right, "k", eps=1e-4)
    assert js["n_left"] == 3000 and js["n_right"] == 2000
    assert js["estimate"] >= exact
    assert js["estimate"] <= exact + js["bound_slack"]
    # disjoint key ranges -> estimate collapses toward zero (only hash
    # collisions contribute), far below any real overlap
    far = spark.range(10**9, 10**9 + 2000).select(F.col("id").alias("k"))
    js0 = estimate_join_size(left, "k", far, "k", eps=1e-4)
    assert js0["estimate"] <= js0["bound_slack"]
