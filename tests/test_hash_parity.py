"""Reference hash-family parity (SURVEY.md §2.3 H1-H5).

murmur3_32 vectors are the published MurmurHash3 x86_32 test vectors;
the Spark cross-check asserts that F.hash() IS murmur3_32 at seed 42,
so the reference's primary hash is natively available JVM-side.
"""

import pytest

from bloom_filters_spark.kernels.hashing import (
    md5_fold, murmur3_32, poly_hash, sha256_fold)


@pytest.mark.parametrize("data,seed,expected", [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"test", 0, 0xBA6BD213),
    (b"test", 0x9747B28C, 0x704B81DC),
    (b"Hello, world!", 0, 0xC0363E43),
    (b"Hello, world!", 0x9747B28C, 0x24884CBA),
    (b"The quick brown fox jumps over the lazy dog", 0, 0x2E4FF723),
    (b"The quick brown fox jumps over the lazy dog", 0x9747B28C, 0x2FA826CD),
])
def test_murmur3_32_published_vectors(data, seed, expected):
    assert murmur3_32(data, seed) == expected


def test_spark_hash_is_murmur3_seed42(spark):
    """F.hash IS murmur3_32 at seed 42 for 4-byte-aligned inputs.

    (Spark's Murmur3 deviates from canonical murmur3 only in tail
    handling: it runs a full mix round per remaining byte instead of
    the canonical partial-block path — verified empirically on 'abc'.)
    """
    rows = spark.createDataFrame(
        [("test",), ("abcdefgh",), ("hpueli+w",)], "s string")
    from pyspark.sql import functions as F
    got = {r["s"]: r["h"] for r in
           rows.select("s", F.hash("s").alias("h")).collect()}
    for s, h in got.items():
        assert (h & 0xFFFFFFFF) == murmur3_32(s.encode(), 42)


def test_poly_hash_bases():
    # H1/H2: Horner polynomial, base 31 / 37 (exact integer fold)
    assert poly_hash("ab", 31) == 31 * ord("a") + ord("b")
    assert poly_hash("ab", 37) == 37 * ord("a") + ord("b")
    assert poly_hash("", 31) == 0


def test_digest_folds_deterministic():
    # H4/H5 fold shapes: stable across runs, distinct per input
    assert sha256_fold("User29") == sha256_fold("User29")
    assert md5_fold("User29") == md5_fold("User29")
    assert sha256_fold("User29") != sha256_fold("User30")
    assert md5_fold("User29") != md5_fold("User30")
