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


def test_xxh64_spark_parity(spark):
    """The vectorized numpy XXH64 must match JVM F.xxhash64 on every
    shape the signature kernels use: single long, long+int chain
    (minhash permutations), and array<long> fold (band buckets)."""
    import numpy as np
    from pyspark.sql import functions as F
    from bloom_filters_spark.kernels.hashing import xxh64_int, xxh64_long

    vals = [0, 1, -1, 2**62, -(2**63), 123456789, 42]
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    got = [r[0] for r in df.select(F.xxhash64("h")).collect()]
    exp = xxh64_long(np.array(vals), np.uint64(42)).view(np.int64).tolist()
    assert got == exp

    pairs = [(v, j) for v in vals for j in (0, 5, 63)]
    df2 = spark.createDataFrame(pairs, "h long, j int")
    got2 = [r[0] for r in df2.select(F.xxhash64("h", "j")).collect()]
    hv = np.array([p[0] for p in pairs])
    jv = np.array([p[1] for p in pairs])
    exp2 = xxh64_int(jv, xxh64_long(hv, np.uint64(42))) \
        .view(np.int64).tolist()
    assert got2 == exp2

    arrs = [[1, 2, 3], [-5, 7, 2**60]]
    df3 = spark.createDataFrame([(a,) for a in arrs], "a array<long>")
    got3 = [r[0] for r in df3.select(F.xxhash64("a")).collect()]
    for a, g in zip(arrs, got3):
        h = np.full(1, 42, dtype=np.uint64)
        for x in a:
            h = xxh64_long(np.array([x]), h)
        assert int(h.view(np.int64)[0]) == g


def test_ibf_get_value_point_lookup():
    """K10 getValue (InvertibleBloomFilter.hpp:179-185): pure cells
    yield an inserted key hash, impure cells yield None, out-of-range
    raises."""
    import numpy as np
    import pytest as _pt
    from bloom_filters_spark.kernels import InvertibleBloomSketch

    ibf = InvertibleBloomSketch(64, 3)
    keys = np.arange(1, 6, dtype=np.int64) * 7919
    ibf.update_hashes(keys)
    inserted = {int(k) & 0xFFFFFFFFFFFFFFFF for k in keys}
    vals = [ibf.get_value(i) for i in range(ibf.m)]
    found = [v for v in vals if v is not None]
    assert found and all(v in inserted for v in found)
    empty = InvertibleBloomSketch(64, 3)
    assert all(empty.get_value(i) is None for i in range(64))
    with _pt.raises(IndexError):
        ibf.get_value(64)


def test_ascii_sum_hashes_jvm_parity(spark):
    """H7 (CuckooNonProbability.hpp:153-159 hash1, :171-177 hash2):
    the pure-JVM aggregate(split(...)) expressions equal the python
    parity kernels for every probe string — including multi-byte
    UTF-8, where both sides see codepoints (F.ascii / ord)."""
    from pyspark.sql import functions as F
    from bloom_filters_spark.kernels.hashing import (ascii_sq_sum_hash,
                                                     ascii_sum_hash)
    words = ["", "a", "abc", "cba", "word42", "The quick brown fox",
             "élève"]
    df = spark.createDataFrame([(w,) for w in words], "w string")

    def col(sq):
        return F.aggregate(
            F.filter(F.split(F.col("w"), ""), lambda c: c != ""),
            F.lit(0).cast("long"),
            lambda acc, c: acc + (F.ascii(c) * F.ascii(c) if sq
                                  else F.ascii(c)).cast("long")) % 1009

    got = {r["w"]: (r["s1"], r["s2"]) for r in df.select(
        "w", col(False).alias("s1"), col(True).alias("s2")).collect()}
    for w in words:
        assert got[w] == (ascii_sum_hash(w, 1009),
                          ascii_sq_sum_hash(w, 1009)), w
    # anagram collision — the documented reason H7 is a diagnostic,
    # not a production hash (hash1('abc') == hash1('cba'))
    assert got["abc"] == got["cba"]
