"""Sketch-indexed scan pruning (operators/skipping.py).

Contract: pruned_lookup is bit-identical to the full-scan semi join
(no false negatives at file level), while actually skipping files —
the zone map kills out-of-range probes, the per-file Bloom kills
in-range-but-absent probes.
"""

import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.operators import skipping as sk

N_FILES = 8
N_ROWS = 4000


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skip") / "tbl")
    df = spark.range(0, N_ROWS).select(
        (F.col("id") * 7).alias("k"),           # sparse keys: gaps exist
        F.concat(F.lit("v"), F.col("id")).alias("payload"))
    sk.stage_clustered(df, path, "k", N_FILES)
    idx = sk.build_scan_index(spark, path, "k", fpp=0.01).persist()
    idx.count()
    return path, idx


def _probe_df(spark, keys):
    return spark.createDataFrame([(int(x),) for x in keys], "k long")


def test_index_shape(spark, staged):
    _, idx = staged
    rows = idx.collect()
    assert len(rows) == N_FILES
    assert sum(r["n_rows"] for r in rows) == N_ROWS
    # clustered layout → per-file key ranges are disjoint
    spans = sorted((int(r["min_key"]), int(r["max_key"])) for r in rows)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_pruned_lookup_matches_full_scan(spark, staged):
    path, idx = staged
    # mix of present keys (multiples of 7) and absent ones
    probes = _probe_df(spark, [0, 7, 14, 3500, 27993, 5, 6, 9999999])
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    full = (spark.read.parquet(path)
            .join(probes, on="k", how="left_semi"))
    assert sorted(r["k"] for r in got.collect()) == \
        sorted(r["k"] for r in full.collect())
    assert stats["files_total"] == N_FILES
    # 4 present keys live in at most 3 distinct files; Blooms at
    # p=0.01 admit at most a file or two extra
    assert 1 <= stats["files_scanned"] < N_FILES


def test_clustered_probe_touches_one_file(spark, staged):
    path, idx = staged
    probes = _probe_df(spark, [7, 14, 21, 28])      # adjacent keys
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    assert stats["files_scanned"] == 1
    assert got.count() == 4


def test_absent_in_range_keys_bloom_pruned(spark, staged):
    path, idx = staged
    # in the global key range but never written (not multiples of 7)
    probes = _probe_df(spark, [1, 2, 3, 4, 5])
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    assert got.count() == 0
    # zone map alone can't reject these; the Bloom should (p=0.01)
    assert stats["files_scanned"] <= 1


def test_out_of_range_keys_zone_pruned(spark, staged):
    path, idx = staged
    probes = _probe_df(spark, [-5, 10**12])
    files = sk.prune_files(idx, probes, "k")
    assert files == []
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    assert got.count() == 0 and stats["files_scanned"] == 0


def test_empty_probe_set(spark, staged):
    path, idx = staged
    got, stats = sk.pruned_lookup(
        spark, path, idx, _probe_df(spark, []), "k")
    assert got.count() == 0 and stats["files_scanned"] == 0


def test_string_keys(spark, tmp_path):
    path = str(tmp_path / "stbl")
    df = spark.range(0, 500).select(
        F.format_string("doc-%04d", F.col("id")).alias("k"))
    sk.stage_clustered(df, path, "k", 4)
    idx = sk.build_scan_index(spark, path, "k")
    probes = spark.createDataFrame(
        [("doc-0001",), ("doc-0499",), ("doc-9999",)], "k string")
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    assert sorted(r["k"] for r in got.collect()) == \
        ["doc-0001", "doc-0499"]
    assert stats["files_scanned"] == 2


def test_float_keys_bit_identical(spark, tmp_path):
    # typed zone maps: float keys must never round-trip through str()
    path = str(tmp_path / "ftbl")
    df = spark.range(0, 600).select(
        (F.col("id") * 0.1 + 1e-9).alias("k"))
    sk.stage_clustered(df, path, "k", 4)
    idx = sk.build_scan_index(spark, path, "k")
    probe_vals = [0.1 + 1e-9, 59.9 + 1e-9, 123.456]
    probes = spark.createDataFrame([(v,) for v in probe_vals], "k double")
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    full = spark.read.parquet(path).join(probes, on="k", how="left_semi")
    assert sorted(r["k"] for r in got.collect()) == \
        sorted(r["k"] for r in full.collect())
    assert stats["files_scanned"] < stats["files_total"]
    lo, hi = 10.0, 15.05
    got, stats = sk.pruned_range_scan(spark, path, idx, "k", lo, hi)
    full = spark.read.parquet(path).where(F.col("k").between(lo, hi))
    assert sorted(r["k"] for r in got.collect()) == \
        sorted(r["k"] for r in full.collect())
    assert stats["files_scanned"] < stats["files_total"]


def test_nan_keys_bit_identical(spark, tmp_path):
    # Spark's total order makes NaN a matchable key (NaN = NaN in
    # joins, NaN above every double) — a file holding NaN keys must
    # not be pruned for a NaN probe (max_key carries the NaN)
    path = str(tmp_path / "nantbl")
    df = spark.range(0, 600).select(
        F.when(F.col("id") % 150 == 7, F.lit(float("nan")))
        .otherwise(F.col("id") * 0.5).alias("k"))
    sk.stage_clustered(df, path, "k", 4)
    idx = sk.build_scan_index(spark, path, "k")
    probes = spark.createDataFrame(
        [(float("nan"),), (10.0,), (9999.0,)], "k double")
    got, _ = sk.pruned_lookup(spark, path, idx, probes, "k")
    full = spark.read.parquet(path).join(probes, on="k", how="left_semi")
    import math

    def keyset(rows):
        return sorted(str("nan" if math.isnan(r["k"]) else r["k"])
                      for r in rows)

    assert keyset(got.collect()) == keyset(full.collect())
    assert any(math.isnan(r["k"]) for r in got.collect())


def test_timestamp_keys_bit_identical(spark, tmp_path):
    import datetime as dt
    path = str(tmp_path / "tstbl")
    base = dt.datetime(2024, 1, 1)
    df = spark.range(0, 480).select(
        (F.lit(base) + F.make_interval(hours=F.col("id"))).alias("k"))
    sk.stage_clustered(df, path, "k", 4)
    idx = sk.build_scan_index(spark, path, "k")
    present = base + dt.timedelta(hours=100)
    absent = base + dt.timedelta(hours=100, minutes=30)
    far = dt.datetime(2030, 1, 1)
    probes = spark.createDataFrame(
        [(present,), (absent,), (far,)], "k timestamp")
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    assert [r["k"] for r in got.collect()] == [present]
    assert stats["files_scanned"] < stats["files_total"]
    lo, hi = base + dt.timedelta(hours=50), base + dt.timedelta(hours=170)
    got, stats = sk.pruned_range_scan(spark, path, idx, "k", lo, hi)
    full = spark.read.parquet(path).where(F.col("k").between(lo, hi))
    assert sorted(r["k"] for r in got.collect()) == \
        sorted(r["k"] for r in full.collect())
    assert 1 <= stats["files_scanned"] < stats["files_total"]


def test_null_keys_do_not_poison_index(spark, tmp_path):
    # a file with NULL keys must still be indexed from its non-null
    # keys in the native type (no Arrow float64 promotion), and large
    # int64 keys must survive without precision loss
    path = str(tmp_path / "ntbl")
    big = 2**62 + 1           # not representable in float64
    rows = [(big,), (big + 2,), (None,), (7,), (None,), (9,)]
    df = spark.createDataFrame(rows, "k long").coalesce(1)
    df.write.mode("overwrite").parquet(path)
    idx = sk.build_scan_index(spark, path, "k")
    r = idx.collect()[0]
    assert r["min_key"] == 7 and r["max_key"] == big + 2
    assert r["n_rows"] == 4
    probes = _probe_df(spark, [big, big + 1, 9])
    got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
    assert sorted(r["k"] for r in got.collect()) == [9, big]
    assert stats["files_scanned"] == 1
    # NULL probe keys are ignored, not crashed on
    nprobes = spark.createDataFrame([(None,), (7,)], "k long")
    got, _ = sk.pruned_lookup(spark, path, idx, nprobes, "k")
    assert [r["k"] for r in got.collect()] == [7]


def test_randomized_bit_identity_sweep(spark, tmp_path):
    """Randomized breadth behind the fixed-case contracts: for seeded
    random (dtype, null/NaN mix, probe set) configurations the pruned
    lookup must equal the full-scan semi join EXACTLY. Seeds are fixed
    — failures reproduce."""
    import math

    import numpy as np

    def keyset(rows):
        return sorted("nan" if isinstance(r["k"], float)
                      and math.isnan(r["k"]) else str(r["k"])
                      for r in rows)

    for seed, dtype in [(11, "long"), (12, "double"), (13, "string"),
                        (14, "double_nan")]:
        rng = np.random.default_rng(seed)
        n = int(rng.integers(300, 900))
        path = str(tmp_path / f"rt_{seed}")
        if dtype == "long":
            vals = np.unique(rng.integers(-2**61, 2**61, size=n))
            rows = [(int(v),) for v in vals]
            schema = "k long"
            probe_pool = ([int(v) for v in rng.choice(vals, 10)]
                          + [int(x) for x in
                             rng.integers(-2**61, 2**61, size=10)])
        elif dtype == "string":
            vals = [f"u{int(v):012d}" for v in
                    np.unique(rng.integers(0, 10**10, size=n))]
            rows = [(v,) for v in vals]
            schema = "k string"
            pick = rng.choice(len(vals), 10)
            probe_pool = ([vals[i] for i in pick]
                          + [f"zz{i}" for i in range(10)])
        else:
            vals = rng.normal(0, 1e6, size=n)
            if dtype == "double_nan":
                vals[rng.choice(n, n // 20, replace=False)] = np.nan
            rows = [(float(v),) for v in vals]
            schema = "k double"
            probe_pool = ([float(v) for v in rng.choice(vals, 10)]
                          + [float(x) for x in rng.normal(0, 1e6, 10)])
        df = spark.createDataFrame(rows, schema)
        sk.stage_clustered(df, path, "k", 4)
        idx = sk.build_scan_index(spark, path, "k")
        probes = spark.createDataFrame([(p,) for p in probe_pool], schema)
        got, stats = sk.pruned_lookup(spark, path, idx, probes, "k")
        full = spark.read.parquet(path).join(probes, on="k",
                                             how="left_semi")
        assert keyset(got.collect()) == keyset(full.collect()), \
            (seed, dtype)
        assert stats["files_scanned"] <= stats["files_total"]


def test_files_total_cache_param(spark, staged):
    path, idx = staged
    got, stats = sk.pruned_lookup(spark, path, idx, _probe_df(spark, [7]),
                                  "k", files_total=N_FILES)
    assert stats["files_total"] == N_FILES and got.count() == 1


def test_max_probes_guard(spark, staged):
    _, idx = staged
    probes = _probe_df(spark, range(20))
    with pytest.raises(ValueError, match="point-lookup"):
        sk.prune_files(idx, probes, "k", max_probes=10)


def test_range_scan_matches_full_and_skips(spark, staged):
    path, idx = staged
    # keys are 0,7,...,27993 over 8 files of 500 keys each; a span of
    # ~700 keys crosses at most 2 file boundaries
    lo, hi = 7000, 11900
    got, stats = sk.pruned_range_scan(spark, path, idx, "k", lo, hi)
    full = (spark.read.parquet(path)
            .where(F.col("k").between(lo, hi)))
    assert sorted(r["k"] for r in got.collect()) == \
        sorted(r["k"] for r in full.collect())
    assert 1 <= stats["files_scanned"] <= 3 < stats["files_total"]


def test_range_scan_empty_interval(spark, staged):
    path, idx = staged
    got, stats = sk.pruned_range_scan(spark, path, idx, "k",
                                      10**9, 2 * 10**9)
    assert got.count() == 0 and stats["files_scanned"] == 0


def test_extend_scan_index_appends_only_delta(spark, tmp_path):
    path = str(tmp_path / "grow")
    first = spark.range(0, 1000).select(F.col("id").alias("k"))
    sk.stage_clustered(first, path, "k", 4)
    idx = sk.build_scan_index(spark, path, "k").persist()
    assert idx.count() == 4

    # data lands file-by-file: append a new key range as more files
    (spark.range(1000, 1500).select(F.col("id").alias("k"))
     .repartitionByRange(2, F.col("k"))
     .write.mode("append").parquet(path))
    grown = sk.extend_scan_index(spark, idx, path, "k").persist()
    assert grown.count() == 6
    # old rows are byte-identical (no rebuild), new keys are findable
    old = {r["file"]: bytes(r["payload"]) for r in idx.collect()}
    kept = {r["file"]: bytes(r["payload"]) for r in grown.collect()
            if r["file"] in old}
    assert kept == old
    got, stats = sk.pruned_lookup(
        spark, path, grown, _probe_df(spark, [1250, 42]), "k")
    assert sorted(r["k"] for r in got.collect()) == [42, 1250]
    assert stats["files_scanned"] == 2 and stats["files_total"] == 6
    # no-op when nothing new landed: same object back
    assert sk.extend_scan_index(spark, grown, path, "k") is grown


def test_all_null_key_file_gets_sentinel_row(spark, tmp_path):
    """A file whose keys are ALL NULL must still be covered by the
    index (sentinel row, n_rows=0): without it, extend_scan_index
    re-classifies the file as new and re-scans it on every incremental
    call; and no prune path may ever scan it (NULL matches nothing)."""
    path = str(tmp_path / "nulls")
    (spark.createDataFrame([(1,), (2,), (3,)], "k long").coalesce(1)
     .write.parquet(path))
    (spark.createDataFrame([(None,), (None,)], "k long").coalesce(1)
     .write.mode("append").parquet(path))
    idx = sk.build_scan_index(spark, path, "k").persist()
    rows = {r["n_rows"]: r for r in idx.collect()}
    assert set(rows) == {3, 0}
    sent = rows[0]
    assert sent["min_key"] is None and sent["max_key"] is None
    # covered: the incremental path is a no-op (same object back)
    assert sk.extend_scan_index(spark, idx, path, "k") is idx
    # the sentinel file is never scanned, results stay exact
    got, stats = sk.pruned_lookup(spark, path, idx,
                                  _probe_df(spark, [2, 99]), "k")
    assert [r["k"] for r in got.collect()] == [2]
    assert stats["files_scanned"] == 1
    got, stats = sk.pruned_range_scan(spark, path, idx, "k", 0, 100)
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 3]
    assert stats["files_scanned"] == 1


def test_pruned_lookup_pushes_probe_range_into_scan(spark, staged):
    """The probe keys' [min, max] must reach the candidate-file scan as
    parquet PushedFilters: files are pruned by the index, row groups
    WITHIN surviving files by the pushed range — the second half of the
    skipping win at 256MB-file scale."""
    path, idx = staged
    got, _ = sk.pruned_lookup(spark, path, idx,
                              _probe_df(spark, [700, 707, 714]), "k")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(k,700)" in plan, plan
    assert "LessThanOrEqual(k,714)" in plan, plan
    assert sorted(r["k"] for r in got.collect()) == [700, 707, 714]
