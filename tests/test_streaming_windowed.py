"""Event-time windowed sketch state (applyInPandasWithState)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from bloom_filters_spark.kernels import HLLSketch
from bloom_filters_spark.streaming import (
    run_windowed_to_memory, sketch_per_window)
from bloom_filters_spark.streaming.windowed import run_windowed_foreach_batch


def _write_events(spark, path, t0, rows):
    pdf = pd.DataFrame(rows, columns=["ts", "user_id"])
    spark.createDataFrame(pdf).select(
        F.col("ts").cast("timestamp"), "user_id").write.parquet(path)


def test_windowed_hll_counts(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    rows = []
    # window A [00:00, 00:10): users 0..99 twice (duplicates collapse)
    for u in range(100):
        rows.append((t0 + dt.timedelta(minutes=1), u))
        rows.append((t0 + dt.timedelta(minutes=5), u))
    # window B [00:10, 00:20): users 0..499
    for u in range(500):
        rows.append((t0 + dt.timedelta(minutes=12), u))
    _write_events(spark, src, t0, rows)

    stream = (spark.readStream
              .schema("ts timestamp, user_id long").parquet(src))
    windowed = sketch_per_window(stream, "ts", "user_id",
                                 lambda: HLLSketch(12),
                                 window="10 minutes",
                                 watermark="10 minutes")
    run_windowed_to_memory(windowed, "win_hll", str(tmp_path / "cp"))
    out = {r["window_start"]: r for r in
           spark.sql("SELECT * FROM win_hll").collect()}
    assert len(out) == 2
    a = out[t0 + dt.timedelta(minutes=0)]
    b = out[t0 + dt.timedelta(minutes=10)]
    assert a["n_rows"] == 200
    assert abs(a["estimate"] - 100) / 100 < 0.1      # dups collapsed
    assert b["n_rows"] == 500
    assert abs(b["estimate"] - 500) / 500 < 0.1


def test_windowed_state_merges_across_batches(spark, tmp_path):
    """Two file drops into the same window: state must accumulate, and
    the second trigger's estimate must cover both batches."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src2")
    _write_events(spark, f"{src}/a.parquet", t0,
                  [(t0 + dt.timedelta(minutes=1), u) for u in range(200)])
    stream = (spark.readStream
              .schema("ts timestamp, user_id long").parquet(f"{src}/*"))
    windowed = sketch_per_window(stream, "ts", "user_id",
                                 lambda: HLLSketch(12))
    cp = str(tmp_path / "cp2")
    seen = []

    def sink(bdf, _bid):
        seen.extend(bdf.collect())

    run_windowed_foreach_batch(windowed, sink, cp)

    # second drop: 200 NEW users into the same window, then resume the
    # stream from checkpoint — state blob must carry over
    _write_events(spark, f"{src}/b.parquet", t0,
                  [(t0 + dt.timedelta(minutes=2), u + 1000)
                   for u in range(200)])
    run_windowed_foreach_batch(windowed, sink, cp)
    last = seen[-1]
    assert last["n_rows"] == 400
    assert abs(last["estimate"] - 400) / 400 < 0.1


def test_windowed_nulls_do_not_count(spark, tmp_path):
    """NULL values must not fold into the window sketch as a phantom
    member (xxhash64 of a NULL child is a constant), matching the
    batch build_sketch semantics."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "srcn")
    rows = [(t0 + dt.timedelta(minutes=1), float(u)) for u in range(50)]
    rows += [(t0 + dt.timedelta(minutes=2), None)] * 10
    pdf = pd.DataFrame(rows, columns=["ts", "user_id"])
    spark.createDataFrame(pdf).select(
        F.col("ts").cast("timestamp"),
        F.col("user_id").cast("long").alias("user_id")) \
        .write.parquet(src)
    stream = (spark.readStream
              .schema("ts timestamp, user_id long").parquet(src))
    windowed = sketch_per_window(stream, "ts", "user_id",
                                 lambda: HLLSketch(12),
                                 window="10 minutes",
                                 watermark="10 minutes")
    run_windowed_to_memory(windowed, "win_null", str(tmp_path / "cpn"))
    out = spark.sql("SELECT * FROM win_null").collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 50                    # nulls not counted
    assert abs(out[0]["estimate"] - 50) / 50 < 0.1   # no phantom member
