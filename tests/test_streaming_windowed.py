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


def _write_items(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["ts", "token"])
    spark.createDataFrame(pdf).select(
        F.col("ts").cast("timestamp"), "token").write.parquet(path)


def test_windowed_topk_exact(spark, tmp_path):
    """capacity > distinct items => MG never decrements => counts are
    EXACT; ranks follow (count desc, item asc)."""
    from bloom_filters_spark.streaming import topk_per_window
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "tk_src")
    rows = []
    # window A [00:00, 00:10): a x10, b x5, c x5, d x1
    for tok, cnt in [("a", 10), ("b", 5), ("c", 5), ("d", 1)]:
        rows += [(t0 + dt.timedelta(minutes=1), tok)] * cnt
    # window B [00:10, 00:20): z x7, y x3
    for tok, cnt in [("z", 7), ("y", 3)]:
        rows += [(t0 + dt.timedelta(minutes=12), tok)] * cnt
    _write_items(spark, src, rows)

    stream = (spark.readStream
              .schema("ts timestamp, token string").parquet(src))
    out_df = topk_per_window(stream, "ts", "token", k=3, capacity=256,
                             window="10 minutes", watermark="10 minutes")
    run_windowed_to_memory(out_df, "win_topk", str(tmp_path / "tk_cp"))
    rows_out = spark.sql(
        "SELECT * FROM win_topk ORDER BY window_start, rank").collect()
    a = [r for r in rows_out if r["window_start"] == t0]
    b = [r for r in rows_out
         if r["window_start"] == t0 + dt.timedelta(minutes=10)]
    assert [(r["item"], r["count"], r["rank"]) for r in a] == [
        ("a", 10, 1), ("b", 5, 2), ("c", 5, 3)]   # b before c: item asc
    assert all(r["n_rows"] == 21 for r in a)
    assert [(r["item"], r["count"], r["rank"]) for r in b] == [
        ("z", 7, 1), ("y", 3, 2)]
    assert all(r["n_rows"] == 10 for r in b)


def test_windowed_topk_state_across_batches(spark, tmp_path):
    """Two file drops into one window: counters must accumulate in the
    MG state blob, and retained keys keep their names across batches
    even when the key does NOT reappear in the second batch."""
    from bloom_filters_spark.streaming import topk_per_window
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "tk2_src")
    _write_items(spark, f"{src}/a.parquet",
                 [(t0 + dt.timedelta(minutes=1), "alpha")] * 6 +
                 [(t0 + dt.timedelta(minutes=1), "beta")] * 2)
    stream = (spark.readStream
              .schema("ts timestamp, token string").parquet(f"{src}/*"))
    out_df = topk_per_window(stream, "ts", "token", k=2, capacity=64,
                             window="10 minutes", watermark="10 minutes")
    cp = str(tmp_path / "tk2_cp")
    seen = []

    def sink(bdf, _bid):
        seen.extend(bdf.collect())

    run_windowed_foreach_batch(out_df, sink, cp)
    # second drop: only beta occurs; alpha's name must survive in state
    _write_items(spark, f"{src}/b.parquet",
                 [(t0 + dt.timedelta(minutes=2), "beta")] * 3)
    run_windowed_foreach_batch(out_df, sink, cp)
    last_trigger = [r for r in seen if r["n_rows"] == 11]
    assert [(r["item"], r["count"], r["rank"]) for r in
            sorted(last_trigger, key=lambda r: r["rank"])] == [
        ("alpha", 6, 1), ("beta", 5, 2)]


def test_windowed_topk_small_capacity_lower_bounds(spark, tmp_path):
    """capacity < distinct: the heavy item must still be retained
    (true freq > n/(capacity+1)) with count a lower bound <= true and
    >= true - n/(capacity+1)."""
    from bloom_filters_spark.streaming import topk_per_window
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "tk3_src")
    rows = [(t0 + dt.timedelta(minutes=1), "hot")] * 300
    rows += [(t0 + dt.timedelta(minutes=2), f"cold{i}") for i in range(700)]
    _write_items(spark, src, rows)
    stream = (spark.readStream
              .schema("ts timestamp, token string").parquet(src))
    out_df = topk_per_window(stream, "ts", "token", k=1, capacity=8,
                             window="10 minutes", watermark="10 minutes")
    run_windowed_to_memory(out_df, "win_topk3", str(tmp_path / "tk3_cp"))
    rows_out = spark.sql("SELECT * FROM win_topk3").collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    n = 1000
    assert r["item"] == "hot" and r["rank"] == 1 and r["n_rows"] == n
    assert r["count"] <= 300
    assert r["count"] >= 300 - n // (8 + 1)


def test_duration_parser():
    from bloom_filters_spark.streaming.windowed import _duration_ms
    assert _duration_ms("10 minutes") == 600_000
    assert _duration_ms("1 day") == 86_400_000
    assert _duration_ms("90 seconds") == 90_000
    assert _duration_ms("2 HOURS") == 7_200_000
    import pytest
    with pytest.raises(ValueError):
        _duration_ms("1.5 days")
    with pytest.raises(ValueError):
        _duration_ms("fortnight")


def test_windowed_value_quantile(spark, tmp_path):
    """value_based per-window KLL: the emitted median must sit within
    the sketch's rank-error bound of the exact per-window median; NULL
    and NaN values are dropped (n_rows counts only folded rows)."""
    from bloom_filters_spark.kernels import KLLSketch
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "vq_src")
    rows = [(t0 + dt.timedelta(minutes=1), float(v))      # window A: 0..999
            for v in range(1000)]
    rows += [(t0 + dt.timedelta(minutes=12), float(v * 10))  # B: 0..4990
             for v in range(500)]
    rows += [(t0 + dt.timedelta(minutes=2), None)] * 7
    rows += [(t0 + dt.timedelta(minutes=3), float("nan"))] * 5
    pdf = pd.DataFrame(rows, columns=["ts", "val"])
    spark.createDataFrame(pdf).select(
        F.col("ts").cast("timestamp"), "val").write.parquet(src)
    stream = (spark.readStream
              .schema("ts timestamp, val double").parquet(src))
    windowed = sketch_per_window(
        stream, "ts", "val", lambda: KLLSketch(200),
        window="10 minutes", watermark="10 minutes",
        value_based=True, emit=lambda sk: sk.quantile(0.5))
    run_windowed_to_memory(windowed, "win_vq", str(tmp_path / "vq_cp"))
    out = {r["window_start"]: r for r in
           spark.sql("SELECT * FROM win_vq").collect()}
    a = out[t0]
    b = out[t0 + dt.timedelta(minutes=10)]
    assert a["n_rows"] == 1000 and b["n_rows"] == 500   # NULL/NaN dropped
    # KLL(200) rank error ~1.5%; allow 3% of the value range per window
    assert abs(a["estimate"] - 499.5) <= 0.03 * 1000
    assert abs(b["estimate"] - 2495.0) <= 0.03 * 5000


def _run_batches(spark, tmp_path, tag, make_stream):
    """Drive a windowed stream through four single-file triggers and
    return the sink rows per run (restart-from-checkpoint each time)."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / f"{tag}_src")
    cp = str(tmp_path / f"{tag}_cp")
    far = t0 + dt.timedelta(days=3)
    drops = [
        [(t0 + dt.timedelta(minutes=1), "alpha")] * 4,          # window A
        [(far, "zeta")] * 2,                                     # watermark →
        [(far + dt.timedelta(minutes=30), "zeta")] * 2,          # A evicts
        [(far + dt.timedelta(minutes=60), "zeta")] * 2,          # A stays gone
    ]
    stream = make_stream(f"{src}/*")
    per_run = []
    for i, rows in enumerate(drops):
        _write_items(spark, f"{src}/d{i}.parquet", rows)
        batch_rows = []
        run_windowed_foreach_batch(
            stream, lambda bdf, _bid: batch_rows.extend(bdf.collect()), cp)
        per_run.append(batch_rows)
    return t0, per_run


def test_windowed_state_ttl_evicts(spark, tmp_path):
    """state_ttl: window A's state must flush exactly once after the
    watermark passes window_end + ttl, then never reappear (evicted)."""
    from bloom_filters_spark.kernels import HLLSketch

    def make(path):
        stream = (spark.readStream
                  .schema("ts timestamp, token string").parquet(path))
        return sketch_per_window(stream, "ts", "token",
                                 lambda: HLLSketch(12),
                                 window="10 minutes",
                                 watermark="10 minutes",
                                 state_ttl="10 minutes")

    t0, per_run = _run_batches(spark, tmp_path, "ttl", make)
    a_rows = [[r for r in run if r["window_start"] == t0]
              for run in per_run]
    assert len(a_rows[0]) == 1 and a_rows[0][0]["n_rows"] == 4
    # the "window closed" flush fires exactly once, in whichever later
    # run's watermark first exceeds A's close time (availableNow runs a
    # trailing no-data batch, so it lands in the run that ADVANCED the
    # watermark); afterwards the state is gone — A never reappears
    flush_runs = [i for i in range(1, 4) if a_rows[i]]
    assert len(flush_runs) == 1
    flush = a_rows[flush_runs[0]]
    assert len(flush) == 1
    assert flush[0]["n_rows"] == 4      # byte-equal to the last update
    assert flush[0]["estimate"] == a_rows[0][0]["estimate"]


def test_windowed_topk_state_ttl_evicts(spark, tmp_path):
    """Same eviction contract for the MG top-k state."""
    from bloom_filters_spark.streaming import topk_per_window

    def make(path):
        stream = (spark.readStream
                  .schema("ts timestamp, token string").parquet(path))
        return topk_per_window(stream, "ts", "token", k=2, capacity=16,
                               window="10 minutes",
                               watermark="10 minutes",
                               state_ttl="10 minutes")

    t0, per_run = _run_batches(spark, tmp_path, "tttl", make)
    a_rows = [[r for r in run if r["window_start"] == t0]
              for run in per_run]
    assert [(r["item"], r["count"]) for r in a_rows[0]] == [("alpha", 4)]
    flush_runs = [i for i in range(1, 4) if a_rows[i]]
    assert len(flush_runs) == 1
    assert [(r["item"], r["count"]) for r in a_rows[flush_runs[0]]] == [
        ("alpha", 4)]


def test_windowed_sliding_sketch(spark, tmp_path):
    """slide= expands each row into every window containing it; each
    window_start keeps an independent sketch (n_rows per window checks
    the expansion exactly)."""
    from bloom_filters_spark.kernels import HLLSketch
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "sl_src")
    # 60 rows at :02 and 40 rows at :07 — 10-minute windows sliding
    # by 5: rows at :02 fall in windows starting 23:55 and 00:00;
    # rows at :07 in windows 00:00 and 00:05
    rows = [(t0 + dt.timedelta(minutes=2), u) for u in range(60)]
    rows += [(t0 + dt.timedelta(minutes=7), u + 1000) for u in range(40)]
    _write_events(spark, src, t0, rows)
    stream = (spark.readStream
              .schema("ts timestamp, user_id long").parquet(src))
    windowed = sketch_per_window(stream, "ts", "user_id",
                                 lambda: HLLSketch(12),
                                 window="10 minutes", slide="5 minutes",
                                 watermark="10 minutes")
    run_windowed_to_memory(windowed, "win_slide", str(tmp_path / "sl_cp"))
    out = {r["window_start"]: r["n_rows"] for r in
           spark.sql("SELECT * FROM win_slide").collect()}
    assert out == {t0 - dt.timedelta(minutes=5): 60,
                   t0: 100,
                   t0 + dt.timedelta(minutes=5): 40}


def test_sliding_window_state_row_accounting(spark, tmp_path):
    """State-row bound for sliding windows (VERDICT r4 #8): window()
    with slide=S explodes each row into exactly W/S covering windows,
    so a span of T event time holds (T + W - S)/S live window states —
    the overlap factor multiplies state, NOT n_rows per window. An
    unbounded-stream caller sizes state_ttl from this: resident state
    ≈ (watermark_lag + W + ttl)/S rows once eviction keeps pace."""
    from bloom_filters_spark.kernels import HLLSketch
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "acc_src")
    # one row per minute for T=120 minutes; W=30, S=5 → overlap 6
    rows = [(t0 + dt.timedelta(minutes=m), m) for m in range(120)]
    _write_events(spark, src, t0, rows)
    stream = (spark.readStream
              .schema("ts timestamp, user_id long").parquet(src))
    windowed = sketch_per_window(stream, "ts", "user_id",
                                 lambda: HLLSketch(12),
                                 window="30 minutes", slide="5 minutes",
                                 watermark="10 minutes")
    run_windowed_to_memory(windowed, "win_acc", str(tmp_path / "acc_cp"))
    out = {r["window_start"]: r["n_rows"] for r in
           spark.sql("SELECT * FROM win_acc").collect()}
    overlap = 30 // 5
    # exact live-state count: (T + W - S)/S covering window_starts
    assert len(out) == (120 + 30 - 5) // 5 == 29
    # the coarse sizing bound: ≤ (T/W + 1) × overlap tumbling-windows'
    # worth of state rows
    assert len(out) <= (120 // 30 + 1) * overlap
    # every row fed exactly `overlap` window states (the multiplier is
    # on STATE, not on any single window's row count)
    assert sum(out.values()) == 120 * overlap
    assert max(out.values()) == 30     # a full window sees W rows


def test_curation_expressions_are_streaming_safe(spark, tmp_path):
    """The per-doc curation battery (PII scrub, BPE token count,
    quality score, canonical url) is pure stateless column
    expressions, so it must run unchanged inside a streaming query —
    and produce byte-identical rows to the batch run over the same
    files. repetition_stats / dedup_paragraphs are NOT in this set
    (corpus-global aggregations belong in foreachBatch or the batch
    layer, by design)."""
    from bloom_filters_spark.operators.scrub import with_scrubbed_text
    from bloom_filters_spark.operators.textstats import (
        bpe_token_count_col, with_quality_score)
    from bloom_filters_spark.operators.urls import canonical_url_col

    src = str(tmp_path / "cur_src")
    rows = [(i, f"HTTP://Host{i % 3}.com:80/p?utm_source=x&k={i}",
             f"doc {i} mail a{i}@b.co call 415.555.{1000 + i:04d} "
             + "the quick brown fox " * (i % 4 + 1))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    df.coalesce(2).write.parquet(src)

    def curate(d):
        return (with_quality_score(with_scrubbed_text(d))
                .withColumn("n_bpe", bpe_token_count_col("text"))
                .withColumn("curl", canonical_url_col("url"))
                .select("doc_id", "text_scrubbed", "n_emails", "n_phones",
                        "quality_score", "n_bpe", "curl"))

    stream = (spark.readStream
              .schema("doc_id long, url string, text string").parquet(src))
    q = (curate(stream).writeStream.format("memory")
         .queryName("cur_stream").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "cur_cp")).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in
           spark.sql("SELECT * FROM cur_stream").collect()}
    want = {r["doc_id"]: r for r in curate(spark.read.parquet(src)).collect()}
    assert len(got) == 60 and got.keys() == want.keys()
    for i in want:
        assert got[i] == want[i]
    assert all(want[i]["n_emails"] == 1 and want[i]["n_phones"] == 1
               for i in want)
