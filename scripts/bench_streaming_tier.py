"""Two-tier (1x vs 10x rows) scale evidence for the STREAMING surfaces
(VERDICT r4 #7 asked to tier "the rollup + streaming queries";
BENCH/sf1.json carries the batch + rollup tiers, this carries the
streaming ones).

Two north-star streaming jobs over a content-addressed events-shaped
table (ts timestamp, user_id long; one row per second over a fixed
30-day span, so BOTH tiers hold the same 30 day-windows — only the
rows-per-window grow 10x):

1. windowed sketch maintenance — ``sketch_per_window`` (per-day
   HLL(12) distinct users, applyInPandasWithState, 3-batch
   availableNow replay via maxFilesPerTrigger). The scale claims:
   wall tracks ROWS (near-linear), while LIVE STATE is O(windows) —
   exactly 30 blob rows at both tiers, independent of row count
   (sketches are fixed-size monoids; a 10^12-row day costs the same
   state bytes as a 2M-row day).
2. streaming seen-before dedup — ``StreamingShardedDedup`` (sharded
   Bloom probe + OR-fold, versioned parquet state). The scale claims:
   wall tracks rows; state BYTES track the configured capacity
   (m bits/key sized at build), not the observed row count — and the
   per-batch plan never shuffles payload per row (probe is a
   co-partitioned cogroup).

Same discipline as scripts/bench_sf1.py: REPS alternating reps,
min-of-reps per tier (this VM has episodic slow-memory phases), one
Spark job at a time. Writes BENCH/streaming_tier.json.

Usage: python scripts/bench_streaming_tier.py
Env: SPARK_GRAFT_STREAM_TIER_REPS (default 2),
     SPARK_GRAFT_STREAM_TIER_DIR (default /tmp/bfs_stream_tiers).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bloom_filters_spark.session import get_spark  # noqa: E402
from bloom_filters_spark.kernels import HLLSketch  # noqa: E402
from bloom_filters_spark.streaming.dedup import (  # noqa: E402
    StreamingShardedDedup, run_stream_dedup)
from bloom_filters_spark.streaming.windowed import (  # noqa: E402
    run_windowed_to_memory, sketch_per_window)

REPS = int(os.environ.get("SPARK_GRAFT_STREAM_TIER_REPS", "2"))
BASE = os.environ.get("SPARK_GRAFT_STREAM_TIER_DIR", "/tmp/bfs_stream_tiers")
_R1, _R10 = (int(x) for x in os.environ.get(
    "SPARK_GRAFT_STREAM_TIER_ROWS", "2000000,20000000").split(","))
ROWS = {"1x": _R1, "10x": _R10}
SPAN_S = 30 * 86_400          # 30 day-windows at every tier
EPOCH = 1_704_067_200         # 2024-01-01 UTC
N_FILES = 6                   # x maxFilesPerTrigger=2 -> 3 micro-batches


def stage_events(spark, tier: str) -> str:
    """Content-addressed events table staged as N_FILES TIME-ORDERED
    parquet files (file i holds days [5i, 5i+5), mtime pinned
    ascending — FileStreamSource orders by mtime): later micro-batches
    carry only newer event time, so the 1-day watermark never drops a
    row mid-replay (the same staging discipline as the
    streaming_windowed oracle row). ts covers the SAME 30-day span at
    every tier (windows fixed, rows/window grow 10x); user_id is an
    xxhash64 draw with ~25% cross-row duplicates so the dedup side has
    true suppressions to do."""
    path = os.path.join(BASE, f"events_{tier}")
    if os.path.exists(os.path.join(path, "_DONE")):
        return path
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    n = ROWS[tier]
    df = spark.range(n).select(
        F.timestamp_seconds(
            F.lit(EPOCH) + F.pmod(F.xxhash64("id", F.lit(7)),
                                  F.lit(SPAN_S))).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(11)),
               F.lit(int(n * 0.75))).alias("user_id"))
    days_per_file = 30 // N_FILES
    with tempfile.TemporaryDirectory() as td:
        for i in range(N_FILES):
            lo = EPOCH + i * days_per_file * 86_400
            hi = lo + days_per_file * 86_400
            part = os.path.join(td, f"p{i}")
            (df.where((F.col("ts") >= F.timestamp_seconds(F.lit(lo))) &
                      (F.col("ts") < F.timestamp_seconds(F.lit(hi))))
             .coalesce(1).write.parquet(part))
            dst = os.path.join(path, f"events_{i}.parquet")
            shutil.copy(glob.glob(os.path.join(part, "part-*.parquet"))[0],
                        dst)
            os.utime(dst, (1_700_000_000 + 100 * i,) * 2)
    open(os.path.join(path, "_DONE"), "w").close()
    return path


def bench_windowed(spark, path: str, name: str) -> dict:
    src = spark.read.parquet(path)
    with tempfile.TemporaryDirectory() as td:
        stream = (spark.readStream.schema(src.schema)
                  .option("maxFilesPerTrigger", 2).parquet(path)
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        windowed = sketch_per_window(stream, "ts", "user_id",
                                     lambda: HLLSketch(12),
                                     window="1 day", watermark="1 day")
        t0 = time.time()
        run_windowed_to_memory(windowed, name, os.path.join(td, "cp"))
        wall = time.time() - t0
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    spark.catalog.dropTempView(name)
    windows = {r["window_start"] for r in rows}
    # final (max-n) row per window — n_rows must sum to the input
    final = {}
    for r in rows:
        w = r["window_start"]
        if w not in final or r["n_rows"] > final[w]["n_rows"]:
            final[w] = r
    assert sum(r["n_rows"] for r in final.values()) == src.count()
    return {"wall": round(wall, 2), "state_rows": len(windows)}


def bench_dedup(spark, path: str) -> dict:
    src = spark.read.parquet(path)
    n = src.count()
    state = tempfile.mkdtemp(prefix="dedup_state")
    cp = tempfile.mkdtemp(prefix="dedup_cp")
    try:
        guard = StreamingShardedDedup(
            spark, "user_id", state, n_shards=64, p=0.01,
            shard_capacity=int(n * 0.75 / 64 * 1.2) + 1)
        stream = (spark.readStream.schema(src.schema)
                  .option("maxFilesPerTrigger", 2).parquet(path))
        t0 = time.time()
        run_stream_dedup(stream, guard, checkpoint_dir=cp)
        wall = time.time() - t0
        state_mb = sum(
            os.path.getsize(f) for f in glob.glob(
                os.path.join(state, guard._versions()[-1], "*.parquet"))
        ) / 1e6
        return {"wall": round(wall, 2), "emitted": guard.n_emitted,
                "suppressed": guard.n_suppressed,
                "state_mb": round(state_mb, 1),
                "worst_fpr": round(guard.last_worst_fpr, 4)}
    finally:
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(cp, ignore_errors=True)


def main() -> None:
    spark = get_spark("bench_streaming_tier")
    os.makedirs(BASE, exist_ok=True)
    paths = {t: stage_events(spark, t) for t in ROWS}
    tiers: dict[str, dict] = {t: {} for t in ROWS}
    for rep in range(REPS):                     # alternate tiers per rep
        for t in ROWS:
            w = bench_windowed(spark, paths[t], f"wt_{t}_{rep}")
            d = bench_dedup(spark, paths[t])
            cur = tiers[t]
            if not cur or w["wall"] < cur["windowed"]["wall"]:
                cur["windowed"] = w
            if "dedup" not in cur or d["wall"] < cur["dedup"]["wall"]:
                cur["dedup"] = d
            print(f"# [{rep}] {t}: windowed {w['wall']}s "
                  f"(state_rows={w['state_rows']}), dedup {d['wall']}s "
                  f"(emitted={d['emitted']}, state={d['state_mb']}MB)",
                  file=sys.stderr)
    t1, t10 = tiers["1x"], tiers["10x"]
    out = {
        "job": "streaming tiers: per-day HLL sketch_per_window "
               "(3-batch availableNow replay) + StreamingShardedDedup "
               "(sharded Bloom, versioned state)",
        "rows": ROWS, "reps": REPS, "windows": 30,
        "tiers": tiers,
        "windowed_wall_ratio_10x": round(
            t10["windowed"]["wall"] / t1["windowed"]["wall"], 2),
        # THE streaming state claim: 10x rows, SAME state rows
        "windowed_state_rows_flat": bool(
            t1["windowed"]["state_rows"] == t10["windowed"]["state_rows"]
            == 30),
        "dedup_wall_ratio_10x": round(
            t10["dedup"]["wall"] / t1["dedup"]["wall"], 2),
        # state bytes track configured capacity (sized to corpus),
        # never row count x bytes-per-row
        "dedup_state_mb": {t: tiers[t]["dedup"]["state_mb"]
                           for t in tiers},
    }
    with open(os.path.join(REPO, "BENCH", "streaming_tier.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
