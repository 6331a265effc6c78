"""Event-time windowed sketches under Structured Streaming.

The reference has no streaming at all (SURVEY.md §2.8); this is the
Spark-native extension: per-window sketch state maintained by
``applyInPandasWithState`` — the custom stateful operator API — with
event-time watermarking for late data.

Why sketches fit streaming: they are mergeable monoids, so a window's
state is ONE fixed-size blob regardless of row count, late rows fold
in with the same `update_hashes` used in batch, and restart recovery
is the checkpointed blob — no row buffering, no re-aggregation.

Plan shape: watermark → JVM xxhash64 → groupBy(window start) →
applyInPandasWithState(update sketch blob) → update-mode rows
(window_start, estimate, n_rows) per trigger.

Late-data semantics (observed, Spark 4.1): the watermark is a lower
bound that only advances AFTER a batch completes, so a late row that
arrives in the first batch after a restart still reaches its window's
state and merges correctly (sketches are monoids — folding late data
in is strictly better than dropping it). With NoTimeout the per-window
state lives forever; a production deployment over unbounded windows
should use GroupStateTimeout.EventTimeTimeout and drop state for
windows older than the allowed lateness.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

from ..kernels import sketch_from_bytes
from ..operators.agg import hash_col

_OUT_SCHEMA = StructType([
    StructField("window_start", TimestampType()),
    StructField("estimate", DoubleType()),
    StructField("n_rows", LongType()),
])
_STATE_SCHEMA = StructType([
    StructField("payload", BinaryType()),
    StructField("n_rows", LongType()),
])


def sketch_per_window(stream_df: DataFrame, time_col: str, col: str,
                      factory: Callable, *, window: str = "10 minutes",
                      watermark: str = "10 minutes",
                      seed: int = 0) -> DataFrame:
    """→ streaming DataFrame (window_start, estimate, n_rows), one row
    per updated window per trigger. ``factory`` must build a sketch
    with ``update_hashes``/``merge`` and an ``estimate()`` method
    (e.g. HLLSketch) — the state blob is its serialized bytes."""

    # NULL values are dropped BEFORE hashing, matching build_sketch's
    # batch semantics: xxhash64 skips null children, so a NULL would
    # otherwise fold in as one phantom member (hash of the seed alone)
    # and inflate every distinct estimate by 1
    hashed = (stream_df
              .withWatermark(time_col, watermark)
              .where(F.col(col).isNotNull())
              .select(F.window(F.col(time_col), window)
                      .getField("start").alias("window_start"),
                      hash_col(F.col(col), seed).alias("__v")))

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            payload, n = state.get
            sk = sketch_from_bytes(bytes(payload))
            n = int(n)
        else:
            sk, n = factory(), 0
        for pdf in pdfs:
            sk.update_hashes(pdf["__v"].to_numpy(dtype=np.int64, na_value=0))
            n += len(pdf)
        state.update((sk.to_bytes(), n))
        yield pd.DataFrame({"window_start": [key[0]],
                            "estimate": [float(sk.estimate())],
                            "n_rows": [n]})

    return (hashed.groupBy("window_start")
            .applyInPandasWithState(update, _OUT_SCHEMA, _STATE_SCHEMA,
                                    "Update", GroupStateTimeout.NoTimeout))


_TOPK_OUT_SCHEMA = StructType([
    StructField("window_start", TimestampType()),
    StructField("item", StringType()),
    StructField("count", LongType()),
    StructField("rank", LongType()),
    StructField("n_rows", LongType()),
])
_TOPK_STATE_SCHEMA = StructType([
    StructField("payload", BinaryType()),
    StructField("names", BinaryType()),
    StructField("n_rows", LongType()),
])


def topk_per_window(stream_df: DataFrame, time_col: str, col: str, *,
                    k: int = 5, capacity: int = 256,
                    window: str = "1 day", watermark: str = "1 day",
                    seed: int = 0) -> DataFrame:
    """Streaming heavy hitters: → (window_start, item, count, rank,
    n_rows), the top-k items of each event-time window, maintained by
    a Misra-Gries state blob per window (the streaming twin of
    operators/frequent.heavy_hitters — the north-star 'heavy-hitter
    counts' query shape under Structured Streaming).

    State per window is ONE capacity-bounded MG summary plus a
    hash→item name table for the ≤ capacity retained keys (an MG key
    can only (re)enter the summary in a batch where the item occurs,
    so every retained key always has a name recorded; names of evicted
    keys are pruned). When ``capacity`` exceeds the window's distinct
    item count MG never decrements, so the emitted counts are EXACT
    (full-strength SQL oracle); past that, counts are the documented
    lower bounds (true − n/(capacity+1) ≤ count ≤ true) and every item
    with true frequency > n/(capacity+1) is retained. Items are
    compared as strings for the deterministic (count desc, item asc)
    tie-break; 64-bit hash collisions between distinct items would
    conflate their names (~2⁻⁶⁴·pairs, negligible at any real k)."""
    import json

    from ..kernels.misragries import MisraGriesSketch

    hashed = (stream_df
              .withWatermark(time_col, watermark)
              .where(F.col(col).isNotNull())
              .select(F.window(F.col(time_col), window)
                      .getField("start").alias("window_start"),
                      hash_col(F.col(col), seed).alias("__v"),
                      F.col(col).cast("string").alias("__s")))

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            payload, names_raw, n = state.get
            sk = sketch_from_bytes(bytes(payload))
            names = {int(h): s for h, s in
                     json.loads(bytes(names_raw).decode("utf-8"))}
            n = int(n)
        else:
            sk, names, n = MisraGriesSketch(capacity), {}, 0
        for pdf in pdfs:
            h = pdf["__v"].to_numpy(dtype=np.int64, na_value=0)
            sk.update_hashes(h)
            n += len(pdf)
            retained = set(int(x) for x in sk.keys.astype(np.uint64))
            uh, first = np.unique(h.astype(np.uint64), return_index=True)
            batch_names = pdf["__s"].to_numpy()
            for hv, i in zip(uh, first):
                if int(hv) in retained:
                    names[int(hv)] = str(batch_names[i])
        retained = set(int(x) for x in sk.keys.astype(np.uint64))
        names = {h: s for h, s in names.items() if h in retained}
        state.update((sk.to_bytes(),
                      json.dumps(sorted(names.items())).encode("utf-8"),
                      n))
        top = sorted(((int(c), names[int(h)]) for h, c in
                      zip(sk.keys.astype(np.uint64), sk.counts)),
                     key=lambda t: (-t[0], t[1]))[:k]
        yield pd.DataFrame({
            "window_start": [key[0]] * len(top),
            "item": [s for _, s in top],
            "count": [c for c, _ in top],
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "n_rows": [n] * len(top)})

    return (hashed.groupBy("window_start")
            .applyInPandasWithState(update, _TOPK_OUT_SCHEMA,
                                    _TOPK_STATE_SCHEMA, "Update",
                                    GroupStateTimeout.NoTimeout))


def run_windowed_to_memory(windowed: DataFrame, query_name: str,
                           checkpoint_dir: str):
    """Start the windowed stream into a memory sink (availableNow) and
    wait; results are read back with spark.sql(f"SELECT * FROM name").
    NOTE: memory sinks cannot recover from a checkpoint — for
    restartable queries use run_windowed_foreach_batch."""
    q = (windowed.writeStream.format("memory").queryName(query_name)
         .outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def run_windowed_foreach_batch(windowed: DataFrame, sink,
                               checkpoint_dir: str):
    """Start the windowed stream through a foreachBatch sink callable
    ``sink(batch_df, batch_id)`` with checkpointed offsets+state —
    kill/restart resumes the per-window sketch state."""
    q = (windowed.writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
