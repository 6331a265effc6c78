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
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StructField,
                               StructType, TimestampType)

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
