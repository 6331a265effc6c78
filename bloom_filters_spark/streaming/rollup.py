"""Streaming maintenance of a re-aggregatable sketch cube.

Composes the two halves the north star asks for: Structured Streaming
ingest of a pages-shaped stream, and `operators/rollup.py`'s sketch
cube answering sliced distinct questions without rescans. Each
micro-batch is rolled up with the SAME batch operator
(`rollup_sketches`) and appended to the cube directory — buckets may
then hold partials from many batches, which is fine by construction:
`query_rollup` merges whatever partials a slice selects, and for
max-register sketches the merged content equals a single-pass build
(test-pinned byte-identity vs the batch cube).

Exactly-once without a replay cursor: foreachBatch is at-least-once,
so each batch writes to its OWN deterministic subdirectory
(``batch=<id>``, mode=overwrite) — a replayed batch overwrites its
previous output instead of appending a double-count. This is the
idempotent-sink pattern Spark's docs prescribe for file sinks, and it
keeps count-shaped sketches (CMS/MG/KLL) exact, not just the
idempotent ones (Bloom/HLL).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup import rollup_sketches


def run_stream_rollup(stream_df: DataFrame, cube_dir: str, col: str,
                      factory: Callable, *, time_col: str,
                      grain: str = "day", group_cols=(),
                      checkpoint_dir: str, seed: int = 0,
                      value_based: bool = False) -> None:
    """Drain the available stream data into the cube at ``cube_dir``
    (availableNow trigger; re-invoke on a schedule or keep a long-lived
    query for continuous ingest). Restart-safe: offsets live in
    ``checkpoint_dir``; replays overwrite their own batch directory."""

    def sink(bdf: DataFrame, batch_id: int) -> None:
        part = rollup_sketches(bdf, col, factory, time_col=time_col,
                               grain=grain, group_cols=group_cols,
                               seed=seed, value_based=value_based)
        (part.write.mode("overwrite")
             .parquet(f"{cube_dir}/batch={batch_id}"))

    q = (stream_df.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def read_stream_cube(spark: SparkSession, cube_dir: str) -> DataFrame:
    """Open the streamed cube for `query_rollup`. The discovered
    ``batch`` partition column rides along (harmless — slices filter
    on group/bucket columns; payload folding ignores it)."""
    return spark.read.parquet(cube_dir)
