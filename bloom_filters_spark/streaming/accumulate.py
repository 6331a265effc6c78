"""Structured Streaming sketch accumulation.

The sketches are mergeable monoids, so streaming support is
``foreachBatch``: build a partial over each micro-batch with the SAME
batch aggregation layer, merge into the running sketch, optionally
persist every merged state to a checkpoint dir (so a killed stream
resumes from the last merged sketch — the streaming twin of
checkpoint.SketchCheckpoint).

Exactly-once fold: foreachBatch is at-least-once (Spark may REPLAY a
micro-batch whose offsets were not committed before a crash), so the
persisted state records the last merged ``batch_id`` and a replayed or
out-of-order batch is skipped instead of merged twice — without this,
count-shaped sketches (CMS / Misra-Gries / KLL / t-digest) would
silently double-count the replayed batch. (Bloom/HLL are idempotent
under re-merge, but the accumulator accepts any factory.)

The reference has no streaming (its GUI ingests one line per frame,
Bloom_project/src/core/Bloom_project.cpp:916-935 — cosmetic); this is
the Spark-native extension point promised in SURVEY.md §2.8.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame

from ..kernels import sketch_from_bytes
from ..operators.agg import build_sketch

# State-file header: magic + format version. Any future layout change
# bumps _STATE_VERSION so _restore can dispatch (or refuse loudly)
# instead of misparsing bytes written by an older release.
_STATE_MAGIC = b"BFSA"
_STATE_VERSION = 1


class StreamingSketchAccumulator:
    """foreachBatch sink that folds micro-batches into one sketch.

    ``state_dir`` must be paired with the query's Spark
    ``checkpointLocation``: Spark's checkpoint is what keeps batch ids
    monotone across restarts, which the replay cursor relies on. A
    fresh query (new checkpoint, ids restarting at 0) needs a fresh
    state_dir."""

    def __init__(self, col: str, factory: Callable, *,
                 value_based: bool = False, state_dir: str | None = None):
        self.col = col
        self.factory = factory
        self.value_based = value_based
        self.state_dir = state_dir
        self.sketch = None
        self.n_rows = 0
        self.n_batches = 0
        self.last_batch_id = -1
        if state_dir:
            self._restore()

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "sketch_state.bin")

    def _restore(self) -> None:
        path = self._state_path()
        if not os.path.exists(path):
            return
        with open(path, "rb") as f:
            raw = f.read()
        if raw[:4] != _STATE_MAGIC:
            raise ValueError(
                f"{path} is not a versioned accumulator state file "
                f"(missing {_STATE_MAGIC!r} header): it was written by a "
                "pre-versioning release whose layout cannot be told apart "
                "from a sketch payload. Delete the state file (and the "
                "query's checkpointLocation) to restart the fold cleanly.")
        version = raw[4]
        if version != _STATE_VERSION:
            raise ValueError(
                f"{path} has state format v{version}; this release reads "
                f"v{_STATE_VERSION}. Delete the state file to rebuild.")
        self.n_rows = int.from_bytes(raw[5:13], "little")
        self.last_batch_id = int.from_bytes(raw[13:21], "little",
                                            signed=True)
        self.sketch = sketch_from_bytes(raw[21:])

    def _persist(self) -> None:
        if not self.state_dir:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_STATE_MAGIC)
            f.write(bytes([_STATE_VERSION]))
            f.write(self.n_rows.to_bytes(8, "little"))
            f.write(self.last_batch_id.to_bytes(8, "little", signed=True))
            f.write(self.sketch.to_bytes())
        os.replace(tmp, self._state_path())

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id is not None and batch_id <= self.last_batch_id:
            return          # at-least-once replay of an already-merged batch
        part, n = build_sketch(batch_df, self.col, self.factory,
                               value_based=self.value_based)
        if n > 0:
            self.sketch = (part if self.sketch is None
                           else self.sketch.merge(part))
            self.n_rows += n
            self.n_batches += 1
        # the replay cursor advances only AFTER the merge succeeded: if
        # build/merge raises, Spark replays the batch and the cursor
        # still points below it, so the retry is merged, not dropped
        if batch_id is not None:
            self.last_batch_id = int(batch_id)
        if self.sketch is not None:
            self._persist()


def run_stream_accumulation(stream_df: DataFrame, acc:
                            StreamingSketchAccumulator,
                            checkpoint_dir: str | None = None):
    """Start (availableNow) a stream that folds into ``acc`` and wait."""
    writer = stream_df.writeStream.foreachBatch(acc)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return acc
