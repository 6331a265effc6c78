from .accumulate import StreamingSketchAccumulator, run_stream_accumulation
from .dedup import StreamingShardedDedup, run_stream_dedup
from .rollup import read_stream_cube, run_stream_rollup
from .windowed import (run_windowed_foreach_batch, run_windowed_to_memory,
                       sketch_per_window, topk_per_window)

__all__ = ["StreamingSketchAccumulator", "run_stream_accumulation",
           "StreamingShardedDedup", "run_stream_dedup",
           "read_stream_cube", "run_stream_rollup",
           "run_windowed_foreach_batch", "run_windowed_to_memory",
           "sketch_per_window", "topk_per_window"]
