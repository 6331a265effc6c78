from .accumulate import StreamingSketchAccumulator, run_stream_accumulation
from .windowed import run_windowed_to_memory, sketch_per_window

__all__ = ["StreamingSketchAccumulator", "run_stream_accumulation",
           "run_windowed_to_memory", "sketch_per_window"]
