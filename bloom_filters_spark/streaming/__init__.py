from .accumulate import StreamingSketchAccumulator, run_stream_accumulation

__all__ = ["StreamingSketchAccumulator", "run_stream_accumulation"]
