"""bloom_filters_spark — a PySpark-native distributed sketch /
approximate-aggregation library.

From-scratch reimplementation of the capabilities of the reference
C++ project Y8ungS8ul/Bloom-Filters (Bloom / counting / invertible /
dynamic Bloom filters, Cuckoo filter, HyperLogLog) re-expressed as
mergeable aggregators over Spark DataFrames, extended with count-min,
KLL, and t-digest, plus the web-scale pipeline operators a training-data
workload needs (dedup, similarity search, text analysis, exact heavy
hitters, IBF table reconciliation, sketch-indexed scan pruning).

Layers:
  kernels/    pure-numpy mergeable sketches (no Spark)
  operators/  Spark aggregation (mapInPandas partials → tree merge),
              probes, dedup, similarity, text stats, collisions
  functions/  sizing math, text normalization
  sources/    deterministic synthetic fixtures (pages, words, users)
  plans/      north-star end-to-end queries
  streaming/  Structured Streaming sketch accumulation
  checkpoint  partial-sketch checkpoint/resume with lineage
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large numpy buffers on the heap instead of per-allocation
    mmaps.

    On virtualized hosts with slow page faults (measured ~400us/page on
    this sandbox's Firecracker VM), glibc's default behavior — mmap any
    allocation >128KB and unmap it on free — makes every fresh numpy
    ufunc output pay a full page-fault storm (~8s per 80MB array,
    repeatedly). Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes large
    buffers come from the brk heap, which stays mapped after free, so
    the fault cost is paid once per process instead of once per batch
    (measured 50-100x on the Bloom/HLL batch kernels).

    Runs in every process that imports this package — the Spark driver
    AND each python UDF worker. mallopt affects only the current
    process; failures are ignored (non-glibc platforms).
    """
    import ctypes
    import os
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        one_gb = 1 << 30
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(one_gb))  # M_MMAP_THRESHOLD
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(one_gb))  # M_TRIM_THRESHOLD
    except Exception:
        pass
    # child processes (JVM -> pyspark daemons) inherit these instead
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))


_tune_malloc()
