"""bloom_filters_spark — a PySpark-native distributed sketch /
approximate-aggregation library.

From-scratch reimplementation of the capabilities of the reference
C++ project Y8ungS8ul/Bloom-Filters (Bloom / counting / invertible /
dynamic Bloom filters, Cuckoo filter, HyperLogLog) re-expressed as
mergeable aggregators over Spark DataFrames, extended with count-min,
KLL, and t-digest, plus the web-scale pipeline operators a training-data
workload needs (dedup, similarity search, text analysis).

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
