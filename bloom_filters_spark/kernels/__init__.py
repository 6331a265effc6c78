"""Pure-numpy sketch kernels (no Spark imports) — unit-testable alone.

All sketches share the aggregator protocol:
  zero (ctor) / update_hashes|update_values (vectorized batch) /
  merge / to_bytes / sketch_from_bytes.
"""

from .base import sketch_from_bytes
from .bloom import BloomSketch, bloom_fpr, optimal_k, optimal_m
from .counting import CountingBloomSketch
from .countmin import CountMinSketch
from .cuckoo import CuckooBank, CuckooFilter
from .hashing import derive_h2, hash64_bytes, km_indices, splitmix64, to_u64
from .hll import HLLSketch
from .invertible import InvertibleBloomSketch
from .kll import KLLSketch
from .multi import MultiSketch
from .misragries import MisraGriesSketch
from .tdigest import TDigest
from .theta import ThetaSketch

__all__ = [
    "BloomSketch", "CountingBloomSketch", "CountMinSketch", "CuckooBank",
    "CuckooFilter", "HLLSketch", "InvertibleBloomSketch", "KLLSketch",
    "MisraGriesSketch", "MultiSketch", "TDigest", "ThetaSketch",
    "bloom_fpr", "optimal_k", "optimal_m", "sketch_from_bytes",
    "hash64_bytes", "km_indices", "splitmix64", "derive_h2", "to_u64",
]
