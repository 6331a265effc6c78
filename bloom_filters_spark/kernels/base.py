"""Sketch serialization protocol.

Every sketch is an algebraic aggregator (commutative monoid unless noted):
``zero(params) → update_hashes/update_values(batch) → merge → finalize``,
with ``to_bytes()/from_bytes()`` for carrying partials in a BinaryType
DataFrame column. Payload layout: a JSON header (kind + params), a NUL
byte, then the raw little-endian numpy buffer(s).

This is the Spark-native reshaping of the reference's in-place mutable
filters (e.g. Bloom_project/src/core/BloomFilter.cpp:17-28): per-partition
partials + associative merge instead of a mutex-guarded shared object
(Bloom_project/src/core/Bloom_project.cpp:3910-3933).
"""

from __future__ import annotations

import json

import numpy as np

_REGISTRY: dict[str, type] = {}


def register(kind: str):
    def deco(cls):
        cls.KIND = kind
        _REGISTRY[kind] = cls
        return cls
    return deco


def pack(kind: str, params: dict, *buffers: np.ndarray) -> bytes:
    header = {"kind": kind, "params": params,
              "bufs": [[b.dtype.str, list(b.shape)] for b in buffers]}
    out = [json.dumps(header, separators=(",", ":")).encode("utf-8"), b"\x00"]
    for b in buffers:
        out.append(np.ascontiguousarray(b).tobytes())
    return b"".join(out)


def unpack(data: bytes):
    """→ (kind, params, [buffers])."""
    sep = data.index(0)
    header = json.loads(data[:sep].decode("utf-8"))
    offset = sep + 1
    bufs = []
    for dtype_str, shape in header["bufs"]:
        dt = np.dtype(dtype_str)
        n = int(np.prod(shape)) if shape else 1
        nbytes = dt.itemsize * n
        arr = np.frombuffer(data[offset:offset + nbytes], dtype=dt).reshape(shape)
        bufs.append(arr.copy())  # writable
        offset += nbytes
    return header["kind"], header["params"], bufs


def sketch_from_bytes(data: bytes):
    kind, params, bufs = unpack(data)
    cls = _REGISTRY[kind]
    return cls._from_state(params, bufs)
