"""Sharded Bloom filter — the seen-before design that survives 10^12 keys.

A single Bloom over 10^12 urls at p=0.01 is ~1.2 TB of bits: it cannot
be broadcast, merged on one driver, or even held by one executor. The
scale design (BENCH/BASELINE.md) shards the key space BY HASH RANGE:

  shard(key) = pmod(xxhash64(key), n_shards)

so each shard is an independent, normally-sized Bloom filter over its
slice of the key space, and the collection is a DataFrame
``(shard int, payload binary, n_rows long)`` — a first-class table that
can be written/read as parquet/Iceberg, incrementally rebuilt per
shard, and probed with a co-partitioned join instead of a broadcast.

Build plan: one scan → repartition by shard (the ONLY shuffle of key
hashes; each reducer builds exactly one shard's filter from a
contiguous hash range) → one partial per shard → per-shard merge.
Probe plan: hash incoming keys JVM-side → repartition by shard →
zip each partition with its (tiny) shard payload via a co-partitioned
join → vectorized numpy probe per batch. No filter ever exceeds
shard-sized memory anywhere.

The per-shard sketch is any membership sketch following the aggregator
protocol (Bloom by default; CountingBloom for deletable shards).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels import BloomSketch, CountingBloomSketch, sketch_from_bytes
from ..kernels.bloom import optimal_k, optimal_m
from .agg import hash_col

_SHARD_SCHEMA = "shard int, payload binary, n_rows long"


def counting_shard_factory(p: float = 0.01):
    """Per-shard COUNTING Bloom factory for ``build_sharded`` —
    deletable shards (see ``remove_sharded``), sized exactly like the
    plain-Bloom default from the observed per-shard key count."""
    def make(cap: int) -> CountingBloomSketch:
        m = optimal_m(max(1024, cap), p)
        return CountingBloomSketch(m, optimal_k(m, max(1024, cap)))
    return make


def shard_col(col, n_shards: int, seed: int = 0):
    """JVM-side shard id: pmod(xxhash64(key), n_shards)."""
    return F.pmod(hash_col(col, seed), F.lit(n_shards)).cast("int")


def build_sharded(df: DataFrame, col: str, n_shards: int, *,
                  factory: Callable | None = None, p: float = 0.01,
                  seed: int = 0) -> DataFrame:
    """→ DataFrame(shard, payload, n_rows): one membership sketch per
    hash-range shard.

    ``factory(capacity)`` builds the per-shard sketch; the default is
    ``BloomSketch.from_capacity(capacity, p)`` where capacity is the
    observed per-shard row count (keys of one shard are seen whole by
    construction, so exact sizing needs no estimation pass)."""
    if factory is None:
        factory = lambda cap: BloomSketch.from_capacity(max(1024, cap), p)

    hashed = (df.where(F.col(col).isNotNull())
              .select(hash_col(F.col(col), seed).alias("__h"))
              .withColumn("__shard", F.pmod(F.col("__h"),
                                            F.lit(n_shards)).cast("int"))
              .repartition(n_shards, "__shard"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a partition holds >=1 whole shards (never a partial shard):
        # group in pandas, build one sketch per shard
        shards: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            for s, idx in pdf.groupby("__shard").indices.items():
                shards.setdefault(int(s), []).append(
                    pdf["__h"].to_numpy(dtype=np.int64)[idx])
        if not shards:
            return
        out = {"shard": [], "payload": [], "n_rows": []}
        for s, chunks in shards.items():
            h = np.concatenate(chunks)
            sk = factory(h.size)
            sk.update_hashes(h)
            out["shard"].append(s)
            out["payload"].append(sk.to_bytes())
            out["n_rows"].append(h.size)
        yield pd.DataFrame(out)

    return hashed.mapInPandas(build, schema=_SHARD_SCHEMA)


def remove_sharded(df: DataFrame, col: str, shards_df: DataFrame, *,
                   seed: int = 0) -> DataFrame:
    """→ a NEW shard table with ``df``'s keys removed (decremented).

    Requires counting-Bloom shards (``counting_shard_factory``): plain
    Bloom shards cannot delete. Plan: hash + shard the removal keys,
    aggregate each shard's removal list (one shuffle of the removal
    hashes — the analogue of the build shuffle), join to the shard
    payloads, decrement per shard in one Arrow batch pass. Shards
    without removals pass through untouched."""
    n_shards = shards_df.agg(F.max("shard")).first()[0] + 1
    rem = (df.where(F.col(col).isNotNull())
           .select(hash_col(F.col(col), seed).alias("__h"))
           .withColumn("shard", F.pmod(F.col("__h"),
                                       F.lit(n_shards)).cast("int"))
           .groupBy("shard").agg(F.collect_list("__h").alias("__hs")))
    joined = shards_df.join(rem, "shard", "left")

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ns = [], []
            for payload, hs, n in zip(pdf["payload"], pdf["__hs"],
                                      pdf["n_rows"]):
                sk = sketch_from_bytes(bytes(payload))
                removed = 0
                if hs is not None and len(hs):
                    arr = np.asarray(hs, dtype=np.int64)
                    sk.remove_hashes(arr)
                    removed = arr.size
                payloads.append(sk.to_bytes())
                ns.append(int(n) - removed)
            yield pd.DataFrame({"shard": pdf["shard"],
                                "payload": payloads, "n_rows": ns})

    return joined.mapInPandas(apply, schema=_SHARD_SCHEMA)


def probe_sharded(df: DataFrame, col: str, shards_df: DataFrame, *,
                  seed: int = 0, out_col: str = "seen") -> DataFrame:
    """Membership probe against a sharded filter table.

    Plan: JVM hash + shard id → co-partitioned join with the shard
    payloads (each payload row is KB-MB; at realistic shard counts the
    payload side is small per shard and AQE picks the join strategy) →
    Arrow-batched numpy probe. The full filter is never assembled in
    one place."""
    # shard count comes from the shards table (driver-side max: tiny)
    n_shards = shards_df.agg(F.max("shard")).first()[0] + 1
    hashed = (df.withColumn("__h", hash_col(F.col(col), seed))
              .withColumn("__shard",
                          F.pmod(F.col("__h"),
                                 F.lit(n_shards)).cast("int")))
    joined = hashed.join(shards_df.withColumnRenamed("shard", "__shard")
                         .select("__shard", "payload"),
                         "__shard", "left")
    out_fields = ", ".join(f"`{n}` {t}" for n, t in df.dtypes)
    schema = f"{out_fields}, {out_col} boolean"
    drop_cols = ["__h", "__shard", "payload"]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[bytes, object] = {}
        for pdf in batches:
            res = np.zeros(len(pdf), dtype=bool)
            h = pdf["__h"].to_numpy(dtype=np.int64)
            for payload, idx in pdf.groupby("payload", dropna=True,
                                            sort=False).indices.items():
                key = bytes(payload)
                sk = cache.get(key)
                if sk is None:
                    sk = cache[key] = sketch_from_bytes(key)
                res[idx] = sk.contains_hashes(h[idx])
            out = pdf.drop(columns=drop_cols)
            out[out_col] = res
            yield out

    return joined.mapInPandas(probe, schema=schema)
