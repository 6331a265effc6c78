"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH, SimHash (pigeonhole-complete
banding), exact n-gram Jaccard (inverted-index join), and
embedding-cosine near-dup. Scale notes per operator:

- exact: groupBy(text-hash) — one shuffle on a 64-bit key, never on the
  text payload; window keep-first avoids a second scan.
- minhash-lsh: per-token base hash is JVM xxhash64; the k-permutation
  min is a vectorized numpy matrix op; only (band, bucket) keys shuffle.
  Candidate verification joins token SETS (array_intersect) — exact
  jaccard, so the pipeline has no false positives; recall is the
  standard LSH s-curve.
- simhash: 64-bit signature; banding into c chunks guarantees (by
  pigeonhole) recall 1.0 for pairs within hamming distance < c.
- ngram-jaccard: exact all-pairs via inverted index (explode distinct
  shingles → self-join on shingle → per-pair intersection counts);
  the join key is the shingle hash, cardinality-bounded by document
  frequency; a df_cut drops ubiquitous shingles (the classic scale
  guard — cites itself in BENCH).
- embedding: exact cosine over a self-join (small dims) or LSH
  hyperplane buckets (scale path in similarity.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .textstats import tokens_col

_MERSENNE = (1 << 61) - 1


def shingles_col(text_col: str, n: int = 1):
    """array<string> of distinct word n-gram shingles (n=1 → tokens).

    Shingling is what makes near-dup detection non-degenerate on
    natural text: token SETS from a small vocabulary make most document
    pairs similar (candidate generation goes quadratic), while n-gram
    shingles are order-sensitive and sparse, so only true near-dups
    collide."""
    toks = F.array_distinct(tokens_col(text_col))
    if n <= 1:
        return toks
    raw = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.size(raw) - n)
    # Empty docs yield an EMPTY shingle array (consistent with the n=1
    # path, which drops them): otherwise two empty docs would share the
    # '' whole-text shingle and compare as jaccard-1.0 near-dups.
    # Short-but-nonempty docs keep the whole-text shingle.
    return F.when(F.size(raw) >= n,
                  F.array_distinct(F.transform(idx, lambda i: F.array_join(
                      F.slice(raw, i + 1, n), " ")))
                  ).when(F.size(raw) > 0,
                         F.array(F.array_join(raw, " "))
                  ).otherwise(F.array().cast("array<string>"))


# ----------------------------------------------------------------- exact
def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep-first exact dedup: one row per distinct text, smallest id wins.
    The shuffle key is xxhash64(text), not the text itself."""
    w = Window.partitionBy(F.xxhash64(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1").drop("__rn"))


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(text-hash group, n_dups, min_id) for groups with >1 member."""
    return (df.groupBy(F.xxhash64(F.col(text_col)).alias("text_hash"))
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            .where("n_dups > 1"))


# ------------------------------------------------------------ minhash lsh
def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 64, bands: int = 16,
                       seed: int = 0, shingle: int = 1) -> DataFrame:
    """→ (id, band, bucket): LSH band buckets from k-permutation MinHash.

    Token base hashes are computed JVM-side (xxhash64 over exploded
    shingles); the (a·h+b mod p) permutation matrix and per-band fold
    run vectorized in one applyInPandas over (id, [hashes])."""
    rows = num_perm // bands
    assert bands * rows == num_perm, "bands must divide num_perm"

    exploded = (df.select(F.col(id_col).alias("__id"),
                          F.explode(shingles_col(text_col, shingle))
                          .alias("__tok"))
                .select("__id", F.xxhash64("__tok", F.lit(seed))
                        .alias("__h")))
    grouped = exploded.groupBy("__id").agg(
        F.collect_list("__h").alias("__hs"))

    rng = np.random.default_rng(seed + 1)
    A = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    B = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bnd, bkt = [], [], []
            for _id, hs in zip(pdf["__id"], pdf["__hs"]):
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                h = (h % np.uint64(_MERSENNE)).astype(np.uint64)
                # (num_perm, n) permutations in uint64 mod Mersenne prime
                perm = (A.astype(np.uint64)[:, None] * h[None, :]
                        + B.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
                mins = perm.min(axis=1)                     # (num_perm,)
                folded = mins.reshape(bands, rows)
                # fold each band's rows into one bucket id
                bucket = folded[:, 0].copy()
                for r in range(1, rows):
                    bucket = bucket * np.uint64(1_000_003) + folded[:, r]
                ids.extend([_id] * bands)
                bnd.extend(range(bands))
                bkt.extend(bucket.view(np.int64).tolist())
            yield pd.DataFrame({"id": ids, "band": bnd, "bucket": bkt})

    return grouped.mapInPandas(sig, schema="id long, band int, bucket long")


def lsh_candidate_pairs(sig_df: DataFrame) -> DataFrame:
    """Distinct candidate pairs (id1 < id2) sharing any band bucket."""
    a = sig_df.alias("a")
    b = sig_df.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
            .distinct())


def verify_jaccard(df: DataFrame, pairs: DataFrame, id_col: str,
                   text_col: str, threshold: float,
                   shingle: int = 1) -> DataFrame:
    """Exact shingle-set jaccard on candidate pairs → no false positives."""
    toks = df.select(F.col(id_col).alias("vid"),
                     shingles_col(text_col, shingle).alias("vtoks"))
    j = (pairs
         .join(toks.withColumnRenamed("vid", "id1")
               .withColumnRenamed("vtoks", "t1"), "id1")
         .join(toks.withColumnRenamed("vid", "id2")
               .withColumnRenamed("vtoks", "t2"), "id2"))
    inter = F.size(F.array_intersect("t1", "t2")).cast("double")
    union = F.size(F.array_union("t1", "t2"))
    return (j.withColumn("jaccard", F.round(inter / union, 6))
            .where(F.col("jaccard") >= threshold)
            .select("id1", "id2", "jaccard"))


def neardup_minhash(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", threshold: float = 0.8,
                    num_perm: int = 64, bands: int = 16,
                    seed: int = 0, shingle: int = 1) -> DataFrame:
    """MinHash-LSH near-dup pairs, exactly verified. → (id1, id2, jaccard).
    Candidate generation and exact verification use the SAME shingling."""
    sig = minhash_signatures(df, id_col, text_col, num_perm, bands, seed,
                             shingle=shingle)
    cands = lsh_candidate_pairs(sig)
    return verify_jaccard(df, cands, id_col, text_col, threshold,
                          shingle=shingle)


# ---------------------------------------------------------------- simhash
def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       seed: int = 0) -> DataFrame:
    """64-bit SimHash per doc from JVM token hashes + numpy bit votes."""
    exploded = (df.select(F.col(id_col).alias("__id"),
                          F.explode(tokens_col(text_col)).alias("__tok"))
                .select("__id", F.xxhash64("__tok", F.lit(seed))
                        .alias("__h")))
    grouped = exploded.groupBy("__id").agg(F.collect_list("__h").alias("__hs"))

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for hs in pdf["__hs"]:
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sig_bits = np.uint64(0)
                for b in np.flatnonzero(votes > 0):
                    sig_bits |= np.uint64(1) << np.uint64(b)
                out.append(np.int64(sig_bits.astype(np.uint64).view(np.int64)))
            yield pd.DataFrame({"id": pdf["__id"], "simhash": out})

    return grouped.mapInPandas(sig, schema="id long, simhash long")


def neardup_simhash(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", max_hamming: int = 7,
                    chunks: int = 8, seed: int = 0) -> DataFrame:
    """SimHash near-dup pairs within ``max_hamming`` bits.

    Banding into ``chunks`` equal bit-chunks is pigeonhole-COMPLETE for
    hamming < chunks: any qualifying pair shares at least one exact
    chunk, so recall is 1.0 (unlike MinHash-LSH). Verification computes
    the exact hamming distance with F.bit_count (JVM-side)."""
    assert max_hamming < chunks <= 64 and 64 % chunks == 0
    width = 64 // chunks
    sig = simhash_signatures(df, id_col, text_col, seed)
    parts = sig.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned(F.col("simhash"), c * width)
                     .bitwiseAND(F.lit((1 << width) - 1)).alias("val"))
            for c in range(chunks)])).alias("b")
    ).select("id", "simhash", F.col("b.chunk"), F.col("b.val"))
    a, b = parts.alias("a"), parts.alias("b")
    cands = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.val") == F.col("b.val"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                     F.col("a.simhash").alias("s1"),
                     F.col("b.simhash").alias("s2"))
             .distinct())
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (cands.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id1", "id2", "hamming"))


# ------------------------------------------------------ exact ngram jaccard
def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 1,
                        threshold: float = 0.5,
                        df_cut: int | None = None) -> DataFrame:
    """EXACT jaccard ≥ threshold pairs via inverted-index self-join.

    explode distinct n-gram shingles → join on shingle hash → per-pair
    intersection count → jaccard from per-doc set sizes. ``df_cut``
    drops shingles appearing in more than df_cut docs (stopword guard:
    bounds the self-join blowup at scale; dropped shingles can only
    LOWER similarity, so with df_cut the result is a superset filter —
    leave None for exact semantics)."""
    base = df.select(F.col(id_col).alias("id"),
                     shingles_col(text_col, n).alias("sh"))
    sizes = base.select("id", F.size("sh").alias("sz"))
    inv = base.select("id", F.explode("sh").alias("s")) \
              .select("id", F.xxhash64("s").alias("sh_h"))
    if df_cut is not None:
        freq = inv.groupBy("sh_h").count().where(F.col("count") <= df_cut)
        inv = inv.join(freq.select("sh_h"), "sh_h")
    a, b = inv.alias("a"), inv.alias("b")
    inter = (a.join(b, (F.col("a.sh_h") == F.col("b.sh_h"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
             .agg(F.count("*").alias("c")))
    out = (inter
           .join(sizes.withColumnRenamed("id", "id1")
                 .withColumnRenamed("sz", "sz1"), "id1")
           .join(sizes.withColumnRenamed("id", "id2")
                 .withColumnRenamed("sz", "sz2"), "id2")
           .withColumn("jaccard", F.round(
               F.col("c") / (F.col("sz1") + F.col("sz2") - F.col("c")), 6))
           .where(F.col("jaccard") >= threshold)
           .select("id1", "id2", "jaccard"))
    return out


# ------------------------------------------------------- embedding cosine
def cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 threshold: float = 0.95) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id1 < id2, cos ≥ t).

    Dot products via F.zip_with + F.aggregate — stays JVM-side. This is
    the O(n²) baseline; the scale path is similarity.ann_lsh buckets."""
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v"),
                     norm.alias("nrm")).where(F.col("nrm") > 0)
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .withColumn("cosine", F.round(
                dot / (F.col("a.nrm") * F.col("b.nrm")), 6))
            .where(F.col("cosine") >= threshold)
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                    "cosine"))
