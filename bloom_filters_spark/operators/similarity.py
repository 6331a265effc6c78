"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. Queries are broadcast; the
  dot product stays JVM-side (zip_with + aggregate); ranking is a
  window over (query, -cosine, id) — deterministic tie-break.
- LSH (random hyperplane) buckets: the scale path. Signatures come from
  a seeded numpy projection matrix inside one applyInPandas; candidate
  generation joins on (table, bucket) and only candidates get exact
  re-ranking. At 100 TB the bucket join replaces the O(n·q) cross
  product with |bucket|-bounded work per query.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _cosine(av, bv):
    dot = F.aggregate(F.zip_with(av, bv,
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(av, F.lit(0.0),
                            lambda a, x: a + x.cast("double") * x))
    nb = F.sqrt(F.aggregate(bv, F.lit(0.0),
                            lambda a, x: a + x.cast("double") * x))
    return dot / (na * nb)


def ann_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        qid_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query. → (query_id, neighbor_id, rank,
    cosine). Queries broadcast → no shuffle of the corpus."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    q = queries.select(F.col(qid_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    joined = c.crossJoin(F.broadcast(q))
    scored = joined.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("cv"), F.col("qv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def hyperplane_signatures(df: DataFrame, dim: int, *, id_col: str = "vec_id",
                          vec_col: str = "embedding", n_planes: int = 16,
                          n_tables: int = 4, seed: int = 0) -> DataFrame:
    """→ (id, table, bucket): sign-pattern buckets from seeded random
    hyperplanes; ``n_tables`` independent tables trade memory for recall."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack([np.asarray(v, dtype=np.float64)
                             for v in pdf["__v"]])
            ids, tbl, bkt = [], [], []
            for t in range(n_tables):
                proj = vecs @ planes[t].T                   # (n, n_planes)
                bits = (proj > 0).astype(np.uint64)
                bucket = np.zeros(len(pdf), dtype=np.uint64)
                for p in range(n_planes):
                    bucket = (bucket << np.uint64(1)) | bits[:, p]
                ids.extend(pdf["__id"].tolist())
                tbl.extend([t] * len(pdf))
                bkt.extend(bucket.view(np.int64).tolist())
            yield pd.DataFrame({"id": ids, "table": tbl, "bucket": bkt})

    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    return base.mapInPandas(sig, schema="id long, table int, bucket long")


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                 *, id_col: str = "vec_id", vec_col: str = "embedding",
                 qid_col: str = "query_id", n_planes: int = 12,
                 n_tables: int = 6, seed: int = 0) -> DataFrame:
    """Approximate top-k: hyperplane-bucket candidates → exact re-rank.
    Recall is tunable via (n_planes, n_tables); rank/cosine of returned
    rows are EXACT (verification is exact), only coverage is approximate."""
    csig = hyperplane_signatures(corpus, dim, id_col=id_col, vec_col=vec_col,
                                 n_planes=n_planes, n_tables=n_tables,
                                 seed=seed)
    qsig = hyperplane_signatures(queries, dim, id_col=qid_col,
                                 vec_col=vec_col, n_planes=n_planes,
                                 n_tables=n_tables, seed=seed)
    cands = (csig.alias("c").join(
        qsig.alias("q"),
        (F.col("c.table") == F.col("q.table"))
        & (F.col("c.bucket") == F.col("q.bucket")))
        .select(F.col("q.id").alias("query_id"),
                F.col("c.id").alias("neighbor_id"))
        .distinct())
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    q = queries.select(F.col(qid_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    scored = (cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
              .select("query_id", "neighbor_id",
                      F.round(_cosine(F.col("cv"), F.col("qv")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))
