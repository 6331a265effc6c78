"""Deterministic sampling & splitting for training-data pipelines.

Everything here is CONTENT-ADDRESSED (hash-of-key based), never
`rand()`-based: a row's split/sample membership is a pure function of
its key and the seed, so results are reproducible across runs,
partitionings, cluster sizes, and retries — the property a training
pipeline needs (the same doc must never hop between train and val),
and what makes these operators exactly SQL-checkable.

- ``hash_split``: fractional train/val/test splits by hash bucket.
- ``deterministic_sample``: keep a uniform ~fraction of rows.
- ``stratified_take``: exactly n rows per group, chosen by hash order
  (window rank over xxhash64 — a deterministic "random" n-per-group).
- ``weighted_sample``: exactly k rows, weighted WITHOUT replacement
  (Efraimidis–Spirakis A-ES with a content-addressed uniform draw) —
  "sample the best documents proportionally to quality/length".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def _bucket(key_col, seed: int):
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                  F.lit(_BUCKETS))


def hash_split(df: DataFrame, key_col: str, fractions: dict[str, float],
               *, seed: int = 0,
               out_col: str = "split") -> DataFrame:
    """Label each row with a split name by hash bucket.

    ``fractions`` maps name → fraction (must sum to ≤ 1; remainder
    falls into the LAST listed split). A key always lands in the same
    split for a given seed, regardless of data layout."""
    total = sum(fractions.values())
    assert 0 < total <= 1.0 + 1e-9, "fractions must sum to <= 1"
    b = _bucket(key_col, seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = b < int(acc * _BUCKETS)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         *, seed: int = 0) -> DataFrame:
    """Keep a uniform ~``fraction`` of rows, content-addressed: the
    same keys are kept on every run / layout / cluster size."""
    assert 0 < fraction <= 1.0
    return df.where(_bucket(key_col, seed) < int(fraction * _BUCKETS))


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    k: int, *, seed: int = 0) -> DataFrame:
    """Exactly ``min(k, n)`` rows, weighted WITHOUT replacement —
    Efraimidis–Spirakis A-ES (2006): each key draws u ∈ (0, 1] and the
    k LARGEST u^(1/w) win, equivalently the k smallest −ln(u)/w (an
    Exp(rate=w) draw per row), which is the form used here.

    The uniform draw is CONTENT-ADDRESSED like everything in this
    module: u is built from the first 52 bits of md5(key "#" seed) —
    52 so the integer is exact in a double — making membership a pure
    function of (key, weight, seed): reproducible across layouts,
    cluster sizes, and retries, and exactly recomputable by an
    independent SQL engine (the DuckDB oracle re-derives the same u).

    Scale shape: the scoring is pure JVM expression work and the
    selection is ``orderBy(score).limit(k)`` — Spark plans a
    per-partition top-k feeding one driver-side merge of P×k rows
    (TakeOrderedAndProject), never a global sort.

    Rows with NULL, NaN, or non-positive weight are excluded (zero
    weight = never sampled, the A-ES limit; NaN would otherwise pass
    Spark's ``> 0`` under its NaN-greatest ordering), and so are rows
    with a NULL key: a NULL key has no content address — its md5 draw
    is NULL, its score is NULL, and Spark's ascending sort puts NULLs
    FIRST, so NULL-key rows would otherwise displace every real row
    from the sample (found by fuzzing). Scaling every
    weight by a constant leaves the selection unchanged (monotone
    transform of the order). Score ties (e.g. two +inf weights, or a
    52-bit u collision within a weight class at ~2^26-row scale) are
    broken by the key so the selection stays layout-independent.
    """
    assert k > 0
    assert "__ws" not in df.columns, "reserved column name __ws"
    w = F.col(weight_col).cast("double")
    u = (F.conv(F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"),
                           F.lit(f"#{seed}"))), 1, 13),
         16, 10).cast("double") + F.lit(1.0)) / F.lit(float(1 << 52))
    score = -F.log(u) / w
    return (df.where(F.col(key_col).isNotNull()
                     & w.isNotNull() & ~F.isnan(w) & (w > 0))
            .withColumn("__ws", score)
            .orderBy("__ws", F.col(key_col)).limit(k)
            .drop("__ws"))


def stratified_take(df: DataFrame, group_cols: list[str], n: int, *,
                    key_col: str, seed: int = 0) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by hash order
    of ``key_col`` — a deterministic per-group random sample (window
    rank over xxhash64; tie-broken by the key itself)."""
    assert "__rk" not in df.columns, "reserved column name __rk"
    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64(F.col(key_col), F.lit(seed)), F.col(key_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n).drop("__rk"))


def cap_per_group(df: DataFrame, group_cols, n: int, order_by, *,
                  rank_col: str | None = None,
                  pre_reduce: bool = False) -> DataFrame:
    """Keep at most ``n`` rows per group under a DETERMINISTIC order —
    the per-domain document cap of corpus curation ("at most N pages
    per registrable domain", Gopher/FineWeb-style), and the generic
    grouped top-n (`tokens_topk_by_lang` is exactly this operator).

    ``order_by``: column-name strings, ``"-name"`` for descending; it
    must be a total order (include a unique tiebreak column) or the
    kept set depends on partition layout. ``rank_col`` optionally
    exposes the 1-based within-group rank.

    Plan: one shuffle on the group columns + a window row_number —
    the same cost class as any grouped aggregate. For a HOT group
    (one domain owning a large share of the crawl) all of its rows
    shuffle to one task first; ``pre_reduce=True`` inserts a
    map-side Arrow-batch pre-filter (each batch keeps only its own
    first ``n`` rows per group — sound because the group's global
    first-n under a fixed total order survives every batch-local
    first-n cut), so at most n rows per group PER BATCH reach the
    shuffle. That caps straggler input at n x n_batches instead of
    the group's row count; the tradeoff is one Python/Arrow pass
    over the scan, so leave it off unless the cap is the bottleneck.
    """
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    names = [c.lstrip("-") for c in order]
    ascending = [not c.startswith("-") for c in order]
    src = df
    if pre_reduce:
        def head_n_sorted(batches):
            for pdf in batches:
                if len(pdf):
                    yield (pdf.sort_values(names, ascending=ascending,
                                           kind="mergesort")
                           .groupby(gcols, dropna=False, sort=False)
                           .head(n))

        src = df.mapInPandas(head_n_sorted, schema=df.schema)
    # NULLs LAST in both directions: matches pandas sort_values'
    # na_position="last", so the batch-local pre-cut and the final
    # window agree on the order even when an order key is NULL
    w = Window.partitionBy(*gcols).orderBy(
        *[F.col(nm).asc_nulls_last() if asc
          else F.col(nm).desc_nulls_last()
          for nm, asc in zip(names, ascending)])
    assert "__rn" not in df.columns, "reserved column __rn present"
    out = (src.withColumn("__rn", F.row_number().over(w))
           .where(F.col("__rn") <= n))
    if rank_col is not None:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")
