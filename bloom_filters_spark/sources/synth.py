"""Deterministic synthetic tables for multi-scale (sf-tier) benchmarks.

The driver testdata tops out at sf0.1 (documents 5k / lineitem 600k /
orders 150k / embeddings 2k); the 100 TB scale claims (probe flat in
payload size, reconcile O(d), prune O(selectivity), near-linear dedup)
need a 10x tier to be VISIBLE, so this module generates
schema-compatible tables at any n — outside the read-only testdata.

Same reproducibility law as sources/pages.py: every field is a pure
function of the row id through SplitMix64 streams (no RNG state), so a
tier is byte-identical for any partitioning or executor count, and the
1x and 10x tiers obey the SAME generation law — which is what makes
their timing ratio a scaling measurement rather than a data-shape
difference. Generation runs THROUGH Spark (spark.range → mapInPandas),
so tier size is bounded by the cluster, not the driver.

(The driver's sf0.1 documents use a ~31-word vocabulary; a real corpus
grows vocabulary with size, so these documents draw from a 10k-word
Zipf vocabulary — shingle/posting density stays realistic at 10x.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.hashing import splitmix64

_U64 = np.uint64
VOCAB = 10_000
DUP_FRAC = 0.10       # exact duplicates (copy an earlier doc's text)
NEAR_FRAC = 0.05      # near-duplicates (earlier doc, tail re-drawn)
_LANGS = np.array(["en", "zh", "ru", "de", "fr"])
_LANG_CDF = np.cumsum([0.5, 0.2, 0.12, 0.1, 0.08])
N_SOURCES = 20

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")
# full TPC-H-ish width: the prune-vs-scan claim is only meaningful when
# a full scan pays for realistic row width
LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp")
ORDERS_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
                 "o_totalprice double, o_orderdate timestamp, "
                 "o_orderpriority string")
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())

_VOCAB_CDF = _zipf_cdf(VOCAB, 1.1)
_VOCAB_PA = None


def _vocab_pa():
    """Arrow string array of the vocab table ("t0".."t9999"), built
    once per process (see sources/pages.py: per-word np.char.mod was
    the generator's dominant cost)."""
    global _VOCAB_PA
    if _VOCAB_PA is None:
        import pyarrow as pa
        _VOCAB_PA = pa.array(np.char.mod("t%d", np.arange(VOCAB)))
    return _VOCAB_PA


def _stream(ids: np.ndarray, tag: int) -> np.ndarray:
    return splitmix64(ids.astype(_U64) ^ splitmix64(
        np.full(ids.shape, _U64(tag))))


def _u01(ids: np.ndarray, tag: int) -> np.ndarray:
    return _stream(ids, tag).astype(np.float64) / 2.0 ** 64


def _doc_words(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(flat word-index array, per-doc word counts) for content ids."""
    k = np.clip(np.exp(3.2 + 0.8 * (_u01(cid, 11) * 2 - 1)),
                8, 120).astype(int)
    offsets = np.concatenate([[0], np.cumsum(k)])
    word_pos = (np.arange(int(offsets[-1]), dtype=np.int64)
                - np.repeat(offsets[:-1], k))
    flat_seed = (np.repeat(cid, k).astype(_U64) * _U64(1_000_003)
                 + word_pos.astype(_U64))
    word_idx = np.searchsorted(
        _VOCAB_CDF, _u01(flat_seed.astype(np.int64), 12))
    return word_idx, k


def documents_pdf(ids: np.ndarray) -> pd.DataFrame:
    ids = ids.astype(np.int64)
    u = _u01(ids, 1)
    is_dup = (u < DUP_FRAC) & (ids > 0)
    is_near = (u >= DUP_FRAC) & (u < DUP_FRAC + NEAR_FRAC) & (ids > 0)
    back = (_stream(ids, 2) % _U64(500)).astype(np.int64) + 1
    cid = np.where(is_dup | is_near, np.maximum(0, ids - back), ids)
    # resolve the ancestor CHAIN: a dup/near target must itself be a
    # PURE doc, else the copied text matches nothing actually stored
    # (the ancestor emitted someone else's words) and the effective dup
    # rate silently drops below DUP_FRAC. Pure function of ids: each
    # hop re-derives u/back from the current cid, and cid strictly
    # decreases toward id 0 (pure by construction), so this terminates.
    derived = is_dup | is_near
    while True:
        unresolved = (derived & (cid > 0)
                      & (_u01(cid, 1) < DUP_FRAC + NEAR_FRAC))
        if not unresolved.any():
            break
        hop = (_stream(cid, 2) % _U64(500)).astype(np.int64) + 1
        cid = np.where(unresolved, np.maximum(0, cid - hop), cid)

    import pyarrow as pa
    import pyarrow.compute as pc

    word_idx, k = _doc_words(cid)
    offsets = np.concatenate([[0], np.cumsum(k)])
    # near-dup: re-draw the last ~10% of words from the row's OWN id
    # stream, so the text is ~90% shingle-identical to its ancestor —
    # vectorized as a flat scatter into the word-index array (pinned
    # byte-identical to the scalar per-row loop by
    # test_documents_pdf_vectorized_matches_scalar)
    near_rows = np.flatnonzero(is_near)
    if near_rows.size:
        tails = np.maximum(1, k[near_rows] // 10)
        within = (np.arange(int(tails.sum()), dtype=np.int64)
                  - np.repeat(np.concatenate([[0], np.cumsum(tails[:-1])]),
                              tails))
        flat_pos = np.repeat(offsets[near_rows + 1] - tails, tails) + within
        seeds = np.repeat(ids[near_rows], tails) * 31 + within
        word_idx = word_idx.copy()
        word_idx[flat_pos] = np.searchsorted(_VOCAB_CDF, _u01(seeds, 13))
    flat_words = pa.DictionaryArray.from_arrays(
        pa.array(word_idx, type=pa.int32()), _vocab_pa()).dictionary_decode()
    texts_pa = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()),
                                 flat_words),
        " ")
    lang = _LANGS[np.clip(np.searchsorted(_LANG_CDF, _u01(cid, 3)),
                          0, len(_LANGS) - 1)]
    source = np.char.mod("src%d", (_stream(ids, 4)
                                   % _U64(N_SOURCES)).astype(np.int64))
    # every text byte is single-byte ASCII ("t<digits>" + spaces)
    n_chars = pc.binary_length(texts_pa).to_numpy().astype(np.int64)
    return pd.DataFrame({"doc_id": ids, "text": texts_pa.to_pylist(),
                         "lang": lang, "source": source,
                         "n_chars": n_chars})


_EPOCH_NS = np.datetime64("2026-01-01", "ns")
_FLAGS = np.array(["A", "N", "R"])
_STATUS = np.array(["O", "F"])
_PRIO = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NONE"])


def lineitem_pdf(ids: np.ndarray) -> pd.DataFrame:
    ids = ids.astype(np.int64)
    return pd.DataFrame({
        "l_orderkey": ids // 4,
        "l_partkey": (_stream(ids, 22) % _U64(200_000)).astype(np.int64),
        "l_suppkey": (_stream(ids, 23) % _U64(10_000)).astype(np.int64),
        "l_linenumber": (ids % 4 + 1).astype(np.int32),
        "l_quantity": np.floor(_u01(ids, 24) * 50) + 1,
        "l_extendedprice": np.round(
            900.0 + 104000.0 * _u01(ids, 21) ** 2, 2),
        "l_discount": np.round(_u01(ids, 25) * 0.1, 2),
        "l_tax": np.round(_u01(ids, 26) * 0.08, 2),
        "l_returnflag": _FLAGS[(_stream(ids, 27)
                                % _U64(3)).astype(np.int64)],
        "l_linestatus": _STATUS[(_stream(ids, 28)
                                 % _U64(2)).astype(np.int64)],
        "l_shipdate": pd.Series(_EPOCH_NS + (
            _stream(ids, 29) % _U64(2500)).astype(
            "timedelta64[D]").astype("timedelta64[ns]"))})


def orders_pdf(ids: np.ndarray) -> pd.DataFrame:
    ids = ids.astype(np.int64)
    return pd.DataFrame({
        "o_orderkey": ids,
        "o_custkey": (_stream(ids, 41) % _U64(100_000)).astype(np.int64),
        "o_orderstatus": _STATUS[(_stream(ids, 42)
                                  % _U64(2)).astype(np.int64)],
        "o_totalprice": np.round(
            1000.0 + 400000.0 * _u01(ids, 43) ** 2, 2),
        "o_orderdate": pd.Series(_EPOCH_NS + (
            _stream(ids, 44) % _U64(2500)).astype(
            "timedelta64[D]").astype("timedelta64[ns]")),
        "o_orderpriority": _PRIO[(_stream(ids, 45)
                                  % _U64(5)).astype(np.int64)]})


EMB_DIM = 64
N_CLUSTERS = 16


def embeddings_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Clustered unit vectors: centroid(label) + noise, normalized —
    gives IVF real cluster structure, deterministically."""
    ids = ids.astype(np.int64)
    label = (_stream(ids, 31) % _U64(N_CLUSTERS)).astype(np.int64)
    cent_seed = (np.repeat(label, EMB_DIM).astype(_U64) * _U64(7919)
                 + np.tile(np.arange(EMB_DIM, dtype=np.int64),
                           ids.size).astype(_U64))
    cent = (_u01(cent_seed.astype(np.int64), 32) * 2 - 1).reshape(
        ids.size, EMB_DIM)
    noise_seed = (np.repeat(ids, EMB_DIM).astype(_U64) * _U64(104729)
                  + np.tile(np.arange(EMB_DIM, dtype=np.int64),
                            ids.size).astype(_U64))
    noise = (_u01(noise_seed.astype(np.int64), 33) * 2 - 1).reshape(
        ids.size, EMB_DIM) * 0.3
    v = cent + noise
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v32 = v.astype(np.float32)
    return pd.DataFrame({"vec_id": ids,
                         "embedding": [v32[i] for i in range(ids.size)],
                         "label": label.astype(np.int32)})


def _generate(spark: SparkSession, n: int, pdf_fn, schema: str,
              partitions: int | None = None) -> DataFrame:
    rng = spark.range(0, n, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            yield pdf_fn(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, schema=schema)


def generate_documents(spark, n, partitions=None) -> DataFrame:
    return _generate(spark, n, documents_pdf, DOCS_SCHEMA, partitions)


def generate_lineitem(spark, n, partitions=None) -> DataFrame:
    return _generate(spark, n, lineitem_pdf, LINEITEM_SCHEMA, partitions)


def generate_orders(spark, n, partitions=None) -> DataFrame:
    return _generate(spark, n, orders_pdf, ORDERS_SCHEMA, partitions)


def generate_embeddings(spark, n, partitions=None) -> DataFrame:
    return _generate(spark, n, embeddings_pdf, EMB_SCHEMA, partitions)


def stage_tier(spark: SparkSession, base_dir: str, scale: float,
               *, docs: int = 5000, lineitem: int = 600_000,
               orders: int = 150_000, embeddings: int = 2000) -> str:
    """Write one tier (default 1x = the sf0.1 row counts) under
    ``base_dir/t{scale}x`` with the bench table names; returns the dir.
    Idempotent via a _DONE marker."""
    import os
    d = os.path.join(base_dir, f"t{scale:g}x")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    for name, gen, n in [
            ("documents", generate_documents, docs),
            ("lineitem", generate_lineitem, lineitem),
            ("orders", generate_orders, orders),
            ("embeddings", generate_embeddings, embeddings)]:
        rows = max(1, int(n * scale))
        gen(spark, rows).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return d
