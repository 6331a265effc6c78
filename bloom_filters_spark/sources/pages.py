"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
  (url string, warc_ts timestamp, html binary, text string, lang string)

Generation per FIXTURES.md §1, fully content-addressed: every field is a
pure function of a 64-bit row id through SplitMix64 streams — NO RNG
state — so the table is identical for any partitioning, any executor
count, and any generation order (the reproducibility rule the reference
violates with rand(), Bloom_project/src/core/Utils.cpp:15-19).

- hosts: Zipf(s≈1.2) over H synthetic hosts → the host-level skew the
  north_rule's salting exists to defeat;
- ~10% duplicate rows: a duplicate's content id points at an earlier
  row, so duplicate urls carry byte-identical text (seen-before ground
  truth + per-url text invariant);
- html is built FROM text with the fixed template that
  functions/textnorm.extract_text inverts exactly;
- generated THROUGH Spark (spark.range → mapInPandas), so fixture scale
  is bounded by the cluster, not the driver.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.hashing import splitmix64

_U64 = np.uint64
N_HOSTS = 1000
ZIPF_S = 1.2
VOCAB = 10_000
DUP_FRAC = 0.10
_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")
_LANGS = np.array(["en", "ru", "de", "fr", "es"])
_LANG_CDF = np.cumsum([0.5, 0.2, 0.12, 0.1, 0.08])


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())

_HOST_CDF = _zipf_cdf(N_HOSTS, ZIPF_S)
_VOCAB_CDF = _zipf_cdf(VOCAB, 1.1)


def _stream(ids: np.ndarray, tag: int) -> np.ndarray:
    """Independent uint64 stream per (row id, tag)."""
    return splitmix64(ids.astype(_U64) ^ splitmix64(
        np.full(ids.shape, _U64(tag))))


def _u01(ids: np.ndarray, tag: int) -> np.ndarray:
    return _stream(ids, tag).astype(np.float64) / 2.0 ** 64


def generate_urls_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Vectorized url-only batch (same urls as generate_pdf, none of
    the text/html cost) — for url-sketch benchmarks at large n."""
    ids = ids.astype(np.int64)
    is_dup = (_u01(ids, 1) < DUP_FRAC) & (ids > 0)
    back = (_stream(ids, 2) % _U64(1000)).astype(np.int64) + 1
    cid = np.where(is_dup, np.maximum(0, ids - back), ids)
    host_rank = np.searchsorted(_HOST_CDF, _u01(cid, 3))
    host_str = np.char.mod("https://host%05d.example/p", host_rank)
    urls = np.char.add(host_str, cid.astype("U"))
    return pd.DataFrame({"url": urls})


def generate_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Vectorized page batch for an int64 id array."""
    ids = ids.astype(np.int64)
    # duplicates: content id points at an earlier row
    is_dup = (_u01(ids, 1) < DUP_FRAC) & (ids > 0)
    back = (_stream(ids, 2) % _U64(1000)).astype(np.int64) + 1
    cid = np.where(is_dup, np.maximum(0, ids - back), ids)

    host_rank = np.searchsorted(_HOST_CDF, _u01(cid, 3))
    # path = content id → url↔content bijection: the same url can never
    # carry two different texts (the per-url invariant's precondition)
    path = cid.astype(np.int64)
    # text: k words, k ~ seeded lognormal clipped to [5, 500]
    k = np.clip(np.exp(3.0 + 1.0 * (_u01(cid, 5) * 2 - 1)), 5, 500).astype(int)
    offsets = np.concatenate([[0], np.cumsum(k)])
    flat_seed = np.repeat(cid, k) * _U64(1_000_003) + np.concatenate(
        [np.arange(n, dtype=np.int64) for n in k]).astype(_U64)
    word_idx = np.searchsorted(_VOCAB_CDF, _u01(flat_seed.astype(np.int64), 6))

    # vectorized string assembly: per-word strings come from one C-level
    # np.char.mod; per-row joins slice the flat array (no per-word Python)
    flat_words = np.char.mod("w%d", word_idx)
    host_str = np.char.mod("https://host%05d.example/p", host_rank)
    urls_arr = np.char.add(host_str, path.astype("U"))
    urls, texts, htmls = [], [], []
    join = " ".join
    for i in range(ids.size):
        text = join(flat_words[offsets[i]:offsets[i + 1]])
        url = urls_arr[i]
        html = (b"<html><head><title>" + url.encode()
                + b"</title></head><body><p>"
                + text.encode() + b"</p></body></html>")
        urls.append(url)
        texts.append(text)
        htmls.append(html)
    lang_pick = np.searchsorted(_LANG_CDF, _u01(cid, 7))
    langs = _LANGS[np.clip(lang_pick, 0, len(_LANGS) - 1)]
    ts = [(_EPOCH + dt.timedelta(seconds=int(i % (30 * 86400))))
          .replace(tzinfo=None) for i in ids]
    return pd.DataFrame({"url": urls, "warc_ts": ts, "html": htmls,
                         "text": texts, "lang": langs})


def generate_pages(spark: SparkSession, n: int,
                   partitions: int | None = None) -> DataFrame:
    rng = spark.range(0, n, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            yield generate_pdf(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def generate_urls(spark: SparkSession, n: int,
                  partitions: int | None = None) -> DataFrame:
    """url column only — identical url stream to generate_pages."""
    rng = spark.range(0, n, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            yield generate_urls_pdf(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, schema="url string")
