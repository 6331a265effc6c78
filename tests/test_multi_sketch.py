"""MultiSketch (one-pass composite aggregator) + url-only fixture."""

import numpy as np

from bloom_filters_spark.kernels import (
    BloomSketch, CountMinSketch, HLLSketch, MultiSketch, sketch_from_bytes)
from bloom_filters_spark.sources.pages import generate_pdf, generate_urls_pdf


def _mk():
    return MultiSketch([HLLSketch(12), CountMinSketch(4, 1024),
                        BloomSketch.from_capacity(10_000, 0.01)])


def _hashes(seed, n=5000):
    return np.random.default_rng(seed).integers(
        -2**63, 2**63 - 1, size=n, dtype=np.int64)


def test_multi_equals_individual_builds():
    h = _hashes(1)
    multi = _mk()
    multi.update_hashes(h)
    hll, cms, bf = HLLSketch(12), CountMinSketch(4, 1024), \
        BloomSketch.from_capacity(10_000, 0.01)
    for s in (hll, cms, bf):
        s.update_hashes(h)
    assert multi[0].to_bytes() == hll.to_bytes()
    assert multi[1].to_bytes() == cms.to_bytes()
    assert multi[2].to_bytes() == bf.to_bytes()


def test_multi_merge_associative_and_serde():
    parts = []
    for seed in range(4):
        m = _mk()
        m.update_hashes(_hashes(seed))
        parts.append(m)
    fwd = parts[0].merge(parts[1]).merge(parts[2]).merge(parts[3])
    rev = parts[3].merge(parts[2].merge(parts[1].merge(parts[0])))
    assert fwd.to_bytes() == rev.to_bytes()
    rt = sketch_from_bytes(fwd.to_bytes())
    assert isinstance(rt, MultiSketch)
    assert rt.to_bytes() == fwd.to_bytes()
    assert rt[0].estimate() == fwd[0].estimate()


def test_generate_urls_matches_full_pages():
    ids = np.arange(0, 3000, dtype=np.int64)
    full = generate_pdf(ids)
    urls = generate_urls_pdf(ids)
    assert list(urls["url"]) == list(full["url"])
