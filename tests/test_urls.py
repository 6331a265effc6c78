"""URL canonicalization (operators/urls.py)."""

import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.operators import with_canonical_url

CASES = [
    # (input, canonical)
    ("  HTTP://WWW.Example.COM:80/Path/Page?a=1&utm_source=x&b=2#frag  ",
     "http://www.example.com/Path/Page?a=1&b=2"),
    # tabs/newlines: F.trim strips only ' ' — fuzz caught the operator
    # missing tab padding; the trim is regexp \s now
    ("\t https://Tab.Example.com:443/x \n", "https://tab.example.com/x"),
    ("https://Host.com:443/", "https://host.com"),          # default port+root
    ("https://host.com:8443/x", "https://host.com:8443/x"),  # real port kept
    ("http://h.com/?utm_campaign=c", "http://h.com"),       # query emptied
    ("http://h.com/p?fbclid=abc&gclid=d", "http://h.com/p"),
    ("http://h.com/p?", "http://h.com/p"),                  # bare '?'
    ("http://h.com/A/B?Z=1&z=2", "http://h.com/A/B?Z=1&z=2"),  # case kept
    ("http://h.com/", "http://h.com"),                      # root slash
    ("http://h.com/x/", "http://h.com/x/"),                 # deep slash kept
    ("http://h.com:80", "http://h.com"),                    # port, no path
    ("http://h.com:800/x", "http://h.com:800/x"),           # :800 != :80
    ("ftp://H.com/X", "ftp://h.com/X"),                     # any scheme
    ("http://h.com/p?utm_a=1&keep=2&utm_b=3",
     "http://h.com/p?keep=2"),                              # order kept
    ("relative/path?utm_source=x#f", "relative/path"),      # schemeless
    ("http://h.com/p#f?utm_source=1", "http://h.com/p"),    # '?' in fragment
    ("http://h.com/p?a=utm_source", "http://h.com/p?a=utm_source"),
    ("http://h.com/p?UTM_SOURCE=x", "http://h.com/p?UTM_SOURCE=x"),
    (None, None),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(CASES)],
                               "i long, url string")
    got = {r["i"]: r["canonical_url"]
           for r in with_canonical_url(df).collect()}
    for i, (inp, want) in enumerate(CASES):
        assert got[i] == want, f"in={inp!r} want={want!r} got={got[i]!r}"


def test_canonical_url_idempotent(spark):
    """Canonicalization is a projection: canon(canon(u)) == canon(u)."""
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES) if c[0] is not None],
        "i long, url string")
    once = with_canonical_url(df).select(
        "i", F.col("canonical_url").alias("url"))
    twice = with_canonical_url(once)
    mism = twice.where(~F.col("canonical_url").eqNullSafe(F.col("url"))) \
                .count()
    assert mism == 0


def test_canonical_url_merges_dedup_keys(spark):
    """The point of the operator: crawl variants of one page share a
    key, distinct pages stay distinct."""
    variants = [
        "http://Site.com/article?utm_source=feed",
        "http://site.com:80/article#top",
        "  http://site.com/article  ",
    ]
    other = "http://site.com/article2"
    df = spark.createDataFrame([(u,) for u in variants + [other]],
                               "url string")
    keys = [r["canonical_url"] for r in with_canonical_url(df).collect()]
    assert len(set(keys[:3])) == 1
    assert keys[3] not in keys[:3]
    assert df.select(
        F.countDistinct(F.col("url")).alias("raw")).first()["raw"] == 4


def test_canonical_url_is_jvm_only(spark):
    """Whole-stage codegen: the expression must compile without any
    Python eval (no BatchEvalPython / ArrowEvalPython in the plan)."""
    df = spark.range(5).select(
        F.concat(F.lit("HTTP://H.com:80/p"), F.col("id"),
                 F.lit("?utm_source=x&a=1#f")).alias("url"))
    plan = with_canonical_url(df)._jdf.queryExecution().executedPlan() \
                                 .toString()
    assert "EvalPython" not in plan


def test_registrable_domain(spark):
    from bloom_filters_spark.operators import registrable_domain_col
    cases = [
        ("A.B.Example.CO.UK", "example.co.uk"),   # multi-part suffix
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("com", "com"),                            # single label
        ("deep.sub.domain.site.org", "site.org"),
        ("shop.co.jp", "shop.co.jp"),              # registrable itself
        ("192.168.10.1", "192.168.10.1"),          # IPv4 literal
        ("t.co", "t.co"),
        ("x.gov.au", "x.gov.au"),
        ("a.b.com.br", "b.com.br"),
        ("WWW.GOV.UK", "www.gov.uk"),              # suffix-owned host
        ("www.example.com.", "example.com"),       # FQDN trailing dot
        (None, None),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)],
                               "i long, host string")
    got = {r["i"]: r["rd"] for r in
           df.withColumn("rd", registrable_domain_col("host")).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, f"host={h!r} want={want!r} got={got[i]!r}"


def test_cap_per_group(spark):
    """Per-domain document cap: deterministic keep set, rank exposure,
    and pre_reduce parity (the map-side Arrow pre-filter must not
    change the result)."""
    from bloom_filters_spark.operators import cap_per_group
    rows = [("d1", i, 100 - i) for i in range(10)] \
        + [("d2", 100 + i, 50 + i) for i in range(3)] \
        + [("d3", 200, None)]          # NULL order key -> sorts LAST
    df = spark.createDataFrame(rows, "dom string, doc_id long, score long")
    kept = cap_per_group(df, "dom", 2, ["-score", "doc_id"])
    got = sorted((r["dom"], r["doc_id"]) for r in kept.collect())
    # d1: top-2 by score desc = doc_id 0 (100), 1 (99); d2: 102, 101
    assert got == [("d1", 0), ("d1", 1), ("d2", 101), ("d2", 102)] \
        + [("d3", 200)]
    ranked = cap_per_group(df, "dom", 2, ["-score", "doc_id"],
                           rank_col="rk")
    rk = {(r["dom"], r["doc_id"]): r["rk"] for r in ranked.collect()}
    assert rk[("d1", 0)] == 1 and rk[("d1", 1)] == 2
    # pre_reduce parity across adversarial partitioning
    pre = cap_per_group(df.repartition(7), "dom", 2,
                        ["-score", "doc_id"], pre_reduce=True)
    assert sorted((r["dom"], r["doc_id"]) for r in pre.collect()) == got
