"""URL canonicalization — the key-normalization step in front of url
dedup / seen-before at crawl scale.

Two crawls of the same page rarely present byte-identical urls
(fragment anchors, tracking parameters, default ports, host case), so
url-keyed exact dedup under-merges unless keys are canonicalized
first. No reference counterpart (the reference keys raw CSV lines);
rules follow RFC 3986 §6 normalization practice plus the
tracking-parameter strip every production crawler applies.

Everything here is ONE pure-JVM column expression (regexp / split /
filter / concat — whole-stage codegen, no Python, no UDF), so
canonicalization rides the scan for free at any scale.

Rules applied by :func:`canonical_url_col`, in order:

1. trim surrounding ASCII whitespace (spaces, tabs, newlines — not
   just ' ' as ``F.trim`` would);
2. drop the fragment (``#...`` — never sent to the server);
3. lowercase the scheme and authority (host) — path and query stay
   case-sensitive per RFC 3986;
4. drop default ports (``http://h:80`` → ``http://h``,
   ``https://h:443`` → ``https://h``);
5. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid`` by default — configurable), keeping the
   remaining parameter ORDER (reordering would merge semantically
   different urls on servers that care);
6. drop an empty query (a bare trailing ``?``);
7. drop the slash of a bare root path (``http://h/`` → ``http://h``).

NULL urls stay NULL. Urls without a scheme pass through steps 1/2/5-7
unchanged in their authority (there is none to lowercase). Documented
deviations: the whole authority is lowercased, including a rare
userinfo part (RFC keeps userinfo case-sensitive; crawl corpora do
not carry credentials); tracking-parameter matching is
case-sensitive (the platforms that mint these params emit them
lowercase — an uppercase ``UTM_SOURCE`` is kept).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# default tracking parameters: the widely-documented client-id /
# campaign params that never change server-side content
TRACKING_PARAMS = ("utm_[^=&]*", "fbclid", "gclid", "msclkid", "mc_eid")

_AUTH_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def canonical_url_col(url_col: str = "url",
                      tracking_params=TRACKING_PARAMS) -> Column:
    """One JVM expression computing the canonical form of ``url_col``
    (see module docstring for the rule list)."""
    # NOT F.trim: Spark's trim removes only ' ' (0x20) — a crawl field
    # padded with tabs/newlines would dodge every later rule (the
    # scheme regexp is ^-anchored). \s in Java regex is ASCII
    # whitespace [ \t\n\x0B\f\r], which is the documented trim set.
    u = F.regexp_replace(F.col(url_col), r"^\s+|\s+$", "")
    # 2. fragment off first — everything downstream ignores it
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. lowercase scheme://authority, keep the rest byte-identical
    pfx = F.regexp_extract(u, _AUTH_RE, 1)
    u = F.concat(F.lower(pfx), F.substring(u, F.length(pfx) + 1,
                                           F.length(u)))
    # 4. default ports (post-lowercase, so :80/:443 match once)
    u = F.regexp_replace(u, r"^(http://[^/?#:]+):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"^(https://[^/?#:]+):443(?=[/?#]|$)", "$1")
    # 5. tracking params: split the query on '&', drop matching params,
    #    rejoin in original order
    base = F.substring_index(u, "?", 1)
    query = F.substring(u, F.length(base) + 2, F.length(u))
    pat = "^(" + "|".join(tracking_params) + ")(=|$)"
    kept = F.array_join(
        F.filter(F.split(query, "&"),
                 lambda p: ~p.rlike(pat)), "&")
    u = F.when(~u.contains("?") | (kept == ""), base) \
         .otherwise(F.concat(base, F.lit("?"), kept))
    # 7. bare root slash (after the query may have emptied away)
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
    return u


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url",
                       tracking_params=TRACKING_PARAMS) -> DataFrame:
    """Append the canonical url column — run this before url-keyed
    `dedup_exact` / `seen_before` / `StreamingShardedDedup` so
    fragment/tracking/port/case variants of one page share a key."""
    return df.withColumn(out_col,
                         canonical_url_col(url_col, tracking_params))


# Common MULTI-PART public suffixes (a documented SUBSET of the
# Mozilla Public Suffix List — the ~40 registries under which the
# registrable domain is three labels, covering the bulk of crawl
# traffic). The full PSL is external data this sandbox doesn't carry;
# callers needing exact PSL semantics join their own suffix table and
# the heuristic's shape (longest-known-suffix + 1 label) is the same.
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz", "govt.nz",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr", "com.co",
    "co.in", "co.kr", "co.za", "co.id", "co.th", "co.il",
    "com.sg", "com.hk", "com.tw", "com.my", "com.ph", "com.vn",
    "com.sa", "com.eg", "com.pk", "com.ng", "com.pe", "com.ve",
)


def registrable_domain_col(host_col: str = "host",
                           multi_suffixes=MULTI_PART_SUFFIXES):
    """Registrable domain ("example.co.uk" for "a.b.example.co.uk") —
    the per-DOMAIN grouping key corpus curation caps on (per-domain
    document limits à la Gopher/FineWeb; per-host grouping
    over-splits sites that shard across subdomains).

    Heuristic: lowercase, then keep the last TWO labels, or the last
    THREE when the last two form a known multi-part public suffix
    (see ``MULTI_PART_SUFFIXES`` — a documented subset of the public
    suffix list, not the full external PSL). Hosts with ≤ 2 labels
    and IPv4 literals pass through unchanged. Pure-JVM expression —
    rides the scan like ``canonical_url_col``."""
    h = F.lower(F.col(host_col) if isinstance(host_col, str) else host_col)
    # FQDN trailing dot ("example.com.") would mint an empty last
    # label and mangle the suffix match — strip it first
    h = F.regexp_replace(h, r"\.$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3),
                        F.element_at(labels, -2), F.element_at(labels, -1))
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (F.when(h.isNull(), F.lit(None).cast("string"))
            .when(is_ip | (n <= 2), h)
            .when(last2.isin(*multi_suffixes), last3)
            .otherwise(last2))
