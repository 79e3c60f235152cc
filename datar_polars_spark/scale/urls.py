"""URL canonicalization + domain extraction, pure JVM.

Web-crawl curation keys on URLs long before it keys on content:
exact URL dedup (FineWeb dedups recrawls by canonical URL), per-domain
caps (``cap_per_key(key=url_registrable_domain(...))``), and domain
blocklists all need a CANONICAL form — raw crawl URLs differ in case,
default ports, trailing slashes, fragments, and tracking parameters
while naming the same resource.

Everything here is a Column expression built from ``try_parse_url`` +
array HOFs: no UDF, no shuffle, runs inside the scan stage at any
scale. ``url_registrable_domain`` approximates the public suffix list
(not shipped in this container) with the common two-label suffixes —
documented approximation, exact for the major ccTLD patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "url_registrable_domain",
    "url_normalize",
    "TRACKING_PARAMS",
]

# query parameters that never change the resource: analytics/session
# tracking (the FineWeb/common-crawl canonicalization drop set)
TRACKING_PARAMS = (
    r"utm_[^=&]*", "fbclid", "gclid", "gclsrc", "dclid", "msclkid",
    "mc_cid", "mc_eid", "igshid", "ref", "ref_src", "ref_url",
    "_ga", "_gl", "yclid", "wbraid", "gbraid",
)

# common two-label public suffixes (co.uk style); a host ending in one
# keeps THREE labels as its registrable domain
_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.za", "co.nz", "co.th", "co.id", "com.my", "com.ph",
    "com.vn", "com.eg", "com.sa", "com.co", "com.pe", "com.ve",
)


def url_host(url: Column) -> Column:
    """Lower-cased host of a URL (NULL for unparseable input). Pure
    JVM ``try_parse_url``."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_registrable_domain(url: Column) -> Column:
    """The registrable ('pay-level') domain of a URL's host —
    ``news.bbc.co.uk -> bbc.co.uk``, ``a.b.example.com ->
    example.com``. Approximates the public suffix list with the common
    two-label suffixes; unknown multi-label suffixes fall back to the
    last two labels. The per-domain grouping key for crawl caps and
    domain statistics."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    is_two_label_suffix = last2.isin(*_TWO_LABEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when((n >= 3) & is_two_label_suffix, last3)
        .otherwise(last2)
    )


def url_normalize(
    url: Column,
    drop_params: tuple = TRACKING_PARAMS,
    sort_params: bool = True,
) -> Column:
    """Canonical URL: lower-cased scheme and host, default ports
    stripped (:80 for http, :443 for https), trailing slash removed
    from the path (the root path '/' collapses into the bare
    authority), the fragment dropped, tracking parameters
    (``drop_params`` regexes, matched against the parameter NAME)
    removed, and remaining query parameters optionally sorted
    (``sort_params`` — recrawls permute parameter order; sorting is
    what makes exact URL dedup catch them). NULL/unparseable input
    yields NULL.

    One nested expression over ``try_parse_url`` + array HOFs: no UDF, no
    shuffle — pair with ``dedup_exact(url_normalize(f.url))`` for
    crawl-level URL dedup at 100 TB."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = url_host(url)
    authority = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (F.length(port) > 0) & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    name_re = "^(" + "|".join(drop_params) + ")$" if drop_params else None
    params = F.filter(
        F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
        lambda p: (F.length(p) > 0)
        & (
            ~F.regexp_extract(p, "^([^=]*)", 1).rlike(name_re)
            if name_re
            else F.lit(True)
        ),
    )
    if sort_params:
        params = F.array_sort(params)
    query_part = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part),
    )
