"""URL canonicalization + domain extraction, pure JVM.

Web-crawl curation keys on URLs long before it keys on content:
exact URL dedup (FineWeb dedups recrawls by canonical URL), per-domain
caps (``cap_per_key(key=url_registrable_domain(...))``), and domain
blocklists all need a CANONICAL form — raw crawl URLs differ in case,
default ports, trailing slashes, fragments, and tracking parameters
while naming the same resource.

Everything here is a Column expression built from ``try_parse_url`` +
array HOFs: no UDF, no shuffle, runs inside the scan stage at any
scale. ``url_registrable_domain`` implements the public-suffix-list
algorithm (https://publicsuffix.org/list/ — longest match, wildcard
and exception rules) over a vendored snapshot (``psl_data.py``; a
curated subset since the container is offline — load the full
upstream ``public_suffix_list.dat`` with ``load_psl`` and pass it as
``rules=`` for production).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .psl_data import PSLRules, load_psl, parse_psl, psl_rules

__all__ = [
    "url_host",
    "url_registrable_domain",
    "url_normalize",
    "domain_report",
    "host_graph",
    "TRACKING_PARAMS",
    "PSLRules",
    "parse_psl",
    "load_psl",
]

# query parameters that never change the resource: analytics/session
# tracking (the FineWeb/common-crawl canonicalization drop set).
# Bare 'ref' is deliberately NOT here: on many sites it is
# resource-determining (GitHub's ?ref=<branch>); pass a custom
# drop_params including 'ref' if your crawl treats it as tracking.
TRACKING_PARAMS = (
    r"utm_[^=&]*", "fbclid", "gclid", "gclsrc", "dclid", "msclkid",
    "mc_cid", "mc_eid", "igshid", "ref_src", "ref_url",
    "_ga", "_gl", "yclid", "wbraid", "gbraid",
)


def url_host(url: Column) -> Column:
    """Lower-cased host of a URL (NULL for unparseable input). Pure
    JVM ``try_parse_url``."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_registrable_domain(
    url: Column, rules: PSLRules | None = None
) -> Column:
    """The registrable ('pay-level') domain of a URL's host —
    ``news.bbc.co.uk -> bbc.co.uk``, ``a.b.example.com ->
    example.com``, ``user.github.io -> user.github.io`` — the
    per-domain grouping key for crawl caps and domain statistics.

    Implements the public-suffix-list matching algorithm
    (https://publicsuffix.org/list/): the LONGEST matching rule wins,
    ``!`` exception rules beat ``*.`` wildcard rules, and a host
    matching no rule falls back to the implicit ``*`` rule (last two
    labels). ``rules`` defaults to the vendored snapshot
    (``psl_data.PSL_SNAPSHOT`` — a curated subset; load the full
    upstream file via :func:`load_psl` for production). A host that IS
    a public suffix, a single label (``localhost``), an IPv4 literal,
    or a bracketed IPv6 literal is returned unchanged — IP-hosted
    pages must not merge under a meaningless pseudo-domain.

    Compiles to a pure-JVM when-chain over hash-set ``isin`` lookups:
    no UDF, no shuffle, no per-row regex beyond the IP guard."""
    if rules is None:
        rules = psl_rules()
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def last(k: int) -> Column:
        # clamped start: only evaluated under an n >= k guard, but the
        # clamp keeps slice() total for rows in other branches
        return F.array_join(
            F.slice(labels, F.greatest(n - (k - 1), F.lit(1)), k), "."
        )

    is_ip = host.rlike(r"^(\d{1,3}\.){3}\d{1,3}$") | host.contains(":")
    expr = F.when(host.isNull(), F.lit(None).cast("string"))
    expr = expr.when(is_ip | (n <= 1), host)

    by_len = lambda names: sorted(
        {name.count(".") + 1 for name in names}, reverse=True
    )
    # 1. exception rules: the rule name itself IS the registrable
    #    domain of every host at or under it
    for k in by_len(rules.exception):
        ek = sorted(e for e in rules.exception if e.count(".") + 1 == k)
        if ek:
            expr = expr.when((n >= k) & last(k).isin(*ek), last(k))
    # 2. wildcard + exact rules, longest public suffix first. A host
    #    equal to its own public suffix has no registrable domain;
    #    return it unchanged (documented, keeps cap keys total).
    wlens = [w.count(".") + 2 for w in rules.wildcard]  # suffix len
    xlens = [x.count(".") + 1 for x in rules.exact]
    for s in sorted(set(wlens + xlens), reverse=True):
        conds = []
        wp = sorted(
            w for w in rules.wildcard if w.count(".") + 2 == s
        )
        if wp:
            conds.append((n >= s) & last(s - 1).isin(*wp))
        xs = sorted(x for x in rules.exact if x.count(".") + 1 == s)
        if xs:
            conds.append((n >= s) & last(s).isin(*xs))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        expr = expr.when(
            cond, F.when(n >= s + 1, last(s + 1)).otherwise(host)
        )
    # 3. implicit '*' default: public suffix = last label
    return expr.otherwise(F.when(n >= 2, last(2)).otherwise(host))


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


def domain_report(
    td,
    url="url",
    text=None,
    rules: PSLRules | None = None,
    top_k: int | None = None,
    approx: bool = False,
):
    """Crawl triage per registrable domain — the audit a per-domain cap
    or blocklist decision is made from: for every
    :func:`url_registrable_domain` key, how many pages, how many
    DISTINCT canonical URLs (:func:`url_normalize` — the gap to
    ``n_docs`` is the recrawl rate), and, when ``text=`` is given, how
    many distinct text fingerprints and total chars (the gap between
    ``n_text_docs`` and ``n_unique_texts`` is the within-domain exact
    boilerplate/mirror rate). ``dup_url_rate`` / ``dup_text_rate``
    report both directly. Unparseable URLs group under domain NULL so
    junk is visible, not dropped. ``top_k`` keeps the largest domains
    by page count (a TakeOrdered, no full sort).

    One groupBy on the domain key — a single keyed shuffle with
    map-side partial aggregation, everything JVM expressions; at
    100 TB this is a scan + one exchange of per-domain partials.

    ``approx=True`` swaps the exact distinct counts for Datasketches
    HLL (``hll_sketch_agg``, ~±2% error): exact ``countDistinct``
    rewrites to an expanded two-phase aggregation whose shuffle
    carries every distinct ``(domain, url)`` pair — at crawl scale
    that's the corpus's URL mass; sketches keep the exchange at a few
    KB per domain and merge map-side. Counts become estimates (still
    BIGINT); the rates derive from the same estimates."""
    from ..tibble import Tibble, ensure_tibble

    td = ensure_tibble(td)
    uname = url if isinstance(url, str) else url._name

    def _ndv(c):
        if approx:
            # all-NULL groups yield a NULL sketch; countDistinct says 0
            return F.coalesce(
                F.hll_sketch_estimate(F.hll_sketch_agg(c)), F.lit(0)
            )
        return F.countDistinct(c)

    cols = [
        url_registrable_domain(F.col(uname), rules).alias("domain"),
        url_normalize(F.col(uname)).alias("__norm__"),
    ]
    if text is not None:
        tname = text if isinstance(text, str) else text._name
        cols += [
            # xxhash64(NULL) is the seed constant, not NULL — guard so
            # NULL texts don't count as one shared "distinct text"
            F.when(
                F.col(tname).isNotNull(), F.xxhash64(F.col(tname))
            ).alias("__th__"),
            F.when(
                F.col(tname).isNotNull(), F.length(F.col(tname))
            ).alias("__chars__"),
        ]
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        _ndv("__norm__").alias("n_unique_urls"),
    ]
    if text is not None:
        aggs += [
            F.count("__chars__").alias("n_text_docs"),
            _ndv("__th__").alias("n_unique_texts"),
            F.coalesce(F.sum("__chars__"), F.lit(0)).alias("chars"),
        ]
    out = td.df.select(*cols).groupBy("domain").agg(*aggs)
    out = out.withColumn(
        "dup_url_rate",
        F.round(1.0 - F.col("n_unique_urls") / F.col("n_docs"), 4),
    )
    if text is not None:
        out = out.withColumn(
            "dup_text_rate",
            F.when(
                F.col("n_text_docs") > 0,
                F.round(
                    1.0 - F.col("n_unique_texts") / F.col("n_text_docs"), 4
                ),
            ),
        )
    if top_k is not None:
        out = out.orderBy(
            F.col("n_docs").desc(), F.col("domain").asc()
        ).limit(int(top_k))
    return Tibble(out)


def host_graph(
    td,
    url: Any = "url",
    html: Any = "html",
    drop_self: bool = True,
):
    """(src_host, dst_host, n_links) edges of the crawl's host-level
    link graph — the input to :func:`~datar_polars_spark.scale.graph.
    pagerank` for the domain-authority quality prior.

    src_host is the document's own host (``url_host(url)``); each
    ``href`` extracted from the markup (html_extract_links) resolves
    to a dst host WITHOUT a full RFC 3986 resolver, because only the
    HOST matters here: absolute http(s) links parse their own host,
    protocol-relative ``//host/...`` links take the authority
    directly, and every relative form stays on src_host (which
    ``drop_self=True``, the default, then discards along with
    same-host absolute links — a host graph is about cross-site
    endorsement). Rows with an unparseable src or dst host are
    dropped. One explode + one groupBy; counts are edge weights for
    weighted PageRank."""
    from ..plans.expr import Ref
    from ..tibble import Tibble, ensure_tibble
    from .text import html_extract_links

    def _name_of(x):
        return x._name if isinstance(x, Ref) else str(x)

    td = ensure_tibble(td)
    uname = _name_of(url)
    links = html_extract_links(
        td.df.select(url_host(F.col(uname)).alias("__src__"),
                     F.col(_name_of(html))),
        _name_of(html), out_col="__lnk__",
    ).df
    lnk = F.col("__lnk__")
    # links with a NON-http scheme (mailto:, javascript:, tel:, ftp:,
    # data:) are not navigation edges — NULL them out (filtered below)
    # instead of letting the relative-form fallback count them as
    # self-links
    dst = (
        F.when(
            lnk.rlike(r"(?i)^https?://"), url_host(lnk)
        )
        .when(
            lnk.startswith("//"),
            F.lower(F.regexp_extract(lnk, r"^//([^/?#:]+)", 1)),
        )
        .when(
            lnk.rlike(r"(?i)^[a-z][a-z0-9+.-]*:"),
            F.lit(None).cast("string"),
        )
        .otherwise(F.col("__src__"))
    )
    out = (
        links.select(
            F.col("__src__").alias("src_host"), dst.alias("dst_host")
        )
        .filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .filter(F.length("dst_host") > 0)
    )
    if drop_self:
        out = out.filter(F.col("src_host") != F.col("dst_host"))
    return Tibble(
        out.groupBy("src_host", "dst_host").agg(
            F.count("*").alias("n_links")
        )
    )
