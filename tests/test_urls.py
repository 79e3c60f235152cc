"""URL canonicalization (scale/urls.py): normalization rules, domain
extraction, tracking-param removal, and the crawl-dedup composition."""

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale import (
    url_host,
    url_normalize,
    url_registrable_domain,
)
from datar_polars_spark.tibble import ensure_tibble


def _norm(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"]
        for r in df.select(
            url_normalize(F.col("url"), **kw).alias("n")
        ).collect()
    ]


def test_normalization_rules(spark):
    cases = {
        # case-folds scheme+host, strips :443, trailing /, fragment,
        # utm params; sorts the rest
        "HTTPS://WWW.Example.COM:443/Path/?b=2&utm_source=x&a=1#frag":
            "https://www.example.com/Path?a=1&b=2",
        "http://example.com:80/": "http://example.com",
        "http://example.com:8080/x/": "http://example.com:8080/x",
        "https://news.bbc.co.uk/article?gclid=z":
            "https://news.bbc.co.uk/article",
        "https://a.com/p?fbclid=1&_ga=2&keep=3": "https://a.com/p?keep=3",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_invalid_and_null_urls_yield_null(spark):
    assert _norm(spark, ["not a url", None, "   "]) == [None, None, None]


def test_param_order_canonicalizes_recrawls(spark):
    a, b = _norm(
        spark,
        ["https://a.com/p?x=1&y=2", "https://a.com/p?y=2&x=1"],
    )
    assert a == b == "https://a.com/p?x=1&y=2"
    # sort_params=False preserves order (and so does NOT dedup these)
    a2, b2 = _norm(
        spark,
        ["https://a.com/p?x=1&y=2", "https://a.com/p?y=2&x=1"],
        sort_params=False,
    )
    assert a2 != b2


def _domains(spark, cases, **kw):
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    return [
        r["d"]
        for r in df.select(
            url_registrable_domain(F.col("url"), **kw).alias("d")
        ).collect()
    ]


def test_registrable_domain(spark):
    cases = {
        "https://news.bbc.co.uk/a": "bbc.co.uk",
        "http://a.b.example.com/": "example.com",
        "https://example.com": "example.com",
        "https://localhost/x": "localhost",
        "https://shop.store.com.au/y": "store.com.au",
    }
    assert _domains(spark, list(cases)) == list(cases.values())


def test_registrable_domain_psl_fixture(spark):
    """~50 known PSL cases across rule classes: exact 2/3/4-label
    suffixes (ICANN + private), wildcard rules, exception rules, the
    implicit '*' default, and hosts that ARE a public suffix."""
    cases = {
        # exact 2-label ICANN suffixes
        "https://news.bbc.co.uk/a": "bbc.co.uk",
        "https://a.b.canon.co.jp/": "canon.co.jp",
        "http://x.gov.uk.example.org/": "example.org",  # not a suffix mid-host
        "https://shop.big.com.br/": "big.com.br",
        "https://e.corp.com.cn/": "corp.com.cn",
        "https://e.samsung.co.kr/": "samsung.co.kr",
        "https://w.x.firm.co.in/": "firm.co.in",
        "https://uni.ac.za/": "uni.ac.za",
        "https://a.gouv.fr/": "a.gouv.fr",
        "https://sub.site.waw.pl/": "site.waw.pl",
        "https://a.b.kiev.ua/": "b.kiev.ua",
        "https://x.metro.tokyo.jp/": "metro.tokyo.jp",
        # exact 3-label ICANN (US locality space)
        "https://school.k12.ma.us/": "school.k12.ma.us",
        "https://a.school.k12.ca.us/": "school.k12.ca.us",
        "https://city.ca.us/": "city.ca.us",
        # private section: hosting platforms are suffixes
        "https://user.github.io/repo": "user.github.io",
        "https://raw.githubusercontent.com/": "raw.githubusercontent.com",
        "https://me.blogspot.com/post": "me.blogspot.com",
        "https://me.blogspot.co.uk/": "me.blogspot.co.uk",
        "https://me.blogspot.com.au/": "me.blogspot.com.au",
        "https://site.wordpress.com/": "site.wordpress.com",
        "https://d123.cloudfront.net/x": "d123.cloudfront.net",
        "https://app.herokuapp.com/": "app.herokuapp.com",
        "https://site.netlify.app/": "site.netlify.app",
        "https://app.vercel.app/": "app.vercel.app",
        "https://p.pages.dev/": "p.pages.dev",
        "https://fn.workers.dev/": "fn.workers.dev",
        "https://docs.readthedocs.io/": "docs.readthedocs.io",
        "https://site.azurewebsites.net/": "site.azurewebsites.net",
        "https://proj.appspot.com/": "proj.appspot.com",
        # private 3/4-label exact (S3 buckets are per-bucket domains)
        "https://bucket.s3.amazonaws.com/key": "bucket.s3.amazonaws.com",
        "https://b.s3.us-west-2.amazonaws.com/": "b.s3.us-west-2.amazonaws.com",
        # wildcard rules: *.bd, *.ck, *.compute.amazonaws.com
        "http://site.com.bd/": "site.com.bd",
        "http://a.site.com.bd/": "site.com.bd",
        "http://biz.other.ck/": "biz.other.ck",
        "https://ec2-1-2-3-4.us-east.compute.amazonaws.com/":
            "ec2-1-2-3-4.us-east.compute.amazonaws.com",
        "https://lb.us-east-1.elb.amazonaws.com/":
            "lb.us-east-1.elb.amazonaws.com",
        # exception rules beat wildcards
        "http://www.ck/": "www.ck",
        "http://sub.www.ck/": "www.ck",
        "https://a.city.kawasaki.jp/": "city.kawasaki.jp",
        "https://ward.sub.kawasaki.jp/": "ward.sub.kawasaki.jp",
        # implicit '*' default (unknown TLD / plain gTLD)
        "https://a.b.example.com/": "example.com",
        "https://deep.a.b.c.example.net/": "example.net",
        "https://example.dev/": "example.dev",
        "https://x.y.example.unknowntld/": "example.unknowntld",
        # host IS a public suffix / single label: unchanged
        "https://github.io/": "github.io",
        "https://co.uk/": "co.uk",
        "https://s3.amazonaws.com/": "s3.amazonaws.com",
        "https://localhost/": "localhost",
    }
    got = _domains(spark, list(cases))
    mism = {
        u: (g, w)
        for u, g, w in zip(cases, got, cases.values())
        if g != w
    }
    assert not mism, mism


def test_registrable_domain_ip_literals(spark):
    """IP-hosted pages must not merge under a meaningless
    pseudo-domain (ADVICE r10): IPv4 and bracketed IPv6 hosts come
    back unchanged."""
    cases = {
        "http://192.168.0.1/x": "192.168.0.1",
        "http://10.0.0.2:8080/": "10.0.0.2",
        "https://[2001:db8::1]/p": "[2001:db8::1]",
    }
    got = _domains(spark, list(cases))
    assert got == list(cases.values())


def test_registrable_domain_custom_rules(spark):
    """parse_psl + rules=: a full upstream public_suffix_list.dat is a
    drop-in (same format: comments, wildcards, exceptions)."""
    from datar_polars_spark.scale import parse_psl

    rules = parse_psl(
        """
        // test list
        internal
        *.dyn.internal
        !static.dyn.internal
        """
    )
    cases = {
        "https://a.team.internal/": "team.internal",
        "https://x.a.dyn.internal/": "x.a.dyn.internal",
        "https://x.static.dyn.internal/": "static.dyn.internal",
        "https://a.b.example.com/": "example.com",  # implicit default
    }
    got = _domains(spark, list(cases), rules=rules)
    assert got == list(cases.values())


def test_registrable_domain_randomized_differential(spark):
    """The when-chain compilation must equal a straightforward Python
    implementation of the published PSL algorithm on randomized hosts
    built from rule fragments (exercises longest-match ordering,
    wildcard/exception precedence, host==suffix edges, n<k clamps)."""
    import random

    from datar_polars_spark.scale.urls import psl_rules

    rules = psl_rules()

    def py_registrable(host):
        labels = host.split(".")
        n = len(labels)
        if n <= 1:
            return host

        def last(k):
            return ".".join(labels[n - k:])

        # exceptions first (the rule IS the registrable domain)
        for k in sorted({e.count(".") + 1 for e in rules.exception},
                        reverse=True):
            if n >= k and last(k) in rules.exception:
                return last(k)
        suffix_lens = sorted(
            {w.count(".") + 2 for w in rules.wildcard}
            | {x.count(".") + 1 for x in rules.exact},
            reverse=True,
        )
        for s in suffix_lens:
            wild = n >= s and last(s - 1) in rules.wildcard
            exact = n >= s and last(s) in rules.exact
            if wild or exact:
                return last(s + 1) if n >= s + 1 else host
        return last(2) if n >= 2 else host

    rng = random.Random(11)
    frag_sources = (
        sorted(rules.exact)[::7]
        + sorted(rules.wildcard)
        + sorted(rules.exception)
        + ["example.com", "a.b.c", "x"]
    )
    hosts = []
    for _ in range(300):
        base = rng.choice(frag_sources)
        depth = rng.randrange(0, 3)
        prefix = [
            rng.choice(["www", "a", "sub", "city", "deep"])
            for _ in range(depth)
        ]
        hosts.append(".".join(prefix + [base]))
    urls = [f"https://{h}/p" for h in hosts]
    got = _domains(spark, urls)
    want = [py_registrable(h) for h in hosts]
    mism = [
        (h, g, w) for h, g, w in zip(hosts, got, want) if g != w
    ]
    assert not mism, mism[:10]


def test_domain_report(spark):
    """Per-registrable-domain crawl triage: doc counts, distinct
    canonical URLs (recrawl rate), distinct text fingerprints
    (boilerplate/mirror rate), char mass — hand-checked."""
    from datar_polars_spark.scale import domain_report

    rows = [
        # a.github.io: 3 pages, 2 canonical urls (one recrawl via utm),
        # 2 distinct texts
        ("https://a.github.io/p1", "alpha"),
        ("https://a.github.io/p1?utm_source=x", "alpha"),
        ("https://a.github.io/p2", "beta"),
        # example.com: 2 pages, 2 urls, 1 text (mirror), one NULL text
        ("https://www.example.com/x", "mirror"),
        ("https://sub.example.com/y", "mirror"),
        ("https://example.com/z", None),
        # junk URL: groups under NULL domain, stays visible
        ("not a url", "junk"),
    ]
    td = ensure_tibble(
        spark.createDataFrame(rows, "url string, text string")
    )
    rep = {
        r["domain"]: r
        for r in domain_report(td, url="url", text="text").df.collect()
    }
    gh = rep["a.github.io"]
    assert (gh["n_docs"], gh["n_unique_urls"], gh["n_unique_texts"]) == (3, 2, 2)
    assert gh["dup_url_rate"] == round(1 - 2 / 3, 4)
    assert gh["chars"] == len("alpha") * 2 + len("beta")
    ex = rep["example.com"]
    assert (ex["n_docs"], ex["n_unique_urls"]) == (3, 3)
    assert (ex["n_text_docs"], ex["n_unique_texts"]) == (2, 1)
    assert ex["dup_text_rate"] == 0.5
    assert rep[None]["n_docs"] == 1  # junk visible, not dropped

    # top_k keeps the largest domains by page count
    top = domain_report(td, url="url", top_k=1).df.collect()
    assert len(top) == 1 and top[0]["domain"] in ("a.github.io", "example.com")

    # single keyed shuffle, pure JVM
    plan = (
        domain_report(td, url="url", text="text")
        .df._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_domain_report_approx_mode(spark):
    """approx=True swaps exact countDistinct (whose rewrite shuffles
    every distinct (domain, url) pair) for mergeable HLL sketches; at
    these cardinalities the estimates are exact, and the expand-free
    plan carries ONE aggregate pass."""
    from datar_polars_spark.scale import domain_report

    rows = [
        (f"https://s{i % 3}.example{i % 5}.com/p{i}", f"text {i % 11}")
        for i in range(200)
    ]
    td = ensure_tibble(
        spark.createDataFrame(rows, "url string, text string")
    )
    exact = {
        r["domain"]: r
        for r in domain_report(td, url="url", text="text").df.collect()
    }
    approx = {
        r["domain"]: r
        for r in domain_report(
            td, url="url", text="text", approx=True
        ).df.collect()
    }
    assert set(exact) == set(approx)
    for d, e in exact.items():
        a = approx[d]
        assert (a["n_docs"], a["chars"]) == (e["n_docs"], e["chars"])
        # HLL is exact at these cardinalities (sparse mode)
        assert a["n_unique_urls"] == e["n_unique_urls"]
        assert a["n_unique_texts"] == e["n_unique_texts"]
    # exact countDistinct needs the Expand rewrite; the sketch plan
    # does not
    plan_a = (
        domain_report(td, url="url", text="text", approx=True)
        .df._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan_a and "Python" not in plan_a


def test_ref_param_is_preserved(spark):
    """ADVICE r10: bare ?ref= is resource-determining on many sites
    (GitHub branches) — the default drop set keeps it, while ref_src /
    ref_url (tracking) still drop."""
    got = _norm(
        spark,
        [
            "https://github.com/o/r/tree/main?ref=feature-branch",
            "https://a.com/p?ref_src=twsrc&keep=1&ref_url=x",
        ],
    )
    assert got == [
        "https://github.com/o/r/tree/main?ref=feature-branch",
        "https://a.com/p?keep=1",
    ]


def test_url_dedup_composition(spark):
    """The crawl pattern: dedup_exact over the canonical URL catches
    recrawls that differ only in tracking params / param order."""
    from datar_polars_spark.scale import dedup_exact

    urls = [
        (1, "https://a.com/p?x=1&y=2"),
        (2, "https://A.com/p/?y=2&x=1&utm_source=tw"),  # same resource
        (3, "https://a.com/q"),
    ]
    td = ensure_tibble(spark.createDataFrame(urls, "doc_id long, url string"))
    canon = td.with_df(
        td.df.withColumn("curl", url_normalize(F.col("url")))
    )
    out = dedup_exact(canon, "curl", id_col="doc_id")
    kept = sorted(r["doc_id"] for r in out.df.collect())
    assert kept == [1, 3]


def test_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([("https://a.com/p",)], "url string")
    out = df.select(
        url_normalize(F.col("url")).alias("n"),
        url_registrable_domain(F.col("url")).alias("d"),
        url_host(F.col("url")).alias("h"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Exchange" not in plan


def test_url_normalize_is_idempotent(spark):
    """normalize(normalize(u)) == normalize(u): the canonical form is
    a fixed point, so re-canonicalizing landed data never changes keys
    (fuzzed over scheme/host-case/port/path/params/fragment combos)."""
    import itertools

    urls = []
    for scheme, host, port, path, q, frag in itertools.product(
        ["http", "HTTPS"],
        ["A.Example.COM", "news.site.co.uk"],
        ["", ":80", ":443", ":8080"],
        ["", "/", "/P/x/", "/a//b///"],
        ["", "?b=2&a=1", "?utm_source=x", "?z=9&gclid=t&y=8&ref=keep"],
        ["", "#frag"],
    ):
        urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert twice == once


def test_registry_url_domain_equals_psl_sibling(spark):
    """r12 (VERDICT #3): the mutate-side `url_domain` registry function
    compiles to the SAME PSL when-chain as url_registrable_domain — no
    more 7-suffix heuristic disagreeing on github.io / com.pl / IPs."""
    from datar_polars_spark import f, mutate, tibble
    from datar_polars_spark.functions.registry import builder

    url_domain = builder("url_domain")
    urls = [
        "https://user.github.io/repo",       # private PSL suffix
        "https://sub.site.waw.pl/",          # com.pl-style ccTLD space
        "https://shop.big.com.br/",
        "http://a.site.com.bd/",             # wildcard rule
        "http://www.ck/",                    # exception rule
        "https://a.b.example.com/",          # implicit default
        "http://192.168.0.1/x",              # IPv4 literal unchanged
        "https://localhost/",                # single label unchanged
        "https://news.bbc.co.uk/a",
        None,                                 # NULL stays NULL
    ]
    td = tibble(spark, i=list(range(len(urls))), url=urls)
    out = (td >> mutate(d=url_domain(f.url))).collect()
    want = _domains(spark, [u for u in urls if u is not None])
    # align: NULL url -> NULL domain; the rest must equal the sibling
    assert out["d"].tolist()[:-1] == want
    assert out["d"].tolist()[-1] is None
