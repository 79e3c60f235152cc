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


def test_registrable_domain(spark):
    cases = {
        "https://news.bbc.co.uk/a": "bbc.co.uk",
        "http://a.b.example.com/": "example.com",
        "https://example.com": "example.com",
        "https://localhost/x": "localhost",
        "https://shop.store.com.au/y": "store.com.au",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [
        r["d"]
        for r in df.select(
            url_registrable_domain(F.col("url")).alias("d")
        ).collect()
    ]
    assert got == list(cases.values())


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
