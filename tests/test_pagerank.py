"""Crawl-graph ranking: html_extract_links -> host_graph -> pagerank
(the domain-authority quality prior)."""

import numpy as np
import pytest

from datar_polars_spark import Tibble, f, tibble
from datar_polars_spark.scale import (
    host_graph,
    html_extract_links,
    pagerank,
)


def _numpy_pagerank(edges, n, d=0.85, iters=30, weights=None):
    import collections

    outw = collections.Counter()
    for i, (u, v) in enumerate(edges):
        outw[u] += weights[i] if weights else 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = np.zeros(n)
        dm = sum(r[u] for u in range(n) if outw[u] == 0)
        for i, (u, v) in enumerate(edges):
            w = weights[i] if weights else 1.0
            c[v] += r[u] * w / outw[u]
        r = (1 - d) / n + d * (c + dm / n)
    return r


def test_pagerank_matches_numpy_with_dangling(spark):
    # node 3 is dangling (no out-edges): its mass must redistribute
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=30).df.collect()}
    ref = _numpy_pagerank(edges, 4, iters=30)
    assert abs(sum(got.values()) - 1.0) < 1e-12
    for i in range(4):
        assert abs(got[i] - ref[i]) < 1e-12


def test_pagerank_weighted(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0)]
    weights = [3.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [e + (w,) for e, w in zip(edges, weights)],
        "src long, dst long, w double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, weight="w", iterations=20).df.collect()
    }
    ref = _numpy_pagerank(edges, 3, iters=20, weights=weights)
    for i in range(3):
        assert abs(got[i] - ref[i]) < 1e-12


@pytest.mark.slow  # r15: ~2-5 min property sweep; partest/-m
# override still runs it in full
def test_pagerank_checkpoint_interval_invariant(spark):
    # lineage truncation must not change values
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = pagerank(df, iterations=9, checkpoint_every=2).df.collect()
    b = pagerank(df, iterations=9, checkpoint_every=100).df.collect()
    ra = {r["node"]: r["rank"] for r in a}
    rb = {r["node"]: r["rank"] for r in b}
    assert all(abs(ra[k] - rb[k]) < 1e-12 for k in ra)


def test_pagerank_null_endpoints_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (None, 2), (2, None)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).df.collect()}
    # node 2 appears only via NULL-partnered edges -> never ranked
    assert set(got) == {0, 1}
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)


def test_pagerank_string_nodes_and_tibble_input(spark):
    td = tibble(
        spark,
        src=["a.com", "b.org", "b.org"],
        dst=["b.org", "a.com", "c.net"],
    )
    got = {r["node"]: r["rank"] for r in pagerank(td, f.src, f.dst).df.collect()}
    assert set(got) == {"a.com", "b.org", "c.net"}
    assert abs(sum(got.values()) - 1.0) < 1e-12
    # a and c are exactly symmetric receivers here (each gets half of
    # b's mass plus the same teleport/dangling share); b, receiving
    # a's FULL mass, strictly outranks both
    assert abs(got["a.com"] - got["c.net"]) < 1e-12
    assert got["b.org"] > got["a.com"]


def test_html_extract_links_forms(spark):
    td = Tibble(
        spark.createDataFrame(
            [
                (1, '<a href="https://a.com/x">x</a> <a href=\'http://b.org\'>'
                    "</a> <a href=/rel>r</a> "
                    '<a href="#frag">f</a> <img src="i.png">'
                    '<A HREF = "https://C.com">'),
                (2, "no links"),
                (3, None),
            ],
            "doc_id long, html string",
        )
    )
    out = html_extract_links(td, "html").df.collect()
    got = {(r["doc_id"], r["link"]) for r in out}
    assert got == {
        (1, "https://a.com/x"),
        (1, "http://b.org"),
        (1, "/rel"),
        (1, "https://C.com"),
    }
    with pytest.raises(ValueError, match="already exists"):
        html_extract_links(td, "html", out_col="doc_id")


def test_host_graph_resolution_and_weights(spark):
    td = tibble(
        spark,
        url=[
            "https://news.site.com/a",
            "https://news.site.com/b",
            "https://other.org/",
        ],
        html=[
            '<a href="https://other.org/x"></a>'
            '<a href="//cdn.example.net/y"></a>'
            '<a href="/internal"></a>'          # relative -> self, dropped
            '<a href="https://news.site.com/z"></a>',  # same host, dropped
            '<a href="https://other.org/q"></a>',
            '<a href="HTTPS://News.Site.Com/home"></a>',
        ],
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(td, f.url, f.html).df.collect()
    }
    assert got == {
        ("news.site.com", "other.org"): 2,
        ("news.site.com", "cdn.example.net"): 1,
        ("other.org", "news.site.com"): 1,
    }
    # drop_self=False keeps intra-host edges (relative + same-host)
    kept = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(td, f.url, f.html, drop_self=False).df.collect()
    }
    assert kept[("news.site.com", "news.site.com")] == 2


def test_host_graph_non_http_schemes_are_not_edges(spark):
    td = tibble(
        spark,
        url=["https://a.com/"],
        html=[
            '<a href="mailto:x@b.org"></a><a href="javascript:void(0)"></a>'
            '<a href="tel:+123"></a><a href="ftp://files.c.net/f"></a>'
            '<a href="https://d.io/p"></a>'
        ],
    )
    got = {
        (r["src_host"], r["dst_host"])
        for r in host_graph(td, f.url, f.html, drop_self=False).df.collect()
    }
    # only the real http link survives; mailto/js/tel/ftp are neither
    # cross-host edges nor self-links
    assert got == {("a.com", "d.io")}


def test_pagerank_empty_graph_keeps_node_dtype(spark):
    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df, iterations=3).df
    assert out.count() == 0
    assert dict(out.dtypes)["node"] == "bigint"


def test_host_graph_to_pagerank_end_to_end(spark):
    td = tibble(
        spark,
        url=["https://a.com/", "https://b.org/", "https://c.net/"],
        html=[
            '<a href="https://b.org/x"></a>',
            '<a href="https://a.com/x"></a><a href="https://c.net/y"></a>',
            '<a href="https://a.com/z"></a>',
        ],
    )
    g = host_graph(td, f.url, f.html)
    ranks = pagerank(g, f.src_host, f.dst_host, weight=f.n_links,
                     iterations=30)
    got = {r["node"]: r["rank"] for r in ranks.df.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-12
    # a.com is endorsed by both others; it must rank highest
    assert got["a.com"] == max(got.values())


def test_pagerank_edges_shuffle_once_not_per_iteration(spark):
    """100 TB guard: the cached, source-partitioned edge list must
    satisfy every iteration's join distribution from its cached layout
    — no Exchange directly above any edge InMemoryTableScan (a
    checkpoint alone loses partitioning under AQE and re-exchanged the
    full edge list every round)."""
    from datar_polars_spark.scale import pagerank_last_run

    edges = [(i, (i * 7 + 1) % 50) for i in range(50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # r13: the returned frame is a flat checkpoint scan, so the
    # iteration structure is asserted on the captured last-generation
    # plan (pagerank_last_run()['plan']); iteration caches are managed
    # locally — never FIFO-evicted mid-call — so every round has the
    # same structure and a 3-round chain locks it.
    pagerank(df, iterations=3, checkpoint_every=100).df.collect()
    plan = pagerank_last_run()["plan"]
    lines = plan.splitlines()
    edge_scans = under_exchange = 0
    for i, l in enumerate(lines):
        if "InMemoryTableScan" in l and "v#" in l:
            edge_scans += 1
            if "Exchange hashpartitioning" in " ".join(lines[max(0, i - 4):i]):
                under_exchange += 1
    assert edge_scans >= 3  # one per iteration + the out-weight agg
    assert under_exchange == 0
    # and the RETURNED frame re-plans from the materialized checkpoint
    # — no recompute of the iteration chain on user actions
    returned = (
        pagerank(df, iterations=3, checkpoint_every=100)
        .df._jdf.queryExecution().executedPlan().toString()
    )
    assert "Scan ExistingRDD" in returned


def test_pagerank_releases_iteration_caches(spark):
    """r13: iteration caches (edges + rank generations) are managed
    locally and released before returning — a call leaves behind
    exactly ONE registry-managed cache (the materialized result), so
    repeated calls in a long driver session cannot accumulate
    edge/generation caches and the one-edge-shuffle-per-call property
    can never lapse to FIFO eviction mid-call."""
    from datar_polars_spark.plans.cache import (
        internal_cache_count,
        release_internal_caches,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 2)], "src long, dst long"
    )
    release_internal_caches()
    out = pagerank(df, iterations=5)
    # nothing registered, nothing pinned: the result is an eager
    # checkpoint, every iteration cache was released
    assert internal_cache_count() == 0
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan and "InMemoryTableScan" not in plan
    assert abs(sum(r["rank"] for r in out.df.collect()) - 1.0) < 1e-12
    out2 = pagerank(df, iterations=5, tol=1e-15)
    assert internal_cache_count() == 0
    assert abs(sum(r["rank"] for r in out2.df.collect()) - 1.0) < 1e-12


def test_pagerank_empty_graph_resets_last_run(spark):
    """pagerank_last_run() must describe the MOST RECENT call even
    when that call saw an empty graph (0 rounds, no delta)."""
    from datar_polars_spark.scale.graph import pagerank_last_run

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    pagerank(df, iterations=3, tol=1e-12).df.collect()
    assert pagerank_last_run()["iterations"] >= 1
    empty = df.filter("src < 0")
    assert pagerank(empty).df.count() == 0
    assert pagerank_last_run() == {"iterations": 0, "delta": None}


@pytest.mark.parametrize("seed", [3, 41])
def test_pagerank_fuzz_random_graphs(spark, seed):
    """Seeded random digraphs (with duplicate edges, self-loops, and
    dangling nodes) must match the numpy power iteration exactly."""
    import random

    rng = random.Random(seed)
    n = 30
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randint(40, 80))
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=12).df.collect()}
    # numpy reference over the same multigraph (duplicate edges count
    # twice, matching the unweighted implementation)
    import collections

    outw = collections.Counter(u for u, _ in edges)
    present = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(present)}
    m = len(present)
    r = np.full(m, 1.0 / m)
    for _ in range(12):
        c = np.zeros(m)
        dm = sum(r[idx[u]] for u in present if outw[u] == 0)
        for u, v in edges:
            c[idx[v]] += r[idx[u]] / outw[u]
        r = 0.15 / m + 0.85 * (c + dm / m)
    assert set(got) == set(present)
    for u in present:
        assert abs(got[u] - r[idx[u]]) < 1e-12


@pytest.mark.slow  # r15: ~2-5 min property sweep; partest/-m
# override still runs it in full
def test_pagerank_tol_early_stop_matches_converged(spark):
    """tol= stops once the L1 delta falls below it; the early-stopped
    vector must agree with a long fixed-k run to ~tol, and the run
    accounting must show fewer rounds than the bound."""
    from datar_polars_spark.scale import pagerank_last_run

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=60, tol=1e-10).df.collect()
    }
    acct = pagerank_last_run()
    assert acct["delta"] is not None and acct["delta"] < 1e-10
    assert 1 < acct["iterations"] < 60
    b = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=80).df.collect()
    }
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)
    with pytest.raises(ValueError, match="tol"):
        pagerank(df, tol=0.0)


def test_join_host_rank_end_to_end(spark):
    """host_graph -> pagerank -> join_host_rank: the document-prior
    loop in one call — ranked hosts get their PageRank, unranked and
    unparseable hosts get the fill, NULL column preserved with
    fill=None."""
    from datar_polars_spark import f, tibble
    from datar_polars_spark.scale import host_graph, join_host_rank

    crawl = tibble(
        spark,
        url=[
            "https://a.com/p1",
            "https://b.org/p2",
            "https://c.net/p3",
        ],
        html=[
            '<a href="https://b.org/x"></a>',
            '<a href="https://a.com/x"></a><a href="https://c.net/y"></a>',
            '<a href="https://a.com/z"></a>',
        ],
    )
    g = host_graph(crawl, f.url, f.html)
    ranks = pagerank(g, f.src_host, f.dst_host, weight=f.n_links,
                     iterations=20)
    rank_by_host = {r["node"]: r["rank"] for r in ranks.df.collect()}
    docs = tibble(
        spark,
        doc_id=[1, 2, 3, 4],
        url=[
            "https://a.com/article",
            "https://B.ORG/page",       # host lookup is case-folded
            "https://unranked.example/x",
            None,
        ],
    )
    got = {
        r["doc_id"]: r["host_rank"]
        for r in join_host_rank(docs, ranks, f.url).df.collect()
    }
    assert abs(got[1] - rank_by_host["a.com"]) < 1e-12
    assert abs(got[2] - rank_by_host["b.org"]) < 1e-12
    assert got[3] == 0.0 and got[4] == 0.0  # fill default
    nulls = {
        r["doc_id"]: r["host_rank"]
        for r in join_host_rank(
            docs, ranks, f.url, out_col="hr2", fill=None
        ).df.selectExpr("doc_id", "hr2 AS host_rank").collect()
    }
    assert nulls[3] is None and nulls[4] is None
    with pytest.raises(ValueError, match="already exists"):
        join_host_rank(docs, ranks, f.url, out_col="url")
