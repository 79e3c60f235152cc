"""Kitchen-sink integration: one long verb chain over the real test
tables, verified value-for-value against the equivalent DuckDB SQL —
composability is where per-verb tests miss bugs (metadata propagation,
hidden-column leaks, order discipline across many steps)."""

import duckdb
import pytest

from datar_polars_spark import (
    f,
    read_parquet,
    filter_,
    mutate,
    select,
    group_by,
    summarise,
    arrange,
    inner_join,
    left_join,
    slice_max,
    count,
    rename,
    distinct,
    desc,
)
from datar_polars_spark.functions import (
    sum_,
    mean,
    n,
    n_distinct,
    if_else,
    round_,
    lag,
    min_rank,
    toupper,
    as_integer,
    floor,
)

SF = "/root/testdata/sf0.001"
TABLES = ("customer", "orders", "nation", "lineitem")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.select(*cols).collect()
    )


def _duck_rows(con, sql):
    pdf = con.execute(sql).fetchdf()
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in pdf.itertuples(index=False)
    )


def test_long_chain_matches_duckdb(spark, duck):
    """filter -> join -> join -> mutate -> group -> summarise ->
    filter-on-agg -> mutate-rank -> top-k: 9 chained verbs."""
    c = read_parquet(spark, f"{SF}/customer.parquet")
    o = read_parquet(spark, f"{SF}/orders.parquet")
    nat = read_parquet(spark, f"{SF}/nation.parquet")
    out = (
        o
        >> filter_(f.o_orderstatus != "P")
        >> inner_join(c, by={"o_custkey": "c_custkey"})
        >> inner_join(nat, by={"c_nationkey": "n_nationkey"})
        >> mutate(big=if_else(f.o_totalprice > 200000, 1, 0))
        >> group_by(f.n_name, f.c_mktsegment)
        >> summarise(
            revenue_c=sum_(as_integer(floor(f.o_totalprice * 100)), na_rm=True),
            n_big=sum_(f.big, na_rm=True),
            n_orders=n(),
        )
        >> filter_(f.n_orders >= 5)
        >> group_by(f.n_name)
        >> slice_max(f.revenue_c, n=2)
        >> select(f.n_name, f.c_mktsegment, f.revenue_c, f.n_big)
    )
    want = _duck_rows(duck, """
        WITH agg AS (
            SELECT n_name, c_mktsegment,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
                   CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderstatus != 'P'
            GROUP BY n_name, c_mktsegment
        ), ranked AS (
            SELECT *, RANK() OVER (PARTITION BY n_name ORDER BY revenue_c DESC) AS r
            FROM agg WHERE n_orders >= 5
        )
        SELECT n_name, c_mktsegment, revenue_c, n_big
        FROM ranked WHERE r <= 2
    """)
    assert _rows(out.df.select(*out.columns)) == want


def test_window_chain_matches_duckdb(spark, duck):
    """grouped lag + rank + string fn + distinct across 7 verbs."""
    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    out = (
        li
        >> filter_(f.l_quantity >= 48)
        >> group_by(f.l_suppkey)
        >> mutate(
            prev=lag(f.l_extendedprice, order_by=f.l_orderkey),
            r=min_rank(desc(f.l_extendedprice)),
            flag=toupper(f.l_returnflag),
        )
        >> filter_(f.r == 1)
        >> select(f.l_suppkey, f.l_orderkey, f.flag, f.r)
        >> distinct()
    )
    want = _duck_rows(duck, """
        SELECT DISTINCT l_suppkey, l_orderkey, UPPER(l_returnflag) AS flag, r
        FROM (
            SELECT l_suppkey, l_orderkey, l_returnflag,
                   RANK() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC) AS r
            FROM lineitem WHERE l_quantity >= 48
        ) WHERE r = 1
    """)
    assert _rows(out.df.select(*out.columns)) == want


def test_reshape_chain_matches_duckdb(spark, duck):
    """count -> pivot_wider -> pivot_longer roundtrip + mutate/filter:
    reshaping composability against DuckDB."""
    from datar_polars_spark import pivot_wider, pivot_longer
    from datar_polars_spark.functions import coalesce

    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    out = (
        li
        >> count(f.l_returnflag, f.l_linestatus)
        >> pivot_wider(names_from=f.l_linestatus, values_from=f.n, values_fill=0)
        >> pivot_longer(
            [f.F, f.O], names_to="l_linestatus", values_to="n"
        )
        >> filter_(f.n > 0)
    )
    want = _duck_rows(duck, """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem GROUP BY 1, 2
    """)
    assert _rows(out.df.select(*out.columns)) == want
