"""sql_: ANSI-SQL front-end over the same Catalyst pipeline — tibbles
register as temp views (hidden columns stripped) for the query."""

from __future__ import annotations

from datar_polars_spark import f, group_by, mutate, sql_, summarise, tibble
from datar_polars_spark.functions import sum_


def test_sql_over_tibble_view(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
    out = sql_(
        spark, "SELECT g, SUM(x) AS s FROM t GROUP BY g ORDER BY g", t=td
    ).collect()
    assert out["g"].tolist() == ["a", "b"]
    assert out["s"].tolist() == [3, 3]


def test_sql_matches_verb_pipeline(spark):
    td = tibble(spark, g=["a", "a", "b"], x=[1, 2, 3])
    via_sql = sql_(
        spark, "SELECT g, SUM(x) AS s FROM t GROUP BY g", t=td
    ).collect()
    via_verbs = (td >> group_by(f.g) >> summarise(s=sum_(f.x))).collect()
    assert sorted(zip(via_sql["g"], via_sql["s"])) == sorted(
        zip(via_verbs["g"], via_verbs["s"])
    )


def test_sql_view_hides_internal_columns(spark):
    td = tibble(spark, x=[2, 1]) >> mutate(y=f.x * 2)
    out = sql_(spark, "SELECT * FROM t", t=td)
    assert sorted(out.columns) == ["x", "y"]


def test_sql_view_dropped_after_query(spark):
    td = tibble(spark, x=[1])
    sql_(spark, "SELECT * FROM tmpview_xyz", tmpview_xyz=td).collect()
    assert not any(
        t.name == "tmpview_xyz" for t in spark.catalog.listTables()
    )


def test_sql_composes_with_verbs(spark):
    td = tibble(spark, x=[3, 1, 2])
    out = (
        sql_(spark, "SELECT x FROM t WHERE x > 1", t=td)
        >> mutate(y=f.x * 10)
    ).collect()
    assert sorted(out["y"]) == [20, 30]


def test_explain_chains_and_prints(spark, capsys):
    from datar_polars_spark import explain_, filter_, mutate

    td = tibble(spark, x=[1, 2, 3])
    out = td >> filter_(f.x > 1) >> explain_("simple") >> mutate(y=f.x * 2)
    printed = capsys.readouterr().out
    assert "Physical Plan" in printed
    assert out.collect()["y"].tolist() == [4, 6]


def test_connect_reuses_active_session(spark):
    from datar_polars_spark import connect

    s2 = connect()
    assert s2 is spark or s2.sparkContext is spark.sparkContext
    assert s2.conf.get("spark.sql.adaptive.enabled") == "true"


def test_factor_levels_roundtrip_parquet(spark, tmp_path):
    """Factor levels persist through parquet as column metadata."""
    from datar_polars_spark import arrange, read_parquet, write_parquet
    from datar_polars_spark.operators.factor import as_ordered, factor_

    td = tibble(spark, k=[1, 2, 3], lv=["hi", "lo", "hi"]) >> factor_(
        f.lv, levels=["lo", "hi"]
    )
    p = str(tmp_path / "fct")
    write_parquet(td, p)
    back = read_parquet(spark, p)
    assert back.levels == {"lv": ["lo", "hi"]}
    assert (back >> arrange(f.lv)).collect()["lv"].tolist() == ["lo", "hi", "hi"]

    ordered = td >> as_ordered(f.lv)
    write_parquet(ordered, p)
    back2 = read_parquet(spark, p)
    assert "lv" in back2.ordered_factors
