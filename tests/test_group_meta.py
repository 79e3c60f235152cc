"""Group metadata / iteration verbs + tibble constructors + vector fns
(modeled on reference tests/dplyr/test_group_data.py, test_group_map.py,
tests/tibble/)."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    group_by,
    mutate,
    summarise,
    arrange,
    group_vars,
    group_keys,
    group_size,
    n_groups,
    group_data,
    group_rows,
    group_indices,
    group_split,
    group_map,
    group_modify,
    with_groups,
    tribble,
    tibble_row,
    enframe,
    deframe,
    add_row,
    add_column,
    rowid_to_column,
)
from datar_polars_spark.functions import (
    sum_,
    mean,
    rev_,
    duplicated,
    cur_group_id,
    row_sums,
    row_means,
)

from conftest import assert_frame_equal, assert_iterable_equal


@pytest.fixture
def gdf(spark):
    return tibble(spark, g=["b", "a", "b", "a", "c"], x=[1, 2, 3, 4, 5])


def test_group_metadata(gdf):
    g = gdf >> group_by(f.g)
    assert (g >> group_vars()) == ["g"]
    assert_frame_equal(group_keys(g).collect(), {"g": ["a", "b", "c"]})
    assert (g >> group_size()) == [2, 2, 1]
    assert (g >> n_groups()) == 3


def test_group_data_rows_indices(gdf):
    g = gdf >> group_by(f.g)
    gd = group_data(g).collect()
    assert list(gd.columns) == ["g", "_rows"]
    assert [list(r) for r in gd["_rows"]] == [[1, 3], [0, 2], [4]]
    assert group_rows(g) == [[1, 3], [0, 2], [4]]
    assert group_indices(g) == [2, 1, 2, 1, 3]


def test_group_split_map(gdf):
    g = gdf >> group_by(f.g)
    parts = group_split(g)
    assert [p.collect()["x"].tolist() for p in parts] == [[2, 4], [1, 3], [5]]
    sums = group_map(g, lambda pdf, key: int(pdf["x"].sum()))
    assert sums == [6, 4, 5]


def test_group_modify_applyinpandas(gdf):
    g = gdf >> group_by(f.g)

    def topn(pdf):
        return pdf.nlargest(1, "x")[["x"]]

    out = group_modify(g, topn, "x long") >> arrange(f.g)
    assert_frame_equal(out.collect(), {"g": ["a", "b", "c"], "x": [4, 3, 5]})


def test_with_groups(gdf):
    out = gdf >> group_by(f.g) >> with_groups(None, summarise(total=sum_(f.x)))
    assert out.collect()["total"].tolist() == [15]


def test_cur_group_id(gdf):
    out = gdf >> group_by(f.g) >> mutate(gid=cur_group_id())
    assert_iterable_equal(out.collect()["gid"].tolist(), [2, 1, 2, 1, 3])


def test_tribble_and_row(spark):
    td = tribble(f.x, f.y, 1, "a", 2, "b")
    assert_frame_equal(td.collect(), {"x": [1, 2], "y": ["a", "b"]})
    tr = tibble_row(x=5, y="z")
    assert_frame_equal(tr.collect(), {"x": [5], "y": ["z"]})


def test_enframe_deframe(spark):
    spark.sparkContext.setLogLevel("ERROR")
    td = enframe({"a": 1, "b": 2})
    assert_frame_equal(td.collect(), {"name": ["a", "b"], "value": [1, 2]})
    assert deframe(td) == {"a": 1, "b": 2}
    td2 = enframe([10, 20])
    assert_frame_equal(td2.collect(), {"name": [1, 2], "value": [10, 20]})


def test_add_row(spark):
    td = tibble(spark, x=[1, 2], y=["a", "b"])
    out = td >> add_row(x=3, y="c")
    assert_frame_equal(out.collect(), {"x": [1, 2, 3], "y": ["a", "b", "c"]})
    out2 = td >> add_row(x=0, _before=1)
    assert_frame_equal(
        out2.collect(), {"x": [0, 1, 2], "y": [None, "a", "b"]}
    )


def test_add_column(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> add_column(y=[9, 8, 7], _before=f.x)
    assert_frame_equal(out.collect(), {"y": [9, 8, 7], "x": [1, 2, 3]})


def test_rowid_to_column(spark):
    td = tibble(spark, x=["c", "a", "b"])
    out = td >> rowid_to_column()
    assert_frame_equal(out.collect(), {"rowid": [1, 2, 3], "x": ["c", "a", "b"]})


def test_rev_duplicated(spark):
    td = tibble(spark, g=["a", "a", "b", "b"], x=[1, 2, 3, 3])
    out = td >> mutate(r=rev_(f.x), d=duplicated(f.x))
    assert_frame_equal(
        out.collect(),
        {"g": ["a", "a", "b", "b"], "x": [1, 2, 3, 3],
         "r": [3, 3, 2, 1], "d": [False, False, False, True]},
    )
    gout = td >> group_by(f.g) >> mutate(r=rev_(f.x))
    assert_iterable_equal(gout.collect()["r"].tolist(), [2, 1, 3, 3])


def test_row_sums_means(spark):
    td = tibble(spark, a=[1.0, None], b=[2.0, 4.0])
    out = td >> mutate(s=row_sums(f.a, f.b), sn=row_sums(f.a, f.b, na_rm=True),
                       m=row_means(f.a, f.b, na_rm=True))
    assert_frame_equal(
        out.collect(),
        {"a": [1.0, None], "b": [2.0, 4.0], "s": [3.0, None],
         "sn": [3.0, 4.0], "m": [1.5, 4.0]},
    )


def test_group_trim(spark):
    from datar_polars_spark import factor_, fct_expand, filter_, group_trim, levels_

    td = (
        tibble(spark, x=["a", "b"], v=[1, 2])
        >> factor_(f.x)
        >> fct_expand(f.x, "c")
        >> group_by(f.x)
    )
    assert levels_(td, f.x) == ["a", "b", "c"]
    trimmed = td >> filter_(f.v > 1) >> group_trim()
    assert levels_(trimmed, f.x) == ["b"]


def test_api_audit_additions(spark):
    from datar_polars_spark import (
        as_tibble, lazy_, collect_, group_by_drop_default,
        rownames_to_column, recode_factor, levels_, factor_,
    )
    from datar_polars_spark.functions import cur_data_all, lengths

    td = as_tibble({"x": [1, 2]}, spark)
    assert td.columns == ["x"]
    assert (td >> lazy_()).columns == ["x"]
    assert (td >> collect_())["x"].tolist() == [1, 2]
    assert group_by_drop_default(td) is True
    assert group_by_drop_default(td >> group_by(f.x, _drop=False)) is False

    rn = td >> rownames_to_column()
    assert rn.collect()["rowname"].tolist() == ["1", "2"]

    fc = tibble(spark, x=["lo", "hi", "mid"]) >> factor_(f.x)
    rec = recode_factor(fc, f.x, lo="low", hi="high")
    assert levels_(rec, f.x)[:2] == ["low", "high"]
    assert sorted(rec.collect()["x"].tolist()) == ["high", "low", "mid"]

    g = tibble(spark, g=["a", "a", "b"], v=[1, 2, 3]) >> group_by(f.g)
    out = g >> mutate(sz=lengths(cur_data_all()))
    assert out.collect()["sz"].tolist() == [2, 2, 1]


def test_group_map_one_param_fn(spark):
    from datar_polars_spark import f, group_by, tibble
    from datar_polars_spark.operators.group_meta import group_map

    td = tibble(spark, g=["b", "a", "a"], x=[1, 2, 3])
    out = td >> group_by(f.g) >> group_map(lambda d: d.shape)
    assert out == [(2, 1), (1, 1)]


def test_group_map_two_param_fn_gets_keys(spark):
    from datar_polars_spark import f, group_by, tibble
    from datar_polars_spark.operators.group_meta import group_map

    td = tibble(spark, g=["b", "a", "a"], x=[1, 2, 3])
    out = td >> group_by(f.g) >> group_map(lambda d, k: (k["g"], len(d)))
    assert out == [("a", 2), ("b", 1)]


def test_with_groups_reference_calling_convention(spark):
    """reference group_iter.py:73-117: with_groups(.groups, .f, **kwargs)"""
    from datar_polars_spark import f, group_by, mutate, summarise, tibble
    from datar_polars_spark.functions import sum_
    from datar_polars_spark.operators.group_meta import with_groups

    td = tibble(spark, g=["b", "a", "a"], x=[1, 2, 3])
    out = (td >> with_groups(f.g, summarise, s=sum_(f.x))).collect()
    assert dict(zip(out["g"], out["s"])) == {"a": 5, "b": 1}

    # None temporarily ungroups
    out2 = (
        td >> group_by(f.g) >> with_groups(None, mutate, s=sum_(f.x))
    )
    assert out2.collect()["s"].tolist() == [6, 6, 6]
    assert tuple(out2.group_vars) == ("g",)


def test_group_modify_infers_schema(spark):
    """Schema omitted (reference convention): inferred from one sample
    group on the driver."""
    from datar_polars_spark import f, group_by, tibble
    from datar_polars_spark.operators.group_meta import group_modify

    td = tibble(spark, g=["b", "a", "a"], x=[1.0, 2.0, 3.0])
    out = (
        td >> group_by(f.g) >> group_modify(lambda d: d.assign(dx=d["x"] * 2))
    ).collect()
    assert sorted(out.columns) == ["dx", "g", "x"]
    assert sorted(zip(out["g"], out["dx"])) == [("a", 4.0), ("a", 6.0), ("b", 2.0)]
