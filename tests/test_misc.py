"""Long-tail verbs: table/tabulate, complete_cases, pick, which,
with_order, special math functions."""

import math

import pytest

from datar_polars_spark import (
    f,
    tibble,
    mutate,
    group_by,
    table_,
    tabulate,
    complete_cases,
    pick,
    which_,
    which_min_,
    which_max_,
    nrow,
    ncol,
    dim,
    colnames,
    desc,
)
from datar_polars_spark.functions import (
    gamma,
    lgamma,
    choose,
    cumsum,
    with_order,
    lag,
)

from conftest import assert_frame_equal, assert_iterable_equal


def test_table_one_var(spark):
    td = tibble(spark, x=["b", "a", "b", "b"])
    out = table_(td, f.x)
    assert_frame_equal(out.collect(), {"x": ["a", "b"], "n": [1, 3]})


def test_table_two_var_includes_zeros(spark):
    td = tibble(spark, x=["a", "a", "b"], y=["u", "v", "u"])
    out = table_(td, f.x, f.y)
    assert_frame_equal(
        out.collect(),
        {"x": ["a", "a", "b", "b"], "y": ["u", "v", "u", "v"], "n": [1, 1, 1, 0]},
    )


def test_tabulate(spark):
    td = tibble(spark, x=[2, 3, 3, 5])
    assert tabulate(td, f.x, 5) == [0, 1, 2, 0, 1]


def test_complete_cases(spark):
    td = tibble(spark, x=[1.0, None, 3.0], y=["a", "b", None])
    out = complete_cases(td)
    assert_frame_equal(out.collect(), {"x": [1.0], "y": ["a"]})


def test_pick_keeps_groups(spark):
    td = tibble(spark, g=[1, 2], a=[3, 4], b=[5, 6]) >> group_by(f.g)
    out = td >> pick(f.b)
    assert out.columns == ["g", "b"]
    assert out.group_vars == ("g",)


def test_which(spark):
    td = tibble(spark, x=[5, 1, 7, 1])
    assert which_(td, f.x > 4) == [1, 3]
    assert which_min_(td, f.x) == 2
    assert which_max_(td, f.x) == 3
    assert nrow(td) == 4
    assert ncol(td) == 1
    assert dim(td) == (4, 1)
    assert colnames(td) == ["x"]


def test_with_order(spark):
    td = tibble(spark, t=[3, 1, 2], x=[30, 10, 20])
    # cumsum in t-order, result in frame order: t=3 row sees 10+20+30
    out = td >> mutate(cs=with_order(f.t, cumsum(f.x)))
    assert_iterable_equal(out.collect()["cs"].tolist(), [60, 10, 30])
    out2 = td >> mutate(prev=with_order(desc(f.t), lag(f.x)))
    assert_iterable_equal(out2.collect()["prev"].tolist(), [None, 20, 30])


def test_special_math(spark):
    td = tibble(spark, x=[1.0, 4.0, 0.5])
    out = td >> mutate(g=gamma(f.x), lg=lgamma(f.x))
    got = out.collect()
    assert got["g"].tolist() == pytest.approx([1.0, 6.0, math.sqrt(math.pi)])
    assert got["lg"].tolist() == pytest.approx([0.0, math.log(6.0), math.lgamma(0.5)])


def test_choose(spark):
    td = tibble(spark, n=[5.0, 6.0], k=[2.0, 3.0])
    out = td >> mutate(c=choose(f.n, f.k))
    assert out.collect()["c"].tolist() == pytest.approx([10.0, 20.0])


def test_glimpse_runs(spark, capsys):
    from datar_polars_spark import glimpse

    td = tibble(spark, x=[1, 2, 3], s=["a", "b", "c"])
    glimpse(td)
    outp = capsys.readouterr().out
    assert "x" in outp and "s" in outp


def test_as_integer_factor_codes(spark):
    from datar_polars_spark import factor_, fct_relevel
    from datar_polars_spark.functions import as_integer

    td = tibble(spark, x=["b", "a", "c"]) >> factor_(f.x)
    out = td >> mutate(code=as_integer(f.x))
    # default levels sorted: a=1, b=2, c=3
    assert out.collect()["code"].tolist() == [2, 1, 3]
    # releveling changes the codes
    out2 = td >> fct_relevel(f.x, "c") >> mutate(code=as_integer(f.x))
    assert out2.collect()["code"].tolist() == [3, 2, 1]
    # non-factor: plain cast
    tn = tibble(spark, y=["10", "11"]) >> mutate(v=as_integer(f.y))
    assert tn.collect()["v"].tolist() == [10, 11]


def test_t_diag_max_col(spark):
    from datar_polars_spark import t_, diag_, max_col

    td = tibble(spark, a=[1, 4], b=[2, 5], c=[3, 6])
    tp = t_(td).collect()
    assert list(tp.columns) == ["V1", "V2"]
    assert tp["V1"].tolist() == [1, 2, 3]
    assert tp["V2"].tolist() == [4, 5, 6]
    assert diag_(td) == [1, 5]
    mc = max_col(td).collect()
    assert mc["max_col"].tolist() == [3, 3]
    mc2 = max_col(td, f.a, f.b).collect()
    assert mc2["max_col"].tolist() == [2, 2]


def test_sink_roundtrips(spark, tmp_path):
    """write_csv / write_json / write_orc round-trip through their readers."""
    from datar_polars_spark import (
        tibble,
        read_csv,
        read_json,
        read_orc,
        write_csv,
        write_json,
        write_orc,
        arrange,
        f,
    )

    td = tibble(spark, k=[1, 2, 3], s=["a", "b", "c"])
    for writer, reader, name in (
        (write_csv, read_csv, "csv"),
        (write_json, read_json, "json"),
        (write_orc, read_orc, "orc"),
    ):
        p = str(tmp_path / name)
        writer(td, p)
        back = (reader(spark, p) >> arrange(f.k)).collect()
        assert back["k"].tolist() == [1, 2, 3]
        assert back["s"].tolist() == ["a", "b", "c"]


def test_read_write_text_roundtrip(spark, tmp_path):
    from datar_polars_spark import read_text, write_text, tibble

    t = tibble(spark, text=["line one", "line two", "line three"])
    out = str(tmp_path / "txt")
    write_text(t, out)
    back = read_text(spark, out)
    assert sorted(back.collect()["text"]) == ["line one", "line three", "line two"]


def test_read_text_whole_file(spark, tmp_path):
    from datar_polars_spark import read_text

    p = tmp_path / "doc.txt"
    p.write_text("alpha\nbeta\n")
    td = read_text(spark, str(p), whole_file=True)
    pdf = td.collect()
    assert list(pdf.columns) == ["path", "text"]
    assert pdf["text"][0] == "alpha\nbeta\n"


def test_cache_unpersist_roundtrip(spark):
    from datar_polars_spark import cache_, unpersist_, tibble, mutate, f

    t = tibble(spark, x=[1, 2, 3]) >> mutate(y=f.x * 2) >> cache_()
    assert t.df.is_cached
    assert t.nrow() == 3  # materializes the cache
    t2 = t >> unpersist_()
    assert not t2.df.is_cached


def test_read_binary_decodes_multimodal(spark, tmp_path):
    """binaryFile source -> decode_images: a directory of image files
    ingests as one row per file (path/modification_time/length/content)
    and the content column feeds the Arrow-batched decode pass; the
    glob filter prunes at file LISTING, not post-scan."""
    from datar_polars_spark import read_binary
    from datar_polars_spark.scale import decode_images
    from datar_polars_spark.scale.codecs import make_png, make_gif

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.png").write_bytes(make_png(12, 34))
    (d / "b.png").write_bytes(make_png(56, 78))
    (d / "c.gif").write_bytes(make_gif(9, 9))
    (d / "notes.txt").write_text("not an image")

    td = read_binary(spark, str(d))
    assert td.columns == ["path", "modification_time", "length", "content"]
    assert td.df.count() == 4

    png_only = read_binary(spark, str(d), glob="*.png")
    assert png_only.df.count() == 2

    dec = decode_images(png_only, strict=True).collect()
    got = {r["path"].rsplit("/", 1)[-1]: (r["format"], r["width"], r["height"])
           for _, r in dec.iterrows()}
    assert got == {"a.png": ("png", 12, 34), "b.png": ("png", 56, 78)}


def test_read_binary_recursive(spark, tmp_path):
    from datar_polars_spark import read_binary
    from datar_polars_spark.scale.codecs import make_bmp

    (tmp_path / "x" / "y").mkdir(parents=True)
    (tmp_path / "x" / "y" / "deep.bmp").write_bytes(make_bmp(3, 4))
    flat = read_binary(spark, str(tmp_path), glob="*.bmp")
    deep = read_binary(spark, str(tmp_path), glob="*.bmp", recursive=True)
    assert flat.df.count() == 0
    assert deep.df.count() == 1
    row = deep.df.select("length", "content").first()
    assert row["length"] == len(row["content"])
