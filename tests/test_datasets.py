"""Bundled dataset loader parity (reference plugin.py:64-80 loads named
datar.data frames; here the canonical frames are embedded)."""

import pytest

from datar_polars_spark import (
    f,
    load_dataset,
    descr_datasets,
    group_by,
    summarise,
    arrange,
    inner_join,
)
from datar_polars_spark.functions import mean, n


def test_mtcars_shape_and_rownames(spark):
    td = load_dataset(spark, "mtcars")
    assert td.nrow() == 32
    assert td.columns == [
        "mpg", "cyl", "disp", "hp", "drat", "wt", "qsec", "vs", "am", "gear", "carb",
    ]
    assert td.rownames[0] == "Mazda RX4" and td.rownames[-1] == "Volvo 142E"


def test_mtcars_grouped_means(spark):
    """Classic mpg-by-cyl means (R: aggregate(mpg ~ cyl, mtcars, mean))."""
    td = load_dataset(spark, "mtcars")
    out = (
        td >> group_by(f.cyl) >> summarise(m=mean(f.mpg), k=n()) >> arrange(f.cyl)
    ).collect()
    assert out["cyl"].tolist() == [4, 6, 8]
    assert out["k"].tolist() == [11, 7, 14]
    assert out["m"].tolist() == pytest.approx([26.6636363, 19.7428571, 15.1], abs=1e-6)


def test_band_join_demo(spark):
    members = load_dataset(spark, "band_members")
    instruments = load_dataset(spark, "band_instruments")
    out = (members >> inner_join(instruments, by="name")).collect()
    assert sorted(out["name"].tolist()) == ["John", "Paul"]


def test_unknown_dataset_raises(spark):
    with pytest.raises(AttributeError, match="No such dataset"):
        load_dataset(spark, "nope")
    assert "mtcars" in descr_datasets()
