"""Port of reference tests/test_lazy.py and the applicable
tests/test_plugin.py cases (exact names). Spark frames are always
lazy, so lazy()/collect() are the identity / materialization pair."""

from __future__ import annotations

import pytest

from datar_polars_spark import Tibble, f, mutate, tibble
from datar_polars_spark.operators.tibble_verbs import collect_, lazy_


def test_lazy_on_raw_dataframe_returns_lazytibble(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> lazy_()
    assert isinstance(out, Tibble)


def test_lazy_on_tibble_converts_to_lazytibble(spark):
    td = tibble(spark, x=[1, 2]) >> mutate(y=f.x + 1)
    out = td >> lazy_()
    assert isinstance(out, Tibble)


def test_lazy_direct_call(spark):
    td = tibble(spark, x=[1])
    assert isinstance(lazy_(td), Tibble)


def test_collect_on_tibble_returns_tibble(spark):
    td = tibble(spark, x=[1, 2, 3])
    out = td >> collect_()
    assert list(out["x"]) == [1, 2, 3]


def test_collect_on_already_collected_dataframe(spark):
    td = tibble(spark, x=[1, 2])
    pdf = collect_(td)
    assert len(pdf) == 2


def test_collect_direct_call(spark):
    td = tibble(spark, x=[5])
    assert collect_(td)["x"].tolist() == [5]


def test_get_versions():
    from datar_polars_spark import get_versions

    versions = get_versions()
    assert "datar-polars-spark" in versions
    assert "pyspark" in versions


def test_load_dataset_not_implemented_for_most_datasets(spark):
    from datar_polars_spark import load_dataset

    with pytest.raises(AttributeError, match="No such dataset"):
        load_dataset(spark, "nonexistent_dataset_xyz")


def test_dplyr_api_imports():
    from datar_polars_spark import (
        arrange,
        distinct,
        filter_,
        group_by,
        mutate,
        select,
        summarise,
    )

    for v in (mutate, filter_, select, arrange, group_by, summarise, distinct):
        assert callable(v)
