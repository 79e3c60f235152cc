"""Final exact-name residue (round 3): dplyr/test_count.py starwars
cases against a synthetic starwars-shaped frame, and the reframe
frame-splice cases re-expressed with our multi-value summarise protocol
(quantile + parallel literal vector zip-explode — same output frame as
the reference's spliced helper tibble)."""

from __future__ import annotations

import pytest

from datar_polars_spark import count, f, group_by, reframe, tibble
from datar_polars_spark.functions import quantile, round_


def _starwars(spark):
    # sex/gender distribution mirroring the real table's top-3 ranks
    rows = (
        [("male", "masculine")] * 60
        + [("female", "feminine")] * 16
        + [("none", "masculine")] * 5
        + [("hermaphroditic", "masculine")] * 1
    )
    by = [10.0 * (i % 7) for i in range(len(rows))]
    return tibble(
        spark,
        sex=[r[0] for r in rows],
        gender=[r[1] for r in rows],
        birth_year=by,
    )


class TestCountStarwars:
    def test_count_starwars(self, spark):
        out = (_starwars(spark) >> count(f.sex, f.gender, sort=True)).collect()
        assert out["n"].tolist()[:3] == [60, 16, 5]

    def test_count_starwars2(self, spark):
        sw = _starwars(spark)
        sw >> count(f.sex)  # a prior count must not change behavior
        out = (sw >> count(f.sex, f.gender, sort=True)).collect()
        assert out["n"].tolist()[:3] == [60, 16, 5]

    def test_count_starwars3(self, spark):
        out = (
            _starwars(spark) >> count(birth_decade=round_(f.birth_year, -1))
        ).collect()
        assert len(out) == 7
        assert out["n"].sum() == 82


class TestReframeSplice:
    def test_reframe_splices_helper_tibble(self, spark):
        td = tibble(spark, disp=[float(i) for i in range(1, 33)])
        out = (
            td
            >> reframe(
                val=quantile(f.disp, [0.25, 0.5, 0.75]),
                quant=[0.25, 0.5, 0.75],
            )
        ).collect()
        assert list(out.columns) == ["val", "quant"]
        assert out.shape == (3, 2)
        assert out["quant"].tolist() == [0.25, 0.5, 0.75]

    def test_reframe_across_splices_helper_tibble(self, spark):
        td = tibble(
            spark,
            disp=[float(i) for i in range(1, 9)],
            hp=[float(i * 2) for i in range(1, 9)],
        )
        out = (
            td
            >> reframe(
                disp_q=quantile(f.disp, [0.25, 0.5, 0.75]),
                hp_q=quantile(f.hp, [0.25, 0.5, 0.75]),
                quant=[0.25, 0.5, 0.75],
            )
        ).collect()
        assert out.shape == (3, 3)
        assert out["quant"].tolist() == [0.25, 0.5, 0.75]

    def test_reframe_grouped_splices_helper_tibble(self, spark):
        td = tibble(
            spark,
            cyl=[4, 4, 4, 4, 6, 6, 6, 6],
            disp=[1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0],
        )
        out = (
            td
            >> group_by(f.cyl)
            >> reframe(
                val=quantile(f.disp, [0.25, 0.5, 0.75]),
                quant=[0.25, 0.5, 0.75],
            )
        ).collect()
        assert out.shape == (6, 3)
        assert out["quant"].tolist() == [0.25, 0.5, 0.75] * 2
