"""Holistic scale guard: run plan_lint over the PHYSICAL plan of every
driver gate query at sf0.001 and require zero error-severity findings
(cartesian products, mid-plan single-partition funnels). Catches a
whole class of regressions — a future verb change that sneaks a
SinglePartition exchange or an unkeyed join into ANY gate query fails
here without needing a slow full-scale run."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from datar_polars_spark.scale import plan_lint
from datar_polars_spark.tibble import ensure_tibble

SF = "/root/testdata/sf0.001"


def _gate_names():
    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _gate_names())
def test_gate_query_plan_has_no_scale_errors(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    findings = plan_lint(ensure_tibble(df))
    errors = [f for f in findings if f["severity"] == "error"]
    assert not errors, f"{name}: {errors}"
