"""Regression tests for stale sort_meta (round-2 ADVICE, high).

sort_meta records the last arrange's first sort key so that the
key-bucket two-pass window rewrite (plans/context.py:_key_bucket) can
bucket on its VALUES. It is only valid while frame order still follows
those values: any verb that REWRITES the key column (replace_na, fill,
rows_update, separate, ...) must invalidate it, otherwise downstream
cumulative windows bucket on the NEW values while the frame order
follows the OLD ones — silently wrong results.

Round-2 repro (advisor): arrange(f.x) >> replace_na({'x': -1}) >>
mutate(cumsum(f.x)) returned wrong cumsum for every row. The fix flips
the default: Tibble.with_df DROPS sort_meta unless the call site
proves value/order preservation (keep_sort_meta=True).
"""

from __future__ import annotations

import pandas as pd
import pytest

from datar_polars_spark import (
    arrange,
    f,
    filter_,
    mutate,
    replace_na,
    select,
    tibble,
)
from datar_polars_spark.functions import cumsum, row_number
from datar_polars_spark.operators.tidyr import fill

from conftest import assert_iterable_equal


def _mk(spark, n=200):
    # x: every 3rd value null so replace_na actually rewrites rows
    xs = [None if i % 3 == 0 else float(i % 17) for i in range(n)]
    return tibble(spark, x=xs, y=list(range(n)))


def test_replace_na_after_arrange_invalidates_sort_meta(spark):
    td = _mk(spark) >> arrange(f.x) >> replace_na({"x": -1.0})
    assert td.sort_meta is None
    out = (td >> mutate(cs=cumsum(f.x))).collect()
    expect = pd.Series(out["x"]).cumsum().tolist()
    assert_iterable_equal(out["cs"].tolist(), expect, approx=True)


def test_fill_after_arrange_invalidates_sort_meta(spark):
    td = _mk(spark) >> arrange(f.x) >> fill(f.x, _direction="down")
    assert td.sort_meta is None


def test_value_preserving_verbs_keep_sort_meta(spark):
    td = _mk(spark) >> arrange(f.x)
    assert td.sort_meta == ("x", True)
    assert (td >> filter_(f.y > 10)).sort_meta == ("x", True)
    assert (td >> mutate(z=f.y + 1)).sort_meta == ("x", True)
    assert (td >> select(f.x, f.y)).sort_meta == ("x", True)
    # mutate overwriting the key still invalidates
    assert (td >> mutate(x=f.x + 1)).sort_meta is None


def test_select_rename_remaps_or_drops_sort_meta(spark):
    td = _mk(spark) >> arrange(f.x)
    # key renamed away: remapped to the new name (values unchanged)
    ren = td >> select(x2=f.x)
    assert ren.sort_meta == ("x2", True)
    # key renamed away AND another column renamed onto "x": the meta
    # must follow the key's values to its new name, not the usurper
    swapped = td >> select(z=f.x, x=f.y)
    assert swapped.sort_meta == ("z", True)


def test_post_rewrite_cumsum_correct_end_to_end(spark):
    """The full advisor repro, checked value-by-value."""
    td = (
        _mk(spark)
        >> arrange(f.x)
        >> replace_na({"x": -1.0})
        >> mutate(cs=cumsum(f.x), rn=row_number())
    )
    out = td.collect()
    expect = pd.Series(out["x"]).cumsum().tolist()
    assert_iterable_equal(out["cs"].tolist(), expect, approx=True)
    assert out["rn"].tolist() == list(range(1, len(out) + 1))
