"""Property-based tests (hypothesis): the row-order discipline and core
verb semantics hold for arbitrary small frames, with pandas as oracle.
The reference has no property tests — this locks in the engine's one
custom invariant (SURVEY §1.4) harder than example tests can."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datar_polars_spark import (
    f,
    tibble,
    arrange,
    mutate,
    filter_,
    group_by,
    summarise,
    slice_,
    distinct,
    desc,
)
from datar_polars_spark.functions import lag, lead, cumsum, row_number, sum_

# r15: heavy property/fuzz breadth — skipped by the default
# "-m not slow" run (driver verify window); tools/partest.py and
# any explicit -m override still run it in full.
pytestmark = pytest.mark.slow

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

vals = st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=12)


@given(xs=vals)
@SET
def test_arrange_matches_pandas_stable_sort(spark, xs):
    td = tibble(spark, x=xs, i=list(range(len(xs))))
    got = (td >> arrange(f.x)).collect()
    exp = pd.DataFrame({"x": xs, "i": range(len(xs))}).sort_values(
        "x", kind="stable"
    )
    assert got["x"].tolist() == exp["x"].tolist()
    assert got["i"].tolist() == exp["i"].tolist()  # stability


@given(xs=vals)
@SET
def test_lead_lag_frame_order(spark, xs):
    td = tibble(spark, x=xs)
    got = (td >> mutate(l1=lag(f.x), n1=lead(f.x))).collect()
    assert got["x"].tolist() == xs
    exp_lag = [None] + xs[:-1]
    exp_lead = xs[1:] + [None]
    assert [None if pd.isna(v) else int(v) for v in got["l1"]] == exp_lag
    assert [None if pd.isna(v) else int(v) for v in got["n1"]] == exp_lead


@given(xs=vals)
@SET
def test_cumsum_frame_order(spark, xs):
    td = tibble(spark, x=xs)
    got = (td >> mutate(cs=cumsum(f.x))).collect()
    run, exp = 0, []
    for v in xs:
        run += v
        exp.append(run)
    assert got["cs"].tolist() == exp


@given(xs=vals, g=st.lists(st.sampled_from("ab"), min_size=1, max_size=12))
@SET
def test_grouped_sum_matches_pandas(spark, xs, g):
    n = min(len(xs), len(g))
    xs, g = xs[:n], g[:n]
    td = tibble(spark, g=g, x=xs)
    got = (td >> group_by(f.g) >> summarise(s=sum_(f.x, na_rm=True))).collect()
    exp = pd.DataFrame({"g": g, "x": xs}).groupby("g")["x"].sum()
    assert dict(zip(got["g"], got["s"])) == exp.to_dict()


@given(xs=vals)
@SET
def test_filter_then_row_number_compacts(spark, xs):
    td = tibble(spark, x=xs)
    got = (td >> filter_(f.x > 0) >> mutate(rn=row_number())).collect()
    kept = [v for v in xs if v > 0]
    assert got["x"].tolist() == kept
    assert got["rn"].tolist() == list(range(1, len(kept) + 1))


@given(xs=vals)
@SET
def test_slice_positions(spark, xs):
    td = tibble(spark, x=xs)
    take = [1, min(3, len(xs))]
    got = (td >> slice_(*take)).collect()
    exp = [xs[i - 1] for i in dict.fromkeys(take)]
    assert got["x"].tolist() == exp


@given(xs=vals)
@SET
def test_distinct_keeps_first_seen_order(spark, xs):
    td = tibble(spark, x=xs)
    got = (td >> distinct(f.x)).collect()
    assert got["x"].tolist() == list(dict.fromkeys(xs))


@given(xs=vals)
@SET
def test_arrange_desc_then_asc_roundtrip(spark, xs):
    td = tibble(spark, x=xs)
    got = (td >> arrange(desc(f.x)) >> arrange(f.x)).collect()
    assert got["x"].tolist() == sorted(xs)


# ---- column reorderers (sort/order/rank) vs python oracles ----------------

@given(xs=vals)
@SET
def test_sort_column_matches_python(spark, xs):
    from datar_polars_spark.functions import sort_

    td = tibble(spark, x=xs)
    got = list((td >> mutate(s=sort_(f.x))).collect()["s"])
    assert got == sorted(xs)


@given(xs=vals)
@SET
def test_order_column_is_argsort(spark, xs):
    from datar_polars_spark.functions import order_

    td = tibble(spark, x=xs)
    got = list((td >> mutate(o=order_(f.x))).collect()["o"])
    exp = sorted(range(len(xs)), key=lambda i: (xs[i], i))
    assert got == exp


@given(xs=vals)
@SET
def test_rank_min_matches_python(spark, xs):
    from datar_polars_spark.functions import rank

    td = tibble(spark, x=xs)
    got = list((td >> mutate(r=rank(f.x, ties_method="min"))).collect()["r"])
    exp = [1 + sum(1 for y in xs if y < v) for v in xs]
    assert got == exp


@given(xs=vals)
@SET
def test_rank_average_matches_python(spark, xs):
    from datar_polars_spark.functions import rank

    td = tibble(spark, x=xs)
    got = list((td >> mutate(r=rank(f.x))).collect()["r"])
    exp = [
        (1 + sum(1 for y in xs if y < v) + sum(1 for y in xs if y <= v)) / 2
        for v in xs
    ]
    assert got == pytest.approx(exp)


@given(xs=st.lists(st.text(alphabet="ab \n", min_size=0, max_size=30), min_size=1, max_size=6))
@SET
def test_dup_line_fraction_bounds_and_python_oracle(spark, xs):
    from datar_polars_spark.functions import builder

    dup_line_fraction = builder("dup_line_fraction")
    td = tibble(spark, t=xs)
    got = list((td >> mutate(d=dup_line_fraction(f.t))).collect()["d"])
    for v, s in zip(got, xs):
        lines = [l for l in s.split("\n") if l.strip()]
        exp = 1 - len(set(lines)) / len(lines) if lines else 0.0
        assert v == pytest.approx(exp)
        assert 0.0 <= v < 1.0 or v == 0.0


@given(
    res=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1, max_size=8,
    ),
    ims=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1, max_size=8,
    ),
)
@SET
def test_complex_roundtrip_and_identities(spark, res, ims):
    """re/im round-trip, |conj(z)| == |z|, arg matches cmath.

    Negative zero is canonicalized: IEEE -0.0 puts arg on the other
    side of the branch cut (+/-pi), and the sign of zero does not
    survive the pandas -> Spark row conversion — an edge no data
    pipeline depends on."""
    import cmath

    from datar_polars_spark.functions import arg, complex_, conj, im, mod, re_

    n = min(len(res), len(ims))
    # clamp negative zero AND subnormals: CPython's cmath.phase raises
    # OverflowError ("math range error") on subnormal components, so the
    # ORACLE can't evaluate them (hypothesis-found, 5e-324)
    res = [0.0 if v == 0 or abs(v) < 1e-300 else v for v in res[:n]]
    ims = [0.0 if v == 0 or abs(v) < 1e-300 else v for v in ims[:n]]
    td = tibble(spark, r=res, i=ims) >> mutate(z=complex_(real=f.r, imaginary=f.i))
    out = (
        td >> mutate(rr=re_(f.z), ii=im(f.z), m=mod(f.z), a=arg(f.z),
                     cm=mod(conj(f.z)))
    ).collect()
    for k in range(n):
        zz = complex(res[k], ims[k])
        assert out["rr"][k] == pytest.approx(res[k])
        assert out["ii"][k] == pytest.approx(ims[k])
        assert out["m"][k] == pytest.approx(abs(zz), abs=1e-9)
        assert out["cm"][k] == pytest.approx(abs(zz), abs=1e-9)
        if zz != 0:
            assert out["a"][k] == pytest.approx(cmath.phase(zz), abs=1e-9)


@given(xs=vals)
@SET
def test_list_assignment_positional(spark, xs):
    """mutate(y=<list>) assigns by frame position for any frame."""
    ys = [v * 10 + 1 for v in xs]
    td = tibble(spark, x=xs)
    out = (td >> mutate(y=ys)).collect() if len(ys) != 1 else None
    if out is not None:
        assert out["y"].tolist() == ys
        assert out["x"].tolist() == xs
