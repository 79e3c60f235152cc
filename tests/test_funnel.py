"""Curation-funnel accounting (scale/funnel.py): sequential vs
independent counting, every stage-spec form (Column / SQL string /
datar expression / callable), NULL-predicate drop semantics,
consistency between kept and the funnel, single-aggregation plan
shape, and scan pushdown of the kept filter."""

import pytest
from pyspark.sql import functions as F

from datar_polars_spark import f, read_parquet
from datar_polars_spark.scale import filter_funnel
from datar_polars_spark.tibble import ensure_tibble


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")


def test_sequential_counts(spark):
    td = ensure_tibble(
        spark.createDataFrame(
            [(i, i % 2, i % 3) for i in range(60)], "id long, a long, b long"
        )
    )
    kept, funnel = filter_funnel(
        td, {"even": f.a == 0, "not_mult3": f.b != 0}
    )
    rows = funnel.df.collect()
    assert [r["stage"] for r in rows] == ["even", "not_mult3"]
    # 60 in, 30 even; of those (i ∈ 0,2,..58) the i%3==0 ones are
    # i ∈ {0,6,...,54} = 10 → 20 survive
    assert (rows[0]["n_in"], rows[0]["n_kept"], rows[0]["n_dropped"]) == (60, 30, 30)
    assert (rows[1]["n_in"], rows[1]["n_kept"]) == (30, 20)
    assert rows[0]["drop_rate"] == 0.5
    assert kept.df.count() == rows[-1]["n_kept"] == 20


def test_independent_counts(spark):
    td = ensure_tibble(
        spark.createDataFrame(
            [(i, i % 2, i % 3) for i in range(60)], "id long, a long, b long"
        )
    )
    _, funnel = filter_funnel(
        td, {"even": f.a == 0, "not_mult3": f.b != 0}, mode="independent"
    )
    rows = {r["stage"]: r for r in funnel.df.collect()}
    assert rows["even"]["n_in"] == 60 and rows["even"]["n_kept"] == 30
    # independent: counted against the full 60, not the 30 survivors
    assert rows["not_mult3"]["n_in"] == 60
    assert rows["not_mult3"]["n_kept"] == 40


def test_stage_spec_forms(docs):
    kept, funnel = filter_funnel(
        docs,
        {
            "col": F.col("n_chars") > 100,          # Column
            "sql": "lang is not null",               # SQL string
            "dsl": f.doc_id >= 0,                    # datar expression
            "call": lambda td: F.length(F.col("text")) > 0,  # callable
        },
    )
    rows = funnel.df.collect()
    assert len(rows) == 4
    assert rows[0]["n_in"] == docs.df.count()
    assert kept.df.count() == rows[-1]["n_kept"]


def test_null_predicate_drops(spark):
    td = ensure_tibble(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 5)], "id long, x long"
        )
    )
    kept, funnel = filter_funnel(td, {"big": f.x > 6})
    r = funnel.df.collect()[0]
    # NULL > 6 is NULL → dropped, exactly like filter_/WHERE
    assert (r["n_in"], r["n_kept"], r["n_dropped"]) == (3, 1, 2)
    assert [row["id"] for row in kept.df.collect()] == [1]


def test_single_aggregation_plan(docs):
    _, funnel = filter_funnel(
        docs,
        {"a": F.col("n_chars") > 50, "b": F.col("lang") == "en",
         "c": F.length("text") > 10},
    )
    plan = funnel.df._jdf.queryExecution().executedPlan().toString()
    # one partial+final aggregate pair over a single-row exchange — NOT
    # one count job per stage
    assert plan.count("HashAggregate") <= 2
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, plan[:2000]


def test_kept_filter_pushdown(docs):
    kept, _ = filter_funnel(docs, {"chars": F.col("n_chars") > 100})
    plan = kept.df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(n_chars,100)" in plan, plan[:2000]


def test_validation(docs):
    with pytest.raises(ValueError, match="at least one stage"):
        filter_funnel(docs, {})
    with pytest.raises(ValueError, match="mode must be"):
        filter_funnel(docs, {"a": "1=1"}, mode="bogus")
    from datar_polars_spark import group_by
    from datar_polars_spark.functions import mean

    with pytest.raises(ValueError, match="grouped aggregates"):
        filter_funnel(
            docs >> group_by(f.lang), {"agg": f.n_chars > mean(f.n_chars)}
        )


# ---------------------------------------------------------------------------
# keep_top_fraction


def test_keep_top_fraction_global(spark):
    from datar_polars_spark.scale import keep_top_fraction

    td = ensure_tibble(
        spark.createDataFrame(
            [(i, float(i)) for i in range(1000)], "id long, s double"
        )
    )
    kept = keep_top_fraction(td, "s", 0.3)
    n = kept.df.count()
    assert 280 <= n <= 320, n
    # every kept score beats every dropped score boundary
    assert kept.df.agg(F.min("s")).first()[0] >= 650


def test_keep_bottom_fraction_and_nulls(spark):
    from datar_polars_spark.scale import keep_top_fraction

    rows = [(i, float(i)) for i in range(100)] + [(1000, None)] * 5
    td = ensure_tibble(spark.createDataFrame(rows, "id long, s double"))
    kept = keep_top_fraction(td, "s", 0.2, largest=False)
    got = [r["s"] for r in kept.df.collect()]
    assert all(v is not None and v <= 25 for v in got)  # NULLs dropped
    assert 15 <= len(got) <= 25


def test_keep_top_fraction_per_key(spark):
    from datar_polars_spark.scale import keep_top_fraction

    rows = [("a", i, float(i)) for i in range(100)] + [
        ("b", i, float(1000 + i)) for i in range(100)
    ]
    td = ensure_tibble(spark.createDataFrame(rows, "k string, id long, s double"))
    kept = keep_top_fraction(td, "s", 0.1, by="k")
    per = {
        r["k"]: r["n"]
        for r in kept.df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    # BOTH keys keep ~10% — a global threshold would keep only b rows
    assert 8 <= per.get("a", 0) <= 14 and 8 <= per.get("b", 0) <= 14, per


def test_keep_top_fraction_lazy_and_validated(spark):
    from datar_polars_spark.scale import keep_top_fraction

    td = ensure_tibble(
        spark.createDataFrame([(1, 1.0)], "id long, s double")
    )
    out = keep_top_fraction(td, "s", 1.0)  # plan builds without a job
    assert "Filter" in out.df._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="frac must be"):
        keep_top_fraction(td, "s", 0.0)
    with pytest.raises(ValueError, match="frac must be"):
        keep_top_fraction(td, "s", 1.5)


def test_keep_top_fraction_funnel_composition(spark):
    """The classifier -> threshold -> funnel chain composes: the
    realized keep rate lands near the requested fraction."""
    from datar_polars_spark.scale import keep_top_fraction

    td = ensure_tibble(
        spark.createDataFrame(
            [(i, (i * 37 % 1000) / 1000.0) for i in range(2000)],
            "id long, quality double",
        )
    )
    kept = keep_top_fraction(td, "quality", 0.25)
    rate = kept.df.count() / 2000
    assert 0.22 <= rate <= 0.28, rate


# ---------------------------------------------------------------------------
# property: funnel accounting == chained filters, for random predicates


def test_funnel_matches_chained_filters_property(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    base_rows = [(i, i % 7, i % 5, i * 13 % 101) for i in range(200)]
    td = ensure_tibble(
        spark.createDataFrame(base_rows, "id long, a long, b long, c long")
    )

    pred = st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["<", "<=", ">", ">=", "=", "!="]),
        st.integers(min_value=0, max_value=100),
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(preds=st.lists(pred, min_size=1, max_size=4))
    def run(preds):
        stages = {
            f"s{i}": f"{c} {op} {v}" for i, (c, op, v) in enumerate(preds)
        }
        kept, funnel = filter_funnel(td, stages)
        rows = funnel.df.collect()
        # python twin of the sequential chain
        import operator as _op

        ops = {"<": _op.lt, "<=": _op.le, ">": _op.gt,
               ">=": _op.ge, "=": _op.eq, "!=": _op.ne}
        surv = base_rows
        expect = []
        for c, op, v in preds:
            j = {"a": 1, "b": 2, "c": 3}[c]
            nxt = [r for r in surv if ops[op](r[j], v)]
            expect.append((len(surv), len(nxt)))
            surv = nxt
        got = [(r["n_in"], r["n_kept"]) for r in rows]
        assert got == expect, (preds, got, expect)
        assert kept.df.count() == len(surv)

    run()


# ---------------------------------------------------------------------------
# drop_reason


def test_drop_reason_first_stage_wins(spark):
    from datar_polars_spark.scale import drop_reason

    td = ensure_tibble(
        spark.createDataFrame(
            [(1, 10, 10), (2, 0, 10), (3, 10, 0), (4, 0, 0), (5, None, 10)],
            "id long, a long, b long",
        )
    )
    tagged = drop_reason(td, {"a_pos": f.a > 0, "b_pos": f.b > 0})
    got = {r["id"]: r["drop_reason"] for r in tagged.df.collect()}
    # survivors NULL; first failing stage wins (id=4 fails both -> a_pos);
    # NULL predicate counts as a drop (id=5)
    assert got == {1: None, 2: "a_pos", 3: "b_pos", 4: "a_pos", 5: "a_pos"}


def test_drop_reason_consistent_with_funnel(docs):
    from datar_polars_spark.scale import drop_reason

    stages = {"chars": F.col("n_chars") > 200, "noz": F.col("lang") != "zh"}
    kept, funnel = filter_funnel(docs, stages)
    tagged = drop_reason(docs, stages)
    by_reason = {
        r["drop_reason"]: r["n"]
        for r in tagged.df.groupBy("drop_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = {r["stage"]: r for r in funnel.df.collect()}
    assert by_reason.get(None, 0) == kept.df.count()
    assert by_reason.get("chars", 0) == rows["chars"]["n_dropped"]
    assert by_reason.get("noz", 0) == rows["noz"]["n_dropped"]


def test_drop_reason_plan_jvm_only(docs):
    from datar_polars_spark.scale import drop_reason

    tagged = drop_reason(docs, {"chars": F.col("n_chars") > 200})
    plan = tagged.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    with pytest.raises(ValueError, match="at least one stage"):
        drop_reason(docs, {})
    with pytest.raises(ValueError, match="already exists"):
        drop_reason(docs, {"a": "1=1"}, out_col="text")
