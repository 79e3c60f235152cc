"""Unicode text normalization (scale/text.py normalize_text): the
ftfy/Dolma-style cleanup that keeps byte-level noise from defeating
exact and near dedup. Each knob hand-checked; the JVM path stays
Python-free; NFKC runs through one Arrow pass."""

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale import normalize_text
from datar_polars_spark.tibble import ensure_tibble


def _run(spark, texts, **kw):
    td = ensure_tibble(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
    )
    out = normalize_text(td, **kw)
    rows = sorted(out.df.collect(), key=lambda r: r["id"])
    col = kw.get("out_col") or "text"
    return [r[col] for r in rows]


def test_zero_width_and_controls(spark):
    got = _run(
        spark,
        [
            "he​llo‌ wo‍rld﻿",  # zero-widths vanish
            "soft­hyphen",
            "tab\tand\nnewline kept",
            "bell\x07 null\x00 c1 gone",
        ],
    )
    assert got[0] == "hello world"
    assert got[1] == "softhyphen"
    assert got[2] == "tab\tand\nnewline kept"
    assert got[3] == "bell null c1 gone"


def test_spaces_and_punct(spark):
    got = _run(
        spark,
        [
            "a b c　d",  # unicode spaces -> ascii
            "“quoted” ‘single’ —dash– …",
            "«guillemets»",
        ],
    )
    assert got[0] == "a b c d"
    assert got[1] == "\"quoted\" 'single' -dash- ..."
    assert got[2] == '"guillemets"'


def test_dedup_motivation_hashes_converge(spark):
    """The point of the op: visually identical strings hash together
    after normalization."""
    a = "same​ text here"
    b = "same text here"
    got = _run(spark, [a, b])
    assert got[0] == got[1] == b


def test_collapse_whitespace_preserves_newlines(spark):
    got = _run(
        spark,
        ["a    b\t\tc\n\nparagraph   kept"],
        collapse_whitespace=True,
    )
    assert got[0] == "a b c\n\nparagraph kept"


def test_nfkc_form(spark):
    got = _run(
        spark,
        ["ﬁle ＨＥＬＬＯ ①"],
        form="nfkc",
    )
    assert got[0] == "file HELLO 1"


def test_null_passthrough_and_out_col(spark):
    td = ensure_tibble(
        spark.createDataFrame([(1, None), (2, "x​y")], "id long, text string")
    )
    out = normalize_text(td, out_col="clean")
    rows = {r["id"]: r for r in out.df.collect()}
    assert rows[1]["clean"] is None and rows[1]["text"] is None
    assert rows[2]["clean"] == "xy" and rows[2]["text"] == "x​y"


def test_validation_and_plan(spark):
    td = ensure_tibble(spark.createDataFrame([(1, "a")], "id long, text string"))
    with pytest.raises(ValueError, match="form"):
        normalize_text(td, form="nope")
    with pytest.raises(ValueError, match="out_col"):
        normalize_text(
            ensure_tibble(td.df.withColumn("clean", F.lit("x"))),
            out_col="clean",
        )
    plan = (
        normalize_text(td).df._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan  # default knobs: pure codegen
    assert "Exchange" not in plan
    plan_nfkc = (
        normalize_text(td, form="nfkc")
        .df._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan_nfkc  # the one documented Python knob


def test_idempotence_property(spark):
    """normalize(normalize(x)) == normalize(x) over adversarial
    unicode (hypothesis): every knob's output is a fixed point, so
    re-running a cleanup pipeline never changes bytes again."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                categories=(
                    "Lu", "Ll", "Nd", "Po", "Zs", "Cc", "Cf", "Pd", "Pi", "Pf",
                ),
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=15, deadline=None)
    @given(texts)
    def check(batch):
        once = _run(spark, batch, collapse_whitespace=True)
        twice = _run(spark, once, collapse_whitespace=True)
        assert twice == once

    check()
