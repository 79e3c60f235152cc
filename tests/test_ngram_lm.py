"""Stupid Backoff n-gram LM: exact score parity with a pure-Python
oracle (including backoff and OOV legs) at orders 2..5, min_count
pruning semantics (EXACT pre-pruning denominators), quality-filter
discrimination, and edge cases."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale import ngram_lm_score, ngram_lm_train
from datar_polars_spark.tibble import ensure_tibble

ALPHA = 0.4
BOS = "<s>"


def _oracle_scores(ref_texts, docs, alpha=ALPHA, min_count=1, order=2):
    uni: Counter = Counter()
    grams = {k: Counter() for k in range(2, order + 1)}
    totals = {k: Counter() for k in range(2, order + 1)}
    pad = order - 1
    for t in ref_texts:
        toks = t.strip().lower().split()
        padded = [BOS] * pad + toks
        for i, w in enumerate(toks):
            uni[w] += 1
            for k in range(2, order + 1):
                length = k - 1
                ctx = " ".join(padded[i + pad - length: i + pad])
                grams[k][(ctx, w)] += 1
                totals[k][ctx] += 1  # pre-pruning: the true c(context)
    if min_count > 1:
        for k in grams:
            grams[k] = Counter(
                {g: c for g, c in grams[k].items() if c >= min_count}
            )
    n_total = sum(uni.values())
    out = {}
    for i, t in docs:
        toks = (t or "").strip().lower().split()
        if not toks:
            out[i] = (None, None, None)
            continue
        padded = [BOS] * pad + toks
        logs, oov = [], 0
        for pos, w in enumerate(toks):
            s = None
            for k in range(order, 1, -1):
                length = k - 1
                ctx = " ".join(padded[pos + pad - length: pos + pad])
                if (ctx, w) in grams[k]:
                    s = (alpha ** (order - k)) * grams[k][(ctx, w)] / totals[k][ctx]
                    break
            if s is None:
                if w in uni:
                    s = alpha ** (order - 1) * uni[w] / n_total
                else:
                    s = alpha ** (order - 1) / n_total
            if w not in uni:
                oov += 1
            logs.append(math.log10(s))
        out[i] = (sum(logs) / len(logs), oov / len(toks), len(toks))
    return out


REF_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps in the warm sun",
    "a quick fox runs through the green field",
    "the dog and the fox are friends in the field",
    "the quick brown fox naps in the green field",
]

DOCS = [
    (1, "the quick brown fox"),  # fluent: high-order hits
    (2, "dog lazy the sun warm"),  # scrambled: backoff-heavy
    (3, "zebra xylophone quantum"),  # pure OOV
    (4, "the fox jumps over unknownword field"),  # mixed
]


@pytest.fixture(scope="module")
def ref_td(spark):
    return ensure_tibble(
        spark.createDataFrame([(t,) for t in REF_TEXTS], "text string")
    )


@pytest.fixture(scope="module")
def ref_model(spark, ref_td):
    return ngram_lm_train(ref_td)


def _spark_scores(spark, model, docs, **kw):
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    return {
        r["doc_id"]: (r["lm_logprob"], r["lm_oov_rate"], r["lm_tokens"])
        for r in ngram_lm_score(td, model, **kw).df.collect()
    }


def _assert_matches(got, want):
    for i in want:
        if want[i][0] is None:
            assert got[i][0] is None, i
            continue
        assert got[i][0] == pytest.approx(want[i][0], abs=2e-6), i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i
        assert got[i][2] == want[i][2], i


def test_model_frame_shape(spark, ref_model):
    rows = ref_model.df.collect()
    unis = [r for r in rows if r["n"] == 1]
    bis = [r for r in rows if r["n"] == 2]
    assert len(unis) > 0 and len(bis) > 0
    assert all(r["context"] is None for r in unis)
    assert all(r["context"] is not None and r["word"] is not None for r in bis)
    total = sum(r["c"] for r in unis)
    assert total == sum(len(t.split()) for t in REF_TEXTS)
    # every row carries its exact context total; unigram rows carry N
    assert all(r["c_ctx"] == total for r in unis)
    assert all(r["c_ctx"] >= r["c"] for r in bis)


def test_bigram_scores_match_oracle_exactly(spark, ref_model):
    got = _spark_scores(spark, ref_model, DOCS)
    _assert_matches(got, _oracle_scores(REF_TEXTS, DOCS))


@pytest.mark.parametrize("order", [3, 4, 5])
def test_high_order_scores_match_oracle(spark, ref_td, order):
    model = ngram_lm_train(ref_td, order=order)
    got = _spark_scores(spark, model, DOCS, order=order)
    _assert_matches(got, _oracle_scores(REF_TEXTS, DOCS, order=order))


def test_order_derived_from_model(spark, ref_td):
    # no explicit order at score time: derived from max(n) in the model
    model = ngram_lm_train(ref_td, order=3)
    got = _spark_scores(spark, model, DOCS)
    _assert_matches(got, _oracle_scores(REF_TEXTS, DOCS, order=3))


def test_fluent_beats_scrambled_beats_oov(spark, ref_model):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "dog the over fox quick jumps brown lazy the"),
        (3, "zzz yyy xxx www vvv uuu"),
    ]
    got = _spark_scores(spark, ref_model, docs)
    assert got[1][0] > got[2][0] > got[3][0]


def test_trigram_rewards_long_matches_more(spark, ref_td):
    # "the quick brown fox" appears verbatim twice in the reference —
    # the trigram model should separate it further from scrambled text
    model3 = ngram_lm_train(ref_td, order=3)
    docs = [(1, "the quick brown fox"), (2, "fox brown quick the")]
    got2 = _spark_scores(spark, ngram_lm_train(ref_td), docs)
    got3 = _spark_scores(spark, model3, docs, order=3)
    assert got3[1][0] > got3[2][0]
    assert (got3[1][0] - got3[2][0]) > (got2[1][0] - got2[2][0])


@pytest.mark.parametrize("order", [2, 3])
def test_min_count_pruning_uses_exact_prepruning_denominator(
    spark, ref_td, order
):
    # pruned rows vanish from storage but NOT from c(context): summing
    # surviving rows would undercount the denominator and inflate
    # conditional probabilities
    model2 = ngram_lm_train(ref_td, order=order, min_count=2)
    docs = [(1, "the quick brown fox"), (2, "the lazy dog sleeps")]
    got = _spark_scores(spark, model2, docs, order=order)
    _assert_matches(
        got, _oracle_scores(REF_TEXTS, docs, min_count=2, order=order)
    )
    # and the stored totals really are pre-pruning: some surviving row
    # must have c_ctx > sum of surviving counts for its context
    rows = [
        r for r in model2.df.collect()
        if r["n"] == 2 and r["word"] is not None
    ]
    by_ctx: Counter = Counter()
    for r in rows:
        by_ctx[r["context"]] += r["c"]
    assert any(r["c_ctx"] > by_ctx[r["context"]] for r in rows)


def test_empty_and_null_docs(spark, ref_model):
    docs = [(1, ""), (2, "   "), (3, None), (4, "the fox")]
    got = _spark_scores(spark, ref_model, docs)
    assert got[1][0] is None and got[2][0] is None and got[3][0] is None
    assert got[4][0] is not None
    assert len(got) == 4  # left join keeps every input row


def test_invalid_order_raises(spark, ref_td):
    with pytest.raises(ValueError, match="order"):
        ngram_lm_train(ref_td, order=1)


def test_no_python_udfs(spark, ref_td):
    model = ngram_lm_train(ref_td, order=3)
    docs = [(1, "the fox")]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    plan = (
        ngram_lm_score(td, model, order=3)
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- per-group models (by=) — the CCNet one-LM-per-language pattern --------

REF_BY_LANG = [
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "the lazy dog sleeps in the warm sun"),
    ("en", "a quick fox runs through the green field"),
    ("xx", "zab zab rok min zab rok"),
    ("xx", "rok min zab the quick"),
]

DOCS_BY_LANG = [
    (1, "en", "the quick brown fox"),
    (2, "xx", "zab rok min"),
    (3, "en", "zab rok min"),           # en-scored: mostly OOV for en
    (4, "xx", "the quick"),             # xx-scored: seen in xx ref once
    (5, "zz", "anything at all here"),  # group with NO model -> NULL
]


@pytest.fixture(scope="module")
def lang_model(spark):
    ref = ensure_tibble(
        spark.createDataFrame(REF_BY_LANG, "lang string, text string")
    )
    return ngram_lm_train(ref, order=3, by="lang")


def test_per_group_model_shape(spark, lang_model):
    rows = lang_model.df.collect()
    assert set(lang_model.df.columns) == {"lang", "n", "context", "word", "c", "c_ctx"}
    langs = {r["lang"] for r in rows}
    assert langs == {"en", "xx"}
    # per-group N: en has 25 tokens (9+8+8), xx has 11 (6+5)
    n_by = {
        r["lang"]: r["c_ctx"]
        for r in rows
        if r["n"] == 1
    }
    assert n_by["en"] == 25 and n_by["xx"] == 11


def test_per_group_scores_match_per_group_oracle(spark, lang_model):
    """Each group's scores must equal an independent single-group model
    trained on only that group's reference texts — per-group training
    is exactly group-sliced global training."""
    got = {
        r["doc_id"]: (r["lm_logprob"], r["lm_oov_rate"], r["lm_tokens"])
        for r in ngram_lm_score(
            ensure_tibble(
                spark.createDataFrame(DOCS_BY_LANG, "doc_id int, lang string, text string")
            ),
            lang_model,
            order=3,
            by="lang",
        ).df.collect()
    }
    for lang in ("en", "xx"):
        refs = [t for lg, t in REF_BY_LANG if lg == lang]
        docs = [(i, t) for i, lg, t in DOCS_BY_LANG if lg == lang]
        want = _oracle_scores(refs, docs, order=3)
        for i, w in want.items():
            assert got[i][0] == pytest.approx(w[0], abs=2e-6), (lang, i)
            assert got[i][1] == pytest.approx(w[1], abs=1e-9), (lang, i)
            assert got[i][2] == w[2], (lang, i)
    # unseen group: NULL logprob rather than a misleading floor
    assert got[5][0] is None


def test_per_group_differs_from_global(spark, lang_model):
    """'zab rok min' must score high under xx and low under en — the
    point of per-language models."""
    docs = [(2, "xx", "zab rok min"), (3, "en", "zab rok min")]
    got = {
        r["doc_id"]: (r["lm_logprob"], r["lm_oov_rate"])
        for r in ngram_lm_score(
            ensure_tibble(
                spark.createDataFrame(docs, "doc_id int, lang string, text string")
            ),
            lang_model,
            order=3,
            by="lang",
        ).df.collect()
    }
    assert got[2][0] > got[3][0]
    assert got[2][1] == 0.0 and got[3][1] == 1.0


def test_per_group_min_count_pruning(spark):
    """min_count pruning keeps EXACT pre-pruning denominators per
    group (the c_ctx contract extends to grouped models)."""
    ref = ensure_tibble(
        spark.createDataFrame(REF_BY_LANG, "lang string, text string")
    )
    model = ngram_lm_train(ref, order=2, min_count=2, by="lang")
    got = {
        r["doc_id"]: (r["lm_logprob"], r["lm_oov_rate"], r["lm_tokens"])
        for r in ngram_lm_score(
            ensure_tibble(
                spark.createDataFrame(
                    [(1, "xx", "zab rok"), (2, "en", "the quick fox")],
                    "doc_id int, lang string, text string",
                )
            ),
            model,
            order=2,
            by="lang",
        ).df.collect()
    }
    for lang, docs in (("xx", [(1, "zab rok")]), ("en", [(2, "the quick fox")])):
        refs = [t for lg, t in REF_BY_LANG if lg == lang]
        want = _oracle_scores(refs, docs, order=2, min_count=2)
        for i, w in want.items():
            assert got[i][0] == pytest.approx(w[0], abs=2e-6), (lang, i)


def test_per_group_no_python_udfs(spark, lang_model):
    docs = ensure_tibble(
        spark.createDataFrame(DOCS_BY_LANG, "doc_id int, lang string, text string")
    )
    out = ngram_lm_score(docs, lang_model, order=3, by="lang")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
