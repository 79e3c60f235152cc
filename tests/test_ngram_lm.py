"""Stupid Backoff n-gram LM: exact score parity with a pure-Python
oracle (including backoff and OOV legs), min_count pruning semantics,
quality-filter discrimination, and edge cases."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale import ngram_lm_score, ngram_lm_train
from datar_polars_spark.tibble import ensure_tibble

ALPHA = 0.4
BOS = "<s>"


def _oracle_scores(ref_texts, docs, alpha=ALPHA, min_count=1):
    uni, bi = Counter(), Counter()
    for t in ref_texts:
        toks = t.strip().lower().split()
        prev = BOS
        for w in toks:
            uni[w] += 1
            bi[(prev, w)] += 1
            prev = w
    bi = Counter({k: c for k, c in bi.items() if c >= min_count})
    ctx = Counter()
    for (p, _), c in bi.items():
        ctx[p] += c
    n_total = sum(uni.values())
    out = {}
    for i, t in docs:
        toks = t.strip().lower().split()
        if not toks:
            out[i] = (None, None, None)
            continue
        logs, oov = [], 0
        prev = BOS
        for w in toks:
            if (prev, w) in bi and ctx[prev] > 0:
                s = bi[(prev, w)] / ctx[prev]
            elif w in uni:
                s = alpha * uni[w] / n_total
            else:
                s = alpha / n_total
            if w not in uni:
                oov += 1
            logs.append(math.log10(s))
            prev = w
        out[i] = (sum(logs) / len(logs), oov / len(toks), len(toks))
    return out


@pytest.fixture(scope="module")
def ref_model(spark):
    ref_texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps in the warm sun",
        "a quick fox runs through the green field",
        "the dog and the fox are friends in the field",
    ]
    ref = ensure_tibble(
        spark.createDataFrame([(t,) for t in ref_texts], "text string")
    )
    return ref_texts, ngram_lm_train(ref)


def test_model_frame_shape(spark, ref_model):
    ref_texts, model = ref_model
    rows = model.df.collect()
    unis = [r for r in rows if r["context"] is None]
    bis = [r for r in rows if r["context"] is not None]
    assert len(unis) > 0 and len(bis) > 0
    total = sum(r["c"] for r in unis)
    assert total == sum(len(t.split()) for t in ref_texts)


def test_scores_match_oracle_exactly(spark, ref_model):
    ref_texts, model = ref_model
    docs = [
        (1, "the quick brown fox"),  # fluent: high bigram hits
        (2, "dog lazy the sun warm"),  # scrambled: backoff-heavy
        (3, "zebra xylophone quantum"),  # pure OOV
        (4, "the fox jumps over unknownword field"),  # mixed
    ]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    got = {
        r["doc_id"]: (r["lm_logprob"], r["lm_oov_rate"], r["lm_tokens"])
        for r in ngram_lm_score(td, model).df.collect()
    }
    want = _oracle_scores(ref_texts, docs)
    for i in want:
        assert got[i][0] == pytest.approx(want[i][0], abs=2e-6), i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i
        assert got[i][2] == want[i][2], i


def test_fluent_beats_scrambled_beats_oov(spark, ref_model):
    _, model = ref_model
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "dog the over fox quick jumps brown lazy the"),
        (3, "zzz yyy xxx www vvv uuu"),
    ]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    got = {
        r["doc_id"]: r["lm_logprob"]
        for r in ngram_lm_score(td, model).df.collect()
    }
    assert got[1] > got[2] > got[3]


def test_min_count_pruning_matches_oracle(spark, ref_model):
    ref_texts, _ = ref_model
    spark_ref = ensure_tibble(
        spark.createDataFrame([(t,) for t in ref_texts], "text string")
    )
    model2 = ngram_lm_train(spark_ref, min_count=2)
    docs = [(1, "the quick brown fox"), (2, "the lazy dog sleeps")]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    got = {
        r["doc_id"]: (r["lm_logprob"], r["lm_oov_rate"], r["lm_tokens"])
        for r in ngram_lm_score(td, model2).df.collect()
    }
    want = _oracle_scores(ref_texts, docs, min_count=2)
    for i in want:
        assert got[i][0] == pytest.approx(want[i][0], abs=2e-6), i


def test_empty_and_null_docs(spark, ref_model):
    _, model = ref_model
    docs = [(1, ""), (2, "   "), (3, None), (4, "the fox")]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    got = {r["doc_id"]: r["lm_logprob"] for r in ngram_lm_score(td, model).df.collect()}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] is not None
    assert len(got) == 4  # left join keeps every input row


def test_no_python_udfs(spark, ref_model):
    _, model = ref_model
    docs = [(1, "the fox")]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    plan = (
        ngram_lm_score(td, model)
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
