"""duplicate_spans / mask_duplicate_spans: planted-boilerplate
correctness against a pure-Python k-gram oracle, min_docs semantics,
masking integrity, and the two-shuffle plan shape."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from datar_polars_spark.scale import duplicate_spans, mask_duplicate_spans
from datar_polars_spark.tibble import ensure_tibble

BOILER = "this license text is repeated verbatim in many documents exactly"


def _oracle(docs: list[tuple[int, str]], k: int, min_count: int):
    """Reference: hash-free k-gram duplicate spans per document."""
    grams: Counter = Counter()
    tokenized = {i: t.strip().lower().split() for i, t in docs}
    for toks in tokenized.values():
        for p in range(len(toks) - k + 1):
            grams[tuple(toks[p : p + k])] += 1
    out = {}
    for i, toks in tokenized.items():
        flagged = [
            p
            for p in range(len(toks) - k + 1)
            if grams[tuple(toks[p : p + k])] >= min_count
        ]
        spans = []
        for p in flagged:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        if spans:
            out[i] = [tuple(s) for s in spans]
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    docs = [
        (1, "unique words alpha beta gamma " + BOILER + " tail one two"),
        (2, "other prefix content here " + BOILER + " different ending"),
        (3, "totally unrelated document with no repeats at all here"),
        (4, BOILER),
        (5, "self repeat self repeat self repeat self repeat self repeat"),
    ]
    return docs, ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))


def test_matches_oracle(spark, corpus):
    docs, td = corpus
    got = {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["dup_spans"]]
        for r in duplicate_spans(td, k=5, min_count=2).df.collect()
    }
    assert got == _oracle(docs, k=5, min_count=2)


def test_min_docs_excludes_within_doc_repeats(spark, corpus):
    docs, td = corpus
    got = duplicate_spans(td, k=5, min_count=2, min_docs=2).df.collect()
    ids = {r["doc_id"] for r in got}
    # doc 5 repeats only within itself -> excluded by min_docs=2
    assert 5 not in ids
    assert {1, 2, 4} == ids


def test_within_doc_repeats_found_by_default(spark, corpus):
    docs, td = corpus
    got = {r["doc_id"] for r in duplicate_spans(td, k=5, min_count=2).df.collect()}
    assert 5 in got


def test_mask_removes_exactly_flagged_words(spark, corpus):
    docs, td = corpus
    masked = {
        r["doc_id"]: r["text"]
        for r in mask_duplicate_spans(td, k=5, min_count=2).df.collect()
    }
    # untouched doc passes through verbatim
    assert masked[3] == docs[2][1]
    # boilerplate is gone everywhere, surrounding words intact
    for i in (1, 2, 4):
        assert "license" not in masked[i]
    assert masked[1].startswith("unique words alpha beta gamma")
    assert masked[1].endswith("tail one two")
    assert masked[4] == ""
    # masking never grows a document
    for (i, orig), _ in zip(docs, docs):
        assert len(masked[i].split()) <= len(orig.split())


def test_short_docs_no_partial_grams(spark):
    # docs shorter than k words can never repeat a k-word substring
    docs = [(1, "one two three"), (2, "one two three")]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    assert duplicate_spans(td, k=5, min_count=2).df.count() == 0


def test_fuzz_against_oracle(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(8))
    docs = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 25))]
        if rng.random() < 0.4:
            at = rng.randint(0, len(words))
            words = words[:at] + shared.split() + words[at:]
        docs.append((i, " ".join(words)))
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    for k, mc in [(4, 2), (6, 3)]:
        got = {
            r["doc_id"]: [(s["start"], s["end"]) for s in r["dup_spans"]]
            for r in duplicate_spans(td, k=k, min_count=mc).df.collect()
        }
        assert got == _oracle(docs, k=k, min_count=mc), (k, mc)


def test_plan_two_keyed_shuffles_no_python(spark, corpus):
    _, td = corpus
    plan = (
        duplicate_spans(td, k=5, min_count=2)
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # keyed or broadcast exchanges only: gram-hash agg, join-back (which
    # Catalyst may turn into a broadcast once the cached gram frame's
    # size is known — the ideal shape), per-doc assembly. Never a
    # single-partition funnel or a global range sort.
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert exchanges, "expected keyed exchanges in the plan"
    assert all(
        e == "hashpartitioning" or "BroadcastMode" in e for e in exchanges
    ), exchanges


@pytest.mark.parametrize("min_docs", [None, 2])
def test_plan_gram_count_is_partial_aggregated_not_window(
    spark, corpus, min_docs
):
    """The r5 form counted grams with count().over(partitionBy(__h)) —
    no map-side combine, so one hot boilerplate gram funnelled every
    raw occurrence into a single task. The gram-qualification step must
    be a partial HashAggregate on the gram key with NO Window anywhere
    in the plan (the min_docs distinct-doc leg included)."""
    _, td = corpus
    plan = (
        duplicate_spans(td, k=5, min_count=2, min_docs=min_docs)
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    # partial-then-final aggregate pair keyed on the gram hash
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_skewed_hot_gram_fuzz(spark):
    """Skew fixture: ONE gram repeated 100k times (plus normal docs) —
    the de-skewed plan must still produce oracle-exact spans. 100k
    copies of a single gram hash would have been one straggler task
    under the window form; under groupBy it pre-reduces map-side."""
    hot = "alpha beta gamma delta epsilon"  # one 5-gram, 100k copies
    docs = [(i, hot) for i in range(100_000)]
    docs += [(200_000, "unique prose with no repeats whatsoever today ok")]
    docs += [(200_001, f"prefix words {hot} suffix words")]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    out = duplicate_spans(td, k=5, min_count=2).df
    got_hot = out.where("doc_id < 100000")
    assert got_hot.count() == 100_000
    row = got_hot.where("doc_id = 7").collect()[0]
    assert [(s["start"], s["end"]) for s in row["dup_spans"]] == [(0, 5)]
    assert row["dup_word_fraction"] == 1.0
    tail = {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["dup_spans"]]
        for r in out.where("doc_id >= 100000").collect()
    }
    assert tail == {200_001: [(2, 7)]}
