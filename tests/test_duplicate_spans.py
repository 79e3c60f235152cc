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


# ---- keep="first" canonical-occurrence masking ----------------------------

def test_keep_first_exactly_one_copy_survives(spark, corpus):
    """keep='first': the globally-first (min doc id, pos) occurrence of
    the planted boilerplate survives; every other copy is masked."""
    docs, td = corpus
    out = {
        r["doc_id"]: r["text"]
        for r in mask_duplicate_spans(td, k=5, min_count=2, keep="first")
        .df.collect()
    }
    boiler_words = BOILER.split()
    def contains_boiler(text):
        toks = text.strip().lower().split()
        return any(
            toks[i : i + len(boiler_words)] == boiler_words
            for i in range(len(toks) - len(boiler_words) + 1)
        )
    # doc 1 is the earliest id containing the boilerplate -> keeps it
    assert contains_boiler(out[1])
    # docs 2 and 4 lose their copies
    assert not contains_boiler(out[2])
    assert not contains_boiler(out[4])
    # exactly one copy corpus-wide
    assert sum(contains_boiler(t) for t in out.values()) == 1
    # non-boilerplate words of doc 2 survive
    assert "other prefix content here" in out[2]
    # untouched doc passes through verbatim
    assert out[3] == docs[2][1]


def test_keep_first_within_doc_repeats(spark):
    """A passage repeating WITHIN the earliest doc keeps only its first
    (lowest-position) occurrence there."""
    filler1 = "aa bb cc dd ee"
    filler2 = "ff gg hh ii jj"
    docs = [
        (1, f"{BOILER} {filler1} {BOILER} {filler2}"),
        (2, f"prefix words here now {BOILER}"),
    ]
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    out = {
        r["doc_id"]: r["text"]
        for r in mask_duplicate_spans(td, k=5, min_count=2, keep="first")
        .df.collect()
    }
    bw = BOILER.split()
    def count_boiler(text):
        toks = text.strip().lower().split()
        return sum(
            toks[i : i + len(bw)] == bw for i in range(len(toks) - len(bw) + 1)
        )
    assert count_boiler(out[1]) == 1
    assert out[1].startswith(BOILER)  # the first occurrence survives
    assert filler1 in out[1] and filler2 in out[1]
    assert count_boiler(out[2]) == 0


def test_keep_default_unchanged_and_validation(spark, corpus):
    docs, td = corpus
    a = mask_duplicate_spans(td, k=5, min_count=2).df.orderBy("doc_id").collect()
    b = mask_duplicate_spans(td, k=5, min_count=2, keep="all").df.orderBy(
        "doc_id"
    ).collect()
    assert [r["text"] for r in a] == [r["text"] for r in b]
    with pytest.raises(ValueError, match="keep"):
        mask_duplicate_spans(td, k=5, keep="canonical").df.collect()


def test_keep_first_fuzz_against_oracle(spark):
    """Randomized corpus: keep='first' output must equal a pure-Python
    oracle that flags every qualifying gram occurrence EXCEPT its
    global (doc, pos) minimum, then merges runs and masks."""
    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    passage = " ".join(rng.choice(vocab) for _ in range(8))
    docs = []
    for i in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randint(6, 25))]
        if rng.random() < 0.6:
            at = rng.randint(0, len(words))
            words[at:at] = passage.split()
        docs.append((i, " ".join(words)))
    td = ensure_tibble(spark.createDataFrame(docs, "doc_id int, text string"))
    k, mc = 4, 2
    got = {
        r["doc_id"]: r["text"]
        for r in mask_duplicate_spans(td, k=k, min_count=mc, keep="first")
        .df.collect()
    }

    # oracle
    tokenized = {i: t.strip().lower().split() for i, t in docs}
    occ: dict = {}
    for i in sorted(tokenized):
        toks = tokenized[i]
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p : p + k]), []).append((i, p))
    flagged_by_doc: dict = {i: set() for i in tokenized}
    for gram, sites in occ.items():
        if len(sites) < mc:
            continue
        first = min(sites)
        for site in sites:
            if site != first:
                flagged_by_doc[site[0]].add(site[1])
    for i, toks in tokenized.items():
        spans = []
        for p in sorted(flagged_by_doc[i]):
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        masked = set()
        for s, e0 in spans:
            masked.update(range(s, e0))
        want = " ".join(
            w for j, w in enumerate(docs[i][1].strip().split()) if j not in masked
        )
        assert got[i] == want, (i, got[i], want)


# ---- persist size gate ------------------------------------------------------

def test_persist_gate_both_paths_same_answer(spark, corpus):
    """persist_max_bytes=0 forces the recompute path; the report must
    be identical to the (default) persisted path."""
    docs, td = corpus
    a = duplicate_spans(td, k=5, min_count=2).df.orderBy("doc_id").collect()
    b = duplicate_spans(td, k=5, min_count=2, persist_max_bytes=0).df.orderBy(
        "doc_id"
    ).collect()
    assert [
        (r["doc_id"], [(s["start"], s["end"]) for s in r["dup_spans"]], r["dup_words"])
        for r in a
    ] == [
        (r["doc_id"], [(s["start"], s["end"]) for s in r["dup_spans"]], r["dup_words"])
        for r in b
    ]


def test_persist_gate_file_source(spark, tmp_path):
    """A file-backed corpus estimates its input bytes from footers; a
    tiny file stays under any realistic cap (persist fires), and a
    zero cap disables it — both produce the same report."""
    from datar_polars_spark import read_parquet
    from datar_polars_spark.scale.substr import _estimate_input_bytes

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, BOILER + " xx yy"), (2, BOILER + " zz ww")],
        "doc_id int, text string",
    ).write.parquet(p)
    td = read_parquet(spark, p)
    est = _estimate_input_bytes(td.df)
    assert est is not None and est > 0
    a = duplicate_spans(td, k=5, min_count=2).df.collect()
    b = duplicate_spans(td, k=5, min_count=2, persist_max_bytes=0).df.collect()
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in b} == {1, 2}
