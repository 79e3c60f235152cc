"""TF-IDF / BM25 relevance scoring (r5 extension) — differential
against a pure-pandas oracle, plus plan guards."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from datar_polars_spark import f, read_parquet, tibble
from datar_polars_spark.scale import bm25_score, tfidf_top_terms

DOCS = [
    "the cat sat on the mat",
    "the dog chased the cat around",
    "quantum computing with superconducting qubits",
    "dogs and cats living together",
    "the the the repeated token document",
]


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.lower().strip()) if t]


def _oracle_tfidf(docs: dict[int, str], k: int):
    n = len(docs)
    from collections import Counter

    tfs = {i: Counter(_tok(t)) for i, t in docs.items()}
    dfc = Counter()
    for c in tfs.values():
        dfc.update(set(c))
    out = {}
    for i, c in tfs.items():
        scored = [
            (t, tf, dfc[t], tf * (math.log((n + 1) / (dfc[t] + 1)) + 1.0))
            for t, tf in c.items()
        ]
        scored.sort(key=lambda r: (-r[3], r[0]))
        out[i] = scored[:k]
    return out


def _oracle_bm25(docs: dict[int, str], query: list[str], k1=1.2, b=0.75):
    from collections import Counter

    tfs = {i: Counter(_tok(t)) for i, t in docs.items()}
    n = len(docs)
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    avgdl = sum(dls.values()) / n
    dfc = {q: sum(1 for c in tfs.values() if q in c) for q in query}
    out = {}
    for i, c in tfs.items():
        s = 0.0
        for q in query:
            tf = c.get(q, 0)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfc[q] + 0.5) / (dfc[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        if s != 0.0:
            out[i] = s
    return out


@pytest.fixture()
def docs_td(spark):
    return tibble(spark, doc_id=list(range(len(DOCS))), text=DOCS)


def test_tfidf_matches_oracle(docs_td):
    out = tfidf_top_terms(docs_td, f.text, f.doc_id, k=3).df.collect()
    exp = _oracle_tfidf(dict(enumerate(DOCS)), k=3)
    got = {}
    for r in out:
        got.setdefault(r.id, []).append((r.term, r.tf, r.df, r.score, r.rank))
    assert set(got) == set(exp)
    for i, rows in got.items():
        rows.sort(key=lambda r: r[4])
        for (term, tf, df, score, rank), (et, etf, edf, es) in zip(rows, exp[i]):
            assert (term, tf, df) == (et, etf, edf), (i, term)
            assert np.isclose(score, es), (i, term)


def test_tfidf_min_df_filters_rare_terms(docs_td):
    out = tfidf_top_terms(docs_td, f.text, f.doc_id, k=10, min_df=2).df.collect()
    assert all(r.df >= 2 for r in out)
    assert "qubits" not in {r.term for r in out}


def test_bm25_matches_oracle(docs_td):
    query = ["cat", "dog", "qubits"]
    out = bm25_score(docs_td, f.text, f.doc_id, query).df.collect()
    exp = _oracle_bm25(dict(enumerate(DOCS)), query)
    got = {r.id: r.score for r in out}
    assert set(got) == set(exp)
    for i in exp:
        assert np.isclose(got[i], exp[i]), i
    # doc 1 hits two query terms -> highest; the rare-term-only quantum
    # doc still outranks the single-common-term doc 0
    assert got[1] == max(got.values())
    assert got[2] > got[0]


def test_bm25_empty_query_raises(docs_td):
    with pytest.raises(ValueError):
        bm25_score(docs_td, f.text, f.doc_id, [])


def test_tfidf_plan_uses_window_group_limit(spark):
    td = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    out = tfidf_top_terms(td, f.text, f.doc_id, k=5)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # map-side partial top-k
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only single-partition exchange is the 1-row corpus-size
    # aggregate (broadcast afterwards) — never the per-doc rank window
    assert plan.count("Exchange SinglePartition") <= 1


def test_bm25_plan_no_python_udf(spark):
    td = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    out = bm25_score(td, f.text, f.doc_id, ["data", "model"])
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
