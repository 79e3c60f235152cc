"""Quality-based winner selection (r14 ``keep_by``/``keep``):
dedup_exact keeps the best-scored row per duplicate cluster and
minhash_dedup the best member per near-dup component, with
deterministic smallest-id tiebreaks and NULL-quality-loses semantics
— all via per-cluster aggregations (plan shape unchanged)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datar_polars_spark import Tibble
from datar_polars_spark.scale import dedup_exact, minhash_dedup


def _td(spark, rows, schema="doc_id long, text string, score double"):
    return Tibble(spark.createDataFrame(rows, schema))


class TestDedupExactKeepBy:
    def test_keep_max_picks_best_scored_row(self, spark):
        td = _td(spark, [
            (1, "a", 0.2), (2, "a", 0.9), (3, "a", 0.5),
            (4, "b", 0.1), (5, "c", None),
        ])
        out = {
            r.doc_id: r.score
            for r in dedup_exact(
                td, "text", id_col="doc_id", keep_by="score", keep="max"
            ).df.collect()
        }
        assert out == {2: 0.9, 4: 0.1, 5: None}

    def test_keep_min_and_tie_breaks_to_smallest_id(self, spark):
        td = _td(spark, [
            (3, "a", 0.5), (1, "a", 0.5), (2, "a", 0.9),
        ])
        out = dedup_exact(
            td, "text", id_col="doc_id", keep_by="score", keep="min"
        ).df.collect()
        assert len(out) == 1 and out[0].doc_id == 1

        out = dedup_exact(
            _td(spark, [(3, "a", 0.7), (1, "a", 0.7)]),
            "text", id_col="doc_id", keep_by="score", keep="max",
        ).df.collect()
        assert out[0].doc_id == 1  # max ties also resolve to min id

    def test_null_quality_always_loses(self, spark):
        td = _td(spark, [(1, "a", None), (2, "a", 0.1)])
        for keep in ("min", "max"):
            out = dedup_exact(
                td, "text", id_col="doc_id", keep_by="score", keep=keep
            ).df.collect()
            assert out[0].doc_id == 2, keep
        # all-NULL cluster still keeps a real row (smallest id)
        td = _td(spark, [(2, "a", None), (1, "a", None)])
        out = dedup_exact(
            td, "text", id_col="doc_id", keep_by="score", keep="max"
        ).df.collect()
        assert out[0].doc_id == 1

    def test_guards(self, spark):
        td = _td(spark, [(1, "a", 0.5)])
        with pytest.raises(ValueError, match="needs id_col"):
            dedup_exact(td, "text", keep_by="score")
        with pytest.raises(ValueError, match="'min' or 'max'"):
            dedup_exact(td, "text", id_col="doc_id", keep_by="score",
                        keep="best")
        with pytest.raises(ValueError, match="numeric"):
            dedup_exact(td, "score", id_col="doc_id", keep_by="text",
                        keep="max")

    def test_without_keep_by_unchanged(self, spark):
        td = _td(spark, [(2, "a", 0.9), (1, "a", 0.2)])
        out = dedup_exact(td, "text", id_col="doc_id").df.collect()
        assert out[0].doc_id == 1  # min-id semantics untouched


def _doc(i, words=30):
    return " ".join(f"w{i}x{j}" for j in range(words))


def _near(i, words=30):
    # same doc with one word changed: jaccard well above 0.7
    toks = [f"w{i}x{j}" for j in range(words)]
    toks[0] = "CHANGED"
    return " ".join(toks)


class TestMinhashDedupKeepBy:
    def test_component_keeps_best_scored_member(self, spark):
        rows = [
            # cluster A: exact pair (1, 2) + near-dup 3; best score: 2
            (1, _doc(0), 0.3), (2, _doc(0), 0.9), (3, _near(0), 0.5),
            # cluster B: near pair (4, 5); best: 5
            (4, _doc(1), 0.2), (5, _near(1), 0.8),
            # unique doc survives regardless of score
            (6, _doc(2), None),
        ]
        out = minhash_dedup(
            _td(spark, rows), "text", "doc_id", threshold=0.7,
            resolve="components", keep_by="score", keep="max",
        ).df
        got = sorted(r.doc_id for r in out.collect())
        assert got == [2, 5, 6], got

    def test_keep_min_by_score(self, spark):
        rows = [(1, _doc(0), 0.9), (2, _near(0), 0.1), (3, _doc(3), 0.5)]
        out = minhash_dedup(
            _td(spark, rows), "text", "doc_id", threshold=0.7,
            resolve="components", keep_by="score", keep="min",
        ).df
        assert sorted(r.doc_id for r in out.collect()) == [2, 3]

    def test_exact_prepass_winner_feeds_component(self, spark):
        """The best member of an exact cluster must survive the
        pre-pass so the component winner is the TRUE best overall."""
        rows = [
            (1, _doc(0), 0.1), (2, _doc(0), 0.95),  # exact cluster
            (3, _near(0), 0.5),                     # near-dup of them
        ]
        out = minhash_dedup(
            _td(spark, rows), "text", "doc_id", threshold=0.7,
            resolve="components", keep_by="score", keep="max",
        ).df
        assert [r.doc_id for r in out.collect()] == [2]

    def test_requires_components(self, spark):
        with pytest.raises(ValueError, match="resolve='components'"):
            minhash_dedup(
                _td(spark, [(1, _doc(0), 0.5)]), "text", "doc_id",
                keep_by="score",
            )

    def test_null_id_rows_still_exempt(self, spark):
        rows = [(None, _doc(0), 0.1), (2, _doc(0), 0.9)]
        out = minhash_dedup(
            _td(spark, rows), "text", "doc_id", threshold=0.7,
            resolve="components", keep_by="score", keep="max",
        ).df
        got = sorted(
            (r.doc_id if r.doc_id is not None else -1)
            for r in out.collect()
        )
        assert got == [-1, 2], got  # NULL-id row never deleted

    def test_default_min_id_unchanged(self, spark):
        rows = [(2, _doc(0), 0.9), (1, _near(0), 0.1), (3, _doc(4), 0.5)]
        out = minhash_dedup(
            _td(spark, rows), "text", "doc_id", threshold=0.7,
            resolve="components",
        ).df
        assert sorted(r.doc_id for r in out.collect()) == [1, 3]


class TestSimhashDedupKeepBy:
    def test_component_keeps_best_scored_member(self, spark):
        from datar_polars_spark.scale import simhash_dedup

        rows = [
            (1, _doc(0), 0.3), (2, _doc(0), 0.9),   # exact cluster
            (3, _doc(7), None),                      # unique
        ]
        out = simhash_dedup(
            _td(spark, rows), "text", "doc_id",
            resolve="components", keep_by="score", keep="max",
        ).df
        assert sorted(r.doc_id for r in out.collect()) == [2, 3]

    def test_requires_components(self, spark):
        from datar_polars_spark.scale import simhash_dedup

        with pytest.raises(ValueError, match="resolve='components'"):
            simhash_dedup(
                _td(spark, [(1, _doc(0), 0.5)]), "text", "doc_id",
                keep_by="score",
            )
