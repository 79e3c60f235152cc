"""Ported from reference tests/base/test_seq.py — seq_along, seq_len
(0-based, per the reference's deliberate deviation from R), rep with
times/each/length, rev, sample, length.
"""

from datar_polars_spark import f, mutate, tibble
from datar_polars_spark.functions import (
    length,
    rep,
    rev_,
    sample_list,
    seq_along,
    seq_len,
)


class TestSeqAlong:
    def test_seq_along_list(self):
        assert seq_along([10, 20, 30, 40]) == [1, 2, 3, 4]

    def test_seq_along_scalar(self):
        assert seq_along(42) == [1]

    def test_seq_along_empty(self):
        assert seq_along([]) == []

    def test_seq_along_in_mutate(self, spark):
        td = tibble(spark, x=[10, 20, 30])
        out = (td >> mutate(y=seq_along(f.x))).collect()
        assert out["y"].tolist() == [1, 2, 3]


class TestSeqLen:
    def test_seq_len_int(self):
        assert seq_len(3) == [0, 1, 2]

    def test_seq_len_zero(self):
        assert seq_len(0) == []

    def test_seq_len_one(self):
        assert seq_len(1) == [0]

    def test_seq_len_in_mutate(self, spark):
        td = tibble(spark, x=[1, 2, 0])
        out = (td >> mutate(y=seq_len(f.x))).collect()
        assert [list(v) for v in out["y"]] == [[0], [0, 1], []]


class TestRep:
    def test_rep_times(self):
        assert rep([1, 2], times=3) == [1, 2, 1, 2, 1, 2]

    def test_rep_each(self):
        assert rep([1, 2], each=2) == [1, 1, 2, 2]

    def test_rep_length_out(self):
        assert rep([1, 2, 3], times=3, length=5) == [1, 2, 3, 1, 2]

    def test_rep_scalar(self):
        assert rep(7, times=3) == [7, 7, 7]

    def test_rep_vector_times(self):
        assert rep([1, 2], times=[1, 2]) == [1, 2, 2]


class TestRev:
    def test_rev_in_mutate(self, spark):
        td = tibble(spark, x=[1, 2, 3])
        out = (td >> mutate(y=rev_(f.x))).collect()
        assert out["y"].tolist() == [3, 2, 1]


class TestSample:
    def test_sample_no_replace(self):
        out = sample_list([1, 2, 3, 4, 5], size=3, seed=42)
        assert len(out) == 3 and len(set(out)) == 3

    def test_sample_all_is_permutation(self):
        out = sample_list([1, 2, 3], seed=1)
        assert sorted(out) == [1, 2, 3]

    def test_sample_with_replace(self):
        out = sample_list([1, 2], size=10, replace=True, seed=7)
        assert len(out) == 10 and set(out) <= {1, 2}

    def test_sample_int_pool(self):
        out = sample_list(5, seed=3)
        assert sorted(out) == [1, 2, 3, 4, 5]


class TestLength:
    def test_length_list(self):
        assert length([1, 2, 3]) == 3

    def test_length_scalar(self):
        assert length(42) == 1

    def test_length_string(self):
        assert length("hello") == 1

    def test_length_empty(self):
        assert length([]) == 0


class TestColumnSampleReplace:
    """Round-3: deferred sample(size=, replace=True) on columns
    (reference api/base/seq.py:160-217) — one shared draws array per
    group, seeded determinism."""

    def test_column_sample_replace_size(self, spark):
        from datar_polars_spark import f, mutate, tibble
        from datar_polars_spark.functions import sample_ as sample

        td = tibble(spark, x=[1, 2, 3, 4, 5])
        out = (td >> mutate(y=sample(f.x, size=10, replace=True, seed=7))).collect()
        ys = out["y"].tolist()
        # every row carries the SAME broadcast array of 10 draws
        assert all(list(v) == list(ys[0]) for v in ys)
        assert len(ys[0]) == 10
        assert set(ys[0]).issubset({1, 2, 3, 4, 5})

    def test_column_sample_replace_seeded_deterministic(self, spark):
        from datar_polars_spark import f, mutate, tibble
        from datar_polars_spark.functions import sample_ as sample

        td = tibble(spark, x=[1, 2, 3, 4, 5])
        a = (td >> mutate(y=sample(f.x, size=8, replace=True, seed=42))).collect()
        b = (td >> mutate(y=sample(f.x, size=8, replace=True, seed=42))).collect()
        assert list(a["y"].tolist()[0]) == list(b["y"].tolist()[0])

    def test_column_sample_replace_grouped(self, spark):
        from datar_polars_spark import f, group_by, mutate, tibble
        from datar_polars_spark.functions import sample_ as sample

        td = tibble(spark, g=["a", "a", "b", "b"], x=[1, 2, 10, 20])
        out = (
            td
            >> group_by(f.g)
            >> mutate(y=sample(f.x, size=6, replace=True, seed=3))
        ).collect()
        by_g = {}
        for g, y in zip(out["g"], out["y"]):
            by_g.setdefault(g, []).append(list(y))
        assert set(by_g["a"][0]).issubset({1, 2})
        assert set(by_g["b"][0]).issubset({10, 20})
        assert by_g["a"][0] == by_g["a"][1]
