"""Persistent semantic (embedding) index: build / match / dedup /
append lifecycle (scale/semantic_index.py)."""

import numpy as np
import pytest

from datar_polars_spark import Tibble, f
from datar_polars_spark.scale import (
    dedup_against_semantic_index,
    embedding_join,
    match_against_semantic_index,
    semantic_index_append,
    semantic_index_build,
    semantic_index_stats,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _vec(rng, dim=16):
    return [float(x) for x in rng.standard_normal(dim)]


@pytest.fixture(scope="module")
def split(spark):
    """corpus = vec_id % 3 != 0, batch = % 3 == 0 PLUS planted copies:
    an exact duplicate (cos 1) and a rescaled copy (cos 1) of corpus
    vectors under fresh ids."""
    emb = spark.read.parquet(EMB).select("vec_id", "embedding")
    corpus = Tibble(emb.where("vec_id % 3 != 0"))
    planted = emb.where("vec_id IN (1, 2)").selectExpr(
        "vec_id + 100000 AS vec_id",
        "transform(embedding, x -> x * 2.5) AS embedding",
    )
    batch = Tibble(emb.where("vec_id % 3 = 0").unionByName(planted))
    return corpus, batch


def test_match_equals_embedding_join_lsh(spark, split, tmp_path):
    """Index-backed matching == embedding_join(mode='lsh') with the
    same hyperplane family on the same frames — identical candidate
    generation, identical exact-cosine verification."""
    corpus, batch = split
    path = str(tmp_path / "sidx")
    semantic_index_build(
        corpus, f.embedding, f.vec_id, path,
        bands=32, planes_per_band=8, seed=42,
    )
    got = {
        (r.id_a, r.id_b, round(r.cos, 9))
        for r in match_against_semantic_index(
            batch, path, threshold=0.9
        ).df.collect()
    }
    ref = {
        (r.id_a, r.id_b, round(r.cos, 9))
        for r in embedding_join(
            batch, corpus, f.embedding, f.vec_id,
            threshold=0.9, mode="lsh",
            bands=32, planes_per_band=8, seed=42,
        ).df.collect()
    }
    assert got == ref
    assert (100001, 1, 1.0) in got and (100002, 2, 1.0) in got


def test_dedup_drops_planted_and_append_cycle(spark, split, tmp_path):
    corpus, batch = split
    path = str(tmp_path / "sidx")
    semantic_index_build(corpus, f.embedding, f.vec_id, path)
    surv = dedup_against_semantic_index(
        batch, path, threshold=0.95, append=True
    )
    ids = set(surv.df.toPandas()["vec_id"])
    assert 100001 not in ids and 100002 not in ids
    # admitted survivors: an exact copy of one now drops in batch 2
    pick = sorted(ids)[0]
    b2 = Tibble(
        surv.df.where(f"vec_id = {pick}").selectExpr(
            "vec_id + 200000 AS vec_id", "embedding"
        )
    )
    assert dedup_against_semantic_index(b2, path, threshold=0.95).df.count() == 0


def test_exact_identical_row_still_gets_fuzzy_matches(spark, tmp_path):
    """r13 contract fix: a batch vector byte-identical to ONE indexed
    vector must still report its cos>=threshold matches to OTHER,
    non-identical indexed vectors (r12's exact pre-pass excluded such
    rows from fuzzy candidate generation entirely) — and no pair may
    be reported twice."""
    rng = np.random.default_rng(7)
    v = _vec(rng)
    near = [x + 1e-6 for x in v]          # cos ~ 1, NOT byte-identical
    far = _vec(rng)
    corpus = Tibble(
        spark.createDataFrame(
            [(1, v), (2, near), (3, far)],
            "vec_id bigint, embedding array<double>",
        )
    )
    path = str(tmp_path / "sidx")
    semantic_index_build(corpus, f.embedding, f.vec_id, path)
    batch = Tibble(
        spark.createDataFrame(
            # 10 is byte-identical to indexed 1; 11 is a replica of 10
            # (replicated batch shape must fan out per row)
            [(10, v), (11, v)],
            "vec_id bigint, embedding array<double>",
        )
    )
    rows = match_against_semantic_index(batch, path, threshold=0.99).df.collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs))  # no duplicated pairs
    got = {(a, b, round(r.cos, 6)) for (a, b), r in zip(pairs, rows)}
    # exact twins at cos exactly 1.0 AND the near-identical neighbor
    assert (10, 1, 1.0) in got and (11, 1, 1.0) in got
    assert any(a == 10 and b == 2 for a, b, _ in got)
    assert any(a == 11 and b == 2 for a, b, _ in got)
    assert not any(b == 3 for _, b, _ in got)


def test_null_embedding_and_null_id_exempt(spark, tmp_path):
    rng = np.random.default_rng(5)
    v = _vec(rng)
    corpus = Tibble(
        spark.createDataFrame(
            [(1, v)], "vec_id bigint, embedding array<double>"
        )
    )
    path = str(tmp_path / "sidx")
    semantic_index_build(corpus, f.embedding, f.vec_id, path)
    batch = Tibble(
        spark.createDataFrame(
            [(10, v), (11, None), (None, v)],
            "vec_id bigint, embedding array<double>",
        )
    )
    surv = dedup_against_semantic_index(batch, path, threshold=0.99).collect()
    # 10 is an exact dup -> dropped; NULL-embedding and NULL-id survive
    kept = set(surv["vec_id"].dropna().astype(int))
    assert kept == {11}
    assert surv["vec_id"].isna().sum() == 1


def test_stats_and_empty_corpus(spark, split, tmp_path):
    corpus, _ = split
    path = str(tmp_path / "sidx")
    semantic_index_build(corpus, f.embedding, f.vec_id, path, bands=8,
                         planes_per_band=4)
    st = semantic_index_stats(spark, path)
    n = corpus.df.count()
    assert st["n_vectors"] == n and st["n_postings"] == 8 * n
    assert st["bands"] == 8 and st["dim"] > 0
    # empty corpus: builds, matches nothing, adopts dim on first append
    e = Tibble(
        spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    )
    p2 = str(tmp_path / "sidx_empty")
    semantic_index_build(e, f.embedding, f.vec_id, p2)
    rng = np.random.default_rng(1)
    batch = Tibble(
        spark.createDataFrame(
            [(1, _vec(rng))], "vec_id bigint, embedding array<double>"
        )
    )
    assert match_against_semantic_index(batch, p2).df.count() == 0
    semantic_index_append(batch, p2)
    assert semantic_index_stats(spark, p2)["dim"] == 16
    again = Tibble(
        batch.df.selectExpr("vec_id + 5 AS vec_id", "embedding")
    )
    hits = match_against_semantic_index(again, p2, threshold=0.99)
    assert {(r.id_a, r.id_b) for r in hits.df.collect()} == {(6, 1)}


def test_dim_and_dtype_validation(spark, split, tmp_path):
    corpus, _ = split
    path = str(tmp_path / "sidx")
    semantic_index_build(corpus, f.embedding, f.vec_id, path)
    rng = np.random.default_rng(2)
    wrong_dim = Tibble(
        spark.createDataFrame(
            [(1, _vec(rng, dim=7))], "vec_id bigint, embedding array<double>"
        )
    )
    with pytest.raises(Exception, match="dim"):
        match_against_semantic_index(wrong_dim, path).df.collect()
    wrong_id = Tibble(
        spark.createDataFrame(
            [(1, _vec(rng, dim=16))], "vec_id int, embedding array<double>"
        )
    )
    with pytest.raises(ValueError, match="id_type"):
        semantic_index_append(wrong_id, path)


def test_bad_sidecar_rejected(spark, split, tmp_path):
    from datar_polars_spark.scale.jsonio import write_json_file

    corpus, _ = split
    path = str(tmp_path / "notsidx")
    write_json_file(spark, f"{path}/semantic_index.json", {"format": "x"})
    with pytest.raises(ValueError, match="sidecar"):
        match_against_semantic_index(corpus, path)


def test_semantic_compact_preserves_matches_and_caps(spark, tmp_path):
    """Appends + compact: match results identical over a
    duplicate-free history, fewer files, and a cross-increment
    over-full bucket is capped with its drop accounted."""
    import pathlib

    from datar_polars_spark.scale import (
        dropped_pairs_estimate,
        semantic_index_compact,
        semantic_index_stats,
    )

    rng = np.random.default_rng(11)
    vecs = [_vec(rng) for _ in range(6)]
    path = str(tmp_path / "sidx")
    semantic_index_build(
        Tibble(spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs[:3])],
            "vec_id bigint, embedding array<double>",
        )),
        f.embedding, f.vec_id, path,
    )
    for j, v in enumerate(vecs[3:]):
        semantic_index_append(
            Tibble(spark.createDataFrame(
                [(100 + j, v)], "vec_id bigint, embedding array<double>"
            )),
            path,
        )
    batch = Tibble(spark.createDataFrame(
        [(900, [x + 1e-7 for x in vecs[0]]), (901, vecs[4])],
        "vec_id bigint, embedding array<double>",
    ))
    before = sorted(
        (r.id_a, r.id_b, round(r.cos, 9))
        for r in match_against_semantic_index(
            batch, path, threshold=0.9
        ).df.collect()
    )
    nfiles = len([p for p in pathlib.Path(path).rglob("*.parquet")])
    out = semantic_index_compact(spark, path)
    after = sorted(
        (r.id_a, r.id_b, round(r.cos, 9))
        for r in match_against_semantic_index(
            batch, path, threshold=0.9
        ).df.collect()
    )
    assert after == before and before
    assert len([p for p in pathlib.Path(path).rglob("*.parquet")]) < nfiles
    assert out["dropped_pairs"] == 0.0

    # cross-increment over-full bucket: the SAME vector under a fresh
    # id per increment fills every one of its band buckets by 1 per
    # increment — 4 entries after build+3 appends, cap 3
    path2 = str(tmp_path / "sidx2")
    v = _vec(rng)
    semantic_index_build(
        Tibble(spark.createDataFrame(
            [(1, v)], "vec_id bigint, embedding array<double>"
        )),
        f.embedding, f.vec_id, path2, bands=16, planes_per_band=4,
        max_bucket=3,
    )
    for j in range(3):
        semantic_index_append(
            Tibble(spark.createDataFrame(
                [(200 + j, v)], "vec_id bigint, embedding array<double>"
            )),
            path2,
        )
    out2 = semantic_index_compact(spark, path2)
    # 16 buckets x C(4,2) pairs
    assert out2["dropped_pairs"] == 96.0
    assert dropped_pairs_estimate("semantic_index_compact") == 96.0
    assert semantic_index_stats(spark, path2)["n_postings"] == 0


def test_append_scans_source_once(spark, tmp_path):
    """The r14 one-pass store write: the source frame must cross into
    the store writes exactly ONCE (vectors and postings are separate
    write actions; before the base persist each write re-derived from
    the source — two scans plus a second cast+xxhash64 pass). Counted
    with a mapInPandas accumulator in the appended frame (the append
    path: build's dim probe would add a partial batch to the count)."""
    import pyspark.sql.functions as F

    rng = np.random.default_rng(7)
    n = 20
    rows = [(i, _vec(rng)) for i in range(n)]
    schema = "vec_id long, embedding array<double>"
    corpus = Tibble(spark.createDataFrame(rows[:4], schema))
    path = str(tmp_path / "sidx")
    semantic_index_build(corpus, f.embedding, f.vec_id, path)

    acc = spark.sparkContext.accumulator(0)

    def counted(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    frame = spark.createDataFrame(rows, schema).mapInPandas(counted, schema)
    semantic_index_append(Tibble(frame), path)
    assert acc.value == n, acc.value  # once per row, not once per store
