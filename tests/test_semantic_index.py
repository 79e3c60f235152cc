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
