"""Model-free text embeddings (scale/embed.py): determinism across
sessions/partitionings, cosine-tracks-lexical-overlap property,
NULL/gramless semantics, end-to-end integration with the ANN and
semantic-dedup stack, and plan shape (one Arrow pass, no shuffle)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datar_polars_spark import f
from datar_polars_spark.scale import text_embed
from datar_polars_spark.scale.embed import _embed_batch
from datar_polars_spark.tibble import ensure_tibble

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox leaps over the lazy dog"),          # near-dup of 1
    (3, "stochastic gradient descent optimizes neural networks"),
    (4, "gradient descent methods optimize deep neural networks"),  # near-dup of 3
    (5, None),
    (6, "!!! ... ???"),                                           # gramless
]


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b)  # vectors are l2-normalized


@pytest.fixture(scope="module")
def embedded(spark):
    td = ensure_tibble(spark.createDataFrame(DOCS, "id long, text string"))
    return {
        r["id"]: r["embedding"]
        for r in text_embed(td, "text", dim=64).df.collect()
    }


def test_null_and_gramless(embedded):
    assert embedded[5] is None and embedded[6] is None


def test_unit_norm(embedded):
    for i in (1, 2, 3, 4):
        assert abs(math.sqrt(sum(v * v for v in embedded[i])) - 1) < 1e-9


def test_cosine_tracks_overlap(embedded):
    # near-dup pairs far more similar than cross-topic pairs
    assert _cos(embedded[1], embedded[2]) > 0.8
    assert _cos(embedded[3], embedded[4]) > 0.5
    assert _cos(embedded[1], embedded[3]) < 0.35
    assert _cos(embedded[2], embedded[4]) < 0.35


def test_deterministic_across_partitionings(spark, embedded):
    td8 = ensure_tibble(
        spark.createDataFrame(DOCS, "id long, text string").repartition(8)
    )
    again = {
        r["id"]: r["embedding"]
        for r in text_embed(td8, "text", dim=64).df.collect()
    }
    for i in (1, 2, 3, 4):
        assert again[i] == embedded[i]
    # direct python-path twin (no Spark) gives the same vectors
    local = _embed_batch([DOCS[0][1]], 64, 1, 2, 0)[0]
    assert local == embedded[1]


def test_seed_and_dim_change_vectors(spark):
    td = ensure_tibble(spark.createDataFrame(DOCS[:1], "id long, text string"))
    a = text_embed(td, "text", dim=64, seed=0).df.collect()[0]["embedding"]
    b = text_embed(td, "text", dim=64, seed=1).df.collect()[0]["embedding"]
    assert a != b
    c = text_embed(td, "text", dim=32, seed=0).df.collect()[0]["embedding"]
    assert len(c) == 32


def test_feeds_ann_stack(spark):
    """text -> text_embed -> cosine_topk finds the planted near-dup as
    the top non-self neighbour — the full no-external-model path."""
    from datar_polars_spark.scale import cosine_topk

    td = ensure_tibble(
        spark.createDataFrame(
            [d for d in DOCS if d[1]], "id long, text string"
        )
    )
    emb = text_embed(td, "text", dim=64)
    corpus = ensure_tibble(emb.df.where(F.col("embedding").isNotNull()))
    q = corpus.df.where("id = 1").collect()[0]["embedding"]
    top = cosine_topk(corpus, [float(v) for v in q], f.embedding, f.id, k=2)
    got = [r["id"] for r in top.df.orderBy(F.desc("cosine")).collect()]
    assert got[0] == 1 and got[1] == 2  # self, then the near-dup


def test_feeds_semantic_dedup(spark):
    from datar_polars_spark.scale.dedup import embedding_cosine_pairs

    td = ensure_tibble(
        spark.createDataFrame(
            [d for d in DOCS if d[1]], "id long, text string"
        )
    )
    emb = ensure_tibble(
        text_embed(td, "text", dim=64).df.where(
            F.col("embedding").isNotNull()
        )
    )
    pairs = embedding_cosine_pairs(emb, f.embedding, f.id, threshold=0.5)
    got = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in pairs.df.collect()
    }
    assert (1, 2) in got and (3, 4) in got
    assert (1, 3) not in got


def test_plan_one_arrow_pass(spark):
    td = ensure_tibble(spark.createDataFrame(DOCS, "id long, text string"))
    out = text_embed(td, "text")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" in plan


def test_existing_column_rejected(spark):
    td = ensure_tibble(spark.createDataFrame(DOCS, "id long, text string"))
    with pytest.raises(ValueError, match="already exists"):
        text_embed(td, "text", out_col="text")
    with pytest.raises(ValueError, match="dim must be"):
        text_embed(td, "text", dim=1)


def test_full_retrieval_chain_from_raw_text(spark):
    """The complete no-external-model retrieval stack: raw text ->
    text_embed -> pca_train/apply -> ivfpq_train/encode/knn_join. A
    planted near-dup must come back as the top non-self neighbour of
    its source through the WHOLE chain (embedding, reduction,
    quantization, probed retrieval)."""
    from pyspark.sql import functions as F

    from datar_polars_spark.scale import (
        ivfpq_encode,
        ivfpq_knn_join,
        ivfpq_train,
        pca_apply,
        pca_train,
        text_embed,
    )
    from datar_polars_spark import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    base = docs.df.select("doc_id", "text").limit(120)
    dup = base.limit(1).select(
        F.lit(999999).cast("long").alias("doc_id"),
        F.concat(F.lit("prefix "), F.col("text")).alias("text"),
    )
    corpus = ensure_tibble(base.unionByName(dup))
    emb = ensure_tibble(
        text_embed(corpus, "text", dim=48).df.where(
            "embedding is not null"
        ).withColumnRenamed("doc_id", "vec_id")
    )
    pca = pca_train(emb, "embedding", dim_out=16)
    red = pca_apply(emb, pca, "embedding")
    index = ivfpq_train(red, n_clusters=4, m=4, nbits=6, sample_size=200, seed=3)
    coded = ivfpq_encode(red, index)
    query = ensure_tibble(red.df.where("vec_id = 999999"))
    top = ivfpq_knn_join(query, coded, index, k=2, nprobe=4)
    # surface: (query_id, match_id, pq_dist, rank) ascending
    ids = [r["match_id"] for r in top.df.orderBy("rank").collect()]
    src = base.limit(1).collect()[0]["doc_id"]
    assert 999999 in ids and src in ids, ids


def test_char_analyzer_for_cjk_near_dups(spark):
    """Word tokenization collapses an unsegmented hanzi run into one
    token, so CJK near-dups score ~0 cosine; the char analyzer
    restores the lexical-overlap signal."""
    cjk = [
        (1, "今天早上天气很冷街上很安静孩子们在花园里玩耍"),
        (2, "今天早上天气很冷街上很安静孩子们在公园里玩耍"),  # one-char diff
        (3, "会议改到了星期四下午博物馆冬天每逢星期一闭馆"),
    ]
    td = ensure_tibble(spark.createDataFrame(cjk, "id long, text string"))
    char_e = {
        r["id"]: r["embedding"]
        for r in text_embed(
            td, "text", dim=64, n_lo=2, n_hi=4, analyzer="char"
        ).df.collect()
    }
    assert _cos(char_e[1], char_e[2]) > 0.8          # near-dup found
    assert _cos(char_e[1], char_e[3]) < 0.4          # different doc
    word_e = {
        r["id"]: r["embedding"]
        for r in text_embed(td, "text", dim=64).df.collect()
    }
    # word analyzer: each run is one unique token -> no shared grams
    assert _cos(word_e[1], word_e[2]) < 0.1
    with pytest.raises(ValueError, match="analyzer must be"):
        text_embed(td, "text", analyzer="bogus")
