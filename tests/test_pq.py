"""Product quantization ANN: codebook shape, encode determinism,
ADC distance quality vs exact brute force, recall on planted
neighbors, and plan shape (narrow encode, TakeOrdered search)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datar_polars_spark import read_parquet
from datar_polars_spark.scale import pq_encode, pq_knn_join, pq_topk, pq_train
from datar_polars_spark.tibble import ensure_tibble

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_parquet(spark, f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def book(emb):
    return pq_train(emb, m=4, nbits=6, sample_size=500, seed=1)


def test_codebook_shape(emb, book):
    dim = len(emb.df.select("embedding").first()[0])
    assert len(book) == 4
    for cj in book:
        assert len(cj) <= 64
        assert all(len(c) == dim // 4 for c in cj)


def test_encode_shape_and_determinism(spark, emb, book):
    coded = pq_encode(emb, book, code_col="pq_code")
    a = coded.df.select("vec_id", "pq_code").orderBy("vec_id").collect()
    b = pq_encode(emb, book).df.select("vec_id", "pq_code").orderBy("vec_id").collect()
    assert [r["pq_code"] for r in a] == [r["pq_code"] for r in b]
    assert all(len(r["pq_code"]) == 4 for r in a)
    assert all(0 <= c < 64 for r in a for c in r["pq_code"])


def test_adc_equals_reconstruction_distance(spark, emb, book):
    """The ADC contract: pq_dist is EXACTLY the L2^2 distance from the
    query to the code's reconstruction (centroid concatenation) — the
    lookup table contributes no approximation beyond quantization."""
    q = list(emb.df.select("embedding").first()[0])
    qv = np.array(q)
    coded = pq_encode(emb, book)
    got = pq_topk(coded, q, book, k=100).df.collect()
    codes = {
        r["vec_id"]: r["pq_code"]
        for r in coded.df.select("vec_id", "pq_code").collect()
    }
    C = [np.array(cj) for cj in book]
    for r in got:
        rec = np.concatenate([C[j][codes[r["id"]][j]] for j in range(4)])
        assert r["pq_dist"] == pytest.approx(
            float(((qv - rec) ** 2).sum()), abs=1e-9
        )


def test_planted_clusters_perfect_recall(spark):
    """On data with real cluster structure (the regime PQ exists for),
    the ADC top-k must recover the query's cluster."""
    rng = np.random.RandomState(3)
    centers = rng.randn(5, 32) * 5
    rows = []
    for i in range(400):
        c = i % 5
        rows.append((i, (centers[c] + rng.randn(32) * 0.1).tolist(), c))
    spark_df = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>, label int"
    )
    td = ensure_tibble(spark_df)
    book = pq_train(td, m=4, nbits=4, sample_size=400, seed=0)
    coded = pq_encode(td, book)
    q = rows[10][1]  # cluster 0
    got = pq_topk(coded, q, book, k=40).df.collect()
    labels = {r[2] for r in rows if r[0] in {g["id"] for g in got}}
    assert labels == {rows[10][2]}  # every neighbor from the query's cluster


def test_top1_recovers_query_vector(spark, emb, book):
    # the query IS a corpus vector: its own code must be nearest
    row = emb.df.select("vec_id", "embedding").first()
    coded = pq_encode(emb, book)
    top = pq_topk(coded, list(row["embedding"]), book, k=1).df.collect()
    assert top[0]["id"] == row["vec_id"]


def test_recall_at_10_vs_bruteforce(spark, emb, book):
    rows = emb.df.select("vec_id", "embedding").collect()
    q = list(rows[7]["embedding"])
    qv = np.array(q)
    exact = sorted(
        rows, key=lambda r: float(((np.array(list(r["embedding"])) - qv) ** 2).sum())
    )[:10]
    exact_ids = {r["vec_id"] for r in exact}
    coded = pq_encode(emb, book)
    got = {r["id"] for r in pq_topk(coded, q, book, k=30).df.collect()}
    recall = len(exact_ids & got) / 10
    assert recall >= 0.5, f"recall@10 in top-30 = {recall}"


def test_dim_validation(spark, emb, book):
    with pytest.raises(ValueError):
        pq_topk(pq_encode(emb, book), [0.0] * 3, book, k=5)
    with pytest.raises(ValueError):
        pq_train(emb, m=7, nbits=4, sample_size=100)  # dim % 7 != 0


def test_plan_narrow_encode_takeordered_search(spark, emb, book):
    coded = pq_encode(emb, book)
    plan_enc = coded.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_enc  # encode is a narrow map
    res = pq_topk(coded, [0.0] * len(emb.df.select("embedding").first()[0]), book, k=5)
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_code_compression_ratio(emb, book):
    # the point of PQ: m ints vs dim floats
    dim = len(emb.df.select("embedding").first()[0])
    assert 4 / dim < 0.2


# ---- batch retrieval: pq_knn_join ----------------------------------------

def test_pq_knn_join_matches_per_query_pq_topk(spark, emb, book):
    """Exactness contract: the batch path must return, for every query,
    the SAME ids/distances as pq_topk run on that query alone (the
    per-batch pre-filter is lossless and ties break identically)."""
    coded = pq_encode(emb, book)
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 5")
    )
    got = pq_knn_join(queries, coded, book, k=8).df.collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        q = list(
            emb.df.select("embedding").where(f"vec_id = {qid}").first()[0]
        )
        solo = pq_topk(coded, q, book, k=8).df.collect()
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [r["match_id"] for r in rows] == [s["id"] for s in solo], qid
        for r, s in zip(rows, solo):
            assert r["pq_dist"] == pytest.approx(s["pq_dist"], abs=1e-9)
            assert r["rank"] == s["rank"]


def test_pq_knn_join_planted_clusters(spark):
    """Every query's neighbors come from its own planted cluster —
    batch analogue of the single-query recall gate."""
    rng = np.random.RandomState(11)
    centers = rng.randn(4, 32) * 5
    rows = [
        (i, (centers[i % 4] + rng.randn(32) * 0.1).tolist(), i % 4)
        for i in range(300)
    ]
    td = ensure_tibble(
        spark.createDataFrame(rows, "vec_id int, embedding array<double>, label int")
    )
    book = pq_train(td, m=4, nbits=4, sample_size=300, seed=0)
    coded = pq_encode(td, book)
    queries = ensure_tibble(
        td.df.select("vec_id", "embedding").where("vec_id < 8")
    )
    got = pq_knn_join(queries, coded, book, k=20).df.collect()
    labels = {i: lab for i, _, lab in rows}
    for r in got:
        assert labels[r["match_id"]] == labels[r["query_id"]], r


def test_pq_knn_join_validation(spark, emb, book):
    coded = pq_encode(emb, book)
    bad = ensure_tibble(
        spark.createDataFrame([(1, [0.0] * 3)], "vec_id int, embedding array<double>")
    )
    with pytest.raises(ValueError, match="dim"):
        pq_knn_join(bad, coded, book, k=5)
    empty = ensure_tibble(
        spark.createDataFrame([], "vec_id int, embedding array<double>")
    )
    with pytest.raises(ValueError, match="empty"):
        pq_knn_join(empty, coded, book, k=5)


def test_pq_knn_join_distributed_matches_batch(spark, emb, book):
    """A query table past max_queries switches to the cogrouped
    executor-side path (the query table never touches the driver);
    ids, distances, and ranks must match the driver-batch path
    EXACTLY — the same tiled lossless pre-filter runs per (chunk,
    block) cell."""
    coded = pq_encode(emb, book)
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 9")
    )
    batch = pq_knn_join(queries, coded, book, k=6).df.collect()
    dist = pq_knn_join(
        queries, coded, book, k=6, max_queries=4, n_corpus_blocks=3
    ).df.collect()
    kf = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(batch, key=kf)] \
        == [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(dist, key=kf)]
    for b, d in zip(sorted(batch, key=kf), sorted(dist, key=kf)):
        assert b["pq_dist"] == pytest.approx(d["pq_dist"], abs=1e-9)


def test_pq_knn_join_distributed_plan_shape(spark, emb, book):
    """The distributed path is cogrouped Arrow (FlatMapCoGroupsInPandas)
    with no driver collect of the query table, no cartesian product,
    and no row-at-a-time Python."""
    coded = pq_encode(emb, book)
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 9")
    )
    out = pq_knn_join(queries, coded, book, k=5, max_queries=4)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan


def test_pq_knn_join_tie_break_lossless(spark, book, emb):
    """Identical embeddings -> identical PQ codes -> every distance
    ties. The per-tile pre-filter must keep ALL boundary ties so the
    final (pq_dist, match_id) order returns the k SMALLEST ids — on
    both paths (an argpartition-k prefilter can drop the smallest id
    when ties straddle the cut)."""
    base = list(emb.df.select("embedding").first()[0])
    rows = [(i, base) for i in range(60)]
    corpus = ensure_tibble(
        spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    )
    coded = pq_encode(corpus, book)
    queries = ensure_tibble(
        spark.createDataFrame(rows[:3], "vec_id int, embedding array<double>")
    )
    for kwargs in ({}, {"max_queries": 2, "n_corpus_blocks": 4}):
        got = pq_knn_join(queries, coded, book, k=7, **kwargs).df.collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, qrows in by_q.items():
            qrows = sorted(qrows, key=lambda r: r["rank"])
            assert [r["match_id"] for r in qrows] == list(range(7)), (qid, kwargs)


def test_pq_knn_join_plan_shape(spark, emb, book):
    """One Arrow pass over the corpus codes + a per-query window limit:
    no cartesian product, no row-at-a-time Python, and the window is
    rank-limited (WindowGroupLimit pushes the top-k map-side)."""
    coded = pq_encode(emb, book)
    queries = ensure_tibble(emb.df.select("vec_id", "embedding").limit(4))
    out = pq_knn_join(queries, coded, book, k=5)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" in plan


def test_adc_candidates_tiling_lossless_fuzz():
    """numpy-level contract of the tiled prefilter: for ANY tile sizes
    (including tiles smaller than k, ragged final tiles, and duplicated
    distances), the emitted candidates must contain every query's true
    top-k under the (dist, id) total order."""
    from datar_polars_spark.scale.similarity import _adc_candidates

    rng = np.random.RandomState(42)
    for trial in range(6):
        nq, n, m, ksub = rng.randint(3, 9), rng.randint(10, 60), 4, 8
        kk = rng.randint(1, 7)
        luts = rng.rand(nq, m, ksub)
        M = rng.randint(0, ksub, size=(n, m)).astype("int64")
        if trial % 2:
            # force heavy distance ties: many rows share identical codes
            M[: n // 2] = M[0]
        ids = np.arange(n) * 3 + 1
        qchunk = rng.randint(1, nq + 1)
        rowchunk = rng.randint(1, n + 1)
        got: dict[int, set] = {q: set() for q in range(nq)}
        for qix, mids, dists in _adc_candidates(
            luts, M, ids, kk, qchunk=qchunk, rowchunk=rowchunk
        ):
            for q, mid in zip(qix, mids):
                got[int(q)].add(int(mid))
        dist_full = luts[:, np.arange(m)[None, :], M].sum(axis=2)
        for q in range(nq):
            order = sorted(zip(dist_full[q], ids))[: min(kk, n)]
            want = {int(mid) for _, mid in order}
            assert want <= got[q], (trial, q, qchunk, rowchunk)


def test_pq_knn_join_rerank_covering_equals_exact(spark, emb, book):
    """pq_knn_join(rerank=covering) must equal the true exact L2 top-k
    over raw vectors, on both the batch and distributed paths."""
    coded = pq_encode(emb, book)
    n = emb.df.count()
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 3")
    )
    k = 4
    rows = emb.df.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(list(r["embedding"]), dtype="float64") for r in rows}
    for kwargs in ({}, {"max_queries": 2}):
        got = pq_knn_join(
            queries, coded, book, k=k, rerank=(n // k) + 1, **kwargs
        ).df.collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, qrows in by_q.items():
            q = vecs[qid]
            exact = sorted(
                ((float(((q - v) ** 2).sum()), mid) for mid, v in vecs.items())
            )[:k]
            qrows = sorted(qrows, key=lambda r: r["rank"])
            assert [r["match_id"] for r in qrows] == [m for _, m in exact], (qid, kwargs)


def test_pq_knn_join_null_queries_dropped_both_paths(spark, emb, book):
    """NULL query ids / embeddings are dropped identically on the batch
    and distributed paths (the hash-chunk would silently orphan them;
    the driver collect would crash)."""
    coded = pq_encode(emb, book)
    good = emb.df.select("vec_id", "embedding").where("vec_id < 4")
    dim = len(emb.df.select("embedding").first()[0])
    bad = spark.createDataFrame(
        [(None, [0.0] * dim), (999, None)],
        "vec_id bigint, embedding array<double>",
    )
    queries = ensure_tibble(good.unionByName(bad))
    for kwargs in ({}, {"max_queries": 2}):
        got = pq_knn_join(queries, coded, book, k=3, **kwargs).df.collect()
        qids = {r["query_id"] for r in got}
        assert qids == {0, 1, 2, 3}, kwargs
    with pytest.raises(ValueError, match="rerank"):
        pq_knn_join(queries, coded, book, k=3, rerank=-1)

# ---- training-sample guards (ADVICE r8) ------------------------------------

def test_pq_train_empty_table_raises(spark):
    empty = ensure_tibble(
        spark.createDataFrame([], "vec_id long, embedding array<double>")
    )
    with pytest.raises(ValueError, match="empty table"):
        pq_train(empty, m=2, nbits=2)


def test_pq_train_all_null_vectors_raise(spark):
    td = ensure_tibble(
        spark.createDataFrame(
            [(1, None), (2, None)], "vec_id long, embedding array<double>"
        )
    )
    with pytest.raises(ValueError, match="non-NULL"):
        pq_train(td, m=2, nbits=2)


def test_pq_train_tiny_corpus_small_sample_never_empty(spark):
    """A low Bernoulli fraction on a small frame can return zero rows;
    the guard tops up deterministically instead of crashing with an
    IndexError, across seeds."""
    rows = [(i, [float(i), float(i) + 0.5, -float(i), 1.0]) for i in range(40)]
    td = ensure_tibble(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    for seed in range(6):
        book = pq_train(td, m=2, nbits=2, sample_size=3, seed=seed)
        assert len(book) == 2
        assert 1 <= len(book[0]) <= 4
        assert all(len(c) == 2 for cj in book for c in cj)


def test_pq_train_null_rows_skipped(spark):
    rows = [(i, [float(i), 1.0]) for i in range(20)] + [(99, None)]
    td = ensure_tibble(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    book = pq_train(td, m=2, nbits=2, sample_size=50, seed=0)
    assert len(book) == 2  # the NULL row trains nothing, no crash


def test_train_sample_topup_draws_from_all_partitions(spark, monkeypatch):
    """The Bernoulli-undershoot top-up must not be limit(n) — that
    takes whole leading partitions, so a sorted/clustered corpus would
    train codebooks on one file's biased prefix. Force the undershoot
    and check the sample carries BOTH modes of a two-partition,
    two-mode frame (ADVICE r9)."""
    import numpy as np

    from datar_polars_spark.scale.similarity import _train_sample

    lo = [([float(i) * 1e-3, 0.0],) for i in range(200)]
    hi = [([100.0 + float(i) * 1e-3, 100.0],) for i in range(200)]
    df = (
        spark.createDataFrame(lo, "embedding array<double>")
        .coalesce(1)
        .unionAll(
            spark.createDataFrame(hi, "embedding array<double>").coalesce(1)
        )
    )
    # force the undershoot branch: Bernoulli returns nothing (patch the
    # CONCRETE DataFrame class — pyspark.sql.DataFrame is a base whose
    # subclass overrides sample)
    monkeypatch.setattr(
        type(df), "sample", lambda self, *a, **k: self.limit(0)
    )
    X = _train_sample(df, "embedding", 50, 400, seed=7, who="test")
    assert len(X) == 50
    second = np.asarray(X)[:, 1]
    assert (second < 50).any(), "top-up sample missed the first partition"
    assert (second > 50).any(), "top-up sample is a first-partition prefix"
