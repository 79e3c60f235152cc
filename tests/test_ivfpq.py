"""IVF-PQ ANN (coarse inverted-file quantizer + residual PQ codes):
index shape, one-pass encode, probed retrieval recall on planted
clusters, exactness at nprobe=nlist vs a reconstruction brute force,
and the plan contract (cell filter prunes BEFORE the Arrow pass)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datar_polars_spark import read_parquet
from datar_polars_spark.scale import (
    ivfpq_encode,
    ivfpq_knn_join,
    ivfpq_train,
    pq_knn_join,
)
from datar_polars_spark.tibble import ensure_tibble

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_parquet(spark, f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(emb):
    return ivfpq_train(
        emb, n_clusters=8, m=4, nbits=5, iters=4, sample_size=600, seed=5
    )


@pytest.fixture(scope="module")
def coded(emb, index):
    return ivfpq_encode(emb, index)


def test_index_shapes(emb, index):
    dim = len(emb.df.select("embedding").first()[0])
    assert len(index["centroids"]) == 8
    assert all(len(c) == dim for c in index["centroids"])
    assert len(index["codebook"]) == 4
    for bj in index["codebook"]:
        assert len(bj) <= 32
        assert all(len(c) == dim // 4 for c in bj)


def test_encode_one_narrow_pass(spark, coded):
    rows = coded.df.select("vec_id", "ivf_cell", "pq_code").collect()
    assert all(0 <= r["ivf_cell"] < 8 for r in rows)
    assert all(len(r["pq_code"]) == 4 for r in rows)
    assert all(0 <= c < 32 for r in rows for c in r["pq_code"])
    plan = coded.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map, no shuffle
    assert "BatchEvalPython" not in plan


def test_residual_encoding_beats_nothing(spark, emb, index, coded):
    """The cell assignment must be the true nearest coarse centroid."""
    C = np.array(index["centroids"])
    rows = coded.df.select("vec_id", "embedding", "ivf_cell").limit(50).collect()
    for r in rows:
        x = np.array(list(r["embedding"]), dtype="float64")
        want = int(((C - x[None, :]) ** 2).sum(axis=1).argmin())
        assert r["ivf_cell"] == want


def test_exact_at_full_probe_vs_reconstruction(spark, emb, index, coded):
    """nprobe = nlist probes everything, so the result must EQUAL the
    exact ADC ranking over residual codes — computed independently by
    reconstructing every code (centroid + residual centroids) and
    ranking exact L2^2 in numpy."""
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 4")
    )
    got = ivfpq_knn_join(
        queries, coded, index, k=6, nprobe=8
    ).df.collect()

    C = np.array(index["centroids"])
    B = [np.array(bj) for bj in index["codebook"]]
    crows = coded.df.select("vec_id", "ivf_cell", "pq_code").collect()
    recon = {
        r["vec_id"]: C[r["ivf_cell"]]
        + np.concatenate([B[j][r["pq_code"][j]] for j in range(4)])
        for r in crows
    }
    qrows = {
        r["vec_id"]: np.array(list(r["embedding"]), dtype="float64")
        for r in emb.df.select("vec_id", "embedding").where("vec_id < 4").collect()
    }
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(qrows)
    for qid, rows in by_q.items():
        q = qrows[qid]
        exact = sorted(
            ((float(((q - v) ** 2).sum()), mid) for mid, v in recon.items())
        )[:6]
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [r["match_id"] for r in rows] == [mid for _, mid in exact], qid
        for r, (d, _) in zip(rows, exact):
            assert r["pq_dist"] == pytest.approx(d, abs=1e-9)


def test_planted_cluster_recall(spark):
    """Planted tight clusters: with nprobe=1 every query's neighbors
    must come from its own cluster (the coarse quantizer finds the
    cluster, the residual codes rank inside it)."""
    rng = np.random.RandomState(7)
    centers = rng.randn(6, 32) * 10
    rows = [
        (i, (centers[i % 6] + rng.randn(32) * 0.05).tolist(), i % 6)
        for i in range(600)
    ]
    td = ensure_tibble(
        spark.createDataFrame(rows, "vec_id int, embedding array<double>, label int")
    )
    index = ivfpq_train(td, n_clusters=6, m=4, nbits=4, iters=6,
                        sample_size=600, seed=1)
    coded = ivfpq_encode(td, index)
    queries = ensure_tibble(td.df.select("vec_id", "embedding").where("vec_id < 12"))
    got = ivfpq_knn_join(queries, coded, index, k=20, nprobe=1).df.collect()
    labels = {i: lab for i, _, lab in rows}
    n_per_q = {}
    for r in got:
        assert labels[r["match_id"]] == labels[r["query_id"]], r
        n_per_q[r["query_id"]] = n_per_q.get(r["query_id"], 0) + 1
    assert all(v == 20 for v in n_per_q.values())


def test_recall_vs_flat_pq_brute(spark, emb, index, coded):
    """Probing 4 of 8 cells must retrieve most of the full-probe top-k
    (recall floor 0.6 on this corpus) — the pruning/recall tradeoff."""
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 8")
    )
    full = ivfpq_knn_join(queries, coded, index, k=10, nprobe=8).df.collect()
    pruned = ivfpq_knn_join(queries, coded, index, k=10, nprobe=4).df.collect()
    fk = {}
    for r in full:
        fk.setdefault(r["query_id"], set()).add(r["match_id"])
    hits = tot = 0
    for r in pruned:
        tot += 1
        hits += r["match_id"] in fk[r["query_id"]]
    assert hits / tot >= 0.6, hits / tot


def test_cell_filter_prunes_before_arrow_pass(spark, emb, index, coded):
    """The plan contract: the probed-cell isin filter sits UPSTREAM of
    the MapInPandas scorer (so a cell-partitioned corpus layout prunes
    partitions before any Python runs), and nothing is a cartesian
    product or row-at-a-time Python."""
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 2")
    )
    out = ivfpq_knn_join(queries, coded, index, k=5, nprobe=2)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan
    # the isin predicate on the cell column appears below the Arrow node
    import re

    ipos = plan.find("MapInPandas")
    m = re.search(r"cell[#.\w]* IN \(", plan[ipos:])
    assert m, "cell isin filter must be upstream (printed below) MapInPandas"


def test_validation(spark, emb, index, coded):
    bad = ensure_tibble(
        spark.createDataFrame([(1, [0.0] * 3)], "vec_id int, embedding array<double>")
    )
    with pytest.raises(ValueError, match="dim"):
        ivfpq_knn_join(bad, coded, index, k=3)
    empty = ensure_tibble(
        spark.createDataFrame([], "vec_id int, embedding array<double>")
    )
    with pytest.raises(ValueError, match="empty"):
        ivfpq_knn_join(empty, coded, index, k=3)
    with pytest.raises(ValueError, match="divisible"):
        ivfpq_train(emb, n_clusters=4, m=7, sample_size=100)


def test_distributed_matches_batch(spark, emb, index, coded):
    """A query table past max_queries switches to the cogrouped
    (cell, query-block) path; ids, distances, and ranks must match the
    driver-batch path exactly at every nprobe."""
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 10")
    )
    for nprobe in (2, 8):
        batch = ivfpq_knn_join(queries, coded, index, k=5, nprobe=nprobe).df.collect()
        dist = ivfpq_knn_join(
            queries, coded, index, k=5, nprobe=nprobe,
            max_queries=4, n_query_blocks=3,
        ).df.collect()
        kf = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        assert [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(batch, key=kf)] \
            == [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(dist, key=kf)], nprobe
        for b, d in zip(sorted(batch, key=kf), sorted(dist, key=kf)):
            assert b["pq_dist"] == pytest.approx(d["pq_dist"], abs=1e-9)


def test_distributed_plan_shape(spark, emb, index, coded):
    """Cogrouped Arrow path: FlatMapCoGroupsInPandas, no cartesian
    product, no row-at-a-time Python, WindowGroupLimit finalize."""
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 10")
    )
    out = ivfpq_knn_join(queries, coded, index, k=5, nprobe=2, max_queries=4)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan


def test_cell_partitioned_layout_prunes_partitions(spark, emb, index, tmp_path):
    """The 100 TB story end-to-end: encode once, write the code table
    partitioned by ivf_cell, and a probed retrieval's SCAN must carry
    the probed cells as PartitionFilters — Spark reads only nprobe/nlist
    of the files, before any scoring runs."""
    from datar_polars_spark import read_parquet
    from datar_polars_spark.sources import write_parquet

    coded = ivfpq_encode(emb, index)
    path = str(tmp_path / "ivfpq_codes")
    write_parquet(
        coded.with_df(coded.df.select("vec_id", "ivf_cell", "pq_code")),
        path,
        partition_by="ivf_cell",
    )
    back = read_parquet(spark, path)
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 2")
    )
    out = ivfpq_knn_join(queries, back, index, k=5, nprobe=2)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*ivf_cell[^\]]*IN", plan)
    assert m, "probed-cell isin must reach the scan as a PartitionFilter"
    # and the result is still correct vs the unpartitioned frame
    want = ivfpq_knn_join(queries, ivfpq_encode(emb, index), index, k=5, nprobe=2)
    kw = [(r["query_id"], r["rank"], r["match_id"]) for r in want.df.collect()]
    kg = [(r["query_id"], r["rank"], r["match_id"]) for r in out.df.collect()]
    assert sorted(kg) == sorted(kw)


# ---- exact re-ranking (FAISS refine step) ----------------------------------

def test_rerank_covering_equals_exact_bruteforce(spark, emb, index, coded):
    """With nprobe = nlist and a rerank window covering the whole
    corpus, the result must equal the TRUE exact L2 top-k over raw
    vectors — quantization error fully refined away."""
    n = emb.df.count()
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 3")
    )
    k = 5
    got = ivfpq_knn_join(
        queries, coded, index, k=k, nprobe=8,
        rerank=(n // k) + 1,  # c*k >= corpus size: candidates = everything
    ).df.collect()
    rows = emb.df.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(list(r["embedding"]), dtype="float64") for r in rows}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qrows in by_q.items():
        q = vecs[qid]
        exact = sorted(
            ((float(((q - v) ** 2).sum()), mid) for mid, v in vecs.items())
        )[:k]
        qrows = sorted(qrows, key=lambda r: r["rank"])
        assert [r["match_id"] for r in qrows] == [mid for _, mid in exact], qid
        for r, (d, _) in zip(qrows, exact):
            assert r["pq_dist"] == pytest.approx(d, abs=1e-9)


def test_rerank_improves_recall(spark, emb, index, coded):
    """rerank=4 recall vs the exact ground truth must be >= the
    no-rerank ADC recall (the point of the refine step)."""
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 8")
    )
    k = 10
    rows = emb.df.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(list(r["embedding"]), dtype="float64") for r in rows}
    truth = {}
    for qid in range(8):
        q = vecs[qid]
        truth[qid] = {
            mid for _, mid in sorted(
                ((float(((q - v) ** 2).sum()), m) for m, v in vecs.items())
            )[:k]
        }

    def recall(res):
        hit = tot = 0
        for r in res:
            tot += 1
            hit += r["match_id"] in truth[r["query_id"]]
        return hit / tot

    plain = recall(ivfpq_knn_join(queries, coded, index, k=k, nprobe=8).df.collect())
    refined = recall(
        ivfpq_knn_join(queries, coded, index, k=k, nprobe=8, rerank=4).df.collect()
    )
    # unstructured random embeddings at m=4/nbits=5 are the WORST case
    # for PQ resolution; the refine step still roughly doubles recall
    # (measured 0.34 -> 0.64 on this fixture)
    assert refined >= plain + 0.1, (plain, refined)
    assert refined >= 0.5, (plain, refined)


def test_rerank_distributed_path_matches_batch(spark, emb, index, coded):
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 9")
    )
    b = ivfpq_knn_join(queries, coded, index, k=4, nprobe=4, rerank=3).df.collect()
    d = ivfpq_knn_join(
        queries, coded, index, k=4, nprobe=4, rerank=3, max_queries=4
    ).df.collect()
    kf = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(b, key=kf)] \
        == [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(d, key=kf)]


def test_rerank_requires_raw_vectors(spark, emb, index, coded):
    stripped = ensure_tibble(coded.df.select("vec_id", "ivf_cell", "pq_code"))
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 2")
    )
    with pytest.raises(ValueError, match="raw corpus vectors"):
        ivfpq_knn_join(queries, stripped, index, k=3, rerank=2).df.collect()


def test_l2_normalize_makes_any_l2_index_cosine(spark, emb):
    """The composition contract: normalize corpus AND queries, index
    with IVF-PQ, full probe + covering rerank — the result must equal
    the exact brute-force COSINE top-k (for unit vectors
    ||a-b||^2 = 2 - 2 cos, a monotone map)."""
    from datar_polars_spark.scale import l2_normalize

    n = emb.df.count()
    k = 5
    norm = l2_normalize(emb)
    index = ivfpq_train(norm, n_clusters=4, m=4, nbits=5, iters=3,
                        sample_size=600, seed=3)
    coded = ivfpq_encode(norm, index)
    queries = ensure_tibble(
        l2_normalize(emb).df.select("vec_id", "embedding").where("vec_id < 3")
    )
    got = ivfpq_knn_join(
        queries, coded, index, k=k, nprobe=4, rerank=(n // k) + 1
    ).df.collect()

    rows = emb.df.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(list(r["embedding"]), dtype="float64") for r in rows}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qrows in by_q.items():
        q = vecs[qid]
        qn = q / np.linalg.norm(q)
        cos = sorted(
            (
                (-float(v @ qn / np.linalg.norm(v)), mid)
                for mid, v in vecs.items()
            )
        )[:k]
        qrows = sorted(qrows, key=lambda r: r["rank"])
        assert [r["match_id"] for r in qrows] == [mid for _, mid in cos], qid


def test_l2_normalize_unit_norms_and_zero_vectors(spark):
    from datar_polars_spark.scale import l2_normalize

    td = ensure_tibble(
        spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, None)],
            "vec_id int, embedding array<double>",
        )
    )
    rows = {r["vec_id"]: r["embedding"] for r in l2_normalize(td).df.collect()}
    assert rows[1] == pytest.approx([0.6, 0.8])
    assert rows[2] == [0.0, 0.0]  # zero vector passes through, no NaN
    assert rows[3] is None
    plan = l2_normalize(td).df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

# ---- NULL hygiene (ADVICE r8: rerank displacement + NULL ids) --------------

def test_rerank_null_corpus_embedding_never_displaces(spark, emb, index, coded):
    """A corpus row whose RAW embedding is NULL (codes present — e.g.
    the vector column was dropped/corrupted after encoding) must not
    poison the refine stage: pre-fix, its NULL exact distance sorted
    NULLS-FIRST and displaced every real match. The result must equal
    the brute-force exact top-k over the scorable (non-NULL) rows,
    rank 1 a real match, no NULL match_id / pq_dist anywhere."""
    n = emb.df.count()
    k = 5
    # null out the raw vectors of three corpus rows, keep their codes
    nulled = {7, 11, 13}
    corpus = ensure_tibble(
        coded.df.withColumn(
            "embedding",
            F.when(
                F.col("vec_id").isin(*nulled), F.lit(None)
            ).otherwise(F.col("embedding")),
        )
    )
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 3")
    )
    got = ivfpq_knn_join(
        queries, corpus, index, k=k, nprobe=8,
        rerank=(n // k) + 1,  # covering: every code row is a candidate
    ).df.collect()
    assert got, "rerank returned nothing"
    assert all(r["match_id"] is not None for r in got)
    assert all(r["pq_dist"] is not None for r in got)
    rows = emb.df.select("vec_id", "embedding").collect()
    vecs = {
        r["vec_id"]: np.array(list(r["embedding"]), dtype="float64")
        for r in rows
        if r["vec_id"] not in nulled
    }
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, qrows in by_q.items():
        q = np.array(
            list(next(r["embedding"] for r in rows if r["vec_id"] == qid)),
            dtype="float64",
        )
        exact = sorted(
            ((float(((q - v) ** 2).sum()), mid) for mid, v in vecs.items())
        )[:k]
        qrows = sorted(qrows, key=lambda r: r["rank"])
        assert len(qrows) == k, qid  # survivors fill the top-k
        assert [r["match_id"] for r in qrows] == [m for _, m in exact], qid


def test_null_corpus_id_not_scored(spark, emb, index, coded):
    """A corpus row with a NULL id must be excluded BEFORE scoring:
    its code would tie with its source row and NULLS-FIRST id
    tie-breaking would rank the NULL ahead of the real id."""
    idt = dict(coded.df.dtypes)["vec_id"]
    planted = coded.df.limit(1).withColumn(
        "vec_id", F.lit(None).cast(idt)
    )
    corpus = ensure_tibble(coded.df.unionByName(planted))
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 3")
    )
    clean = ivfpq_knn_join(queries, coded, index, k=4, nprobe=8).df.collect()
    got = ivfpq_knn_join(queries, corpus, index, k=4, nprobe=8).df.collect()
    assert all(r["match_id"] is not None for r in got)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(got, key=key)] \
        == [(r["query_id"], r["match_id"], r["rank"]) for r in sorted(clean, key=key)]


def test_ivfpq_train_empty_and_all_null_raise(spark, emb):
    from datar_polars_spark.scale import ivfpq_train as _train

    empty = ensure_tibble(
        spark.createDataFrame([], "vec_id long, embedding array<double>")
    )
    with pytest.raises(ValueError, match="empty table"):
        _train(empty, n_clusters=2, m=2, nbits=2)
    allnull = ensure_tibble(
        spark.createDataFrame(
            [(1, None), (2, None)], "vec_id long, embedding array<double>"
        )
    )
    with pytest.raises(ValueError, match="non-NULL"):
        _train(allnull, n_clusters=2, m=2, nbits=2)


def test_distributed_path_prunes_unprobed_cells(spark, emb, index, coded):
    """The distributed cogroup must NOT replicate every corpus code row
    to every query block: codes join the broadcast distinct live
    (cell, block) pairs, so unprobed cells never enter the shuffle.
    Locked at the plan level — the corpus side of the cogroup carries a
    BroadcastHashJoin on the cell key and the old explode(sequence(0,
    nblocks-1)) replication is gone — plus result equality above."""
    queries = ensure_tibble(
        emb.df.select("vec_id", "embedding").where("vec_id < 10")
    )
    out = ivfpq_knn_join(
        queries, coded, index, k=5, nprobe=2, max_queries=4, n_query_blocks=3
    )
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastHashJoin" in plan, "live-pair pruning join missing"
    assert "sequence(0" not in plan, (
        "corpus codes must join live (cell, block) pairs, not explode to "
        "all blocks"
    )


# ---- index lifecycle: ivfpq_write / ivfpq_read (r10) -----------------------

class TestIndexLifecycle:
    def test_write_read_roundtrip_exact(self, spark, emb, index, coded, tmp_path):
        """write -> read returns the EXACT index (JSON round-trips
        float64) and a code table equal to what was encoded."""
        from datar_polars_spark.scale import ivfpq_read, ivfpq_write

        path = str(tmp_path / "deploy")
        ivfpq_write(
            coded.with_df(coded.df.select("vec_id", "ivf_cell", "pq_code")),
            index, path,
        )
        codes, loaded = ivfpq_read(spark, path)
        assert loaded["centroids"] == index["centroids"]
        assert loaded["codebook"] == index["codebook"]
        assert loaded["nlist"] == 8 and loaded["m"] == 4
        assert loaded["ksub"] == 32 and loaded["cell_col"] == "ivf_cell"
        want = {
            r["vec_id"]: (r["ivf_cell"], tuple(r["pq_code"]))
            for r in coded.df.select("vec_id", "ivf_cell", "pq_code").collect()
        }
        got = {
            r["vec_id"]: (r["ivf_cell"], tuple(r["pq_code"]))
            for r in codes.df.collect()
        }
        assert got == want

    def test_read_handle_query_equals_in_memory(self, spark, emb, index, coded, tmp_path):
        """A retrieval over the read handle is bit-identical to the
        in-memory one, AND the probed isin reaches the scan as a
        PartitionFilter (the pruned deployment path as an API)."""
        import re

        from datar_polars_spark.scale import ivfpq_read, ivfpq_write

        path = str(tmp_path / "deploy2")
        ivfpq_write(
            coded.with_df(coded.df.select("vec_id", "ivf_cell", "pq_code")),
            index, path,
        )
        codes, loaded = ivfpq_read(spark, path)
        queries = ensure_tibble(
            emb.df.select("vec_id", "embedding").where("vec_id < 5")
        )
        got = ivfpq_knn_join(queries, codes, loaded, k=5, nprobe=2)
        plan = got.df._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"PartitionFilters: \[[^\]]*ivf_cell[^\]]*IN", plan)
        want = ivfpq_knn_join(queries, coded, index, k=5, nprobe=2)
        kw = [(r["query_id"], r["rank"], r["match_id"], round(r["pq_dist"], 9))
              for r in want.df.collect()]
        kg = [(r["query_id"], r["rank"], r["match_id"], round(r["pq_dist"], 9))
              for r in got.df.collect()]
        assert sorted(kg) == sorted(kw)

    def test_index_path_accepted_directly(self, spark, emb, index, coded, tmp_path):
        """ivfpq_knn_join / ivfpq_encode accept the deployment path in
        place of the dict — the sidecar loads itself."""
        from datar_polars_spark.scale import ivfpq_read, ivfpq_write

        path = str(tmp_path / "deploy3")
        ivfpq_write(
            coded.with_df(coded.df.select("vec_id", "ivf_cell", "pq_code")),
            index, path,
        )
        codes, _ = ivfpq_read(spark, path)
        queries = ensure_tibble(
            emb.df.select("vec_id", "embedding").where("vec_id < 3")
        )
        by_path = ivfpq_knn_join(queries, codes, path, k=5, nprobe=2)
        by_dict = ivfpq_knn_join(queries, codes, index, k=5, nprobe=2)
        key = lambda r: (r["query_id"], r["rank"], r["match_id"])  # noqa: E731
        assert sorted(map(key, by_path.df.collect())) \
            == sorted(map(key, by_dict.df.collect()))
        re_coded = ivfpq_encode(emb, path)
        assert re_coded.df.select("ivf_cell").distinct().count() \
            == coded.df.select("ivf_cell").distinct().count()

    def test_validation(self, spark, emb, index, tmp_path):
        from datar_polars_spark.scale import ivfpq_write

        with pytest.raises(ValueError, match="ivfpq_encode first"):
            ivfpq_write(emb, index, str(tmp_path / "x"))
        coded = ivfpq_encode(emb, index)
        with pytest.raises(ValueError, match="ivfpq_train"):
            ivfpq_write(coded, {"nope": 1}, str(tmp_path / "y"))
        with pytest.raises(TypeError, match="ivfpq_write path"):
            ivfpq_knn_join(emb, coded, 42)
        # a path with no sidecar fails with the Spark read error
        with pytest.raises(Exception):
            from datar_polars_spark.scale import ivfpq_read

            ivfpq_read(spark, str(tmp_path / "missing"))


def test_udf_extraction_survives_warm_session(spark, emb):
    """r12 regression pin for a Spark 4.1 planner bug: a pandas UDF
    applied over the pre-r12 nested-let normalize expression silently
    lost its ArrowEvalPython extraction once ANY earlier job had run
    in the session (exprId-offset dependent), leaving a raw PythonUDF
    in a Project that fails at execution with INTERNAL_ERROR. The r12
    l2_normalize binds the norm as a real projection column instead;
    this test warms the session explicitly, then asserts both the
    extraction and a clean end-to-end run — and that the norm stayed
    hoisted (ONE aggregate per row, not one per element)."""
    from datar_polars_spark.scale import l2_normalize

    spark.range(1).count()  # ensure the session is warm
    norm = l2_normalize(emb)
    index = ivfpq_train(norm, n_clusters=4, m=4, nbits=5, iters=2,
                        sample_size=400, seed=7)
    coded = ivfpq_encode(norm, index)
    queries = ensure_tibble(
        l2_normalize(emb).df.select("vec_id", "embedding").where("vec_id < 3")
    )
    j = ivfpq_knn_join(queries, coded, index, k=3, nprobe=4, rerank=10)
    plan = j.df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # extraction happened
    # no raw PythonUDF left inside a plain Project/Filter
    import re
    for line in plan.splitlines():
        if re.search(r"^\s*(:|\+|\|)*\s*[+-]*\s*(Project|Filter) ", line):
            assert "enc(" not in line, line[:200]
    rows = j.df.collect()
    assert len(rows) == 9  # 3 queries x k=3
    # the hoisted norm: aggregate( appears in a Project column, and the
    # per-element division lambda references an attribute, not the
    # aggregate itself
    enc_lines = [l for l in plan.splitlines() if "ArrowEvalPython" in l]
    assert enc_lines and "aggregate(" not in enc_lines[0]
