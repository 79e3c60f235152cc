"""Cross-table embedding match (embedding_join) + semantic
decontamination: broadcast mode is EXACT (== brute-force cosine over
the pair space), LSH mode recalls planted near-dups with capped
buckets, and decontaminate_semantic drops exactly the leaked rows
while keeping NULL-embedding rows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datar_polars_spark import read_parquet
from datar_polars_spark.scale import decontaminate_semantic, embedding_join
from datar_polars_spark.tibble import ensure_tibble

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_parquet(spark, f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def bench(spark, emb):
    """Benchmark = rescaled copies of corpus vectors 0..9 (cosine 1
    with their sources) under shifted ids."""
    return ensure_tibble(
        emb.df.where("vec_id < 10").select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.transform(
                "embedding", lambda v: v * F.lit(0.5)
            ).alias("embedding"),
        )
    )


def _brute(emb, bench, threshold):
    want = set()
    corpus = emb.df.select("vec_id", "embedding").collect()
    bv = [
        (r["vec_id"], np.array(r["embedding"], dtype="float64"))
        for r in bench.df.collect()
    ]
    for r in corpus:
        a = np.array(r["embedding"], dtype="float64")
        na = np.linalg.norm(a) or 1.0
        for bid, b in bv:
            nb = np.linalg.norm(b) or 1.0
            if float(a @ b / (na * nb)) >= threshold:
                want.add((r["vec_id"], bid))
    return want


def test_broadcast_mode_equals_bruteforce(spark, emb, bench):
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_join(emb, bench, threshold=0.99).df.collect()
    }
    assert got == _brute(emb, bench, 0.99)
    assert got >= {(i, i + 100_000) for i in range(10)}  # planted pairs


def test_broadcast_is_one_narrow_arrow_pass(spark, emb, bench):
    out = embedding_join(emb, bench, threshold=0.99, mode="broadcast")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # runs inside the corpus scan
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1


def test_lsh_mode_recalls_planted_pairs(spark, emb, bench):
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_join(
            emb, bench, threshold=0.99, mode="lsh"
        ).df.collect()
    }
    assert got >= {(i, i + 100_000) for i in range(10)}
    # LSH candidates are verified by exact cosine: no false accepts
    assert got <= _brute(emb, bench, 0.99)


def test_lsh_bucket_cap_registers_drops(spark):
    """An identical-vector mega-cluster on one side exceeds the cap:
    candidates drop (no quadratic blowup) and accounting sees it."""
    from datar_polars_spark.scale.dedup import dropped_pairs_estimate

    left = ensure_tibble(
        spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)],
            "vec_id long, embedding array<double>",
        )
    )
    right = ensure_tibble(
        spark.createDataFrame(
            [(100, [1.0, 2.0, 3.0, 4.0])],
            "vec_id long, embedding array<double>",
        )
    )
    out = embedding_join(
        left, right, threshold=0.9, mode="lsh", max_bucket=5
    )
    assert out.df.count() == 0  # the 30-member buckets are capped away
    assert dropped_pairs_estimate("embedding_join") > 0
    # uncapped, every pair verifies
    out2 = embedding_join(left, right, threshold=0.9, mode="lsh")
    assert out2.df.count() == 30


def test_null_embeddings_never_match_and_survive_decon(spark, emb, bench):
    withnull = ensure_tibble(
        emb.df.select("vec_id", "embedding").unionByName(
            emb.df.sparkSession.createDataFrame(
                [(999_999, None)], "vec_id long, embedding array<float>"
            )
        )
    )
    hits = embedding_join(withnull, bench, threshold=0.99)
    assert 999_999 not in {r["id_a"] for r in hits.df.collect()}
    clean = decontaminate_semantic(withnull, bench, threshold=0.99)
    ids = {r["vec_id"] for r in clean.df.select("vec_id").collect()}
    assert 999_999 in ids  # unverifiable -> kept
    assert not (ids & set(range(10)))  # leaked sources dropped


def test_decontaminate_semantic_drops_exactly_the_leaks(spark, emb, bench):
    clean = decontaminate_semantic(emb, bench, threshold=0.99)
    all_ids = {r["vec_id"] for r in emb.df.select("vec_id").collect()}
    ids = {r["vec_id"] for r in clean.df.select("vec_id").collect()}
    brute_dropped = {a for a, _ in _brute(emb, bench, 0.99)}
    assert all_ids - ids == brute_dropped


def test_auto_routing_and_validation(spark, emb, bench):
    # auto with a tiny right side -> broadcast (exact == brute force)
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_join(
            emb, bench, threshold=0.99, mode="auto"
        ).df.collect()
    }
    assert got == _brute(emb, bench, 0.99)
    with pytest.raises(ValueError, match="mode"):
        embedding_join(emb, bench, mode="nope")
    with pytest.raises(ValueError, match="max_broadcast"):
        embedding_join(emb, emb, mode="broadcast", max_broadcast=3)
    # mismatched dims fail loudly in the Arrow pass
    bad = ensure_tibble(
        spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
    )
    with pytest.raises(Exception, match="dim"):
        embedding_join(emb, bad, mode="broadcast").df.collect()


def test_empty_right_side(spark, emb):
    empty = ensure_tibble(
        emb.df.sparkSession.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
    )
    assert embedding_join(emb, empty).df.count() == 0
    assert (
        decontaminate_semantic(emb, empty).df.count() == emb.df.count()
    )


class TestStreamDecontaminateSemantic:
    """Streaming semantic decontamination: the broadcast-matrix probe
    is stateless, so the same exact filter runs per micro-batch."""

    def test_stream_matches_batch_survivors(self, spark, emb, bench, tmp_path):
        from datar_polars_spark.streaming import (
            run_to_memory,
            stream_decontaminate_semantic,
            stream_read_parquet,
        )

        src = str(tmp_path / "emb_stream")
        emb.df.select("vec_id", "embedding").unionByName(
            spark.createDataFrame(
                [(999_999, None)], "vec_id long, embedding array<float>"
            )
        ).write.parquet(src)
        sdf = stream_read_parquet(spark, src)
        out = stream_decontaminate_semantic(sdf, bench, threshold=0.99)
        got = run_to_memory(out, mode="append")
        ids = set(got["vec_id"])
        want = {
            r["vec_id"]
            for r in decontaminate_semantic(emb, bench, threshold=0.99)
            .df.select("vec_id")
            .collect()
        } | {999_999}  # NULL embedding: unverifiable -> clean
        assert ids == want
        assert not (ids & set(range(10)))  # leaked sources dropped
        assert list(got.columns) == ["vec_id", "embedding"]

    def test_validation_and_empty_benchmark(self, spark, emb, bench, tmp_path):
        from datar_polars_spark.streaming import (
            stream_decontaminate_semantic,
            stream_read_parquet,
        )

        src = str(tmp_path / "emb_stream2")
        emb.df.select("vec_id", "embedding").write.parquet(src)
        sdf = stream_read_parquet(spark, src)
        with pytest.raises(ValueError, match="max_benchmark"):
            stream_decontaminate_semantic(sdf, emb, max_benchmark=3)
        # an empty benchmark is a no-op passthrough
        empty = ensure_tibble(
            spark.createDataFrame([], "vec_id long, embedding array<double>")
        )
        out = stream_decontaminate_semantic(sdf, empty)
        assert out is sdf


def test_broadcast_clears_stale_lsh_accounting(spark):
    """dropped_pairs_estimate describes the LATEST call: an exact
    broadcast join after a capped LSH join must report 0.0."""
    from datar_polars_spark.scale.dedup import dropped_pairs_estimate

    left = ensure_tibble(
        spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)],
            "vec_id long, embedding array<double>",
        )
    )
    right = ensure_tibble(
        spark.createDataFrame(
            [(100, [1.0, 2.0, 3.0, 4.0])],
            "vec_id long, embedding array<double>",
        )
    )
    embedding_join(left, right, threshold=0.9, mode="lsh", max_bucket=5).df.count()
    assert dropped_pairs_estimate("embedding_join") > 0
    embedding_join(left, right, threshold=0.9, mode="broadcast").df.count()
    assert dropped_pairs_estimate("embedding_join") == 0.0


def test_contamination_report_semantic(spark, emb, bench):
    """One row per corpus doc: match count (0 when clean) and max
    cosine (NULL when clean); counts agree with brute force."""
    from collections import Counter

    from datar_polars_spark.scale import contamination_report_semantic

    rep = contamination_report_semantic(emb, bench, threshold=0.99)
    rows = {r["vec_id"]: r for r in rep.df.collect()}
    assert len(rows) == emb.df.count()  # every doc reported
    want = Counter(a for a, _ in _brute(emb, bench, 0.99))
    for vid, r in rows.items():
        assert r["contaminated_matches"] == want.get(vid, 0)
        if want.get(vid, 0) == 0:
            assert r["max_cosine"] is None
        else:
            assert r["max_cosine"] >= 0.99


def test_contamination_report_with_id_a_named_column(spark, emb, bench):
    """ADVICE r10: a user id column literally named 'id_a'
    (embedding_join's fixed output name) must neither make the
    join-back ambiguous nor get dropped from the report."""
    from datar_polars_spark.scale import contamination_report_semantic

    renamed = ensure_tibble(emb.df.withColumnRenamed("vec_id", "id_a"))
    bench_renamed = ensure_tibble(
        bench.df.withColumnRenamed("vec_id", "id_a")
    )
    rep = contamination_report_semantic(
        renamed, bench_renamed, id_col="id_a", threshold=0.99
    )
    assert set(rep.columns) == {"id_a", "contaminated_matches", "max_cosine"}
    rows = {r["id_a"]: r["contaminated_matches"] for r in rep.df.collect()}
    assert len(rows) == emb.df.count()
    assert all(rows[i] >= 1 for i in range(10))  # planted leaks counted


def test_stream_decon_semantic_from_index_path(spark, emb, bench, tmp_path):
    """r12: the benchmark may be a persistent semantic-index PATH —
    the broadcast matrix loads from the index's vectors store, and
    survivors equal the frame-backed run."""
    from datar_polars_spark.scale import semantic_index_build
    from datar_polars_spark.streaming import (
        run_to_memory,
        stream_decontaminate_semantic,
        stream_read_parquet,
    )

    path = str(tmp_path / "sidx")
    semantic_index_build(bench, "embedding", "vec_id", path)
    src = str(tmp_path / "emb_stream_idx")
    emb.df.select("vec_id", "embedding").write.parquet(src)
    sdf = stream_read_parquet(spark, src)
    got = set(
        run_to_memory(
            stream_decontaminate_semantic(sdf, path, threshold=0.99),
            mode="append",
        )["vec_id"]
    )
    want = set(
        run_to_memory(
            stream_decontaminate_semantic(
                stream_read_parquet(spark, src), bench, threshold=0.99
            ),
            mode="append",
        )["vec_id"]
    )
    assert got == want
    assert not (got & set(range(10)))
