"""Streaming MinHash/LSH near-dup vs a static history: a planted
near-duplicate of a lake document is flagged in-stream, matches/filter
modes agree with the batch minhash_join on the same data, and the plan
stays stateless (no state store) in matches mode without ts."""

import pytest
from pyspark.sql import functions as F

from datar_polars_spark import f, filter_, read_parquet
from datar_polars_spark.streaming import (
    run_to_memory,
    stream_near_dedup,
    stream_read_parquet,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
PARAMS = dict(num_perm=64, bands=16, shingle_words=3, threshold=0.5)


@pytest.fixture(scope="module")
def corpus(spark):
    """history = docs 0..349; stream = docs 350..499 plus a PLANTED
    near-dup of history doc (lowest id) with one word changed."""
    docs = read_parquet(spark, DOCS)
    hist = docs >> filter_(f.doc_id < 350)
    base = docs.df.where("doc_id = 0").select("text").first()["text"]
    words = base.split()
    words[len(words) // 2] = "PLANTEDWORD"
    planted = " ".join(words)
    stream_batch = (
        docs.df.where("doc_id >= 350")
        .select("doc_id", "text")
        .unionByName(
            docs.df.sparkSession.createDataFrame(
                [(100_000, planted)], "doc_id long, text string"
            )
        )
    )
    return hist, stream_batch


@pytest.fixture(scope="module")
def stream_src(spark, corpus, tmp_path_factory):
    _, stream_batch = corpus
    src = str(tmp_path_factory.mktemp("near_dedup") / "stream_docs")
    stream_batch.write.parquet(src)
    return src


def _batch_pairs(spark, corpus):
    from datar_polars_spark.scale import minhash_join
    from datar_polars_spark.tibble import ensure_tibble

    hist, stream_batch = corpus
    got = minhash_join(
        ensure_tibble(stream_batch), hist, text="text", id_col="doc_id",
        **PARAMS,
    ).df.collect()
    return {(r["id_a"], r["id_b"]) for r in got}


def test_planted_near_dup_flagged_in_stream(spark, corpus, stream_src):
    hist, _ = corpus
    sdf = stream_read_parquet(spark, stream_src)
    out = stream_near_dedup(sdf, hist, mode="matches", **PARAMS)
    got = run_to_memory(out, mode="append")
    flagged = set(zip(got["doc_id"], got["match_id"]))
    assert (100_000, 0) in flagged
    ests = got.set_index(["doc_id", "match_id"])["jaccard_est"]
    assert float(ests.loc[(100_000, 0)].max()) >= 0.5


def test_matches_mode_batch_parity(spark, corpus, stream_src):
    """Distinct flagged pairs in-stream == the batch minhash_join
    pair set on identical data/params (same hash family both sides)."""
    hist, _ = corpus
    sdf = stream_read_parquet(spark, stream_src)
    out = stream_near_dedup(sdf, hist, mode="matches", **PARAMS)
    got = run_to_memory(out, mode="append")
    stream_pairs = set(zip(got["doc_id"], got["match_id"]))
    assert stream_pairs == _batch_pairs(spark, corpus)


def test_filter_mode_batch_parity(spark, corpus, stream_src):
    """Filter-mode survivors == stream docs minus batch-flagged ids
    (per-doc ANY-match decision via the broadcast Arrow probe)."""
    hist, stream_batch = corpus
    sdf = stream_read_parquet(spark, stream_src)
    out = stream_near_dedup(sdf, hist, mode="filter", **PARAMS)
    got = run_to_memory(out, mode="append")
    dup_ids = {a for a, _ in _batch_pairs(spark, corpus)}
    all_ids = {r["doc_id"] for r in stream_batch.select("doc_id").collect()}
    assert set(got["doc_id"]) == all_ids - dup_ids
    assert 100_000 not in set(got["doc_id"])
    assert list(got.columns) == ["doc_id", "text"]  # scratch cols dropped


def test_ts_dedups_band_multiplicity(spark, corpus, stream_src, tmp_path):
    """With ts=, a pair colliding in several bands emits exactly once
    (dropDuplicatesWithinWatermark on (id, match_id))."""
    import shutil

    hist, _ = corpus
    src = str(tmp_path / "ts_docs")
    spark.read.parquet(stream_src).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    ).write.parquet(src)
    sdf = stream_read_parquet(spark, src)
    out = stream_near_dedup(
        sdf, hist, mode="matches", ts=f.ts, watermark="1 hour", **PARAMS
    )
    got = run_to_memory(out, mode="append")
    pairs = list(zip(got["doc_id"], got["match_id"]))
    assert len(pairs) == len(set(pairs))
    assert (100_000, 0) in set(pairs)


def test_validation(spark, corpus):
    hist, _ = corpus
    sdf = stream_read_parquet(
        hist.df.sparkSession, DOCS
    )
    with pytest.raises(ValueError, match="mode"):
        stream_near_dedup(sdf, hist, mode="nope")
    with pytest.raises(ValueError, match="divisible"):
        stream_near_dedup(sdf, hist, num_perm=64, bands=13)
    with pytest.raises(ValueError, match="max_history"):
        stream_near_dedup(sdf, hist, mode="filter", max_history=10, **{
            k: v for k, v in PARAMS.items()
        })


def test_filter_mode_null_text_rows_pass_through(spark, corpus, tmp_path):
    """Filter mode passes through only CLEAN rows — an unsignable
    (NULL/empty text) row has no verified near-dup in history, so it
    must SURVIVE, not vanish (ADVICE r9: the shared signability
    pre-filter silently dropped it)."""
    hist, stream_batch = corpus
    src = str(tmp_path / "null_docs")
    stream_batch.unionByName(
        spark.createDataFrame(
            [(200_000, None), (200_001, ""), (200_002, "   ")],
            "doc_id long, text string",
        )
    ).write.parquet(src)
    sdf = stream_read_parquet(spark, src)
    out = stream_near_dedup(sdf, hist, mode="filter", **PARAMS)
    got = run_to_memory(out, mode="append")
    survivors = set(got["doc_id"])
    assert {200_000, 200_001, 200_002} <= survivors
    assert 100_000 not in survivors  # the planted near-dup still drops
    # and matches mode still ignores them (they can never emit a match)
    sdf2 = stream_read_parquet(spark, src)
    out2 = stream_near_dedup(sdf2, hist, mode="matches", **PARAMS)
    got2 = run_to_memory(out2, mode="append")
    assert not ({200_000, 200_001, 200_002} & set(got2["doc_id"]))


def test_history_bucket_cap_matches_batch(spark, corpus, stream_src, tmp_path):
    """max_bucket caps the HISTORY side exactly like minhash_join's
    right-side cap: a boilerplate mega-bucket leaves candidate
    generation in BOTH modes, and the dropped-pair accounting
    registers (ADVICE r9: the stream-static join ran uncapped)."""
    from datar_polars_spark.scale import minhash_join
    from datar_polars_spark.scale.dedup import dropped_pairs_estimate
    from datar_polars_spark.tibble import ensure_tibble

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    hist = ensure_tibble(
        spark.createDataFrame(
            [(i, boiler) for i in range(8)], "doc_id long, text string"
        )
    )
    src = str(tmp_path / "boiler_stream")
    spark.createDataFrame(
        [(900, boiler + " extra")], "doc_id long, text string"
    ).write.parquet(src)

    # capped: the 8-member history bucket exceeds max_bucket=4 -> no
    # candidates -> no matches, and the estimator saw the drop
    out = stream_near_dedup(
        stream_read_parquet(spark, src), hist, mode="matches",
        max_bucket=4, **PARAMS,
    )
    got = run_to_memory(out, mode="append")
    assert len(got) == 0
    assert dropped_pairs_estimate("stream_near_dedup") > 0
    # batch minhash_join with the same cap agrees (empty pair set)
    batch = minhash_join(
        ensure_tibble(spark.read.parquet(src)), hist,
        text="text", id_col="doc_id", max_bucket=4, **PARAMS,
    ).df.collect()
    assert batch == []

    # uncapped default: the near-dup IS flagged in both modes
    out2 = stream_near_dedup(
        stream_read_parquet(spark, src), hist, mode="matches", **PARAMS
    )
    got2 = run_to_memory(out2, mode="append")
    assert set(got2["doc_id"]) == {900}

    # filter mode honors the same cap: capped -> the row looks clean
    out3 = stream_near_dedup(
        stream_read_parquet(spark, src), hist, mode="filter",
        max_bucket=4, **PARAMS,
    )
    assert set(run_to_memory(out3, mode="append")["doc_id"]) == {900}
    out4 = stream_near_dedup(
        stream_read_parquet(spark, src), hist, mode="filter", **PARAMS
    )
    assert len(run_to_memory(out4, mode="append")) == 0


def test_reserved_column_clash_raises(spark, corpus):
    hist, _ = corpus
    sdf = stream_read_parquet(spark, DOCS)
    clashing = sdf.withColumn("match_id", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        stream_near_dedup(clashing, hist, **PARAMS)
    with pytest.raises(ValueError, match="max_bucket"):
        stream_near_dedup(sdf, hist, max_bucket=0, **PARAMS)


def test_filter_mode_cap_registers_drops_and_frees_reserved_names(spark, tmp_path):
    """Filter mode's broadcast-index cap must register dropped-pair
    accounting like the matches path (the docstring points users at
    dropped_pairs_estimate), and filter mode must NOT reserve the
    matches-only names (band/bhash/match_id/jaccard_est are never used
    there)."""
    from datar_polars_spark.scale.dedup import dropped_pairs_estimate
    from datar_polars_spark.tibble import ensure_tibble

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    hist = ensure_tibble(
        spark.createDataFrame(
            [(i, boiler) for i in range(8)], "doc_id long, text string"
        )
    )
    src = str(tmp_path / "boiler_stream_f")
    spark.createDataFrame(
        [(900, boiler + " extra", 7)],
        "doc_id long, text string, band int",  # domain col named 'band'
    ).write.parquet(src)
    sdf = stream_read_parquet(spark, src)
    out = stream_near_dedup(sdf, hist, mode="filter", max_bucket=4, **PARAMS)
    got = run_to_memory(out, mode="append")
    assert set(got["doc_id"]) == {900}  # capped -> looks clean
    assert dropped_pairs_estimate("stream_near_dedup") > 0
    # matches mode still rejects the clash it actually suffers from
    with pytest.raises(ValueError, match="reserved"):
        stream_near_dedup(sdf, hist, mode="matches", **PARAMS)


# ---------------------------------------------------------------------------
# r12: history as a persistent dedup-index path (scale/dedup_index.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def didx_path(spark, corpus, tmp_path_factory):
    from datar_polars_spark.scale import dedup_index_build

    hist, _ = corpus
    path = str(tmp_path_factory.mktemp("near_dedup_idx") / "idx")
    dedup_index_build(hist, f.text, f.doc_id, path, **{
        k: v for k, v in PARAMS.items() if k != "threshold"
    })
    return path


def test_index_matches_mode_flags_same_docs(spark, corpus, stream_src, didx_path):
    """Index-backed matches mode flags the same STREAM DOCS as the
    frame-backed run (the index signs one representative per distinct
    normalized text, so pair match_ids can collapse to the
    representative — identical signature, same buckets, same
    estimate — but the flagged id_a set is invariant)."""
    sdf = stream_read_parquet(spark, stream_src)
    out = stream_near_dedup(sdf, didx_path, mode="matches", **PARAMS)
    got = run_to_memory(out, mode="append")
    flagged = set(zip(got["doc_id"], got["match_id"]))
    assert (100_000, 0) in flagged
    assert set(got["doc_id"]) == {a for a, _ in _batch_pairs(spark, corpus)}


def test_index_filter_mode_parity(spark, corpus, stream_src, didx_path):
    hist, stream_batch = corpus
    sdf = stream_read_parquet(spark, stream_src)
    out = stream_near_dedup(sdf, didx_path, mode="filter", **PARAMS)
    got = run_to_memory(out, mode="append")
    dup_ids = {a for a, _ in _batch_pairs(spark, corpus)}
    all_ids = {r["doc_id"] for r in stream_batch.select("doc_id").collect()}
    assert set(got["doc_id"]) == all_ids - dup_ids


def test_index_sidecar_params_override_arguments(spark, corpus, tmp_path,
                                                 tmp_path_factory):
    """The stream must sign with the index's permutation family: the
    sidecar (num_perm=32) overrides the call's num_perm=64. The stream
    doc is an EXACT copy of a history doc, so every band collides at
    any banding; the discriminator is the estimate — signed per the
    sidecar it is 32/32 = 1.0, while an un-overridden 64-perm stream
    signature would zip 32 null-padded slots and score 32/64 = 0.5,
    below the 0.6 threshold."""
    from datar_polars_spark.scale import dedup_index_build

    hist, _ = corpus
    path = str(tmp_path_factory.mktemp("near_dedup_idx32") / "idx")
    dedup_index_build(hist, f.text, f.doc_id, path, num_perm=32, bands=8)
    base = hist.df.where("doc_id = 0").select("text").first()["text"]
    src = str(tmp_path / "copy_stream")
    spark.createDataFrame(
        [(100_001, base)], "doc_id long, text string"
    ).write.parquet(src)
    sdf = stream_read_parquet(spark, src)
    out = stream_near_dedup(
        sdf, path, mode="matches", num_perm=64, bands=16, threshold=0.6
    )
    got = run_to_memory(out, mode="append")
    pairs = set(zip(got["doc_id"], got["match_id"]))
    assert (100_001, 0) in pairs
    est = float(got.set_index(["doc_id", "match_id"])["jaccard_est"]
                .loc[(100_001, 0)].max())
    assert est == 1.0
