"""Streaming per-key admission cap (stream_cap_per_key): at most n
rows per key pass through ACROSS micro-batches (one counter per key in
the state store), schema preserved, validation fail-fast."""

import pandas as pd
import pytest

from datar_polars_spark.streaming import run_to_memory, stream_cap_per_key


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, domain string"
    ).write.mode("append").parquet(path)


def test_cap_holds_across_micro_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 turns each parquet file into its own
    micro-batch: the counter must carry over, so a key that filled its
    cap in batch 1 admits nothing in batch 2."""
    src = str(tmp_path / "crawl")
    _write(spark, src, [(i, "mega.com") for i in range(5)]
           + [(100, "small.com")])
    _write(spark, src, [(i, "mega.com") for i in range(10, 15)]
           + [(101, "small.com"), (102, None)])

    sdf = (
        spark.readStream.schema("doc_id long, domain string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stream_cap_per_key(sdf, "domain", 3)
    got = run_to_memory(out, mode="append")
    by_key = got.groupby("domain").size().to_dict()
    assert by_key["mega.com"] == 3  # 5 + 5 arrivals, 3 admitted total
    assert by_key["small.com"] == 2  # under cap: everything passes
    assert got["domain"].isna().sum() == 1  # NULL key has its own counter
    assert list(got.columns) == ["doc_id", "domain"]  # schema preserved


def test_under_cap_passes_everything(spark, tmp_path):
    src = str(tmp_path / "under")
    rows = [(i, f"d{i % 4}.com") for i in range(12)]
    _write(spark, src, rows)
    sdf = spark.readStream.schema("doc_id long, domain string").parquet(src)
    got = run_to_memory(stream_cap_per_key(sdf, "domain", 100), mode="append")
    assert sorted(got["doc_id"]) == sorted(r[0] for r in rows)


def test_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    _write(spark, src, [(1, "a.com")])
    sdf = spark.readStream.schema("doc_id long, domain string").parquet(src)
    with pytest.raises(ValueError, match="n must be"):
        stream_cap_per_key(sdf, "domain", 0)
    with pytest.raises(ValueError, match="not in the"):
        stream_cap_per_key(sdf, "nope", 3)
