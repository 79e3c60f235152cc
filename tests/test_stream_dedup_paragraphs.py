"""Streaming paragraph dedup vs a static history (the Dolma/FineWeb
boilerplate step on a live crawl): stream survivors equal the batch
dedup_paragraphs keep-first answer under history-then-stream ordering,
on both the JVM-literal and broadcast-Arrow history paths; the
stateless stream-vs-stream contract is locked explicitly."""

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale import dedup_paragraphs
from datar_polars_spark.streaming import (
    run_to_memory,
    stream_dedup_paragraphs,
    stream_read_parquet,
)
from datar_polars_spark.tibble import ensure_tibble

BOILER = "Cookie notice: we use cookies."
LICENSE = "Licensed under CC-BY 4.0."

HIST_DOCS = [
    (0, f"Hist intro.\n\n{BOILER}\n\nHist tail."),
    (1, f"{LICENSE}\n\nHist body one."),
    (2, "Hist body two."),
]
# stream docs: boilerplate from history (dropped), a case-variant of a
# history paragraph (dropped under normalize), a within-doc duplicate
# (dropped), short exempt paragraphs, NULL and empty text — but no NEW
# paragraph shared between two stream docs, so batch keep-first over
# history-then-stream equals the stateless per-doc answer exactly
STREAM_DOCS = [
    (100, f"Fresh alpha.\n\n{BOILER}\n\nFresh beta."),
    (101, f"  {LICENSE.upper()}  \n\nFresh gamma."),
    (102, "Repeat me.\n\nRepeat me.\n\nFresh delta."),
    (103, "hi\n\nFresh epsilon.\n\nhi"),
    (104, None),
    (105, ""),
    (106, f"{BOILER}"),
]


@pytest.fixture(scope="module")
def hist(spark):
    return ensure_tibble(
        spark.createDataFrame(HIST_DOCS, "doc_id long, text string")
    )


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("para_dedup") / "stream_docs")
    spark.createDataFrame(
        STREAM_DOCS, "doc_id long, text string"
    ).write.parquet(src)
    return src


def _batch_reference(spark, hist, min_chars=1):
    """Batch keep-first over history-then-stream ordering, restricted
    to the stream ids."""
    corpus = hist.df.unionByName(
        spark.createDataFrame(STREAM_DOCS, "doc_id long, text string")
    )
    out = dedup_paragraphs(ensure_tibble(corpus), min_chars=min_chars)
    return {
        r["doc_id"]: (r["text"], r["paras_removed"])
        for r in out.df.where("doc_id >= 100").collect()
    }


def _stream_result(spark, hist, stream_src, **kw):
    sdf = stream_read_parquet(spark, stream_src)
    out = stream_dedup_paragraphs(sdf, hist, **kw)
    got = run_to_memory(out, mode="append")
    return {
        r.doc_id: (r.text, r.paras_removed)
        for r in got.itertuples(index=False)
    }


def test_stream_equals_batch_keep_first(spark, hist, stream_src):
    got = _stream_result(spark, hist, stream_src)
    want = _batch_reference(spark, hist)
    assert got == want
    # spot-check the semantics the equality proves
    assert got[100][0] == "Fresh alpha.\n\nFresh beta."  # history boiler gone
    assert got[101] == ("Fresh gamma.", 1)  # case-variant of history para
    assert got[102] == ("Repeat me.\n\nFresh delta.", 1)  # within-doc dup
    assert got[104] == (None, 0) and got[105] == ("", 0)
    assert got[106] == ("", 1)  # doc that IS a history paragraph empties


def test_arrow_history_path_agrees(spark, hist, stream_src):
    """jvm_literal_max=0 forces the broadcast-set + pandas-UDF probe;
    outputs must be identical to the codegen literal path."""
    got = _stream_result(spark, hist, stream_src, jvm_literal_max=0)
    assert got == _batch_reference(spark, hist)


def test_min_chars_exemption(spark, hist, stream_src):
    """'hi' is under min_chars=5 in doc 103: exempt on BOTH ends of the
    doc (never deduped, not even within-doc)."""
    got = _stream_result(spark, hist, stream_src, min_chars=5)
    assert got[103] == ("hi\n\nFresh epsilon.\n\nhi", 0)
    assert got == _batch_reference(spark, hist, min_chars=5)


def test_cross_stream_duplicates_are_not_collapsed(spark, hist, tmp_path):
    """The documented stateless contract: a NEW paragraph shared by two
    in-flight stream docs survives in both (same stream-vs-stream
    stance as stream_near_dedup); the batch op collapses it on re-run."""
    src = str(tmp_path / "cross_stream")
    rows = [(200, "Shared new para.\n\nA."), (201, "Shared new para.\n\nB.")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    sdf = stream_read_parquet(spark, src)
    got = run_to_memory(
        stream_dedup_paragraphs(sdf, hist), mode="append"
    )
    texts = dict(zip(got["doc_id"], got["text"]))
    assert texts[200].startswith("Shared new para.")
    assert texts[201].startswith("Shared new para.")
    batch = dedup_paragraphs(
        ensure_tibble(spark.createDataFrame(rows, "doc_id long, text string"))
    )
    kept = {r["doc_id"]: r["text"] for r in batch.df.collect()}
    assert kept[201] == "B."  # batch does collapse it


def test_stateless_plan_no_python_on_literal_path(spark, hist, stream_src):
    """The op is the same narrow projection on a stream or a batch
    frame (a streaming plan can't be inspected before start(), so the
    assertions run on the identical batch plan): no state store, no
    Python, no shuffle on the small-history codegen path."""
    sdf = stream_read_parquet(spark, stream_src)
    assert stream_dedup_paragraphs(sdf, hist).isStreaming
    out = stream_dedup_paragraphs(spark.read.parquet(stream_src), hist)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "StateStore" not in plan  # stateless: no watermark, no state
    assert "Python" not in plan  # small history: pure codegen
    assert "Exchange" not in plan  # narrow map over the micro-batch


def test_validation(spark, hist, stream_src):
    sdf = stream_read_parquet(spark, stream_src)
    with pytest.raises(ValueError, match="min_chars"):
        stream_dedup_paragraphs(sdf, hist, min_chars=-1)
    with pytest.raises(ValueError, match="reserved|already exist"):
        stream_dedup_paragraphs(
            sdf.withColumn("paras_removed", F.lit(1)), hist
        )
    with pytest.raises(ValueError, match="max_history_paras"):
        stream_dedup_paragraphs(sdf, hist, max_history_paras=2)
