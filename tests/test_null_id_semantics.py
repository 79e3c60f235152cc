"""NULL-id semantics across the dedup family (r12 ADVICE fixes):
dedup_exact keeps a REAL row (NULLS FIRST) instead of fabricating an
all-NULL one; the minhash fingerprint pre-pass exempts NULL-id rows
instead of deleting them; dedup_paragraphs fails loudly on NULL ids
instead of silently blanking the document's text."""

import pytest
from pyspark.sql import functions as F

from datar_polars_spark.scale.dedup import (
    _fingerprint_survivors,
    dedup_exact,
    dedup_paragraphs,
    minhash_dedup,
)
from datar_polars_spark.tibble import Tibble


def _tb(spark, rows, schema):
    return Tibble(spark.createDataFrame(rows, schema))


# --------------------------------------------------------------- dedup_exact

def test_dedup_exact_all_null_id_group_keeps_real_row(spark):
    """A group whose ids are ALL NULL must emit one of its real rows,
    not a fabricated row with every non-key column NULLed out."""
    td = _tb(
        spark,
        [(None, "k", "payload-a"), (None, "k", "payload-a")],
        "doc_id long, key string, payload string",
    )
    out = dedup_exact(td, "key", id_col="doc_id").df.collect()
    assert len(out) == 1
    assert out[0]["payload"] == "payload-a"  # real row, not NULL


def test_dedup_exact_mixed_null_group_nulls_first(spark):
    """NULL ids order FIRST (Spark default ascending / the pre-r11
    row_number semantics): a mixed group keeps the NULL-id row."""
    td = _tb(
        spark,
        [(7, "k", "with-id"), (None, "k", "null-id"), (9, "z", "only")],
        "doc_id long, key string, payload string",
    )
    got = {
        r["key"]: (r["doc_id"], r["payload"])
        for r in dedup_exact(td, "key", id_col="doc_id").df.collect()
    }
    assert got["k"] == (None, "null-id")
    assert got["z"] == (9, "only")


def test_dedup_exact_non_null_path_unchanged(spark):
    td = _tb(
        spark,
        [(3, "k", "c"), (1, "k", "a"), (2, "k", "b"), (5, "m", "e")],
        "doc_id long, key string, payload string",
    )
    got = {
        r["key"]: (r["doc_id"], r["payload"])
        for r in dedup_exact(td, "key", id_col="doc_id").df.collect()
    }
    assert got == {"k": (1, "a"), "m": (5, "e")}


# ------------------------------------------------- _fingerprint_survivors

def test_fingerprint_prepass_keeps_unique_null_id_doc(spark):
    """The live-verified ADVICE bug: a unique document with NULL id
    must survive the exact pre-pass."""
    df = spark.createDataFrame(
        [(None, "one of a kind text"), (1, "common text"), (2, "common text")],
        "doc_id long, text string",
    )
    out = _fingerprint_survivors(df, "text", "doc_id").collect()
    pairs = [(r["doc_id"], r["text"]) for r in out]
    assert (1, "common text") in pairs
    assert (None, "one of a kind text") in pairs
    assert len(out) == 2  # common-text cluster collapsed to min id


def test_fingerprint_prepass_null_ids_exempt_in_cluster(spark):
    """NULL-id copies of a duplicated text are kept (no identity to
    dedup on); the non-NULL side still collapses to its min id."""
    df = spark.createDataFrame(
        [(None, "dup"), (None, "dup"), (4, "dup"), (9, "dup")],
        "doc_id long, text string",
    )
    out = _fingerprint_survivors(df, "text", "doc_id").collect()
    ids = sorted((r["doc_id"] for r in out), key=lambda x: (x is None, x))
    assert ids == [4, None, None]


def test_minhash_dedup_never_drops_null_id_rows(spark):
    """End-to-end: the whole near-dup family treats NULL id as
    identity-less — NULL-id documents are never deleted."""
    rows = [
        (None, "the quick brown fox jumps over the lazy dog again today"),
        (1, "completely different text about distributed query engines"),
        (2, "completely different text about distributed query engines"),
    ]
    td = _tb(spark, rows, "doc_id long, text string")
    out = minhash_dedup(td, "text", "doc_id").df.collect()
    ids = sorted((r["doc_id"] for r in out), key=lambda x: (x is None, x))
    assert ids == [1, None]


# ---------------------------------------------------------- dedup_paragraphs

def test_dedup_paragraphs_null_id_raises(spark):
    """NULL ids can neither order nor join — corpus scope must fail
    loudly, not silently blank the document's text."""
    td = _tb(
        spark,
        [(None, "para one\n\npara two"), (1, "para one\n\npara three")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="non-null|NULL|assert"):
        dedup_paragraphs(td, "text", "doc_id").df.collect()


def test_dedup_paragraphs_non_null_ok_after_check(spark):
    """The assert is the identity on valid rows — behavior unchanged."""
    td = _tb(
        spark,
        [(1, "a\n\nb"), (2, "a\n\nc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(td, "text", "doc_id").df.collect()
    }
    assert got == {1: "a\n\nb", 2: "c"}
