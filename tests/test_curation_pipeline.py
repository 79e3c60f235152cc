"""End-to-end curation pipeline composition on real testdata: the ops
are designed to chain (normalize -> paragraph dedup -> quality filter
-> exact-token chunking -> split), and this locks that the composition
actually runs as ONE lazy plan with sane row accounting — regressions
in any op's column contract surface here first."""

from datar_polars_spark import f, read_parquet
from datar_polars_spark.scale import (
    bpe_token_counts,
    bpe_train,
    chunk_documents,
    dedup_paragraphs,
    gopher_quality_filter,
    hash_split,
    normalize_text,
)

SF = "/root/testdata/sf0.001"


def test_full_curation_chain(spark):
    docs = read_parquet(spark, f"{SF}/documents.parquet")
    n_docs = docs.df.count()

    model = bpe_train(docs, n_merges=80)

    cleaned = normalize_text(docs)
    deduped = dedup_paragraphs(cleaned)
    quality = gopher_quality_filter(deduped)
    counted = bpe_token_counts(quality, model, counts_col="tc")
    chunked = chunk_documents(
        counted, max_tokens=128, overlap=8, token_counts="tc"
    )
    split = hash_split(chunked, weights={"train": 0.9, "val": 0.1})

    rows = split.df.collect()
    assert rows, "pipeline produced output"
    # row accounting: quality filtering is monotone, chunking >= docs
    n_quality = quality.df.count()
    assert 0 < n_quality <= n_docs
    doc_ids = {r["doc_id"] for r in rows}
    assert len(doc_ids) == n_quality  # every surviving doc chunked
    # budgets respected (single-word overflow is the documented escape)
    assert all(
        r["chunk_tokens"] <= 128 or len(r["text"].split()) == 1
        for r in rows
    )
    # split is a partition of the chunks
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "val"} and "train" in splits

    # deterministic end to end (seeded hash split, deterministic BPE)
    again = hash_split(
        chunk_documents(
            bpe_token_counts(
                gopher_quality_filter(
                    dedup_paragraphs(normalize_text(docs))
                ),
                model,
                counts_col="tc",
            ),
            max_tokens=128,
            overlap=8,
            token_counts="tc",
        ),
        weights={"train": 0.9, "val": 0.1},
    ).df.collect()
    key = lambda r: (r["doc_id"], r["chunk_id"])
    assert sorted(
        (key(r), r["split"], r["chunk_tokens"]) for r in rows
    ) == sorted((key(r), r["split"], r["chunk_tokens"]) for r in again)

    # the whole chain is lazy Spark: no row-at-a-time Python anywhere
    plan = split.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
