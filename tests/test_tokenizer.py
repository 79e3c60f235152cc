"""Trainable BPE (scale/tokenizer.py): deterministic distributed
training, surface-form round-trip, compression ordering, and the
integration with exact token-budget chunking."""

import json

import pytest

from datar_polars_spark import read_parquet
from datar_polars_spark.scale import bpe_encode, bpe_token_counts, bpe_train
from datar_polars_spark.scale.tokenizer import _ranks, bpe_apply_word
from datar_polars_spark.tibble import ensure_tibble

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet(spark, f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return bpe_train(docs, n_merges=200)


def test_training_is_deterministic_and_jsonable(docs, model):
    again = bpe_train(docs, n_merges=200)
    assert again == model
    assert json.loads(json.dumps(model)) == model
    assert model["version"] == 1 and len(model["merges"]) > 10


def test_known_tiny_corpus_merges(spark):
    """Hand-checkable corpus: words aa x6, ab x1, b x1. Pair counts
    tie at 6 between ('a','a') and ('a', EOW); the lexicographic
    tie-break picks ('a', EOW) deterministically (EOW = \\x01 < 'a'),
    and the dominant word 'aa' still compresses to a single token."""
    td = ensure_tibble(
        spark.createDataFrame(
            [("aa aa aa aa ab",), ("aa aa b",)], "text string"
        )
    )
    m = bpe_train(td, n_merges=10)
    assert m["merges"][0] == ["a", "\x01"]
    ranks = _ranks(m)
    assert bpe_apply_word("aa", ranks, {}) == ["aa"]
    # rare words keep more pieces than the dominant one
    assert len(bpe_apply_word("ab", ranks, {})) >= 1
    assert "".join(bpe_apply_word("ab", ranks, {})) == "ab"


def test_surface_form_roundtrip_and_compression(model):
    ranks = _ranks(model)
    for w in ["the", "analysis", "spark", "zzzzunseen", "a", "x"]:
        toks = bpe_apply_word(w, ranks, {})
        assert "".join(toks) == w
        assert all(toks)
    # a stopword compresses at least as well as random char soup
    assert len(bpe_apply_word("the", ranks, {})) <= len(
        bpe_apply_word("xqzv", ranks, {})
    )


def test_counts_feed_exact_chunking(docs, model):
    from datar_polars_spark.scale import chunk_documents

    wc = bpe_token_counts(docs, model, counts_col="tc")
    rows = wc.df.select("doc_id", "text", "tc").limit(50).collect()
    ranks = _ranks(model)
    for r in rows:
        words = (r["text"] or "").lower().split()
        assert list(r["tc"]) == [
            len(bpe_apply_word(w, ranks, {})) for w in words
        ]
    chunked = chunk_documents(
        wc, max_tokens=96, overlap=8, token_counts="tc"
    )
    out = chunked.df.limit(400).collect()
    for r in out:
        assert r["chunk_tokens"] <= 96 or len(r["text"].split()) == 1


def test_encode_agrees_with_counts(docs, model):
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, model).df.select(
            "doc_id", "bpe_tokens"
        ).limit(25).collect()
    }
    cnt = {
        r["doc_id"]: r["tc"]
        for r in bpe_token_counts(docs, model, counts_col="tc")
        .df.select("doc_id", "tc")
        .limit(25)
        .collect()
    }
    for did, toks in enc.items():
        assert len(toks) == sum(cnt[did])


def test_ids_roundtrip_and_counts(spark, docs, model):
    """r11 vocab/ids: ids -> tokens -> text round-trips (under the
    model's lowercase + whitespace normalization), id counts equal
    bpe_token_counts exactly, and the vocab is stable/deterministic."""
    from datar_polars_spark.scale import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_token_counts,
    )

    vocab = model["vocab"]
    assert vocab[0] == "<unk>" and vocab[1] == "<unk></w>"
    assert len(vocab) == len(set(vocab))  # ids are injective
    ids_rows = {
        r["doc_id"]: (r["text"], r["bpe_ids"])
        for r in bpe_encode_ids(docs, model)
        .df.select("doc_id", "text", "bpe_ids")
        .limit(25)
        .collect()
    }
    cnt = {
        r["doc_id"]: sum(r["tc"])
        for r in bpe_token_counts(docs, model, counts_col="tc")
        .df.select("doc_id", "tc")
        .limit(25)
        .collect()
    }
    for did, (text, ids) in ids_rows.items():
        assert len(ids) == cnt[did]  # counts unchanged vs token_counts
        want = " ".join((text or "").lower().split())
        assert bpe_decode_ids(ids, model) == want


def test_ids_unknown_chars_hit_unk(spark, model):
    from datar_polars_spark.scale import bpe_decode_ids, bpe_encode_ids

    td = ensure_tibble(
        spark.createDataFrame([(1, "hello 世界")], "doc_id long, text string")
    )
    ids = bpe_encode_ids(td, model).df.first()["bpe_ids"]
    assert 0 in ids or 1 in ids  # CJK chars are outside the alphabet
    # decode still closes the unknown word at the boundary
    decoded = bpe_decode_ids(ids, model)
    assert decoded.startswith("hello ") and "<unk>" in decoded


def test_ids_require_vocab(spark, docs, model):
    from datar_polars_spark.scale import bpe_encode_ids

    legacy = {k: v for k, v in model.items() if k != "vocab"}
    with pytest.raises(ValueError, match="vocab"):
        bpe_encode_ids(docs, legacy)


def test_null_and_empty_text(spark, model):
    td = ensure_tibble(
        spark.createDataFrame(
            [(1, None), (2, ""), (3, "  ")], "doc_id long, text string"
        )
    )
    rows = bpe_token_counts(td, model, counts_col="tc").df.collect()
    assert all(list(r["tc"]) == [] for r in rows)
    rows2 = bpe_encode(td, model).df.collect()
    assert all(list(r["bpe_tokens"]) == [] for r in rows2)


def test_validation(spark, docs, model):
    empty = ensure_tibble(spark.createDataFrame([], "text string"))
    with pytest.raises(ValueError, match="no words"):
        bpe_train(empty)
    with pytest.raises(ValueError, match="merges"):
        bpe_token_counts(docs, {"nope": 1})
    clash = bpe_token_counts(docs, model, counts_col="tc")
    with pytest.raises(ValueError, match="already exists"):
        bpe_token_counts(clash, model, counts_col="tc")


def test_plan_is_narrow_arrow(docs, model):
    out = bpe_token_counts(docs, model, counts_col="tc")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_incremental_trainer_equals_naive_reference(spark, docs):
    """The incremental pair-count trainer must pick the exact same
    merge sequence as a from-scratch recount each round (the naive
    O(n_merges x vocab) formulation it replaced)."""
    from datar_polars_spark.scale.tokenizer import _EOW

    rows = (
        docs.df.selectExpr(
            "explode(filter(split(trim(lower(coalesce(text, ''))), "
            "'\\\\s+'), t -> length(t) > 0)) AS w"
        )
        .groupBy("w")
        .count()
        .orderBy("count", "w", ascending=[False, True])
        .limit(2000)
        .collect()
    )

    def naive(n_merges):
        vocab = {}
        for r in rows:
            syms = tuple(r["w"]) + (_EOW,)
            vocab[syms] = vocab.get(syms, 0) + int(r["count"])
        merges = []
        for _ in range(n_merges):
            pairs = {}
            for syms, cnt in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pairs[p] = pairs.get(p, 0) + cnt
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pairs[best] < 2:
                break
            a, b = best
            ab = a + b
            nv = {}
            for syms, cnt in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i < len(syms) - 1
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                t = tuple(out)
                nv[t] = nv.get(t, 0) + cnt
            vocab = nv
            merges.append([a, b])
        return merges

    got = bpe_train(docs, n_merges=120, max_words=2000)
    assert got["merges"] == naive(120)


def test_write_read_roundtrip(spark, docs, model, tmp_path):
    from datar_polars_spark.scale import bpe_read, bpe_write

    p = str(tmp_path / "bpe_model.json")
    bpe_write(spark, model, p)
    assert bpe_read(spark, p) == model
    with pytest.raises(ValueError, match="merges"):
        bpe_write(spark, {"nope": 1}, str(tmp_path / "x.json"))
    # a foreign JSON file is rejected with a clear message
    from datar_polars_spark.scale.jsonio import write_json_file

    other = str(tmp_path / "other.json")
    write_json_file(spark, other, {"hello": 1})
    with pytest.raises(ValueError, match="bpe_write artifact"):
        bpe_read(spark, other)
