"""Every verb family must survive a 0-row input without raising —
crashes on empty partitions are a classic distributed-engine failure."""

import pytest

from datar_polars_spark import (
    f,
    tibble,
    filter_,
    select,
    mutate,
    transmute,
    group_by,
    summarise,
    arrange,
    distinct,
    count,
    add_count,
    slice_head,
    slice_max,
    rename,
    relocate,
    pivot_longer,
    pivot_wider,
    separate,
    unite,
    drop_na,
    replace_na,
    fill,
    nest,
    uncount,
    left_join,
    bind_rows,
    rows_upsert,
    factor_,
    fct_infreq,
    rowid_to_column,
    complete_cases,
)
from datar_polars_spark.functions import (
    sum_,
    mean,
    n,
    lag,
    cumsum,
    row_number,
    if_else,
    paste0,
)


@pytest.fixture
def empty(spark):
    return tibble(spark, g=["a"], x=[1.0], s=["p-q"]) >> filter_(f.x > 99)


PIPELINES = [
    lambda e: e >> select(f.g, f.x),
    lambda e: e >> mutate(y=f.x * 2, z=if_else(f.x > 0, "p", "n")),
    lambda e: e >> transmute(y=f.x + 1),
    lambda e: e >> group_by(f.g) >> summarise(s=sum_(f.x, na_rm=True), c=n()),
    lambda e: e >> group_by(f.g) >> mutate(l=lag(f.x), cs=cumsum(f.x)),
    lambda e: e >> arrange(f.x),
    lambda e: e >> distinct(),
    lambda e: e >> count(f.g),
    lambda e: e >> add_count(f.g),
    lambda e: e >> slice_head(n=5),
    lambda e: e >> group_by(f.g) >> slice_max(f.x, n=2),
    lambda e: e >> rename(gg=f.g),
    lambda e: e >> relocate(f.x),
    lambda e: e >> mutate(rn=row_number()),
    lambda e: e >> pivot_longer([f.x], names_to="k", values_to="v"),
    lambda e: e >> separate(f.s, ["a", "b"], sep="-"),
    lambda e: e >> unite("gx", f.g, f.s),
    lambda e: e >> drop_na(),
    lambda e: e >> replace_na(x=0.0),
    lambda e: e >> group_by(f.g) >> fill(f.x, _direction="down"),
    lambda e: e >> nest(data=f.x),
    lambda e: e >> uncount(2),
    lambda e: e >> rowid_to_column(),
    lambda e: e >> complete_cases(),
    lambda e: e >> factor_(f.g) >> fct_infreq(f.g),
]


@pytest.mark.parametrize("i", range(len(PIPELINES)))
def test_verb_on_empty_frame(empty, i):
    out = PIPELINES[i](empty)
    # collecting must also work, and yield zero rows
    assert len(out.collect()) == 0


def test_two_table_verbs_on_empty(spark, empty):
    other = tibble(spark, g=["a"], y=[9])
    assert (empty >> left_join(other, by="g")).nrow() == 0
    assert bind_rows(empty, empty).nrow() == 0
    # upsert of empty into empty
    assert rows_upsert(empty >> select(f.g, f.x), empty >> select(f.g, f.x), by="g").nrow() == 0


def test_pivot_wider_on_empty(spark, empty):
    out = empty >> pivot_wider(names_from=f.g, values_from=f.x)
    assert out.nrow() == 0


def test_scale_ops_on_empty(spark):
    """r5: the scale extensions must tolerate empty inputs too (empty
    micro-batches / filtered-out corpora are routine at scale)."""
    e = tibble(spark, doc_id=[1], text=["some words here"]) >> filter_(f.doc_id > 9)
    full = tibble(spark, doc_id=[1, 2], text=["alpha beta gamma", "delta words"])
    from datar_polars_spark.scale import (
        bm25_score,
        decontaminate_fuzzy,
        dedup_exact,
        minhash_join,
        minhash_pairs,
        tfidf_top_terms,
    )

    assert dedup_exact(e, f.text, id_col=f.doc_id).df.count() == 0
    assert minhash_pairs(e, f.text, f.doc_id).df.count() == 0
    assert minhash_join(e, full, f.text, f.doc_id).df.count() == 0
    assert minhash_join(full, e, f.text, f.doc_id).df.count() == 0
    assert decontaminate_fuzzy(full, e, f.text, f.doc_id).df.count() == 2
    assert tfidf_top_terms(e, f.text, f.doc_id).df.count() == 0
    assert bm25_score(e, f.text, f.doc_id, ["alpha"]).df.count() == 0


def test_empty_embeddings_scale_ops(spark):
    from datar_polars_spark.scale import cosine_topk, knn_join
    from datar_polars_spark.scale.dedup import semantic_pairs

    e = tibble(spark, vec_id=[1], embedding=[[1.0, 0.0]]) >> filter_(f.vec_id > 9)
    full = tibble(spark, vec_id=[1, 2], embedding=[[1.0, 0.0], [0.0, 1.0]])
    assert cosine_topk(e, [1.0, 0.0], f.embedding, f.vec_id, k=3).df.count() == 0
    assert semantic_pairs(e, f.embedding, f.vec_id).df.count() == 0
    assert knn_join(e.df, full, k=2).df.count() == 0


def test_r11_curation_ops_on_empty(spark):
    """r11 additions tolerate empty inputs (filtered-out corpora and
    empty micro-batches are routine)."""
    from datar_polars_spark.scale import (
        dedup_paragraphs,
        domain_report,
        html_to_text,
        normalize_text,
        url_normalize,
    )

    e = tibble(
        spark, doc_id=[1], text=["a\n\nb"], url=["https://a.com/x"]
    ) >> filter_(f.doc_id > 9)
    assert normalize_text(e).df.count() == 0
    assert html_to_text(e, html="text", out_col="extracted").df.count() == 0
    out = dedup_paragraphs(e)
    assert out.df.count() == 0
    assert "paras_removed" in out.columns  # schema intact on empty
    rep = domain_report(e, url="url", text="text")
    assert rep.df.count() == 0
    from pyspark.sql import functions as F

    assert e.df.select(url_normalize(F.col("url"))).count() == 0


def test_r11_pca_and_ids_on_tiny(spark):
    """pca_train needs >= 2 vectors (fail-fast on empty is covered in
    test_pca); bpe ids on an empty frame yield empty arrays."""
    from datar_polars_spark.scale import bpe_encode_ids, bpe_train

    full = tibble(spark, doc_id=[1, 2], text=["alpha beta", "beta gamma"])
    model = bpe_train(full, n_merges=5)
    e = full >> filter_(f.doc_id > 9)
    assert bpe_encode_ids(e, model).df.count() == 0
