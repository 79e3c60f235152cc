"""Corpus n-gram language-model scoring — the perplexity-style quality
filter (CCNet / KenLM filtering pattern: score candidate text against a
reference-corpus LM and keep the fluent tail).

Smoothing is Stupid Backoff (Brants et al. 2007, "Large Language
Models in Machine Translation"), chosen deliberately: it was designed
FOR distributed back-ends — scores need no normalization, so the model
is just count tables and the scorer is joins + arithmetic, with no
per-context normalization pass:

    S(w | prev) = c(prev w) / c(prev)        if c(prev w) > 0
                = alpha * c(w) / N           otherwise (backoff)
    oov words   = alpha * 1 / N              (unseen unigram floor)

Model "training" is two exploded groupBy counts (unigrams + bigrams) —
one model frame ``(context, word, c)`` with context NULL for unigrams.
Scoring left-joins each document bigram against the model (hash joins
on uniformly-distributed term keys; Spark broadcasts the model side
automatically when it is small) and averages log10 scores per
document. Per-token work is constant; everything shuffles on term or
id keys only.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from ..plans.expr import Ref
from ..plans.verb import verb, verb2
from ..tibble import Tibble, ensure_tibble

__all__ = ["ngram_lm_train", "ngram_lm_score"]

BOS = "<s>"


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


def _doc_bigrams(df: DataFrame, tname: str, idn: str) -> DataFrame:
    """(id, prev, w) for every token with its predecessor (BOS-padded),
    built from one narrow zip_with over the token array."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(tname))), r"\s+"),
        lambda t: t != "",
    )
    padded = F.concat(F.array(F.lit(BOS)), toks)
    pairs = F.zip_with(
        F.slice(padded, 1, F.greatest(F.size(toks), F.lit(0))),
        toks,
        lambda a, b: F.struct(a.alias("prev"), b.alias("w")),
    )
    return df.select(
        F.col(idn).alias("id"), F.explode(pairs).alias("p")
    ).select("id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))


@verb
def ngram_lm_train(
    td: Tibble,
    text: Any = "text",
    min_count: int = 1,
) -> Tibble:
    """Count model from a reference corpus: one frame
    ``(context, word, c)`` — bigram rows carry their context, unigram
    rows have context NULL. ``min_count`` prunes rare bigrams (count
    pruning, the standard web-scale LM memory lever; unigrams are never
    pruned so backoff stays total)."""
    tname = _name_of(text)
    df = td.df.select(F.col(tname)).where(F.col(tname).isNotNull())
    # counts are corpus-global: the per-row id is irrelevant here
    big = _doc_bigrams(df.withColumn("__rid", F.lit(0)), tname, "__rid")
    bigrams = (
        big.groupBy("prev", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("prev").alias("context"), F.col("w").alias("word"), "c")
    )
    if min_count > 1:
        bigrams = bigrams.where(F.col("c") >= min_count)
    unigrams = (
        big.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.lit(None).cast("string").alias("context"),
            F.col("w").alias("word"),
            "c",
        )
    )
    return Tibble(bigrams.unionByName(unigrams))


@verb2
def ngram_lm_score(
    td: Tibble,
    model: Any,
    text: Any = "text",
    id: Any = "doc_id",
    alpha: float = 0.4,
) -> Tibble:
    """Score each document against a trained model: adds
    ``lm_logprob`` (mean log10 Stupid Backoff score per token — higher
    is more reference-like), ``lm_oov_rate`` (fraction of tokens unseen
    as unigrams), and ``lm_tokens``. Empty documents get NULL scores.

    Shape: two hash joins of the document bigrams against the model
    (bigram leg on (context, word), backoff leg on word), one groupBy
    id, one join back to the input — no UDFs, no driver data."""
    mdf = model.df if isinstance(model, Tibble) else ensure_tibble(model).df
    tname, idn = _name_of(text), _name_of(id)

    uni = mdf.where(F.col("context").isNull()).select(
        F.col("word").alias("w"), F.col("c").alias("c_uni")
    )
    bi = mdf.where(F.col("context").isNotNull()).select(
        F.col("context").alias("prev"),
        F.col("word").alias("w"),
        F.col("c").alias("c_bi"),
    )
    # context totals from the bigram table itself (c(prev ·)): exact
    # denominator even under min_count pruning of the stored rows
    ctx = bi.groupBy("prev").agg(F.sum("c_bi").alias("c_ctx"))
    n_total = uni.agg(F.sum("c_uni").alias("n_total"))

    toks = _doc_bigrams(td.df, tname, idn)
    scored = (
        toks.join(bi, ["prev", "w"], "left")
        .join(ctx, "prev", "left")
        .join(uni, "w", "left")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "__s",
            F.when(
                F.col("c_bi").isNotNull() & (F.col("c_ctx") > 0),
                F.col("c_bi") / F.col("c_ctx"),
            )
            .when(
                F.col("c_uni").isNotNull(),
                F.lit(alpha) * F.col("c_uni") / F.col("n_total"),
            )
            .otherwise(F.lit(alpha) / F.col("n_total")),
        )
    )
    # raw doubles, deliberately un-rounded: rounding is presentation,
    # and pre-rounding here creates exact half-boundary values that
    # later ROUND calls resolve differently across engines
    per_doc = scored.groupBy("id").agg(
        F.avg(F.log10("__s")).alias("lm_logprob"),
        F.avg(
            F.when(F.col("c_uni").isNull(), 1.0).otherwise(0.0)
        ).alias("lm_oov_rate"),
        F.count(F.lit(1)).alias("lm_tokens"),
    )
    out = td.df.join(
        per_doc.withColumnRenamed("id", idn), idn, "left"
    )
    return td.with_df(out)
