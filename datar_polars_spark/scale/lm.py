"""Corpus n-gram language-model scoring — the perplexity-style quality
filter (CCNet / KenLM filtering pattern: score candidate text against a
reference-corpus LM and keep the fluent tail).

Smoothing is Stupid Backoff (Brants et al. 2007, "Large Language
Models in Machine Translation"), chosen deliberately: it was designed
FOR distributed back-ends — scores need no normalization, so the model
is just count tables and the scorer is joins + arithmetic, with no
per-context normalization pass. For order n (default 2, CCNet-style
filtering conventionally 5):

    S(w | ctx_{n-1}) = c(ctx_{n-1} w) / c(ctx_{n-1})   if seen
                     = alpha * S(w | ctx_{n-2})         else (recurse)
    S(w)             = c(w) / N                         unigram base
    oov words        = alpha^{n-1} * 1 / N              (unseen floor)

Model "training" is one token explode + per-order keyed groupBys. Each
stored k-gram row carries BOTH its count and the EXACT pre-pruning
total of its context (``c_ctx``) — so ``min_count`` pruning (the
standard web-scale LM memory lever) never corrupts the denominator
(summing surviving rows would undercount), and scoring needs only ONE
hash join per order instead of a gram join plus a context-total join.
Scoring left-joins each document's per-order context keys against the
model slices (hash joins on uniformly-distributed term keys; Spark
broadcasts the model side automatically when it is small) and averages
log10 scores per document. Per-token work is constant; everything
shuffles on term or id keys only.
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


def _doc_grams(
    df: DataFrame, tname: str, idn: str, order: int,
    extra: list[str] | None = None,
) -> DataFrame:
    """(id, [extra...], w, ctx1..ctx{order-1}) for every token: the
    word plus its preceding context of each length 1..order-1
    (BOS-padded, contexts space-joined), built from one narrow
    transform+explode over the token array — no shuffle. ``extra``
    columns (e.g. a language key for per-group models) pass through
    unchanged. Empty/NULL docs yield no rows.

    The padded token array is BOUND ONCE per row via a 1-element
    transform (the same trick as the simhash fold): referencing the
    ``padded`` expression directly inside the per-token lambda would
    re-inline — and re-evaluate — the whole split/filter/concat per
    token, turning the map O(n^2) per document (measured 190 us/token
    before the fix; the lambda-variable binding evaluates it once)."""
    from .dedup import _ensure_parallelism

    df = _ensure_parallelism(df)
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(tname))), r"\s+"),
        lambda t: t != "",
    )
    pad = order - 1
    padded = F.concat(F.array_repeat(F.lit(BOS), pad), toks)

    def per_padded(pd):
        def gram_struct(i):
            fields = [F.element_at(pd, i + pad).alias("w")]
            for length in range(1, order):
                fields.append(
                    F.array_join(
                        F.slice(pd, i + pad - length, length), " "
                    ).alias(f"ctx{length}")
                )
            return F.struct(*fields)

        return F.transform(
            F.sequence(F.lit(1), F.size(pd) - pad), gram_struct
        )

    # sequence(1, 0) would DESCEND ([1, 0]) — guard empty token arrays
    # (the when() guard keeps the branch unevaluated for empty docs)
    grams = F.when(
        F.size(toks) > 0,
        F.element_at(F.transform(F.array(padded), per_padded), 1),
    )
    passthru = list(extra or [])
    out = df.select(
        F.col(idn).alias("id"), *passthru, F.explode(grams).alias("g")
    )
    cols = ["id", *passthru, F.col("g.w").alias("w")] + [
        F.col(f"g.ctx{length}").alias(f"ctx{length}")
        for length in range(1, order)
    ]
    return out.select(*cols)


@verb
def ngram_lm_train(
    td: Tibble,
    text: Any = "text",
    order: int = 2,
    min_count: int = 1,
    by: Any = None,
) -> Tibble:
    """Count model from a reference corpus: one frame
    ``(n, context, word, c, c_ctx)`` with a row per surviving k-gram
    for k = 1..order — unigram rows (n=1) have context NULL and
    ``c_ctx`` = the corpus token total N; k-gram rows (n>=2) carry the
    (k-1)-token context string and ``c_ctx`` = the EXACT pre-pruning
    occurrence total of that context, so backoff denominators stay
    correct under ``min_count`` pruning (unigrams are never pruned so
    backoff stays total).

    ``by`` trains one independent model PER GROUP (the CCNet pattern:
    one LM per language): the output gains the group column, every
    count table keys on (group, ...), and N is per group. The plan
    shape is unchanged — the group key simply widens each groupBy/join
    key, so partial aggregation and hash-join distribution carry over
    verbatim."""
    if order < 2:
        raise ValueError(f"ngram_lm_train: order must be >= 2, got {order}")
    tname = _name_of(text)
    grp = _name_of(by) if by is not None else None
    gcols = [grp] if grp else []
    keep = [F.col(tname)] + ([F.col(grp)] if grp else [])
    df = td.df.select(*keep).where(F.col(tname).isNotNull())
    if grp:
        df = df.where(F.col(grp).isNotNull())
    # counts are corpus-global (per group): the per-row id is irrelevant
    grams = _doc_grams(
        df.withColumn("__rid", F.lit(0)), tname, "__rid", order, extra=gcols
    )

    uni = grams.groupBy(*gcols, "w").agg(F.count(F.lit(1)).alias("c"))
    if grp:
        n_total = uni.groupBy(grp).agg(F.sum("c").alias("__N"))
        uni_n = uni.join(n_total, grp)
    else:
        n_total = uni.agg(F.sum("c").alias("__N"))
        uni_n = uni.crossJoin(F.broadcast(n_total))
    unigrams = uni_n.select(
        *gcols,
        F.lit(1).alias("n"),
        F.lit(None).cast("string").alias("context"),
        F.col("w").alias("word"),
        "c",
        F.col("__N").alias("c_ctx"),
    )
    parts = [unigrams]
    for k in range(2, order + 1):
        ctx = f"ctx{k - 1}"
        counts = grams.groupBy(*gcols, ctx, "w").agg(
            F.count(F.lit(1)).alias("c")
        )
        # exact context totals BEFORE pruning — aggregated from the
        # already-reduced (context, word) counts, then hash-joined back
        totals = counts.groupBy(*gcols, ctx).agg(F.sum("c").alias("c_ctx"))
        if min_count > 1:
            counts = counts.where(F.col("c") >= min_count)
        parts.append(
            counts.join(totals, [*gcols, ctx]).select(
                *gcols,
                F.lit(k).alias("n"),
                F.col(ctx).alias("context"),
                F.col("w").alias("word"),
                "c",
                "c_ctx",
            )
        )
    model = parts[0]
    for p in parts[1:]:
        model = model.unionByName(p)
    return Tibble(model)


@verb2
def ngram_lm_score(
    td: Tibble,
    model: Any,
    text: Any = "text",
    id: Any = "doc_id",
    alpha: float = 0.4,
    order: int | None = None,
    by: Any = None,
) -> Tibble:
    """Score each document against a trained model: adds
    ``lm_logprob`` (mean log10 Stupid Backoff score per token — higher
    is more reference-like), ``lm_oov_rate`` (fraction of tokens unseen
    as unigrams), and ``lm_tokens``. Empty documents get NULL scores.

    ``order`` defaults to the model's own order (derived by one tiny
    aggregate job over the model frame; pass it explicitly to keep plan
    build job-free). Shape: one hash join per order of the document
    context keys against that order's model slice (each gram row
    already carries its exact context total), one unigram join, one
    broadcast of N, one groupBy id, one join back — no UDFs, no driver
    data.

    ``by`` scores against a PER-GROUP model (the ``ngram_lm_train(by=)``
    output): every join gains the group key and N resolves per group.
    Documents whose group has no model rows (a language the reference
    corpus never saw) get NULL scores rather than a misleading floor."""
    mdf = model.df if isinstance(model, Tibble) else ensure_tibble(model).df
    tname, idn = _name_of(text), _name_of(id)
    # the model frame feeds one join leg per order plus the unigram leg
    # and the N broadcast — persist it so a LAZY model (train output
    # piped straight in) materializes its count tables ONCE instead of
    # re-running training per consumer; bounded by the internal-cache
    # registry. Spark's CacheManager dedupes by canonicalized plan, so
    # re-scoring with a re-built identical model reuses the cache.
    from pyspark import StorageLevel

    from ..plans.cache import register_internal_cache

    mdf = register_internal_cache(mdf.persist(StorageLevel.MEMORY_AND_DISK))
    if order is None:
        order = int(mdf.agg(F.max("n")).first()[0] or 2)
    grp = _name_of(by) if by is not None else None
    gcols = [grp] if grp else []

    uni = mdf.where(F.col("n") == 1).select(
        *gcols,
        F.col("word").alias("w"),
        F.col("c").alias("c_uni"),
        F.col("c_ctx").alias("__N"),
    )
    if grp:
        n_total = uni.groupBy(grp).agg(F.max("__N").alias("n_total"))
    else:
        n_total = uni.agg(F.max("__N").alias("n_total"))

    scored = _doc_grams(td.df, tname, idn, order, extra=gcols)
    for k in range(2, order + 1):
        ctx = f"ctx{k - 1}"
        leg = mdf.where((F.col("n") == k) & F.col("word").isNotNull()).select(
            *gcols,
            F.col("context").alias(ctx),
            F.col("word").alias("w"),
            F.col("c").alias(f"c_{k}"),
            F.col("c_ctx").alias(f"t_{k}"),
        )
        scored = scored.join(leg, [*gcols, ctx, "w"], "left")
    scored = scored.join(uni.drop("__N"), [*gcols, "w"], "left")
    if grp:
        scored = scored.join(n_total, grp, "left")
    else:
        scored = scored.crossJoin(F.broadcast(n_total))

    # Stupid Backoff CASE, highest order first; each backoff step
    # multiplies by alpha. c_ctx is the exact pre-pruning total, so a
    # present gram row always has t_k >= c_k >= 1 — no zero guard.
    expr = None
    for k in range(order, 1, -1):
        penalty = alpha ** (order - k)
        leg_s = F.lit(penalty) * F.col(f"c_{k}") / F.col(f"t_{k}")
        cond = F.col(f"c_{k}").isNotNull()
        expr = F.when(cond, leg_s) if expr is None else expr.when(cond, leg_s)
    base_penalty = alpha ** (order - 1)
    expr = expr.when(
        F.col("c_uni").isNotNull(),
        F.lit(base_penalty) * F.col("c_uni") / F.col("n_total"),
    ).otherwise(F.lit(base_penalty) / F.col("n_total"))
    scored = scored.withColumn("__s", expr)

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
