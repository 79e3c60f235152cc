"""Training-data quality filters: Gopher-style repetition metrics,
C4-style line heuristics, n-gram decontamination, PII redaction, and
sequence packing.

Everything row-local compiles to JVM expressions (split / higher-order
array functions / regex) — no Python in the hot path; the only shuffles
are the n-gram join in `decontaminate` and the cumsum in
`pack_documents`. Repetition metrics follow the published Gopher
(Rae et al. 2021, §A1.1) and C4 (Raffel et al. 2020, §2.2) filter
definitions; the quadratic-in-lines HOF scans are per-document arrays
(documents are KB-sized), so the work stays embarrassingly parallel at
100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..functions.registry import register
from ..plans.verb import verb, verb2
from ..tibble import Tibble

__all__ = [
    "gopher_quality_filter",
    "c4_clean",
    "decontaminate",
    "contamination_report",
    "pack_documents",
    "hash_split",
    "stratified_sample",
    "mix_corpora",
    "temperature_mix",
    "classifier_score",
    "domain_filter",
    "cap_per_key",
    "chunk_documents",
]


# --------------------------------------------------------------------------
# row-local repetition metrics (registry functions, mutate/filter-able)
# --------------------------------------------------------------------------

def _lines(col: Column) -> Column:
    return F.filter(F.split(col, r"\n"), lambda l: F.length(F.trim(l)) > 0)


def _paragraphs(col: Column) -> Column:
    return F.filter(F.split(col, r"\n\n+"), lambda p: F.length(F.trim(p)) > 0)


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"[^a-z0-9']+"), lambda w: F.length(w) > 0)


def _dup_fraction(arr: Column) -> Column:
    """1 - distinct/total: fraction of segments that repeat an earlier one."""
    n = F.size(arr)
    return F.when(n > 0, 1.0 - F.size(F.array_distinct(arr)) / n).otherwise(0.0)


def _run_stats(arr: Column) -> Column:
    """struct(top, dup) over a string array in ONE pass: sort it, then a
    run-length F.aggregate computes `top` = max over distinct values of
    count*length (chars covered by the most frequent value) and `dup` =
    sum of count*length over values with count > 1. The naive nested
    form — F.filter(arr, g -> size(F.filter(arr, h -> h == g)) > 1) —
    re-materializes the inner array per element (no common-subexpression
    reuse across lambda scopes), turning a per-document O(n log n) into
    O(n² · build-cost); on real documents that's the difference between
    milliseconds and minutes per partition."""
    sorted_arr = F.array_sort(arr)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("top"),
        F.lit(0).alias("dup"),
    )

    def step(acc, g):
        run = F.when(acc["prev"] == g, acc["run"] + 1).otherwise(F.lit(1))
        chars = run * F.length(g)
        dup = acc["dup"] + (
            F.when(run == 2, 2 * F.length(g))
            .when(run > 2, F.length(g))
            .otherwise(0)
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc["top"], chars).alias("top"),
            dup.alias("dup"),
        )

    return F.aggregate(sorted_arr, zero, step)


def _dup_char_fraction(arr: Column) -> Column:
    """Fraction of characters inside segments occurring more than once
    (Gopher counts every occurrence of a duplicated segment)."""
    total = F.aggregate(arr, F.lit(0.0), lambda a, l: a + F.length(l))
    dup_chars = _run_stats(arr)["dup"]
    return F.when(total > 0, dup_chars / total).otherwise(0.0)


@register("dup_line_fraction")
def _dup_line_fraction(ctx, x):
    return _dup_fraction(_lines(ctx.col(x)))


@register("dup_paragraph_fraction")
def _dup_paragraph_fraction(ctx, x):
    return _dup_fraction(_paragraphs(ctx.col(x)))


@register("dup_line_char_fraction")
def _dup_line_char_fraction(ctx, x):
    return _dup_char_fraction(_lines(ctx.col(x)))


@register("dup_paragraph_char_fraction")
def _dup_paragraph_char_fraction(ctx, x):
    return _dup_char_fraction(_paragraphs(ctx.col(x)))


def _word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (empty array when the doc
    has fewer than n words). Built by zip_with over n shifted views of
    the word array — n slices total instead of one O(n) slice+join per
    gram (~5x less codegen work per row; see scale/dedup.word_shingles)."""
    m = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.slice(words, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(words, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.coalesce(grams, F.array().cast("array<string>"))


@register("top_ngram_char_fraction")
def _top_ngram_char_fraction(ctx, x, n: int = 2):
    """Characters covered by the single most frequent word n-gram /
    total characters (Gopher repetition signal, n=2..4)."""
    col = ctx.col(x)
    grams = _word_ngrams(_words(col), int(ctx.eval(n)))
    total = F.length(col).cast("double")
    top = _run_stats(grams)["top"]
    return F.when(
        (total > 0) & (F.size(grams) > 0), top / total
    ).otherwise(0.0)


@register("dup_ngram_char_fraction")
def _dup_ngram_char_fraction(ctx, x, n: int = 5):
    """Characters inside word n-grams that occur more than once / total
    characters (Gopher, n=5..10)."""
    col = ctx.col(x)
    grams = _word_ngrams(_words(col), int(ctx.eval(n)))
    total = F.length(col).cast("double")
    dup_chars = _run_stats(grams)["dup"]
    return F.when(total > 0, dup_chars / total).otherwise(0.0)


@register("symbol_word_ratio")
def _symbol_word_ratio(ctx, x, symbols: str = "#…"):
    """Symbols per word (Gopher drops docs with ratio > 0.1 for # and …)."""
    col = ctx.col(x)
    sym = str(ctx.eval(symbols))
    pattern = "[" + "".join("\\" + c for c in sym) + "]"
    n_sym = F.length(col) - F.length(F.regexp_replace(col, pattern, ""))
    # '…' is often spelled '...': count both
    if "…" in sym:
        n_sym = n_sym + F.size(F.split(col, r"\.\.\.")) - 1
    n_words = F.size(_words(col))
    return F.when(n_words > 0, n_sym / n_words).otherwise(0.0)


@register("bullet_line_fraction")
def _bullet_line_fraction(ctx, x):
    lines = _lines(ctx.col(x))
    n = F.size(lines)
    bullets = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•‣◦]|\d+[.)])"))
    )
    return F.when(n > 0, bullets / n).otherwise(0.0)


@register("ellipsis_line_fraction")
def _ellipsis_line_fraction(ctx, x):
    lines = _lines(ctx.col(x))
    n = F.size(lines)
    ell = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    return F.when(n > 0, ell / n).otherwise(0.0)


@register("alpha_word_ratio")
def _alpha_word_ratio(ctx, x):
    """Fraction of whitespace-tokens containing at least one letter
    (Gopher requires ≥ 0.8)."""
    toks = F.filter(F.split(F.trim(ctx.col(x)), r"\s+"), lambda t: F.length(t) > 0)
    n = F.size(toks)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.when(n > 0, alpha / n).otherwise(0.0)


@register("redact_pii")
def _redact_pii(ctx, x):
    """Mask emails, phone numbers, and IPv4 addresses with typed
    placeholder tokens — regexp only, fully pushed to the JVM."""
    col = ctx.col(x)
    col = F.regexp_replace(
        col, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    col = F.regexp_replace(
        col, r"(\+?\d{1,3}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"
    )
    col = F.regexp_replace(
        col, r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"
    )
    return col


# --------------------------------------------------------------------------
# composite verbs
# --------------------------------------------------------------------------

@verb
def gopher_quality_filter(
    td: Tibble,
    text: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_top_2gram_frac: float = 0.20,
    min_alpha_word_ratio: float = 0.80,
    keep_flags: bool = False,
) -> Tibble:
    """Gopher rule-set document filter (Rae et al. 2021 §A1.1): word
    count bounds, duplicate line/paragraph fractions, top-bigram
    character fraction, alphabetic-word ratio. keep_flags=True keeps
    the per-rule booleans instead of filtering (for audit pipelines).
    One narrow projection + filter — fully pushdown-friendly."""
    col = F.col(text)
    words = _words(col)
    checks = {
        "ok_word_count": F.size(words).between(min_words, max_words),
        "ok_dup_lines": _dup_fraction(_lines(col)) <= max_dup_line_frac,
        "ok_dup_paras": _dup_fraction(_paragraphs(col)) <= max_dup_para_frac,
        "ok_top_2gram": (
            F.when(
                F.size(words) >= 2,
                _run_stats(_word_ngrams(words, 2))["top"] / F.length(col),
            ).otherwise(F.lit(0.0))
            <= max_top_2gram_frac
        ),
        "ok_alpha_ratio": (
            F.size(F.filter(F.split(F.trim(col), r"\s+"), lambda t: t.rlike("[A-Za-z]")))
            / F.greatest(F.size(F.filter(F.split(F.trim(col), r"\s+"),
                                         lambda t: F.length(t) > 0)), F.lit(1))
            >= min_alpha_word_ratio
        ),
    }
    d = td.df
    if keep_flags:
        for name, c in checks.items():
            d = d.withColumn(name, c)
        return td.with_df(d)
    cond = None
    for c in checks.values():
        cond = c if cond is None else (cond & c)
    return td.with_df(d.filter(cond))


@verb
def c4_clean(td: Tibble, text: str = "text", min_line_words: int = 3) -> Tibble:
    """C4-style line-level cleanup (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation and have ≥ min_line_words
    words; drop documents mentioning lorem ipsum or containing '{'
    (code), rejoin surviving lines. Pure array HOFs — one narrow map."""
    col = F.col(text)
    lines = F.split(col, r"\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"”]\s*$')
        & (F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: F.length(w) > 0))
           >= min_line_words),
    )
    cleaned = F.concat_ws("\n", kept)
    d = (
        td.df.withColumn(text, cleaned)
        .filter(~F.lower(F.col(text)).contains("lorem ipsum"))
        .filter(~F.col(text).contains("{"))
        .filter(F.length(F.col(text)) > 0)
    )
    return td.with_df(d)


def _ngram_hashes(df, text: str, idcol: str, n: int):
    """(id, xxhash64(n-gram)) pairs, one row per n-gram — explode is
    Spark's native flatMap, so generation is distributed and narrow."""
    from .dedup import _ensure_parallelism

    words = _words(F.col(text))
    grams = _word_ngrams(words, n)
    return _ensure_parallelism(df).select(
        F.col(idcol), F.explode(grams).alias("__gram__")
    ).select(idcol, F.xxhash64("__gram__").alias("__gh__"))


@verb2
def contamination_report(
    td: Tibble,
    benchmark: Tibble,
    text: str = "text",
    id: str = "doc_id",
    bench_text: str | None = None,
    n: int = 13,
) -> Tibble:
    """Per-document count of word n-grams shared with a benchmark set
    (GPT-3/PaLM-style 13-gram decontamination audit). Corpus n-grams
    stay distributed; benchmark n-grams are the small side of the join
    (AQE broadcasts them), so the corpus never shuffles."""
    bt = bench_text or text
    corpus = _ngram_hashes(td.df, text, id, n)
    bench_df = benchmark.df.withColumn("__bid__", F.lit(0))
    bench = _ngram_hashes(bench_df, bt, "__bid__", n).select("__gh__").distinct()
    hits = (
        corpus.join(F.broadcast(bench), "__gh__")
        .groupBy(id)
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    out = (
        td.df.select(id)
        .join(hits, id, "left")
        .withColumn(
            "contaminated_ngrams", F.coalesce(F.col("contaminated_ngrams"), F.lit(0))
        )
    )
    return Tibble(out)


@verb2
def decontaminate(
    td: Tibble,
    benchmark: Tibble,
    text: str = "text",
    id: str = "doc_id",
    bench_text: str | None = None,
    n: int = 13,
    max_overlap: int = 0,
) -> Tibble:
    """Drop documents sharing more than max_overlap word n-grams with
    the benchmark: contamination_report + anti-join on the offenders."""
    report = contamination_report(
        td, benchmark, text=text, id=id, bench_text=bench_text, n=n
    )
    bad = report.df.filter(F.col("contaminated_ngrams") > max_overlap).select(id)
    return td.with_df(td.df.join(F.broadcast(bad), id, "left_anti"))


@verb
def pack_documents(
    td: Tibble,
    tokens: str = "n_tokens",
    budget: int = 2048,
    by: str | None = None,
    mode: str = "chunk",
) -> Tibble:
    """Assign documents to fixed-token-budget packs for sequence
    training.

    mode="chunk" (default, deterministic, SQL-expressible): pack id =
    floor(exclusive-prefix-sum(tokens) / budget) in frame order — the
    standard streaming approximation of bin packing (each pack holds
    ≤ budget tokens carried over plus at most one boundary doc). One
    window over `by` partitions (or the global two-pass rewrite when
    ungrouped), no Python.

    mode="greedy" runs first-fit-decreasing *within* each `by`
    partition via applyInPandas — tighter packs, one shuffle, local
    quadratic work; requires `by`.

    ``tokens`` is ANY precomputed per-document count column — the
    budget is tokenizer-honest by construction: materialize real BPE
    counts (or the ``bpe_token_estimate``/``token_count`` registry
    estimators) into a column first and pack against that."""
    if tokens not in td.columns:
        raise ValueError(
            f"pack_documents: token-count column {tokens!r} not in the "
            f"frame; materialize one first, e.g. "
            f"mutate(n_tokens=token_count(f.text)) or "
            f"bpe_token_estimate(f.text) for a BPE-ish budget"
        )
    t = td.ensure_order()
    from ..plans.context import ORDER_COL

    if mode == "chunk":
        if by:
            w = Window.partitionBy(by).orderBy(F.col(ORDER_COL).asc())
            cum_excl = F.coalesce(
                F.sum(tokens).over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
        else:
            # ungrouped: inclusive two-pass distributed cumsum (no
            # single-partition window) minus the row's own tokens
            from ..plans.context import EvalContext

            ctx = EvalContext(t, "eval")
            cum_excl = ctx.cum_over("sum", F.col(tokens)) - F.col(tokens)
        d = t.df.withColumn("pack_id", F.floor(cum_excl / F.lit(int(budget))))
        return t.with_df(d)

    if mode == "greedy":
        if by is None:
            raise ValueError("pack_documents(mode='greedy') requires by=")
        import pandas as pd

        from pyspark.sql.types import LongType, StructField, StructType

        # StructType.add mutates in place — build a fresh copy
        out_schema = StructType(
            list(t.df.schema.fields) + [StructField("pack_id", LongType())]
        )

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(tokens, ascending=False).reset_index(drop=True)
            packs: list[int] = []
            remaining: list[int] = []
            ids = []
            for tk in pdf[tokens]:
                placed = None
                for i, r in enumerate(remaining):
                    if tk <= r:
                        placed = i
                        break
                if placed is None:
                    remaining.append(int(budget) - int(tk))
                    ids.append(len(remaining) - 1)
                else:
                    remaining[placed] -= int(tk)
                    ids.append(placed)
            pdf["pack_id"] = ids
            return pdf

        d = t.df.groupBy(by).applyInPandas(pack, schema=out_schema)
        return t.with_df(d)

    raise ValueError(f"pack_documents: unknown mode {mode!r}")


@verb
def hash_split(
    td: Tibble,
    id: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    col: str = "split",
) -> Tibble:
    """Deterministic train/val/test assignment: bucket = xxhash64 of
    (salt, id) mod 10_000 mapped onto the cumulative weight ranges.
    Stable across runs/cluster sizes (pure function of the id — the
    property that keeps training and eval sets disjoint as the corpus
    grows), no shuffle, no RNG state."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    bucket = F.pmod(F.xxhash64(F.lit(salt), F.col(id)), F.lit(10_000))
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        cond = bucket < F.lit(int(round(acc * 10_000)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    d = td.df.withColumn(col, expr)
    return td.with_df(d)


@verb
def stratified_sample(
    td: Tibble,
    by: str,
    fractions: dict | float,
    seed: int = 7,
) -> Tibble:
    """Per-stratum Bernoulli sample (DataFrame.sampleBy — one narrow
    pass, no shuffle). fractions: {stratum: fraction} or a single
    fraction applied to every stratum."""
    if isinstance(fractions, float):
        keys = [r[0] for r in td.df.select(by).distinct().collect()]
        fractions = {k: fractions for k in keys}
    return td.with_df(td.df.sampleBy(by, fractions=fractions, seed=seed))


@verb
def mix_corpora(
    td: Tibble,
    source: Any,
    weights: dict[str, float],
    id_col: Any = "doc_id",
    salt: str = "mix",
) -> Tibble:
    """Resample a multi-source corpus to target mix proportions.

    ``weights`` maps source values to target weights (normalized to
    proportions). One tiny aggregation computes per-source counts; the
    largest total reachable WITHOUT upsampling is ``min(n_s / p_s)``,
    giving per-source keep-fractions ``p_s * T / n_s``. Rows are kept
    by a deterministic hash of (salt, id) against the fraction —
    reproducible across runs and cluster sizes, one narrow filter pass,
    no RNG state, no shuffle. Sources missing from ``weights`` are
    dropped; to upsample a source, union extra epochs of it first."""
    sname = source._name if hasattr(source, "_name") else str(source)
    idn = id_col._name if hasattr(id_col, "_name") else str(id_col)
    total_w = float(sum(weights.values()))
    props = {k: w / total_w for k, w in weights.items()}
    counts = {
        r[0]: r[1]
        for r in td.df.groupBy(sname).count().collect()
        if r[0] in props
    }
    missing = [k for k in props if k not in counts]
    if missing:
        raise ValueError(f"mix_corpora: sources not in data: {missing}")
    target_total = min(counts[k] / p for k, p in props.items() if p > 0)
    fracs = {k: min(1.0, props[k] * target_total / counts[k]) for k in props}
    res = F.pmod(F.xxhash64(F.lit(salt), F.col(idn)), F.lit(1_000_000))
    keep = None
    for k, frac in fracs.items():
        cond = (F.col(sname) == F.lit(k)) & (res < F.lit(int(round(frac * 1_000_000))))
        keep = cond if keep is None else (keep | cond)
    out = td.df.filter(keep)
    return td.with_df(out)


@verb
def temperature_mix(
    td: Tibble,
    source: Any,
    alpha: float = 0.7,
    id_col: Any = "doc_id",
    salt: str = "mix",
) -> Tibble:
    """Temperature-based source rebalancing: target weights are the
    per-source counts raised to ``alpha`` (the multilingual sampling
    rule of XLM-R/mT5: alpha < 1 flattens the source distribution so
    small sources aren't drowned out, alpha=1 keeps it, alpha=0 makes
    it uniform), then resampled exactly as in ``mix_corpora``."""
    sname = source._name if hasattr(source, "_name") else str(source)
    counts = {r[0]: r[1] for r in td.df.groupBy(sname).count().collect()}
    weights = {k: float(n) ** alpha for k, n in counts.items()}
    return mix_corpora(td, source, weights, id_col=id_col, salt=salt)


@verb
def classifier_score(
    td: Tibble,
    text: Any = "text",
    model_fn: Any = None,
    col: str = "clf_score",
    batch_size: int = 1024,
) -> Tibble:
    """Model-based quality scoring (the fasttext/KenLM-classifier stage
    of CCNet/RefinedWeb-style pipelines) as an Arrow-batched pandas UDF.

    ``model_fn`` takes a list[str] batch and returns list[float] scores
    — plug in a real classifier (fasttext .predict, an ONNX session, a
    KenLM perplexity) loaded per-executor; the default STUB is a
    deterministic hash-derived score in [0, 1) so the distributed
    plumbing is testable without model libraries in the container.
    Partitioning: one narrow map, no shuffle; batch_size only bounds
    Arrow batch memory."""
    import hashlib as _hl

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    tname = text._name if hasattr(text, "_name") else str(text)

    if model_fn is None:
        def model_fn(batch):  # deterministic stub
            return [
                int.from_bytes(_hl.sha256(t.encode()).digest()[:4], "big")
                / 2**32
                if t is not None
                else None
                for t in batch
            ]

    def _score_fn(s):
        return pd.Series(model_fn(s.tolist()), dtype="float64")

    _score = pandas_udf(_score_fn, "double")

    out = td.df.withColumn(col, _score(F.col(tname)))
    return td.with_df(out)


@verb
def domain_filter(
    td: Tibble,
    url: Any = "url",
    blocklist: Any = (),
    allowlist: Any = None,
) -> Tibble:
    """Drop rows whose URL host matches a blocked domain (suffix match,
    so 'spam.example' also blocks 'www.spam.example'); with an
    allowlist, keep ONLY matching hosts. Lists are driver-side (they
    are curated files in practice) and compile to one JVM predicate —
    a narrow filter, no shuffle, pushdown-friendly."""
    uname = url._name if hasattr(url, "_name") else str(url)
    host = F.lower(F.parse_url(F.col(uname), F.lit("HOST")))

    def _match_any(domains):
        cond = F.lit(False)
        for d in domains:
            d = str(d).lower()
            cond = cond | (host == d) | host.endswith("." + d)
        return cond

    df = td.df
    if allowlist is not None:
        df = df.filter(_match_any(allowlist))
    if blocklist:
        df = df.filter(~_match_any(blocklist))
    return td.with_df(df)


@verb
def cap_per_key(
    td: Tibble,
    key: Any,
    n: int,
    id_col: Any = "doc_id",
    salt: int = 64,
) -> Tibble:
    """Keep at most ``n`` rows per key (per-domain caps in web-corpus
    curation). Selection order is the deterministic hash of the id —
    reproducible across runs and cluster layouts, and NOT frame order,
    so no global ordering materializes.

    r11 skew design: crawl domains are Zipfian, so a single window per
    key would put a mega-domain's entire row set into ONE task. The
    selection runs in two levels instead: a first window over
    ``(key, salt-bucket)`` keeps each bucket's ``n`` smallest hashes
    (bounded partitions), then a second window over the key picks the
    global ``n`` from the <= ``salt * n`` survivors — identical result
    to a single window (every globally-selected row is its bucket's
    local top-``n``), with no partition ever larger than
    max(bucket_size, salt*n)."""
    kname = key._name if hasattr(key, "_name") else str(key)
    idn = id_col._name if hasattr(id_col, "_name") else str(id_col)
    order = F.xxhash64(F.col(idn)).asc()
    if int(salt) > 1:
        bucket = F.pmod(F.xxhash64(F.lit("s"), F.col(idn)), F.lit(int(salt)))
        w1 = Window.partitionBy(F.col(kname), bucket).orderBy(order)
        pre = (
            td.df.withColumn("__cap_rn__", F.row_number().over(w1))
            .filter(F.col("__cap_rn__") <= n)
            .drop("__cap_rn__")
        )
    else:
        pre = td.df
    w2 = Window.partitionBy(kname).orderBy(order)
    out = (
        pre.withColumn("__cap_rn__", F.row_number().over(w2))
        .filter(F.col("__cap_rn__") <= n)
        .drop("__cap_rn__")
    )
    return td.with_df(out)


def chunk_documents(
    td: Tibble,
    text: Any = "text",
    max_tokens: int = 512,
    overlap: int = 0,
    chunk_col: str = "chunk_id",
    tokens_col: str = "chunk_tokens",
    tokens_per_word: float = 1.0,
    token_counts: Any = None,
) -> Tibble:
    """Split over-long documents into fixed token windows — the
    context-length chunking step of a pretraining / RAG pipeline
    (every chunk holds <= ``max_tokens`` whitespace tokens; consecutive
    chunks share ``overlap`` tokens so no boundary context is lost).

    Tokenizer-honest budgets: real context budgets are BPE tokens, not
    whitespace words. ``tokens_per_word`` declares the (corpus-measured)
    expansion ratio of the target tokenizer — e.g. ~1.3 for GPT-style
    BPE over English prose (measure yours: mutate
    ``bpe_token_estimate(text) / token_count(text)`` and average). The
    word window becomes ``floor(max_tokens / tokens_per_word)`` (floor:
    never exceed the budget) and the overlap becomes
    ``ceil(overlap / tokens_per_word)`` clamped below the window (ceil:
    the overlap is a minimum of carried context, never under-deliver
    it), so every emitted chunk fits the BPE budget conservatively
    while ``tokens_col`` keeps reporting the chunk's actual
    whitespace-token count. The default 1.0 budgets in
    plain whitespace tokens (unchanged behavior).

    EXACT budgets (r10): ``token_counts=`` names an ``array`` column
    carrying the true tokenizer cost of EACH whitespace word
    (precompute once with your real BPE over ``split(text)``). Chunk
    boundaries then bin-pack the actual counts: every chunk's true
    token sum fits ``max_tokens`` exactly (a single word costing more
    than the whole budget is emitted as its own oversized chunk rather
    than looping), and consecutive chunks carry AT LEAST ``overlap``
    true tokens of boundary context whenever the budget allows.
    ``tokens_col`` then reports the chunk's true token sum and the
    ``token_counts`` column is rewritten to each chunk's aligned
    slice, so downstream budget math (pack_documents over the same
    counts) stays honest. Boundaries come from one Arrow-vectorized
    prefix-sum pass over the small counts arrays; the text itself
    never leaves the JVM (slice/array_join stay codegen), so payload
    bytes never cross into Python. A counts array whose length
    disagrees with the document's word count fails fast. Mutually
    exclusive with ``tokens_per_word``.

    Pure JVM (ratio path): split -> sequence over the chunk count -> one
    slice+array_join per chunk -> posexplode. A narrow 1->N map with no
    UDF and NO shuffle — at 100 TB this runs inside the scan stage,
    upstream of pack_documents/tokenize. Documents at or under the
    budget pass through as their single chunk 0 (text unchanged up to
    whitespace normalization); the trailing chunk may be shorter; a
    chunk is never emitted fully inside the previous one.

    Output: the input rows exploded to one row per chunk, ``text``
    rewritten to the chunk, plus ``chunk_col`` (0-based) and
    ``tokens_col``."""
    tname = text._name if hasattr(text, "_name") else str(text)
    if not (0 <= int(overlap) < int(max_tokens)):
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < max_tokens, got "
            f"overlap={overlap}, max_tokens={max_tokens}"
        )
    ratio = float(tokens_per_word)
    if not ratio > 0:
        raise ValueError(
            f"chunk_documents: tokens_per_word must be > 0, got "
            f"{tokens_per_word}"
        )
    if token_counts is not None and ratio != 1.0:
        raise ValueError(
            "chunk_documents: token_counts= (exact per-word costs) and "
            "tokens_per_word= (corpus-average ratio) are mutually "
            "exclusive; pass one budget model"
        )
    if token_counts is None:
        # convert the budget into whitespace-word units. The two bounds
        # round in OPPOSITE directions: the window floors (the chunk
        # must FIT the budget, never exceed it) while the overlap ceils
        # — it is a MINIMUM of boundary context carried over, so
        # rounding it down would under-deliver context (e.g. overlap=4
        # at tokens_per_word=2.6 must carry 2 words ~ 5.2 tokens, not
        # 1 word ~ 2.6).
        max_tokens = int(int(max_tokens) / ratio)
        overlap = math.ceil(int(overlap) / ratio)
        if max_tokens < 1:
            raise ValueError(
                f"chunk_documents: the budget rounds to zero words at "
                f"tokens_per_word={tokens_per_word}; raise max_tokens"
            )
        if overlap >= max_tokens:
            # a legal (overlap, max_tokens) pair can collapse under the
            # ratio's floor; shrink the overlap rather than error (it
            # is a lower bound on context carried over, not a hard
            # contract)
            overlap = max_tokens - 1
    # output-name hygiene: a frame already carrying chunk_col /
    # tokens_col / the scratch "__ch" would otherwise produce duplicate
    # column names and an ambiguous-reference AnalysisException several
    # operators downstream — fail here with the actual story
    if chunk_col == tokens_col:
        raise ValueError(
            f"chunk_documents: chunk_col and tokens_col must differ, both "
            f"are {chunk_col!r}"
        )
    clash = sorted({chunk_col, tokens_col, "__ch"} & set(td.columns))
    if clash:
        raise ValueError(
            f"chunk_documents: column(s) {clash} already exist in the input "
            f"frame ('__ch' is reserved scratch); rename them or pass "
            f"different chunk_col=/tokens_col= names"
        )
    # whitespace tokens of the ORIGINAL text (not the lowercased
    # punctuation-stripped _words) — the rewritten chunks must preserve
    # the document's actual content; NULL text behaves like empty
    # (one empty chunk, chunk_tokens 0)
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(tname), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    if token_counts is not None:
        return _chunk_exact(
            td, tname, token_counts, int(max_tokens), int(overlap),
            chunk_col, tokens_col, toks,
        )
    step = int(max_tokens) - int(overlap)
    n = F.size(toks)
    # smallest c with (c-1)*step + max_tokens >= n; empty/short docs -> 1
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(int(max_tokens))) / F.lit(step)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(toks, i * step + 1, int(max_tokens)), " "
            ).alias("t"),
            F.least(n - i * step, F.lit(int(max_tokens))).alias("nt"),
        ),
    )
    others = [c for c in td.columns if c != tname]
    out = (
        td.df.select(*td.columns, F.posexplode(chunks).alias(chunk_col, "__ch"))
        .select(
            *others,
            F.col("__ch.t").alias(tname),
            F.col(chunk_col),
            F.col("__ch.nt").cast("int").alias(tokens_col),
        )
    )
    return Tibble(out)


def _chunk_exact(
    td: Tibble,
    tname: str,
    token_counts: Any,
    max_tokens: int,
    overlap: int,
    chunk_col: str,
    tokens_col: str,
    toks: Column,
) -> Tibble:
    """The token_counts= path of chunk_documents: greedy bin-packing of
    TRUE per-word token costs via prefix sums + binary search. Per
    chunk [s, e): e is the largest index with sum(counts[s..e)) <=
    max_tokens (at least one word, so a single over-budget word emits
    alone); the next start is the largest s' that still carries >=
    ``overlap`` true tokens of context, pushed forward if the budget
    couldn't otherwise admit word e (budget wins over overlap, exactly
    like the ratio path's clamp). Starts advance strictly, so a chunk
    is never emitted inside the previous one.

    Only the small integer counts arrays cross into Python (one
    Arrow-vectorized pandas UDF computing (start, len, tokens)
    boundary structs); the text is sliced and joined JVM-side, so at
    100 TB the payload bytes never leave codegen and the operator
    stays a narrow 1->N map with no shuffle."""
    import numpy as np
    import pandas as pd

    cname = (
        token_counts._name if hasattr(token_counts, "_name")
        else str(token_counts)
    )
    if cname not in td.columns:
        raise ValueError(
            f"chunk_documents: token_counts column {cname!r} not in the "
            f"frame (columns: {list(td.columns)})"
        )
    if "__bounds" in td.columns:
        raise ValueError(
            "chunk_documents: column '__bounds' is reserved scratch on "
            "the token_counts path; rename it first"
        )

    @F.pandas_udf("array<struct<s:int,l:int,nt:bigint>>")
    def bounds(counts, nwords):
        out = []
        for c, nw in zip(counts, nwords):
            nw = int(nw)
            if c is None:
                if nw > 0:
                    raise ValueError(
                        "chunk_documents: token_counts is NULL for a "
                        f"document with {nw} words; precompute a count "
                        "per whitespace word"
                    )
                out.append([{"s": 0, "l": 0, "nt": 0}])
                continue
            cv = np.asarray(list(c), dtype="int64")
            if len(cv) != nw:
                raise ValueError(
                    f"chunk_documents: token_counts length {len(cv)} != "
                    f"word count {nw}; counts must align with "
                    "split(text) on whitespace"
                )
            if len(cv) and cv.min() < 0:
                raise ValueError(
                    "chunk_documents: negative token count in "
                    "token_counts"
                )
            n = len(cv)
            if n == 0:
                out.append([{"s": 0, "l": 0, "nt": 0}])
                continue
            ps = np.concatenate(([0], np.cumsum(cv)))
            res = []
            s = 0
            while s < n:
                e = int(np.searchsorted(ps, ps[s] + max_tokens, "right")) - 1
                if e <= s:
                    e = s + 1  # single word over budget: emitted alone
                res.append(
                    {"s": s, "l": e - s, "nt": int(ps[e] - ps[s])}
                )
                if e >= n:
                    break
                # largest s' still carrying >= overlap true tokens ...
                s_ov = int(np.searchsorted(ps, ps[e] - overlap, "right")) - 1
                # ... unless the budget can't then admit word e
                s_min = int(
                    np.searchsorted(ps, ps[e + 1] - max_tokens, "left")
                )
                nxt = min(e, max(s_min, s_ov))
                s = nxt if nxt > s else s + 1
            out.append(res)
        return pd.Series(out)

    chunks = F.transform(
        F.col("__bounds"),
        lambda b: F.struct(
            F.array_join(
                F.slice(toks, b["s"] + F.lit(1), b["l"]), " "
            ).alias("t"),
            b["nt"].alias("nt"),
            F.slice(F.col(cname), b["s"] + F.lit(1), b["l"]).alias("tc"),
        ),
    )
    others = [c for c in td.columns if c not in (tname, cname)]
    out = (
        td.df.withColumn("__bounds", bounds(F.col(cname), F.size(toks)))
        .select(*td.columns, F.posexplode(chunks).alias(chunk_col, "__ch"))
        .select(
            *others,
            F.col("__ch.t").alias(tname),
            F.col("__ch.tc").alias(cname),
            F.col(chunk_col),
            F.col("__ch.nt").alias(tokens_col),
        )
    )
    return Tibble(out)
