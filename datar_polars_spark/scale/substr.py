"""Exact-substring duplicate spans across a corpus — the
"deduplicate repeated training text, not just repeated documents"
operation (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" — ExactSubstr): boilerplate, licenses, and
templated passages repeat verbatim across documents that are NOT
near-duplicates of each other, so document-level MinHash/SimHash never
sees them.

The reference ExactSubstr implementation builds a corpus-wide suffix
array — inherently single-machine. The distributed re-expression here
is the standard k-gram formulation: a substring of >= k words repeated
anywhere in the corpus is exactly a run of repeated word k-grams, so

  1. per document, hash every ordered word k-gram (one narrow map:
     zip_with shingles + index-aware transform, JVM codegen, no UDF);
  2. posexplode -> keyed groupBy on the gram hash computes occurrence
     count (and exact distinct-doc count) with MAP-SIDE partial
     aggregation — gram hashes are uniform but occurrence counts are
     power-law, and partial aggregation is what keeps a 10^8-copy
     boilerplate gram from funnelling into one task (r6: this replaced
     a count-over-window, which has no partial aggregation) — then an
     inner join back on the gram hash restores qualifying positions
     (AQE skew-join splits the hot-key partitions);
  3. one shuffle back by document assembles the flagged positions and
     an ``aggregate`` HOF merges overlapping [pos, pos+k) runs into
     maximal spans.

Three keyed shuffles total, each either partial-aggregated or
skew-splittable — the 100 TB shape of every dedup verb in this
package. Granularity is k words: repeats shorter than k are invisible
(by design, as in the paper), and span boundaries are word-aligned.

``mask_duplicate_spans`` applies the report destructively: drop every
word inside a flagged span. ``keep="all"`` (the default, the paper's
self-join behavior) removes ALL occurrences of a repeated passage,
including its first copy. ``keep="first"`` retains the GLOBALLY-FIRST
occurrence of each duplicated gram — min (doc id, position) per gram,
computed as one extra min-of-struct expression inside the existing
qualification aggregate (partial-aggregated, no extra shuffle) — so
exactly one copy of common boilerplate survives corpus-wide, which is
what a careful pipeline wants for licenses and templates.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.expr import Ref
from ..plans.verb import verb
from ..tibble import Tibble

__all__ = ["duplicate_spans", "mask_duplicate_spans"]


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


def _ordered_gram_hashes(col: Column, k: int) -> Column:
    """xxhash64 of every ordered word k-gram; empty array when the
    document has fewer than k words (no partial grams — a short doc
    cannot contain a k-word repeat)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    n = F.size(toks)
    m = F.greatest(n - k + 1, F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.transform(grams, lambda g: F.xxhash64(g))


def _merge_runs(positions: Column, k: int) -> Column:
    """Merge a sorted array of 0-based gram positions into maximal
    [start, end) word spans (gram at p covers words [p, p+k))."""
    span = "struct<start:int,end:int>"
    return F.aggregate(
        positions,
        F.expr(f"cast(array() as array<{span}>)"),
        lambda acc, p: F.when(
            F.size(acc) > 0,
            F.when(
                p <= F.element_at(acc, -1)["end"],
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["start"].alias("start"),
                            F.greatest(
                                F.element_at(acc, -1)["end"], (p + k).cast("int")
                            ).alias("end"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(
                            p.cast("int").alias("start"),
                            (p + k).cast("int").alias("end"),
                        )
                    ),
                )
            ),
        ).otherwise(
            F.array(
                F.struct(
                    p.cast("int").alias("start"), (p + k).cast("int").alias("end")
                )
            )
        ),
    )


# Persist size gate: the exploded gram frame caches ~(8 id + 4 pos +
# 8 hash + row overhead) ~ 48 bytes per corpus WORD; raw text in the
# source files averages ~6 bytes per word and parquet compresses ~2x,
# so the cached gram frame is ~16x the scanned file bytes. Above the
# cap we recompute the tokenize+hash map for the second consumer
# instead of spilling that much to executor local disk.
_GRAM_BYTES_PER_INPUT_BYTE = 16


def _estimate_input_bytes(df) -> int | None:
    """Sum of the source files behind ``df`` (driver metadata only —
    no job). None when the plan has no file source (in-memory frames),
    or the paths are not local/stat-able."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    import os
    from urllib.parse import urlparse

    total = 0
    for fp in files:
        p = urlparse(fp).path or fp
        if not os.path.exists(p):
            return None
        total += os.path.getsize(p)
    return total


def _flagged_grams(
    df, tname: str, idn: str, k: int, min_count: int,
    min_docs: int | None, exclude_first: bool, persist_max_bytes: int,
):
    """(__id, __nw, __pos, __h) rows for every qualifying gram
    occurrence — the shared core of the report and the mask.

    ``exclude_first`` drops each gram's GLOBALLY-FIRST occurrence
    (min (doc id, position), one extra min-of-struct expression in the
    qualification aggregate — partial-aggregated, no extra shuffle)."""
    from .dedup import _ensure_parallelism

    df = _ensure_parallelism(df)
    grams = df.select(
        F.col(idn).alias("__id"),
        F.size(F.split(F.lower(F.trim(F.col(tname))), r"\s+")).alias("__nw"),
        F.posexplode(_ordered_gram_hashes(F.col(tname), k)).alias(
            "__pos", "__h"
        ),
    )
    # the gram frame feeds BOTH the qualification aggregate and the
    # join-back: persist it so the tokenize+hash map runs once instead
    # of twice — but only while the estimated gram bytes fit under
    # ``persist_max_bytes`` (the disk-vs-recompute tradeoff made
    # explicit; past the cap the map recomputes, which at extreme
    # corpus scale beats spilling ~(words x k) rows to local disk).
    # Unknown input size (non-file sources) keeps the persist.
    est = _estimate_input_bytes(df)
    if est is None or est * _GRAM_BYTES_PER_INPUT_BYTE <= persist_max_bytes:
        from pyspark import StorageLevel

        from ..plans.cache import register_internal_cache

        grams = register_internal_cache(
            grams.persist(StorageLevel.MEMORY_AND_DISK)
        )

    # Qualifying grams via groupBy + join-back, NOT a window over the
    # gram hash: gram hashes are uniform but occurrence counts are
    # power-law (a boilerplate 20-gram can appear 10^8 times), and
    # count().over(partitionBy(__h)) ships every raw occurrence of a
    # hot gram to ONE task. groupBy gets map-side partial aggregation
    # (hot keys pre-reduced on each mapper), and the inner join back is
    # AQE-skew-splittable, so no single task ever owns a hot gram.
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if min_docs is not None:
        # exact distinct docs per gram: planned as a two-phase
        # aggregate over (__h, __id) — still partial-aggregated
        aggs.append(F.countDistinct("__id").alias("__nd"))
    if exclude_first:
        aggs.append(
            F.min(
                F.struct(
                    F.col("__id").alias("i"), F.col("__pos").alias("p")
                )
            ).alias("__first")
        )
    hot = grams.groupBy("__h").agg(*aggs).where(F.col("__cnt") >= min_count)
    if min_docs is not None:
        hot = hot.where(F.col("__nd") >= min_docs)
    if exclude_first:
        flagged = grams.join(hot.select("__h", "__first"), "__h").where(
            ~(
                (F.col("__id") == F.col("__first.i"))
                & (F.col("__pos") == F.col("__first.p"))
            )
        ).drop("__first")
    else:
        flagged = grams.join(hot.select("__h"), "__h")
    return flagged


def _spans_per_doc(flagged, idn: str, k: int):
    return (
        flagged.groupBy("__id")
        .agg(
            F.array_sort(F.collect_list("__pos")).alias("__ps"),
            F.first("__nw").alias("__nw"),
        )
        .select(
            F.col("__id").alias(idn),
            _merge_runs(F.col("__ps"), k).alias("dup_spans"),
            F.col("__nw"),
        )
        .withColumn(
            "dup_words",
            F.aggregate(
                F.col("dup_spans"),
                F.lit(0),
                lambda a, s: a + (s["end"] - s["start"]),
            ),
        )
        .select(
            idn,
            "dup_spans",
            "dup_words",
            (
                F.least(F.col("dup_words") / F.greatest("__nw", F.lit(1)), F.lit(1.0))
            ).alias("dup_word_fraction"),
        )
    )


@verb
def duplicate_spans(
    td: Tibble,
    text: Any = "text",
    id: Any = "doc_id",
    k: int = 20,
    min_count: int = 2,
    min_docs: int | None = None,
    persist_max_bytes: int = 64 << 30,
) -> Tibble:
    """Report, per document, the maximal word spans whose every k-gram
    repeats elsewhere in the corpus.

    A gram is flagged when its total occurrence count reaches
    ``min_count`` (within-document repeats included); ``min_docs``
    additionally requires it to appear in that many distinct documents
    (cross-document boilerplate only). Output: one row per document
    that has at least one flagged span —
    ``(id, dup_spans array<struct<start,end>>, dup_words,
    dup_word_fraction)`` with word-index [start, end) spans.

    ``persist_max_bytes`` gates the internal gram-frame persist: while
    the estimated exploded-gram bytes (~16x the scanned file bytes) fit
    under the cap, the tokenize+hash map is cached for its two
    consumers; past it, the map recomputes instead of spilling
    ~(words x k) rows to executor local disk.

    Spans are WORD-indexed, so unsegmented CJK text (where a whole
    hanzi/kana run is one "word") gets no useful spans — pre-segment
    such corpora first, or use the char-analyzer near-dup family
    (minhash_dedup/simhash_dedup/ngram_jaccard_pairs with
    ``analyzer="char"``) for document-level CJK duplication.
    """
    tname, idn = _name_of(text), _name_of(id)
    flagged = _flagged_grams(
        td.df, tname, idn, k, min_count, min_docs,
        exclude_first=False, persist_max_bytes=persist_max_bytes,
    )
    return td.with_df(_spans_per_doc(flagged, idn, k))


@verb
def mask_duplicate_spans(
    td: Tibble,
    text: Any = "text",
    id: Any = "doc_id",
    k: int = 20,
    min_count: int = 2,
    min_docs: int | None = None,
    keep: str = "all",
    persist_max_bytes: int = 64 << 30,
) -> Tibble:
    """Remove every word inside a corpus-repeated span and return the
    frame with ``text`` rewritten. ``keep="all"`` (default) masks ALL
    occurrences, the paper's self-join behavior; ``keep="first"``
    retains each duplicated gram's globally-first occurrence
    (min (doc id, position)), so exactly one copy of a repeated passage
    survives corpus-wide — see the module note. Documents without
    flagged spans pass through untouched; word boundaries collapse to
    single spaces in rewritten documents."""
    if keep not in ("all", "first"):
        raise ValueError(
            f"mask_duplicate_spans: keep must be 'all' or 'first', got {keep!r}"
        )
    tname, idn = _name_of(text), _name_of(id)
    flagged = _flagged_grams(
        td.df, tname, idn, k, min_count, min_docs,
        exclude_first=(keep == "first"), persist_max_bytes=persist_max_bytes,
    )
    report = _spans_per_doc(flagged, idn, k).select(F.col(idn), "dup_spans")
    joined = td.df.join(report, idn, "left")
    toks = F.split(F.trim(F.col(tname)), r"\s+")
    kept = F.filter(
        toks,
        lambda w, i: ~F.exists(
            F.col("dup_spans"), lambda s: (i >= s["start"]) & (i < s["end"])
        ),
    )
    masked = F.when(
        F.col("dup_spans").isNull(), F.col(tname)
    ).otherwise(F.concat_ws(" ", kept))
    out = joined.withColumn(tname, masked).drop("dup_spans")
    return td.with_df(out)
