"""Corpus relevance scoring: TF-IDF and BM25 (Robertson/Sparck Jones).

Training-data curation tools: surface each document's most
characteristic terms (tfidf_top_terms — topic inspection, boilerplate
detection: a corpus whose top terms are navigation chrome needs
cleaning) and rank documents against a query term set (bm25_score —
targeted subcorpus extraction, e.g. pulling medical text out of a web
crawl by seed vocabulary).

100 TB shape: everything reduces to explode -> groupBy keyed shuffles
and one broadcastable per-term statistics frame. No Python UDFs; term
statistics are exact, not sketched.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.expr import Ref
from ..tibble import Tibble, ensure_tibble
from .dedup import tokenize_words

__all__ = ["tfidf_top_terms", "bm25_score"]


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


def _doc_terms(df: DataFrame, tname: str, idn: str) -> DataFrame:
    """(id, term, tf): one narrow explode + one keyed groupBy shuffle."""
    return (
        df.select(
            F.col(idn).alias("id"),
            F.explode(tokenize_words(F.col(tname))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    td: Any,
    text: Any,
    id_col: Any,
    k: int = 10,
    min_df: int = 1,
) -> Tibble:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, sklearn's smooth_idf convention).

    Returns (id, term, tf, df, score, rank) with a TOTAL deterministic
    order within each document: score desc, then term asc — equal-score
    ties (same tf and df) break alphabetically, so results are
    reproducible across engines and runs.

    Plan: tokenize/explode is narrow; (id, term) term frequencies are
    one keyed shuffle; document frequencies aggregate FROM the tf frame
    (re-keyed by term — second small shuffle over the distinct (id,
    term) pairs, not the corpus); N is a 1-row broadcast; the per-doc
    top-k rank compiles to a WindowGroupLimit (map-side partial top-k
    before the window shuffle)."""
    td = ensure_tibble(td)
    tname, idn = _name_of(text), _name_of(id_col)
    terms = _doc_terms(td.df, tname, idn)
    n_docs = td.df.select(F.countDistinct(F.col(idn)).alias("n"))
    df_counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_counts = df_counts.filter(F.col("df") >= min_df)
    scored = (
        terms.join(df_counts, on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "score", "rank")
    )
    return Tibble(out)


def bm25_score(
    td: Any,
    text: Any,
    id_col: Any,
    query: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> Tibble:
    """BM25 relevance of every document against a fixed ``query`` term
    set: (id, score), scores > 0 only for documents containing at least
    one query term (others are omitted — anti-join the ids to find
    them). Standard Okapi BM25 with smooth idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Plan: the corpus pays one (id, term) groupBy; query-term
    frequencies and statistics then FILTER to the query vocabulary
    before any further shuffle, so the scoring join is over a
    query-sized frame and the per-term stats broadcast. avgdl and N are
    1-row broadcasts."""
    td = ensure_tibble(td)
    if not query:
        raise ValueError("bm25_score: query terms must be non-empty")
    tname, idn = _name_of(text), _name_of(id_col)
    qterms = [t.lower() for t in query]
    terms = _doc_terms(td.df, tname, idn)
    doclen = terms.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = td.df.select(
        F.countDistinct(F.col(idn)).alias("n")
    ).crossJoin(doclen.select(F.avg("dl").alias("avgdl")))
    qhits = terms.filter(F.col("term").isin(qterms))
    df_counts = qhits.groupBy("term").agg(F.countDistinct("id").alias("df"))
    scored = (
        qhits.join(F.broadcast(df_counts), on="term")
        .join(doclen, on="id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    out = (
        scored.groupBy("id")
        .agg(F.sum("contrib").alias("score"))
        .select("id", "score")
    )
    return Tibble(out)
