"""Model-free text embeddings — the hashing-trick + seeded random
projection construction that turns raw text into fixed-dimension
vectors WITHOUT an external embedding model, so the ANN / semantic
dedup / embedding-join stack runs end to end from text alone.

Public technique: feature hashing with a sign hash (Weinberger et al.
2009) composed with a seeded Gaussian random projection
(Johnson–Lindenstrauss); cosine similarity of the projected vectors
approximates the cosine of the (huge, sparse) hashed n-gram vectors,
which itself tracks lexical overlap. This is the classical cheap
document vector — not a neural model and not a substitute for one, but
deterministic, dependency-free, and good enough for near-dup blocking,
clustering, and recall-oriented retrieval stages.

100 TB shape: ONE Arrow pass per document (tokenize, hash, project
against a seeded (buckets-free) projection computed ROW-WISE from the
gram hash — no buckets x dim matrix is ever materialized, so memory is
O(dim) per gram, not O(2^20 x dim) per executor); no shuffle; the
output column feeds cosine_topk / semantic_dedup / embedding_join /
pca_train unchanged. Determinism: every vector derives from
xxhash-free stdlib hashes of the gram bytes and the seed — the same
text and config give the same vector on any partitioning, any session.
"""

from __future__ import annotations

import math
import zlib
from typing import Any

import pandas as pd
from pyspark.sql import functions as F

from ..tibble import Tibble, ensure_tibble

__all__ = ["text_embed"]


_ROW_MEMO: dict = {}
_ROW_MEMO_CAP = 1 << 16  # ~32 MB at dim=64 float64 — bounded per executor


def _gram_row(h: int, dim: int, seed: int):
    """Deterministic Gaussian projection row for one gram hash —
    memoized per executor (vocabulary is Zipfian, so the hit rate is
    high and the cache stays bounded)."""
    import numpy as np

    key = (h, dim, seed)
    row = _ROW_MEMO.get(key)
    if row is None:
        rng = np.random.default_rng(
            np.uint64(h) * np.uint64(2654435761) + np.uint64(seed)
        )
        row = rng.standard_normal(dim)
        if len(_ROW_MEMO) >= _ROW_MEMO_CAP:
            _ROW_MEMO.clear()
        _ROW_MEMO[key] = row
    return row


def _embed_batch(
    texts, dim: int, n_lo: int, n_hi: int, seed: int, analyzer: str = "word"
):
    """Per-batch embedding: for each gram, a deterministic Gaussian
    row generated from (gram hash, seed); summed with tf weights,
    l2-normalized."""
    import numpy as np

    from .classifier import _doc_grams

    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        grams = _doc_grams(str(t), n_lo, n_hi, analyzer)
        if not grams:
            out.append(None)
            continue
        counts: dict = {}
        for g in grams:
            h = zlib.crc32(g.encode("utf-8"))
            counts[h] = counts.get(h, 0) + 1
        v = np.zeros(dim)
        for h, c in counts.items():
            v += (c / len(grams)) * _gram_row(h, dim, seed)
        norm = float(np.linalg.norm(v))
        out.append((v / norm).tolist() if norm > 0 else None)
    return out


def text_embed(
    td: Any,
    text: Any = "text",
    out_col: str = "embedding",
    dim: int = 64,
    n_lo: int = 1,
    n_hi: int = 2,
    seed: int = 0,
    analyzer: str = "word",
) -> Tibble:
    """Add a deterministic ``array<double>`` embedding of a text column
    (hashed word 1..n-gram tf, signed Gaussian random projection to
    ``dim``, l2-normalized). NULL/gramless text embeds as NULL.
    ``analyzer="char"`` switches to boundary-padded char n-grams (pass
    e.g. ``n_lo=2, n_hi=4``) — required for unsegmented CJK text,
    where word tokenization collapses whole hanzi/kana runs into
    single tokens and near-dup cosines collapse toward zero.

    The output plugs directly into :func:`cosine_topk`,
    :func:`semantic_dedup`, :func:`embedding_join`,
    :func:`pca_train` — the full embedding stack with no external
    model. One Arrow pass, no shuffle; same text + config = same
    vector on any cluster layout (tested).
    """
    td = ensure_tibble(td)
    tname = text if isinstance(text, str) else text._name
    if out_col in td.columns:
        raise ValueError(f"text_embed: column {out_col!r} already exists")
    dim, n_lo, n_hi, seed = int(dim), int(n_lo), int(n_hi), int(seed)
    if dim < 2:
        raise ValueError("text_embed: dim must be >= 2")
    if analyzer not in ("word", "char"):
        raise ValueError(
            f"text_embed: analyzer must be 'word' or 'char', got "
            f"{analyzer!r}"
        )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _embed(s: pd.Series) -> pd.Series:
        return pd.Series(_embed_batch(s, dim, n_lo, n_hi, seed, analyzer))

    # see ivf_assign (similarity.py): the marker keeps the optimizer
    # from pushing downstream filters into the UDF expression
    _embed = _embed.asNondeterministic()
    return td.with_df(td.df.withColumn(out_col, _embed(F.col(tname))))
