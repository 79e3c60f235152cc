"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane
LSH-bucketed search as the scale path (probe the query's bucket plus
hamming-1 neighbors). Everything stays in JVM higher-order functions.

At 100 TB / billions of vectors the LSH variant's plan is: one narrow
projection computes each vector's bucket once (cacheable/bucketable on
write), the probe filters to a handful of buckets (partition-prunable
when bucketed), and only candidates pay the exact-cosine cost.
"""

from __future__ import annotations

import math
import random
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.expr import Ref
from ..plans.verb import verb
from ..tibble import Tibble

from .dedup import cosine_sim

__all__ = ["cosine_topk", "lsh_plan_buckets", "lsh_topk"]


def _name_of(x: Any) -> str:
    return x._name if isinstance(x, Ref) else str(x)


def _query_cosine(vec_col: Column, query: Sequence[float]) -> Column:
    """Cosine against a literal query vector; the query norm folds to a
    constant, the row dot/norm is one pass over the array."""
    q = [float(v) for v in query]
    qnorm = math.sqrt(sum(v * v for v in q))
    dot = F.aggregate(
        F.zip_with(vec_col, F.lit(q), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    vnorm = F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return dot / (vnorm * F.lit(qnorm))


@verb
def cosine_topk(
    td: Tibble,
    query: Sequence[float],
    embedding: Any = "embedding",
    id_col: Any = "vec_id",
    k: int = 10,
) -> Tibble:
    """Exact brute-force top-k by cosine similarity. One narrow scan +
    a TakeOrderedAndProject (no full sort materialization)."""
    ename, idn = _name_of(embedding), _name_of(id_col)
    scored = td.df.select(
        F.col(idn), _query_cosine(F.col(ename), query).alias("cosine")
    )
    out = scored.orderBy(F.col("cosine").desc(), F.col(idn).asc()).limit(k)
    return Tibble(out)


def _plane_sig(vec_col: Column, planes: list[list[float]]) -> Column:
    sig = None
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec_col, F.lit(plane), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = (dot > 0).cast("long")
        sig = bit if sig is None else sig.bitwiseOR(F.shiftleft(bit, p))
    return sig


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


@verb
def lsh_plan_buckets(
    td: Tibble,
    embedding: Any = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> Tibble:
    """Add a deterministic LSH ``bucket`` column (sign signature over
    random hyperplanes). At scale, write the table bucketed/partitioned
    by this column so probes prune partitions."""
    ename = _name_of(embedding)
    dim = len(td.df.select(ename).first()[0])
    planes = _planes(dim, n_planes, seed)
    out = td.df.withColumn("bucket", _plane_sig(F.col(ename), planes))
    return Tibble(out, groups=td.group_vars, levels=td.levels)


@verb
def lsh_topk(
    td: Tibble,
    query: Sequence[float],
    embedding: Any = "embedding",
    id_col: Any = "vec_id",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    probe_hamming: int = 1,
) -> Tibble:
    """Approximate top-k: filter to the query's LSH bucket (± hamming
    distance ``probe_hamming``), exact cosine only on candidates."""
    ename, idn = _name_of(embedding), _name_of(id_col)
    dim = len(query)
    planes = _planes(dim, n_planes, seed)
    qsig = 0
    for p, plane in enumerate(planes):
        dot = sum(float(a) * b for a, b in zip(query, plane))
        qsig |= (1 if dot > 0 else 0) << p
    sig = _plane_sig(F.col(ename), planes)
    cand = td.df.withColumn("__bucket__", sig).filter(
        F.bit_count(F.col("__bucket__").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    scored = cand.select(
        F.col(idn), _query_cosine(F.col(ename), query).alias("cosine")
    )
    out = scored.orderBy(F.col("cosine").desc(), F.col(idn).asc()).limit(k)
    return Tibble(out)
