"""Bloom-filter semi-join reduction: shrink a huge fact table before
its shuffle join against a key set, Spark-runtime-filter style but
available as an explicit, reusable verb.

The classic 100 TB pattern: joining a petabyte fact table against a
modest key set (dedup survivors, decontamination offenders, allowlisted
domains) shuffles the whole fact side even though only a sliver
survives. A Bloom filter built from the key side and applied as a
narrow, whole-stage-codegen predicate on the fact side drops the
non-matching bulk *before* the exchange. Guarantees: zero false
negatives (every true match survives — the follow-up join stays
correct), false-positive rate ~ ``fpp`` (stragglers are eliminated by
the real join).

Spark 4.1 does this internally for some joins (InjectRuntimeFilter),
but the aggregate (`bloom_filter_agg`) is not a public function and the
rewrite never fires across the staged pipelines this engine builds.
This implementation is pure public API:

- build: k hash positions per key (`F.hash` with per-probe seeds) ->
  explode -> ``bit_or`` of single-bit words grouped by word index.
  One small job over the KEY side only (the side you'd broadcast if it
  fit); the fact side is untouched at build time.
- carry: the dense ``array<bigint>`` bit table rides in a single-row
  DataFrame crossJoin-broadcast onto the fact (never a plan literal,
  so the plan stays cacheable and the bits ship once per executor).
- probe: per probe seed, ``element_at`` + ``shiftleft`` bit test —
  all JVM expressions inside one codegen stage, no Python, no shuffle.

Sizing: m = -n*ln(fpp)/ln(2)^2 bits, k = m/n*ln(2) probes (standard
Bloom optima). ``max_bits`` caps driver memory for the dense table
(default 2^27 bits = 16 MiB); past the cap the realized fpp degrades
smoothly and is reported in ``Bloom.effective_fpp``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.verb import verb2
from ..tibble import Tibble, ensure_tibble

__all__ = ["Bloom", "build_bloom", "bloom_semi_reduce"]

_WORD_BITS = 64
# 2^27 bits = 16 MiB of bit table: comfortable to collect and broadcast.
_DEFAULT_MAX_BITS = 1 << 27


@dataclass
class Bloom:
    """A built Bloom filter: broadcastable single-row bits frame plus
    sizing metadata. Build once per key set, apply to many facts."""

    bits_df: DataFrame  # single row, one array<bigint> column "__bloom_bits"
    m: int  # bit-table size (multiple of 64)
    k: int  # probe count
    n_items: int  # distinct keys inserted
    effective_fpp: float  # (1 - e^{-kn/m})^k with the realized m, k
    hash_type: str = "raw"  # canonical dtype the keys were hashed as

    def might_contain(self, col: Any, dtype: str | None = None) -> "F.Column":
        """Membership predicate for ``col`` against the broadcast bits
        column ``__bloom_bits`` (requires the crossJoin done by
        :func:`bloom_semi_reduce`); exposed for custom pipelines.

        ``F.hash`` is type-sensitive: hash(int 5) != hash(bigint 5),
        so a probe column whose dtype differs from the build side would
        silently drop every true match. Pass the probe column's Spark
        ``dtype`` string to canonicalize it exactly as the build side
        was; a dtype that cannot canonicalize to ``self.hash_type``
        raises rather than returning an always-false-ish predicate.
        """
        c = F.col(col) if isinstance(col, str) else col
        if dtype is not None:
            c, canon = _canonical_hash_input(c, dtype)
            if canon != self.hash_type:
                raise TypeError(
                    f"bloom probe column dtype {dtype!r} canonicalizes to "
                    f"{canon!r} but the filter was built over "
                    f"{self.hash_type!r} keys; F.hash is type-sensitive so "
                    "the probe would miss every true match. Cast one side "
                    "so both canonicalize to the same type."
                )
        elif self.hash_type != "raw":
            # dtype omitted (custom pipelines): build_bloom ALWAYS
            # canonicalizes (int->bigint, float->double), so a raw probe
            # column of a narrower physical type would silently hash
            # differently and miss every true match. Defaulting the
            # probe to the filter's own hash type keeps the
            # zero-false-negative contract without requiring dtype.
            c = c.cast(self.hash_type)
        return _probe_predicate(c, self.m, self.k)


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}


def _canonical_hash_input(c: F.Column, dtype: str) -> tuple[F.Column, str]:
    """Cast ``c`` to a canonical hash type so equal values hash equally
    across width variants (int vs bigint, float vs double, decimal
    scales). ``F.hash`` folds the physical type into the digest, so an
    int fact column probed against a bigint-built filter would lose
    every true match — canonicalizing both sides restores the
    zero-false-negative contract."""
    base = dtype.strip().lower()
    if base in _INTEGRAL_TYPES:
        return c.cast("bigint"), "bigint"
    if base in _FLOAT_TYPES:
        return c.cast("double"), "double"
    if base.startswith("decimal"):
        # decimal(38,18) holds 20 integer digits; a wider source decimal
        # would overflow the cast to NULL (non-ANSI), and the build side
        # then DROPS those keys while the probe side keeps the raw fact
        # rows — true matches silently filtered. Refuse rather than
        # break the zero-false-negative guarantee.
        prec, scale = 10, 0
        inner = base[base.find("(") + 1 : base.find(")")] if "(" in base else ""
        if inner:
            bits = [p.strip() for p in inner.split(",")]
            prec = int(bits[0])
            scale = int(bits[1]) if len(bits) > 1 else 0
        if prec - scale > 20:
            raise TypeError(
                f"bloom key dtype {dtype!r} has {prec - scale} integer "
                "digits; canonicalizing to decimal(38,18) would overflow "
                "values past 20 digits to NULL and silently drop true "
                "matches. Cast the key to a narrower decimal or to a "
                "string on BOTH sides instead."
            )
        return c.cast("decimal(38,18)"), "decimal(38,18)"
    return c, base


def _positions(col: Any, m: int, k: int) -> list[F.Column]:
    """k bit positions in [0, m) — Murmur3 with distinct probe seeds.

    ``F.hash(col, lit(seed))`` hashes the (value, seed) tuple, giving k
    independent-enough hash functions without leaving the JVM."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.pmod(F.hash(c, F.lit(seed)).cast("bigint"), F.lit(m))
        for seed in range(k)
    ]


def _probe_predicate(col: Any, m: int, k: int) -> "F.Column":
    pred = F.lit(True)
    for pos in _positions(col, m, k):
        word = F.element_at(
            F.col("__bloom_bits"), F.shiftright(pos, 6).cast("int") + F.lit(1)
        )
        mask = _shiftleft_col(F.lit(1).cast("bigint"), F.pmod(pos, 64))
        pred = pred & (word.bitwiseAND(mask) != 0)
    return pred


def _shiftleft_col(value: F.Column, amount: F.Column) -> F.Column:
    """shiftleft with a column shift amount (PySpark's F.shiftleft only
    accepts an int literal; the SQL function accepts expressions)."""
    from pyspark.sql.functions import call_function

    return call_function("shiftleft", value, amount.cast("int"))


def build_bloom(
    keys: Any,
    col: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
    max_bits: int = _DEFAULT_MAX_BITS,
) -> Bloom:
    """Build a :class:`Bloom` from the distinct non-null values of
    ``keys[col]``.

    Runs two small jobs over the KEY side only (a distinct count when
    ``expected_items`` is not given, then the bit-table aggregation);
    the collect is bounded by ``max_bits`` (16 MiB default). Null keys
    are skipped — null never equi-joins, so dropping it preserves the
    zero-false-negative guarantee for the downstream join.
    """
    kt = ensure_tibble(keys) if not isinstance(keys, DataFrame) else None
    kdf = keys if isinstance(keys, DataFrame) else kt.df
    spark = kdf.sparkSession
    key_dtype = dict(kdf.dtypes).get(col)
    if key_dtype is None:
        raise KeyError(f"build_bloom: no column {col!r} in key frame")
    canon_col, hash_type = _canonical_hash_input(F.col(col), key_dtype)
    keyed = kdf.select(canon_col.alias("__bloom_key")).where(
        F.col("__bloom_key").isNotNull()
    )

    if expected_items is None:
        n = keyed.select(F.countDistinct("__bloom_key")).collect()[0][0]
    else:
        n = int(expected_items)
    n = max(n, 1)

    m_ideal = int(math.ceil(-n * math.log(max(fpp, 1e-12)) / (math.log(2) ** 2)))
    m = min(max(m_ideal, _WORD_BITS), max_bits)
    m = ((m + _WORD_BITS - 1) // _WORD_BITS) * _WORD_BITS
    k = max(1, round(m / n * math.log(2)))
    eff = (1.0 - math.exp(-k * n / m)) ** k

    pos_arr = F.array(*_positions("__bloom_key", m, k))
    words = (
        keyed.select(F.explode(pos_arr).alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 6).cast("int").alias("__w"),
            _shiftleft_col(
                F.lit(1).cast("bigint"), F.pmod(F.col("__pos"), 64)
            ).alias("__bit"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__bit").alias("__word"))
        .collect()
    )
    dense = [0] * (m // _WORD_BITS)
    for row in words:
        dense[row["__w"]] = row["__word"]

    bits_df = spark.createDataFrame(
        [(dense,)], "__bloom_bits array<bigint>"
    )
    return Bloom(
        bits_df=bits_df, m=m, k=k, n_items=n, effective_fpp=eff,
        hash_type=hash_type,
    )


@verb2
def bloom_semi_reduce(
    td: Tibble,
    keys: Any,
    on: Any,
    fpp: float = 0.01,
    expected_items: int | None = None,
    max_bits: int = _DEFAULT_MAX_BITS,
) -> Tibble:
    """Approximate semi-join: keep only fact rows whose key *might* be
    in ``keys`` — a superset of ``semi_join`` containing every true
    match plus ~``fpp`` false positives, computed without shuffling the
    fact side.

    Use directly before a join/semi_join whose key side is too big to
    broadcast: the exchange then moves only the reduced fact. ``on`` is
    a column name shared by both sides, a ``(fact_col, key_col)`` pair,
    or a prebuilt :class:`Bloom` paired with ``fact_col`` via
    ``on=("fact_col", bloom)`` for reuse across facts.

    Rows with a null key are dropped (they cannot equi-join).
    """
    if isinstance(on, (tuple, list)):
        fact_col, key_side = on[0], on[1]
    else:
        fact_col = key_side = on

    if isinstance(key_side, Bloom):
        bloom = key_side
    else:
        bloom = build_bloom(
            keys, str(key_side), fpp=fpp,
            expected_items=expected_items, max_bits=max_bits,
        )

    fact = td.df
    fact_dtype = dict(fact.dtypes).get(fact_col)
    if fact_dtype is None:
        raise KeyError(f"bloom_semi_reduce: no column {fact_col!r} in fact")
    reduced = (
        fact.where(F.col(fact_col).isNotNull())
        .crossJoin(F.broadcast(bloom.bits_df))
        .where(bloom.might_contain(fact_col, dtype=fact_dtype))
        .drop("__bloom_bits")
    )
    return td.with_df(reduced)
