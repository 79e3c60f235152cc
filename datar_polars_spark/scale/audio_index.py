"""Persistent audio-fingerprint index: incremental audio dedup against
an on-lake store — the audio member of the index family (text MinHash:
dedup_index.py; embeddings: semantic_index.py; pixels: image_index.py;
audio spectra: this).

A crawl's audio cannot be re-fingerprinted against the whole corpus
every day any more than its text can be re-shingled: the corpus's
perceptual fingerprints (64-bit spectral hash,
multimodal.audio_fingerprint) are computed ONCE and persisted next to
the data; each incoming batch hashes only ITSELF and equi-joins the
stores.

The layout, banding (pigeonhole-EXACT recall within the build-time
Hamming budget), match semantics, NULL contract, tombstone lifecycle,
and compaction are the shared 64-bit-fingerprint engine's — see
scale/fp_index.py, which this module instantiates with the spectral
fingerprint; the image index is the same engine under the dHash.
Stores live under ``<path>/``: ``hashes/`` (id, afp), ``postings/``
(band-partitioned, fingerprint inline — v2), ``audio_index.json``.

Waveform source caveat (same as audio_fingerprint): raw-PCM WAV and
AIFF/AIFF-C decode for real — re-gained, resampled, bit-width
re-encoded, or mono-downmixed copies land within a few Hamming bits;
compressed containers (FLAC/MP3/OGG) hash a deterministic
content-keyed stub, i.e. exact-content identity only — or raise with
``strict=True``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..tibble import Tibble
from .fp_index import (
    FpFamily,
    fp_dedup_against_index,
    fp_index_append,
    fp_index_build,
    fp_index_compact,
    fp_index_delete,
    fp_index_expire,
    fp_index_stats,
    fp_match_with_base,
    load_meta,
)

__all__ = [
    "audio_index_build",
    "audio_index_append",
    "audio_index_compact",
    "audio_index_delete",
    "audio_index_expire",
    "audio_index_stats",
    "match_against_audio_index",
    "dedup_against_audio_index",
]


def _hashed_base(df, cname: str, idn: str, strict: bool):
    """(id, afp) for every row with both an id and hashable content —
    the one Arrow decode+hash pass the engine builds everything on."""
    from .multimodal import audio_fingerprint

    return (
        audio_fingerprint(
            Tibble(df.select(F.col(idn).alias("id"),
                             F.col(cname).alias("__content__"),
                             "__stamp__")),
            "__content__", out_col="afp", strict=strict,
        )
        .df.select("id", "afp", F.col("__stamp__").alias("stamp"))
        .filter(F.col("id").isNotNull() & F.col("afp").isNotNull())
    )


_FAMILY = FpFamily(
    name="audio", fp_col="afp", count_key="n_clips",
    hash_base=_hashed_base,
)


def _load_meta(spark, path: str) -> dict:
    return load_meta(_FAMILY, spark, path)


def audio_index_build(
    corpus: Any,
    content: Any,
    id_col: Any,
    path: str,
    *,
    max_hamming: int = 6,
    max_bucket: int = 10_000,
    strict: bool = False,
    mode: str = "overwrite",
    stamp: int | str = 0,
) -> None:
    """Build the persistent audio index of ``corpus`` at ``path``: one
    Arrow fingerprint pass + the banded postings write. ``max_hamming``
    is pinned in the sidecar (it fixes the band count and therefore
    the pigeonhole recall guarantee); matching may tighten it but
    never widen it without a rebuild. The default budget is wider than
    the image index's (6 vs 4): spectral bits flip a little more under
    noise than dHash bits do under brightness shifts (see
    multimodal._afp64's measurements)."""
    fp_index_build(
        _FAMILY, corpus, content, id_col, path,
        max_hamming=max_hamming, max_bucket=max_bucket,
        strict=strict, mode=mode, stamp=stamp,
    )


def audio_index_append(
    batch: Any,
    path: str,
    content: Any = None,
    id_col: Any = None,
    *,
    strict: bool = False,
    stamp: int | str = 0,
) -> None:
    """Append ``batch``'s fingerprints and postings to an existing
    index (parameters from the sidecar; columns default to the
    build-time names). Same id-dtype pinning as the sibling indexes."""
    fp_index_append(_FAMILY, batch, path, content, id_col,
                    strict=strict, stamp=stamp)


def audio_index_stats(spark, path: str, live: bool = False) -> dict:
    """Sidecar parameters plus footer-only store row counts
    (``live=True`` adds ``n_live`` — the matchable count with the
    retention watermark and tombstones applied; costs a narrow scan).
    ``n_clips``/``n_postings`` are PHYSICAL counts (footer metadata,
    no data pages); ``n_tombstones`` counts ids masked since the last
    compact — live rows are the difference."""
    return fp_index_stats(_FAMILY, spark, path, live=live)


def audio_index_delete(spark, path: str, ids: Any) -> dict:
    """Tombstone ``ids`` out of the index: every match/dedup/stream
    consumer masks them immediately; ``audio_index_compact`` folds
    them physically and clears the sidecar. Returns the post-delete
    stats. See scale/tombstones.py for the mask-until-compact
    contract (re-appending a tombstoned id requires a compact first)."""
    return fp_index_delete(_FAMILY, spark, path, ids)


def audio_index_expire(spark, path: str, before: int) -> dict:
    """Age-based retention — the TTL complement of the id-list
    tombstones: raise the index's ``expire_before`` watermark so every
    match/dedup/stream read immediately prunes rows stamped (at
    build/append time, caller-defined units — e.g. a crawl date)
    before ``before`` via a pushed-down scan predicate, and the next
    ``audio_index_compact`` drops them physically. Monotonic, survives
    compaction; no id list or join anywhere — expiry is one sidecar
    write. Same semantics across the sibling indexes."""
    return fp_index_expire(_FAMILY, spark, path, before)


def match_against_audio_index(
    batch: Any,
    path: str,
    content: Any = None,
    id_col: Any = None,
    *,
    max_hamming: int | None = None,
    max_bucket: int = 10_000,
    strict: bool = False,
    min_stamp: int | None = None,
) -> Tibble:
    """All (batch clip, indexed clip) pairs within the Hamming budget:
    columns (id_a, id_b, hamming), id_a from ``batch``.

    Byte-identical fingerprints come from one narrow 8-byte hash
    equi-join (hamming 0, every replica resolved there); near-dup
    candidates band ONE representative per distinct batch fingerprint
    against ``postings/`` (pigeonhole-exact within the build budget)
    and fan back out, verified JVM-side with ``bit_count(a ^ b)``.
    ``max_hamming`` may tighten the build-time budget, never widen it
    (the band layout only guarantees recall up to the build's)."""
    pairs, _base = fp_match_with_base(
        _FAMILY, batch, path, content, id_col,
        max_hamming=max_hamming, max_bucket=max_bucket, strict=strict,
        min_stamp=min_stamp,
    )
    return pairs


def dedup_against_audio_index(
    batch: Any,
    path: str,
    content: Any = None,
    id_col: Any = None,
    *,
    max_hamming: int | None = None,
    max_bucket: int = 10_000,
    strict: bool = False,
    append: bool = False,
    min_stamp: int | None = None,
    stamp: int | str = 0,
) -> Tibble:
    """Drop every ``batch`` row whose audio matches an indexed clip
    within the Hamming budget; return survivors with their original
    columns. ``append=True`` admits the survivors into the index
    (materialized first — the family's read-after-append contract)."""
    return fp_dedup_against_index(
        _FAMILY, batch, path, content, id_col,
        max_hamming=max_hamming, max_bucket=max_bucket,
        strict=strict, append=append, min_stamp=min_stamp, stamp=stamp,
    )


def audio_index_compact(spark, path: str) -> dict:
    """Rewrite accumulated per-append file sets into one compact
    range-clustered layout, folding byte-duplicate rows, tombstoned
    ids (see audio_index_delete), and re-applying the bucket cap
    ACROSS increments — same lifecycle, swap discipline, and drop
    accounting as the sibling indexes' compacts."""
    return fp_index_compact(_FAMILY, spark, path)
