"""Persistent video-fingerprint index: incremental video dedup against
an on-lake store — the video member of the index family (text MinHash:
dedup_index.py; embeddings: semantic_index.py; pixels: image_index.py;
audio spectra: audio_index.py; video: this).

A crawl's video cannot be re-fingerprinted against the whole corpus
every day any more than its text can be re-shingled: the corpus's
perceptual fingerprints (64-bit temporal-median dHash,
multimodal.video_fingerprint) are computed ONCE and persisted next to
the data; each incoming batch hashes only ITSELF and equi-joins the
stores.

The layout, banding (pigeonhole-EXACT recall within the build-time
Hamming budget), match semantics, NULL contract, tombstone lifecycle,
and compaction are the shared 64-bit-fingerprint engine's — see
scale/fp_index.py, which this module instantiates with the video
fingerprint; the image and audio indexes are the same engine under
their hashes. Stores live under ``<path>/``: ``hashes/`` (id, vfp),
``postings/`` (band-partitioned, fingerprint inline — v2),
``video_index.json``.

Frame source caveat (same as video_fingerprint): MJPEG RIFF AVI
decodes for real — JPEG-quality/chroma re-encodes and (on temporally
correlated footage) boundary trims land within a few Hamming bits;
other containers (MP4/WebM/MKV) hash a deterministic content-keyed
stub, i.e. exact-content identity only — or raise with
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
    "video_index_build",
    "video_index_append",
    "video_index_compact",
    "video_index_delete",
    "video_index_expire",
    "video_index_stats",
    "match_against_video_index",
    "dedup_against_video_index",
]


def _hashed_base(df, cname: str, idn: str, strict: bool):
    """(id, vfp) for every row with both an id and hashable content —
    the one Arrow decode+hash pass the engine builds everything on."""
    from .multimodal import video_fingerprint

    return (
        video_fingerprint(
            Tibble(df.select(F.col(idn).alias("id"),
                             F.col(cname).alias("__content__"),
                             "__stamp__")),
            "__content__", out_col="vfp", strict=strict,
        )
        .df.select("id", "vfp", F.col("__stamp__").alias("stamp"))
        .filter(F.col("id").isNotNull() & F.col("vfp").isNotNull())
    )


_FAMILY = FpFamily(
    name="video", fp_col="vfp", count_key="n_videos",
    hash_base=_hashed_base,
)


def _load_meta(spark, path: str) -> dict:
    return load_meta(_FAMILY, spark, path)


def video_index_build(
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
    """Build the persistent video index of ``corpus`` at ``path``: one
    Arrow fingerprint pass + the banded postings write. ``max_hamming``
    is pinned in the sidecar (it fixes the band count and therefore
    the pigeonhole recall guarantee); matching may tighten it but
    never widen it without a rebuild. The default budget matches the
    audio index's (6): the temporal median stays within ~1 bit on
    correlated footage but JPEG re-quantization of noisy frames can
    flip up to ~7 (see multimodal._vfp64's measurements)."""
    fp_index_build(
        _FAMILY, corpus, content, id_col, path,
        max_hamming=max_hamming, max_bucket=max_bucket,
        strict=strict, mode=mode, stamp=stamp,
    )


def video_index_append(
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


def video_index_stats(spark, path: str, live: bool = False) -> dict:
    """Sidecar parameters plus footer-only store row counts
    (``live=True`` adds ``n_live`` — the matchable count with the
    retention watermark and tombstones applied; costs a narrow scan).
    ``n_videos``/``n_postings`` are PHYSICAL counts (footer metadata,
    no data pages); ``n_tombstones`` counts ids masked since the last
    compact — live rows are the difference."""
    return fp_index_stats(_FAMILY, spark, path, live=live)


def video_index_delete(spark, path: str, ids: Any) -> dict:
    """Tombstone ``ids`` out of the index: every match/dedup/stream
    consumer masks them immediately; ``video_index_compact`` folds
    them physically and clears the sidecar. Returns the post-delete
    stats. See scale/tombstones.py for the mask-until-compact
    contract (re-appending a tombstoned id requires a compact first)."""
    return fp_index_delete(_FAMILY, spark, path, ids)


def video_index_expire(spark, path: str, before: int) -> dict:
    """Age-based retention — the TTL complement of the id-list
    tombstones: raise the index's ``expire_before`` watermark so every
    match/dedup/stream read immediately prunes rows stamped (at
    build/append time, caller-defined units — e.g. a crawl date)
    before ``before`` via a pushed-down scan predicate, and the next
    ``video_index_compact`` drops them physically. Monotonic, survives
    compaction; no id list or join anywhere — expiry is one sidecar
    write. Same semantics across the sibling indexes."""
    return fp_index_expire(_FAMILY, spark, path, before)


def match_against_video_index(
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
    """All (batch video, indexed video) pairs within the Hamming
    budget: columns (id_a, id_b, hamming), id_a from ``batch``.

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


def dedup_against_video_index(
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
    """Drop every ``batch`` row whose video matches an indexed clip
    within the Hamming budget; return survivors with their original
    columns. ``append=True`` admits the survivors into the index
    (materialized first — the family's read-after-append contract)."""
    return fp_dedup_against_index(
        _FAMILY, batch, path, content, id_col,
        max_hamming=max_hamming, max_bucket=max_bucket,
        strict=strict, append=append, min_stamp=min_stamp, stamp=stamp,
    )


def video_index_compact(spark, path: str) -> dict:
    """Rewrite accumulated per-append file sets into one compact
    range-clustered layout, folding byte-duplicate rows, tombstoned
    ids (see video_index_delete), and re-applying the bucket cap
    ACROSS increments — same lifecycle, swap discipline, and drop
    accounting as the sibling indexes' compacts."""
    return fp_index_compact(_FAMILY, spark, path)
