"""Persistent image-fingerprint index: incremental image dedup against
an on-lake store — the image member of the index family (text MinHash:
dedup_index.py; embeddings: semantic_index.py; pixels: this).

A recrawl's images cannot be re-hashed against the whole corpus every
day any more than its text can be re-shingled: the corpus's perceptual
fingerprints (64-bit dHash, multimodal.image_dhash) are computed ONCE
and persisted next to the data; each incoming batch hashes only ITSELF
and equi-joins the stores.

Layout under ``<path>/`` (parquet + JSON sidecar, same conventions as
the sibling indexes):

- ``hashes/``: (id, dhash) — one 16-byte row per indexed image.
- ``postings/`` (partitioned by ``band``): (band, bval, id) — the
  fingerprint split into ``max_hamming + 1`` disjoint bit bands. By
  pigeonhole, any pair within the build-time Hamming budget agrees
  EXACTLY on at least one band, so candidate generation is a keyed
  equi-join with EXACT recall (no probabilistic layer at all — unlike
  MinHash/hyperplane LSH, the banding here loses nothing within the
  budget). Bands are pinned at build time: matching with a larger
  ``max_hamming`` than the build's would silently lose the pigeonhole
  guarantee, so it is rejected.
- ``image_index.json``: the parameter sidecar.

Match semantics: all (batch image, indexed image) pairs with Hamming
distance <= the budget, byte-identical fingerprints via one narrow
hash equi-join (hamming 0) and near-dups via the banded join —
candidates generate from ONE representative per distinct fingerprint
(a replica-heavy batch pays distinct-fingerprint cost) and fan back
out. NULL-content and NULL-id batch rows never match and always
survive dedup (the family's NULL contract).

Pixel source caveat (same as image_dhash): PNG/BMP rasters decode for
real, baseline JPEG decodes to its DC (1/8-scale luma) thumbnail —
all three get the real perceptual property; other containers hash a
deterministic content-keyed stub raster, i.e. exact-content identity
only — or raise with ``strict=True``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..tibble import Tibble, ensure_tibble
from .dedup import _cap_buckets, _DROPPED_PAIRS, _ensure_parallelism, _name_of
from .jsonio import read_json_file, replace_dir, write_json_file
from .tombstones import (
    append_tombstones,
    delete_dir,
    mask_tombstones,
    tombstones_df,
)

__all__ = [
    "image_index_build",
    "image_index_append",
    "image_index_compact",
    "image_index_delete",
    "image_index_stats",
    "match_against_image_index",
    "dedup_against_image_index",
]

_FORMAT = "image-index"

# a hashed batch row is 16 bytes (8-byte id-ish key + 8-byte
# fingerprint): 4M rows broadcast as a ~64 MB hash relation — cheap on
# any executor profile, and far past the point where a recrawl batch
# stops being "small" relative to the corpus store it matches against
_BROADCAST_BATCH_ROWS = 4_000_000


def _band_cols(dh, n_bands: int):
    """The fingerprint's ``n_bands`` disjoint bit bands as (band, bval)
    structs — pure JVM shifts/masks, shared with image_near_dup_pairs.

    A full-width band (n_bands=1, i.e. max_hamming=0) keeps the raw
    hash as its value: the 64-bit mask (1<<64)-1 overflows a signed
    long and py4j's F.lit would raise NumberFormatException, and no
    mask is needed when the band IS the whole fingerprint."""
    out = []
    for i in range(n_bands):
        lo = (i * 64) // n_bands
        hi = ((i + 1) * 64) // n_bands
        width = hi - lo
        shifted = F.shiftrightunsigned(dh, lo)
        bval = (
            shifted if width >= 64
            else shifted.bitwiseAND(F.lit((1 << width) - 1))
        )
        out.append(
            F.struct(F.lit(i).alias("band"), bval.alias("bval"))
        )
    return out


def _hashed_base(df, cname: str, idn: str, strict: bool, probe_par: bool):
    """(id, dhash) for every row with both an id and hashable content."""
    from .multimodal import image_dhash

    base = (
        image_dhash(
            Tibble(df.select(F.col(idn).alias("id"),
                             F.col(cname).alias("__content__"))),
            "__content__", out_col="dhash", strict=strict,
        )
        .df.select("id", "dhash")
        .filter(F.col("id").isNotNull() & F.col("dhash").isNotNull())
    )
    return _ensure_parallelism(base) if probe_par else base


def _index_frames(base, meta: dict, op: str):
    """(hashes, postings) store frames — shared by build and append.

    Postings carry the FULL fingerprint next to each band value (v2
    layout, +8 bytes/row over the text/semantic siblings' narrow
    postings): the fingerprint is only 8 bytes — unlike a MinHash
    signature or an embedding — so candidate VERIFICATION
    (bit_count(a ^ b)) happens inline on the posting join's output and
    the fuzzy leg never needs a second corpus-scale join back to
    ``hashes/``. One store scan per match instead of two."""
    postings = _cap_buckets(
        base.select(
            "id", "dhash",
            F.explode(F.array(*_band_cols(F.col("dhash"),
                                          meta["bands"]))).alias("b"),
        ).select(F.col("b.band").alias("band"),
                 F.col("b.bval").alias("bval"), "id", "dhash"),
        ["band", "bval"], meta["max_bucket"], op=op,
    )
    return base, postings


def _write_frames(path: str, hashes, postings, mode: str) -> None:
    # range-cluster postings before the partitioned write — same
    # small-files discipline as the sibling indexes
    postings = postings.repartitionByRange(
        F.col("band"), F.col("bval")
    ).sortWithinPartitions("band", "bval")
    hashes.write.mode(mode).parquet(f"{path}/hashes")
    postings.write.mode(mode).partitionBy("band").parquet(f"{path}/postings")


def image_index_build(
    corpus: Any,
    content: Any,
    id_col: Any,
    path: str,
    *,
    max_hamming: int = 4,
    max_bucket: int = 10_000,
    strict: bool = False,
    mode: str = "overwrite",
) -> None:
    """Build the persistent image index of ``corpus`` at ``path``: one
    Arrow dHash pass + the banded postings write. ``max_hamming`` is
    pinned in the sidecar (it fixes the band count and therefore the
    pigeonhole recall guarantee); matching may tighten it but never
    widen it without a rebuild."""
    if max_hamming < 0:
        raise ValueError(
            f"image_index_build: max_hamming must be >= 0, got {max_hamming}"
        )
    _DROPPED_PAIRS["image_index_build"] = []
    td = ensure_tibble(corpus)
    cname, idn = _name_of(content), _name_of(id_col)
    meta = {
        "format": _FORMAT,
        "version": 2,  # v2: postings carry the fingerprint inline
        "max_hamming": max_hamming,
        "bands": max_hamming + 1,
        "max_bucket": max_bucket,
        "content_col": cname,
        "id_col": idn,
        "id_type": td.df.schema[idn].dataType.simpleString(),
    }
    base = _hashed_base(td.df.select(*td.columns), cname, idn, strict, True)
    hashes, postings = _index_frames(base, meta, "image_index_build")
    _write_frames(path, hashes, postings, mode)
    write_json_file(td.df.sparkSession, f"{path}/image_index.json", meta)


def _load_meta(spark, path: str) -> dict:
    meta = read_json_file(spark, f"{path}/image_index.json")
    if not (isinstance(meta, dict) and meta.get("format") == _FORMAT):
        raise ValueError(
            f"{path}/image_index.json is not an image_index_build sidecar"
        )
    if meta.get("version") != 2:
        # an explicit-schema read of v1 postings (no dhash column)
        # would yield NULL fingerprints and silently wrong hammings —
        # refuse loudly instead
        raise ValueError(
            f"image index at {path} is layout version "
            f"{meta.get('version')}; this build reads version 2 "
            f"(postings carry the fingerprint inline) — rebuild with "
            f"image_index_build"
        )
    return meta


def image_index_append(
    batch: Any,
    path: str,
    content: Any = None,
    id_col: Any = None,
    *,
    strict: bool = False,
) -> None:
    """Append ``batch``'s fingerprints and postings to an existing
    index (parameters from the sidecar; columns default to the
    build-time names). Same id-dtype pinning as the sibling indexes."""
    _DROPPED_PAIRS["image_index_append"] = []
    td = ensure_tibble(batch)
    meta = _load_meta(td.df.sparkSession, path)
    cname = _name_of(content) if content is not None else meta["content_col"]
    idn = _name_of(id_col) if id_col is not None else meta["id_col"]
    got_t = td.df.schema[idn].dataType.simpleString()
    if got_t != meta["id_type"]:
        raise ValueError(
            f"image_index_append: id column {idn!r} is {got_t}, but the "
            f"index at {path} was built with id_type={meta['id_type']!r}; "
            f"cast the batch id first"
        )
    base = _hashed_base(td.df.select(*td.columns), cname, idn, strict, False)
    hashes, postings = _index_frames(base, meta, "image_index_append")
    _write_frames(path, hashes, postings, "append")


def image_index_stats(spark, path: str) -> dict:
    """Sidecar parameters plus footer-only store row counts.
    ``n_images``/``n_postings`` are PHYSICAL counts (footer metadata,
    no data pages); ``n_tombstones`` counts ids masked since the last
    compact — live rows are the difference."""
    meta = _load_meta(spark, path)
    idt = meta["id_type"]
    out = dict(meta)
    out["n_images"] = (
        spark.read.schema(f"id {idt}, dhash bigint")
        .parquet(f"{path}/hashes").count()
    )
    out["n_postings"] = (
        spark.read.schema(f"bval bigint, id {idt}, dhash bigint, band int")
        .parquet(f"{path}/postings").count()
    )
    tombs = tombstones_df(spark, path, idt)
    out["n_tombstones"] = 0 if tombs is None else tombs.count()
    return out


def image_index_delete(spark, path: str, ids: Any) -> dict:
    """Tombstone ``ids`` out of the index: every match/dedup/stream
    consumer masks them immediately; ``image_index_compact`` folds
    them physically and clears the sidecar. Returns the post-delete
    stats. See scale/tombstones.py for the mask-until-compact
    contract (re-appending a tombstoned id requires a compact first)."""
    meta = _load_meta(spark, path)
    append_tombstones(spark, path, ids, meta["id_type"])
    return image_index_stats(spark, path)


def match_against_image_index(
    batch: Any,
    path: str,
    content: Any = None,
    id_col: Any = None,
    *,
    max_hamming: int | None = None,
    max_bucket: int = 10_000,
    strict: bool = False,
) -> Tibble:
    """All (batch image, indexed image) pairs within the Hamming
    budget: columns (id_a, id_b, hamming), id_a from ``batch``.

    Byte-identical fingerprints come from one narrow 8-byte hash
    equi-join (hamming 0, every replica resolved there); near-dup
    candidates band ONE representative per distinct batch fingerprint
    against ``postings/`` (pigeonhole-exact within the build budget)
    and fan back out, verified JVM-side with ``bit_count(a ^ b)``.
    ``max_hamming`` may tighten the build-time budget, never widen it
    (the band layout only guarantees recall up to the build's)."""
    pairs, _base = _match_with_base(
        batch, path, content, id_col,
        max_hamming=max_hamming, max_bucket=max_bucket, strict=strict,
    )
    return pairs


def _match_with_base(
    batch: Any,
    path: str,
    content: Any = None,
    id_col: Any = None,
    *,
    max_hamming: int | None = None,
    max_bucket: int = 10_000,
    strict: bool = False,
) -> tuple[Tibble, Any]:
    """match_against_image_index plus the persisted hashed-batch frame,
    so callers that MATERIALIZE the result (dedup's append path) can
    release the persist deterministically via unregister_internal_cache
    instead of waiting on FIFO eviction."""
    _DROPPED_PAIRS["match_against_image_index"] = []
    td = ensure_tibble(batch)
    spark = td.df.sparkSession
    meta = _load_meta(spark, path)
    budget = meta["max_hamming"] if max_hamming is None else int(max_hamming)
    if budget > meta["max_hamming"]:
        raise ValueError(
            f"match_against_image_index: max_hamming={budget} exceeds the "
            f"build-time budget {meta['max_hamming']} — the banded layout "
            f"only guarantees recall up to the build's; rebuild with a "
            f"larger budget"
        )
    if budget < 0:
        raise ValueError("match_against_image_index: max_hamming must be >= 0")
    cname = _name_of(content) if content is not None else meta["content_col"]
    idn = _name_of(id_col) if id_col is not None else meta["id_col"]
    idt = meta["id_type"]
    from ..plans.cache import register_internal_cache

    # the Arrow decode+hash pass is the expensive part of a match, and
    # the hashed batch feeds THREE consumers (exact leg, distinct-
    # fingerprint reps, fuzzy fan-out) — persist it so the batch is
    # hashed once, not once per consumer (plan-audited: 3 ArrowEval
    # passes without this). The count() both materializes the persist
    # and gives the EXACT batch cardinality for the broadcast decision
    # below — runtime truth, not an estimate.
    base = register_internal_cache(
        _hashed_base(td.df.select(*td.columns), cname, idn, strict, True)
        .select(F.col("id").alias("id_a"), F.col("dhash").alias("dh_a"))
        .persist()
    )
    n_batch = base.count()
    # a hashed batch row is 16 bytes; below the bound, PIN the batch
    # side broadcast so the corpus-scale stores NEVER shuffle for a
    # small batch (the r5 finding: AQE does not reliably demote a
    # planned sort-merge join to broadcast at runtime)
    small = n_batch <= _BROADCAST_BATCH_ROWS

    def _pin(df):
        return F.broadcast(df) if small else df

    tombs = tombstones_df(spark, path, idt)
    store = mask_tombstones(
        spark.read.schema(f"id {idt}, dhash bigint")
        .parquet(f"{path}/hashes"),
        tombs,
    ).select(F.col("id").alias("id_b"), F.col("dhash").alias("dh_b"))
    exact = (
        _pin(base).join(store, base["dh_a"] == store["dh_b"])
        .select("id_a", "id_b", F.lit(0).alias("hamming"))
    )
    if budget == 0:
        return Tibble(exact), base
    # distinct-fingerprint candidate generation (the fingerprint is 8
    # bytes, so banding every distinct one is cheap even when replicas
    # dominate); identical pairs are the exact leg's — excluded here
    reps = base.select(F.col("dh_a").alias("dh")).dropDuplicates()
    banded = _cap_buckets(
        reps.select(
            "dh", F.explode(F.array(*_band_cols(F.col("dh"),
                                                meta["bands"]))).alias("b")
        ).select("dh", F.col("b.band").alias("band"),
                 F.col("b.bval").alias("bval")),
        ["band", "bval"], max_bucket, op="match_against_image_index",
    )
    # v2 postings carry the fingerprint inline, so the Hamming verify
    # runs ON the posting join's output — the fuzzy leg touches ONE
    # corpus-scale store (postings), not two (the old join-back to
    # hashes/ is gone)
    postings = mask_tombstones(
        spark.read.schema(f"bval bigint, id {idt}, dhash bigint, band int")
        .parquet(f"{path}/postings"),
        tombs,
    ).select("band", "bval", F.col("id").alias("id_b"),
             F.col("dhash").alias("dh_b"))
    fuzzy = (
        _pin(banded).join(postings, on=["band", "bval"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("dh").bitwiseXOR(F.col("dh_b"))).cast("int"),
        )
        .filter((F.col("hamming") > 0) & (F.col("hamming") <= budget))
        # band-collision dedupe keys include the STORED hash: an id
        # appended under two different fingerprints legitimately
        # matches once per fingerprint (hamming is a pure function of
        # (dh, dh_b), so this is exactly one row per true pair)
        .select("dh", "id_b", "dh_b", "hamming")
        .dropDuplicates(["dh", "id_b", "dh_b"])
        .join(_pin(base), base["dh_a"] == F.col("dh"))
        .select("id_a", "id_b", "hamming")
    )
    return Tibble(exact.unionByName(fuzzy)), base


def dedup_against_image_index(
    batch: Any,
    path: str,
    content: Any = None,
    id_col: Any = None,
    *,
    max_hamming: int | None = None,
    max_bucket: int = 10_000,
    strict: bool = False,
    append: bool = False,
) -> Tibble:
    """Drop every ``batch`` row whose image matches an indexed image
    within the Hamming budget; return survivors with their original
    columns. ``append=True`` admits the survivors into the index
    (materialized first — the family's read-after-append contract)."""
    td = ensure_tibble(batch)
    hits, hashed_batch = _match_with_base(
        td, path, content, id_col,
        max_hamming=max_hamming, max_bucket=max_bucket, strict=strict,
    )
    meta = _load_meta(td.df.sparkSession, path)
    idn = _name_of(id_col) if id_col is not None else meta["id_col"]
    surv = td.df.select(*td.columns).join(
        hits.df.select(F.col("id_a").alias(idn)).dropDuplicates(),
        on=idn, how="left_anti",
    )
    if append:
        surv = surv.localCheckpoint(eager=True)
        # the eager checkpoint just consumed the match plan in full —
        # the persisted hashed batch has no remaining consumer, so
        # release it now instead of waiting on FIFO eviction
        from ..plans.cache import unregister_internal_cache

        unregister_internal_cache(hashed_batch)
    out = Tibble(surv, groups=td.group_vars, levels=td.levels)
    if append:
        cname = (
            _name_of(content) if content is not None
            else meta["content_col"]
        )
        image_index_append(out, path, cname, idn, strict=strict)
    return out


def image_index_compact(spark, path: str) -> dict:
    """Rewrite accumulated per-append file sets into one compact
    range-clustered layout, folding byte-duplicate rows, tombstoned
    ids (see image_index_delete), and re-applying the bucket cap
    ACROSS increments — same lifecycle, swap discipline, and drop
    accounting as dedup_index_compact/semantic_index_compact."""
    from .dedup import dropped_pairs_estimate

    meta = _load_meta(spark, path)
    _DROPPED_PAIRS["image_index_compact"] = []
    idt = meta["id_type"]
    tombs = tombstones_df(spark, path, idt)
    hashes = mask_tombstones(
        spark.read.schema(f"id {idt}, dhash bigint")
        .parquet(f"{path}/hashes"),
        tombs,
    ).dropDuplicates(["id", "dhash"])
    postings = _cap_buckets(
        mask_tombstones(
            spark.read.schema(
                f"bval bigint, id {idt}, dhash bigint, band int"
            )
            .parquet(f"{path}/postings"),
            tombs,
        )
        .select("band", "bval", "id", "dhash")
        .dropDuplicates(["band", "bval", "id", "dhash"]),
        ["band", "bval"], meta["max_bucket"],
        op="image_index_compact",
    ).repartitionByRange(
        F.col("band"), F.col("bval")
    ).sortWithinPartitions("band", "bval")
    hashes.write.mode("overwrite").parquet(f"{path}/hashes__compact")
    postings.write.mode("overwrite").partitionBy("band").parquet(
        f"{path}/postings__compact"
    )
    dropped = dropped_pairs_estimate("image_index_compact")
    _DROPPED_PAIRS["image_index_compact"] = [
        spark.createDataFrame([(float(dropped),)], "dropped double")
    ]
    replace_dir(spark, f"{path}/hashes__compact", f"{path}/hashes")
    replace_dir(spark, f"{path}/postings__compact", f"{path}/postings")
    # the rewritten stores no longer hold the dead ids: clear the
    # sidecar (LAST — a crash before this line leaves tombstones
    # harmlessly masking already-absent ids)
    if tombs is not None:
        delete_dir(spark, f"{path}/tombstones")
    out = image_index_stats(spark, path)
    out["dropped_pairs"] = dropped
    return out
