"""Age-based retention for the fingerprint-index family (r14):
build/append-time ``stamp`` (whole-increment int or per-row column),
match-time ``min_stamp`` pruning, the monotonic ``expire_before``
sidecar watermark (``*_index_expire``), physical fold at compact with
latest-stamp-wins refresh semantics, the dead-on-arrival append guard,
and the streaming consumers honoring the watermark. Exercised deep on
the image family; stamp/expire parity spot-checked on audio and video
(the engine is shared — scale/fp_index.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datar_polars_spark import Tibble
from datar_polars_spark.scale import (
    audio_index_build,
    audio_index_expire,
    dedup_against_image_index,
    image_index_append,
    image_index_build,
    image_index_compact,
    image_index_delete,
    image_index_expire,
    image_index_stats,
    match_against_audio_index,
    match_against_image_index,
    match_against_video_index,
    video_index_build,
    video_index_expire,
)
from datar_polars_spark.scale.codecs import (
    make_avi_mjpeg,
    make_jpeg_pixels,
    make_png_pixels,
    make_wav_pcm,
)


def _img(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return make_png_pixels(rng.integers(0, 250, (16, 24, 3), dtype=np.uint8))


def _td(spark, rows):
    return Tibble(
        spark.createDataFrame(list(rows), "doc_id long, content binary")
    )


@pytest.fixture()
def stamped(spark, tmp_path):
    """Index with two stamped increments: ids 0..4 at crawl day 10,
    ids 5..9 appended at day 20 (distinct images per id)."""
    p = str(tmp_path / "idx")
    image_index_build(
        _td(spark, [(i, _img(i)) for i in range(5)]),
        "content", "doc_id", p, strict=True, stamp=10,
    )
    image_index_append(
        _td(spark, [(i, _img(i)) for i in range(5, 10)]),
        p, strict=True, stamp=20,
    )
    batch = _td(spark, [(100 + i, _img(i)) for i in range(10)])
    return p, batch


def _matched(batch, p, **kw):
    return sorted(
        r.id_b
        for r in match_against_image_index(batch, p, strict=True, **kw)
        .df.collect()
    )


def test_min_stamp_prunes_without_sidecar_change(spark, stamped):
    p, batch = stamped
    assert _matched(batch, p) == list(range(10))
    assert _matched(batch, p, min_stamp=15) == [5, 6, 7, 8, 9]
    # min_stamp is per-call: the index itself is untouched
    assert _matched(batch, p) == list(range(10))
    assert image_index_stats(spark, p)["expire_before"] == 0


def test_expire_watermark_applies_everywhere_and_is_monotonic(
    spark, stamped
):
    p, batch = stamped
    st = image_index_expire(spark, p, 15)
    assert st["expire_before"] == 15
    assert _matched(batch, p) == [5, 6, 7, 8, 9]
    surv = sorted(
        r.doc_id
        for r in dedup_against_image_index(batch, p, strict=True)
        .df.collect()
    )
    # ids 100..104 match only expired rows -> they survive dedup
    assert surv == [100, 101, 102, 103, 104]
    # lowering the watermark is a no-op (monotonic)
    assert image_index_expire(spark, p, 5)["expire_before"] == 15
    # a stricter per-call min_stamp still composes on top
    assert _matched(batch, p, min_stamp=25) == []


def test_compact_folds_expired_and_keeps_watermark(spark, stamped):
    p, batch = stamped
    image_index_expire(spark, p, 15)
    assert image_index_stats(spark, p)["n_images"] == 10  # masked only
    st = image_index_compact(spark, p)
    assert st["n_images"] == 5  # physically gone
    assert st["expire_before"] == 15  # watermark survives compaction
    assert _matched(batch, p) == [5, 6, 7, 8, 9]


def test_stale_append_rejected_dead_on_arrival(spark, stamped):
    p, _ = stamped
    image_index_expire(spark, p, 15)
    with pytest.raises(ValueError, match="dead on arrival"):
        image_index_append(
            _td(spark, [(50, _img(50))]), p, strict=True, stamp=10
        )
    # at the watermark is fine
    image_index_append(
        _td(spark, [(50, _img(50))]), p, strict=True, stamp=15
    )


def test_compact_refresh_latest_stamp_wins(spark, tmp_path):
    """Re-appending an identical (id, fingerprint) row at a later
    stamp REFRESHES its retention: after compact folds the duplicate,
    the surviving row carries the newer stamp."""
    p = str(tmp_path / "idx")
    image_index_build(
        _td(spark, [(1, _img(1))]), "content", "doc_id", p,
        strict=True, stamp=10,
    )
    image_index_append(
        _td(spark, [(1, _img(1))]), p, strict=True, stamp=30
    )
    image_index_compact(spark, p)
    assert image_index_stats(spark, p)["n_images"] == 1
    image_index_expire(spark, p, 20)
    batch = _td(spark, [(100, _img(1))])
    assert _matched(batch, p) == [1]  # refreshed past the cutoff


def test_per_row_stamp_column(spark, tmp_path):
    p = str(tmp_path / "idx")
    d = Tibble(
        spark.createDataFrame(
            [(i, _img(i), i * 10) for i in range(5)],
            "doc_id long, content binary, crawl_day long",
        )
    )
    image_index_build(
        d, "content", "doc_id", p, strict=True, stamp="crawl_day"
    )
    image_index_expire(spark, p, 25)
    batch = _td(spark, [(100 + i, _img(i)) for i in range(5)])
    assert _matched(batch, p) == [3, 4]
    with pytest.raises(ValueError, match="stamp column"):
        image_index_build(
            d, "content", "doc_id", str(tmp_path / "idx2"),
            strict=True, stamp="no_such_col",
        )


def test_legacy_index_without_stamps_errors_clearly(spark, stamped):
    """An index whose sidecar predates the stamps flag must refuse
    retention ops loudly (its files have no stamp column to compare)
    but keep matching exactly as before."""
    import json
    import os

    p, batch = stamped
    # rewrite the sidecar without the stamps flag (simulates r13 files)
    side = os.path.join(p, "image_index.json")
    meta = json.loads(open(side).read())
    meta.pop("stamps")
    meta.pop("expire_before")
    open(side, "w").write(json.dumps(meta))
    crc = os.path.join(p, ".image_index.json.crc")
    if os.path.exists(crc):  # direct rewrite invalidates the Hadoop CRC
        os.remove(crc)
    assert _matched(batch, p) == list(range(10))
    with pytest.raises(ValueError, match="predates retention stamps"):
        match_against_image_index(batch, p, strict=True, min_stamp=15)
    with pytest.raises(ValueError, match="predates retention stamps"):
        image_index_expire(spark, p, 15)


def test_expire_composes_with_tombstones(spark, stamped):
    p, batch = stamped
    image_index_expire(spark, p, 15)  # kills 0..4
    image_index_delete(
        spark, p,
        _td(spark, [(9, None)]).df.select("doc_id"),
    )  # tombstones 9
    assert _matched(batch, p) == [5, 6, 7, 8]
    image_index_compact(spark, p)
    assert image_index_stats(spark, p)["n_images"] == 4
    assert _matched(batch, p) == [5, 6, 7, 8]


def _wav(seed: int) -> bytes:
    sr = 8000
    t = np.arange(sr // 2) / sr
    rng = np.random.default_rng(seed)
    freqs = rng.choice([220, 440, 660, 880, 1320, 1760], 3, replace=False)
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs) / 3.2
    return make_wav_pcm(x, sr)


def _avi(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    base = rng.integers(32, 224, (16, 24, 3)).astype(np.int16)
    frames = []
    for _ in range(4):
        base = np.clip(base + rng.integers(-8, 9, (16, 24, 3)), 0, 255)
        frames.append(
            np.repeat(np.repeat(base.astype(np.uint8), 4, 0), 4, 1)
        )
    return make_avi_mjpeg(
        [make_jpeg_pixels(f, quality=85) for f in frames], fps=10
    )


def test_audio_and_video_retention_parity(spark, tmp_path):
    """The engine is shared; one stamped expire round per sibling
    family locks the wrappers' threading of stamp/min_stamp/expire."""
    pa = str(tmp_path / "aidx")
    audio_index_build(
        _td(spark, [(1, _wav(1)), (2, _wav(2))]),
        "content", "doc_id", pa, strict=True, stamp=10,
    )
    audio_index_expire(spark, pa, 11)
    batch = _td(spark, [(100, _wav(1))])
    assert (
        match_against_audio_index(batch, pa, strict=True).df.count() == 0
    )

    pv = str(tmp_path / "vidx")
    video_index_build(
        _td(spark, [(1, _avi(1)), (2, _avi(2))]),
        "content", "doc_id", pv, strict=True, stamp=10,
    )
    batch = _td(spark, [(100, _avi(2))])
    assert sorted(
        r.id_b
        for r in match_against_video_index(
            batch, pv, strict=True, min_stamp=10
        ).df.collect()
    ) == [2]
    video_index_expire(spark, pv, 11)
    assert (
        match_against_video_index(batch, pv, strict=True).df.count() == 0
    )


def test_stream_consumer_honors_watermark(spark, tmp_path, stamped):
    """stream_image_dedup (matches + filter modes) prunes expired
    store rows exactly like the batch matchers."""
    from datar_polars_spark.streaming import stream_image_dedup

    p, _ = stamped
    image_index_expire(spark, p, 15)

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(100 + i, bytearray(_img(i))) for i in range(10)],
        "doc_id long, content binary",
    ).write.parquet(src)
    sdf = spark.readStream.schema("doc_id long, content binary").parquet(src)

    out = stream_image_dedup(sdf, p, "content", "doc_id", mode="matches")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r.match_id for r in spark.read.parquet(sink).collect()
    )
    assert got == [5, 6, 7, 8, 9], got

    out = stream_image_dedup(sdf, p, "content", "doc_id", mode="filter")
    sink2 = str(tmp_path / "sink2")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    clean = sorted(
        r.doc_id for r in spark.read.parquet(sink2).collect()
    )
    # batch ids 100..104 hit only EXPIRED rows -> clean; 105..109 dirty
    assert clean == [100, 101, 102, 103, 104], clean


def test_dedup_index_retention_lifecycle(spark, tmp_path):
    """Text index: class-level stamps (max over members), min_stamp,
    expire watermark, physical fold at compact, DOA append guard."""
    from datar_polars_spark.scale import (
        dedup_against_index,
        dedup_index_append,
        dedup_index_build,
        dedup_index_compact,
        dedup_index_expire,
        dedup_index_stats,
        match_against_index,
    )

    def txt(i):
        words = [f"w{i}x{j}" for j in range(30)]
        return " ".join(words)

    p = str(tmp_path / "didx")
    d1 = Tibble(spark.createDataFrame(
        [(i, txt(i)) for i in range(5)], "doc_id long, text string"
    ))
    d2 = Tibble(spark.createDataFrame(
        [(i, txt(i)) for i in range(5, 10)], "doc_id long, text string"
    ))
    dedup_index_build(d1, "text", "doc_id", p, stamp=10)
    dedup_index_append(d2, p, stamp=20)

    batch = Tibble(spark.createDataFrame(
        [(100 + i, txt(i)) for i in range(10)], "doc_id long, text string"
    ))
    allm = sorted(
        r.id_b for r in match_against_index(batch, p).df.collect()
    )
    assert allm == list(range(10)), allm
    got = sorted(
        r.id_b
        for r in match_against_index(batch, p, min_stamp=15).df.collect()
    )
    assert got == [5, 6, 7, 8, 9], got

    st = dedup_index_expire(spark, p, 15)
    assert st["expire_before"] == 15
    surv = sorted(
        r.doc_id for r in dedup_against_index(batch, p).df.collect()
    )
    assert surv == [100, 101, 102, 103, 104], surv

    pre = dedup_index_stats(spark, p)["n_fingerprints"]
    dedup_index_compact(spark, p)
    post = dedup_index_stats(spark, p)
    assert pre == 10 and post["n_fingerprints"] == 5
    assert post["expire_before"] == 15
    assert sorted(
        r.id_b for r in match_against_index(batch, p).df.collect()
    ) == [5, 6, 7, 8, 9]

    with pytest.raises(ValueError, match="dead on arrival"):
        dedup_index_append(
            Tibble(spark.createDataFrame(
                [(50, txt(50))], "doc_id long, text string"
            )),
            p, stamp=10,
        )


def test_dedup_index_class_stamp_is_max_of_members(spark, tmp_path):
    """The same TEXT indexed at stamps 10 and 20 in one increment
    stamps its class 20: expiry at 15 keeps the class alive."""
    from datar_polars_spark.scale import (
        dedup_index_build,
        dedup_index_expire,
        match_against_index,
    )

    t = " ".join(f"tok{j}" for j in range(30))
    p = str(tmp_path / "didx")
    d = Tibble(spark.createDataFrame(
        [(1, t, 10), (2, t, 20)],
        "doc_id long, text string, day long",
    ))
    dedup_index_build(d, "text", "doc_id", p, stamp="day")
    dedup_index_expire(spark, p, 15)
    batch = Tibble(spark.createDataFrame(
        [(100, t)], "doc_id long, text string"
    ))
    hit = match_against_index(batch, p).df.collect()
    assert len(hit) == 1 and hit[0].id_b == 1  # class alive (rep id 1)


def test_semantic_index_retention_lifecycle(spark, tmp_path):
    from datar_polars_spark.scale import (
        dedup_against_semantic_index,
        match_against_semantic_index,
        semantic_index_append,
        semantic_index_build,
        semantic_index_compact,
        semantic_index_expire,
        semantic_index_stats,
    )

    def vec(i):
        v = [0.0] * 8
        v[i % 8] = 1.0
        return v

    p = str(tmp_path / "sidx")
    d1 = Tibble(spark.createDataFrame(
        [(i, vec(i)) for i in range(4)], "vec_id long, emb array<double>"
    ))
    d2 = Tibble(spark.createDataFrame(
        [(i, vec(i)) for i in range(4, 8)], "vec_id long, emb array<double>"
    ))
    semantic_index_build(d1, "emb", "vec_id", p, stamp=10)
    semantic_index_append(d2, p, stamp=20)

    batch = Tibble(spark.createDataFrame(
        [(100 + i, vec(i)) for i in range(8)],
        "vec_id long, emb array<double>",
    ))
    assert sorted(
        r.id_b
        for r in match_against_semantic_index(batch, p).df.collect()
    ) == list(range(8))
    assert sorted(
        r.id_b
        for r in match_against_semantic_index(
            batch, p, min_stamp=15
        ).df.collect()
    ) == [4, 5, 6, 7]

    semantic_index_expire(spark, p, 15)
    surv = sorted(
        r.vec_id
        for r in dedup_against_semantic_index(batch, p).df.collect()
    )
    assert surv == [100, 101, 102, 103], surv

    assert semantic_index_stats(spark, p)["n_vectors"] == 8
    semantic_index_compact(spark, p)
    post = semantic_index_stats(spark, p)
    assert post["n_vectors"] == 4 and post["expire_before"] == 15
    assert sorted(
        r.id_b
        for r in match_against_semantic_index(batch, p).df.collect()
    ) == [4, 5, 6, 7]

    with pytest.raises(ValueError, match="dead on arrival"):
        semantic_index_append(
            Tibble(spark.createDataFrame(
                [(50, vec(0))], "vec_id long, emb array<double>"
            )),
            p, stamp=10,
        )


def test_stream_near_dedup_honors_watermark(spark, tmp_path):
    """stream_near_dedup over an index path prunes expired classes in
    both matches and filter modes."""
    from datar_polars_spark.scale import (
        dedup_index_build,
        dedup_index_expire,
    )
    from datar_polars_spark.streaming import stream_near_dedup

    def txt(i):
        return " ".join(f"w{i}x{j}" for j in range(30))

    p = str(tmp_path / "didx")
    d = Tibble(spark.createDataFrame(
        [(i, txt(i), 10 if i < 3 else 20) for i in range(6)],
        "doc_id long, text string, day long",
    ))
    dedup_index_build(d, "text", "doc_id", p, stamp="day")
    dedup_index_expire(spark, p, 15)

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(100 + i, txt(i)) for i in range(6)], "doc_id long, text string"
    ).write.parquet(src)
    sdf = spark.readStream.schema("doc_id long, text string").parquet(src)

    out = stream_near_dedup(
        sdf, p, "text", "doc_id", mode="matches", threshold=0.7
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # matches mode emits one row per colliding band without ts=
    got = sorted(
        {r.match_id for r in spark.read.parquet(sink).collect()}
    )
    assert got == [3, 4, 5], got

    out = stream_near_dedup(
        sdf, p, "text", "doc_id", mode="filter", threshold=0.7
    )
    sink2 = str(tmp_path / "sink2")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    clean = sorted(r.doc_id for r in spark.read.parquet(sink2).collect())
    assert clean == [100, 101, 102], clean


def test_live_stats_counts(spark, stamped, tmp_path):
    """stats(live=True) reports the MATCHABLE count: watermark +
    tombstones applied — across all three stats implementations."""
    p, _ = stamped
    image_index_expire(spark, p, 15)
    image_index_delete(
        spark, p, _td(spark, [(9, None)]).df.select("doc_id")
    )
    st = image_index_stats(spark, p, live=True)
    assert st["n_images"] == 10  # physical, unchanged
    assert st["n_live"] == 4     # 5..9 live minus tombstoned 9

    from datar_polars_spark.scale import (
        dedup_index_build,
        dedup_index_expire,
        dedup_index_stats,
        semantic_index_build,
        semantic_index_expire,
        semantic_index_stats,
    )

    def txt(i):
        return " ".join(f"w{i}x{j}" for j in range(30))

    pd_ = str(tmp_path / "didx")
    dedup_index_build(
        Tibble(spark.createDataFrame(
            [(i, txt(i), 10 if i < 3 else 20) for i in range(6)],
            "doc_id long, text string, day long",
        )),
        "text", "doc_id", pd_, stamp="day",
    )
    dedup_index_expire(spark, pd_, 15)
    st = dedup_index_stats(spark, pd_, live=True)
    assert st["n_fingerprints"] == 6 and st["n_live"] == 3

    ps = str(tmp_path / "sidx")
    semantic_index_build(
        Tibble(spark.createDataFrame(
            [(i, [float(i == j) for j in range(4)], 10 if i < 1 else 20)
             for i in range(4)],
            "vec_id long, emb array<double>, day long",
        )),
        "emb", "vec_id", ps, stamp="day",
    )
    semantic_index_expire(spark, ps, 15)
    st = semantic_index_stats(spark, ps, live=True)
    assert st["n_vectors"] == 4 and st["n_live"] == 3


def test_stamp_predicate_is_pushed_down(spark, stamped):
    """The retention cutoff must reach the parquet store scans as a
    PushedFilters predicate (scan-level pruning is the whole point of
    carrying the stamp in the stores — a post-scan Filter would read
    every expired row group). Locked on the fp engine and the text
    index; the semantic index shares the same _prune_expired helper."""
    import re

    p, batch = stamped
    image_index_expire(spark, p, 15)
    m = match_against_image_index(batch, p, strict=True)
    plan = m.df._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    hits = [x for x in pushed if "GreaterThanOrEqual(stamp,15)" in x]
    assert len(hits) >= 2, pushed  # hashes + postings scans
    assert "stamp" not in m.df.columns


def test_text_stamp_predicate_is_pushed_down(spark, tmp_path):
    import re

    from datar_polars_spark.scale import (
        dedup_index_build,
        dedup_index_expire,
        match_against_index,
    )

    def txt(i):
        return " ".join(f"w{i}x{j}" for j in range(30))

    p = str(tmp_path / "didx")
    dedup_index_build(
        Tibble(spark.createDataFrame(
            [(i, txt(i)) for i in range(6)], "doc_id long, text string"
        )),
        "text", "doc_id", p, stamp=10,
    )
    dedup_index_expire(spark, p, 15)
    batch = Tibble(spark.createDataFrame(
        [(100, txt(0))], "doc_id long, text string"
    ))
    m = match_against_index(batch, p)
    plan = m.df._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    hits = [x for x in pushed if "GreaterThanOrEqual(stamp,15)" in x]
    assert len(hits) >= 2, pushed  # fingerprints + bands (+ sigs)
