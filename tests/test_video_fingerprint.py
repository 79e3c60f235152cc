"""MJPEG AVI frame extraction (scale/codecs.extract_video_frames /
make_avi_mjpeg), the temporal-median video fingerprint
(scale/multimodal.video_fingerprint), and video_near_dup_pairs — the
video analogue of the image dHash / audio spectral-hash paths."""

from __future__ import annotations

import numpy as np
import pytest

from datar_polars_spark import Tibble
from datar_polars_spark.scale import video_fingerprint, video_near_dup_pairs
from datar_polars_spark.scale.codecs import (
    _riff_chunk,
    _riff_list,
    extract_video_frames,
    make_avi,
    make_avi_mjpeg,
    make_jpeg_pixels,
    make_mp4,
    parse_video_header,
)
from datar_polars_spark.scale.multimodal import (
    _dhash64,
    _stub_video_fp,
    _video_fp_one,
)


def clip_frames(template: int, n: int = 10, drop_tail: int = 0):
    """Deterministic temporally-correlated frame stack (random-walk
    deltas over a seeded base raster, x8 blocky upsample so the JPEG
    DC thumbnail decodes back to ~the base raster) — the realistic
    video shape: re-encodes land within ~1 fingerprint bit, 1-2-frame
    trims within ~2, distinct templates 25+ apart."""
    rng = np.random.default_rng(5000 + template)
    base = rng.integers(32, 224, (16, 24, 3)).astype(np.int16)
    frames = []
    for _ in range(n):
        base = np.clip(base + rng.integers(-8, 9, (16, 24, 3)), 0, 255)
        frames.append(
            np.repeat(np.repeat(base.astype(np.uint8), 8, axis=0), 8, axis=1)
        )
    return frames[: n - drop_tail] if drop_tail else frames


def mjpeg(template: int, quality: int = 90, subsample: bool = False,
          n: int = 10, drop_tail: int = 0) -> bytes:
    return make_avi_mjpeg(
        [
            make_jpeg_pixels(f, quality=quality, subsample=subsample)
            for f in clip_frames(template, n=n, drop_tail=drop_tail)
        ],
        fps=10,
    )


def ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def vfp(b: bytes) -> int:
    return _video_fp_one(b, 8, True, "test")


# ----------------------------------------------------- extract_video_frames

def test_extract_roundtrips_make_avi_mjpeg():
    jpegs = [make_jpeg_pixels(f, quality=85) for f in clip_frames(0, n=4)]
    avi = make_avi_mjpeg(jpegs, fps=12)
    assert parse_video_header(avi) == ("avi", 192, 128, 333)
    assert extract_video_frames(avi) == jpegs
    assert extract_video_frames(avi, max_frames=2) == jpegs[:2]


def test_extract_non_avi_is_none_headeronly_is_empty():
    assert extract_video_frames(b"notriff") is None
    assert extract_video_frames(make_mp4(64, 64, 1000)) is None
    # a parsable AVI with no movi list: container yes, frames none
    assert extract_video_frames(make_avi(64, 64, 1000)) == []


def test_extract_walks_rec_interleave_groups():
    # frames split between a LIST 'rec ' group and a bare chunk —
    # the one nesting level real muxers emit
    jpegs = [make_jpeg_pixels(f) for f in clip_frames(1, n=3)]
    rec = _riff_list(
        b"rec ",
        _riff_chunk(b"00dc", jpegs[0]) + _riff_chunk(b"00dc", jpegs[1]),
    )
    movi = _riff_list(b"movi", rec + _riff_chunk(b"00db", jpegs[2]))
    avi = _riff_chunk(b"RIFF", b"AVI " + movi)
    assert extract_video_frames(avi) == jpegs


# ------------------------------------------------------------------- _vfp64

def test_vfp_reencode_and_trim_within_budget():
    for t in range(4):
        orig = vfp(mjpeg(t, quality=90))
        reenc = vfp(mjpeg(t, quality=40, subsample=True))
        trim = vfp(mjpeg(t, quality=90, drop_tail=2))
        assert ham(orig, reenc) <= 6
        assert ham(orig, trim) <= 6


def test_vfp_distinct_templates_far_apart():
    fps = [vfp(mjpeg(t)) for t in range(4)]
    for a in range(4):
        for b in range(a + 1, 4):
            assert ham(fps[a], fps[b]) > 12


def test_vfp_single_frame_is_frame_dhash():
    # a 1-frame video medians over one cell matrix == the frame dHash
    from datar_polars_spark.scale.codecs import decode_raster

    jpeg = make_jpeg_pixels(clip_frames(2, n=1)[0], quality=90)
    avi = make_avi_mjpeg([jpeg])
    assert vfp(avi) == _dhash64(decode_raster(jpeg))


# ---------------------------------------------------------- video_fingerprint

def _td(spark, rows):
    return Tibble(
        spark.createDataFrame(
            [(i, bytearray(b) if b is not None else None) for i, b in rows],
            "vid_id long, content binary",
        )
    )


def test_video_fingerprint_column_and_null(spark):
    avi = mjpeg(0)
    td = _td(spark, [(1, avi), (2, None)])
    rows = {
        r.vid_id: r.vfp
        for r in video_fingerprint(td, "content").df.collect()
    }
    assert rows[1] == vfp(avi)
    assert rows[2] is None


def test_video_fingerprint_stub_is_exact_identity_only(spark):
    mp4 = make_mp4(64, 64, 1000)
    td = _td(spark, [(1, mp4), (2, mp4)])
    rows = [r.vfp for r in video_fingerprint(td, "content").df.collect()]
    assert rows[0] == rows[1] == _stub_video_fp(mp4)


def test_video_fingerprint_strict_raises_on_non_mjpeg(spark):
    td = _td(spark, [(1, make_mp4(64, 64, 1000))])
    with pytest.raises(Exception, match="codec library"):
        video_fingerprint(td, "content", strict=True).df.collect()
    # a frameless AVI is equally undecodable
    td2 = _td(spark, [(1, make_avi(64, 64, 1000))])
    with pytest.raises(Exception, match="codec library"):
        video_fingerprint(td2, "content", strict=True).df.collect()


def test_video_fingerprint_column_collision(spark):
    bad = Tibble(
        spark.createDataFrame(
            [(1, bytearray(b"x"), 0)], "vid_id long, content binary, vfp long"
        )
    )
    with pytest.raises(ValueError, match="already exists"):
        video_fingerprint(bad, "content")


# ----------------------------------------------------- video_near_dup_pairs

def test_video_near_dup_pairs_banded(spark):
    td = _td(spark, [
        (1, mjpeg(0, quality=90)),
        (2, mjpeg(0, quality=40, subsample=True)),
        (3, mjpeg(3)),
        (4, None),
    ])
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in video_near_dup_pairs(
            td, "content", id_col="vid_id", max_hamming=6
        ).df.collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] <= 6


def test_video_near_dup_pairs_max_hamming_zero_exact_only(spark):
    avi = mjpeg(1)
    td = _td(spark, [
        (1, avi),
        (2, avi),
        (3, mjpeg(1, quality=35, subsample=True)),
    ])
    # full-width single band: the (1<<64)-1 mask edge (shared band_cols)
    got = {
        (r.id_a, r.id_b)
        for r in video_near_dup_pairs(
            td, "content", id_col="vid_id", max_hamming=0
        ).df.collect()
    }
    assert got == {(1, 2)}
