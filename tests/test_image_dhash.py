"""Perceptual image fingerprint (r13): real-raster dHash for PNG/BMP,
documented stub raster otherwise, and the banded Hamming near-dup
join (scale/multimodal.py image_dhash / image_near_dup_pairs)."""

from __future__ import annotations

import numpy as np
import pytest

from datar_polars_spark import Tibble
from datar_polars_spark.scale import image_dhash, image_near_dup_pairs
from datar_polars_spark.scale.codecs import (
    decode_raster,
    make_bmp_pixels,
    make_jpeg,
    make_png_pixels,
)
from datar_polars_spark.scale.multimodal import _dhash64


def _imgs():
    rng = np.random.default_rng(17)
    base = rng.integers(0, 250, (24, 32, 3), dtype=np.uint8)
    bright = base + 3               # global brightness shift, no clip
    far = rng.integers(0, 250, (24, 32, 3), dtype=np.uint8)
    return base, bright, far


def test_decode_raster_png_bmp_agree():
    base, _, _ = _imgs()
    g_png = decode_raster(make_png_pixels(base))
    g_bmp = decode_raster(make_bmp_pixels(base))
    assert g_png.shape == g_bmp.shape == (24, 32)
    # identical pixels through both containers -> same luma to fp noise
    assert float(np.abs(g_png - g_bmp).max()) < 1e-3
    assert decode_raster(make_jpeg(8, 8)) is None  # needs a codec lib


def test_dhash_perceptual_properties(spark):
    base, bright, far = _imgs()
    td = Tibble(
        spark.createDataFrame(
            [
                (1, bytearray(make_png_pixels(base))),
                (2, bytearray(make_png_pixels(bright))),   # near-dup
                (3, bytearray(make_bmp_pixels(base))),     # re-container
                (4, bytearray(make_png_pixels(far))),
                (5, None),
            ],
            "id long, content binary",
        )
    )
    got = {
        r["id"]: r["dhash"]
        for r in image_dhash(td, "content").df.collect()
    }
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    # a uniform brightness shift moves every dHash cell equally:
    # adjacent-cell comparisons, hence the hash, are unchanged
    assert ham(got[1], got[2]) == 0
    # same pixels re-encoded in a different container -> same hash
    assert got[1] == got[3]
    # an unrelated image sits far away (seeded, deterministic)
    assert ham(got[1], got[4]) > 16
    assert got[5] is None
    # matches the local reference implementation on the raw raster
    assert got[1] == _dhash64(decode_raster(make_png_pixels(base)))


def test_dhash_stub_and_strict_for_undecodable(spark):
    td = Tibble(
        spark.createDataFrame(
            [(1, bytearray(make_jpeg(16, 16)))], "id long, content binary"
        )
    )
    # stub path: deterministic, content-hash-keyed
    a = image_dhash(td, "content").df.first()["dhash"]
    b = image_dhash(td, "content").df.first()["dhash"]
    assert a == b and a is not None
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="codec|PNG/BMP"):
        image_dhash(td, "content", strict=True).df.collect()


def test_image_near_dup_pairs_banded_join(spark):
    base, bright, far = _imgs()
    # a third variant: flip one 3x4 patch — a few dHash bits move
    patched = base.copy()
    patched[4:7, 8:12] = 255 - patched[4:7, 8:12]
    rows = [
        (1, bytearray(make_png_pixels(base))),
        (2, bytearray(make_png_pixels(bright))),
        (3, bytearray(make_bmp_pixels(base))),
        (4, bytearray(make_png_pixels(far))),
        (5, bytearray(make_png_pixels(patched))),
    ]
    td = Tibble(spark.createDataFrame(rows, "id long, content binary"))
    hashes = {
        r["id"]: r["dhash"] for r in image_dhash(td, "content").df.collect()
    }
    budget = bin((hashes[1] ^ hashes[5]) & ((1 << 64) - 1)).count("1")
    assert 0 < budget <= 8  # the patch moves a few bits, not many
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(
            td, "content", "id", max_hamming=budget
        ).df.collect()
    }
    # the identical trio pairs at 0; the patched variant pairs with
    # each of them within the budget; `far` pairs with nothing
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0
    assert pairs[(1, 5)] == budget
    assert not any(4 in p for p in pairs)
    # pigeonhole recall is exact: every within-budget pair was found
    ids = sorted(hashes)
    expect = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= budget
    }
    assert set(pairs) == expect
    with pytest.raises(ValueError, match="max_hamming"):
        image_near_dup_pairs(td, "content", "id", max_hamming=-1)


def test_decode_raster_jpeg_dc_thumbnail():
    # r14: baseline JPEG decodes DC-only to the 1/8-scale luma
    # thumbnail — no IDCT, pure Python — for all layout variants
    from datar_polars_spark.scale.codecs import make_jpeg_pixels

    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 16, axis=0), 16, axis=1)  # 128x192
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    block_means = y.reshape(16, 8, 24, 8).mean(axis=(1, 3))
    for kw in (
        {},                                     # 4:4:4
        {"subsample": True},                    # 4:2:0 MCU interleave
        {"restart_interval": 3},                # DRI/RSTn resync
        {"subsample": True, "restart_interval": 1},
    ):
        dc = decode_raster(make_jpeg_pixels(img, quality=90, **kw))
        assert dc.shape == (16, 24), kw
        assert float(np.abs(dc - block_means).mean()) < 1.0, kw
    # odd (non-MCU-multiple) dims crop to the true block extent
    odd = decode_raster(
        make_jpeg_pixels(img[:100, :150], quality=75, subsample=True)
    )
    assert odd.shape == (13, 19)


def test_jpeg_reencodes_are_perceptual_near_dups(spark):
    # the r13 gap: JPEG fell to the exact-identity stub, so re-encodes
    # got unrelated hashes; with the DC decode they collide or nearly
    from datar_polars_spark.scale.codecs import make_jpeg_pixels

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 16, axis=0), 16, axis=1)
    far = np.repeat(
        np.repeat(rng.integers(0, 256, (8, 12, 3), dtype=np.uint8), 16, 0),
        16, 1,
    )
    rows = [
        (1, bytearray(make_jpeg_pixels(img, quality=90))),
        (2, bytearray(make_jpeg_pixels(img, quality=40))),        # re-encode
        (3, bytearray(make_jpeg_pixels(img, quality=85, subsample=True))),
        (4, bytearray(make_jpeg_pixels(far, quality=90))),
    ]
    td = Tibble(spark.createDataFrame(rows, "id long, content binary"))
    # strict mode now ACCEPTS baseline JPEG (no stub, no raise)
    hashes = {
        r["id"]: r["dhash"]
        for r in image_dhash(td, "content", strict=True).df.collect()
    }
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(hashes[1], hashes[2]) <= 4
    assert ham(hashes[1], hashes[3]) <= 4
    assert ham(hashes[1], hashes[4]) > 16
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(
            td, "content", "id", max_hamming=4, strict=True
        ).df.collect()
    }
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    assert not any(4 in p for p in pairs)


def test_jpeg_via_image_index(spark, tmp_path):
    from datar_polars_spark.scale import (
        dedup_against_image_index,
        image_index_build,
        match_against_image_index,
    )
    from datar_polars_spark.scale.codecs import make_jpeg_pixels

    rng = np.random.default_rng(23)
    base = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 16, axis=0), 16, axis=1)
    far = np.repeat(
        np.repeat(rng.integers(0, 256, (8, 12, 3), dtype=np.uint8), 16, 0),
        16, 1,
    )
    path = str(tmp_path / "iidx")
    corpus = Tibble(spark.createDataFrame(
        [(1, bytearray(make_jpeg_pixels(img, quality=90))),
         (2, bytearray(make_jpeg_pixels(far, quality=90)))],
        "img_id long, content binary",
    ))
    image_index_build(corpus, "content", "img_id", path, strict=True)
    batch = Tibble(spark.createDataFrame(
        [(10, bytearray(make_jpeg_pixels(img, quality=40)))],  # re-encode
        "img_id long, content binary",
    ))
    got = [
        (r.id_a, r.id_b, r.hamming)
        for r in match_against_image_index(
            batch, path, strict=True
        ).df.collect()
    ]
    assert len(got) == 1 and got[0][:2] == (10, 1) and got[0][2] <= 4
    surv = dedup_against_image_index(batch, path, strict=True)
    assert surv.df.count() == 0  # the re-encode drops as a dup
