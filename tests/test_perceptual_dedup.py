"""One-call in-corpus perceptual dedup (r14 image/audio/video_dedup):
exact-fingerprint pre-pass -> banded near-dup pairs over reps ->
component resolution with the keep_by quality winner policy. Deep on
the image family (synthesized PNG/BMP re-encodes); audio/video parity
smoke (the composition is shared — multimodal._perceptual_dedup)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datar_polars_spark import Tibble
from datar_polars_spark.scale import audio_dedup, image_dedup, video_dedup
from datar_polars_spark.scale.codecs import (
    make_avi_mjpeg,
    make_bmp_pixels,
    make_jpeg_pixels,
    make_png_pixels,
    make_wav_pcm,
)


def _raster(template: int, bright: int = 0):
    rng = np.random.default_rng(template)
    return (
        rng.integers(0, 247, (16, 24, 3), dtype=np.uint8) + bright
    ).astype(np.uint8)


def _td(spark, rows, schema="img_id long, content binary, score double"):
    return Tibble(spark.createDataFrame(rows, schema))


class TestImageDedup:
    def test_exact_and_near_dups_collapse(self, spark):
        """Byte-identical copies AND a dHash-invariant brightness-shift
        BMP re-encode of the same raster all fold to one survivor per
        perceptual cluster (min id by default)."""
        png0 = make_png_pixels(_raster(0))
        rows = [
            (1, png0, 0.1),
            (2, png0, 0.9),                              # byte-identical
            (3, make_bmp_pixels(_raster(0, bright=3)), 0.5),  # near-dup
            (4, make_png_pixels(_raster(1)), 0.2),       # distinct
        ]
        out = image_dedup(
            _td(spark, rows), "content", "img_id", strict=True
        ).df
        assert sorted(r.img_id for r in out.collect()) == [1, 4]

    def test_keep_by_max_keeps_best(self, spark):
        png0 = make_png_pixels(_raster(0))
        rows = [
            (1, png0, 0.1),
            (2, png0, 0.9),
            (3, make_bmp_pixels(_raster(0, bright=3)), 0.5),
            (4, make_png_pixels(_raster(1)), None),  # unique, NULL score
        ]
        out = image_dedup(
            _td(spark, rows), "content", "img_id", strict=True,
            keep_by="score", keep="max",
        ).df
        assert sorted(r.img_id for r in out.collect()) == [2, 4]

    def test_null_rows_exempt(self, spark):
        rows = [(1, make_png_pixels(_raster(0)), 0.5), (None, None, 0.1)]
        out = image_dedup(
            _td(spark, rows), "content", "img_id", strict=True
        ).df
        got = sorted(
            (r.img_id if r.img_id is not None else -1)
            for r in out.collect()
        )
        assert got == [-1, 1]

    def test_columns_and_groups_preserved(self, spark):
        rows = [(1, make_png_pixels(_raster(0)), 0.5)]
        td = _td(spark, rows)
        out = image_dedup(td, "content", "img_id", strict=True)
        assert out.columns == td.columns

    def test_keep_by_requires_components(self, spark):
        rows = [(1, make_png_pixels(_raster(0)), 0.5)]
        with pytest.raises(ValueError, match="resolve='components'"):
            image_dedup(
                _td(spark, rows), "content", "img_id", strict=True,
                resolve="single_link", keep_by="score",
            )

    def test_matches_manual_composition(self, spark):
        """image_dedup == near_dup_pairs + components done by hand."""
        from datar_polars_spark.scale import image_near_dup_pairs
        from datar_polars_spark.scale.graph import components_from_pairs

        rows = [
            (i, make_png_pixels(_raster(i % 3, bright=(i // 3) * 3)), 0.0)
            for i in range(9)
        ]
        td = _td(spark, rows)
        out = sorted(
            r.img_id
            for r in image_dedup(td, "content", "img_id", strict=True)
            .df.collect()
        )
        pairs = image_near_dup_pairs(
            td, "content", id_col="img_id", strict=True
        ).df
        labels = components_from_pairs(pairs, "id_a", "id_b")
        drop = {
            r.id for r in labels.filter(
                F.col("id") != F.col("component")
            ).collect()
        }
        manual = sorted(i for i in range(9) if i not in drop)
        assert out == manual == [0, 1, 2]


def _wav(template: int, gain: float = 0.5):
    sr = 8000
    t = np.arange(sr // 2) / sr
    rng = np.random.default_rng(template)
    freqs = rng.choice([220, 440, 660, 880, 1320, 1760], 3, replace=False)
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs) / 3.2
    return make_wav_pcm(x * gain * 2, sr)


def _avi(template: int, quality: int = 90):
    rng = np.random.default_rng(template)
    base = rng.integers(32, 224, (16, 24, 3)).astype(np.int16)
    frames = []
    for _ in range(4):
        base = np.clip(base + rng.integers(-8, 9, (16, 24, 3)), 0, 255)
        frames.append(
            np.repeat(np.repeat(base.astype(np.uint8), 4, 0), 4, 1)
        )
    return make_avi_mjpeg(
        [make_jpeg_pixels(f, quality=quality) for f in frames], fps=10
    )


def test_audio_dedup_parity(spark):
    """Re-gained copies of a clip collapse; keep_by picks the best."""
    rows = [
        (1, _wav(0, 0.5), 0.2),
        (2, _wav(0, 0.25), 0.8),  # re-gain: near-dup of 1
        (3, _wav(1), 0.5),
    ]
    td = _td(spark, rows)
    out = audio_dedup(td, "content", "img_id", strict=True).df
    assert sorted(r.img_id for r in out.collect()) == [1, 3]
    out = audio_dedup(
        td, "content", "img_id", strict=True, keep_by="score", keep="max"
    ).df
    assert sorted(r.img_id for r in out.collect()) == [2, 3]


def test_video_dedup_parity(spark):
    rows = [
        (1, _avi(0, 90), 0.2),
        (2, _avi(0, 40), 0.8),  # re-encode: near-dup of 1
        (3, _avi(1), 0.5),
    ]
    td = _td(spark, rows)
    out = video_dedup(td, "content", "img_id", strict=True).df
    assert sorted(r.img_id for r in out.collect()) == [1, 3]
    out = video_dedup(
        td, "content", "img_id", strict=True, keep_by="score", keep="max"
    ).df
    assert sorted(r.img_id for r in out.collect()) == [2, 3]


class TestCompositionFuzz:
    """Differential fuzz of the shared composition against a driver-side
    brute force: random 64-bit fingerprints with planted near-dup
    clusters, survivors must equal hamming-graph components' winners.
    The fingerprint pass is injected (a column rename), so this
    exercises exactly the pre-pass + banded pairs + resolution logic."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_brute_force(self, spark, seed):
        from datar_polars_spark.scale.multimodal import _perceptual_dedup

        rng = np.random.default_rng(seed)
        max_h = 4
        n_clusters, n_unique = 6, 8
        rows = []
        fps = {}
        i = 0
        for c in range(n_clusters):
            base = int(rng.integers(0, 2**63))
            k = int(rng.integers(2, 5))
            for _ in range(k):
                fp = base
                for b in rng.choice(64, rng.integers(0, max_h // 2 + 1),
                                    replace=False):
                    fp ^= 1 << int(b)
                fps[i] = fp
                rows.append((i, fp, float(rng.integers(0, 100))))
                i += 1
        for _ in range(n_unique):
            fps[i] = int(rng.integers(0, 2**63)) | (1 << 62)
            rows.append((i, fps[i], float(rng.integers(0, 100))))
            i += 1

        def fake_fp(td, content, out_col="__fp__", strict=False):
            return Tibble(td.df.withColumn(out_col, F.col(content)))

        td = Tibble(spark.createDataFrame(
            rows, "the_id long, fpcol long, score double"
        ))
        got = sorted(
            r.the_id
            for r in _perceptual_dedup(
                td, fake_fp, "fpcol", "the_id", max_h, False, 1000,
                "components", "score", "max", "fuzz_dedup",
            ).df.collect()
        )

        # brute force: hamming graph over all pairs -> components ->
        # keep max score (ties: min id)
        ids = sorted(fps)
        parent = {x: x for x in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a in ids:
            for b in ids:
                if a < b and bin(fps[a] ^ fps[b]).count("1") <= max_h:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        comps = {}
        score = {r[0]: r[2] for r in rows}
        for x in ids:
            comps.setdefault(find(x), []).append(x)
        want = sorted(
            min(members, key=lambda m: (-score[m], m))
            for members in comps.values()
        )
        assert got == want, (seed, got, want)
