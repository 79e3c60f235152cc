"""PCM decode (scale/codecs.decode_pcm), the spectral audio
fingerprint (scale/multimodal.audio_fingerprint), and
audio_near_dup_pairs — the audio analogue of the image dHash path."""

from __future__ import annotations

import numpy as np
import pytest

from datar_polars_spark import Tibble
from datar_polars_spark.scale import audio_fingerprint, audio_near_dup_pairs
from datar_polars_spark.scale.codecs import (
    decode_pcm,
    make_aiff_pcm,
    make_flac,
    make_wav_pcm,
)
from datar_polars_spark.scale.multimodal import _afp64, _stub_audio_fp


def tone_clip(
    template: int,
    sr: int = 8000,
    gain: float = 1.0,
    noise: float = 0.0,
    seed: int = 0,
    dur: float = 0.5,
):
    """Deterministic tonal clip: 8 time slices, each a chord of 3
    band-center tones chosen by template — distinct templates sit
    ~20+ fingerprint bits apart, re-gained/noised/resampled variants
    within a few."""
    edges = np.geomspace(100.0, min(3800.0, 0.45 * sr), 9)
    centers = np.sqrt(edges[:-1] * edges[1:])
    rng = np.random.default_rng(700 + template)
    n = int(sr * dur)
    x = np.zeros(n)
    te = [(i * n) // 8 for i in range(9)]
    for s in range(8):
        bands = rng.choice(8, size=3, replace=False)
        tt = np.arange(te[s], te[s + 1]) / sr
        for b in bands:
            x[te[s]: te[s + 1]] += np.sin(2 * np.pi * centers[b] * tt)
    x = x / np.abs(x).max() * 0.6 * gain
    if noise:
        x = x + noise * np.random.default_rng(4000 + seed).standard_normal(n)
    return np.clip(x, -1, 1)


def ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def fp_of(b: bytes) -> int:
    sr, x = decode_pcm(b)
    return _afp64(sr, x)


# ---------------------------------------------------------------- decode_pcm

def test_decode_pcm_wav_roundtrip_widths():
    x = tone_clip(0)
    for bits in (8, 16, 32):
        sr, y = decode_pcm(make_wav_pcm(x, 8000, bits=bits))
        assert sr == 8000 and len(y) == len(x)
        assert float(np.abs(y - x).max()) < 0.02


def test_decode_pcm_stereo_downmix_and_aiff():
    x = tone_clip(1)
    sr, y = decode_pcm(make_wav_pcm(x, 8000, channels=2))
    assert sr == 8000 and float(np.abs(y - x).max()) < 0.001
    sr2, y2 = decode_pcm(make_aiff_pcm(x, 8000))
    assert sr2 == 8000 and float(np.abs(y2 - x).max()) < 0.001


def test_decode_pcm_rejects_compressed_and_garbage():
    assert decode_pcm(make_flac(44100, 1000)) is None
    assert decode_pcm(b"\x00" * 64) is None
    assert decode_pcm(b"") is None


# ------------------------------------------------------------------- _afp64

def test_afp64_variants_within_default_budget():
    for t in range(8):
        orig = fp_of(make_wav_pcm(tone_clip(t), 8000))
        regained = fp_of(
            make_wav_pcm(tone_clip(t, gain=0.35, noise=0.008, seed=t), 8000)
        )
        resampled = fp_of(make_wav_pcm(tone_clip(t, sr=16000), 16000))
        requantized = fp_of(make_wav_pcm(tone_clip(t), 8000, bits=8))
        assert ham(orig, regained) <= 6
        assert ham(orig, resampled) <= 6
        assert ham(orig, requantized) <= 6


def test_afp64_distinct_templates_far_apart():
    fps = [fp_of(make_wav_pcm(tone_clip(t), 8000)) for t in range(8)]
    for a in range(8):
        for b in range(a + 1, 8):
            assert ham(fps[a], fps[b]) > 12


def test_afp64_too_short_is_none():
    assert _afp64(8000, np.zeros(100, dtype=np.float32)) is None


# -------------------------------------------------------- audio_fingerprint

def _td(spark, rows):
    return Tibble(
        spark.createDataFrame(
            [(i, bytearray(b) if b is not None else None) for i, b in rows],
            "clip_id long, content binary",
        )
    )


def test_audio_fingerprint_column_and_null(spark):
    wav = make_wav_pcm(tone_clip(0), 8000)
    td = _td(spark, [(1, wav), (2, None)])
    rows = {
        r.clip_id: r.afp
        for r in audio_fingerprint(td, "content").df.collect()
    }
    assert rows[1] == fp_of(wav)
    assert rows[2] is None


def test_audio_fingerprint_stub_is_exact_identity_only(spark):
    flac = make_flac(44100, 4096)
    td = _td(spark, [(1, flac), (2, flac)])
    rows = [r.afp for r in audio_fingerprint(td, "content").df.collect()]
    assert rows[0] == rows[1] == _stub_audio_fp(flac)


def test_audio_fingerprint_strict_raises_on_compressed(spark):
    td = _td(spark, [(1, make_flac(44100, 4096))])
    with pytest.raises(Exception, match="codec library"):
        audio_fingerprint(td, "content", strict=True).df.collect()


# ----------------------------------------------------- audio_near_dup_pairs

def test_audio_near_dup_pairs_banded(spark):
    td = _td(spark, [
        (1, make_wav_pcm(tone_clip(0), 8000)),
        (2, make_wav_pcm(tone_clip(0, gain=0.4, noise=0.008, seed=1), 8000)),
        (3, make_wav_pcm(tone_clip(5), 8000)),
        (4, None),
    ])
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_near_dup_pairs(
            td, "content", id_col="clip_id"
        ).df.collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] <= 6


def test_audio_near_dup_pairs_max_hamming_zero_exact_only(spark):
    wav = make_wav_pcm(tone_clip(2), 8000)
    td = _td(spark, [
        (1, wav),
        (2, wav),
        (3, make_wav_pcm(tone_clip(2, gain=0.4, noise=0.01, seed=9), 8000)),
    ])
    # full-width single band: the (1<<64)-1 mask edge (shared band_cols)
    got = {
        (r.id_a, r.id_b)
        for r in audio_near_dup_pairs(
            td, "content", id_col="clip_id", max_hamming=0
        ).df.collect()
    }
    assert got == {(1, 2)}


# ---------------------------------------------------------------- audio_stats

def test_audio_stats_metrics(spark):
    import numpy as np

    from datar_polars_spark.scale import audio_stats
    from datar_polars_spark.scale.codecs import make_flac

    sr = 8000
    t = np.arange(sr) / sr  # 1 s
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    # half silence, half tone
    half = np.concatenate([np.zeros(sr // 2), tone[: sr - sr // 2]])
    clipped = np.clip(3.0 * tone, -1, 1)
    td = _td(spark, [
        (1, make_wav_pcm(tone, sr)),
        (2, make_wav_pcm(half, sr)),
        (3, make_wav_pcm(clipped, sr)),
        (4, make_flac(44100, 4096)),  # not PCM-decodable -> NULL metrics
        (5, None),
    ])
    rows = {r.clip_id: r for r in audio_stats(td, "content").df.collect()}
    r1 = rows[1]
    assert r1.sample_rate == sr and abs(r1.duration_sec - 1.0) < 1e-3
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(r1.rms - 0.5 / np.sqrt(2)) < 0.01
    assert 0.49 < r1.peak <= 0.51 and r1.clipping_ratio == 0.0
    assert r1.silence_ratio == 0.0
    # 440 Hz sine crosses zero ~880 times/s -> zcr ~ 880/8000
    assert abs(r1.zcr - 880 / sr) < 0.02
    assert 0.4 < rows[2].silence_ratio <= 0.6
    # 16-bit full scale decodes to 32767/32768, just under 1.0
    assert rows[3].clipping_ratio > 0.3 and rows[3].peak > 0.999
    assert rows[4].rms is None and rows[4].sample_rate is None
    assert rows[5].rms is None


def test_audio_stats_strict_and_collision(spark):
    import pytest as _pytest

    from datar_polars_spark.scale import audio_stats
    from datar_polars_spark.scale.codecs import make_flac

    td = _td(spark, [(1, make_flac(44100, 4096))])
    with _pytest.raises(Exception, match="codec library"):
        audio_stats(td, "content", strict=True).df.collect()
    bad = Tibble(
        spark.createDataFrame([(1, bytearray(b"x"), 0.0)],
                              "clip_id long, content binary, rms double")
    )
    with _pytest.raises(ValueError, match="already exists"):
        audio_stats(bad, "content")


# ------------------------------------------------------------- audio_features

def test_audio_features_real_pcm_embedding(spark):
    import numpy as np

    from datar_polars_spark.scale import audio_features
    from datar_polars_spark.scale.codecs import make_flac

    flac = make_flac(44100, 4096)
    td = _td(spark, [
        (1, make_wav_pcm(tone_clip(0), 8000)),
        (2, make_wav_pcm(tone_clip(0, gain=0.4, noise=0.008, seed=1), 8000)),
        (3, make_wav_pcm(tone_clip(5), 8000)),
        (4, flac),   # stub path (hash-derived)
        (5, flac),   # same bytes -> same stub vector
    ])
    rows = {
        r.clip_id: np.array(r.audio_features)
        for r in audio_features(td, "content", dim=32).df.collect()
    }
    for v in rows.values():
        assert len(v) == 32 and abs(np.linalg.norm(v) - 1.0) < 1e-5
    # the real spectral embedding: a re-gained + noised re-master of
    # the same content sits near cosine 1; distinct content far below
    assert float(rows[1] @ rows[2]) > 0.95
    assert float(rows[1] @ rows[3]) < 0.8
    # stub path is exact-content identity
    assert np.allclose(rows[4], rows[5])
