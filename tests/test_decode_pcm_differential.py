"""Differential test of codecs.decode_pcm / make_wav_pcm /
make_aiff_pcm against the Python STDLIB codecs (wave, aifc): seeded
random parameter sweeps in both directions — our writer must be
readable by the stdlib reader with identical parameters and samples,
and stdlib-written files must decode to the same waveform we wrote.
No Spark needed; pure codec surface."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from datar_polars_spark.scale.codecs import (
    decode_pcm,
    make_aiff_pcm,
    make_wav_pcm,
)

try:  # deprecated in 3.11, removed in 3.13 — differential only if present
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc
except ImportError:  # pragma: no cover
    aifc = None


def _rand_wave(rng, n):
    return (rng.random(n) * 1.6 - 0.8).astype(np.float64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_make_wav_pcm_readable_by_stdlib_wave(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        sr = int(rng.choice([8000, 11025, 16000, 22050, 44100, 48000]))
        bits = int(rng.choice([8, 16, 32]))
        channels = int(rng.choice([1, 2]))
        n = int(rng.integers(10, 3000))
        x = _rand_wave(rng, n)
        b = make_wav_pcm(x, sr, bits=bits, channels=channels)
        with wave.open(io.BytesIO(b)) as w:
            assert w.getframerate() == sr
            assert w.getnchannels() == channels
            assert w.getsampwidth() == bits // 8
            assert w.getnframes() == n
            raw = w.readframes(n)
        # stdlib-decoded samples must equal our decode_pcm's mono mix
        if bits == 16:
            ref = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            ref = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2**31
        else:
            ref = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 128.0
        ref = ref.reshape(-1, channels).mean(axis=1)
        got_sr, got = decode_pcm(b)
        assert got_sr == sr
        assert np.allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stdlib_wave_written_files_decode(seed):
    rng = np.random.default_rng(100 + seed)
    for _ in range(8):
        sr = int(rng.choice([8000, 16000, 44100]))
        sw = int(rng.choice([1, 2, 4]))
        channels = int(rng.choice([1, 2]))
        n = int(rng.integers(10, 2000))
        ints = rng.integers(
            -(2 ** (8 * sw - 1)), 2 ** (8 * sw - 1), size=n * channels
        )
        if sw == 1:  # wave stores 8-bit as unsigned
            raw = (ints + 128).astype(np.uint8).tobytes()
        elif sw == 2:
            raw = ints.astype("<i2").tobytes()
        else:
            raw = ints.astype("<i4").tobytes()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(sw)
            w.setframerate(sr)
            w.writeframes(raw)
        got_sr, got = decode_pcm(buf.getvalue())
        assert got_sr == sr and len(got) == n
        ref = (
            ints.astype(np.float64) / 2 ** (8 * sw - 1)
        ).reshape(-1, channels).mean(axis=1)
        assert np.allclose(got, ref, atol=1e-6)


def test_stdlib_wave_24bit_decodes():
    # the stdlib writer supports 3-byte width; our 24-bit reader must
    # agree with the signed little-endian packing it produces
    rng = np.random.default_rng(7)
    ints = rng.integers(-(2**23), 2**23, size=300)
    raw = b"".join(
        struct.pack("<i", v)[:3] for v in ints
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(raw)
    got_sr, got = decode_pcm(buf.getvalue())
    assert got_sr == 8000 and len(got) == 300
    assert np.allclose(got, ints / 2**23, atol=1e-6)


@pytest.mark.skipif(aifc is None, reason="stdlib aifc removed")
@pytest.mark.parametrize("seed", [0, 1])
def test_aiff_differential_both_directions(seed):
    rng = np.random.default_rng(200 + seed)
    # ours -> stdlib
    n = int(rng.integers(50, 2000))
    sr = int(rng.choice([8000, 22050, 44100]))
    x = _rand_wave(rng, n)
    b = make_aiff_pcm(x, sr)
    with aifc.open(io.BytesIO(b)) as a:
        assert a.getframerate() == sr
        assert a.getnchannels() == 1 and a.getsampwidth() == 2
        assert a.getnframes() == n
        ref = np.frombuffer(a.readframes(n), dtype=">i2") / 32768.0
    got_sr, got = decode_pcm(b)
    assert got_sr == sr and np.allclose(got, ref, atol=1e-6)
    # stdlib -> ours (stereo, 16-bit big-endian)
    ints = rng.integers(-32768, 32768, size=n * 2)

    class _KeepOpen(io.BytesIO):  # aifc.close() closes the stream
        def close(self):
            pass

    buf = _KeepOpen()
    with aifc.open(buf, "wb") as a:
        a.setnchannels(2)
        a.setsampwidth(2)
        a.setframerate(sr)
        a.writeframes(ints.astype(">i2").tobytes())
    got_sr2, got2 = decode_pcm(buf.getvalue())
    assert got_sr2 == sr and len(got2) == n
    ref2 = (ints / 32768.0).reshape(-1, 2).mean(axis=1)
    assert np.allclose(got2, ref2, atol=1e-6)
