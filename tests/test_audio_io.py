"""Audio I/O: wav formats, resample quality, native/numpy agreement."""

import numpy as np
import pytest

from smalltts_tpu.serving import audio_io


def _sine(sr, freq=440.0, seconds=0.5, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip_16bit():
    x = _sine(24_000)
    wav = audio_io.encode_wav(x, 24_000)
    y, sr = audio_io.decode_wav(wav)
    assert sr == 24_000 and y.shape == (1, len(x))
    # 16-bit quantization + 32767/32768 scale asymmetry
    np.testing.assert_allclose(y[0], x, atol=1e-4)


def test_resample_quality_44k_to_24k():
    x = _sine(44_100, seconds=1.0)
    y = audio_io.resample(x, 44_100, 24_000)
    ideal = _sine(24_000, seconds=1.0)
    n = min(len(y), len(ideal))
    m = slice(2000, n - 2000)
    assert np.abs(y[m] - ideal[m]).max() < 1e-3


def test_resample_hq_matches_reference_width():
    x = _sine(16_000, seconds=0.6)
    y = audio_io.resample_hq(x, 16_000, 24_000)
    ideal = _sine(24_000, seconds=0.6)
    n = min(len(y), len(ideal))
    m = slice(3000, n - 3000)
    assert np.abs(y[m] - ideal[m]).max() < 1e-3


def test_native_matches_numpy():
    from smalltts_tpu import native

    if native.lib() is None:
        pytest.skip("native lib unavailable")
    x = _sine(44_100, seconds=0.4)
    wav = audio_io.encode_wav(x, 44_100)
    a, sr_a = audio_io.decode_wav(wav)
    b, sr_b = native.decode_wav(wav)
    assert sr_a == sr_b
    np.testing.assert_allclose(a, b, atol=1e-6)
    ya = audio_io.decode_and_resample(wav, 24_000)
    yb = native.decode_and_resample(wav, 24_000)
    n = min(len(ya), len(yb))
    assert np.abs(ya[2000:n-2000] - yb[2000:n-2000]).max() < 5e-4
    # encode agreement
    assert native.encode_wav(x, 44_100) == audio_io.encode_wav(x, 44_100)


def test_stereo_mono_mix():
    left = _sine(24_000, 440.0)
    right = _sine(24_000, 880.0)
    mono = audio_io.to_mono(np.stack([left, right]))
    np.testing.assert_allclose(mono, (left + right) / 2, atol=1e-7)
