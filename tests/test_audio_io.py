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


def _wav_with_rate(sample_rate: int, n_samples: int = 2_000) -> bytes:
    """16-bit PCM WAV whose header claims an arbitrary sample_rate."""
    import struct

    pcm = (np.zeros(n_samples, "<i2")).tobytes()
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate % (1 << 32),
        (sample_rate * 2) % (1 << 32), 2, 16,
        b"data", len(pcm),
    ) + pcm


def test_hostile_sample_rates_rejected_before_allocation():
    """The header's sample_rate is attacker bytes on the serving path:
    sr=1 blows output up 24000x (multi-GB malloc, a SEGFAULT in the native
    backend pre-review-r3), a prime near 2^31 blows the polyphase tap count
    up to hundreds of GB. Both backends must raise, fast, on rates outside
    [MIN_SAMPLE_RATE, MAX_SAMPLE_RATE]."""
    from smalltts_tpu import native

    backends = [audio_io] + ([native] if native.lib() is not None else [])
    for be in backends:
        for sr in (1, 999, 768_001, 2_147_483_647, 4_000_000_000):
            with pytest.raises(ValueError):
                be.decode_and_resample(_wav_with_rate(sr), 24_000)
    # boundary rates pass
    for be in backends:
        for sr in (1_000, 768_000):
            y = be.decode_and_resample(_wav_with_rate(sr), 24_000)
            assert np.isfinite(y).all()


def test_awkward_prime_rate_resamples_bounded():
    """A prime rate like 44101 Hz must not build a 2*width*44101-tap filter
    (hundreds of MB at HQ width): the bounded rational approximation keeps
    taps sane at an inaudible rate error while still resampling correctly."""
    sr = 44_101
    x = _sine(sr, freq=440.0, seconds=0.5)
    y = audio_io.resample_hq(x, sr, 24_000)  # width=1024: the heavy config
    expect = int(round(len(x) * 24_000 / sr))
    assert abs(len(y) - expect) <= 64  # limit_denominator length slack
    # spectral sanity: the 440 Hz tone survives the approximated ratio
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    peak_hz = np.argmax(spec) * 24_000 / (len(y) - 2000)
    assert abs(peak_hz - 440.0) < 5.0


def test_decode_cap_rejects_hour_plus_audio():
    n = int(audio_io.MAX_DECODED_SECONDS * 1_000) + 10_000
    with pytest.raises(ValueError):
        audio_io.resample(np.zeros(n, np.float32), 1_000, 24_000)
