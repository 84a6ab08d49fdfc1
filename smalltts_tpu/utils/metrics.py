"""Waveform parity metrics: log-mel distance and speaker similarity.

BASELINE.json's north star requires "mel-distance + SV-similarity parity vs
the ONNX reference"; these are the measuring instruments. Pure numpy (host
side, evaluation only).
"""

from __future__ import annotations

import numpy as np


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def probe_sine(seconds: float = 2.0, sr: int = 24_000,
               freq: float = 220.0):
    """The harness-shared probe waveform (fundamental + 3.1x harmonic) —
    certify and eval_quality must measure the SAME input signal."""
    import numpy as np

    t = np.arange(int(seconds * sr))
    return (0.4 * np.sin(2 * np.pi * freq * t / sr)
            + 0.1 * np.sin(2 * np.pi * 3.1 * freq * t / sr)).astype(np.float32)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular mel filters (HTK mel scale 2595*log10(1+f/700), unnormalized; NB librosa default is Slaney)."""
    fmax = fmax or sr / 2.0
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        if c > l:
            fb[i, l:c] = (np.arange(l, c) - l) / (c - l)
        if r > c:
            fb[i, c:r] = (r - np.arange(c, r)) / (r - c)
    return fb


def log_mel_spectrogram(
    audio: np.ndarray, sr: int = 24_000, n_fft: int = 1024, hop: int = 256,
    n_mels: int = 80,
) -> np.ndarray:
    """(T,) waveform -> (frames, n_mels) log-mel. Hann window, reflect-free
    framing (truncates tail)."""
    audio = np.asarray(audio, np.float64).reshape(-1)
    n_frames = max(1 + (len(audio) - n_fft) // hop, 0)
    if n_frames == 0:
        audio = np.pad(audio, (0, n_fft - len(audio)))
        n_frames = 1
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = audio[idx] * np.hanning(n_fft)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = spec @ mel_filterbank(sr, n_fft, n_mels).T
    return np.log(np.maximum(mel, 1e-10))


def mel_distance(a: np.ndarray, b: np.ndarray, sr: int = 24_000) -> float:
    """Mean |log-mel| distance between two waveforms (truncates to shorter)."""
    ma = log_mel_spectrogram(a, sr)
    mb = log_mel_spectrogram(b, sr)
    n = min(len(ma), len(mb))
    return float(np.abs(ma[:n] - mb[:n]).mean())


def sv_similarity(a: np.ndarray, b: np.ndarray, tts=None, sv_params=None,
                  teacher_params=None) -> float:
    """Cosine similarity of SV embeddings of two 24 kHz waveforms.

    Two instruments, in order of preference:
    * `teacher_params` (voxceleb waveform ECAPA, models/sv_teacher.py) —
      embeds the waveforms directly; the meaningful parity metric;
    * `sv_params` (trained latent-domain SV) + `tts` for the codec encoder.

    With neither, falls back to a random-init latent SV and WARNS: the
    number is then only a smoke signal, not a similarity measurement."""
    import jax
    import jax.numpy as jnp

    if teacher_params is not None:
        from smalltts_tpu.models.sv_teacher import (
            resample_24k_to_16k,
            sv_teacher_embed,
        )

        def embed(wav):
            wav16 = resample_24k_to_16k(
                jnp.asarray(np.asarray(wav, np.float32).reshape(1, 1, -1))
            )
            return np.asarray(sv_teacher_embed(teacher_params, wav16)[0])

    else:
        from smalltts_tpu.models.sv import SVConfig, init_sv, sv_forward

        if tts is None:
            from smalltts_tpu.infer.pipeline import SmallTTS

            tts = SmallTTS()
        cfg = SVConfig()
        if sv_params is None:
            sv_params = getattr(tts, "_sv_params", None)
        if sv_params is None:
            import warnings

            warnings.warn(
                "sv_similarity: no trained SV weights passed — using a "
                "random-init model; the value is NOT a similarity measurement",
                stacklevel=2,
            )
            sv_params = init_sv(jax.random.PRNGKey(0), cfg)
            tts._sv_params = sv_params

        def embed(wav):
            lat = tts.encode_reference(np.asarray(wav, np.float32))
            emb, _ = sv_forward(sv_params, cfg, jnp.asarray(lat)[None],
                                jnp.asarray([lat.shape[0]]))
            return np.asarray(emb[0])

    ea, eb = embed(a), embed(b)
    denom = np.linalg.norm(ea) * np.linalg.norm(eb)
    return float(ea @ eb / max(denom, 1e-12))


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against `reference` (truncates)."""
    n = min(len(reference), len(test))
    ref, t = np.asarray(reference[:n], np.float64), np.asarray(test[:n], np.float64)
    noise = ref - t
    return float(10 * np.log10(np.mean(ref ** 2) / max(np.mean(noise ** 2), 1e-12)))
