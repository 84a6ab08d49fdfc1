"""SV waveform teacher: fbank frontend, in-graph resampler, speechbrain
converter (reference: src/smalltts/models/sv/true.py + dmd2/sv.py:45-66)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smalltts_tpu.models.sv import SVConfig
from smalltts_tpu.models.sv_teacher import (
    VOXCELEB_ECAPA,
    FbankConfig,
    convert_speechbrain_teacher,
    fbank,
    init_sv_teacher,
    make_teacher_fn,
    mean_norm,
    resample_24k_to_16k,
    sv_teacher_embed,
)


def test_fbank_shape_and_tone_peak():
    cfg = FbankConfig()
    sr, t = cfg.sample_rate, 16_000
    tone = 0.5 * np.sin(2 * np.pi * 1000 * np.arange(t) / sr)
    feats = np.asarray(fbank(jnp.asarray(tone[None, :], jnp.float32)))
    assert feats.shape == (1, 1 + t // cfg.hop_length, 80)
    # energy concentrates at the mel bin holding 1 kHz
    mel = lambda f: 2595 * np.log10(1 + f / 700)  # noqa: E731
    centers = 700 * (10 ** (np.linspace(mel(0), mel(8000), 82)[1:-1] / 2595) - 1)
    expected_bin = int(np.argmin(np.abs(centers - 1000)))
    peak_bin = int(feats[0, 50].argmax())
    assert abs(peak_bin - expected_bin) <= 1, (peak_bin, expected_bin)


def test_fbank_matches_independent_numpy_reference():
    """Double-entry check: an independently written numpy mirror of the
    speechbrain pipeline (centered constant pad, periodic hamming, power
    spectrum, HTK mel, 10log10, top_db 80)."""
    cfg = FbankConfig()
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4000).astype(np.float32) * 0.1

    pad = cfg.n_fft // 2
    x = np.pad(wav, ((0, 0), (pad, pad)))
    win = np.hamming(cfg.win_length + 1)[:-1]
    n_frames = 1 + (wav.shape[1] + 2 * pad - cfg.n_fft) // cfg.hop_length
    want = []
    mel_f = None
    from smalltts_tpu.models.sv_teacher import _mel_filters

    mel_f = _mel_filters(cfg)
    for b in range(2):
        frames = np.stack([
            x[b, i * cfg.hop_length : i * cfg.hop_length + cfg.n_fft] * win
            for i in range(n_frames)
        ])
        power = np.abs(np.fft.rfft(frames, cfg.n_fft)) ** 2
        m = power @ mel_f
        db = 10 * np.log10(np.maximum(m, cfg.amin))
        db = np.maximum(db, db.max() - cfg.top_db)
        want.append(db)
    got = np.asarray(fbank(jnp.asarray(wav)))
    np.testing.assert_allclose(got, np.stack(want), atol=1e-3, rtol=1e-4)


def test_mean_norm_masks_padding():
    feats = np.ones((1, 10, 4), np.float32)
    feats[0, 5:] = 100.0  # padding garbage
    out = np.asarray(mean_norm(jnp.asarray(feats), jnp.asarray([5])))
    np.testing.assert_allclose(out[0, :5], 0.0, atol=1e-6)


def test_resampler_preserves_tone_and_rate():
    sr_in, t = 24_000, 24_000
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(t) / sr_in)
    out = np.asarray(resample_24k_to_16k(jnp.asarray(tone[None, None, :], jnp.float32)))
    assert abs(out.shape[-1] - t * 2 // 3) <= 2
    # FFT peak at 440 Hz in the 16 kHz domain
    spec = np.abs(np.fft.rfft(out[0, 0, 2000:-2000]))
    freq = np.fft.rfftfreq(out.shape[-1] - 4000, 1 / 16_000)
    assert abs(freq[spec.argmax()] - 440) < 5
    # amplitude preserved within a few percent
    assert abs(out[0, 0, 2000:-2000].max() - 0.5) < 0.03


def test_resampler_rejects_above_nyquist():
    sr_in, t = 24_000, 24_000
    tone = 0.5 * np.sin(2 * np.pi * 10_000 * np.arange(t) / sr_in)  # > 8 kHz
    out = np.asarray(resample_24k_to_16k(jnp.asarray(tone[None, None, :], jnp.float32)))
    assert np.abs(out[0, 0, 2000:-2000]).max() < 0.01


TINY_TEACHER = SVConfig(input_dim=80, emb_dim=16, channels=(32, 32, 32, 32, 96),
                        kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
                        attention_channels=16, res2net_scale=4, se_channels=16)


def test_teacher_embed_shapes():
    params = init_sv_teacher(jax.random.PRNGKey(0), TINY_TEACHER)
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 1, 8000).astype(np.float32) * 0.1
    emb = sv_teacher_embed(params, jnp.asarray(audio),
                           jnp.asarray([8000, 5000]), cfg=TINY_TEACHER)
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()


def test_speechbrain_classifier_conversion_voxceleb_dims():
    from tests.test_torch_convert_aux import _fake_speechbrain_ecapa_sd

    rng = np.random.RandomState(0)
    sd = _fake_speechbrain_ecapa_sd(VOXCELEB_ECAPA, rng)
    # EncoderClassifier full-checkpoint layout: embedding_model. prefix
    sd = {f"embedding_model.{k[len('ecapa.'):]}" : v for k, v in sd.items()}
    params = convert_speechbrain_teacher(sd)
    assert params["fc"]["w"].shape == (1, 6144, 192)
    assert len(params["blocks"][0]["res2net"]) == 7
    assert params["block0"]["conv"]["w"].shape == (5, 80, 1024)
    assert "attn_tdnn_bn" in params["asp"]


def test_teacher_fn_plugs_into_sv_distillation():
    """End-to-end: codec decode -> in-graph resample -> teacher embed ->
    cosine distillation step (the reference sv.py loop, one step)."""
    import optax

    from smalltts_tpu.models.codec import CodecConfig, init_codec
    from smalltts_tpu.models.sv import init_sv
    from smalltts_tpu.train.sv_train import make_sv_step
    from tests.tiny import TINY_CODEC

    student_cfg = SVConfig(input_dim=64, emb_dim=16, channels=(24, 24, 24, 24, 72),
                           attention_channels=8, res2net_scale=4, se_channels=8)
    teacher = init_sv_teacher(jax.random.PRNGKey(1), TINY_TEACHER)
    tx = optax.adamw(1e-4)
    student = init_sv(jax.random.PRNGKey(2), student_cfg)
    codec = init_codec(jax.random.PRNGKey(3), TINY_CODEC)

    teacher_fn, teacher_params = make_teacher_fn(teacher, TINY_TEACHER)
    step = make_sv_step(student_cfg, TINY_CODEC, tx, teacher_fn)
    rng = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 6, 64), jnp.float32),
        "latents_lengths": jnp.asarray([6, 4], jnp.int32),
    }
    out = step(student, tx.init(student), codec, teacher_params, batch)
    loss = float(out[-1]) if np.ndim(out[-1]) == 0 else float(out[-1]["loss"])
    assert np.isfinite(loss)


def test_teacher_fn_masks_padding():
    """The teacher target must not depend on the batch's padding fraction:
    the reference passes audio_lengths to get_true_embeddings (sv.py:58-66);
    unmasked pooling let decoded zero-latent padding dominate short
    utterances (review r3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smalltts_tpu.models.sv_teacher import init_sv_teacher, make_teacher_fn

    teacher_fn, tp = make_teacher_fn(
        init_sv_teacher(jax.random.PRNGKey(0), TINY_TEACHER), TINY_TEACHER)

    rng = np.random.RandomState(3)
    n = 24_000
    clip = rng.randn(1, 1, n).astype(np.float32) * 0.1
    padded = jnp.asarray(np.concatenate(
        [clip, rng.randn(1, 1, 4 * n).astype(np.float32) * 2.0], axis=-1))
    lengths = jnp.asarray([n])

    # ECAPA convs leak a little past the boundary (the reference has the
    # same leakage — only pooling is masked), so assert the masked pool is
    # FAR closer to the trimmed-clip truth than the unmasked pool was
    e_true = np.asarray(teacher_fn(tp, jnp.asarray(clip)))
    e_masked = np.asarray(teacher_fn(tp, padded, lengths))
    e_unmasked = np.asarray(teacher_fn(tp, padded))
    d_masked = float(np.abs(e_masked - e_true).mean())
    d_unmasked = float(np.abs(e_unmasked - e_true).mean())
    assert d_masked < 0.5 * d_unmasked, (d_masked, d_unmasked)

    # the fallback teacher's masked mean is EXACTLY padding-invariant
    # (frame i covers samples [i*128, i*128+256) — all inside the mask)
    from smalltts_tpu.train.sv_train import make_fallback_teacher

    fb, fp = make_fallback_teacher(emb_dim=8)
    shorter = jnp.asarray(np.concatenate(
        [clip, rng.randn(1, 1, 2 * n).astype(np.float32)], axis=-1))
    f1 = np.asarray(fb(fp, shorter, lengths))
    f2 = np.asarray(fb(fp, padded, lengths))
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-6)
    # unmasked differs (sanity that the test can fail)
    f3 = np.asarray(fb(fp, padded))
    assert np.abs(f1 - f3).max() > 1e-4
