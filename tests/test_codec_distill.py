"""Codec distillation: ONNX teacher -> sub-pixel student (no reference
counterpart; bridges imported VibeVoice weights to the fast serving codec)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from smalltts_tpu.models.codec import CodecConfig
from smalltts_tpu.train.codec_distill import (
    CodecDistillConfig,
    make_codec_distill_step,
    multi_stft_loss,
    synthetic_audio_iter,
    train_codec_distill,
)

# student with the MINI teacher's hop (4*5=20) — tiny for CPU speed
MINI_CFG = CodecConfig(strides=(4, 5), channels=(32, 24, 8), res_dilations=(1,))


def test_multi_stft_loss_zero_for_identical():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2048).astype(np.float32))
    assert float(multi_stft_loss(x, x)) < 1e-5
    y = jnp.asarray(rng.randn(2, 2048).astype(np.float32))
    assert float(multi_stft_loss(x, y)) > 0.1


def test_synthetic_audio_iter_shapes():
    it = synthetic_audio_iter(3, 400)
    batch = next(it)
    assert batch.shape == (3, 1, 400)
    assert np.abs(batch).max() <= 1.5


@pytest.fixture(scope="module")
def mini_teacher():
    # build an ONNX mini codec teacher directly (module scope)
    import torch

    from tests.test_onnxjax import export
    from tests.test_onnx_codec import HOP, MiniVVEncoder, MiniVVDecoder
    from smalltts_tpu.onnxjax import OnnxFunction, parse_model

    torch.manual_seed(5)
    enc_t, dec_t = MiniVVEncoder(), MiniVVDecoder()
    wav = torch.randn(1, 1, 8 * HOP) * 0.3
    enc = OnnxFunction(parse_model(export(enc_t, (wav,), dynamic_axes={"x": {0: "b", 2: "t"}})))
    with torch.no_grad():
        lat = enc_t(wav)
    dec = OnnxFunction(parse_model(export(dec_t, (lat,), dynamic_axes={"z": {0: "b", 1: "t"}})))

    class T:
        params = {"encoder": enc.params, "decoder": dec.params}
        _enc = enc

        def encode_fn(self, params, audio):
            return enc(params["encoder"], audio.astype(jnp.float32))

        def decode_fn(self, params, latents):
            return dec(params["decoder"], latents.astype(jnp.float32))

    return T()


def test_distill_step_runs_and_loss_decreases(mini_teacher):
    """Latent dim mismatch note: the mini teacher emits 64-dim latents and
    the student consumes 64-dim latents (MINI_CFG.latent_dim default 64)."""
    from smalltts_tpu.models.codec import init_codec

    train_cfg = CodecDistillConfig(num_steps=30, batch_size=2,
                                   seconds_per_sample=0.02, lr=1e-3, warmup=5)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    params = init_codec(jax.random.PRNGKey(0), MINI_CFG)
    opt_state = tx.init(params)
    step = make_codec_distill_step(
        MINI_CFG, train_cfg,
        lambda tp, lat: mini_teacher.decode_fn(tp, lat),
        lambda tp, a: mini_teacher.encode_fn(tp, a),
        tx,
    )
    it = synthetic_audio_iter(2, 480)  # 24 frames of hop 20
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state,
                                          mini_teacher.params,
                                          jnp.asarray(next(it)), sub)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses[:3] + losses[-3:]


def test_train_codec_distill_driver(tmp_path, mini_teacher):
    params, metrics = train_codec_distill(
        CodecDistillConfig(num_steps=4, batch_size=2, seconds_per_sample=0.02,
                           save_every=2, warmup=2),
        MINI_CFG,
        teacher=mini_teacher,
        checkpoint_dir=str(tmp_path),
        log_every=2,
    )
    assert all(np.isfinite(v) for v in metrics.values())
    assert (tmp_path / "codec_distilled.npz").exists()
