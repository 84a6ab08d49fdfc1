"""Codec: shape contract, padding behavior, training step, metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tiny import TINY_CODEC
from smalltts_tpu.models.codec import codec_decode, codec_encode, init_codec
from smalltts_tpu.train.codec_train import (
    CodecTrainConfig,
    codec_loss,
    make_codec_step,
    multi_resolution_stft_loss,
)
from smalltts_tpu.utils.metrics import log_mel_spectrogram, mel_distance


@pytest.fixture(scope="module")
def codec_params():
    return init_codec(jax.random.PRNGKey(0), TINY_CODEC)


def test_roundtrip_shapes(codec_params):
    audio = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 1, 3200 * 3))
    lat = codec_encode(codec_params, audio, TINY_CODEC)
    rec = codec_decode(codec_params, lat, TINY_CODEC)
    assert lat.shape == (2, 3, 64)
    assert rec.shape == audio.shape
    assert np.abs(np.asarray(rec)).max() <= 1.0  # tanh head


def test_stft_loss_zero_for_identical():
    x = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (2, 3200 * 2))
    loss = multi_resolution_stft_loss(x, x, ((512, 128),))
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    y = x + 0.1 * jax.random.normal(jax.random.PRNGKey(3), x.shape)
    assert float(multi_resolution_stft_loss(y, x, ((512, 128),))) > 0.01


def test_codec_train_step_reduces_loss(codec_params):
    cfg = CodecTrainConfig(batch_size=2, segment_samples=3200 * 2)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(codec_params)
    step = make_codec_step(TINY_CODEC, cfg, tx)
    audio = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((2, 1, 3200 * 2)),
        jnp.float32,
    )
    params = jax.tree.map(jnp.copy, codec_params)
    losses = []
    for _ in range(6):
        params, opt_state, loss, aux = step(params, opt_state, audio)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_mel_distance_metric():
    sr = 24_000
    t = np.arange(sr) / sr
    a = 0.5 * np.sin(2 * np.pi * 440 * t)
    assert mel_distance(a, a) == pytest.approx(0.0, abs=1e-9)
    b = 0.5 * np.sin(2 * np.pi * 880 * t)
    assert mel_distance(a, b) > 0.5
    m = log_mel_spectrogram(a)
    assert m.shape[1] == 80 and m.shape[0] > 80
