"""Codec trainer: waveform autoencoder with multi-resolution STFT loss.

The reference treats its codec as an opaque pretrained ONNX asset
(reference: src/smalltts/codec/onnx.py header — "VibeVoice (MIT)"; no codec
trainer exists in the reference repo). A complete framework must be able to
train one, so this module provides the standard recipe: L1 waveform +
multi-resolution STFT loss (spectral convergence + log-magnitude L1), AdamW,
all in one jitted step. Adversarial fine-tuning can be layered on with
models.discriminator-style critics later.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smalltts_tpu.models.codec import CodecConfig, codec_decode, codec_encode, init_codec


@dataclass(frozen=True)
class CodecTrainConfig:
    num_steps: int = 500_000
    batch_size: int = 8
    segment_samples: int = 3200 * 8  # ~1.07 s segments
    lr: float = 1e-4
    save_every: int = 2_000
    stft_resolutions: Tuple[Tuple[int, int], ...] = (
        (512, 128), (1024, 256), (2048, 512),
    )
    wav_l1_weight: float = 10.0


def _stft_mag(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(B, T) -> (B, frames, n_fft//2+1) magnitude. Static framing + rfft."""
    b, t = x.shape
    n_frames = 1 + (t - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = x[:, idx] * jnp.hanning(n_fft).astype(x.dtype)[None, None, :]
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def multi_resolution_stft_loss(pred: jax.Array, target: jax.Array,
                               resolutions) -> jax.Array:
    """Spectral convergence + log-magnitude L1, averaged over resolutions.

    DELIBERATELY distinct from codec_distill.multi_stft_loss (see the note
    there): unwindowed frames, epsilon in the log, configurable hops, and
    clips are required to fit every resolution."""
    loss = 0.0
    for n_fft, hop in resolutions:
        p = _stft_mag(pred, n_fft, hop)
        t = _stft_mag(target, n_fft, hop)
        sc = jnp.linalg.norm(t - p) / jnp.maximum(jnp.linalg.norm(t), 1e-6)
        log_l1 = jnp.abs(jnp.log(p + 1e-6) - jnp.log(t + 1e-6)).mean()
        loss = loss + sc + log_l1
    return loss / len(resolutions)


def codec_loss(params, cfg: CodecConfig, audio: jax.Array, train_cfg: CodecTrainConfig):
    """audio: (B, 1, T) with T a hop multiple."""
    latents = codec_encode(params, audio, cfg)
    recon = codec_decode(params, latents, cfg)
    wav_l1 = jnp.abs(recon - audio).mean()
    stft = multi_resolution_stft_loss(
        recon[:, 0, :], audio[:, 0, :], train_cfg.stft_resolutions
    )
    return stft + train_cfg.wav_l1_weight * wav_l1, {
        "stft": stft, "wav_l1": wav_l1, "latent_rms": jnp.sqrt((latents ** 2).mean()),
    }


def make_codec_step(cfg: CodecConfig, train_cfg: CodecTrainConfig, tx):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, audio):
        (loss, aux), grads = jax.value_and_grad(codec_loss, has_aux=True)(
            params, cfg, audio, train_cfg
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


def dummy_audio_iter(batch_size: int, segment: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Random-audio fixture (the codec analogue of data.dummy)."""
    rng = np.random.default_rng(seed)
    while True:
        yield (0.3 * rng.standard_normal((batch_size, 1, segment))).astype(np.float32)


def train_codec(
    train_cfg: CodecTrainConfig = CodecTrainConfig(),
    cfg: CodecConfig = CodecConfig(),
    data_iter: Optional[Iterator] = None,
    seed: int = 0,
    checkpoint_dir: str = "assets/codec_checkpoints",
    log_every: int = 100,
):
    from smalltts_tpu.utils import checkpoint as ckpt

    params = jax.jit(lambda k: init_codec(k, cfg))(jax.random.PRNGKey(seed))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(train_cfg.lr, weight_decay=1e-2),
    )
    opt_state = tx.init(params)
    step_fn = make_codec_step(cfg, train_cfg, tx)
    data_iter = data_iter or dummy_audio_iter(train_cfg.batch_size, train_cfg.segment_samples, seed)

    for step in range(train_cfg.num_steps):
        audio = jnp.asarray(next(data_iter))
        params, opt_state, loss, aux = step_fn(params, opt_state, audio)
        if step % log_every == 0:
            print(f"step {step}: codec_loss={float(loss):.4f} "
                  + " ".join(f"{k}={float(v):.4f}" for k, v in aux.items()))
        if step % train_cfg.save_every == 0 and step > 1:
            from smalltts_tpu.utils.config_io import codec_meta

            ckpt.save_pytree(f"{checkpoint_dir}/checkpoint_latest.npz", params,
                             meta=codec_meta(cfg))
    return params
