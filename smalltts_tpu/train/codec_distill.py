"""Codec distillation: imported VibeVoice ONNX codec -> fast sub-pixel codec.

The serving codec (models/codec.py) is a TPU-first sub-pixel architecture —
4.6x faster decode than a transposed-conv design — but it cannot load the
reference's VibeVoice weights directly. This trainer closes that gap: the
imported ONNX codec (onnxjax.codec.OnnxCodec, weight-exact with the
reference) acts as the frozen teacher, and the native codec learns to match
it, so deployments get reference voice quality at native-codec speed.

* decoder distillation: student_decode(latents) ~ teacher_decode(latents)
  under L1 waveform + multi-resolution STFT loss (the standard vocoder
  objective: spectral convergence + log-magnitude L1 at 3 FFT scales);
* encoder distillation: student_encode(audio) ~ teacher_encode(audio), MSE
  in latent space (keeps cloned-voice latents compatible).

Teacher and student run in ONE jitted step (teacher under stop_gradient);
there is no reference counterpart — the reference ships the slow codec only
(src/smalltts/codec/onnx.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smalltts_tpu.models.codec import (
    CodecConfig,
    codec_decode,
    codec_encode,
    init_codec,
)

STFT_SIZES: Tuple[int, ...] = (512, 1024, 2048)


@dataclass(frozen=True)
class CodecDistillConfig:
    num_steps: int = 100_000
    batch_size: int = 4
    seconds_per_sample: float = 1.0
    lr: float = 2e-4
    warmup: int = 1_000
    grad_clip: float = 1.0
    l1_weight: float = 1.0
    stft_weight: float = 1.0
    latent_weight: float = 1.0
    save_every: int = 2_000


def _stft_mag(x: jax.Array, n_fft: int) -> jax.Array:
    """(B, T) -> (B, frames, n_fft//2+1) magnitude, hann window, hop n_fft/4."""
    hop = n_fft // 4
    b, t = x.shape
    n_frames = max(1 + (t - n_fft) // hop, 1)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[:, idx] * jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)


def multi_stft_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Multi-resolution STFT loss between (B, T) waveforms.

    DELIBERATELY distinct from codec_train.multi_resolution_stft_loss (not
    a drifted copy): this one hann-windows its frames, puts the epsilon
    inside the magnitude sqrt, and tolerates clips shorter than the longer
    FFTs — distillation slices are arbitrary-length teacher audio, while
    the from-scratch trainer controls its clip length and trains unwindowed
    hop-multiple segments. Merge them only with re-measured training runs.

    Averaged over the resolutions that actually FIT the audio (review r3:
    dividing by len(STFT_SIZES) while skipping the long FFTs silently
    under-weighted the spectral term 3x for sub-1024-sample clips). Audio
    shorter than every resolution is a caller error, not a zero loss."""
    total, used = 0.0, 0
    for n_fft in STFT_SIZES:
        if a.shape[-1] < n_fft:
            continue
        ma, mb = _stft_mag(a, n_fft), _stft_mag(b, n_fft)
        sc = jnp.linalg.norm(ma - mb) / jnp.maximum(jnp.linalg.norm(mb), 1e-6)
        log_l1 = jnp.abs(jnp.log(ma) - jnp.log(mb)).mean()
        total = total + sc + log_l1
        used += 1
    if used == 0:
        # tiny clips (test fixtures) train on L1 + latent losses alone —
        # legitimate, but it must be SAID, not silently zero
        import warnings

        warnings.warn(
            f"audio ({a.shape[-1]} samples) is shorter than every STFT "
            f"resolution {STFT_SIZES}; spectral loss contributes nothing",
            stacklevel=2)
        return jnp.zeros(())
    return total / used


def make_codec_distill_step(
    cfg: CodecConfig,
    train_cfg: CodecDistillConfig,
    teacher_decode: Callable,  # (teacher_params, latents (B,T,64)) -> (B,1,T*hop)
    teacher_encode: Optional[Callable],  # (teacher_params, audio) -> latents, or None
    tx,
):
    """Teacher params travel as a step ARGUMENT: closing over them would bake
    hundreds of MB of frozen ONNX weights into the HLO as literals (measured
    to overwhelm remote compilation; same failure mode as bench probes)."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, teacher_params, audio, key):
        if teacher_encode is not None:
            t_latents = jax.lax.stop_gradient(teacher_encode(teacher_params, audio))
            latents_for_dec = t_latents
        else:
            t_latents = None
            latents_for_dec = jax.random.normal(
                key, (audio.shape[0], audio.shape[-1] // cfg.hop, cfg.latent_dim)
            )
        t_audio = jax.lax.stop_gradient(teacher_decode(teacher_params, latents_for_dec))

        def loss_fn(p):
            out = {}
            loss = 0.0
            if t_latents is not None:
                s_latents = codec_encode(p, audio, cfg)
                out["enc_mse"] = ((s_latents - t_latents) ** 2).mean()
                loss = loss + train_cfg.latent_weight * out["enc_mse"]
            s_audio = codec_decode(p, latents_for_dec, cfg)
            n = min(s_audio.shape[-1], t_audio.shape[-1])
            sa, ta = s_audio[..., :n][:, 0, :], t_audio[..., :n][:, 0, :]
            out["dec_l1"] = jnp.abs(sa - ta).mean()
            out["dec_stft"] = multi_stft_loss(sa, ta)
            loss = (loss + train_cfg.l1_weight * out["dec_l1"]
                    + train_cfg.stft_weight * out["dec_stft"])
            out["loss"] = loss
            return loss, out

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def _teacher_fns(teacher):
    """(teacher_params, decode_fn, encode_fn|None) from an OnnxCodec-like."""
    decode = lambda tp, lat: teacher.decode_fn(tp, lat)  # noqa: E731
    # probe the PUBLIC `encoder` property (None on decode-only OnnxCodec
    # builds); duck-typed teachers without it must at least have a callable
    # encode_fn — the old private-attribute getattr(teacher, "_enc", True)
    # assumed encoder support on any object missing _enc and blew up at the
    # first encoder-distill step (review r3)
    if hasattr(teacher, "encoder"):
        has_encoder = teacher.encoder is not None
    else:
        has_encoder = callable(getattr(teacher, "encode_fn", None))
    encode = None
    if has_encoder:
        encode = lambda tp, a: teacher.encode_fn(tp, a)  # noqa: E731
    return teacher.params, decode, encode


def synthetic_audio_iter(batch_size: int, samples: int, seed: int = 0) -> Iterator:
    """Hermetic audio source: mixed tones + filtered noise (stands in for a
    real corpus, like data/dummy.py does for latents)."""
    rng = np.random.RandomState(seed)
    t = np.arange(samples) / 24_000.0
    while True:
        batch = []
        for _ in range(batch_size):
            f = rng.uniform(80, 1000, size=3)
            a = rng.uniform(0.05, 0.3, size=3)
            wav = sum(ai * np.sin(2 * np.pi * fi * t) for fi, ai in zip(f, a))
            noise = rng.randn(samples) * rng.uniform(0.0, 0.05)
            batch.append((wav + noise).astype(np.float32))
        yield np.stack(batch)[:, None, :]


def train_codec_distill(
    train_cfg: CodecDistillConfig = CodecDistillConfig(),
    codec_cfg: CodecConfig = CodecConfig(),
    teacher=None,               # onnxjax.codec.OnnxCodec (or compatible)
    data_iter: Optional[Iterator] = None,
    seed: int = 0,
    checkpoint_dir: str = "assets/codec_checkpoints",
    log_every: int = 100,
):
    from smalltts_tpu.utils import checkpoint as ckpt

    if teacher is None:
        from smalltts_tpu.onnxjax.codec import OnnxCodec

        teacher = OnnxCodec()
    teacher_params, teacher_decode, teacher_encode = _teacher_fns(teacher)

    params = init_codec(jax.random.PRNGKey(seed), codec_cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, train_cfg.lr, train_cfg.warmup, train_cfg.num_steps,
                train_cfg.lr * 0.01,
            )
        ),
    )
    opt_state = tx.init(params)
    step_fn = make_codec_distill_step(
        codec_cfg, train_cfg, teacher_decode, teacher_encode, tx
    )
    samples = int(train_cfg.seconds_per_sample * 24_000)
    samples -= samples % codec_cfg.hop
    data_iter = data_iter or synthetic_audio_iter(
        train_cfg.batch_size, samples, seed
    )

    key = jax.random.PRNGKey(seed + 1)
    metrics = {}
    for step in range(train_cfg.num_steps):
        audio = jnp.asarray(next(data_iter))
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, teacher_params, audio, sub
        )
        if step % log_every == 0:
            vals = {k: float(v) for k, v in metrics.items()}
            print(f"step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in vals.items()))
        if step % train_cfg.save_every == 0 and step > 1:
            from smalltts_tpu.utils.config_io import codec_meta

            ckpt.save_pytree(f"{checkpoint_dir}/codec_distilled.npz", params,
                             meta=codec_meta(codec_cfg))
    return params, {k: float(v) for k, v in metrics.items()}
