"""4-step DMD sampler as ONE jitted TPU graph.

Behavioral parity with the reference sampling loop
(reference: src/smalltts/infer/onnx.py:98-129 and
src/server/src/pipeline.rs:60-112): for t in linspace(1, 0, 4) —
re-noise the running estimate with FRESH noise at level t, evaluate the
denoiser (velocity), update x_pred = alpha*x_t - sigma*velocity; x_pred
starts at zeros; no CFG; finally codec-decode.

TPU-first: where the reference round-trips host<->device per ONNX session
call per step (4 denoiser calls + cond-encode + codec decode = 6+ transfers
with rank-5 KV ndarrays, pipeline.rs:122-174), here condition encoding, the
`lax.fori_loop` over steps (cross-KV threaded as loop-invariant), on-device
PRNG, and codec decode compile into a single XLA program per length bucket.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from smalltts_tpu.models.backbone import (
    BackboneConfig,
    denoise_step,
    encode_conditions,
)
from smalltts_tpu.models.codec import CodecConfig, codec_decode
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.ops.schedule import get_alpha_sigma

NUM_STEPS = 4


def sample_latents(
    params,
    cfg: BackboneConfig,
    ref_latents: jax.Array,      # (B, R, 64)
    ref_lengths: jax.Array,      # (B,)
    phonemes: jax.Array,         # (B, P)
    phoneme_lengths: jax.Array,  # (B,)
    seq_lengths: jax.Array,      # (B,) true latent frame counts
    key: jax.Array,
    num_steps: int = NUM_STEPS,
    noises: Optional[jax.Array] = None,  # (num_steps, B, T, 64) parity injection
    t_bucket: Optional[int] = None,
) -> jax.Array:
    """Run cond-encode + the step loop; returns masked latents (B, T, 64).

    The static bucket length comes from `t_bucket` or the injected `noises`
    shape (parity tests inject fixed noise, reference: infer/onnx.py:104)."""
    ph_mask = length_mask(phoneme_lengths, phonemes.shape[1])
    cond = encode_conditions(params, cfg, ref_latents, ref_lengths, phonemes, ph_mask)
    if t_bucket is None:
        if noises is None:
            raise ValueError("pass t_bucket or noises (its shape fixes the bucket)")
        t_bucket = noises.shape[2]
    if noises is not None and noises.shape[0] != num_steps:
        # dynamic_index_in_dim CLAMPS out-of-range step indices, so a
        # mismatched injection would silently reuse the last noise slice
        # and produce plausible-but-wrong parity latents (review r3)
        raise ValueError(
            f"noises has {noises.shape[0]} steps, num_steps={num_steps}")
    return _sample_loop(
        params, cfg, cond, seq_lengths, t_bucket, key, num_steps, noises
    )


def _sample_loop(params, cfg, cond, seq_lengths, t_bucket, key, num_steps, noises):
    from smalltts_tpu.models.backbone import time_embedding

    b = seq_lengths.shape[0]
    mask = length_mask(seq_lengths, t_bucket)
    ts = jnp.linspace(1.0, 0.0, num_steps, dtype=jnp.float32)
    dtype = params["velocity"]["w"].dtype
    x0 = jnp.zeros((b, t_bucket, cfg.latent_dim), dtype)
    # all step times are known up front: one batched time-embedding MLP call
    # instead of num_steps tiny latency-bound ones inside the loop
    t_embs = time_embedding(params["time_embedding"], ts, cfg.time_embed_dim)
    if "r_gate" in params:
        # IMF checkpoint served through this recurrence: its instantaneous
        # velocity is u(x,t,t), whose embedding is te(t) + r_gate*te(t)
        # (train/imf.imf_time_emb with r=t) — NOT plain te(t). Identical at
        # init (r_gate=0) but not after training; feeding the ungated
        # embedding would evaluate the net off its training manifold.
        t_embs = t_embs * (1.0 + params["r_gate"]).astype(t_embs.dtype)
    # ...and likewise ONE pass over the adaLN modulation weight stack (~132
    # MB bf16 = 26% of the per-step streamed bytes at full size) for all
    # steps, instead of re-streaming it every step
    from smalltts_tpu.models.dit import precompute_step_modulations

    step_mods, step_finals = precompute_step_modulations(params["dit"], t_embs)

    def body(i, carry):
        x_pred, k = carry
        t_scalar = ts[i]
        alpha, sigma = get_alpha_sigma(t_scalar)
        alpha = alpha.astype(dtype)
        sigma = sigma.astype(dtype)
        if noises is None:
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, x_pred.shape, dtype)
        else:
            noise = lax.dynamic_index_in_dim(noises, i, keepdims=False).astype(dtype)
        x_t = alpha * x_pred + sigma * noise
        t_vec = jnp.full((b,), t_scalar, jnp.float32)
        t_emb = jnp.broadcast_to(
            lax.dynamic_index_in_dim(t_embs, i, keepdims=False)[None, :],
            (b, t_embs.shape[-1]),
        )
        velocity = denoise_step(
            params, cfg, x_t, mask, t_vec, cond, t_emb=t_emb,
            step_mods=(
                lax.dynamic_index_in_dim(step_mods, i, axis=1, keepdims=False),
                lax.dynamic_index_in_dim(step_finals, i, keepdims=False),
            ),
        )
        x_pred = alpha * x_t - sigma * velocity
        return (x_pred, k)

    x_pred, _ = lax.fori_loop(0, num_steps, body, (x0, key))
    return jnp.where(mask[..., None], x_pred, 0.0)


def make_synthesize_fn(
    cfg: BackboneConfig,
    codec_cfg: CodecConfig,
    num_steps: int = NUM_STEPS,
    decode_fn=None,
    sampler: str = "dmd",
    pcm16: bool = False,
):
    """Build the fused synthesize graph: (params, codec_params, inputs) -> waveform.

    Shapes are static per call signature; jit caches one executable per
    (batch, ref bucket, phoneme bucket, latent bucket) combination.

    `decode_fn(codec_params, latents) -> audio` selects the codec backend:
    the native sub-pixel codec by default, or the imported VibeVoice ONNX
    decoder (onnxjax.codec.OnnxCodec.decode_fn) — either fuses into the same
    XLA program.

    `sampler`: "dmd" (reference-parity 4-step fresh-noise loop) or "imf"
    (integral-velocity few-step student, train/imf.py — params must carry
    the r_gate leaf; 1-step denoise measured 1.6 ms vs 7.0 ms at batch 8).

    `pcm16`: quantize the waveform to int16 IN the fused graph with exactly
    serving/audio_io.pcm16's clamp/scale/rint convention (round-half-even in
    fp32, bit-identical by test). Halves result-fetch bytes (the dominant
    per-request transfer on a tunneled device: 3.84 MB fp32 -> 1.92 MB at
    5 s/batch 8) and removes the host-side quantization from encode_wav.
    """
    if decode_fn is None:
        decode_fn = lambda cp, lat: codec_decode(cp, lat, codec_cfg)  # noqa: E731
    if sampler not in ("dmd", "imf"):
        raise ValueError(f"sampler must be 'dmd' or 'imf', got {sampler!r}")

    def _synthesize_pure(
        params,
        codec_params,
        ref_latents,
        ref_lengths,
        phonemes,
        phoneme_lengths,
        seq_lengths,
        key,
        t_bucket: int,
    ):
        ph_mask = length_mask(phoneme_lengths, phonemes.shape[1])
        cond = encode_conditions(params, cfg, ref_latents, ref_lengths, phonemes, ph_mask)
        if sampler == "imf":
            from smalltts_tpu.train.imf import imf_sample

            latents = imf_sample(
                params, cfg, cond, seq_lengths, t_bucket, key, num_steps
            )
        else:
            latents = _sample_loop(
                params, cfg, cond, seq_lengths, t_bucket, key, num_steps, None
            )
        audio = decode_fn(codec_params, latents.astype(jnp.float32))
        if pcm16:
            x = jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
            audio = jnp.rint(x * jnp.float32(32767.0)).astype(jnp.int16)
        return audio  # (B, 1, t_bucket * hop) float32, or int16 when pcm16

    synthesize = jax.jit(_synthesize_pure, static_argnames=("t_bucket",))
    # unjitted body, for composition into larger graphs (bench's in-graph
    # K-repeat compute probe scans it so device-side timing excludes all
    # per-dispatch host/tunnel overhead)
    synthesize.pure_fn = _synthesize_pure
    return synthesize
