"""Top-level flow-matching backbone: TimeEmbedding + TextEncoder + StyleEncoder
+ DiT + zero-init velocity head.

Capability parity with the reference DiTModel
(reference: src/smalltts/models/backbone/model.py:16-101): the same
`forward` / `encode_conditions` / `denoise_step` split — the latter two are
exactly what the reference exports as condition_encoder.onnx / denoiser.onnx;
here they are plain jittable functions that fuse into the sampler graph.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp

from smalltts_tpu.models.dit import (
    CrossKV,
    DiTConfig,
    dit_encode_cross_kv,
    dit_forward,
    dit_forward_cached,
    init_dit,
)
from smalltts_tpu.models.encoder import EncoderConfig
from smalltts_tpu.models.style_encoder import (
    STYLE_ENCODER_CONFIG,
    init_style_encoder,
    style_encoder,
)
from smalltts_tpu.models.text_encoder import (
    TEXT_ENCODER_CONFIG,
    init_text_encoder,
    text_encoder,
)
from smalltts_tpu.ops import nn
from smalltts_tpu.text.vocab import phoneme_len


@dataclass(frozen=True)
class BackboneConfig:
    latent_dim: int = 64
    hidden_dim: int = 960
    phoneme_dim: int = 512
    vocab_size: int = phoneme_len
    time_embed_dim: int = 256
    dit: DiTConfig = field(default_factory=DiTConfig)
    text: EncoderConfig = TEXT_ENCODER_CONFIG
    style: EncoderConfig = STYLE_ENCODER_CONFIG


class Conditions(NamedTuple):
    """Everything the denoise step needs that is constant across steps."""

    cross_kv: CrossKV
    ref_mask: jax.Array
    phonemes_mask: jax.Array
    ref_seq: jax.Array  # style-encoder output (used by the discriminator path)


def init_backbone(key, cfg: BackboneConfig = BackboneConfig(), dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    h = cfg.hidden_dim
    return {
        "time_embedding": {
            "l1": nn.init_linear(ks[0], cfg.time_embed_dim, h, dtype=dtype),
            "l2": nn.init_linear(ks[1], h, h, dtype=dtype),
        },
        "phoneme_embedding": init_text_encoder(ks[2], cfg.vocab_size, cfg.text, dtype),
        "style_encoder": init_style_encoder(ks[3], h, cfg.style, dtype, latent_dim=cfg.latent_dim),
        "dit": init_dit(ks[4], cfg.dit, dtype),
        "velocity": nn.init_zeros_linear(h, cfg.latent_dim, dtype=dtype),
    }


def time_embedding(p, t: jax.Array, dim: int = 256) -> jax.Array:
    """Sinusoidal (t x 1e3) 256-d embedding + 2-layer MLP
    (reference: model.py:16-30)."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(1e4) / (half - 1))
    )
    ang = 1e3 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    emb = emb.astype(p["l1"]["w"].dtype)
    return nn.linear(p["l2"], jax.nn.silu(nn.linear(p["l1"], emb)))


def _check_shapes(cfg, noised, ref_latents, mask, phonemes, phonemes_mask, t):
    """Trace-time shape validation (the functional analogue of the
    reference's jaxtyping/beartype signatures, model.py:56-65)."""
    import chex

    chex.assert_rank([noised, ref_latents], 3)
    chex.assert_rank([mask, phonemes, phonemes_mask], 2)
    chex.assert_rank(t, 1)
    chex.assert_axis_dimension(noised, 2, cfg.latent_dim)
    chex.assert_axis_dimension(ref_latents, 2, cfg.latent_dim)
    chex.assert_equal_shape([phonemes, phonemes_mask])
    chex.assert_equal_shape_prefix([noised, mask], 2)
    chex.assert_equal_shape_prefix([noised, ref_latents, phonemes, t], 1)


def backbone_forward(
    p,
    cfg: BackboneConfig,
    noised: jax.Array,
    ref_latents: jax.Array,
    ref_latents_lengths: jax.Array,
    mask: jax.Array,
    phonemes: jax.Array,
    phonemes_mask: jax.Array,
    t: jax.Array,
    return_features: bool = False,
):
    """Full training forward -> velocity (B, T, latent_dim)
    [+ stacked per-layer features (B, L, T, H) if requested]."""
    _check_shapes(cfg, noised, ref_latents, mask, phonemes, phonemes_mask, t)
    ref_seq, ref_mask = style_encoder(p["style_encoder"], ref_latents, ref_latents_lengths, cfg.style)
    phoneme_embedding = text_encoder(p["phoneme_embedding"], phonemes, phonemes_mask, cfg.text)
    t_emb = time_embedding(p["time_embedding"], t, cfg.time_embed_dim)
    decoded, feats = dit_forward(
        p["dit"], cfg.dit, noised, ref_seq, ref_mask, phoneme_embedding,
        phonemes_mask, t_emb, mask,
    )
    velocity = nn.linear(p["velocity"], decoded)
    if return_features:
        return velocity, feats
    return velocity


def cfg_velocity(
    params,
    cfg: BackboneConfig,
    x_t,
    ref,
    ref_len,
    mask,
    ph,
    ph_mask,
    t,
    cfg_scale_text: float = 2.0,
    cfg_scale_speaker: float = 1.5,
):
    """Double classifier-free guidance via 3x batch replication
    (reference: distill.py:75-105):
    v = v_c + s_text*(v_c - v_no_text) + s_spk*(v_c - v_no_spk).
    The SINGLE implementation shared by the DMD distiller's teacher target
    and the many-step teacher sampler — the hash-critical replication
    order (cond, text-dropped, speaker-dropped) must never diverge between
    training and inference."""
    x3 = jnp.concatenate([x_t] * 3, axis=0)
    ref3 = jnp.concatenate([ref, ref, jnp.zeros_like(ref)], axis=0)
    ref_len3 = jnp.concatenate([ref_len, ref_len, jnp.zeros_like(ref_len)], axis=0)
    mask3 = jnp.concatenate([mask] * 3, axis=0)
    ph3 = jnp.concatenate([ph, jnp.zeros_like(ph), ph], axis=0)
    ph_mask3 = jnp.concatenate([ph_mask, jnp.zeros_like(ph_mask), ph_mask], axis=0)
    t3 = jnp.concatenate([t] * 3, axis=0)
    v3 = backbone_forward(params, cfg, x3, ref3, ref_len3, mask3, ph3, ph_mask3, t3)
    v_c, v_no_text, v_no_spk = jnp.split(v3, 3, axis=0)
    return (
        v_c
        + cfg_scale_text * (v_c - v_no_text)
        + cfg_scale_speaker * (v_c - v_no_spk)
    )


def encode_conditions(
    p,
    cfg: BackboneConfig,
    ref_latents: jax.Array,
    ref_latents_lengths: jax.Array,
    phonemes: jax.Array,
    phonemes_mask: jax.Array,
) -> Conditions:
    """Precompute per-utterance conditioning (style + text + cross-KV) once
    (reference: model.py:88-95)."""
    ref_seq, ref_mask = style_encoder(p["style_encoder"], ref_latents, ref_latents_lengths, cfg.style)
    phoneme_embedding = text_encoder(p["phoneme_embedding"], phonemes, phonemes_mask, cfg.text)
    cross_kv = dit_encode_cross_kv(p["dit"], cfg.dit, ref_seq, phoneme_embedding, phonemes_mask)
    return Conditions(cross_kv, ref_mask, phonemes_mask, ref_seq)


def denoise_step(
    p,
    cfg: BackboneConfig,
    noised: jax.Array,
    mask: jax.Array,
    t: jax.Array,
    cond: Conditions,
    t_emb: jax.Array | None = None,
    step_mods=None,
) -> jax.Array:
    """One denoiser evaluation reusing cached conditions (reference: model.py:97-100).
    `t_emb` lets the sampler hoist the time-embedding MLP out of its step loop
    (the 4 step times are known up front); `step_mods` likewise hoists the
    adaLN modulation weight pass (dit.precompute_step_modulations)."""
    if t_emb is None:
        t_emb = time_embedding(p["time_embedding"], t, cfg.time_embed_dim)
    decoded = dit_forward_cached(
        p["dit"], cfg.dit, noised, t_emb, mask, cond.cross_kv, cond.ref_mask,
        cond.phonemes_mask, step_mods=step_mods,
    )
    return nn.linear(p["velocity"], decoded)
