"""Style (reference-audio) encoder: 12-layer transformer over codec latents.

Capability parity with the reference StyleEncoder
(reference: src/smalltts/models/backbone/style.py:108-174): in_proj 64->512,
learnable exp(log_scale) input scale (init -1.8), 12 blocks (8 heads,
intermediate 1536, eps 1e-5), final RMSNorm, out_proj 512->960, output zeroed
outside the length mask. PATCH_SIZE=1 in the reference, so patching reduces
to identity; we keep lengths-based masking.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from smalltts_tpu.models.encoder import (
    EncoderConfig,
    encoder_stack,
    init_encoder_block,
    stack_blocks,
)
from smalltts_tpu.ops import nn
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.ops.rope import rope_table_cos_sin

LATENT_SIZE = 64
STYLE_ENCODER_CONFIG = EncoderConfig(
    model_size=512, num_layers=12, num_heads=8, intermediate_size=1536, norm_eps=1e-5
)


def init_style_encoder(
    key,
    out_dim: int,
    cfg: EncoderConfig = STYLE_ENCODER_CONFIG,
    dtype=jnp.float32,
    latent_dim: int = LATENT_SIZE,
):
    ks = jax.random.split(key, cfg.num_layers + 2)
    return {
        "in_proj": nn.init_linear(ks[0], latent_dim, cfg.model_size, bias=True, dtype=dtype),
        "log_scale": jnp.asarray(-1.8, dtype),
        "blocks": stack_blocks(
            [init_encoder_block(ks[i + 1], cfg, dtype) for i in range(cfg.num_layers)]
        ),
        "norm": nn.init_rmsnorm(cfg.model_size, dtype),
        "out_proj": nn.init_linear(ks[-1], cfg.model_size, out_dim, bias=True, dtype=dtype),
    }


def style_encoder(
    p,
    latents: jax.Array,
    lengths: jax.Array,
    cfg: EncoderConfig = STYLE_ENCODER_CONFIG,
) -> Tuple[jax.Array, jax.Array]:
    """(B, R, 64) latents + (B,) lengths -> ((B, R, out_dim) ref_seq, (B, R) mask)."""
    b, t, _ = latents.shape
    mask = length_mask(lengths, t)
    x = nn.linear(p["in_proj"], latents)
    x = x * jnp.exp(p["log_scale"]).astype(x.dtype)
    cos, sin = rope_table_cos_sin(t, cfg.head_dim)
    x = encoder_stack(p["blocks"], cfg, x, mask, jnp.asarray(cos), jnp.asarray(sin))
    x = nn.rmsnorm(p["norm"], x, cfg.norm_eps)
    x = nn.linear(p["out_proj"], x)
    x = jnp.where(mask[..., None], x, 0.0)
    return x, mask
