"""Phoneme/text encoder: 8-layer non-causal transformer, dim 512.

Capability parity with the reference TextEncoder
(reference: src/smalltts/models/backbone/phonemes.py:170-207): embedding ->
8 encoder blocks (4 heads, intermediate 1024, eps 1e-6) -> final RMSNorm.
RoPE tables are static fp32 constants closed over by jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smalltts_tpu.models.encoder import (
    EncoderConfig,
    encoder_stack,
    init_encoder_block,
    stack_blocks,
)
from smalltts_tpu.ops import nn
from smalltts_tpu.ops.rope import rope_table_cos_sin

TEXT_ENCODER_CONFIG = EncoderConfig(
    model_size=512, num_layers=8, num_heads=4, intermediate_size=1024, norm_eps=1e-6
)


def init_text_encoder(key, vocab_size: int, cfg: EncoderConfig = TEXT_ENCODER_CONFIG, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_layers + 1)
    return {
        "text_embedding": nn.init_embedding(ks[0], vocab_size, cfg.model_size, dtype),
        "blocks": stack_blocks(
            [init_encoder_block(ks[i + 1], cfg, dtype) for i in range(cfg.num_layers)]
        ),
        "norm": nn.init_rmsnorm(cfg.model_size, dtype),
    }


def text_encoder(p, input_ids: jax.Array, mask: jax.Array | None = None, cfg: EncoderConfig = TEXT_ENCODER_CONFIG):
    """(B, P) int ids, (B, P) bool mask -> (B, P, 512)."""
    x = nn.embedding(p["text_embedding"], input_ids)
    cos, sin = rope_table_cos_sin(input_ids.shape[1], cfg.head_dim)
    x = encoder_stack(p["blocks"], cfg, x, mask, jnp.asarray(cos), jnp.asarray(sin))
    return nn.rmsnorm(p["norm"], x, cfg.norm_eps)
