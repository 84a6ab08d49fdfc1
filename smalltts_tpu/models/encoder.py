"""Shared pre-norm transformer encoder block (text + style encoders).

Behavioral parity with the reference's EncoderTransformerBlock
(reference: src/smalltts/models/backbone/phonemes.py:87-167 and
src/smalltts/models/backbone/style.py:28-105): RMSNorm pre-norm, q/k-norm,
complex-pair RoPE over the full head dim, sigmoid output gating, SwiGLU MLP,
all projections bias-free.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from smalltts_tpu.ops import nn
from smalltts_tpu.ops.rope import apply_rope_pairs


@dataclass(frozen=True)
class EncoderConfig:
    model_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    norm_eps: float
    max_seq: int = 4096

    @property
    def head_dim(self) -> int:
        return self.model_size // self.num_heads


def init_encoder_block(key, cfg: EncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    m, h, d = cfg.model_size, cfg.num_heads, cfg.head_dim
    return {
        "attn": {
            "wq": nn.init_linear(ks[0], m, m, bias=False, dtype=dtype),
            "wk": nn.init_linear(ks[1], m, m, bias=False, dtype=dtype),
            "wv": nn.init_linear(ks[2], m, m, bias=False, dtype=dtype),
            "wo": nn.init_linear(ks[3], m, m, bias=False, dtype=dtype),
            "gate": nn.init_linear(ks[4], m, m, bias=False, dtype=dtype),
            "q_norm": nn.init_rmsnorm((h, d), dtype),
            "k_norm": nn.init_rmsnorm((h, d), dtype),
        },
        "mlp": {
            "w1": nn.init_linear(ks[5], m, cfg.intermediate_size, bias=False, dtype=dtype),
            "w3": nn.init_linear(ks[6], m, cfg.intermediate_size, bias=False, dtype=dtype),
            "w2": nn.init_linear(ks[7], cfg.intermediate_size, m, bias=False, dtype=dtype),
        },
        "attention_norm": nn.init_rmsnorm(m, dtype),
        "mlp_norm": nn.init_rmsnorm(m, dtype),
    }


def _self_attention(p, cfg: EncoderConfig, x, mask, rope_cos, rope_sin):
    b, t, _ = x.shape
    h, d = cfg.num_heads, cfg.head_dim
    q = nn.linear(p["wq"], x).reshape(b, t, h, d)
    k = nn.linear(p["wk"], x).reshape(b, t, h, d)
    v = nn.linear(p["wv"], x).reshape(b, t, h, d)
    gate = nn.linear(p["gate"], x)
    q = nn.rmsnorm(p["q_norm"], q, cfg.norm_eps)
    k = nn.rmsnorm(p["k_norm"], k, cfg.norm_eps)
    q = apply_rope_pairs(q, rope_cos[:t], rope_sin[:t])
    k = apply_rope_pairs(k, rope_cos[:t], rope_sin[:t])
    out = nn.sdpa(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        key_mask=mask,
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    out = out * jax.nn.sigmoid(gate)
    return nn.linear(p["wo"], out)


def _mlp(p, x):
    return nn.linear(p["w2"], jax.nn.silu(nn.linear(p["w1"], x)) * nn.linear(p["w3"], x))


def encoder_block(p, cfg: EncoderConfig, x, mask, rope_cos, rope_sin):
    x = x + _self_attention(
        p["attn"], cfg, nn.rmsnorm(p["attention_norm"], x, cfg.norm_eps), mask, rope_cos, rope_sin
    )
    x = x + _mlp(p["mlp"], nn.rmsnorm(p["mlp_norm"], x, cfg.norm_eps))
    return x


def stack_blocks(blocks):
    """List of per-block pytrees -> stacked leading-dim-L pytree for lax.scan
    (same device-side layout trick as the DiT; compile cost is one block body
    instead of num_layers unrolled copies)."""
    import jax

    import jax.numpy as jnp

    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], axis=0), *blocks)


def encoder_stack(stacked, cfg: EncoderConfig, x, mask, rope_cos, rope_sin):
    """Run all layers via lax.scan over the stacked block params."""
    import jax

    def body(carry, blk):
        return encoder_block(blk, cfg, carry, mask, rope_cos, rope_sin), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x
