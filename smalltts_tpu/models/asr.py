"""Latent-domain ASR for the CTC alignment loss in DMD2 distillation.

Capability parity with the reference ASR
(reference: src/smalltts/models/asr.py:11-52): depthwise ConvTranspose1d x4
temporal upsample -> Conformer (7 layers, 16 heads, ffn 1024, kernel 9,
BatchNorm) -> Linear to the 198-way phoneme vocabulary -> log-softmax.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from smalltts_tpu.models.conformer import ConformerConfig, conformer, init_conformer
from smalltts_tpu.ops import nn
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.text.vocab import phoneme_len


@dataclass(frozen=True)
class ASRConfig:
    input_dim: int = 64
    upsample: int = 4
    vocab: int = phoneme_len
    conformer: ConformerConfig = ConformerConfig(
        input_dim=64, num_heads=16, ffn_dim=1024, num_layers=7,
        depthwise_conv_kernel_size=9, use_group_norm=False,
    )


def init_asr(key, cfg: ASRConfig = ASRConfig(), dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    d, r = cfg.input_dim, cfg.upsample
    return {
        # depthwise transposed conv kernel (r, 1, d) in HIO with groups=d
        "upsample": {
            "w": jax.random.uniform(k1, (r, 1, d), dtype, -(d ** -0.5), d ** -0.5),
            "b": jnp.zeros((d,), dtype),
        },
        "conformer": init_conformer(k2, cfg.conformer, dtype),
        "proj": nn.init_linear(k3, d, cfg.vocab, dtype=dtype),
    }


def _deconv_upsample(p, x: jax.Array, r: int) -> jax.Array:
    """Depthwise ConvTranspose1d(kernel=r, stride=r, groups=d): each input
    frame expands to r independent output frames (reference: asr.py:11-22) —
    with kernel == stride this is exactly a broadcast-multiply + reshape,
    which XLA fuses (no conv needed)."""
    b, t, d = x.shape
    w = p["w"].astype(x.dtype).reshape(r, d)  # (r, d): tap j for channel c
    y = x[:, :, None, :] * w[None, None, :, :]  # (B, T, r, D)
    y = y.reshape(b, t * r, d)
    return (y.astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def asr_forward(
    p,
    cfg: ASRConfig,
    latents: jax.Array,   # (B, T, 64)
    lengths: jax.Array,   # (B,)
    train: bool = False,
) -> Tuple[jax.Array, jax.Array, dict]:
    """-> (log_probs (B, T*r, vocab), out_lengths (B,), new_params)."""
    x = _deconv_upsample(p["upsample"], latents, cfg.upsample)
    out_lengths = lengths * cfg.upsample
    mask = length_mask(out_lengths, x.shape[1])
    x, new_conf = conformer(p["conformer"], cfg.conformer, x, mask, train)
    logits = nn.linear(p["proj"], x)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    new_p = dict(p)
    new_p["conformer"] = new_conf
    return log_probs, out_lengths, new_p
