"""LSGAN discriminator over stacked DiT features + conditioning sequences.

Capability parity with the reference Discriminator
(reference: src/smalltts/models/discriminator.py:47-111): takes the LAST 3
stacked DiT layer outputs flattened to 512, projections of the noised
latents, a (mask, t) conditioning pair, the style sequence, and phoneme
embeddings, concatenates everything along the SEQUENCE axis, runs a 6-layer
GroupNorm Conformer, then a 1x1 conv to per-position logits masked-meaned to
one logit per sample.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from smalltts_tpu.models.conformer import ConformerConfig, conformer, init_conformer
from smalltts_tpu.ops import nn
from smalltts_tpu.text.vocab import phoneme_len


@dataclass(frozen=True)
class DiscriminatorConfig:
    latent_dim: int = 64
    transformer_dim: int = 960
    ref_dim: int = 960
    model_dim: int = 512
    num_tail_layers: int = 3
    vocab: int = phoneme_len
    conformer: ConformerConfig = ConformerConfig(
        input_dim=512, num_heads=8, ffn_dim=1024, num_layers=6,
        depthwise_conv_kernel_size=7, use_group_norm=True,
    )


def init_discriminator(key, cfg: DiscriminatorConfig = DiscriminatorConfig(), dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    d = cfg.model_dim
    return {
        "layers_proj": nn.init_linear(ks[0], cfg.num_tail_layers * cfg.transformer_dim, d, dtype=dtype),
        "audio_proj": nn.init_linear(ks[1], cfg.latent_dim, d, dtype=dtype),
        "phoneme_embed": nn.init_embedding(ks[2], cfg.vocab, d, dtype),
        "ref_proj": nn.init_linear(ks[3], cfg.ref_dim, d, dtype=dtype),
        "cond_proj": nn.init_linear(ks[4], 2, d, dtype=dtype),
        "enc": init_conformer(ks[5], cfg.conformer, dtype),
        "out": nn.init_conv1d(ks[6], d, 1, 1, dtype=dtype),
    }


def discriminator_forward(
    p,
    cfg: DiscriminatorConfig,
    stacked_features: jax.Array,  # (B, L, T, transformer_dim)
    noised: jax.Array,            # (B, T, latent_dim)
    ref_seq: jax.Array,           # (B, R, ref_dim)
    ref_mask: jax.Array,          # (B, R)
    mask: jax.Array,              # (B, T)
    phonemes: jax.Array,          # (B, P)
    t: jax.Array,                 # (B,)
    train: bool = False,
) -> Tuple[jax.Array, dict]:
    """-> (logits (B,), new_params)."""
    tail = stacked_features[:, -cfg.num_tail_layers:, :, :]
    b, n_layers, seq_len, _ = tail.shape
    flat = tail.transpose(0, 2, 1, 3).reshape(b, seq_len, n_layers * cfg.transformer_dim)
    layers_proj = nn.linear(p["layers_proj"], flat)
    noised_proj = nn.linear(p["audio_proj"], noised.astype(layers_proj.dtype))

    mask_f = mask.astype(layers_proj.dtype)[..., None]
    t_f = jnp.broadcast_to(t.astype(layers_proj.dtype)[:, None, None], (b, seq_len, 1))
    cond = nn.linear(p["cond_proj"], jnp.concatenate([mask_f, t_f], axis=-1))

    ref_proj = nn.linear(p["ref_proj"], ref_seq.astype(layers_proj.dtype))
    ph_emb = nn.embedding(p["phoneme_embed"], phonemes)

    feats = jnp.concatenate([layers_proj, noised_proj, cond, ref_proj, ph_emb], axis=1)
    phoneme_mask = phonemes != 0
    key_mask = jnp.concatenate([mask, mask, mask, ref_mask, phoneme_mask], axis=1)

    enc, new_enc = conformer(p["enc"], cfg.conformer, feats, key_mask, train)
    y = nn.conv1d(p["out"], enc, padding=0)[..., 0]  # (B, S)
    valid = key_mask.astype(jnp.float32)
    logits = (y.astype(jnp.float32) * valid).sum(axis=1) / jnp.maximum(valid.sum(axis=1), 1.0)
    new_p = dict(p)
    new_p["enc"] = new_enc
    return logits, new_p
