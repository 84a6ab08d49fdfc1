"""Conformer encoder (torchaudio-layer-compatible layout).

Capability parity with the Conformer stacks the reference uses for ASR
(reference: src/smalltts/models/asr.py:28-36 — torchaudio Conformer, 7 layers,
16 heads, ffn 1024, depthwise kernel 9, BatchNorm) and for the discriminator
(reference: src/smalltts/models/discriminator.py:9-69 — 6 layers, 8 heads,
ffn 1024, kernel 7, GroupNorm). Layer structure: half-step FFN -> MHSA ->
conv module (pointwise/GLU/depthwise/norm/SiLU/pointwise) -> half-step FFN ->
final LayerNorm, all pre-norm with residuals.

BatchNorm running stats live in the param pytree (`mean`/`var` leaves) and are
updated functionally: every apply returns (y, new_params); exclude the stat
leaves from the optimizer with train.optim.trainable_mask.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from smalltts_tpu.ops import nn


@dataclass(frozen=True)
class ConformerConfig:
    input_dim: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    depthwise_conv_kernel_size: int
    use_group_norm: bool = False
    # zero padded positions before the depthwise conv so padding never leaks
    # into valid frames (improves on torchaudio, whose conv module ignores
    # the key mask). Set False for weight-exact parity with converted
    # reference checkpoints — the reference trained WITH the leakage.
    pad_invariant: bool = True

    @property
    def head_dim(self) -> int:
        return self.input_dim // self.num_heads


def _init_ln(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def _ln(p, x, eps=1e-5):
    y = nn.layernorm_noaffine(x, eps)
    return y * p["scale"].astype(y.dtype) + p["bias"].astype(y.dtype)


def _init_ffn(key, dim, ffn_dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "ln": _init_ln(dim, dtype),
        "w1": nn.init_linear(k1, dim, ffn_dim, dtype=dtype),
        "w2": nn.init_linear(k2, ffn_dim, dim, dtype=dtype),
    }


def _ffn(p, x):
    return nn.linear(p["w2"], jax.nn.silu(nn.linear(p["w1"], _ln(p["ln"], x))))


def init_conformer_layer(key, cfg: ConformerConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    d = cfg.input_dim
    p = {
        "ffn1": _init_ffn(ks[0], d, cfg.ffn_dim, dtype),
        "attn_ln": _init_ln(d, dtype),
        "attn": {
            "in_proj": nn.init_linear(ks[1], d, 3 * d, dtype=dtype),
            "out_proj": nn.init_linear(ks[2], d, d, dtype=dtype),
        },
        "conv_ln": _init_ln(d, dtype),
        "conv": {
            "pw1": nn.init_conv1d(ks[3], d, 2 * d, 1, dtype=dtype),
            "dw": nn.init_conv1d(
                ks[4], d, d, cfg.depthwise_conv_kernel_size, groups=d, dtype=dtype
            ),
            "pw2": nn.init_conv1d(ks[5], d, d, 1, dtype=dtype),
        },
        "ffn2": _init_ffn(ks[6], d, cfg.ffn_dim, dtype),
        "final_ln": _init_ln(d, dtype),
    }
    if cfg.use_group_norm:
        p["conv"]["gn_scale"] = jnp.ones((d,), dtype)
        p["conv"]["gn_bias"] = jnp.zeros((d,), dtype)
    else:
        p["conv"]["bn"] = nn.init_batchnorm(d, dtype)
    return p


def _mhsa(p, cfg: ConformerConfig, x, key_mask):
    b, t, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    qkv = nn.linear(p["in_proj"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    out = nn.sdpa(q, k, v, key_mask=key_mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["out_proj"], out)


def _conv_module(p, cfg: ConformerConfig, x, mask, train: bool):
    h = nn.conv1d(p["pw1"], x, padding=0)
    h = jax.nn.glu(h, axis=-1)
    if mask is not None and cfg.pad_invariant:
        h = jnp.where(mask[..., None], h, 0.0)
    k = cfg.depthwise_conv_kernel_size
    h = nn.conv1d(p["dw"], h, groups=cfg.input_dim, padding=(k - 1) // 2)
    new_p = p
    if cfg.use_group_norm:
        h = nn.groupnorm(p["gn_scale"], p["gn_bias"], h, num_groups=1,
                         mask=mask if cfg.pad_invariant else None)
    else:
        h, new_bn = nn.batchnorm(p["bn"], h, train, mask)
        new_p = dict(p)
        new_p["bn"] = new_bn
    h = jax.nn.silu(h)
    h = nn.conv1d(p["pw2"], h, padding=0)
    return h, new_p


def conformer_layer(p, cfg: ConformerConfig, x, key_mask, train: bool = False):
    """One layer; returns (y, new_params) (stats update when train)."""
    x = x + 0.5 * _ffn(p["ffn1"], x)
    x = x + _mhsa(p["attn"], cfg, _ln(p["attn_ln"], x), key_mask)
    conv_out, new_conv = _conv_module(p["conv"], cfg, _ln(p["conv_ln"], x), key_mask, train)
    x = x + conv_out
    x = x + 0.5 * _ffn(p["ffn2"], x)
    x = _ln(p["final_ln"], x)
    new_p = dict(p)
    new_p["conv"] = new_conv
    return x, new_p


def init_conformer(key, cfg: ConformerConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_layers)
    return {"layers": [init_conformer_layer(k, cfg, dtype) for k in ks]}


def conformer(p, cfg: ConformerConfig, x, key_mask, train: bool = False):
    """(B, T, D) + (B, T) valid-mask -> ((B, T, D), new_params)."""
    new_layers = []
    for layer in p["layers"]:
        x, new_layer = conformer_layer(layer, cfg, x, key_mask, train)
        new_layers.append(new_layer)
    return x, {"layers": new_layers}
