"""Speaker-verification model: ECAPA-TDNN over codec latents.

Capability parity with the reference SV student
(reference: src/smalltts/models/sv/model.py:7-35 — speechbrain ECAPA_TDNN,
input 64, channels [768,768,768,768,2304], kernels [3,3,3,3,1], dilations
[1,2,3,5,1], attention 192, res2net scale 12, SE 192, global context, emb
192). Produces a speaker embedding from latent sequences; used as a cosine
distillation loss in DMD2 and as the SV-similarity parity metric.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from smalltts_tpu.ops import nn
from smalltts_tpu.ops.masking import length_mask


@dataclass(frozen=True)
class SVConfig:
    input_dim: int = 64
    emb_dim: int = 192
    channels: Tuple[int, ...] = (768, 768, 768, 768, 2304)
    kernel_sizes: Tuple[int, ...] = (3, 3, 3, 3, 1)
    dilations: Tuple[int, ...] = (1, 2, 3, 5, 1)
    attention_channels: int = 192
    res2net_scale: int = 12
    se_channels: int = 192


def _init_tdnn(key, c_in, c_out, k, dtype):
    return {
        "conv": nn.init_conv1d(key, c_in, c_out, k, dtype=dtype),
        "bn": nn.init_batchnorm(c_out, dtype),
    }


def _tdnn(p, x, dilation, train, mask=None):
    k = p["conv"]["w"].shape[0]
    pad = (k - 1) * dilation // 2
    y = lax.conv_general_dilated(
        x, p["conv"]["w"].astype(x.dtype), (1,), [(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["conv"]["b"].astype(jnp.float32)).astype(x.dtype)
    y = jax.nn.relu(y)
    y, new_bn = nn.batchnorm(p["bn"], y, train, mask)
    if mask is not None:
        # keep padded positions exactly zero so later convs never read
        # garbage across the length boundary (improves on speechbrain ECAPA,
        # which is not padding-invariant)
        y = jnp.where(mask[..., None], y, 0.0)
    return y, {"conv": p["conv"], "bn": new_bn}


def _init_se_res2net(key, ch, k, scale, se_ch, dtype):
    ks = jax.random.split(key, scale + 4)
    width = ch // scale
    return {
        "in_tdnn": _init_tdnn(ks[0], ch, ch, 1, dtype),
        "res2net": [
            _init_tdnn(ks[1 + i], width, width, k, dtype) for i in range(scale - 1)
        ],
        "out_tdnn": _init_tdnn(ks[scale], ch, ch, 1, dtype),
        "se1": nn.init_conv1d(ks[scale + 1], ch, se_ch, 1, dtype=dtype),
        "se2": nn.init_conv1d(ks[scale + 2], se_ch, ch, 1, dtype=dtype),
    }


def _se_res2net(p, cfg: SVConfig, x, dilation, train, mask):
    residual = x
    y, new_in = _tdnn(p["in_tdnn"], x, 1, train, mask)
    chunks = jnp.split(y, cfg.res2net_scale, axis=-1)
    outs = [chunks[0]]
    prev = None
    new_res = []
    for i, blk in enumerate(p["res2net"]):
        inp = chunks[i + 1] if prev is None else chunks[i + 1] + prev
        prev, nb = _tdnn(blk, inp, dilation, train, mask)
        new_res.append(nb)
        outs.append(prev)
    y = jnp.concatenate(outs, axis=-1)
    y, new_out = _tdnn(p["out_tdnn"], y, 1, train, mask)
    # squeeze-excitation with masked temporal mean
    if mask is not None:
        m = mask[..., None].astype(y.dtype)
        s = (y * m).sum(axis=1, keepdims=True) / jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    else:
        s = y.mean(axis=1, keepdims=True)
    s = jax.nn.relu(nn.conv1d(p["se1"], s, padding=0))
    s = jax.nn.sigmoid(nn.conv1d(p["se2"], s, padding=0))
    y = y * s + residual
    new_p = dict(p)
    new_p.update({"in_tdnn": new_in, "res2net": new_res, "out_tdnn": new_out})
    return y, new_p


def init_sv(key, cfg: SVConfig = SVConfig(), dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    ch = cfg.channels
    return {
        "block0": _init_tdnn(ks[0], cfg.input_dim, ch[0], cfg.kernel_sizes[0], dtype),
        "blocks": [
            _init_se_res2net(ks[1 + i], ch[i + 1], cfg.kernel_sizes[i + 1],
                             cfg.res2net_scale, cfg.se_channels, dtype)
            for i in range(3)
        ],
        "mfa": _init_tdnn(ks[4], ch[0] * 3, ch[-1], cfg.kernel_sizes[-1], dtype),
        "asp": {
            "attn1": nn.init_conv1d(ks[5], ch[-1] * 3, cfg.attention_channels, 1, dtype=dtype),
            "attn2": nn.init_conv1d(ks[6], cfg.attention_channels, ch[-1], 1, dtype=dtype),
        },
        "asp_bn": nn.init_batchnorm(ch[-1] * 2, dtype),
        "fc": nn.init_conv1d(ks[7], ch[-1] * 2, cfg.emb_dim, 1, dtype=dtype),
    }


def _masked_stats(x, mask, eps=1e-12):
    m = mask[..., None].astype(x.dtype)
    count = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    mean = (x * m).sum(axis=1, keepdims=True) / count
    var = ((x - mean) ** 2 * m).sum(axis=1, keepdims=True) / count
    return mean, jnp.sqrt(jnp.maximum(var, eps))


def sv_forward(
    p,
    cfg: SVConfig,
    latents: jax.Array,  # (B, T, 64)
    lengths: jax.Array,  # (B,)
    train: bool = False,
) -> Tuple[jax.Array, dict]:
    """-> (speaker embedding (B, emb_dim), new_params)."""
    mask = length_mask(lengths, latents.shape[1])
    x, new_b0 = _tdnn(p["block0"], latents, cfg.dilations[0], train, mask)
    feats = []
    new_blocks = []
    for i, blk in enumerate(p["blocks"]):
        x, nb = _se_res2net(blk, cfg, x, cfg.dilations[i + 1], train, mask)
        feats.append(x)
        new_blocks.append(nb)
    x = jnp.concatenate(feats, axis=-1)
    x, new_mfa = _tdnn(p["mfa"], x, cfg.dilations[-1], train, mask)

    # attentive statistics pooling with global context
    mean, std = _masked_stats(x, mask)
    t = x.shape[1]
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
    )
    a = nn.conv1d(p["asp"]["attn1"], ctx, padding=0)
    new_asp = p["asp"]
    if "attn_tdnn_bn" in p["asp"]:
        # speechbrain ASP wraps its attention conv in a TDNNBlock
        # (conv -> ReLU -> BN -> tanh); converted reference SV checkpoints
        # carry that BN (utils/torch_convert.convert_sv_state_dict)
        a, new_attn_bn = nn.batchnorm(p["asp"]["attn_tdnn_bn"], jax.nn.relu(a),
                                      train, mask)
        new_asp = dict(p["asp"])
        new_asp["attn_tdnn_bn"] = new_attn_bn
    attn = jnp.tanh(a)
    attn = nn.conv1d(p["asp"]["attn2"], attn, padding=0).astype(jnp.float32)
    attn = jnp.where(mask[..., None], attn, nn.mask_value(jnp.float32))
    w = jax.nn.softmax(attn, axis=1).astype(x.dtype)
    mu = (x * w).sum(axis=1, keepdims=True)
    sg = jnp.sqrt(jnp.maximum((x ** 2 * w).sum(axis=1, keepdims=True) - mu ** 2, 1e-12))
    pooled = jnp.concatenate([mu, sg], axis=-1)  # (B, 1, 2*C)

    pooled, new_bn = nn.batchnorm(p["asp_bn"], pooled, train)
    emb = nn.conv1d(p["fc"], pooled, padding=0)[:, 0, :]
    new_p = dict(p)
    new_p.update({"block0": new_b0, "blocks": new_blocks, "mfa": new_mfa,
                  "asp": new_asp, "asp_bn": new_bn})
    return emb, new_p
