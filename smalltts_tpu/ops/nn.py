"""Functional NN primitives: param-pytree init + pure apply functions.

Design: every layer is `init_*(key, ...) -> dict` plus a pure apply function.
No module objects, no framework — params are plain nested dicts of jnp arrays,
so sharding (jax.sharding.NamedSharding), donation, and checkpointing operate
on a transparent pytree. Matmuls always pass `preferred_element_type=float32`
so bf16 params accumulate in fp32 on the MXU; norms compute in fp32 and cast
back, the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------- init


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """Torch-compatible fan-in uniform init; weight stored (in_dim, out_dim)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), bound, dtype)
    return p


def init_zeros_linear(in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """Zero-initialized linear (adaLN-zero modulation / velocity head)."""
    p = {"w": jnp.zeros((in_dim, out_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def init_embedding(key, vocab: int, dim: int, dtype=jnp.float32):
    return {"w": jax.random.normal(key, (vocab, dim), dtype)}


def init_rmsnorm(shape, dtype=jnp.float32):
    if isinstance(shape, int):
        shape = (shape,)
    return {"scale": jnp.ones(shape, dtype)}


def init_conv1d(key, c_in: int, c_out: int, k: int, groups: int = 1, dtype=jnp.float32):
    """Torch Conv1d-compatible init; kernel stored (k, c_in//groups, c_out)
    — the HIO layout for channel-last lax convolutions."""
    kw, kb = jax.random.split(key)
    fan_in = (c_in // groups) * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(kw, (k, c_in // groups, c_out), bound, dtype),
        "b": _uniform(kb, (c_out,), bound, dtype),
    }


# -------------------------------------------------------------------------- apply


def linear(p, x: jax.Array) -> jax.Array:
    if "w_q" in p:
        # int8 weight streaming (dit.quantize_stream_weights): the weight
        # lives in HBM as int8 + per-output-channel scale — half the bytes
        # of bf16 on the stream-bound denoise path — and dequantizes with a
        # plain convert+multiply that XLA fuses into the matmul's operand
        # read (NOT a Pallas kernel: those measured as scheduling barriers,
        # PERF.md round-3 w8 sections)
        w = p["w_q"].astype(x.dtype) * p["scale"].astype(x.dtype)
    else:
        w = p["w"].astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def embedding(p, ids: jax.Array) -> jax.Array:
    return jnp.take(p["w"], ids, axis=0)


def rmsnorm(p, x: jax.Array, eps: float) -> jax.Array:
    """RMS norm over the last dim, scale may be (D,) or (H, D) broadcast
    (reference: src/smalltts/models/backbone/dit.py:42-53)."""
    xf = x.astype(jnp.float32)
    inv = lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv * p["scale"].astype(jnp.float32)).astype(x.dtype)


def layernorm_noaffine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * lax.rsqrt(var + eps)).astype(x.dtype)


def conv1d(p, x: jax.Array, groups: int = 1, padding: str | int = "SAME") -> jax.Array:
    """Channel-last grouped 1-D conv: x (B, T, C_in) -> (B, T', C_out)."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = padding
    # f32 accumulation is only REQUESTED for f32 inputs: under bf16
    # mixed-precision training, conv's transpose rule cannot take a f32
    # cotangent against bf16 weights (lax.conv requires matching dtypes),
    # and the TPU MXU accumulates bf16 convs in f32 internally regardless —
    # the request would only pin the pre-bias rounding point
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=pad,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=pet,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def init_batchnorm(ch: int, dtype=jnp.float32):
    """BatchNorm1d params+state; `mean`/`var` are running state (exclude them
    from the optimizer via smalltts_tpu.train.optim.trainable_mask)."""
    return {
        "scale": jnp.ones((ch,), dtype),
        "bias": jnp.zeros((ch,), dtype),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def batchnorm(p, x: jax.Array, train: bool, mask: Optional[jax.Array] = None,
              momentum: float = 0.1, eps: float = 1e-5):
    """Channel-last masked BatchNorm over (B, T, C). Returns (y, new_params)
    where new_params carries updated running stats when train=True."""
    xf = x.astype(jnp.float32)
    if train:
        if mask is not None:
            m = mask[..., None].astype(jnp.float32)
            count = jnp.maximum(m.sum(), 1.0)
            mean = (xf * m).sum(axis=(0, 1)) / count
            var = (((xf - mean) ** 2) * m).sum(axis=(0, 1)) / count
        else:
            mean = xf.mean(axis=(0, 1))
            var = xf.var(axis=(0, 1))
        # DELIBERATE deviation from torch BatchNorm1d: running_var tracks
        # the BIASED batch variance. torch's unbiased correction n/(n-1)
        # doubles the tracked variance on ECAPA's post-pooling BN (n = B =
        # 2 at the reference's batch size), and the synthetic SV quality
        # loop measured the resulting train/eval mismatch directly:
        # teacher-alignment after distillation 0.9999 (biased) vs 0.596
        # (unbiased). Converted torch checkpoints carry their own running
        # stats, so inference parity is unaffected either way.
        new_p = dict(p)
        new_p["mean"] = (1 - momentum) * p["mean"] + momentum * mean
        new_p["var"] = (1 - momentum) * p["var"] + momentum * var
    else:
        mean, var = p["mean"], p["var"]
        new_p = p
    y = (xf - mean) * lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32) + p[
        "bias"
    ].astype(jnp.float32)
    return y.astype(x.dtype), new_p


def groupnorm(scale: jax.Array, bias: jax.Array, x: jax.Array, num_groups: int = 1,
              eps: float = 1e-5, mask: Optional[jax.Array] = None) -> jax.Array:
    """Channel-last GroupNorm over (B, T, C) — per-sample, per-timestep groups
    of channels (torch GroupNorm semantics on (B, C, T) normalizes over C,T;
    here we normalize over T and the group's channels).

    `mask` (B, T) bool restricts the statistics to valid frames: without it
    the mean/var dilute with padded zeros, so valid positions' outputs
    depend on the padding bucket size (review r3 — this is what torch
    GroupNorm does, hence mask=None for weight-exact parity and mask set on
    the pad_invariant serving/training path)."""
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, num_groups, c // num_groups)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None, None]
        count = jnp.maximum(m.sum(axis=1, keepdims=True) * xf.shape[-1], 1.0)
        mean = (xf * m).sum(axis=(1, 3), keepdims=True) / count
        var = (((xf - mean) ** 2) * m).sum(axis=(1, 3), keepdims=True) / count
    else:
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(b, t, c)
    return (xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def mask_value(dtype) -> float:
    """Large-negative finite additive-mask value (safe softmax; keeps padded
    rows finite where torch SDPA would produce NaN that downstream masking
    then overwrites — consumed outputs are identical)."""
    return -1e9 if dtype == jnp.float32 else -3e4


import os as _os

# Pallas fused attention on TPU: opt-in via env until benchmarked faster by
# default (bench.py compares both paths)
_USE_PALLAS_ATTENTION = _os.environ.get("SMALLTTS_PALLAS_ATTENTION", "0") == "1"


def set_pallas_attention(enabled: bool) -> None:
    """Route sdpa through the Pallas kernel for FUTURE traces only: the
    flag is read at trace time and jit caches do not key on it, so any
    already-jitted function keeps the implementation it was traced with.
    For an A/B measurement, set the flag BEFORE the first call (or use
    fresh jit wrappers per arm) — flipping it between timings of one
    warmed function silently times the same path twice (review r3)."""
    global _USE_PALLAS_ATTENTION
    _USE_PALLAS_ATTENTION = enabled


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention, (B, H, Tq, D) x (B, H, Tk, D).

    key_mask: optional (B, Tk) bool — True = attend. bias: optional additive
    (broadcastable to (B, H, Tq, Tk)). Softmax in fp32. On TPU the fused
    Pallas kernel (ops.pallas.attention) handles the masked case when enabled.
    """
    if (
        _USE_PALLAS_ATTENTION
        and bias is None
        and key_mask is not None
        and jax.default_backend() == "tpu"
    ):
        from smalltts_tpu.ops.pallas.attention import fused_attention

        return fused_attention(q, k, v, key_mask)
    d = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    if key_mask is not None:
        scores = jnp.where(
            key_mask[:, None, None, :], scores, mask_value(jnp.float32)
        )
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )
