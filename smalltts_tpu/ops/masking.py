"""Length masks and mask utilities (reference: src/smalltts/train/utils.py:41-50).

TPU-first: masks are built with broadcasted iota (no per-row Python loops like
the reference), so they trace into jitted graphs with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) int lengths -> (B, max_len) bool mask, True for valid positions."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked MSE over (B, T, D) with (B, T) mask — denominator counts
    valid *elements* (mask broadcast over feature dim), matching
    `(diff * valid).sum() / valid.sum()` with valid expanded to D channels.

    Accumulates in float32 regardless of input dtype: under bf16
    mixed-precision training the sum over B*T*D squared errors would lose
    most of its mantissa in bf16 (the loss IS the training signal)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    valid = jnp.broadcast_to(mask[..., None], pred.shape).astype(jnp.float32)
    diff = (pred - target) ** 2 * valid
    return diff.sum() / jnp.maximum(valid.sum(), 1.0)
