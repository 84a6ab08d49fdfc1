"""Shared loss primitives used across trainers."""

import jax
import jax.numpy as jnp


def cosine_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """1 - cosine similarity along the last axis, norm-guarded.

    The SINGLE implementation behind both the DMD distiller's SV loss
    (reference: distill.py:350-356) and the SV student trainer
    (reference: sv.py:73-78) — an epsilon or scale change must apply to
    both or their objectives silently diverge."""
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
    return 1.0 - (x * y).sum(axis=-1)
