"""Exponential moving average of parameters (reference: teacher.py:85-87,
ema_pytorch EMA beta=0.9999, update_every=1 — the EMA weights are what DMD2
distillation initializes from, distill.py:24,156-159)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # materialize independent buffers: params and EMA are both donated by the
    # train step, so they must never alias
    return jax.tree.map(lambda x: jnp.array(x, copy=True), params)


def ema_update(ema_params, params, beta: float = 0.9999):
    return jax.tree.map(lambda e, p: beta * e + (1.0 - beta) * p, ema_params, params)
