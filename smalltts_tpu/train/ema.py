"""Exponential moving average of parameters (reference: teacher.py:85-87,
ema_pytorch EMA beta=0.9999, update_every=1 — the EMA weights are what DMD2
distillation initializes from, distill.py:24,156-159).

The reference leaves ema_pytorch's decay WARMUP defaults active
(update_after_step=100, inv_gamma=1.0, power=2/3): the EMA copies the model
for the first 100 steps, then tracks with decay 1-(1+n)^(-2/3) clamped at
beta — ~0.992 at step 1.5k, ~0.9998 at 330k, reaching 0.9999 only past 1M
steps. A constant 0.9999 from step 0 leaves checkpoint_ema at ~86% random
init by the first save (0.9999^1500) and init-dominated for tens of
thousands of steps — the DMD2 student would initialize from near-random
weights (review r3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # materialize independent buffers: params and EMA are both donated by the
    # train step, so they must never alias
    return jax.tree.map(lambda x: jnp.array(x, copy=True), params)


def ema_decay(step: int, beta: float = 0.9999, update_after_step: int = 100,
              inv_gamma: float = 1.0, power: float = 2.0 / 3.0) -> float:
    """Effective decay at `step`, mirroring ema_pytorch.get_current_decay:
    copy (decay 0) through update_after_step, then 1-(1+epoch/inv_gamma)^-p
    clamped to [0, beta]."""
    epoch = max(step - update_after_step - 1, 0)
    if epoch <= 0:
        return 0.0
    return min(beta, 1.0 - (1.0 + epoch / inv_gamma) ** -power)


def ema_update(ema_params, params, beta=0.9999):
    """One EMA step; `beta` may be a python float or a traced scalar (the
    trainer passes ema_decay(step) so warmup stays out of the jitted graph)."""
    return jax.tree.map(lambda e, p: beta * e + (1.0 - beta) * p, ema_params, params)
