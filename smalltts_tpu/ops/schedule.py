"""Diffusion noise schedule: shifted-cosine (SimpleTTS-style).

Behavioral parity with the reference schedule
(reference: src/smalltts/train/utils.py:12-22 and src/server/src/pipeline.rs:216-222):

    alpha_t^2 = cos^2(pi/2 * t)
    logSNR    = log(alpha_t^2 / (1 - alpha_t^2))
    logSNR_s  = logSNR + 2*log(0.5)          # shift toward noisier
    alpha     = sqrt(sigmoid(logSNR_s)),  sigma = sqrt(1 - sigmoid(logSNR_s))

Everything is pure jnp so it traces into any jitted graph (sampler hot loop,
training steps) with no host round-trips.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_SHIFT = 2.0 * math.log(0.5)


def get_alpha_sigma(
    t: jax.Array, eps: float = 1e-5
) -> Tuple[jax.Array, jax.Array]:
    """Shifted-cosine schedule. `t` of any shape in [0, 1]; returns (alpha, sigma)."""
    t = jnp.clip(t, eps, 1.0 - 1e-5)
    alpha_t_sq = jnp.cos(math.pi / 2.0 * t) ** 2
    log_snr = jnp.log(alpha_t_sq / (1.0 - alpha_t_sq))
    alpha_sq = jax.nn.sigmoid(log_snr + _SHIFT)
    return jnp.sqrt(alpha_sq), jnp.sqrt(1.0 - alpha_sq)


def apply_noise(
    latents: jax.Array, t: jax.Array, noise: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Noise `latents` (B, T, D) at per-sample timestep `t` (B,).

    Returns (noised, true_velocity):
        noised   = alpha * x + sigma * eps
        velocity = alpha * eps - sigma * x
    (reference: src/smalltts/train/utils.py:54-67). The caller supplies `noise`
    explicitly (jax.random) so the op stays pure and parity tests can inject
    fixed noise.
    """
    alpha, sigma = get_alpha_sigma(t)
    alpha = alpha[:, None, None]
    sigma = sigma[:, None, None]
    noised = alpha * latents + sigma * noise
    velocity = alpha * noise - sigma * latents
    return noised, velocity


def random_cond_mask(
    key: jax.Array, lengths: jax.Array, max_len: int
) -> jax.Array:
    """Random contiguous conditioning span per sample: (B, max_len) bool with a
    True run of random length < length/2 at a random start (functional
    equivalent of reference train/utils.py:26-37 `get_random_cond`, which is
    present-but-unused in the reference scripts; kept for inventory parity).
    """
    k1, k2 = jax.random.split(key)
    b = lengths.shape[0]
    half = jnp.maximum(lengths // 2, 1)
    span = (jax.random.uniform(k1, (b,)) * half).astype(lengths.dtype)
    max_start = jnp.maximum(lengths - span, 1)
    start = (jax.random.uniform(k2, (b,)) * max_start).astype(lengths.dtype)
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return (pos >= start[:, None]) & (pos < (start + span)[:, None])


def x_pred_from_velocity(
    x_t: jax.Array, velocity: jax.Array, t: jax.Array
) -> jax.Array:
    """Posterior-mean estimate x0 = alpha * x_t - sigma * v (reference:
    src/scripts/train/dmd2/distill.py:127-130, src/smalltts/infer/onnx.py:125)."""
    alpha, sigma = get_alpha_sigma(t)
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    return alpha.reshape(shape) * x_t - sigma.reshape(shape) * velocity
