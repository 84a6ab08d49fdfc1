"""Sampler math parity: the fused lax.fori_loop must reproduce the reference's
step recurrence exactly (host-loop oracle with injected noise).

Reference recurrence (src/smalltts/infer/onnx.py:100-125): x_pred starts at
zeros; for t in linspace(1, 0, 4): x_t = a*x_pred + s*FRESH noise;
v = denoiser(x_t, t); x_pred = a*x_t - s*v.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny import TINY_BACKBONE
from smalltts_tpu.infer.sampler import sample_latents
from smalltts_tpu.models.backbone import denoise_step, encode_conditions, init_backbone
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.ops.schedule import get_alpha_sigma


def test_sample_loop_matches_host_oracle():
    cfg = TINY_BACKBONE
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    # randomize velocity head so outputs are non-zero
    params["velocity"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["velocity"]["w"].shape
    )

    b, t_bucket, r, p = 2, 16, 8, 6
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.randn(b, r, 64), jnp.float32)
    ref_lens = jnp.asarray([r, 5], jnp.int32)
    ph = jnp.asarray(rng.randint(1, 198, (b, p)), jnp.int32)
    ph_lens = jnp.asarray([p, 4], jnp.int32)
    seq_lens = jnp.asarray([15, 10], jnp.int32)
    num_steps = 4
    noises = jnp.asarray(rng.randn(num_steps, b, t_bucket, 64), jnp.float32)

    fused = sample_latents(
        params, cfg, ref, ref_lens, ph, ph_lens, seq_lens,
        jax.random.PRNGKey(0), num_steps=num_steps, noises=noises,
    )

    # host-loop oracle with the same injected noise
    ph_mask = length_mask(ph_lens, p)
    mask = length_mask(seq_lens, t_bucket)
    cond = encode_conditions(params, cfg, ref, ref_lens, ph, ph_mask)
    x_pred = jnp.zeros((b, t_bucket, 64))
    for i, t_val in enumerate(np.linspace(1.0, 0.0, num_steps, dtype=np.float32)):
        alpha, sigma = get_alpha_sigma(jnp.asarray(t_val))
        x_t = alpha * x_pred + sigma * noises[i]
        t_vec = jnp.full((b,), t_val, jnp.float32)
        v = denoise_step(params, cfg, x_t, mask, t_vec, cond)
        x_pred = alpha * x_t - sigma * v
    oracle = jnp.where(mask[..., None], x_pred, 0.0)

    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(oracle), atol=1e-5, rtol=1e-5
    )
    # padded tail must be exactly zero
    assert float(jnp.abs(fused[1, 10:]).max()) == 0.0
