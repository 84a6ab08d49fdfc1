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


def test_teacher_sampler_cached_cfg_matches_full_forward():
    """The rewritten teacher sampler encodes conditions once and runs the
    cached denoise path with hoisted step modulations; its CFG velocity
    must equal the original backbone_forward-based cfg_velocity."""
    import jax.numpy as jnp

    from smalltts_tpu.infer.teacher_sampler import _cfg_conditions, cfg_velocity
    from smalltts_tpu.models.backbone import denoise_step, init_backbone, time_embedding
    from smalltts_tpu.models.dit import precompute_step_modulations
    from smalltts_tpu.ops.masking import length_mask
    from tiny import TINY_BACKBONE

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    # nonzero gates + head so the compared paths are load-bearing
    lin = params["dit"]["blocks"]["attn_norm"]["linear"]
    lin["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(1), lin["w"].shape)
    params["velocity"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(2), params["velocity"]["w"].shape)

    rng = np.random.RandomState(3)
    b, t_len, r, p = 2, 10, 6, 7
    x_t = jnp.asarray(rng.randn(b, t_len, 64), jnp.float32)
    ref = jnp.asarray(rng.randn(b, r, 64), jnp.float32)
    ref_len = jnp.asarray([r, 4])
    ph = jnp.asarray(rng.randint(1, 190, (b, p)))
    ph_mask = length_mask(jnp.asarray([p, 5]), p)
    mask = length_mask(jnp.asarray([t_len, 8]), t_len)
    t_vec = jnp.full((b,), 0.6, jnp.float32)

    want = cfg_velocity(params, TINY_BACKBONE, x_t, ref, ref_len, mask, ph,
                        ph_mask, t_vec, 2.0, 1.5)

    cond3 = _cfg_conditions(params, TINY_BACKBONE, ref, ref_len, ph, ph_mask)
    ts = jnp.asarray([0.6], jnp.float32)
    t_embs = time_embedding(params["time_embedding"], ts,
                            TINY_BACKBONE.time_embed_dim)
    mods, finals = precompute_step_modulations(params["dit"], t_embs)
    v3 = denoise_step(
        params, TINY_BACKBONE, jnp.concatenate([x_t] * 3, axis=0),
        jnp.concatenate([mask] * 3, axis=0), jnp.full((3 * b,), 0.6),
        cond3, t_emb=jnp.broadcast_to(t_embs[0][None], (3 * b, t_embs.shape[-1])),
        step_mods=(mods[:, 0], finals[0]),
    )
    v_c, v_nt, v_ns = jnp.split(v3, 3, axis=0)
    got = v_c + 2.0 * (v_c - v_nt) + 1.5 * (v_c - v_ns)
    valid = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(got) * valid,
                               np.asarray(want) * valid, atol=2e-5, rtol=1e-4)
