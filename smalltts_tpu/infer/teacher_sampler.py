"""Teacher (many-step, double-CFG) sampler.

The reference ships no standalone teacher inference path — its CFG sampling
logic exists only inside distillation (reference:
src/scripts/train/dmd2/distill.py:60-134: text scale 2.0, speaker scale 1.5
via 3x batch replication). This sampler exposes it: validate a flow-matching
teacher checkpoint end-to-end (e.g. 32..128 steps) before distilling, or
generate higher-fidelity references. Same re-noising recurrence as the DMD
student loop but with CFG-combined velocity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from smalltts_tpu.models.backbone import BackboneConfig
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.ops.schedule import get_alpha_sigma


from smalltts_tpu.models.backbone import cfg_velocity  # noqa: F401  (shared
# implementation lives beside backbone_forward; re-exported here because the
# teacher sampler is this module's public surface)


def _cfg_conditions(params, cfg: BackboneConfig, ref, ref_len, ph, ph_mask):
    """The three CFG condition sets — (cond, no-text, no-speaker) — encoded
    ONCE and concatenated along batch, for the cached denoise path.

    backbone_forward-based CFG (cfg_velocity) re-runs the style/text
    encoders and every cross-KV projection on EVERY step; conditions don't
    depend on the step, so a 32-step sample re-did that work 32x."""
    from smalltts_tpu.models.backbone import encode_conditions

    # ONE batched encode over the 3x-replicated inputs — the same
    # [cond, text-dropped, speaker-dropped] replication order cfg_velocity
    # pins — instead of three sequential passes hand-reassembled by zipping
    # CrossKV's private field layout (a dit.py layout change silently broke
    # only that call site, review r3). Identity: encoders act per-sample,
    # so batching the variants is exact.
    z = jnp.zeros_like
    ref3 = jnp.concatenate([ref, ref, z(ref)], axis=0)
    ref_len3 = jnp.concatenate([ref_len, ref_len, z(ref_len)], axis=0)
    ph3 = jnp.concatenate([ph, z(ph), ph], axis=0)
    ph_mask3 = jnp.concatenate([ph_mask, z(ph_mask), ph_mask], axis=0)
    return encode_conditions(params, cfg, ref3, ref_len3, ph3, ph_mask3)


def make_teacher_sampler(
    cfg: BackboneConfig,
    num_steps: int = 128,
    cfg_scale_text: float = 2.0,
    cfg_scale_speaker: float = 1.5,
):
    """Jitted many-step sampler: (params, ref, ref_len, ph, ph_len, seq_len,
    key, t_bucket) -> latents (B, T, D).

    Conditions encode once (not per step, unlike the reference's CFG inside
    distillation, distill.py:75-105), and the time-embedding +
    adaLN-modulation weight passes hoist across all steps like the serving
    samplers."""
    from smalltts_tpu.models.backbone import denoise_step, time_embedding
    from smalltts_tpu.models.dit import precompute_step_modulations

    @partial(jax.jit, static_argnames=("t_bucket",))
    def sample(params, ref, ref_len, ph, ph_len, seq_lens, key, t_bucket: int):
        b = ref.shape[0]
        ph_mask = length_mask(ph_len, ph.shape[1])
        mask = length_mask(seq_lens, t_bucket)
        ts = jnp.linspace(1.0, 0.0, num_steps, dtype=jnp.float32)
        x0 = jnp.zeros((b, t_bucket, cfg.latent_dim), jnp.float32)
        cond3 = _cfg_conditions(params, cfg, ref, ref_len, ph, ph_mask)
        mask3 = jnp.concatenate([mask] * 3, axis=0)
        t_embs = time_embedding(params["time_embedding"], ts, cfg.time_embed_dim)
        mods, finals = precompute_step_modulations(params["dit"], t_embs)

        def body(i, carry):
            x_pred, k = carry
            alpha, sigma = get_alpha_sigma(ts[i])
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, x_pred.shape, x_pred.dtype)
            x_t = alpha * x_pred + sigma * noise
            t_vec = jnp.full((3 * b,), ts[i], jnp.float32)
            t_emb = jnp.broadcast_to(
                lax.dynamic_index_in_dim(t_embs, i, keepdims=False)[None, :],
                (3 * b, t_embs.shape[-1]))
            v3 = denoise_step(
                params, cfg, jnp.concatenate([x_t] * 3, axis=0), mask3,
                t_vec, cond3, t_emb=t_emb,
                step_mods=(
                    lax.dynamic_index_in_dim(mods, i, axis=1, keepdims=False),
                    lax.dynamic_index_in_dim(finals, i, keepdims=False),
                ),
            )
            v_c, v_no_text, v_no_spk = jnp.split(v3, 3, axis=0)
            v = (v_c + cfg_scale_text * (v_c - v_no_text)
                 + cfg_scale_speaker * (v_c - v_no_spk))
            return (alpha * x_t - sigma * v, k)

        x_pred, _ = lax.fori_loop(0, num_steps, body, (x0, key))
        return jnp.where(mask[..., None], x_pred, 0.0)

    return sample
