"""DMD2 distillation: one full step (student + discriminator + 5x scorer)
on tiny configs, finite losses, params actually move."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny import TINY_BACKBONE
from test_aux_models import TINY_ASR, TINY_SV
from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch
from smalltts_tpu.models.asr import ASRConfig, init_asr
from smalltts_tpu.models.backbone import init_backbone
from smalltts_tpu.models.conformer import ConformerConfig
from smalltts_tpu.models.discriminator import DiscriminatorConfig, init_discriminator
from smalltts_tpu.models.sv import SVConfig, init_sv
from smalltts_tpu.train.distill import (
    DistillConfig,
    make_disc_step,
    make_scorer_step,
    make_student_step,
)
from smalltts_tpu.train.optim import distill_optimizer

TINY_DISC = DiscriminatorConfig(
    latent_dim=64, transformer_dim=TINY_BACKBONE.hidden_dim,
    ref_dim=TINY_BACKBONE.hidden_dim, model_dim=32, num_tail_layers=2,
    conformer=ConformerConfig(input_dim=32, num_heads=4, ffn_dim=64, num_layers=2,
                              depthwise_conv_kernel_size=7, use_group_norm=True),
)
TINY_ASR64 = ASRConfig(
    input_dim=64,
    conformer=ConformerConfig(input_dim=64, num_heads=4, ffn_dim=64, num_layers=2,
                              depthwise_conv_kernel_size=9),
)
TINY_SV64 = SVConfig(
    input_dim=64, emb_dim=8, channels=(24, 24, 24, 24, 72),
    attention_channels=8, res2net_scale=4, se_channels=8,
)


def _randomize_velocity_head(params, key):
    """Fresh init zero-inits the velocity head (like the reference), which
    makes every backbone output exactly zero — degenerate for DMD. Simulate a
    trained checkpoint by randomizing the head."""
    params = dict(params)
    w = params["velocity"]["w"]
    params["velocity"] = {
        "w": 0.1 * jax.random.normal(key, w.shape, w.dtype),
        "b": params["velocity"]["b"],
    }
    return params


def test_distill_full_step():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 9)
    teacher = _randomize_velocity_head(init_backbone(ks[0], TINY_BACKBONE), ks[6])
    student = _randomize_velocity_head(init_backbone(ks[1], TINY_BACKBONE), ks[7])
    scorer = _randomize_velocity_head(init_backbone(ks[2], TINY_BACKBONE), ks[8])
    asr = init_asr(ks[3], TINY_ASR64)
    sv = init_sv(ks[4], TINY_SV64)
    disc = init_discriminator(ks[5], TINY_DISC)

    tx_s = distill_optimizer(student)
    tx_d = distill_optimizer(disc)
    tx_sc = distill_optimizer(scorer)
    opt_s, opt_d, opt_sc = tx_s.init(student), tx_d.init(disc), tx_sc.init(scorer)

    train_cfg = DistillConfig(scorer_updates=1, asr_start_step=0, sv_start_step=0)
    student_step = make_student_step(
        TINY_BACKBONE, TINY_DISC, TINY_ASR64, TINY_SV64, tx_s, train_cfg
    )
    disc_step = make_disc_step(TINY_BACKBONE, TINY_DISC, tx_d)
    scorer_step = make_scorer_step(TINY_BACKBONE, tx_sc, n_updates=1)

    cfgd = DummyDataConfig(batch_size=2, max_phonemes=10, min_phonemes=4,
                           max_latents=16, min_latents=8, max_ref=8, min_ref=4)
    batch = dummy_batch(np.random.default_rng(0), cfgd)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}

    before = jax.tree.map(lambda x: np.asarray(x).copy(), student)
    student, opt_s, carry, metrics = student_step(
        student, opt_s, teacher, scorer, disc, asr, sv, batch,
        jnp.asarray(10_000), jax.random.PRNGKey(1),
    )
    for name, v in metrics.items():
        assert np.isfinite(float(v)), f"{name} not finite"
    assert float(metrics["dmd_grad_mag"]) > 0, "DMD gradient degenerate"
    assert float(metrics["st_pseudo"]) > 0
    # feats carry: (B, L, T, H)
    assert carry["feats_fake"].shape == (2, TINY_BACKBONE.dit.n_blocks, 16, TINY_BACKBONE.hidden_dim)

    disc, opt_d, d_loss = disc_step(disc, opt_d, scorer, batch, carry, jax.random.PRNGKey(2))
    assert np.isfinite(float(d_loss))

    scorer, opt_sc, s_loss = scorer_step(scorer, opt_sc, student, batch, carry, jax.random.PRNGKey(3))
    assert np.isfinite(float(s_loss))

    # at exact init the adaLN-zero gates zero out most gradient paths (as in
    # the reference); assert global movement, led by the velocity head
    total_delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(jax.tree.leaves(student), jax.tree.leaves(before))
    )
    assert total_delta > 1e-6, "student params unchanged"
    vel_delta = np.abs(
        np.asarray(student["velocity"]["w"]) - before["velocity"]["w"]
    ).max()
    assert vel_delta > 0


def test_disc_step_updates_batchnorm_running_stats():
    """disc_step must thread BN running stats through the update for a
    BatchNorm-configured discriminator — discarding the new-params froze
    mean=0/var=1 for the whole run (review r3). The DEFAULT disc is
    GroupNorm-only (like the reference, discriminator.py:68), so this
    exercises the explicit use_group_norm=False variant."""
    import dataclasses

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 4)
    scorer = _randomize_velocity_head(init_backbone(ks[0], TINY_BACKBONE), ks[3])
    bn_disc_cfg = dataclasses.replace(
        TINY_DISC,
        conformer=dataclasses.replace(TINY_DISC.conformer,
                                      use_group_norm=False))
    disc = init_discriminator(ks[1], bn_disc_cfg)
    tx_d = distill_optimizer(disc)
    opt_d = tx_d.init(disc)
    disc_step = make_disc_step(TINY_BACKBONE, bn_disc_cfg, tx_d)

    cfgd = DummyDataConfig(batch_size=2, max_phonemes=10, min_phonemes=4,
                           max_latents=16, min_latents=8, max_ref=8, min_ref=4)
    batch = dummy_batch(np.random.default_rng(1), cfgd)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}
    b, t = batch["latents"].shape[:2]
    carry = {
        "ts": jnp.full((b,), 0.5, jnp.float32),
        "feats_fake": jnp.ones(
            (b, TINY_BACKBONE.dit.n_blocks, t, TINY_BACKBONE.hidden_dim),
            jnp.float32),
        "x_t": jnp.ones((b, t, TINY_BACKBONE.latent_dim), jnp.float32),
        "ref_seq": jnp.ones((b, 8, TINY_BACKBONE.hidden_dim), jnp.float32),
        "ref_mask": jnp.ones((b, 8), bool),
    }

    def bn_stats(p):
        flat = jax.tree_util.tree_flatten_with_path(p)[0]
        return {jax.tree_util.keystr(path): np.asarray(v)
                for path, v in flat
                if str(getattr(path[-1], "key", "")) in ("mean", "var")}

    before = bn_stats(disc)
    assert before, "discriminator has no BN stats leaves?"
    disc2, _, loss = disc_step(disc, opt_d, scorer, batch, carry,
                               jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    after = bn_stats(disc2)
    moved = sum(float(np.abs(after[k] - before[k]).sum()) for k in before)
    assert moved > 1e-8, "BN running stats did not update on a disc step"
