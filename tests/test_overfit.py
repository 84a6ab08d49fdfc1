"""Learning proof: the teacher trainer can overfit a tiny fixed dataset.

Finiteness/decrease-over-3-steps tests show plumbing works; this shows the
training loop actually LEARNS — flow-matching loss on a single repeated
batch must fall well below its initial value within a few hundred steps.
RUN_SLOW (a few minutes of CPU): the fast suite covers the same code paths
per-step."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="few hundred optimization steps; run with RUN_SLOW=1",
)


def test_teacher_overfits_fixed_batch():
    from smalltts_tpu.models.backbone import init_backbone
    from smalltts_tpu.train.ema import ema_init
    from smalltts_tpu.train.optim import adamw
    from smalltts_tpu.train.teacher import make_teacher_step
    from tests.tiny import TINY_BACKBONE

    rng = np.random.RandomState(0)
    batch = {
        "phonemes": jnp.asarray(rng.randint(1, 198, (2, 12)), jnp.int32),
        "phonemes_lengths": jnp.full((2,), 12, jnp.int32),
        "latents": jnp.asarray(rng.randn(2, 16, 64), jnp.float32),
        "latents_lengths": jnp.full((2,), 16, jnp.int32),
        "ref_latents": jnp.asarray(rng.randn(2, 8, 64), jnp.float32),
        "ref_latents_lengths": jnp.full((2,), 8, jnp.int32),
    }
    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    tx = adamw(params, 2e-3, clip_norm=1.0)
    opt_state = tx.init(params)
    ema = ema_init(params)
    step = make_teacher_step(TINY_BACKBONE, tx)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(400):
        key, sub = jax.random.split(key)
        params, opt_state, ema, loss = step(params, opt_state, ema, batch, sub)
        losses.append(float(loss))
    first = float(np.mean(losses[:20]))
    last = float(np.mean(losses[-20:]))
    assert np.isfinite(last)
    # flow-matching loss with random t/noise can't reach 0, but overfitting
    # a fixed batch must cut it decisively
    assert last < 0.6 * first, (first, last)


def test_imf_student_beats_one_step_teacher():
    """Distillation quality proof (goes with PERF.md "Few-step sampling
    headroom"): train the integral-velocity student against a frozen tiny
    teacher, then check a SINGLE student jump 1.0 -> 0.02 lands far closer
    to the teacher's fine (16-substep) ODE endpoint than a single teacher
    jump does — i.e. the student really integrates the trajectory, not just
    mimics instantaneous velocity. Real-data perceptual validation still
    requires assets; this pins the mechanism."""
    import optax

    from smalltts_tpu.models.backbone import encode_conditions, init_backbone
    from smalltts_tpu.ops.masking import length_mask
    from smalltts_tpu.ops.schedule import get_alpha_sigma
    from smalltts_tpu.train.imf import (
        ImfConfig,
        imf_velocity,
        init_imf_student,
        make_imf_step,
        teacher_rollout,
    )
    from tests.tiny import TINY_BACKBONE

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher = init_backbone(ks[0], TINY_BACKBONE)
    # random velocity head (init_backbone zero-inits it, which would make
    # every trajectory trivially constant)
    w = teacher["velocity"]["w"]
    teacher["velocity"] = {
        "w": 0.15 * jax.random.normal(ks[1], w.shape, w.dtype),
        "b": teacher["velocity"]["b"],
    }

    rng = np.random.RandomState(0)
    batch = {
        "phonemes": jnp.asarray(rng.randint(1, 198, (2, 10)), jnp.int32),
        "phonemes_lengths": jnp.asarray([10, 10], jnp.int32),
        "latents": jnp.asarray(rng.randn(2, 12, 64), jnp.float32),
        "latents_lengths": jnp.asarray([12, 12], jnp.int32),
        "ref_latents": jnp.asarray(rng.randn(2, 6, 64), jnp.float32),
        "ref_latents_lengths": jnp.asarray([6, 6], jnp.int32),
    }
    student = init_imf_student(teacher)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(5e-4))
    opt_state = tx.init(student)
    # focus_prob=0 (not the serving default 0.5): this test measures
    # UNIFORM interval learning on the rare 1.0 -> 0.02 jump, which the
    # serving-grid focus deliberately de-prioritizes (PERF.md round-4:
    # focus trades IMF-1/off-grid accuracy for the served IMF-2 grid)
    step = make_imf_step(TINY_BACKBONE, tx,
                         ImfConfig(rollout_substeps=4, focus_prob=0.0))
    key = jax.random.PRNGKey(1)
    for _ in range(400):
        key, sub = jax.random.split(key)
        student, opt_state, loss = step(student, opt_state, teacher, batch, sub)
        assert np.isfinite(float(loss))

    # evaluation: fixed noise, jump t=1.0 -> r=0.02 (in the trained range)
    cond = encode_conditions(
        teacher, TINY_BACKBONE, batch["ref_latents"],
        batch["ref_latents_lengths"], batch["phonemes"],
        length_mask(batch["phonemes_lengths"], 10),
    )
    mask = length_mask(batch["latents_lengths"], 12)
    z = jax.random.normal(jax.random.PRNGKey(9), (2, 12, 64), jnp.float32)
    t = jnp.full((2,), 1.0, jnp.float32)
    r = jnp.full((2,), 0.02, jnp.float32)

    x_fine = teacher_rollout(teacher, TINY_BACKBONE, z, mask, t, r, cond, 16)
    x_teacher1 = teacher_rollout(teacher, TINY_BACKBONE, z, mask, t, r, cond, 1)
    u = imf_velocity(student, TINY_BACKBONE, z, mask, t, r, cond)
    x_student1 = z - (t - r)[:, None, None] * u

    def err(x):
        return float(jnp.sqrt(jnp.mean((x - x_fine) ** 2)))

    # measured on this fixture: e_student/e_teacher ~ 0.57-0.60 after 400
    # steps (the 1.0->0.02 jump is the rarest training interval); 0.7 bounds
    # regressions while staying clear of run-to-run noise
    e_teacher, e_student = err(x_teacher1), err(x_student1)
    assert e_student < 0.7 * e_teacher, (e_student, e_teacher)
