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
