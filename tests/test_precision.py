"""Mixed-precision training (ops/precision.py).

The reference trains under torch autocast on CUDA with RoPE pinned to fp32
(reference: src/smalltts/models/backbone/dit.py:159). The TPU design casts
fp32 master params to a bf16 compute view inside the loss; these tests pin
the three properties that make that safe:

1. the bf16 graph really computes in bf16 (operand dtypes, not a silent
   promotion back to fp32),
2. gradients land on the fp32 masters and point the same way as the fp32
   gradients (direction, not bitwise — bf16 rounds),
3. a full jitted teacher step under bf16 stays finite and updates params.
"""

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from tiny import TINY_BACKBONE

from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch
from smalltts_tpu.models.backbone import init_backbone
from smalltts_tpu.ops.precision import cast_floats
from smalltts_tpu.train.teacher import (
    TeacherTrainConfig,
    make_teacher_step,
    teacher_loss,
)


def _batch(bs=2):
    rng = np.random.default_rng(0)
    dcfg = DummyDataConfig(batch_size=bs, max_latents=32, max_phonemes=16,
                           max_ref=8, latent_dim=TINY_BACKBONE.latent_dim)
    return {k: jnp.asarray(v) for k, v in dummy_batch(rng, dcfg).items()
            if k != "texts"}


def test_cast_floats_only_touches_float_leaves():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "ids": jnp.ones((3,), jnp.int32),
            "flag": jnp.array(True)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == jnp.int32
    assert out["flag"].dtype == jnp.bool_


def test_bf16_graph_actually_computes_in_bf16():
    """The lowered loss must carry bf16 dot OPERANDS — a silent jnp
    promotion back to fp32 would make the knob a no-op (the failure mode
    this guards: one fp32 input upcasts every downstream op)."""
    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    batch = _batch()
    tc = TeacherTrainConfig(batch_size=2, compute_dtype="bfloat16")
    txt = jax.jit(
        lambda p, b, k: teacher_loss(p, TINY_BACKBONE, b, k, tc)
    ).lower(params, batch, jax.random.PRNGKey(1)).as_text()
    bf16_dot_operands = re.findall(
        r"stablehlo\.dot_general[^\n]*:\s*\(tensor<[0-9x]*bf16>", txt)
    assert len(bf16_dot_operands) >= 10, (
        f"only {len(bf16_dot_operands)} bf16-operand dots — "
        "the compute cast is being promoted away")


def test_bf16_gradients_match_fp32_direction():
    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    batch = _batch()
    key = jax.random.PRNGKey(1)

    def grads(cdt):
        tc = TeacherTrainConfig(batch_size=2, compute_dtype=cdt)
        _, g = jax.value_and_grad(teacher_loss)(
            params, TINY_BACKBONE, batch, key, tc)
        return g

    g32, g16 = grads("float32"), grads("bfloat16")
    # masters stay fp32: gradient dtype must be fp32 in BOTH modes
    assert all(g.dtype == jnp.float32 for g in jax.tree.leaves(g16))
    flat32 = jnp.concatenate([g.ravel() for g in jax.tree.leaves(g32)])
    flat16 = jnp.concatenate([g.ravel() for g in jax.tree.leaves(g16)])
    cos = jnp.vdot(flat32, flat16) / (
        jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    assert float(cos) > 0.99, f"bf16 grad diverged: cosine {float(cos):.4f}"


def test_full_bf16_teacher_step_updates_and_stays_finite():
    from smalltts_tpu.train.ema import ema_init
    from smalltts_tpu.train.optim import teacher_optimizer

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    tx, _ = teacher_optimizer(params, 100)
    opt_state = tx.init(params)
    ema_params = ema_init(params)
    batch = _batch()
    tc = TeacherTrainConfig(batch_size=2, compute_dtype="bfloat16")
    step = make_teacher_step(TINY_BACKBONE, tx, tc)
    before = jax.tree.map(jnp.copy, params)
    for i in range(2):
        params, opt_state, ema_params, loss = step(
            params, opt_state, ema_params, batch, jax.random.PRNGKey(i))
        assert jnp.isfinite(loss), f"step {i} loss {loss}"
    # params moved, and stayed fp32 masters
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         before, params)
    assert max(jax.tree.leaves(moved)) > 0
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params)
               if jnp.issubdtype(p.dtype, jnp.floating))
