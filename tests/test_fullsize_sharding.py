"""Full-size sharded compilation proof (round-2 VERDICT Missing #5).

The tp sharding rules had only ever been exercised at toy dims, where
divisibility/layout surprises don't live. Here the REAL 328M configuration
is AOT-compiled (`.lower().compile()` on ShapeDtypeStructs — no weights
materialized, compile-only) over dp=8 and dp=2 x tp=4 virtual CPU meshes,
for both the teacher train step and the fused serving graph, with output
shardings asserted. A mid-size tp=4-vs-single-device numerics check pins
the loss to a stated tolerance (the toy-size version lives in
tests/test_train.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smalltts_tpu.models.backbone import BackboneConfig, init_backbone
from smalltts_tpu.models.codec import CodecConfig, init_codec
from smalltts_tpu.parallel.mesh import make_mesh, param_shardings
from smalltts_tpu.train.optim import adamw
from smalltts_tpu.train.teacher import make_teacher_step, teacher_loss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

FULL = BackboneConfig()  # hidden 960 x 12 blocks, text 512x8, style 512x12


def _spec_tree(shapes, mesh):
    """ShapeDtypeStructs with shardings attached (AOT input spec)."""
    shardings = param_shardings(shapes, mesh)
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings,
    )


def _batch_spec(mesh, b=8, t_len=256, r=64, p=256):
    """Full serving-contract-sized teacher batch, dp-sharded on axis 0."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec(shape, dtype):
        return jax.ShapeDtypeStruct(
            shape, dtype,
            sharding=NamedSharding(mesh, P("dp", *([None] * (len(shape) - 1)))))

    return {
        "latents": spec((b, t_len, 64), jnp.float32),
        "latents_lengths": spec((b,), jnp.int32),
        "ref_latents": spec((b, r, 64), jnp.float32),
        "ref_latents_lengths": spec((b,), jnp.int32),
        "phonemes": spec((b, p), jnp.int32),
        "phonemes_lengths": spec((b,), jnp.int32),
    }


def _teacher_aot(mesh):
    """Lower + compile the full-size teacher step over `mesh`; return the
    compiled executable."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    p_shapes = jax.eval_shape(lambda k: init_backbone(k, FULL),
                              jax.random.PRNGKey(0))
    tx = adamw(p_shapes, 1e-4)
    opt_shapes = jax.eval_shape(tx.init, p_shapes)
    p_spec = _spec_tree(p_shapes, mesh)
    opt_spec = _spec_tree(opt_shapes, mesh)
    ema_spec = p_spec
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                    sharding=NamedSharding(mesh, P()))
    step = make_teacher_step(FULL, tx)
    lowered = step.lower(p_spec, opt_spec, ema_spec, _batch_spec(mesh),
                         key_spec)
    return lowered.compile(), p_spec


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="full-328M AOT compile (minutes on CPU); RUN_SLOW=1")
def test_fullsize_teacher_step_compiles_dp8():
    mesh = make_mesh(dp=8, tp=1)
    compiled, p_spec = _teacher_aot(mesh)
    # outputs: (params, opt_state, ema, loss) — params must come back
    # replicated (the dp training contract: grads psum'd, weights identical)
    out_shardings = compiled.output_shardings
    for leaf in jax.tree.leaves(out_shardings[0]):
        assert not leaf.spec or all(a is None for a in leaf.spec), leaf.spec
    assert compiled.as_text().count("all-reduce") > 0  # grad psum exists


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="full-328M AOT compile (minutes on CPU); RUN_SLOW=1")
def test_fullsize_teacher_step_compiles_dp2_tp4():
    mesh = make_mesh(dp=2, tp=4)
    compiled, p_spec = _teacher_aot(mesh)
    # blocks are STACKED pytrees (lax.scan), so leaf count is small; what
    # matters is the fraction of parameter ELEMENTS the tp rules shard —
    # attention + FF projections dominate the 328M
    leaves = jax.tree.leaves(p_spec)
    total = sum(int(np.prod(s.shape)) for s in leaves)
    tp_elems = sum(int(np.prod(s.shape)) for s in leaves
                   if any(a == "tp" for a in s.sharding.spec))
    n_tp_in = sum(1 for s in leaves if any(a == "tp" for a in s.sharding.spec))
    assert tp_elems / total > 0.5, (
        f"tp rules shard only {tp_elems / total:.1%} of {total / 1e6:.0f}M "
        "params at full size")
    # params outputs preserve their tp shardings (no silent full gather)
    out_params = jax.tree.leaves(compiled.output_shardings[0])
    n_tp_out = sum(1 for s in out_params if any(a == "tp" for a in s.spec))
    assert n_tp_out >= n_tp_in, (n_tp_out, n_tp_in)


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="full-328M AOT compile (minutes on CPU); RUN_SLOW=1")
def test_fullsize_serving_graph_compiles_dp2_tp4():
    """The fused synthesize graph (cond encode -> 4-step loop -> codec
    decode) at the serving contract's largest cell: batch 8, ref 64,
    phonemes 256, latent bucket 240."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smalltts_tpu.infer.sampler import make_synthesize_fn

    mesh = make_mesh(dp=2, tp=4)
    codec_cfg = CodecConfig()
    p_shapes = jax.eval_shape(lambda k: init_backbone(k, FULL),
                              jax.random.PRNGKey(0))
    c_shapes = jax.eval_shape(lambda k: init_codec(k, codec_cfg),
                              jax.random.PRNGKey(1))
    p_spec = _spec_tree(p_shapes, mesh)
    c_spec = _spec_tree(c_shapes, mesh)

    b, r, p, t_bucket = 8, 64, 256, 240

    def dp_spec(shape, dtype):
        return jax.ShapeDtypeStruct(
            shape, dtype,
            sharding=NamedSharding(mesh, P("dp", *([None] * (len(shape) - 1)))))

    rep = NamedSharding(mesh, P())
    fn = make_synthesize_fn(FULL, codec_cfg)
    lowered = fn.lower(
        p_spec, c_spec,
        dp_spec((b, r, 64), jnp.float32),
        dp_spec((b,), jnp.int32),
        dp_spec((b, p), jnp.int32),
        dp_spec((b,), jnp.int32),
        dp_spec((b,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
        t_bucket=t_bucket,
    )
    compiled = lowered.compile()
    out = compiled.output_shardings
    audio_spec = jax.tree.leaves(out)[0].spec
    assert audio_spec and audio_spec[0] == "dp", audio_spec  # batch stays dp


MID = BackboneConfig(
    hidden_dim=512, phoneme_dim=256,
    dit=__import__("smalltts_tpu.models.dit", fromlist=["DiTConfig"]).DiTConfig(
        hidden_dim=512, phoneme_dim=256, n_blocks=4),
    text=__import__("smalltts_tpu.models.encoder", fromlist=["EncoderConfig"]
                    ).EncoderConfig(256, 4, 4, 512, 1e-6),
    style=__import__("smalltts_tpu.models.encoder", fromlist=["EncoderConfig"]
                     ).EncoderConfig(256, 4, 4, 768, 1e-5),
)


def test_tp4_matches_single_device_at_midsize():
    """tp=4 teacher loss == single-device loss at a mid-size config
    (hidden 512, 4 blocks, head_dim 64 — real rot_dim coverage), pinned to
    rel 2e-4. The toy-size version lives in test_train.py; mid-size
    exercises wider reduction trees where tp reassociation error actually
    accumulates."""
    from smalltts_tpu.parallel.mesh import shard_batch, shard_params

    rng = np.random.RandomState(0)
    b, t_len, r, p = 4, 32, 16, 24
    batch = {
        "latents": rng.randn(b, t_len, 64).astype(np.float32),
        "latents_lengths": np.full((b,), t_len, np.int32),
        "ref_latents": rng.randn(b, r, 64).astype(np.float32),
        "ref_latents_lengths": np.full((b,), r, np.int32),
        "phonemes": rng.randint(1, 190, size=(b, p)).astype(np.int32),
        "phonemes_lengths": np.full((b,), p, np.int32),
    }
    params = init_backbone(jax.random.PRNGKey(2), MID)
    key = jax.random.PRNGKey(5)
    batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
    loss_single = float(teacher_loss(params, MID, batch_dev, key))

    mesh = make_mesh(dp=2, tp=4)
    loss_tp = float(jax.jit(teacher_loss, static_argnums=(1,))(
        shard_params(params, mesh), MID, shard_batch(batch, mesh), key))
    assert np.isfinite(loss_single) and np.isfinite(loss_tp)
    assert loss_tp == pytest.approx(loss_single, rel=2e-4), (
        loss_single, loss_tp)
