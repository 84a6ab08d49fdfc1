"""Training step tests: teacher step semantics + data/tensor-parallel mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tiny import TINY_BACKBONE
from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch
from smalltts_tpu.models.backbone import init_backbone
from smalltts_tpu.train.ema import ema_init
from smalltts_tpu.train.optim import adamw, teacher_optimizer, warmup_cosine
from smalltts_tpu.train.teacher import apply_cfg_drops, make_teacher_step, teacher_loss


def _tiny_batch(b=2, seed=0):
    cfg = DummyDataConfig(batch_size=b, max_phonemes=12, min_phonemes=4,
                          max_latents=24, min_latents=8, max_ref=10, min_ref=4)
    batch = dummy_batch(np.random.default_rng(seed), cfg)
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}


def test_warmup_cosine_schedule():
    sched = warmup_cosine(1.5e-4, 10_000, 1_500, 1e-5)
    assert float(sched(0)) < 1e-9  # warmup starts near zero (factor 1e-6)
    assert float(sched(1_500)) == pytest.approx(1.5e-4, rel=1e-3)
    assert float(sched(10_000)) == pytest.approx(1e-5, rel=1e-2)


def test_cfg_drops_zero_conditioning():
    batch = _tiny_batch(b=64, seed=1)
    ph, ph_len, ref, ref_len = apply_cfg_drops(jax.random.PRNGKey(0), batch, 1.0, 1.0)
    assert int(ph.sum()) == 0 and int(ph_len.sum()) == 0
    assert float(jnp.abs(ref).sum()) == 0 and int(ref_len.sum()) == 0
    ph, ph_len, ref, ref_len = apply_cfg_drops(jax.random.PRNGKey(0), batch, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(ph), np.asarray(batch["phonemes"]))


def test_teacher_step_honors_instance_train_cfg():
    """Custom TeacherTrainConfig values must reach the step (review r3:
    teacher_loss/make_teacher_step read CLASS attributes, silently running
    default CFG dropout and EMA decay regardless of what was passed).
    ema_beta=0 makes EMA equal params after one step — observable only if
    the instance value is used (the class default 0.9999 keeps EMA at
    init)."""
    from smalltts_tpu.train.teacher import TeacherTrainConfig

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    tx, _ = teacher_optimizer(params, num_steps=100, warmup=1)
    step = make_teacher_step(TINY_BACKBONE, tx,
                             TeacherTrainConfig(ema_beta=0.0))
    params, _, ema, _ = step(params, tx.init(params), ema_init(params),
                             _tiny_batch(), jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(ema["velocity"]["w"]), np.asarray(params["velocity"]["w"]),
        err_msg="ema_beta=0.0 from the instance config was ignored")

    # text_cfg_drop=1.0: every sample's phonemes zero -> the loss must be
    # INVARIANT to the phoneme content of the batch
    from smalltts_tpu.train.teacher import teacher_loss

    batch = _tiny_batch()
    batch2 = dict(batch)
    batch2["phonemes"] = (batch["phonemes"] + 7) % 150 + 1
    cfg_all_drop = TeacherTrainConfig(text_cfg_drop=1.0, speaker_cfg_drop=0.0)
    key = jax.random.PRNGKey(2)
    l1 = float(teacher_loss(params, TINY_BACKBONE, batch, key, cfg_all_drop))
    l2 = float(teacher_loss(params, TINY_BACKBONE, batch2, key, cfg_all_drop))
    assert l1 == l2, (l1, l2)


def test_teacher_step_loss_decreases_and_nan_guard():
    """One compiled step exercises both behaviors (loss decreases on a fixed
    batch; a poisoned batch must not corrupt params) — sharing the ~30 s
    compile."""
    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    tx, _ = teacher_optimizer(params, num_steps=100, warmup=1)
    opt_state = tx.init(params)
    ema = ema_init(params)
    step = make_teacher_step(TINY_BACKBONE, tx)

    batch = _tiny_batch()
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(8):
        # same batch+key: loss must decrease as params fit it
        params, opt_state, ema, loss = step(params, opt_state, ema, batch, key)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # ---- NaN guard: poisoned batch leaves params untouched
    bad = dict(batch)
    bad["latents"] = batch["latents"].at[0, 0, 0].set(jnp.nan)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    params, opt_state, ema, loss = step(params, opt_state, ema, bad, jax.random.PRNGKey(1))
    assert not np.isfinite(float(loss))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(before)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # and a clean step afterwards still works
    params, opt_state, ema, loss = step(params, opt_state, ema, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_teacher_step_on_dp_tp_mesh():
    """Same step on a 2x4 dp/tp mesh: shardings compile, execute, and agree
    with the single-device result."""
    from smalltts_tpu.parallel.mesh import make_mesh, replicated, shard_batch, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    params = init_backbone(jax.random.PRNGKey(0), TINY_BACKBONE)
    tx = adamw(params, 1e-4)
    key = jax.random.PRNGKey(7)
    batch = _tiny_batch(b=4, seed=3)

    loss_single = float(teacher_loss(params, TINY_BACKBONE, batch, key))

    mesh = make_mesh(dp=2, tp=4)
    p_sharded = shard_params(params, mesh)
    b_sharded = shard_batch(batch, mesh)
    loss_mesh = float(
        jax.jit(teacher_loss, static_argnums=(1,))(p_sharded, TINY_BACKBONE, b_sharded, key)
    )
    assert loss_mesh == pytest.approx(loss_single, rel=2e-4)

    # one full optimizer step under the mesh
    opt_state = tx.init(p_sharded)
    step = make_teacher_step(TINY_BACKBONE, tx)
    ema = ema_init(p_sharded)
    new_params, _, _, loss = step(p_sharded, opt_state, ema, b_sharded, key)
    assert np.isfinite(float(loss))
    jax.block_until_ready(new_params)


def test_train_distill_accepts_dp_mesh(tmp_path):
    """train_distill(mesh=...) shards the whole composite over dp — one
    step, finite metrics (the step functions themselves are covered at
    depth by test_distill + dryrun_multichip)."""
    from test_distill import TINY_ASR64, TINY_DISC, TINY_SV64, _randomize_velocity_head
    from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch
    from smalltts_tpu.models.asr import init_asr
    from smalltts_tpu.models.discriminator import init_discriminator
    from smalltts_tpu.models.sv import init_sv
    from smalltts_tpu.parallel.mesh import make_mesh
    from smalltts_tpu.train.distill import DistillConfig, train_distill

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    teacher = _randomize_velocity_head(init_backbone(ks[0], TINY_BACKBONE), ks[4])

    def data():
        cfgd = DummyDataConfig(batch_size=2, max_phonemes=10, min_phonemes=4,
                               max_latents=16, min_latents=8, max_ref=8, min_ref=4)
        rng = np.random.default_rng(0)
        while True:
            yield dummy_batch(rng, cfgd)

    _, _, _, metrics = train_distill(
        DistillConfig(num_steps=1, scorer_updates=1, save_every=10**9,
                      asr_start_step=0, sv_start_step=0),
        model_cfg=TINY_BACKBONE, disc_cfg=TINY_DISC, asr_cfg=TINY_ASR64,
        sv_cfg=TINY_SV64, checkpoint_dir=str(tmp_path), data_iter=data(),
        mesh=make_mesh(dp=2, tp=1, devices=jax.devices()[:2]),
        params_override={
            "teacher": teacher,
            "asr": init_asr(ks[1], TINY_ASR64),
            "sv": init_sv(ks[2], TINY_SV64),
            "disc": init_discriminator(ks[3], TINY_DISC),
        },
    )
    for name, v in metrics.items():
        assert np.isfinite(v), name


def test_ema_decay_warmup_matches_ema_pytorch_semantics():
    """Reference EMA (ema_pytorch defaults): copy through step 100, then
    1-(1+epoch)^(-2/3) clamped at beta — a constant 0.9999 from step 0
    left checkpoint_ema ~86% random init at the first save (review r3)."""
    from smalltts_tpu.train.ema import ema_decay

    assert ema_decay(0) == 0.0
    assert ema_decay(101) == 0.0  # epoch 0: still copying
    d1500 = ema_decay(1500)
    # epoch = 1500 - 100 - 1 = 1399; decay = 1 - (1 + epoch)^(-2/3)
    assert abs(d1500 - (1 - 1400 ** (-2 / 3))) < 1e-12
    assert 0.99 < d1500 < 0.9999
    d330k = ema_decay(330_000)
    assert 0.9997 < d330k < 0.9999
    assert ema_decay(5_000_000) == 0.9999  # clamps at beta


def test_teacher_loop_applies_scheduled_ema():
    """After the first training steps the EMA must equal the params (copy
    phase), not sit at init like the constant-beta EMA did."""
    import tempfile

    from smalltts_tpu.train.teacher import TeacherTrainConfig, train_teacher
    from smalltts_tpu.data.dummy import DummyDataConfig, dummy_batch

    cfgd = DummyDataConfig(batch_size=2, max_phonemes=8, min_phonemes=4,
                           max_latents=12, min_latents=8, max_ref=8, min_ref=4)

    def data():
        rng = np.random.default_rng(0)
        while True:
            yield dummy_batch(rng, cfgd)

    with tempfile.TemporaryDirectory() as td:
        params, ema_params = train_teacher(
            TeacherTrainConfig(num_steps=3, save_every=10**9),
            model_cfg=TINY_BACKBONE, data_iter=data(),
            checkpoint_dir=td, log_every=10**9,
        )[:2]
    np.testing.assert_allclose(
        np.asarray(ema_params["velocity"]["w"]),
        np.asarray(params["velocity"]["w"]), rtol=0, atol=0,
        err_msg="during ema warmup (step<=100) the EMA must COPY the params")
