"""Integral-velocity distillation (train/imf.py, after PAPERS.md
IntMeanFlow): init identity, target math, loss descent, few-step sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from smalltts_tpu.models.backbone import denoise_step, encode_conditions, init_backbone
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.ops.schedule import get_alpha_sigma
from smalltts_tpu.train.imf import (
    ImfConfig,
    imf_sample,
    imf_velocity,
    init_imf_student,
    make_imf_step,
    teacher_rollout,
    train_imf,
)
from tests.tiny import TINY_BACKBONE


def _randomize_velocity_head(params, key):
    params = dict(params)
    w = params["velocity"]["w"]
    params["velocity"] = {"w": 0.1 * jax.random.normal(key, w.shape, w.dtype),
                          "b": params["velocity"]["b"]}
    return params


@pytest.fixture(scope="module")
def setup():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher = _randomize_velocity_head(init_backbone(ks[0], TINY_BACKBONE), ks[1])
    rng = np.random.RandomState(0)
    batch = {
        "phonemes": jnp.asarray(rng.randint(1, 198, (2, 10)), jnp.int32),
        "phonemes_lengths": jnp.asarray([10, 6], jnp.int32),
        "latents": jnp.asarray(rng.randn(2, 12, 64), jnp.float32),
        "latents_lengths": jnp.asarray([12, 8], jnp.int32),
        "ref_latents": jnp.asarray(rng.randn(2, 6, 64), jnp.float32),
        "ref_latents_lengths": jnp.asarray([6, 4], jnp.int32),
    }
    cond = encode_conditions(
        teacher, TINY_BACKBONE, batch["ref_latents"], batch["ref_latents_lengths"],
        batch["phonemes"], length_mask(batch["phonemes_lengths"], 10),
    )
    return teacher, batch, cond


def test_student_equals_teacher_velocity_at_init(setup):
    """r_gate = 0 => u(x, t, r) == v(x, t) exactly, for any r."""
    teacher, batch, cond = setup
    student = init_imf_student(teacher)
    x = batch["latents"]
    mask = length_mask(batch["latents_lengths"], x.shape[1])
    t = jnp.asarray([0.7, 0.3], jnp.float32)
    r = jnp.asarray([0.2, 0.0], jnp.float32)
    u = imf_velocity(student, TINY_BACKBONE, x, mask, t, r, cond)
    v = denoise_step(teacher, TINY_BACKBONE, x, mask, t, cond)
    np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-6)


def test_rollout_single_substep_matches_ddim_update(setup):
    """One substep of teacher_rollout is exactly the closed-form DDIM move."""
    teacher, batch, cond = setup
    x = batch["latents"]
    mask = length_mask(batch["latents_lengths"], x.shape[1])
    t = jnp.asarray([0.8, 0.8], jnp.float32)
    r = jnp.asarray([0.4, 0.4], jnp.float32)
    got = teacher_rollout(teacher, TINY_BACKBONE, x, mask, t, r, cond, 1)
    a0, s0 = get_alpha_sigma(t)
    a1, s1 = get_alpha_sigma(r)
    v = denoise_step(teacher, TINY_BACKBONE, x, mask, t, cond)
    a0, s0 = a0[:, None, None], s0[:, None, None]
    a1, s1 = a1[:, None, None], s1[:, None, None]
    x0 = a0 * x - s0 * v
    eps = s0 * x + a0 * v
    want = a1 * x0 + s1 * eps
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_imf_distillation_loss_decreases(setup):
    teacher, batch, _ = setup
    student = init_imf_student(teacher)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
    opt_state = tx.init(student)
    # boundary_prob=0: this test pins the INTERVAL distillation loss
    # descending; boundary pairs have ~0 loss at init (see the boundary
    # test above) and make the 25-step sequence bimodal
    step = make_imf_step(TINY_BACKBONE, tx,
                         ImfConfig(rollout_substeps=2, boundary_prob=0.0))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        student, opt_state, loss = step(student, opt_state, teacher, batch, sub)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses[:3] + losses[-3:]


def test_few_step_sampling_shapes(setup):
    teacher, batch, cond = setup
    student = init_imf_student(teacher)
    seq_lens = jnp.asarray([12, 8], jnp.int32)
    for steps in (1, 2):
        lat = imf_sample(student, TINY_BACKBONE, cond, seq_lens, 16,
                         jax.random.PRNGKey(steps), num_steps=steps)
        lat = np.asarray(lat)
        assert lat.shape == (2, 16, 64)
        assert np.isfinite(lat).all()
        assert (lat[0, 12:] == 0).all()  # masked tail zeroed


def test_train_imf_driver(tmp_path, setup):
    teacher, batch, _ = setup

    def data():
        while True:
            yield batch

    student, loss = train_imf(
        ImfConfig(num_steps=3, rollout_substeps=2, save_every=2),
        model_cfg=TINY_BACKBONE,
        teacher_params=teacher,
        data_iter=data(),
        checkpoint_dir=str(tmp_path),
        log_every=1,
    )
    assert np.isfinite(loss)
    assert "r_gate" in student
    assert (tmp_path / "imf_student_latest.npz").exists()
    # the conditioning encoders are structurally frozen (zero grad + masked
    # out of the optimizer): they must still equal the teacher's weights
    # exactly after training, so cached-cond serving stays interchangeable
    import jax

    for name in ("style_encoder", "phoneme_embedding"):
        for a, b in zip(jax.tree.leaves(student[name]),
                        jax.tree.leaves(teacher[name])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_smalltts_sampler_policy(setup):
    """Quality-gated policy (tests/test_imf_quality.py): sampler='auto'
    serves each checkpoint CLASS through its best-measured recurrence —
    plain checkpoints through DMD-4 (few-step never silently replaces
    them), IMF checkpoints through IMF-2 (which beats both IMF-1 and the
    gated DMD-4 recurrence on the same weights on the corpus)."""
    from smalltts_tpu.infer.pipeline import SmallTTS
    from smalltts_tpu.models.codec import init_codec
    from tests.tiny import TINY_CODEC

    teacher, batch, _ = setup
    student = init_imf_student(teacher)
    # auto on an IMF checkpoint -> IMF-2, the best-measured path for that
    # class (NOT IMF-1, the round-2 trap; NOT DMD-4, measured worst on an
    # IMF student: interval training degrades instantaneous velocity)
    tts = SmallTTS(
        student, init_codec(jax.random.PRNGKey(5), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    assert tts.sampler == "imf" and tts.num_steps == 2
    audio = tts.synthesize(np.asarray(batch["ref_latents"][0]), [1, 2, 3], 1.0)
    assert audio.shape == (1, 8 * 3200)
    assert np.isfinite(audio).all()

    # explicit opt-in -> IMF with the corpus-gated 2-step default
    tts_imf = SmallTTS(
        student, init_codec(jax.random.PRNGKey(5), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC, sampler="imf",
    )
    assert tts_imf.sampler == "imf" and tts_imf.num_steps == 2
    audio = tts_imf.synthesize(np.asarray(batch["ref_latents"][0]), [1, 2, 3], 1.0)
    assert audio.shape == (1, 8 * 3200)
    assert np.isfinite(audio).all()

    # plain checkpoints keep the reference-parity DMD sampler
    tts2 = SmallTTS(
        teacher, init_codec(jax.random.PRNGKey(5), TINY_CODEC),
        cfg=TINY_BACKBONE, codec_cfg=TINY_CODEC,
    )
    assert tts2.sampler == "dmd" and tts2.num_steps == 4


def test_boundary_pairs_have_zero_loss_at_init(setup):
    """boundary_prob=1 trains every pair at r = t against the teacher's
    instantaneous velocity — which the zero-gated student equals EXACTLY at
    init, so the first loss must be ~0; interval pairs (boundary_prob=0)
    start from a real nonzero distillation loss. Pins both the r_eff
    selection and the degenerate-target math."""
    teacher, batch, _ = setup
    tx = optax.adamw(0.0)  # lr 0: this test only inspects the loss
    losses = {}
    for p in (1.0, 0.0):
        student = init_imf_student(teacher)
        step = make_imf_step(TINY_BACKBONE, tx,
                             ImfConfig(rollout_substeps=2, boundary_prob=p))
        _, _, loss = step(student, tx.init(student), teacher, batch,
                          jax.random.PRNGKey(0))
        losses[p] = float(loss)
    assert losses[1.0] < 1e-8, losses
    assert losses[0.0] > 1e-4, losses


def test_focus_pairs_are_serving_grid_intervals(setup):
    """focus_prob=1 with focus_num_steps=2 trains ONLY the intervals the
    2-step sampler evaluates: (1.0, 0.5) and (0.5, max(0, t_floor)). Pinned
    by capturing the (t, r) the rollout actually sees via a spy teacher-
    rollout substep count of 1 (substeps=1 => one denoise at exactly t),
    and by the loss being finite/nonzero (real interval targets)."""
    teacher, batch, _ = setup
    tx = optax.adamw(0.0)
    cfg_f = ImfConfig(rollout_substeps=1, focus_prob=1.0, focus_num_steps=2)
    student = init_imf_student(teacher)
    step = make_imf_step(TINY_BACKBONE, tx, cfg_f)
    _, _, loss = step(student, tx.init(student), teacher, batch,
                      jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and float(loss) > 1e-6

    # the sampled pairs land exactly on the serving grid (replicate the
    # step's own key-split + selection math)
    k_t, k_r, k_eps, k_b, k_f, k_fi = jax.random.split(jax.random.PRNGKey(0), 6)
    b = batch["latents"].shape[0]
    grid = jnp.linspace(1.0, 0.0, 3)
    idx = jax.random.randint(k_fi, (b,), 0, 2)
    t = grid[idx]
    r = jnp.maximum(grid[idx + 1], cfg_f.t_floor)
    for tv, rv in zip(np.asarray(t), np.asarray(r)):
        assert (tv, round(float(rv), 2)) in ((1.0, 0.5), (0.5, cfg_f.t_floor)), (tv, rv)


def test_dmd_recurrence_serves_trained_imf_on_manifold(setup):
    """Serving an IMF checkpoint through the DMD recurrence must evaluate
    u(x,t,t) — whose embedding is (1 + r_gate)*te(t) — not plain te(t).
    The two agree only at init (r_gate = 0); with a trained gate the loop
    step must equal the manual recurrence built on imf_velocity(t, r=t)
    (review r3: the old loop fed the ungated embedding)."""
    from smalltts_tpu.infer.sampler import _sample_loop

    teacher, batch, cond = setup
    student = init_imf_student(teacher)
    student["r_gate"] = 0.3 + 0.1 * jnp.cos(
        jnp.arange(student["r_gate"].shape[0], dtype=jnp.float32))
    # adaLN modulations are zero-init, which makes an untrained net
    # insensitive to t_emb entirely — randomize them so the embedding
    # (and therefore the gate) actually reaches the output
    blocks = dict(student["dit"]["blocks"])
    mod_w = blocks["attn_norm"]["linear"]["w"]
    blocks["attn_norm"] = {"linear": {
        "w": 0.05 * jax.random.normal(jax.random.PRNGKey(3),
                                      mod_w.shape, mod_w.dtype),
        "b": blocks["attn_norm"]["linear"]["b"],
    }}
    student["dit"] = {**student["dit"], "blocks": blocks}

    seq_lengths = batch["latents_lengths"]
    t_bucket = int(batch["latents"].shape[1])
    b = int(seq_lengths.shape[0])
    noise = jnp.asarray(
        np.random.RandomState(7).randn(1, b, t_bucket, 64), jnp.float32)

    got = _sample_loop(student, TINY_BACKBONE, cond, seq_lengths, t_bucket,
                       jax.random.PRNGKey(0), 1, noise)

    mask = length_mask(seq_lengths, t_bucket)
    t = jnp.ones((b,), jnp.float32)  # num_steps=1 -> ts = [1.0]
    alpha, sigma = get_alpha_sigma(1.0)
    x_t = sigma * noise[0]  # x0 = 0
    v = imf_velocity(student, TINY_BACKBONE, x_t, mask, t, t, cond)
    want = jnp.where(mask[..., None], alpha * x_t - sigma * v, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # and the gate genuinely matters: the ungated embedding path disagrees
    v_ungated = denoise_step(student, TINY_BACKBONE, x_t, mask, t, cond)
    assert float(jnp.abs(v - v_ungated).max()) > 1e-3


def test_imf_step_on_dp_mesh(setup):
    """The IMF distillation step shards over the virtual dp mesh (same
    proof standard as the teacher/DMD2 steps in dryrun_multichip)."""
    from smalltts_tpu.parallel.mesh import (
        make_mesh,
        replicated,
        shard_batch,
        shard_params,
    )

    teacher, batch, _ = setup
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    teacher_s = shard_params(teacher, mesh)
    student = shard_params(init_imf_student(teacher), mesh)
    tx = optax.adamw(1e-4)
    opt_state = replicated(tx.init(student), mesh)
    step = make_imf_step(TINY_BACKBONE, tx, ImfConfig(rollout_substeps=2))
    sharded = shard_batch(dict(batch), mesh)
    student, opt_state, loss = step(student, opt_state, teacher_s, sharded,
                                    jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_imf_adversarial_steps(setup):
    """make_imf_adv_steps mechanics (reference recipe transplanted from
    src/scripts/train/dmd2/distill.py:330-341,368-415): alternating
    student/discriminator updates produce finite losses, the discriminator
    learns to separate real from the student's full-interval fakes, and the
    GAN term actually reaches the student (weight 1 vs weight 0 diverge
    from identical inits and keys)."""
    from smalltts_tpu.models.discriminator import init_discriminator
    from smalltts_tpu.train.imf import make_imf_adv_steps
    from tests.test_distill import TINY_DISC

    teacher, batch, _ = setup

    def run(gan_weight, steps=6):
        cfg = ImfConfig(rollout_substeps=2, gan_weight=gan_weight)
        student = init_imf_student(teacher)
        disc = init_discriminator(jax.random.PRNGKey(5), TINY_DISC)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        tx_d = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        opt, opt_d = tx.init(student), tx_d.init(disc)
        sstep, dstep = make_imf_adv_steps(TINY_BACKBONE, TINY_DISC, tx, tx_d,
                                          cfg)
        key = jax.random.PRNGKey(7)
        d_losses = []
        for _ in range(steps):
            key, k1, k2 = jax.random.split(key, 3)
            student, opt, carry, m = sstep(student, opt, teacher, disc,
                                           batch, k1)
            assert np.isfinite(float(m["imf_loss"]))
            assert np.isfinite(float(m["gan_loss"]))
            disc, opt_d, d_loss = dstep(disc, opt_d, teacher, batch, carry, k2)
            d_losses.append(float(d_loss))
            assert np.isfinite(d_losses[-1])
        return student, d_losses

    s_on, d_losses = run(1.0, steps=8)
    # LSGAN disc loss starts near 1.0 (zero-init logits: fake^2 + (real-1)^2
    # over a near-identical pair) and must descend as the disc separates
    assert np.mean(d_losses[-3:]) < np.mean(d_losses[:3]), d_losses
    # the generator term reaches the student: same keys, weight 1 vs 0
    s_off, _ = run(0.0, steps=8)
    diff = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(s_on), jax.tree.leaves(s_off))
    )
    assert diff > 1e-6, diff


def test_rollin_pairs_use_student_rollout_state(setup):
    """rollin_prob=1 trains ONLY the second serving interval
    (t_mid -> t_floor) and evaluates it at the student's OWN first-step
    output from pure noise — the backward-simulation analog of the
    reference's distill.py:248-287. Pinned by replicating the fold_in key
    derivation + rollout math and asserting the training loss equals the
    loss computed by hand on that state."""
    from smalltts_tpu.train.imf import _interval_targets

    teacher, batch, _ = setup
    student = init_imf_student(teacher)
    cfg_r = ImfConfig(rollout_substeps=2, rollin_prob=1.0, focus_prob=0.0)
    key = jax.random.PRNGKey(11)
    tgt = _interval_targets(TINY_BACKBONE, cfg_r, student, teacher, batch, key)

    b = batch["latents"].shape[0]
    assert np.allclose(np.asarray(tgt["t"]), 0.5), tgt["t"]
    assert np.allclose(np.asarray(tgt["r_eff"]), cfg_r.t_floor), tgt["r_eff"]

    # replicate the roll-in state by hand
    k_x1 = jax.random.fold_in(key, 8)
    x1 = jax.random.normal(k_x1, batch["latents"].shape,
                           batch["latents"].dtype)
    ones = jnp.ones((b,), jnp.float32)
    cond = encode_conditions(
        student, TINY_BACKBONE, batch["ref_latents"],
        batch["ref_latents_lengths"], batch["phonemes"],
        length_mask(batch["phonemes_lengths"], batch["phonemes"].shape[1]),
    )
    mask = length_mask(batch["latents_lengths"], batch["latents"].shape[1])
    u1 = imf_velocity(student, TINY_BACKBONE, x1, mask, ones, 0.5 * ones, cond)
    x_mid = x1 - 0.5 * u1
    assert np.allclose(np.asarray(tgt["x_t"]), np.asarray(x_mid), atol=1e-5)

    # and the full step still trains: finite, nonzero loss on the state
    tx = optax.adamw(1e-4)
    step = make_imf_step(TINY_BACKBONE, tx, cfg_r)
    _, _, loss = step(student, tx.init(student), teacher, batch, key)
    assert np.isfinite(float(loss)) and float(loss) > 1e-8


def test_imf_dmd_steps(setup):
    """make_imf_dmd_steps mechanics (the reference's core DMD2 gradient,
    src/scripts/train/dmd2/distill.py:289-328, on the served composition):
    alternating student/scorer updates produce finite losses, the scorer
    moves toward the student's output distribution, the DMD term reaches
    the student (weight 1 vs 0 diverge from identical inits/keys), and the
    student's gradient flows through the LAST serving interval only."""
    from smalltts_tpu.train.imf import make_imf_dmd_steps

    teacher, batch, _ = setup

    def run(dmd_weight, steps=6):
        cfg = ImfConfig(rollout_substeps=2, dmd_weight=dmd_weight,
                        dmd_scorer_updates=2)
        student = init_imf_student(teacher)
        scorer = jax.tree.map(jnp.copy, teacher)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        tx_sc = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        opt, opt_sc = tx.init(student), tx_sc.init(scorer)
        sstep, scstep = make_imf_dmd_steps(TINY_BACKBONE, tx, tx_sc, cfg)
        key = jax.random.PRNGKey(13)
        sc_losses = []
        for _ in range(steps):
            key, k1, k2 = jax.random.split(key, 3)
            student, opt, carry, m = sstep(student, opt, teacher, scorer,
                                           batch, k1)
            assert np.isfinite(float(m["imf_loss"]))
            assert np.isfinite(float(m["dmd_loss"]))
            assert np.isfinite(float(m["grad_mag"]))
            # the carry is the served composition: masked latents shape
            assert carry["x0"].shape == batch["latents"].shape
            mask = length_mask(batch["latents_lengths"],
                               batch["latents"].shape[1])
            assert float(jnp.abs(
                jnp.where(mask[..., None], 0.0, carry["x0"])).max()) == 0.0
            scorer, opt_sc, sc_loss = scstep(scorer, opt_sc, batch, carry, k2)
            sc_losses.append(float(sc_loss))
            assert np.isfinite(sc_losses[-1])
        return student, scorer, sc_losses

    s_on, scorer_on, sc_losses = run(1.0, steps=8)
    # scorer flow-matching loss descends as it fits the student's outputs
    assert np.mean(sc_losses[-3:]) < np.mean(sc_losses[:3]), sc_losses
    # the DMD term reaches the student: same keys, weight 1 vs 0
    s_off, _, _ = run(0.0, steps=8)
    diff = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(s_on), jax.tree.leaves(s_off))
    )
    assert diff > 1e-6, diff


def test_imf_dmd_gradient_flows_through_last_interval_only(setup):
    """The serving rollout inside the DMD loss detaches every interval but
    the last (the reference's backward-simulation gradient path,
    distill.py:255-287). Pinned by differentiating a 2-step composition
    w.r.t. a probe scale on the FIRST interval's velocity: zero gradient."""
    from smalltts_tpu.train.imf import _interval_targets, make_imf_dmd_steps  # noqa: F401

    teacher, batch, cond = setup
    student = init_imf_student(teacher)
    mask = length_mask(batch["latents_lengths"], batch["latents"].shape[1])
    b = batch["latents"].shape[0]
    x1 = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
    t_floor = 0.02

    def compose(scale_first):
        ones = jnp.ones((b,), jnp.float32)
        u1 = imf_velocity(student, TINY_BACKBONE, x1, mask, ones, 0.5 * ones,
                          cond)
        # the production rollout wraps u1 in stop_gradient; replicate
        x_mid = x1 - 0.5 * jax.lax.stop_gradient(scale_first * u1)
        u2 = imf_velocity(student, TINY_BACKBONE, jax.lax.stop_gradient(x_mid),
                          mask, 0.5 * ones, t_floor * ones, cond)
        x0 = x_mid - (0.5 - t_floor) * u2
        return (x0 ** 2).sum()

    g = jax.grad(compose)(1.0)
    assert float(jnp.abs(g)) == 0.0
