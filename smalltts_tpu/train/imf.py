"""Integral-velocity distillation: 4-step DMD student -> 1-2 step sampler.

Technique after IntMeanFlow (PAPERS.md: "IntMeanFlow: Few-step Speech
Generation with Integral Velocity Distillation", arXiv 2510.07979; same
family as MeanFlow): instead of instantaneous velocity v(x_t, t), the
student learns the AVERAGE velocity over an interval,

    u(x_t, t, r) ~= (x_t - x_r) / (t - r),

where x_r comes from rolling the frozen teacher's deterministic (DDIM-style)
trajectory from t to r. Sampling then needs one network call per interval:

    x_{t_{i+1}} = x_{t_i} - (t_i - t_{i+1}) * u(x_{t_i}, t_i, t_{i+1})

so a 1-step student halves-to-quarters the denoise cost that dominates
synthesis (PERF.md: 7.2 of 11 ms at batch 8 is the 4-step loop). This goes
BEYOND the reference, which stops at the 4-step DMD student
(src/scripts/train/dmd2/distill.py); quality must be validated on real
data — the in-repo tests pin the math (init identity, loss descent,
sampler shapes), not perceptual quality.

Architecture: the student is the backbone plus a zero-init elementwise gate
`r_gate` mixing an embedding of r into the time embedding:

    emb = time_emb(t) + r_gate * time_emb(r)

With r_gate = 0 the student is EXACTLY the teacher's velocity net — the
right init, since u(x,t,r) -> v(x,t) as r -> t.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax

from smalltts_tpu.models.backbone import (
    BackboneConfig,
    denoise_step,
    encode_conditions,
    time_embedding,
)
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.ops.schedule import get_alpha_sigma


@dataclass(frozen=True)
class ImfConfig:
    num_steps: int = 40_000
    batch_size: int = 2
    lr: float = 1e-5
    grad_clip: float = 1.0
    rollout_substeps: int = 4   # teacher DDIM substeps per (t, r) interval
    min_interval: float = 0.1
    t_floor: float = 0.02
    # Fraction of samples trained on the BOUNDARY pair r = t, where the
    # integral target degenerates to the teacher's instantaneous velocity
    # (the MeanFlow-family boundary condition). Corpus-measured TRADEOFF
    # (scripts/exp_imf_boundary.py, 2026-08-17): raising p fixes the
    # otherwise-unconstrained instantaneous path (under-DMD-4 mel excess
    # 1.30 -> 1.06 -> 0.70 at p = 0/0.25/0.5) but degrades the few-step
    # path that actually serves (IMF-2 excess 0.32 -> 0.39 -> 0.57), and
    # the best path overall stays boundary-free IMF-2 — so the default is
    # 0.0 and the knob exists for real-data runs where the tradeoff may
    # differ at scale.
    boundary_prob: float = 0.0
    # Fraction of samples trained on the EXACT intervals the few-step
    # sampler serves (linspace(1, 0, focus_num_steps+1) pairs, r floored
    # at t_floor) instead of uniform (t, r). The serving grid is static
    # (infer: imf_sample's ts), so spending training mass on those
    # intervals targets the measured metric directly; uniform samples
    # keep the rest of the (t, r) plane regularized. DEFAULT 0.5: the
    # round-4 corpus grid (scripts/exp_imf_source.py, PERF.md) measured
    # IMF-2 mel excess 0.324 -> 0.208 (-36%), the largest single win of
    # the nine configs tried, and the cost lands only on paths auto never
    # serves (IMF-1 0.582 -> 1.121; auto serves r_gate checkpoints at
    # IMF-2 only). focus_prob=1.0 was marginally better (0.195) but
    # removes all off-grid regularization; 0.5 keeps the plane covered.
    focus_prob: float = 0.5
    focus_num_steps: int = 2
    # Fraction of samples trained as the SECOND serving interval
    # (grid[1] -> t_floor) with x_t taken from the student's OWN
    # first-interval rollout from pure noise — the backward-simulation
    # trick the reference's DMD2 uses (src/scripts/train/dmd2/
    # distill.py:248-287): at serve time step 2's input is the student's
    # step-1 output, not noised ground truth, and uniform/focus training
    # never sees that distribution. The teacher then provides the
    # integral target FROM that student-made state. Student rollout runs
    # under stop_gradient (exactly the reference's no-grad first pass).
    rollin_prob: float = 0.0
    # LSGAN weight on the student's FULL-INTERVAL (t -> t_floor) x0
    # prediction — the reference's own few-step weapon applied to IMF
    # (reference: src/scripts/train/dmd2/distill.py:330-341 weights the
    # generator loss 1e-3 there too). 0.0 = off (make_imf_step, no
    # discriminator anywhere in the graph); > 0 requires the
    # make_imf_adv_steps pair. Corpus-measured (scripts/exp_imf_source.py):
    # see PERF.md round-4 table.
    gan_weight: float = 0.0
    # Weight on the DMD distribution-matching pseudo-loss applied to the
    # student's SERVED few-step composition (the reference's core DMD2
    # gradient, src/scripts/train/dmd2/distill.py:289-328, transplanted):
    # roll the student over the serving grid from pure noise with gradient
    # through the LAST interval only (the reference's backward-simulation
    # gradient path), re-noise the composition's x0 at fresh ts, and push
    # it where (teacher-CFG x0) - (scorer x0) points. 0.0 = off; > 0
    # requires the make_imf_dmd_steps pair (adds a fake-score model).
    # This is the one weapon class waves 1-4 left untried: regression
    # targeting (focus/rollin) plateaued at ~0.2 IMF-2 mel excess with
    # the residual attributed to the pure-noise first interval, which
    # only a distributional signal can sharpen.
    dmd_weight: float = 0.0
    dmd_scorer_updates: int = 2
    save_every: int = 800


def init_imf_student(teacher_params) -> dict:
    """Teacher copy + zero-init r gate (student == teacher at init)."""
    student = dict(jax.tree.map(jnp.copy, teacher_params))
    emb_dim = teacher_params["time_embedding"]["l2"]["w"].shape[-1]
    student["r_gate"] = jnp.zeros((emb_dim,), jnp.float32)
    return student


def imf_time_emb(p, cfg: BackboneConfig, t: jax.Array, r: jax.Array) -> jax.Array:
    te = time_embedding(p["time_embedding"], t, cfg.time_embed_dim)
    re = time_embedding(p["time_embedding"], r, cfg.time_embed_dim)
    return te + p["r_gate"].astype(te.dtype) * re


def imf_velocity(p, cfg: BackboneConfig, x_t, mask, t, r, cond) -> jax.Array:
    """Average velocity u(x_t, t, r) via the backbone with the mixed emb."""
    return denoise_step(
        p, cfg, x_t, mask, t, cond, t_emb=imf_time_emb(p, cfg, t, r)
    )


def teacher_rollout(teacher, cfg: BackboneConfig, x_t, mask, t, r, cond,
                    substeps: int):
    """Deterministic DDIM-style rollout of the teacher's v-prediction flow
    from per-sample time t to r (vectors, shape (B,)): x0 = a x - s v,
    eps = s x + a v, then re-noise at the next sub-time with the SAME eps."""

    def body(i, x):
        frac0 = i / substeps
        frac1 = (i + 1) / substeps
        t0 = t + (r - t) * frac0
        t1 = t + (r - t) * frac1
        a0, s0 = get_alpha_sigma(t0)
        a1, s1 = get_alpha_sigma(t1)
        v = denoise_step(teacher, cfg, x, mask, t0, cond)
        a0 = a0[:, None, None].astype(x.dtype)
        s0 = s0[:, None, None].astype(x.dtype)
        x0 = a0 * x - s0 * v
        eps = s0 * x + a0 * v
        return a1[:, None, None].astype(x.dtype) * x0 + \
            s1[:, None, None].astype(x.dtype) * eps

    return jax.lax.fori_loop(0, substeps, body, x_t)


def _interval_targets(cfg: BackboneConfig, train_cfg: ImfConfig,
                      student, teacher, batch, key):
    """Shared target construction for the plain and adversarial IMF steps:
    sample (t, r) (uniform / focus / boundary), noise the latents, roll the
    frozen teacher to r -> dict(cond, mask, x_t, t, r_eff, u_target)."""
    latents = batch["latents"]
    lengths = batch["latents_lengths"]
    b, t_len, _ = latents.shape
    mask = length_mask(lengths, t_len)
    # DELIBERATE freeze: conditioning is encoded OUTSIDE loss_fn, so
    # the style/text encoders and cross-KV projections receive zero
    # gradient — the IMF student keeps the teacher's conditioning
    # exactly. That keeps cached-cond serving interchangeable between
    # DMD and IMF recurrences on one checkpoint (infer/pipeline routes
    # both through the same encode), and the corpus quality gate
    # measured the student this way. The optimizer runs without weight
    # decay so these zero-grad leaves cannot drift (review r3).
    cond = encode_conditions(
        student, cfg, batch["ref_latents"], batch["ref_latents_lengths"],
        batch["phonemes"],
        length_mask(batch["phonemes_lengths"], batch["phonemes"].shape[1]),
    )
    k_t, k_r, k_eps, k_b, k_f, k_fi = jax.random.split(key, 6)
    t = jax.random.uniform(
        k_t, (b,), minval=train_cfg.t_floor + train_cfg.min_interval,
        maxval=1.0,
    )
    r = jax.random.uniform(
        k_r, (b,), minval=train_cfg.t_floor,
        maxval=t - train_cfg.min_interval,
    )
    if train_cfg.focus_prob > 0.0:  # static: no-op graph when off
        # serving-grid intervals: exactly what imf_sample(num_steps=
        # focus_num_steps) evaluates, r floored at t_floor (training
        # never sees r=0; the sampler's last interval extrapolates
        # the ~0.02 gap, same as the uniform path)
        grid = jnp.linspace(1.0, 0.0, train_cfg.focus_num_steps + 1)
        idx = jax.random.randint(k_fi, (b,), 0, train_cfg.focus_num_steps)
        focus = jax.random.bernoulli(k_f, train_cfg.focus_prob, (b,))
        t = jnp.where(focus, grid[idx], t)
        r = jnp.where(focus, jnp.maximum(grid[idx + 1], train_cfg.t_floor), r)
    a, s = get_alpha_sigma(t)
    eps = jax.random.normal(k_eps, latents.shape, latents.dtype)
    x_t = a[:, None, None] * latents + s[:, None, None] * eps

    if train_cfg.rollin_prob > 0.0:  # static: no-op graph when off
        # backward-simulation roll-in (reference distill.py:248-287): with
        # prob rollin_prob, this sample becomes the SECOND serving
        # interval (grid[1] -> t_floor) evaluated at the student's OWN
        # first-step output from pure noise — the state the 2-step sampler
        # actually feeds it. Keys fold_in-derived so the existing 6-key
        # stream (pinned by test_focus_pairs_are_serving_grid_intervals)
        # is untouched.
        t_mid = 1.0 - 1.0 / train_cfg.focus_num_steps  # grid[1]
        k_roll = jax.random.fold_in(key, 7)
        k_x1 = jax.random.fold_in(key, 8)
        roll = jax.random.bernoulli(k_roll, train_cfg.rollin_prob, (b,))
        x1 = jax.random.normal(k_x1, latents.shape, latents.dtype)
        ones = jnp.ones((b,), jnp.float32)
        u1 = jax.lax.stop_gradient(imf_velocity(
            student, cfg, x1, mask, ones, t_mid * ones, cond))
        x_mid = x1 - (1.0 - t_mid) * u1
        t = jnp.where(roll, t_mid, t)
        r = jnp.where(roll, jnp.full((b,), train_cfg.t_floor, jnp.float32), r)
        x_t = jnp.where(roll[:, None, None], x_mid, x_t)

    x_r = jax.lax.stop_gradient(
        teacher_rollout(teacher, cfg, x_t, mask, t, r, cond,
                        train_cfg.rollout_substeps)
    )
    u_int = (x_t - x_r) / (t - r)[:, None, None]

    # MeanFlow boundary condition: per-sample, with prob boundary_prob,
    # train the pair r = t against the teacher's INSTANTANEOUS velocity
    # (lim r->t of the integral target). This pins u(x,t,t) = v(x,t),
    # which interval-only training leaves unconstrained and which the
    # DMD-recurrence serving path evaluates.
    if train_cfg.boundary_prob > 0.0:  # static: skip the extra teacher
        boundary = jax.random.bernoulli(  # forward entirely when off
            k_b, train_cfg.boundary_prob, (b,))
        v_teacher = jax.lax.stop_gradient(
            denoise_step(teacher, cfg, x_t, mask, t, cond))
        r_eff = jnp.where(boundary, t, r)
        u_target = jnp.where(boundary[:, None, None], v_teacher, u_int)
    else:
        r_eff, u_target = r, u_int
    return {"cond": cond, "mask": mask, "x_t": x_t, "t": t,
            "r_eff": r_eff, "u_target": u_target}


def _imf_base_loss(p, cfg, tgt):
    u = imf_velocity(p, cfg, tgt["x_t"], tgt["mask"], tgt["t"], tgt["r_eff"],
                     tgt["cond"])
    per = ((u - tgt["u_target"]) ** 2).astype(jnp.float32)
    per = jnp.where(tgt["mask"][..., None], per, 0.0)
    return per.sum() / jnp.maximum(tgt["mask"].sum() * per.shape[-1], 1)


def make_imf_step(cfg: BackboneConfig, tx, train_cfg: ImfConfig = ImfConfig()):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(student, opt_state, teacher, batch, key):
        tgt = _interval_targets(cfg, train_cfg, student, teacher, batch, key)
        loss, grads = jax.value_and_grad(
            lambda p: _imf_base_loss(p, cfg, tgt))(student)
        updates, opt_state = tx.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        return student, opt_state, loss

    return step


def make_imf_adv_steps(cfg: BackboneConfig, disc_cfg, tx, tx_disc,
                       train_cfg: ImfConfig):
    """Adversarial IMF: the base interval-regression loss plus an LSGAN term
    on the student's FULL-INTERVAL x0 prediction — the reference's own
    few-step weapon, transplanted (reference:
    src/scripts/train/dmd2/distill.py:330-341, 368-415; VERDICT r3 next #3).

    Per student step, ONE extra student call evaluates u(x_t, t, t_floor) and
    x0_pred = x_t - (t - t_floor) * u — the exact map the 1-step sampler
    serves and the second interval of the 2-step grid. x0_pred is re-noised
    at fresh ts and judged by the discriminator over the FROZEN TEACHER's
    stacked last-3-layer features (DMD2 uses its evolving scorer there; IMF
    has no scorer, and the teacher is the fixed feature extractor the
    discriminator architecture was designed for). Gradient reaches the
    student only through the noised-x input, exactly the reference's path
    (feats enter stop_gradient'd).

    -> (student_step, disc_step):
        student_step(student, opt, teacher, disc, batch, key)
            -> student, opt, carry, {"imf_loss", "gan_loss"}
        disc_step(disc, disc_opt, teacher, batch, carry, key) -> disc, opt, loss
    """
    from smalltts_tpu.models.backbone import backbone_forward
    from smalltts_tpu.models.discriminator import discriminator_forward
    from smalltts_tpu.models.style_encoder import style_encoder
    from smalltts_tpu.ops.schedule import apply_noise

    sg = jax.lax.stop_gradient

    @partial(jax.jit, donate_argnums=(0, 1))
    def student_step(student, opt_state, teacher, disc, batch, key):
        k_tgt, k_ts, k_noise = jax.random.split(key, 3)
        tgt = _interval_targets(cfg, train_cfg, student, teacher, batch, k_tgt)
        b = batch["latents"].shape[0]
        ph_mask = length_mask(batch["phonemes_lengths"],
                              batch["phonemes"].shape[1])
        ref_seq, ref_mask = style_encoder(
            teacher["style_encoder"], batch["ref_latents"],
            batch["ref_latents_lengths"], cfg.style,
        )
        ts = jax.random.uniform(k_ts, (b,))
        noise = jax.random.normal(k_noise, batch["latents"].shape)
        floor_vec = jnp.full((b,), train_cfg.t_floor, jnp.float32)

        def loss_fn(p):
            base = _imf_base_loss(p, cfg, tgt)
            # full-interval x0: u(x_t, t, t_floor) — the 1-step serving map
            u_full = imf_velocity(p, cfg, tgt["x_t"], tgt["mask"], tgt["t"],
                                  floor_vec, tgt["cond"])
            span = (tgt["t"] - train_cfg.t_floor)[:, None, None]
            x0_pred = tgt["x_t"] - span.astype(u_full.dtype) * u_full
            x0_pred = jnp.where(tgt["mask"][..., None], x0_pred, 0.0)
            x_t_g, _ = apply_noise(x0_pred, ts, noise)
            # frozen-teacher features on the (detached) noised fake — the
            # generator gradient flows through x_t_g's direct disc input
            # only, per the reference's path
            _, feats_fake = backbone_forward(
                teacher, cfg, sg(x_t_g), batch["ref_latents"],
                batch["ref_latents_lengths"], tgt["mask"], batch["phonemes"],
                ph_mask, ts, return_features=True,
            )
            logits, _ = discriminator_forward(
                sg(disc), disc_cfg, sg(feats_fake), x_t_g, ref_seq, ref_mask,
                tgt["mask"], batch["phonemes"], ts, train=True,
            )
            gan = ((logits - 1.0) ** 2).mean()
            aux = {"imf_loss": base, "gan_loss": gan,
                   "x_t_g": sg(x_t_g), "feats_fake": sg(feats_fake)}
            return base + train_cfg.gan_weight * gan, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(student)
        updates, opt_state = tx.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        carry = {"x_t_g": aux["x_t_g"], "feats_fake": aux["feats_fake"],
                 "ref_seq": ref_seq, "ref_mask": ref_mask, "ts": ts}
        return student, opt_state, carry, {
            "imf_loss": aux["imf_loss"], "gan_loss": aux["gan_loss"]}

    @partial(jax.jit, donate_argnums=(0, 1))
    def disc_step(disc, disc_opt, teacher, batch, carry, key):
        latents = batch["latents"]
        mask = length_mask(batch["latents_lengths"], latents.shape[1])
        ph_mask = length_mask(batch["phonemes_lengths"],
                              batch["phonemes"].shape[1])
        ts = carry["ts"]
        x_real, _ = apply_noise(latents, ts,
                                jax.random.normal(key, latents.shape))
        _, feats_real = backbone_forward(
            teacher, cfg, x_real, batch["ref_latents"],
            batch["ref_latents_lengths"], mask, batch["phonemes"], ph_mask,
            ts, return_features=True,
        )
        feats = jnp.concatenate([sg(feats_real), carry["feats_fake"]], axis=0)
        xs = jnp.concatenate([x_real, carry["x_t_g"]], axis=0)
        cat2 = lambda v: jnp.concatenate([v] * 2, axis=0)  # noqa: E731

        def disc_loss(dp):
            logits, new_p = discriminator_forward(
                dp, disc_cfg, feats, xs, cat2(carry["ref_seq"]),
                cat2(carry["ref_mask"]), cat2(mask), cat2(batch["phonemes"]),
                cat2(ts), train=True,
            )
            real, fake = jnp.split(logits, 2, axis=0)
            return (fake ** 2 + (real - 1.0) ** 2).mean(), new_p

        (loss, new_p), grads = jax.value_and_grad(disc_loss, has_aux=True)(disc)
        updates, disc_opt = tx_disc.update(grads, disc_opt, disc)
        disc = optax.apply_updates(new_p, updates)
        return disc, disc_opt, loss

    return student_step, disc_step


def make_imf_dmd_steps(cfg: BackboneConfig, tx, tx_scorer,
                       train_cfg: ImfConfig):
    """DMD distribution matching on the IMF student's SERVED composition —
    the reference's core DMD2 gradient (src/scripts/train/dmd2/
    distill.py:289-328) transplanted to the interval student.

    Why this shape: waves 1-4 (PERF.md round 4) showed every regression-
    targeting scheme (focus / focus1 / rollin) recovers the same ~0.12 of
    the IMF-2 mel excess and plateaus at ~0.2 — the residual lives in the
    pure-noise first interval, whose input distribution is already exactly
    right at train time, so no re-targeting can sharpen it. A distribution-
    matching gradient on the composition's OUTPUT is the remaining signal
    class: it doesn't care where the trajectory came from, only that the
    produced x0 population matches the teacher's.

    Per student step:
      1. base interval-regression loss (_imf_base_loss on _interval_targets,
         focus/rollin/boundary all still apply);
      2. serving rollout from pure noise over linspace(1, 0,
         focus_num_steps+1) — all intervals under stop_gradient except the
         LAST (exactly the reference's backward-simulation gradient path:
         its student runs at t_prev in inference_mode, grads flow through
         the final call only, distill.py:255-287);
      3. DMD pseudo-loss on the composition's x0: re-noise at fresh ts,
         p_real from the frozen teacher with the reference's double CFG
         (text 2.0 / speaker 1.5), p_fake from the fake-score model,
         normalized + nan_to_num, applied as 0.5*MSE(x0, sg(x0 - grad))
         (distill.py:289-328 verbatim semantics).
    The scorer step then runs `dmd_scorer_updates` flow-matching updates on
    the (detached) composition x0 as its "data" (distill.py:418-451; we
    re-noise the SAME composition per update instead of re-rolling the
    student — at 2 updates the staleness is negligible and it saves two
    full student rollouts per step).

    -> (student_step, scorer_step):
        student_step(student, opt, teacher, scorer, batch, key)
            -> student, opt, carry, {"imf_loss", "dmd_loss", "grad_mag"}
        scorer_step(scorer, opt, batch, carry, key) -> scorer, opt, loss
    """
    from smalltts_tpu.models.backbone import backbone_forward, cfg_velocity
    from smalltts_tpu.ops.schedule import apply_noise, x_pred_from_velocity
    from smalltts_tpu.train.distill import CFG_SCALE_SPEAKER, CFG_SCALE_TEXT

    sg = jax.lax.stop_gradient
    n_steps = train_cfg.focus_num_steps
    grid = jnp.linspace(1.0, 0.0, n_steps + 1)

    @partial(jax.jit, donate_argnums=(0, 1))
    def student_step(student, opt_state, teacher, scorer, batch, key):
        k_tgt, k_x1, k_ts, k_noise = jax.random.split(key, 4)
        tgt = _interval_targets(cfg, train_cfg, student, teacher, batch, k_tgt)
        latents = batch["latents"]
        b = latents.shape[0]
        mask = tgt["mask"]
        valid = mask[..., None].astype(jnp.float32)
        ph = batch["phonemes"]
        ph_mask = length_mask(batch["phonemes_lengths"], ph.shape[1])
        ref = batch["ref_latents"]
        ref_len = batch["ref_latents_lengths"]

        x1 = jax.random.normal(k_x1, latents.shape, latents.dtype)
        ts = jax.random.uniform(k_ts, (b,))
        noise = jax.random.normal(k_noise, latents.shape)

        def rollout_last_with_grad(p):
            """Serving-grid rollout; gradient through the LAST interval."""
            x = x1
            for i in range(n_steps - 1):
                t0 = jnp.full((b,), grid[i], jnp.float32)
                r0 = jnp.full((b,), jnp.maximum(grid[i + 1],
                                                train_cfg.t_floor), jnp.float32)
                u = sg(imf_velocity(p, cfg, x, mask, t0, r0, tgt["cond"]))
                x = x - (t0 - r0)[:, None, None].astype(x.dtype) * u
            # floor t_last like the intermediate r0s: the state ARRIVED at
            # max(grid[-1], t_floor), so evaluating the final velocity below
            # that (possible when 1/focus_num_steps < t_floor) would skew
            # the composition (advisor r4)
            t_last = jnp.full((b,), jnp.maximum(grid[n_steps - 1],
                                                train_cfg.t_floor), jnp.float32)
            r_last = jnp.full((b,), train_cfg.t_floor, jnp.float32)
            u = imf_velocity(p, cfg, sg(x), mask, t_last, r_last, tgt["cond"])
            x0 = x - (t_last - r_last)[:, None, None].astype(x.dtype) * u
            return jnp.where(mask[..., None], x0, 0.0)

        # DMD target from the DETACHED composition (the reference computes
        # it in a no-grad section, distill.py:289-322)
        x0_d = sg(rollout_last_with_grad(student))
        x_t, _ = apply_noise(x0_d, ts, noise)
        v_real = cfg_velocity(teacher, cfg, x_t, ref, ref_len, mask, ph,
                              ph_mask, ts, CFG_SCALE_TEXT, CFG_SCALE_SPEAKER)
        p_real = (x0_d - x_pred_from_velocity(x_t, sg(v_real), ts)) * valid
        v_fake = backbone_forward(scorer, cfg, x_t, ref, ref_len, mask, ph,
                                  ph_mask, ts)
        p_fake = (x0_d - x_pred_from_velocity(x_t, sg(v_fake), ts)) * valid
        # NB the denominator averages |p_real| over ALL T*D positions,
        # padding included — deliberately: it is the reference's own
        # convention (distill.py:319-321 masks p_real with `valid` then
        # divides by the unmasked mean), and the in-repo DMD2 distiller
        # (train/distill.py) matches it; diverging here would make the
        # IMF and DMD gradients incomparable on the same batch
        denom = jnp.abs(p_real).mean(axis=(1, 2), keepdims=True)
        grad = jnp.nan_to_num((p_real - p_fake) / denom)
        target = x0_d - grad
        grad_mag = jnp.linalg.norm(grad.reshape(b, -1), axis=-1).mean()

        def loss_fn(p):
            base = _imf_base_loss(p, cfg, tgt)
            x0 = rollout_last_with_grad(p)
            n_valid = jnp.maximum(valid.sum() * x0.shape[-1], 1.0)
            dmd = 0.5 * (((x0 - target) ** 2) * valid).sum() / n_valid
            aux = {"imf_loss": base, "dmd_loss": dmd}
            return base + train_cfg.dmd_weight * dmd, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(student)
        updates, opt_state = tx.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        carry = {"x0": x0_d}
        return student, opt_state, carry, {**aux, "grad_mag": grad_mag}

    @partial(jax.jit, donate_argnums=(0, 1))
    def scorer_step(scorer, scorer_opt, batch, carry, key):
        latents = batch["latents"]
        mask = length_mask(batch["latents_lengths"], latents.shape[1])
        valid = mask[..., None].astype(jnp.float32)
        ph = batch["phonemes"]
        ph_mask = length_mask(batch["phonemes_lengths"], ph.shape[1])
        ref = batch["ref_latents"]
        ref_len = batch["ref_latents_lengths"]
        x0 = carry["x0"]

        def one_update(state, k):
            scorer_p, opt_state = state
            k1, k2 = jax.random.split(k)
            ts = jax.random.uniform(k1, (latents.shape[0],))
            noised, v_target = apply_noise(
                x0, ts, jax.random.normal(k2, latents.shape))

            def fm_loss(sp):
                v = backbone_forward(sp, cfg, noised, ref, ref_len, mask,
                                     ph, ph_mask, ts)
                diff = ((v - v_target) * valid) ** 2
                return diff.sum() / jnp.maximum(valid.sum() * v.shape[-1], 1.0)

            loss, grads = jax.value_and_grad(fm_loss)(scorer_p)
            updates, opt_state = tx_scorer.update(grads, opt_state, scorer_p)
            return (optax.apply_updates(scorer_p, updates), opt_state), loss

        (scorer, scorer_opt), losses = jax.lax.scan(
            one_update, (scorer, scorer_opt),
            jax.random.split(key, train_cfg.dmd_scorer_updates))
        return scorer, scorer_opt, losses[-1]

    return student_step, scorer_step


def imf_sample(student, cfg: BackboneConfig, cond, seq_lengths, t_bucket: int,
               key, num_steps: int = 1) -> jax.Array:
    """Few-step sampling with the integral-velocity student -> latents.

    Every (t, r) interval is known up front, so the mixed time embeddings
    AND the adaLN modulation weight pass are hoisted out of the loop (same
    optimization as the DMD sampler — see infer/sampler.py and
    dit.precompute_step_modulations)."""
    from smalltts_tpu.models.dit import precompute_step_modulations

    b = seq_lengths.shape[0]
    mask = length_mask(seq_lengths, t_bucket)
    dtype = student["velocity"]["w"].dtype
    x = jax.random.normal(key, (b, t_bucket, cfg.latent_dim), dtype)
    ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
    t_embs = imf_time_emb(student, cfg, ts[:-1], ts[1:])  # (S, H)
    mods, finals = precompute_step_modulations(student["dit"], t_embs)

    def body(i, x):
        t0 = jnp.full((b,), ts[i], jnp.float32)
        t1 = jnp.full((b,), ts[i + 1], jnp.float32)
        t_emb = jnp.broadcast_to(
            jax.lax.dynamic_index_in_dim(t_embs, i, keepdims=False)[None, :],
            (b, t_embs.shape[-1]))
        u = denoise_step(
            student, cfg, x, mask, t0, cond, t_emb=t_emb,
            step_mods=(
                jax.lax.dynamic_index_in_dim(mods, i, axis=1, keepdims=False),
                jax.lax.dynamic_index_in_dim(finals, i, keepdims=False),
            ),
        )
        return x - (t0 - t1)[:, None, None].astype(dtype) * u

    x = jax.lax.fori_loop(0, num_steps, body, x)
    return jnp.where(mask[..., None], x, 0.0)


def train_imf(
    train_cfg: ImfConfig = ImfConfig(),
    model_cfg: BackboneConfig = None,
    teacher_checkpoint: str = "assets/teacher_checkpoints/checkpoint_ema.npz",
    checkpoint_dir: str = "assets/imf_checkpoints",
    data_iter=None,
    teacher_params=None,
    seed: int = 0,
    log_every: int = 100,
):
    from smalltts_tpu.data.dummy import get_dummy_dataloader
    from smalltts_tpu.utils import checkpoint as ckpt

    # validate BEFORE any resource is constructed (the AsyncCheckpointer
    # spawns a worker thread that only close() reaps — review r4)
    if train_cfg.gan_weight > 0.0 and train_cfg.dmd_weight > 0.0:
        raise ValueError(
            "gan_weight and dmd_weight are separate drivers; corpus "
            "evidence (PERF.md round 4) shows neither stacks with the "
            "focus/rollin regression targeting — pick one")

    model_cfg = model_cfg or BackboneConfig()
    if teacher_params is None:
        teacher_params = ckpt.load_pytree(teacher_checkpoint)
    student = init_imf_student(teacher_params)
    # The conditioning encoders are structurally frozen (zero grad, see
    # make_imf_step): mask them out of the optimizer entirely so weight
    # decay — the only force that would move them off the teacher weights
    # the cached-cond serving path shares — cannot touch them. Trained
    # leaves keep the standard adamw recipe (default decay).
    _FROZEN = ("style_encoder", "phoneme_embedding",
               "kv_ref", "kv_text", "k_norm_cross")

    def _trained(path, _):
        names = {str(getattr(p, "key", getattr(p, "idx", ""))) for p in path}
        return not names & set(_FROZEN)

    tx = optax.masked(
        optax.chain(
            optax.clip_by_global_norm(train_cfg.grad_clip),
            optax.adamw(train_cfg.lr),
        ),
        jax.tree_util.tree_map_with_path(_trained, student),
    )
    opt_state = tx.init(student)
    data_iter = data_iter or get_dummy_dataloader(train_cfg.batch_size, seed)
    saver = ckpt.AsyncCheckpointer()

    disc = disc_opt = disc_step = tx_disc = None
    scorer = scorer_opt = scorer_step = tx_scorer = None
    if train_cfg.dmd_weight > 0.0:
        scorer = jax.tree.map(jnp.copy, teacher_params)
        tx_scorer = optax.chain(
            optax.clip_by_global_norm(train_cfg.grad_clip),
            optax.adamw(train_cfg.lr),
        )
        scorer_opt = tx_scorer.init(scorer)
        step_fn, scorer_step = make_imf_dmd_steps(model_cfg, tx, tx_scorer,
                                                  train_cfg)
    elif train_cfg.gan_weight > 0.0:
        from smalltts_tpu.models.discriminator import (
            DiscriminatorConfig,
            init_discriminator,
        )

        disc_cfg = DiscriminatorConfig(
            transformer_dim=model_cfg.hidden_dim, ref_dim=model_cfg.hidden_dim,
            # the disc consumes the last N stacked DiT layers; a shallower-
            # than-3-block backbone (tiny test configs) caps N at its depth
            num_tail_layers=min(3, model_cfg.dit.n_blocks),
        )
        disc = init_discriminator(jax.random.PRNGKey(seed + 1), disc_cfg)
        tx_disc = optax.chain(
            optax.clip_by_global_norm(train_cfg.grad_clip),
            optax.adamw(train_cfg.lr),
        )
        disc_opt = tx_disc.init(disc)
        step_fn, disc_step = make_imf_adv_steps(model_cfg, disc_cfg, tx,
                                                tx_disc, train_cfg)
    else:
        step_fn = make_imf_step(model_cfg, tx, train_cfg)

    key = jax.random.PRNGKey(seed)
    loss = None
    for step in range(train_cfg.num_steps):
        batch = next(data_iter)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}
        key, sub, k_d = jax.random.split(key, 3)
        if scorer_step is not None:
            student, opt_state, carry, metrics = step_fn(
                student, opt_state, teacher_params, scorer, batch, sub)
            scorer, scorer_opt, sc_loss = scorer_step(scorer, scorer_opt,
                                                      batch, carry, k_d)
            loss = metrics["imf_loss"]
            if step % log_every == 0:
                print(f"step {step}: imf_loss={float(loss):.5f} "
                      f"dmd={float(metrics['dmd_loss']):.5f} "
                      f"scorer={float(sc_loss):.5f} "
                      f"grad_mag={float(metrics['grad_mag']):.4f}")
        elif disc_step is not None:
            student, opt_state, carry, metrics = step_fn(
                student, opt_state, teacher_params, disc, batch, sub)
            disc, disc_opt, d_loss = disc_step(disc, disc_opt, teacher_params,
                                               batch, carry, k_d)
            loss = metrics["imf_loss"]
            if step % log_every == 0:
                print(f"step {step}: imf_loss={float(loss):.5f} "
                      f"gan={float(metrics['gan_loss']):.5f} "
                      f"disc={float(d_loss):.5f}")
        else:
            student, opt_state, loss = step_fn(student, opt_state,
                                               teacher_params, batch, sub)
            if step % log_every == 0:
                print(f"step {step}: imf_loss={float(loss):.5f}")
        if step % train_cfg.save_every == 0 and step > 1:
            saver.wait()
            from smalltts_tpu.utils.config_io import backbone_meta

            saver.save_pytree(f"{checkpoint_dir}/imf_student_latest.npz", student,
                              meta=backbone_meta(model_cfg))
            if disc is not None:
                saver.save_pytree(
                    f"{checkpoint_dir}/imf_discriminator_latest.npz", disc)
            if scorer is not None:
                saver.save_pytree(
                    f"{checkpoint_dir}/imf_scorer_latest.npz", scorer)
    saver.close()
    return student, float(loss) if loss is not None else None
