"""DMD2 distillation: 128-step teacher -> 4-step student.

Capability parity with the reference distiller
(reference: src/scripts/train/dmd2/distill.py:18-479):

* backward simulation over TIMESTEPS=[1.0, 1.0, 0.75, 0.50, 0.25]
  (distill.py:23,248-287): student runs at t_prev without grad, its output is
  re-noised at t and run again WITH grad;
* DMD gradient (distill.py:289-328): p_real from the teacher with DOUBLE CFG
  (text scale 2.0 via 3x batch replication [cond | text-dropped | spk-dropped],
  speaker scale 1.5, distill.py:75-105), p_fake from the fake-score model,
  normalized + nan_to_num, applied through a pseudo-MSE;
* auxiliary student losses: 1e-3 x LSGAN generator loss through the frozen
  discriminator over the scorer's stacked last-3-layer features, CTC ASR loss
  (enabled after step 5000), SV cosine loss (after step 7000)
  (distill.py:330-364);
* discriminator LSGAN update on real-vs-fake stacked features
  (distill.py:368-415);
* SCORER_UPDATES=5 flow-matching updates of the fake-score model per student
  step (distill.py:21,418-451).

Deliberate fix vs reference: distill.py:145 constructs the discriminator with
transformer_dim=1024/ref_dim=1024 while the DiT hidden size is 960
(model.py:36) — a latent shape bug; we use 960 consistently.

TPU-first: the reference's ~20 module invocations per step collapse into
THREE jitted, buffer-donated composite graphs (student / discriminator /
scorer-x5 via lax.scan); `inference_mode` sections become stop_gradient.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from smalltts_tpu.models.backbone import (
    BackboneConfig,
    backbone_forward,
    cfg_velocity,
)
from smalltts_tpu.models.discriminator import (
    DiscriminatorConfig,
    discriminator_forward,
)
from smalltts_tpu.models.asr import ASRConfig, asr_forward
from smalltts_tpu.models.style_encoder import style_encoder
from smalltts_tpu.models.sv import SVConfig, sv_forward
from smalltts_tpu.ops.masking import length_mask
from smalltts_tpu.ops.losses import cosine_loss
from smalltts_tpu.ops.precision import cast_floats
from smalltts_tpu.ops.schedule import apply_noise, x_pred_from_velocity

TIMESTEPS = (1.0, 1.0, 0.75, 0.50, 0.25)
SCORER_UPDATES = 5
CFG_SCALE_TEXT = 2.0
CFG_SCALE_SPEAKER = 1.5


@dataclass(frozen=True)
class DistillConfig:
    num_steps: int = 40_000
    batch_size: int = 2
    save_every: int = 800
    asr_start_step: int = 5_000
    sv_start_step: int = 7_000
    gan_weight: float = 1e-3
    scorer_updates: int = SCORER_UPDATES
    # compute dtype for the backbone forwards/backwards (student, teacher
    # CFG, scorer) — masters, targets, and every loss stay float32
    # (ops/precision.py). The DMD target math (p_real/p_fake/denom) is
    # deliberately NOT in bf16: it differences two near-equal x0 estimates.
    compute_dtype: str = "float32"


def _x_pred(params, cfg, x_t, ref, ref_len, mask, ph, ph_mask, t,
            return_features=False):
    """velocity -> x0 estimate (distill.py:60-134, cfg=False path)."""
    out = backbone_forward(
        params, cfg, x_t, ref, ref_len, mask, ph, ph_mask, t,
        return_features=return_features,
    )
    if return_features:
        velocity, feats = out
        return x_pred_from_velocity(x_t, velocity, t), feats
    return x_pred_from_velocity(x_t, out, t)


def _x_pred_cfg(params, cfg, x_t, ref, ref_len, mask, ph, ph_mask, t):
    """Teacher x0 with double CFG (reference: distill.py:75-105) — the
    velocity comes from the SHARED cfg_velocity (models/backbone.py), the
    same code the many-step teacher sampler runs."""
    velocity = cfg_velocity(params, cfg, x_t, ref, ref_len, mask, ph, ph_mask,
                            t, CFG_SCALE_TEXT, CFG_SCALE_SPEAKER)
    return x_pred_from_velocity(x_t, velocity, t)


def _unpack(batch):
    latents = batch["latents"]
    mask = length_mask(batch["latents_lengths"], latents.shape[1])
    ph = batch["phonemes"]
    ph_mask = length_mask(batch["phonemes_lengths"], ph.shape[1])
    return (
        latents, batch["latents_lengths"], mask, ph,
        batch["phonemes_lengths"], ph_mask,
        batch["ref_latents"], batch["ref_latents_lengths"],
    )


def make_student_step(
    cfg: BackboneConfig,
    disc_cfg: DiscriminatorConfig,
    asr_cfg: ASRConfig,
    sv_cfg: SVConfig,
    tx,
    train_cfg: DistillConfig = DistillConfig(),
):
    """Two jitted graphs instead of one monster:

    1. `targets` (NO backward): backward simulation, teacher double-CFG,
       scorer fake score + features, DMD target — the bulk of the per-step
       FLOPs but compile-cheap without autodiff;
    2. `update` (backward through the student only): recompute x0 with grad
       (one extra student forward vs the reference's eager autograd, ~8% of
       step FLOPs), pseudo-MSE to the precomputed target, LSGAN generator
       loss through the frozen discriminator — via x_t WITH gradient, exactly
       the reference's gradient path (distill.py:289-341: x_t carries grad
       into the discriminator's noised-latents projection) — plus frozen-ASR
       CTC and frozen-SV cosine losses.

    A single fused graph compiled >10 min at full size on v5e; this split
    compiles each piece in minutes and costs one extra student forward.
    """
    timesteps = jnp.asarray(TIMESTEPS)
    cdt = jnp.dtype(train_cfg.compute_dtype)
    mp = cdt != jnp.float32

    def f32(x):
        return x.astype(jnp.float32)

    @jax.jit
    def targets(student, teacher, scorer, batch, key):
        (latents, lat_len, mask, ph, ph_len, ph_mask, ref, ref_len) = _unpack(batch)
        b = latents.shape[0]
        ks = jax.random.split(key, 5)
        if mp:
            # bf16 compute view for every backbone forward in this graph;
            # x0 estimates upcast at each boundary so the backward-sim
            # chain and the DMD difference below stay fp32
            student, teacher, scorer = (cast_floats(t, cdt)
                                        for t in (student, teacher, scorer))
            ref_c = ref.astype(cdt)
        else:
            ref_c = ref

        # frozen-teacher style sequence for the discriminator (distill.py:240-244)
        ref_seq, ref_mask = style_encoder(
            teacher["style_encoder"], ref_c, ref_len, cfg.style
        )
        ref_seq = f32(ref_seq)

        # backward simulation (distill.py:248-287)
        idx = jax.random.randint(ks[0], (b,), 0, len(TIMESTEPS) - 1)
        t_prev = timesteps[idx]
        t_cur = timesteps[idx + 1]
        z_prev, _ = apply_noise(latents, t_prev, jax.random.normal(ks[1], latents.shape))
        x0_prev = f32(_x_pred(student, cfg, z_prev.astype(cdt), ref_c,
                              ref_len, mask, ph, ph_mask, t_prev))
        z, _ = apply_noise(x0_prev, t_cur, jax.random.normal(ks[2], latents.shape))

        # student's x0 (detached copy; the update graph recomputes it w/ grad)
        x0 = f32(_x_pred(student, cfg, z.astype(cdt), ref_c, ref_len, mask,
                         ph, ph_mask, t_cur))
        ts = jax.random.uniform(ks[3], (b,))
        noise_t = jax.random.normal(ks[4], latents.shape)
        x_t, _ = apply_noise(x0, ts, noise_t)

        valid = mask[..., None].astype(jnp.float32)
        p_real = (x0 - f32(_x_pred_cfg(teacher, cfg, x_t.astype(cdt), ref_c,
                                       ref_len, mask, ph, ph_mask, ts))) * valid
        x_pred_fake, feats_fake = _x_pred(
            scorer, cfg, x_t.astype(cdt), ref_c, ref_len, mask, ph, ph_mask,
            ts, return_features=True,
        )
        x_pred_fake, feats_fake = f32(x_pred_fake), f32(feats_fake)
        p_fake = (x0 - x_pred_fake) * valid
        denom = jnp.abs(p_real).mean(axis=(1, 2), keepdims=True)
        grad = jnp.nan_to_num((p_real - p_fake) / denom)
        grad_mag = jnp.linalg.norm(grad.reshape(b, -1), axis=-1)
        target = x0 - grad
        return {
            "z": z, "t_cur": t_cur, "ts": ts, "noise_t": noise_t,
            "target": target, "feats_fake": feats_fake, "x0_prev": x0_prev,
            "x_t": x_t, "ref_seq": ref_seq, "ref_mask": ref_mask,
            "dmd_grad_mag": grad_mag.mean(),
        }

    @partial(jax.jit, donate_argnums=(0, 1))
    def update(student, student_opt, disc, asr, sv, batch, tgt, step):
        (latents, lat_len, mask, ph, ph_len, ph_mask, ref, ref_len) = _unpack(batch)
        valid = mask[..., None].astype(jnp.float32)
        sg = jax.lax.stop_gradient

        def student_loss(student_p):
            if mp:
                # bf16 fwd/bwd through the student only; grads flow back to
                # the fp32 master via the casts. The GAN/CTC/SV loss paths
                # below run fp32 on the upcast x0 (frozen nets keep their
                # own fp32 params — their compute follows x0's dtype).
                student_p = cast_floats(student_p, cdt)
            x0 = _x_pred(
                student_p, cfg, tgt["z"].astype(cdt), ref.astype(cdt),
                ref_len, mask, ph, ph_mask, tgt["t_cur"]
            )
            x0 = f32(x0)
            # denominator counts valid *elements* (mask x latent channels),
            # matching reference valid.expand(-1,-1,64).sum() (distill.py:246,324-328)
            n_valid = jnp.maximum(valid.sum() * x0.shape[-1], 1.0)
            pseudo = 0.5 * (((x0 - sg(tgt["target"])) ** 2) * valid).sum() / n_valid

            # ---- LSGAN generator loss: grads flow through x_t (= noised x0)
            # into the discriminator's audio projection (distill.py:289-341)
            x_t, _ = apply_noise(x0, tgt["ts"], tgt["noise_t"])
            # train=True for parity with the reference, which keeps the
            # disc in train mode for this loss too. With the default
            # GroupNorm conformer (use_group_norm=True here AND in the
            # reference, discriminator.py:68) the flag is inert; it only
            # matters for a BatchNorm-configured variant, where the
            # generator must see the same batch-stats normalization the
            # disc trains under (review r3)
            logits, _ = discriminator_forward(
                sg(disc), disc_cfg, sg(tgt["feats_fake"]), x_t, tgt["ref_seq"],
                tgt["ref_mask"], mask, ph, tgt["ts"], train=True,
            )
            gan = ((logits - 1.0) ** 2).mean()

            # ---- CTC alignment loss (frozen ASR), gated on step ----
            # lax.cond SKIPS the conformer forward+backward before
            # asr_start_step instead of multiplying it by zero — the
            # reference's python-level `if step > 5000` never pays it
            # either (distill.py:344-356); a jnp.where gate ran the full
            # ASR+SV compute for a guaranteed-zero term for the first
            # 5-7k of 40k steps (review r3)
            def ctc_branch(_):
                log_probs, out_lens, _ = asr_forward(sg(asr), asr_cfg, x0, lat_len)
                logit_pad = 1.0 - length_mask(
                    out_lens, log_probs.shape[1]).astype(jnp.float32)
                label_pad = 1.0 - ph_mask.astype(jnp.float32)
                ctc_per = optax.ctc_loss(log_probs, logit_pad, ph, label_pad)
                # torch CTCLoss 'mean': per-sample / target length, then mean
                return (ctc_per / jnp.maximum(
                    ph_len.astype(jnp.float32), 1.0)).mean()

            ctc = jax.lax.cond(step > train_cfg.asr_start_step,
                               ctc_branch, lambda _: 0.0, None)

            # ---- SV cosine loss (frozen SV), gated on step ----
            def sv_branch(_):
                true_emb, _ = sv_forward(sg(sv), sv_cfg, sg(latents), lat_len)
                stu_emb, _ = sv_forward(sg(sv), sv_cfg, x0, lat_len)
                return cosine_loss(stu_emb, sg(true_emb)).mean()

            sv_loss = jax.lax.cond(step > train_cfg.sv_start_step,
                                   sv_branch, lambda _: 0.0, None)

            # NB: st_asr/st_sv report 0.0 before their gates open — the
            # compute is skipped entirely (reference behavior), so the
            # pre-gate loss value does not exist to log
            total = pseudo + train_cfg.gan_weight * gan + ctc + sv_loss
            aux = {"st_pseudo": pseudo, "st_gan": gan, "st_asr": ctc,
                   "st_sv": sv_loss, "x_t": sg(x_t)}
            return total, aux

        (loss, aux), grads = jax.value_and_grad(student_loss, has_aux=True)(student)
        updates, student_opt = tx.update(grads, student_opt, student)
        student = optax.apply_updates(student, updates)
        return student, student_opt, aux

    def student_step(student, student_opt, teacher, scorer, disc, asr, sv,
                     batch, step, key):
        tgt = targets(student, teacher, scorer, batch, key)
        student, student_opt, aux = update(
            student, student_opt, disc, asr, sv, batch, tgt, step
        )
        carry = {
            "x0_prev": tgt["x0_prev"], "x_t": aux["x_t"],
            "feats_fake": tgt["feats_fake"], "ref_seq": tgt["ref_seq"],
            "ref_mask": tgt["ref_mask"], "ts": tgt["ts"], "t_cur": tgt["t_cur"],
        }
        metrics = {
            "st_pseudo": aux["st_pseudo"], "st_gan": aux["st_gan"],
            "st_asr": aux["st_asr"], "st_sv": aux["st_sv"],
            "dmd_grad_mag": tgt["dmd_grad_mag"],
        }
        return student, student_opt, carry, metrics

    return student_step


def make_disc_step(cfg: BackboneConfig, disc_cfg: DiscriminatorConfig, tx,
                   compute_dtype: str = "float32"):
    cdt = jnp.dtype(compute_dtype)
    mp = cdt != jnp.float32

    @partial(jax.jit, donate_argnums=(0, 1))
    def disc_step(disc, disc_opt, scorer, batch, carry, key):
        (latents, lat_len, mask, ph, ph_len, ph_mask, ref, ref_len) = _unpack(batch)
        ts = carry["ts"]
        x_real, _ = apply_noise(latents, ts, jax.random.normal(key, latents.shape))
        # the frozen-scorer feature forward is the FLOPs of this step —
        # it runs in the compute dtype; the discriminator itself (small,
        # loss-adjacent) stays fp32 on the upcast features
        _, feats_real = backbone_forward(
            cast_floats(scorer, cdt) if mp else scorer, cfg,
            x_real.astype(cdt), ref.astype(cdt) if mp else ref, ref_len,
            mask, ph, ph_mask, ts, return_features=True,
        )
        feats_real = jax.lax.stop_gradient(feats_real.astype(jnp.float32))

        feats = jnp.concatenate([feats_real, carry["feats_fake"]], axis=0)
        xs = jnp.concatenate([x_real, carry["x_t"]], axis=0)
        ref_seq2 = jnp.concatenate([carry["ref_seq"]] * 2, axis=0)
        ref_mask2 = jnp.concatenate([carry["ref_mask"]] * 2, axis=0)
        mask2 = jnp.concatenate([mask] * 2, axis=0)
        ph2 = jnp.concatenate([ph] * 2, axis=0)
        ts2 = jnp.concatenate([ts] * 2, axis=0)

        def disc_loss(disc_p):
            logits, new_p = discriminator_forward(
                disc_p, disc_cfg, feats, xs, ref_seq2, ref_mask2, mask2, ph2, ts2,
                train=True,
            )
            real, fake = jnp.split(logits, 2, axis=0)
            return (fake ** 2 + (real - 1.0) ** 2).mean(), new_p

        # has_aux threads updated BN running stats through the update.
        # The default disc is GroupNorm-only (no stats; same as the
        # reference, discriminator.py:68) so this is usually an identity —
        # but a BatchNorm-configured disc would otherwise freeze its stats
        # at init for the whole run (review r3). Stats leaves are
        # optimizer-masked, so applying the updates to new_p preserves them.
        (loss, new_p), grads = jax.value_and_grad(disc_loss, has_aux=True)(disc)
        updates, disc_opt = tx.update(grads, disc_opt, disc)
        disc = optax.apply_updates(new_p, updates)
        return disc, disc_opt, loss

    return disc_step


def make_scorer_step(cfg: BackboneConfig, tx, n_updates: int = SCORER_UPDATES,
                     compute_dtype: str = "float32"):
    cdt = jnp.dtype(compute_dtype)
    mp = cdt != jnp.float32

    @partial(jax.jit, donate_argnums=(0, 1))
    def scorer_step(scorer, scorer_opt, student, batch, carry, key):
        (latents, lat_len, mask, ph, ph_len, ph_mask, ref, ref_len) = _unpack(batch)
        valid = mask[..., None].astype(jnp.float32)
        x0_prev, t_cur = carry["x0_prev"], carry["t_cur"]
        student_c = cast_floats(student, cdt) if mp else student
        ref_c = ref.astype(cdt) if mp else ref

        def one_update(state, k):
            scorer_p, opt_state = state
            k1, k2, k3 = jax.random.split(k, 3)
            z, _ = apply_noise(x0_prev, t_cur, jax.random.normal(k1, latents.shape))
            x0 = jax.lax.stop_gradient(
                _x_pred(student_c, cfg, z.astype(cdt), ref_c, ref_len, mask,
                        ph, ph_mask, t_cur)
            ).astype(jnp.float32)
            ts = jax.random.uniform(k2, (latents.shape[0],))
            noised, v_target = apply_noise(x0, ts, jax.random.normal(k3, latents.shape))

            def fm_loss(sp):
                if mp:
                    sp = cast_floats(sp, cdt)
                v_pred = backbone_forward(
                    sp, cfg, noised.astype(cdt), ref_c, ref_len, mask, ph,
                    ph_mask, ts
                ).astype(jnp.float32)
                diff = ((v_pred - v_target) * valid) ** 2
                return diff.sum() / jnp.maximum(valid.sum() * v_pred.shape[-1], 1.0)

            loss, grads = jax.value_and_grad(fm_loss)(scorer_p)
            updates, opt_state = tx.update(grads, opt_state, scorer_p)
            scorer_p = optax.apply_updates(scorer_p, updates)
            return (scorer_p, opt_state), loss

        (scorer, scorer_opt), losses = jax.lax.scan(
            one_update, (scorer, scorer_opt), jax.random.split(key, n_updates)
        )
        return scorer, scorer_opt, losses[-1]

    return scorer_step


def train_distill(
    train_cfg: DistillConfig = DistillConfig(),
    model_cfg: Optional[BackboneConfig] = None,
    disc_cfg: Optional[DiscriminatorConfig] = None,
    asr_cfg: Optional[ASRConfig] = None,
    sv_cfg: Optional[SVConfig] = None,
    teacher_checkpoint: str = "assets/teacher_checkpoints/checkpoint_ema.npz",
    asr_checkpoint: str = "assets/asr_checkpoints/checkpoint_latest.npz",
    sv_checkpoint: str = "assets/sv_checkpoints/checkpoint_latest.npz",
    checkpoint_dir: str = "assets/dmd_checkpoints",
    data_iter=None,
    seed: int = 0,
    params_override: Optional[dict] = None,
    mesh=None,
):
    """Full distillation loop: student + scorer init from teacher EMA
    (distill.py:156-159); frozen teacher/ASR/SV; three optimizers AdamW 1e-5.

    `params_override` (dict with teacher/asr/sv/student/scorer/disc) bypasses
    checkpoint loading — used by tests and smoke runs.

    `mesh` (jax.sharding.Mesh with a "dp" axis) data-parallelizes the whole
    composite (student/disc/scorer steps) — single- or multi-host (see
    parallel/multihost.py); checkpoints/logs are coordinator-only.
    """
    from dataclasses import replace

    from smalltts_tpu.models.discriminator import init_discriminator
    from smalltts_tpu.data.dummy import get_dummy_dataloader
    from smalltts_tpu.train.optim import distill_optimizer
    from smalltts_tpu.utils import checkpoint as ckpt

    if model_cfg is None:
        # rematerialize DiT blocks in the backward pass — the student step
        # traces 3 backbones in one graph (reference enables grad
        # checkpointing on the student too, distill.py:142)
        base = BackboneConfig()
        model_cfg = replace(base, dit=replace(base.dit, remat=True))
    disc_cfg = disc_cfg or DiscriminatorConfig(
        transformer_dim=model_cfg.hidden_dim, ref_dim=model_cfg.hidden_dim
    )
    asr_cfg = asr_cfg or ASRConfig(input_dim=model_cfg.latent_dim)
    sv_cfg = sv_cfg or SVConfig(input_dim=model_cfg.latent_dim)

    key = jax.random.PRNGKey(seed)
    if params_override is not None:
        teacher = params_override["teacher"]
        asr = params_override["asr"]
        sv = params_override["sv"]
        student = params_override.get("student") or jax.tree.map(jnp.copy, teacher)
        scorer = params_override.get("scorer") or jax.tree.map(jnp.copy, teacher)
        disc = params_override["disc"]
    else:
        teacher = ckpt.load_pytree(teacher_checkpoint)
        asr = ckpt.load_pytree(asr_checkpoint)
        sv = ckpt.load_pytree(sv_checkpoint)
        student = jax.tree.map(jnp.copy, teacher)
        scorer = jax.tree.map(jnp.copy, teacher)
        key, k_disc = jax.random.split(key)
        disc = init_discriminator(k_disc, disc_cfg)

    if jnp.dtype(train_cfg.compute_dtype) != jnp.float32:
        # the FROZEN teacher never sees an optimizer — store it directly in
        # the compute dtype instead of keeping an fp32 master plus an
        # in-graph bf16 copy (at 328M that duplicate is ~2 GB of HBM, the
        # difference between DMD2-bf16 fitting on a 16 GB v5e and OOM;
        # measured: bench --train dmd2 bf16 cells). Student/scorer/disc
        # keep fp32 masters — they train.
        teacher = jax.jit(lambda t: cast_floats(
            t, jnp.dtype(train_cfg.compute_dtype)))(teacher)

    tx_student = distill_optimizer(student)
    tx_scorer = distill_optimizer(scorer)
    tx_disc = distill_optimizer(disc)
    if mesh is not None:
        from smalltts_tpu.parallel.mesh import replicated

        teacher = replicated(teacher, mesh)
        asr = replicated(asr, mesh)
        sv = replicated(sv, mesh)
        student = replicated(student, mesh)
        scorer = replicated(scorer, mesh)
        disc = replicated(disc, mesh)
    opt_student = tx_student.init(student)
    opt_scorer = tx_scorer.init(scorer)
    opt_disc = tx_disc.init(disc)

    student_step = make_student_step(model_cfg, disc_cfg, asr_cfg, sv_cfg, tx_student, train_cfg)
    disc_step = make_disc_step(model_cfg, disc_cfg, tx_disc,
                               train_cfg.compute_dtype)
    scorer_step = make_scorer_step(model_cfg, tx_scorer, train_cfg.scorer_updates,
                                   train_cfg.compute_dtype)

    data_iter = data_iter or get_dummy_dataloader(train_cfg.batch_size, seed)
    saver = ckpt.AsyncCheckpointer()
    # multi-host: single-writer checkpoints + coordinator-only logs (see
    # parallel/multihost.py; params are replicated so device_get is local)
    writer = jax.process_index() == 0
    from smalltts_tpu.utils.profiling import MetricsLogger

    import os as _os

    logger = MetricsLogger(
        _os.path.join(checkpoint_dir, "metrics.jsonl") if writer else None,
        echo=writer)
    metrics = {}
    for step in range(train_cfg.num_steps):
        batch = next(data_iter)
        if mesh is not None:
            from smalltts_tpu.parallel.mesh import shard_batch

            batch = shard_batch(batch, mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}
        key, k1, k2, k3 = jax.random.split(key, 4)
        student, opt_student, carry, metrics = student_step(
            student, opt_student, teacher, scorer, disc, asr, sv, batch,
            jnp.asarray(step), k1,
        )
        disc, opt_disc, disc_loss = disc_step(disc, opt_disc, scorer, batch, carry, k2)
        scorer, opt_scorer, scorer_loss = scorer_step(
            scorer, opt_scorer, student, batch, carry, k3
        )
        # keep metrics as device arrays between logs: float() forces a
        # host-device sync that would serialize the three async step
        # dispatches on every iteration (review r3)
        metrics = {**metrics, "disc_loss": disc_loss, "scorer_loss": scorer_loss}
        if step % 50 == 0 and writer:
            logger.log({k: float(v) for k, v in metrics.items()}, step)
        if step % train_cfg.save_every == 0 and step > 1 and writer:
            saver.wait()
            from smalltts_tpu.utils.config_io import backbone_meta

            meta = backbone_meta(model_cfg)
            saver.save_pytree(f"{checkpoint_dir}/student_latest.npz", student,
                              meta=meta)
            saver.save_pytree(f"{checkpoint_dir}/scorer_latest.npz", scorer,
                              meta=meta)
            saver.save_pytree(f"{checkpoint_dir}/discriminator_latest.npz", disc)
    saver.close()
    logger.close()
    # one sync at the end keeps the public return type plain floats
    return student, scorer, disc, {k: float(v) for k, v in metrics.items()}
