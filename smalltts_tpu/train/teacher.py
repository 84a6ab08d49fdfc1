"""Flow-matching teacher trainer.

Capability parity with the reference teacher loop
(reference: src/scripts/train/teacher.py:21-173): t = sigmoid(randn), shifted
cosine noising, masked velocity MSE, CFG dropout (text 0.1 / speaker 0.1),
AdamW 1.5e-4 + warmup 1500 -> cosine to 1e-5, grad-clip 1.0, EMA beta 0.9999,
save every 1500 steps.

TPU-first: the whole step (CFG drops, noising, forward, backward, optimizer,
EMA) is ONE jitted, buffer-donated graph; data-parallelism comes from the
mesh sharding of the batch (parallel.mesh), with XLA inserting the gradient
psums — no DDP wrapper.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from smalltts_tpu.models.backbone import BackboneConfig, backbone_forward, init_backbone
from smalltts_tpu.ops.masking import length_mask, masked_mse
from smalltts_tpu.ops.precision import cast_floats
from smalltts_tpu.ops.schedule import apply_noise
from smalltts_tpu.train import ema
from smalltts_tpu.train.ema import ema_init, ema_update
from smalltts_tpu.train.optim import teacher_optimizer


@dataclass(frozen=True)
class TeacherTrainConfig:
    num_steps: int = 330_000
    batch_size: int = 2
    save_every: int = 1_500
    text_cfg_drop: float = 0.10
    speaker_cfg_drop: float = 0.10
    ema_beta: float = 0.9999
    remat: bool = False
    # forward/backward compute dtype; master params/opt/EMA stay float32
    # (ops/precision.py — the TPU analogue of the reference's autocast).
    # "bfloat16" is the measured default-to-be: see PERF.md training MFU.
    compute_dtype: str = "float32"


def apply_cfg_drops(key, batch, text_drop: float, speaker_drop: float):
    """Randomly zero text / speaker conditioning per sample
    (reference: teacher.py:109-123)."""
    k1, k2 = jax.random.split(key)
    b = batch["phonemes"].shape[0]
    text_mask = jax.random.uniform(k1, (b,)) < text_drop
    spk_mask = jax.random.uniform(k2, (b,)) < speaker_drop
    phonemes = jnp.where(text_mask[:, None], 0, batch["phonemes"])
    ph_lengths = jnp.where(text_mask, 0, batch["phonemes_lengths"])
    ref = jnp.where(spk_mask[:, None, None], 0.0, batch["ref_latents"])
    ref_lengths = jnp.where(spk_mask, 0, batch["ref_latents_lengths"])
    return phonemes, ph_lengths, ref, ref_lengths


def teacher_loss(params, cfg: BackboneConfig, batch, key,
                 train_cfg: TeacherTrainConfig = TeacherTrainConfig()):
    k_drop, k_t, k_noise = jax.random.split(key, 3)
    phonemes, ph_lengths, ref, ref_lengths = apply_cfg_drops(
        k_drop, batch, train_cfg.text_cfg_drop, train_cfg.speaker_cfg_drop
    )
    latents = batch["latents"]
    b, t_len, _ = latents.shape
    ph_mask = length_mask(ph_lengths, phonemes.shape[1])
    mask = length_mask(batch["latents_lengths"], t_len)

    t = jax.nn.sigmoid(jax.random.normal(k_t, (b,)))
    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    noised, v_target = apply_noise(latents, t, noise)

    cdt = jnp.dtype(train_cfg.compute_dtype)
    if cdt != jnp.float32:
        # bf16 compute view: params + float inputs cast once here; grads
        # flow back to the fp32 masters automatically (the cast is part of
        # the differentiated graph). v_target stays fp32 — masked_mse
        # accumulates the loss in fp32 either way.
        params = cast_floats(params, cdt)
        noised = noised.astype(cdt)
        ref = ref.astype(cdt)
    velocity = backbone_forward(
        params, cfg, noised, ref, ref_lengths, mask, phonemes, ph_mask, t
    )
    return masked_mse(velocity, v_target, mask)


def make_teacher_step(cfg: BackboneConfig, tx,
                      train_cfg: TeacherTrainConfig = TeacherTrainConfig()):
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, ema_params, batch, key, ema_decay=None):
        # ema_decay: scheduled scalar from train_teacher (ema.ema_decay —
        # reference warmup semantics); None falls back to the constant
        loss, grads = jax.value_and_grad(teacher_loss)(params, cfg, batch, key,
                                                       train_cfg)
        # failure containment: skip the update on non-finite loss/grads (a bad
        # batch must not poison 330k steps; the reference has no such guard)
        finite = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_params, params
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old) if hasattr(new, "shape") else new,
            new_opt_state, opt_state,
        )
        ema_params = ema_update(
            ema_params, params,
            train_cfg.ema_beta if ema_decay is None else ema_decay)
        return params, opt_state, ema_params, loss

    return step


def train_teacher(
    train_cfg: TeacherTrainConfig = TeacherTrainConfig(),
    model_cfg: Optional[BackboneConfig] = None,
    mesh=None,
    data_iter=None,
    seed: int = 0,
    checkpoint_dir: str = "assets/teacher_checkpoints",
    pretrained: Optional[str] = None,
    resume_from: Optional[str] = None,
    log_every: int = 100,
):
    """Full training loop (dummy data by default, like the reference)."""
    from smalltts_tpu.data.dummy import get_dummy_dataloader
    from smalltts_tpu.models.dit import DiTConfig
    from smalltts_tpu.parallel.mesh import replicated, shard_batch
    from smalltts_tpu.utils import checkpoint as ckpt

    model_cfg = model_cfg or BackboneConfig(dit=DiTConfig(remat=train_cfg.remat))
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    if pretrained:
        params = ckpt.load_reference_backbone_checkpoint(pretrained)
        params = jax.tree.map(jnp.asarray, params)
    else:
        params = init_backbone(k_init, model_cfg)
    tx, sched = teacher_optimizer(params, train_cfg.num_steps)
    opt_state = tx.init(params)
    ema_params = ema_init(params)

    start_step = 0
    if resume_from:
        state = ckpt.load_train_state(
            resume_from,
            {"params": params, "opt_state": opt_state, "ema": ema_params,
             "step": jnp.zeros((), jnp.int32)},
        )
        params, opt_state, ema_params = state["params"], state["opt_state"], state["ema"]
        start_step = int(state["step"])
        # a resumed run must not replay the step-0 noise/t/CFG-drop stream
        # (review r3: the key restarted at PRNGKey(seed), so the resumed
        # segment re-trained on exactly the pairs already seen)
        key = jax.random.fold_in(key, start_step)
        print(f"resumed from {resume_from} at step {start_step}")

    if mesh is not None:
        params = replicated(params, mesh)
        opt_state = replicated(opt_state, mesh)
        ema_params = replicated(ema_params, mesh)

    step_fn = make_teacher_step(model_cfg, tx, train_cfg)
    # the default loader is seeded past the resume point so the resumed
    # segment sees a fresh batch stream, not a replay from batch 0 (a
    # caller-supplied data_iter must arrive already positioned — it is
    # consumed from wherever it stands)
    data_iter = data_iter or get_dummy_dataloader(
        train_cfg.batch_size, seed + start_step)
    # ~4 GB of weights+state per save at full size: serialize off-thread so
    # the step loop never stalls on disk (utils/checkpoint.AsyncCheckpointer)
    saver = ckpt.AsyncCheckpointer()
    # multi-host: single-writer checkpoints + coordinator-only logs, like the
    # reference's accelerator.is_main_process gating (teacher.py:160-171).
    # Params are dp-replicated (fully addressable per process), so the
    # writer's device_get needs no cross-process gather.
    writer = jax.process_index() == 0
    # JSONL metrics next to the checkpoints (the reference's
    # accelerator.log is a silent no-op unless a tracker is configured;
    # this always leaves a parseable training record)
    from smalltts_tpu.utils.profiling import MetricsLogger

    import os as _os

    logger = MetricsLogger(
        _os.path.join(checkpoint_dir, "metrics.jsonl") if writer else None,
        echo=writer)

    for step in range(start_step, train_cfg.num_steps):
        batch = next(data_iter)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "texts"}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        key, k_step = jax.random.split(key)
        params, opt_state, ema_params, loss = step_fn(
            params, opt_state, ema_params, batch, k_step,
            jnp.float32(ema.ema_decay(step, train_cfg.ema_beta)),
        )
        if step % log_every == 0 and writer:
            logger.log({"teacher_loss": float(loss),
                        "lr": float(sched(step)),
                        "ema_decay": ema.ema_decay(step, train_cfg.ema_beta)},
                       step)
        if step % train_cfg.save_every == 0 and step > 1 and writer:
            # portable weights (raw + EMA) AND resumable full trainer state
            saver.wait()  # previous save fully on disk before re-snapshot
            from smalltts_tpu.utils.config_io import backbone_meta

            meta = backbone_meta(model_cfg)
            saver.save_pytree(f"{checkpoint_dir}/checkpoint_latest.npz", params,
                              meta=meta)
            saver.save_pytree(f"{checkpoint_dir}/checkpoint_ema.npz", ema_params,
                              meta=meta)
            saver.save_train_state(
                f"{checkpoint_dir}/train_state.npz",
                {"params": params, "opt_state": opt_state, "ema": ema_params,
                 "step": jnp.asarray(step, jnp.int32)},
            )
    saver.close()
    logger.close()
    return params, ema_params
