"""Optimizers and schedules (optax) matching the reference training recipes.

Teacher: AdamW lr 1.5e-4, betas (0.9, 0.999), wd 1e-2, linear warmup 1500
steps (start factor 1e-6) then cosine to 1e-5, grad-clip 1.0
(reference: src/scripts/train/teacher.py:68-79,149).
Distill: AdamW lr 1e-5 for student/scorer/discriminator (distill.py:161-177).
ASR/SV: AdamW 1e-4 (asr.py:10-42, sv.py:13-31).

BatchNorm running stats (`mean`/`var` leaves) are masked out of every
optimizer — they update functionally through the forward pass.
"""

from __future__ import annotations

import jax
import optax

_STATE_LEAVES = ("mean", "var")


def trainable_mask(params):
    """False for batch-norm running-stat leaves, True elsewhere."""

    def rule(path, _):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "idx", None))
        return str(name) not in _STATE_LEAVES

    return jax.tree_util.tree_map_with_path(rule, params)


def warmup_cosine(
    peak_lr: float,
    total_steps: int,
    warmup_steps: int,
    end_lr: float,
    warmup_start_factor: float = 1e-6,
):
    """LinearLR(start_factor) -> CosineAnnealingLR(eta_min) like the reference
    SequentialLR (teacher.py:71-79)."""
    warmup = optax.linear_schedule(
        init_value=peak_lr * warmup_start_factor,
        end_value=peak_lr,
        transition_steps=warmup_steps,
    )
    cosine = optax.cosine_decay_schedule(
        init_value=peak_lr,
        decay_steps=max(total_steps - warmup_steps, 1),
        alpha=end_lr / peak_lr,
    )
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def adamw(
    params,
    learning_rate,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    clip_norm: float | None = None,
):
    chain = []
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(
        optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    # multi_transform ZEROES updates for the stats leaves. optax.masked
    # passes masked-out updates through UNCHANGED, so the documented
    # "running stats are masked out of every optimizer" only held because
    # every current loss runs BN with train=True (zero grads) — a future
    # eval-mode forward under grad would have silently corrupted the
    # running stats by +raw_grad per step (review r3).
    labels = jax.tree.map(
        lambda t: "train" if t else "freeze", trainable_mask(params))
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def teacher_optimizer(params, num_steps: int = 330_000, warmup: int = 1_500):
    sched = warmup_cosine(1.5e-4, num_steps, warmup, 1e-5)
    return adamw(params, sched, weight_decay=1e-2, clip_norm=1.0), sched


def distill_optimizer(params):
    return adamw(params, 1e-5, weight_decay=1e-2)


def aux_optimizer(params, num_steps: int, warmup: int = 4_000, peak: float = 1e-4,
                  clip_norm: float | None = None):
    sched = warmup_cosine(peak, num_steps, warmup, 1e-5)
    return adamw(params, sched, weight_decay=1e-2, clip_norm=clip_norm), sched
